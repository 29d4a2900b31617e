"""Native C++ kernel tests: bit-exactness vs the Python oracles.

Skipped wholesale when no C++ toolchain is available (the pipeline then
falls back to the numpy implementations automatically).
"""

import numpy as np
import pytest

from iv2019_tpu import native
from iv2019_tpu.ops.rasterize import rasterize_bboxes_pyloop
from iv2019_tpu.ops.resize import resize_bilinear, resize_nearest

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain for native kernels"
)


@pytest.mark.parametrize("align", [False, True])
@pytest.mark.parametrize("in_hw,out_hw", [((16, 24), (8, 12)), ((7, 13), (29, 5)),
                                          ((128, 256), (512, 1024))])
def test_bilinear_exact(align, in_hw, out_hw):
    img = np.random.RandomState(0).rand(*in_hw, 3).astype(np.float32)
    a = native.resize_bilinear_f32(img, out_hw, align)
    b = resize_bilinear(img, out_hw, align)
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("align", [False, True])
def test_nearest_exact_2d_int32(align):
    lab = np.random.RandomState(1).randint(0, 20, (33, 65)).astype(np.int32)
    a = native.resize_nearest(lab, (17, 129), align)
    b = resize_nearest(lab, (17, 129), align)
    np.testing.assert_array_equal(a, b)
    assert a.dtype == np.int32


def test_nearest_exact_3d_f32():
    # (H, W, C) multinomial labels: native resizes the leading spatial dims,
    # matching resize_nearest_hw (NOT the batched resize_nearest convention)
    from iv2019_tpu.ops.resize import resize_nearest_hw

    lab = np.random.RandomState(2).rand(16, 24, 15).astype(np.float32)
    a = native.resize_nearest(lab, (9, 40))
    b = resize_nearest_hw(lab, (9, 40))
    np.testing.assert_array_equal(a, b)


def test_rasterize_exact():
    rng = np.random.RandomState(3)
    for seed in range(3):
        k = rng.randint(1, 30)
        cids = rng.randint(-1, 15, k).astype(np.int32)
        x = np.sort(rng.rand(k, 2), 1)
        y = np.sort(rng.rand(k, 2), 1)
        boxes = np.stack([x[:, 0], x[:, 1], y[:, 0], y[:, 1]], 1).astype(np.float32)
        a = native.rasterize_bboxes(cids, boxes, 40, 56, 15)
        b = rasterize_bboxes_pyloop(cids, boxes, 40, 56)
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_u8_to_f32_and_lut():
    rng = np.random.RandomState(4)
    u8 = rng.randint(0, 255, (50, 60, 3), np.uint8)
    np.testing.assert_allclose(
        native.u8_to_f32(u8, center=False), u8.astype(np.float32) / 255.0,
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        native.u8_to_f32(u8, center=True),
        ((u8.astype(np.float32) / 255.0) - 0.5) / 0.5,
        rtol=1e-5, atol=1e-6,
    )
    table = rng.randint(0, 20, 34).astype(np.int32)
    lab = rng.randint(0, 34, (50, 60)).astype(np.uint8)
    np.testing.assert_array_equal(
        native.map_lut_i32(lab, table), table[lab.astype(np.int64)]
    )


class TestNativeDecode:
    """libjpeg/libpng decode vs the PIL oracle (bit-exact for 8-bit
    images; palette PNGs must stay index maps — cityscapes labelIds depend
    on it). Skips when the decode lib could not build (no libjpeg/libpng)."""

    @staticmethod
    def _bytes(img, fmt, **kw):
        import io

        b = io.BytesIO()
        img.save(b, format=fmt, **kw)
        return b.getvalue()

    @pytest.fixture(autouse=True)
    def _need_decode(self):
        if not native.decode_available():
            pytest.skip("no libjpeg/libpng for native decode")

    @pytest.mark.parametrize("case", [
        "png_rgb", "png_gray", "png_palette", "png_rgba",
        "jpeg_rgb", "jpeg_gray",
    ])
    def test_parity_raw_and_rgb(self, case):
        import io

        from PIL import Image

        rng = np.random.RandomState(hash(case) % (2**31))
        if case == "png_rgb":
            buf = self._bytes(
                Image.fromarray(rng.randint(0, 256, (37, 53, 3), np.uint8)),
                "PNG")
        elif case == "png_gray":
            buf = self._bytes(
                Image.fromarray(rng.randint(0, 256, (20, 31), np.uint8), "L"),
                "PNG")
        elif case == "png_palette":
            img = Image.fromarray(rng.randint(0, 34, (24, 40), np.uint8), "P")
            img.putpalette([i % 256 for i in range(768)])
            buf = self._bytes(img, "PNG")
        elif case == "png_rgba":
            buf = self._bytes(
                Image.fromarray(
                    rng.randint(0, 256, (16, 16, 4), np.uint8), "RGBA"),
                "PNG")
        elif case == "jpeg_rgb":
            buf = self._bytes(
                Image.fromarray(rng.randint(0, 256, (48, 64, 3), np.uint8)),
                "JPEG", quality=90)
        else:
            buf = self._bytes(
                Image.fromarray(rng.randint(0, 256, (32, 32), np.uint8), "L"),
                "JPEG", quality=90)

        ref = np.asarray(Image.open(io.BytesIO(buf)))
        got = native.decode_image(buf)
        assert got is not None and got.shape == ref.shape
        np.testing.assert_array_equal(got, ref)

        ref_rgb = np.asarray(Image.open(io.BytesIO(buf)).convert("RGB"))
        got_rgb = native.decode_image(buf, force_rgb=True)
        assert got_rgb is not None and got_rgb.shape == ref_rgb.shape
        np.testing.assert_array_equal(got_rgb, ref_rgb)

    def test_palette_stays_indices(self):
        """A labelIds-style palette PNG must decode to the raw class ids,
        not palette colors (label-correctness contract)."""
        from PIL import Image

        ids = np.arange(34, dtype=np.uint8).reshape(2, 17)
        img = Image.fromarray(ids, "P")
        img.putpalette([255 - i % 256 for i in range(768)])
        got = native.decode_image(self._bytes(img, "PNG"))
        np.testing.assert_array_equal(got, ids)

    def test_unsupported_returns_none(self):
        import io

        from PIL import Image

        assert native.decode_image(b"not an image") is None
        # 16-bit PNG -> PIL fallback (parity would need uint16 output)
        img16 = Image.fromarray(
            np.arange(12, dtype=np.uint16).reshape(3, 4) * 1000, "I;16")
        b = io.BytesIO()
        img16.save(b, format="PNG")
        assert native.decode_image(b.getvalue()) is None

    def test_truncated_does_not_crash(self):
        from PIL import Image

        buf = self._bytes(
            Image.fromarray(np.zeros((64, 64, 3), np.uint8)), "PNG")
        assert native.decode_image(buf[: len(buf) // 2]) is None
        jbuf = self._bytes(
            Image.fromarray(np.zeros((64, 64, 3), np.uint8)), "JPEG")
        # truncated JPEG: libjpeg warns + fills; must not crash either way
        native.decode_image(jbuf[: len(jbuf) // 2])
