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
