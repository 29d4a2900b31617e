"""Tests for TF1-exact resize kernels.

Oracles are hand-derived from the TF r1.12 CPU kernel semantics:
- scale = (in-1)/(out-1) when align_corners and out > 1, else in/out
- bilinear: src = dst*scale, floor + lerp
- nearest: floor(dst*scale) legacy / round(dst*scale) aligned, clamped
"""

import numpy as np
import jax.numpy as jnp
import pytest

from iv2019_tpu.ops.resize import (
    resize_bilinear,
    resize_bilinear_mxu,
    resize_nearest,
)


def _ref_bilinear_1d(row, out_w, align_corners):
    in_w = len(row)
    scale = (in_w - 1) / (out_w - 1) if (align_corners and out_w > 1) else in_w / out_w
    out = np.empty(out_w, np.float32)
    for i in range(out_w):
        src = i * scale
        lo = min(int(np.floor(src)), in_w - 1)
        hi = min(lo + 1, in_w - 1)
        f = src - lo
        out[i] = row[lo] * (1 - f) + row[hi] * f
    return out


@pytest.mark.parametrize("align", [False, True])
@pytest.mark.parametrize("in_w,out_w", [(4, 8), (8, 4), (5, 7), (7, 5), (1, 3)])
def test_bilinear_matches_scalar_reference(align, in_w, out_w):
    row = np.arange(in_w, dtype=np.float32) ** 1.5
    img = row.reshape(1, 1, in_w, 1)
    got = np.asarray(resize_bilinear(jnp.asarray(img), (1, out_w), align))
    want = _ref_bilinear_1d(row, out_w, align)
    np.testing.assert_allclose(got[0, 0, :, 0], want, rtol=1e-5, atol=1e-5)


def test_bilinear_align_corners_preserves_corners():
    img = np.random.RandomState(0).rand(2, 6, 9, 3).astype(np.float32)
    out = np.asarray(resize_bilinear(jnp.asarray(img), (11, 17), align_corners=True))
    np.testing.assert_allclose(out[:, 0, 0], img[:, 0, 0], rtol=1e-5)
    np.testing.assert_allclose(out[:, -1, -1], img[:, -1, -1], rtol=1e-5)
    np.testing.assert_allclose(out[:, 0, -1], img[:, 0, -1], rtol=1e-5)


def test_bilinear_identity():
    img = np.random.RandomState(1).rand(1, 5, 5, 2).astype(np.float32)
    out = np.asarray(resize_bilinear(jnp.asarray(img), (5, 5)))
    np.testing.assert_allclose(out, img)


def test_bilinear_integer_upscale_legacy():
    # TF1 legacy (align_corners=False): src = dst * in/out, so 2x upscale
    # samples at 0, 0.5, 1, 1.5, ... (no half-pixel offset)
    row = np.array([0.0, 1.0, 2.0, 3.0], np.float32)
    out = np.asarray(resize_bilinear(jnp.asarray(row.reshape(1, 1, 4, 1)), (1, 8)))
    want = np.array([0.0, 0.5, 1.0, 1.5, 2.0, 2.5, 3.0, 3.0], np.float32)
    np.testing.assert_allclose(out[0, 0, :, 0], want, rtol=1e-6)


@pytest.mark.parametrize("align", [False, True])
def test_nearest_matches_scalar_reference(align):
    in_w, out_w = 7, 11
    row = np.arange(in_w, dtype=np.int32)
    lbl = np.tile(row, (1, 3, 1))  # (1, 3, 7)
    got = np.asarray(resize_nearest(jnp.asarray(lbl), (3, out_w), align))
    scale = (in_w - 1) / (out_w - 1) if align else in_w / out_w
    for i in range(out_w):
        src = i * scale
        idx = int(np.round(src)) if align else int(np.floor(src))
        idx = min(idx, in_w - 1)
        assert got[0, 0, i] == row[idx]


def test_nearest_preserves_dtype_and_values():
    lbl = np.random.RandomState(2).randint(0, 19, size=(2, 8, 16)).astype(np.int32)
    out = np.asarray(resize_nearest(jnp.asarray(lbl), (17, 33)))
    assert out.dtype == np.int32
    assert set(np.unique(out)) <= set(np.unique(lbl))


def test_nearest_4d_multinomial_labels():
    # rank-4 float multinomial labels are NN-resized channelwise
    lab = np.random.RandomState(3).rand(2, 4, 6, 15).astype(np.float32)
    out = np.asarray(resize_nearest(jnp.asarray(lab), (8, 12)))
    assert out.shape == (2, 8, 12, 15)
    # each output pixel is an exact copy of some input pixel's distribution
    np.testing.assert_allclose(out[:, 0, 0], lab[:, 0, 0])


@pytest.mark.parametrize("align", [False, True])
@pytest.mark.parametrize("in_hw,out_hw", [((4, 8), (32, 64)), ((7, 13), (5, 9))])
def test_mxu_matmul_path_matches_gather_path(align, in_hw, out_hw):
    img = np.random.RandomState(7).rand(3, *in_hw, 6).astype(np.float32)
    a = np.asarray(resize_bilinear(jnp.asarray(img), out_hw, align))
    b = np.asarray(resize_bilinear_mxu(jnp.asarray(img), out_hw, align))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_numpy_input_path():
    img = np.random.RandomState(4).rand(6, 9, 3).astype(np.float32)
    out = resize_bilinear(img, (3, 5))
    assert isinstance(out, np.ndarray)
    assert out.shape == (3, 5, 3)
