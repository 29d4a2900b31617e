"""Randomized fuzz of the TF1-exact resize kernels against TensorFlow.

The resize semantics are the #1 numerical-parity hazard (SURVEY §7): mIoU
depends on the NN label resize and the align-corners bilinear upsample.
This fuzzes many random size pairs through all four (method x align)
combinations against TF itself, for the jnp, numpy, and native C++ paths.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from iv2019_tpu import native
from iv2019_tpu.ops.resize import resize_bilinear, resize_nearest_hw

RNG = np.random.RandomState(20260816)
SIZE_PAIRS = [
    (tuple(RNG.randint(2, 90, 2)), tuple(RNG.randint(2, 90, 2))) for _ in range(12)
]


@pytest.mark.parametrize("in_hw,out_hw", SIZE_PAIRS)
@pytest.mark.parametrize("align", [False, True])
def test_bilinear_fuzz(in_hw, out_hw, align):
    img = RNG.rand(1, *in_hw, 2).astype(np.float32)
    want = tf.compat.v1.image.resize_images(
        tf.constant(img), out_hw, method=tf.image.ResizeMethod.BILINEAR,
        align_corners=align,
    ).numpy()
    got = np.asarray(resize_bilinear(img, out_hw, align_corners=align))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    if native.available():
        got_native = native.resize_bilinear_f32(img[0], out_hw, align)
        np.testing.assert_allclose(got_native, want[0], rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("in_hw,out_hw", SIZE_PAIRS)
@pytest.mark.parametrize("align", [False, True])
def test_nearest_fuzz(in_hw, out_hw, align):
    lbl = RNG.randint(0, 66, size=(*in_hw, 1)).astype(np.int32)
    want = tf.compat.v1.image.resize_images(
        tf.constant(lbl[None]), out_hw,
        method=tf.image.ResizeMethod.NEAREST_NEIGHBOR, align_corners=align,
    ).numpy()[0, ..., 0]
    got = np.asarray(resize_nearest_hw(lbl[..., 0], out_hw, align_corners=align))
    np.testing.assert_array_equal(got, want)
    if native.available():
        got_native = native.resize_nearest(lbl[..., 0], out_hw, align)
        np.testing.assert_array_equal(got_native, want)
