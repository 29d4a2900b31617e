"""cv2-oracle parity for the blur augmentations.

The reference blurs via a cv2 py_func (augmentation_library.py:408-466):
median (uint8-quantized, square window, BORDER_REPLICATE) or bilateral
(circular window d//2, sigmaColor=sigmaSpace=rint(25*(res+1)),
BORDER_REFLECT_101). These tests pin the on-device reimplementation
against cv2 itself at every radius the reference can draw.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax
import jax.numpy as jnp

from iv2019_tpu.ops.augment import (
    _bilateral_filter,
    _median_filter,
    blur_max_radius,
    blur_sigma_space,
    random_blur,
)


def _img(h=40, w=56, seed=0):
    rng = np.random.RandomState(seed)
    # piecewise-smooth image (edges matter for median/bilateral)
    base = np.linspace(0, 0.9, w, dtype=np.float32)[None, :, None]
    img = np.broadcast_to(base, (h, w, 3)).copy()
    img[h // 2 :, : w // 3] = 0.1
    img += rng.uniform(0, 0.05, (h, w, 3)).astype(np.float32)
    return np.clip(img, 0.0, 1.0 - 1e-3)


class TestReferenceConstants:
    def test_radius_and_sigma_formulas(self):
        # 0.5 MP: rint(1.4*1.5)=2 -> sizes {3,5}; sigma rint(25*1.5)=38
        assert blur_max_radius(512, 1024) == 2
        assert blur_sigma_space(512, 1024) == 38.0
        # 2.097 MP (cityscapes native): rint(1.4*3.097)=4 -> sizes up to 9
        # (the reference's "9 good for 2MP" note); sigma rint(25*3.097)=77
        assert blur_max_radius(1024, 2048) == 4
        assert blur_sigma_space(1024, 2048) == 77.0


class TestMedianParity:
    @pytest.mark.parametrize("radius", [1, 2, 3, 4])
    def test_vs_cv2_medianblur(self, radius):
        img = _img(seed=radius)
        ksize = 2 * radius + 1
        img8 = (img * 255).astype(np.uint8)
        want = cv2.medianBlur(img8, ksize).astype(np.float32) / 255.0
        got = np.asarray(
            _median_filter(jnp.asarray(img), jnp.int32(radius), radius)
        )
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_masked_radius_equals_unmasked(self):
        # traced radius 1 inside a max_radius-3 window == plain 3x3 median
        img = _img(seed=9)
        a = np.asarray(_median_filter(jnp.asarray(img), jnp.int32(1), 3))
        b = np.asarray(_median_filter(jnp.asarray(img), jnp.int32(1), 1))
        np.testing.assert_allclose(a, b, atol=1e-6)


class TestBilateralParity:
    @pytest.mark.parametrize("radius,sigma", [(1, 38.0), (2, 38.0), (4, 75.0)])
    def test_vs_cv2_bilateral(self, radius, sigma):
        img = _img(seed=radius)
        d = 2 * radius + 1
        want = cv2.bilateralFilter(img, d, sigma, sigma)
        got = np.asarray(
            _bilateral_filter(jnp.asarray(img), jnp.int32(radius), radius, sigma)
        )
        # cv2 uses an exp() lookup table -> small approximation error
        np.testing.assert_allclose(got, want, atol=2e-3)

    def test_small_sigma_edge_preserving(self):
        # with a genuinely selective range kernel, edges survive a blur that
        # a plain Gaussian would smear
        img = _img()
        out = np.asarray(
            _bilateral_filter(jnp.asarray(img), jnp.int32(4), 4, 0.05)
        )
        want = cv2.bilateralFilter(img, 9, 0.05, 0.05)
        np.testing.assert_allclose(out, want, atol=2e-3)


@pytest.mark.slow  # multi-second tier; see pytest.ini
class TestRandomBlur:
    def test_shapes_and_range(self):
        rng = np.random.RandomState(0)
        images = jnp.asarray(rng.uniform(0, 1, (4, 32, 48, 3)).astype(np.float32))
        for s in range(6):
            out = random_blur(jax.random.PRNGKey(s), images)
            assert out.shape == images.shape
            assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0

    def test_identity_branch_probability_half(self):
        rng = np.random.RandomState(1)
        images = jnp.asarray(rng.uniform(0, 1, (2, 24, 24, 3)).astype(np.float32))
        identical = [
            np.allclose(
                np.asarray(random_blur(jax.random.PRNGKey(s), images)),
                np.asarray(images),
            )
            for s in range(16)
        ]
        assert any(identical) and not all(identical)

    def test_batchwide_selector_per_image_radius(self):
        # find a key on the median branch; two images with different
        # content must both be median-filtered (same branch, own radius)
        img = _img(h=24, w=24)
        images = jnp.stack([jnp.asarray(img), jnp.asarray(img[::-1])])
        for s in range(32):
            key = jax.random.PRNGKey(s)
            blu_r = int(jax.random.randint(jax.random.split(key)[0], (), 0, 4))
            if blu_r == 0:
                out = np.asarray(random_blur(key, images))
                assert not np.allclose(out[0], np.asarray(images[0]))
                assert not np.allclose(out[1], np.asarray(images[1]))
                return
        pytest.fail("no median key found in 32 seeds")
