"""Tests for the on-device augmentation library."""

import numpy as np
import jax
import jax.numpy as jnp

import pytest

from iv2019_tpu.ops.augment import (
    random_blur,
    random_color,
    random_downscaling,
    random_flipping,
    random_scaling,
    random_upscaling,
)

N, H, W = 4, 16, 24


def _data(seed=0):
    rng = np.random.RandomState(seed)
    images = jnp.asarray(rng.rand(N, H, W, 3).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 19, (N, H, W)).astype(np.int32))
    return images, labels


class TestFlipping:
    def test_shapes_and_determinism(self):
        images, labels = _data()
        k = jax.random.PRNGKey(0)
        i1, l1 = random_flipping(k, images, labels)
        i2, l2 = random_flipping(k, images, labels)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        assert i1.shape == images.shape and l1.shape == labels.shape

    def test_flip_is_mirror_or_identity(self):
        images, labels = _data()
        fi, fl = random_flipping(jax.random.PRNGKey(3), images, labels)
        for b in range(N):
            same = np.allclose(np.asarray(fi[b]), np.asarray(images[b]))
            mirrored = np.allclose(np.asarray(fi[b]), np.asarray(images[b, :, ::-1]))
            assert same or mirrored
            # label flip agrees with image flip
            if mirrored and not same:
                np.testing.assert_array_equal(
                    np.asarray(fl[b]), np.asarray(labels[b, :, ::-1])
                )

    def test_some_flipped_over_many_keys(self):
        images, labels = _data()
        outcomes = set()
        for s in range(8):
            fi, _ = random_flipping(jax.random.PRNGKey(s), images, labels)
            outcomes.add(bool(np.allclose(np.asarray(fi), np.asarray(images))))
        assert outcomes == {True, False} or False in outcomes


class TestScaling:
    def test_upscaling_shapes_and_range(self):
        images, labels = _data()
        pi, pl = random_upscaling(jax.random.PRNGKey(1), images, labels, (1.2, 2.0))
        assert pi.shape == images.shape and pl.shape == labels.shape
        assert float(pi.min()) >= 0.0 and float(pi.max()) <= 1.0
        # labels keep their discrete values
        assert set(np.unique(np.asarray(pl))) <= set(np.unique(np.asarray(labels)))

    def test_downscaling_pads_with_unlabeled(self):
        images, labels = _data()
        pi, pl = random_downscaling(
            jax.random.PRNGKey(2), images, labels, (1.5, 2.0), unlabeled_cid=19
        )
        assert pi.shape == images.shape
        # border pixels must be the unlabeled cid (canvas padding)
        pl_np = np.asarray(pl)
        assert (pl_np[:, 0, 0] == 19).all()
        assert (pl_np[:, -1, -1] == 19).all()
        # center region keeps real labels
        assert (np.asarray(pl)[:, H // 2, W // 2] != 19).any()

    def test_random_scaling_runs(self):
        images, labels = _data()
        pi, pl = random_scaling(
            jax.random.PRNGKey(4), images, labels, (1.0, 2.0), unlabeled_cid=19
        )
        assert pi.shape == images.shape and pl.shape == labels.shape


@pytest.mark.slow  # multi-second tier; see pytest.ini
class TestColorBlur:
    def test_color_shapes_range(self):
        images, _ = _data()
        out = random_color(jax.random.PRNGKey(5), images)
        assert out.shape == images.shape
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0

    def test_color_identity_branch_exists(self):
        images, _ = _data()
        # over several keys, at least one key leaves the batch unchanged
        identical = [
            np.allclose(
                np.asarray(random_color(jax.random.PRNGKey(s), images)),
                np.asarray(images),
            )
            for s in range(12)
        ]
        assert any(identical) and not all(identical)

    def test_blur_preserves_mean_approx(self):
        images, _ = _data()
        out = random_blur(jax.random.PRNGKey(6), images)
        assert out.shape == images.shape
        np.testing.assert_allclose(
            np.asarray(out).mean(), np.asarray(images).mean(), atol=0.05
        )
