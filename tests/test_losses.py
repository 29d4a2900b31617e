"""Tests for the hierarchical mixed-supervision loss on tiny synthetic batches."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iv2019_tpu.losses.hierarchical import (
    WEAK_LOSS_COEFFICIENT,
    define_losses,
    l2_regularization,
    weighted_loss,
)
from iv2019_tpu.problem.taxonomy import NUM_WEAK_CLASSES, get_taxonomy

TAX = get_taxonomy("cityscapes")
H = W = 4


def _preds(n, l1_decision_value=0, rng=None):
    """Build a predictions dict with controllable L1 decisions."""
    rng = rng or np.random.RandomState(0)
    l1_logits = rng.randn(n, H, W, TAX.num_l1_classes).astype(np.float32)
    preds = {
        "l1_logits": jnp.asarray(l1_logits),
        "l1_decisions": jnp.full((n, H, W), l1_decision_value, jnp.int32),
        "l2_vehicle_logits": jnp.asarray(
            rng.randn(n, H, W, TAX.num_vehicle_classes).astype(np.float32)
        ),
        "l2_human_logits": jnp.asarray(
            rng.randn(n, H, W, TAX.num_human_classes).astype(np.float32)
        ),
    }
    return preds


def _void_weak(n):
    """Weak labels entirely void."""
    lab = np.zeros((n, H, W, NUM_WEAK_CLASSES), np.float32)
    lab[..., -1] = 1.0
    return jnp.asarray(lab)


def _car_weak(n):
    """Weak labels: certain 'car' (weak cid 2) everywhere."""
    lab = np.zeros((n, H, W, NUM_WEAK_CLASSES), np.float32)
    lab[..., 2] = 1.0
    return jnp.asarray(lab)


class TestWeightedLoss:
    def test_sum_by_nonzero_weights(self):
        raw = jnp.asarray([1.0, 2.0, 3.0, 4.0])
        w = jnp.asarray([1.0, 0.0, 1.0, 0.0])
        assert float(weighted_loss(raw, w)) == pytest.approx((1 + 3) / 2)

    def test_all_zero_weights_is_zero(self):
        raw = jnp.asarray([1.0, 2.0])
        w = jnp.zeros(2)
        assert float(weighted_loss(raw, w)) == 0.0

    def test_fractional_weights_count_nonzero(self):
        raw = jnp.asarray([2.0, 2.0])
        w = jnp.asarray([0.5, 0.0])
        # sum(raw*w)=1.0, nonzero count=1
        assert float(weighted_loss(raw, w)) == pytest.approx(1.0)


class TestHierarchicalLosses:
    def test_l1_void_pixels_masked(self):
        n_pp = 2
        preds = _preds(n_pp + 2)
        # all per-pixel labels void (19 -> L1 void 13)
        labels = {
            "prolabels_per_pixel": jnp.full((n_pp, H, W), 19, jnp.int32),
            "prolabels_per_bbox": _void_weak(1),
            "prolabels_per_image": _void_weak(1),
        }
        losses = define_losses(preds, labels, TAX)
        assert float(losses["l1_segmentation"]) == 0.0

    def test_l1_loss_value_matches_manual(self):
        n_pp = 1
        preds = _preds(n_pp)
        labels = {
            "prolabels_per_pixel": jnp.zeros((n_pp, H, W), jnp.int32),  # 'road' = 0
            "prolabels_per_bbox": jnp.zeros((0, H, W, NUM_WEAK_CLASSES), jnp.float32),
            "prolabels_per_image": jnp.zeros((0, H, W, NUM_WEAK_CLASSES), jnp.float32),
        }
        losses = define_losses(preds, labels, TAX)
        logp = jax.nn.log_softmax(preds["l1_logits"], axis=-1)
        want = -np.mean(np.asarray(logp)[..., 0])
        assert float(losses["l1_segmentation"]) == pytest.approx(want, rel=1e-5)

    def test_weak_gated_by_l1_decision(self):
        """Weak car boxes only supervise the vehicle head where L1 says vehicle."""
        n_pp, n_pb = 1, 1
        labels = {
            "prolabels_per_pixel": jnp.full((n_pp, H, W), 19, jnp.int32),
            "prolabels_per_bbox": _car_weak(n_pb),
            "prolabels_per_image": jnp.zeros((0, H, W, NUM_WEAK_CLASSES), jnp.float32),
        }
        # L1 says vehicle everywhere -> weak weights on
        preds_on = _preds(n_pp + n_pb, l1_decision_value=TAX.cid_l1_vehicle)
        on = define_losses(preds_on, labels, TAX)
        w_on = np.asarray(on["l2_vehicle_weights"])
        assert (w_on[n_pp:] == 1.0).all()
        assert float(on["l2_vehicle_segmentation"]) > 0.0

        # L1 says road everywhere -> weak weights off, loss 0 (pp is void too)
        preds_off = _preds(n_pp + n_pb, l1_decision_value=0)
        off = define_losses(preds_off, labels, TAX)
        w_off = np.asarray(off["l2_vehicle_weights"])
        assert (w_off[n_pp:] == 0.0).all()
        assert float(off["l2_vehicle_segmentation"]) == 0.0

    def test_void_weak_labels_never_supervise(self):
        n_pp, n_pb = 1, 2
        preds = _preds(n_pp + n_pb, l1_decision_value=TAX.cid_l1_vehicle)
        labels = {
            "prolabels_per_pixel": jnp.full((n_pp, H, W), 19, jnp.int32),
            "prolabels_per_bbox": _void_weak(n_pb),
            "prolabels_per_image": jnp.zeros((0, H, W, NUM_WEAK_CLASSES), jnp.float32),
        }
        losses = define_losses(preds, labels, TAX)
        assert float(losses["l2_vehicle_segmentation"]) == 0.0
        assert float(losses["l2_human_segmentation"]) == 0.0

    def test_per_pixel_supervises_l2_heads(self):
        """Per-pixel 'car' (cid 13) supervises the vehicle head: weight 1."""
        n_pp = 1
        preds = _preds(n_pp)
        labels = {
            "prolabels_per_pixel": jnp.full((n_pp, H, W), 13, jnp.int32),
            "prolabels_per_bbox": jnp.zeros((0, H, W, NUM_WEAK_CLASSES), jnp.float32),
            "prolabels_per_image": jnp.zeros((0, H, W, NUM_WEAK_CLASSES), jnp.float32),
        }
        losses = define_losses(preds, labels, TAX)
        assert (np.asarray(losses["l2_vehicle_weights"]) == 1.0).all()
        # human head sees void for 'car' pixels -> zero weights
        assert (np.asarray(losses["l2_human_weights"]) == 0.0).all()

    def test_total_combination(self):
        n_pp, n_pb, n_pi = 2, 2, 1
        preds = _preds(n_pp + n_pb + n_pi, l1_decision_value=TAX.cid_l1_vehicle)
        rng = np.random.RandomState(5)
        labels = {
            "prolabels_per_pixel": jnp.asarray(rng.randint(0, 20, (n_pp, H, W))),
            "prolabels_per_bbox": _car_weak(n_pb),
            "prolabels_per_image": _void_weak(n_pi),
        }
        losses = define_losses(preds, labels, TAX)
        want = float(
            losses["l1_segmentation"]
            + WEAK_LOSS_COEFFICIENT
            * (losses["l2_vehicle_segmentation"] + losses["l2_human_segmentation"])
        )
        assert float(losses["total"]) == pytest.approx(want, rel=1e-6)

    def test_overlap_halves_still_supervise(self):
        """Pixels with P(void)=0.5 (2-way overlap) still produce weak loss."""
        n_pp, n_pb = 1, 1
        lab = np.zeros((n_pb, H, W, NUM_WEAK_CLASSES), np.float32)
        lab[..., 2] = 0.5  # car
        lab[..., -1] = 0.5  # half void
        labels = {
            "prolabels_per_pixel": jnp.full((n_pp, H, W), 19, jnp.int32),
            "prolabels_per_bbox": jnp.asarray(lab),
            "prolabels_per_image": jnp.zeros((0, H, W, NUM_WEAK_CLASSES), jnp.float32),
        }
        preds = _preds(n_pp + n_pb, l1_decision_value=TAX.cid_l1_vehicle)
        losses = define_losses(preds, labels, TAX)
        assert (np.asarray(losses["l2_vehicle_weights"])[n_pp:] == 1.0).all()


def test_l2_regularization_kernels_only():
    params = {
        "conv": {"kernel": jnp.ones((2, 2)), "bias": jnp.ones((2,))},
        "norm": {"scale": jnp.ones((3,))},
    }
    reg = float(l2_regularization(params, weight_decay=0.1))
    assert reg == pytest.approx(0.1 * 4 / 2)


def test_weak_loss_coefficient_knob():
    """total = L1 + coeff * (L2v + L2h); coeff is configurable (the
    reference hardcodes 0.1 — define_losses_hierarchical.py:203)."""
    n_pp, n_pb = 1, 1
    labels = {
        "prolabels_per_pixel": jnp.zeros((n_pp, H, W), jnp.int32),
        "prolabels_per_bbox": _car_weak(n_pb),
        "prolabels_per_image": jnp.zeros((0, H, W, NUM_WEAK_CLASSES), jnp.float32),
    }
    preds = _preds(n_pp + n_pb, l1_decision_value=TAX.cid_l1_vehicle)

    default = define_losses(preds, labels, TAX)
    assert float(default["total"]) == pytest.approx(
        float(default["l1_segmentation"])
        + WEAK_LOSS_COEFFICIENT
        * (float(default["l2_vehicle_segmentation"])
           + float(default["l2_human_segmentation"])), rel=1e-6)

    off = define_losses(preds, labels, TAX, weak_loss_coefficient=0.0)
    assert float(off["total"]) == pytest.approx(
        float(off["l1_segmentation"]), rel=1e-6)

    double = define_losses(preds, labels, TAX, weak_loss_coefficient=0.2)
    assert float(double["total"]) == pytest.approx(
        float(double["l1_segmentation"])
        + 0.2 * (float(double["l2_vehicle_segmentation"])
                 + float(double["l2_human_segmentation"])), rel=1e-6)


class TestBootstrappedCE:
    """--bootstrapping_percentage: bootstrapped CE keeps only the top-p%
    hardest per-pixel losses (the reference registers the flag at
    utils/utils.py:114-115 but never consumes it; semantics here follow its
    documented intent, Wu et al. 2016)."""

    def test_bootstrap_weights_exact_topk(self):
        from iv2019_tpu.losses.hierarchical import bootstrap_weights

        raw = jnp.asarray([[5.0, 1.0, 4.0, 2.0, 3.0, 9.0]])
        w = jnp.asarray([[1.0, 1.0, 1.0, 1.0, 1.0, 0.0]])  # 9.0 is void
        # 40% of 5 valid pixels -> k=2 -> keep losses {5.0, 4.0}
        out = np.asarray(bootstrap_weights(raw, w, 40))
        np.testing.assert_array_equal(out, [[1.0, 0.0, 1.0, 0.0, 0.0, 0.0]])

    def test_bootstrap_keeps_at_least_one(self):
        from iv2019_tpu.losses.hierarchical import bootstrap_weights

        raw = jnp.asarray([1.0, 2.0, 3.0])
        w = jnp.ones(3)
        out = np.asarray(bootstrap_weights(raw, w, 1))  # 1% of 3 -> k=1
        np.testing.assert_array_equal(out, [0.0, 0.0, 1.0])

    def test_bootstrap_all_void_stays_zero(self):
        from iv2019_tpu.losses.hierarchical import bootstrap_weights

        raw = jnp.asarray([1.0, 2.0])
        out = np.asarray(bootstrap_weights(raw, jnp.zeros(2), 50))
        np.testing.assert_array_equal(out, [0.0, 0.0])

    def test_define_losses_bootstrapped_l1_mean_of_hardest_half(self):
        n_pp = 2
        preds = _preds(n_pp + 2)
        rng = np.random.RandomState(3)
        labels = {
            "prolabels_per_pixel": jnp.asarray(
                rng.randint(0, 19, size=(n_pp, H, W)).astype(np.int32)
            ),
            "prolabels_per_bbox": _void_weak(1),
            "prolabels_per_image": _void_weak(1),
        }
        base = define_losses(preds, labels, TAX)
        boot = define_losses(preds, labels, TAX, bootstrapping_percentage=50)

        # recompute the expected value: raw L1 CE of every valid pixel,
        # keep the top half, average
        from iv2019_tpu.losses.hierarchical import _sparse_softmax_ce
        from iv2019_tpu.ops.segment_ops import gather_cids

        l1_labels = gather_cids(
            TAX.per_pixel_cids2l1_cids, labels["prolabels_per_pixel"]
        )
        raw = np.asarray(_sparse_softmax_ce(preds["l1_logits"][:n_pp], l1_labels))
        valid = np.asarray(l1_labels) <= int(TAX.per_pixel_cids2l1_cids.max()) - 1
        vals = np.sort(raw[valid])[::-1]
        k = max(1, valid.sum() * 50 // 100)
        expected = vals[:k].mean()
        assert float(boot["l1_segmentation"]) == pytest.approx(expected, rel=1e-5)
        # hard-mined mean loss must exceed the all-pixels mean
        assert float(boot["l1_segmentation"]) > float(base["l1_segmentation"])
        # L2 heads (the decision-gated mechanism) are untouched
        assert float(boot["l2_vehicle_segmentation"]) == pytest.approx(
            float(base["l2_vehicle_segmentation"]), rel=1e-6
        )

    def test_settings_validation(self):
        from iv2019_tpu.config import Settings

        Settings(bootstrapping_percentage=25).finalize().validate()  # ok
        with pytest.raises(ValueError, match="bootstrapping_percentage"):
            Settings(bootstrapping_percentage=0).finalize().validate()
        with pytest.raises(ValueError, match="bootstrapping_percentage"):
            Settings(bootstrapping_percentage=101).finalize().validate()
