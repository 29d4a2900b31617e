"""Tests for hierarchical decision fusion and model output contracts."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iv2019_tpu.losses.hierarchical import define_losses
from iv2019_tpu.ops.segment_ops import gather_cids
from iv2019_tpu.problem.taxonomy import NUM_WEAK_CLASSES, get_taxonomy


def _fuse(tax, l1_decs, veh_decs, hum_decs):
    """Reference fusion semantics (model.py decision merge)."""
    return jnp.where(
        l1_decs == tax.cid_l1_vehicle,
        gather_cids(tax.l2_vehicle_cids2common_cids, veh_decs),
        jnp.where(
            l1_decs == tax.cid_l1_human,
            gather_cids(tax.l2_human_cids2common_cids, hum_decs),
            gather_cids(tax.l1_cids2common_cids, l1_decs),
        ),
    )


@pytest.mark.parametrize("name", ["cityscapes", "vistas"])
def test_fusion_routing(name):
    tax = get_taxonomy(name)
    # grid of all (l1, veh, hum) combos on a few samples
    rng = np.random.RandomState(0)
    l1 = jnp.asarray(rng.randint(0, tax.num_l1_classes, (2, 8, 8)))
    veh = jnp.asarray(rng.randint(0, tax.num_vehicle_classes, (2, 8, 8)))
    hum = jnp.asarray(rng.randint(0, tax.num_human_classes, (2, 8, 8)))
    out = np.asarray(_fuse(tax, l1, veh, hum))
    l1n, vn, hn = np.asarray(l1), np.asarray(veh), np.asarray(hum)
    for idx in np.ndindex(out.shape):
        if l1n[idx] == tax.cid_l1_vehicle:
            want = tax.l2_vehicle_cids2common_cids[vn[idx]]
        elif l1n[idx] == tax.cid_l1_human:
            want = tax.l2_human_cids2common_cids[hn[idx]]
        else:
            want = tax.l1_cids2common_cids[l1n[idx]]
        assert out[idx] == want


def test_gather_cids_select_chain_matches_take():
    rng = np.random.RandomState(1)
    table = rng.randint(0, 66, size=53).astype(np.int32)
    idx = jnp.asarray(rng.randint(0, 53, size=(3, 17, 29)))
    a = np.asarray(gather_cids(table, idx))
    b = np.asarray(jnp.take(jnp.asarray(table), idx, axis=0))
    np.testing.assert_array_equal(a, b)


def test_gather_cids_large_table_falls_back():
    table = np.arange(1000, dtype=np.int32)[::-1].copy()
    idx = jnp.asarray([0, 500, 999])
    np.testing.assert_array_equal(np.asarray(gather_cids(table, idx)), [999, 499, 0])


def test_losses_vistas_taxonomy():
    """The loss runs with the vistas label spaces (53/12/5 heads)."""
    tax = get_taxonomy("vistas")
    rng = np.random.RandomState(2)
    H = W = 4
    n_pp, n_pb = 1, 1
    preds = {
        "l1_logits": jnp.asarray(rng.randn(2, H, W, 53).astype(np.float32)),
        "l1_decisions": jnp.full((2, H, W), tax.cid_l1_vehicle, jnp.int32),
        "l2_vehicle_logits": jnp.asarray(rng.randn(2, H, W, 12).astype(np.float32)),
        "l2_human_logits": jnp.asarray(rng.randn(2, H, W, 5).astype(np.float32)),
    }
    weak = np.zeros((n_pb, H, W, NUM_WEAK_CLASSES), np.float32)
    weak[..., 2] = 1.0  # car
    labels = {
        "prolabels_per_pixel": jnp.asarray(rng.randint(0, 66, (n_pp, H, W))),
        "prolabels_per_bbox": jnp.asarray(weak),
        "prolabels_per_image": jnp.zeros((0, H, W, NUM_WEAK_CLASSES), jnp.float32),
    }
    losses = define_losses(preds, labels, tax)
    assert np.isfinite(float(losses["total"]))
    # car boxes gated on vehicle L1 decisions supervise the vehicle head
    assert float(losses["l2_vehicle_segmentation"]) > 0.0
