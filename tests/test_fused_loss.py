"""Fused Pallas loss kernel vs the reference jnp composition.

The fused kernel (ops/fused_loss.py) must reproduce losses/hierarchical.
define_losses applied to resize_bilinear_mxu-upsampled logits — values,
decisions, and gradients w.r.t. the stride-8 logits. Runs in Pallas
interpreter mode on the CPU test mesh; the same code compiles with Mosaic
on TPU (exercised by bench.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from iv2019_tpu.losses.hierarchical import WEAK_LOSS_COEFFICIENT, define_losses
from iv2019_tpu.ops.fused_loss import define_losses_fused
from iv2019_tpu.ops.resize import resize_bilinear_mxu
from iv2019_tpu.ops.segment_ops import gather_cids
from iv2019_tpu.problem.taxonomy import NUM_WEAK_CLASSES, get_taxonomy

pytestmark = pytest.mark.slow  # multi-second tier; see pytest.ini


def _inputs(tax, seed, n_pp, n_pb, n_pi, h=8, w=16, scale=4):
    rng = np.random.RandomState(seed)
    n = n_pp + n_pb + n_pi
    H, W = h * scale, w * scale
    npp_classes = len(tax.per_pixel_cids2l1_cids)
    lr = {
        "l1_logits": rng.randn(n, h, w, tax.num_l1_classes).astype(np.float32) * 2,
        "l2_vehicle_logits": rng.randn(n, h, w, tax.num_vehicle_classes).astype(np.float32) * 2,
        "l2_human_logits": rng.randn(n, h, w, tax.num_human_classes).astype(np.float32) * 2,
    }

    def weak(nb):
        lab = rng.rand(nb, H, W, NUM_WEAK_CLASSES).astype(np.float32) ** 4
        # sparsify + include exact-void pixels
        lab[lab < 0.3] = 0.0
        void = rng.rand(nb, H, W) < 0.25
        lab[void] = 0.0
        lab[void, -1] = 1.0
        s = lab.sum(-1, keepdims=True)
        empty = s[..., 0] == 0
        lab[empty, -1] = 1.0
        s = lab.sum(-1, keepdims=True)
        return lab / s

    labels = {
        "prolabels_per_pixel": rng.randint(0, npp_classes, (n_pp, H, W)).astype(np.int32),
        "prolabels_per_bbox": weak(n_pb),
        "prolabels_per_image": weak(n_pi),
    }
    return lr, labels, (H, W)


def _reference(lr, labels, tax, out_hw):
    """The existing jnp path: upsample -> argmax -> define_losses."""
    preds = {
        k: resize_bilinear_mxu(jnp.asarray(v), out_hw, align_corners=True)
        for k, v in lr.items()
    }
    preds["l1_decisions"] = jnp.argmax(preds["l1_logits"], -1).astype(jnp.int32)
    return define_losses(preds, {k: jnp.asarray(v) for k, v in labels.items()}, tax)


@pytest.mark.parametrize("dataset", ["cityscapes", "vistas"])
@pytest.mark.parametrize("seed", [0, 1])
def test_fused_matches_reference(dataset, seed):
    tax = get_taxonomy(dataset)
    lr, labels, out_hw = _inputs(tax, seed, n_pp=2, n_pb=2, n_pi=1)
    want = _reference(lr, labels, tax, out_hw)
    got = define_losses_fused(
        {k: jnp.asarray(v) for k, v in lr.items()},
        {k: jnp.asarray(v) for k, v in labels.items()},
        tax, out_hw, interpret=True,
    )
    for k in ("total", "l1_segmentation", "l2_vehicle_segmentation",
              "l2_human_segmentation"):
        np.testing.assert_allclose(
            float(got[k]), float(want[k]), rtol=5e-5, atol=5e-6, err_msg=k
        )


def test_fused_decisions_match_model_fusion():
    tax = get_taxonomy("cityscapes")
    lr, labels, out_hw = _inputs(tax, 3, n_pp=1, n_pb=1, n_pi=0)
    preds = {
        k: resize_bilinear_mxu(jnp.asarray(v), out_hw, align_corners=True)
        for k, v in lr.items()
    }
    l1d = jnp.argmax(preds["l1_logits"], -1).astype(jnp.int32)
    vd = jnp.argmax(preds["l2_vehicle_logits"], -1).astype(jnp.int32)
    hd = jnp.argmax(preds["l2_human_logits"], -1).astype(jnp.int32)
    want = jnp.where(
        l1d == tax.cid_l1_vehicle,
        gather_cids(tax.l2_vehicle_cids2common_cids, vd),
        jnp.where(
            l1d == tax.cid_l1_human,
            gather_cids(tax.l2_human_cids2common_cids, hd),
            gather_cids(tax.l1_cids2common_cids, l1d),
        ),
    )
    got = define_losses_fused(
        {k: jnp.asarray(v) for k, v in lr.items()},
        {k: jnp.asarray(v) for k, v in labels.items()},
        tax, out_hw, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got["decisions"]), np.asarray(want))
    np.testing.assert_array_equal(np.asarray(got["l1_decisions"]), np.asarray(l1d))


@pytest.mark.parametrize("dataset", ["cityscapes"])
def test_fused_gradients_match_reference(dataset):
    tax = get_taxonomy(dataset)
    lr, labels, out_hw = _inputs(tax, 5, n_pp=2, n_pb=1, n_pi=1)
    labels_j = {k: jnp.asarray(v) for k, v in labels.items()}

    def ref_total(l1, veh, hum):
        losses = _reference(
            {"l1_logits": l1, "l2_vehicle_logits": veh, "l2_human_logits": hum},
            labels, tax, out_hw,
        )
        return losses["total"]

    def fused_total(l1, veh, hum):
        losses = define_losses_fused(
            {"l1_logits": l1, "l2_vehicle_logits": veh, "l2_human_logits": hum},
            labels_j, tax, out_hw, interpret=True,
        )
        return losses["total"]

    args = tuple(jnp.asarray(lr[k]) for k in
                 ("l1_logits", "l2_vehicle_logits", "l2_human_logits"))
    want = jax.grad(ref_total, argnums=(0, 1, 2))(*args)
    got = jax.grad(fused_total, argnums=(0, 1, 2))(*args)
    for g, wgrad, name in zip(got, want, ("l1", "veh", "hum")):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(wgrad), rtol=1e-4, atol=1e-6, err_msg=name
        )


def test_fused_no_weak_images():
    tax = get_taxonomy("cityscapes")
    lr, labels, out_hw = _inputs(tax, 7, n_pp=2, n_pb=0, n_pi=0)
    want = _reference(lr, labels, tax, out_hw)
    got = define_losses_fused(
        {k: jnp.asarray(v) for k, v in lr.items()},
        {k: jnp.asarray(v) for k, v in labels.items()},
        tax, out_hw, interpret=True,
    )
    np.testing.assert_allclose(float(got["total"]), float(want["total"]), rtol=5e-5)
    # the weak-gated heads see only per-pixel pixels
    np.testing.assert_allclose(
        float(got["l2_vehicle_segmentation"]),
        float(want["l2_vehicle_segmentation"]), rtol=5e-5,
    )


def test_fused_sharded_matches_unsharded():
    """shard_map path: per-device [pp|pb|pi] slices + psum must equal the
    global computation (guards the type-layout split — a naive shard of the
    concatenated batch hands devices type-mixed slices)."""
    from iv2019_tpu.parallel.mesh import create_mesh, shard_batch

    mesh = create_mesh()
    if mesh.size == 1:
        pytest.skip("single-device mesh")
    tax = get_taxonomy("cityscapes")
    rng = np.random.RandomState(0)
    n_pp = n_pb = n_pi = mesh.size
    h, w, S = 4, 8, 4
    H, W = h * S, w * S
    n = n_pp + n_pb + n_pi
    preds = {
        "l1_logits": rng.randn(n, h, w, tax.num_l1_classes).astype(np.float32) * 2,
        "l2_vehicle_logits": rng.randn(n, h, w, tax.num_vehicle_classes).astype(np.float32) * 2,
        "l2_human_logits": rng.randn(n, h, w, tax.num_human_classes).astype(np.float32) * 2,
    }
    eye = np.eye(NUM_WEAK_CLASSES, dtype=np.float32)
    labels = {
        "prolabels_per_pixel": rng.randint(0, 20, (n_pp, H, W)).astype(np.int32),
        "prolabels_per_bbox": eye[rng.randint(0, 15, (n_pb, H, W))],
        "prolabels_per_image": eye[rng.randint(0, 15, (n_pi, H, W))],
    }
    ref = define_losses_fused(
        {k: jnp.asarray(v) for k, v in preds.items()},
        {k: jnp.asarray(v) for k, v in labels.items()},
        tax, (H, W), interpret=True,
    )
    got = jax.jit(
        lambda p, l: define_losses_fused(p, l, tax, (H, W), interpret=True, mesh=mesh)
    )(shard_batch(preds, mesh), shard_batch(labels, mesh))
    for k in ("total", "l1_segmentation", "l2_vehicle_segmentation",
              "l2_human_segmentation"):
        np.testing.assert_allclose(float(got[k]), float(ref[k]), rtol=1e-5, err_msg=k)
    np.testing.assert_array_equal(
        np.asarray(got["decisions"]), np.asarray(ref["decisions"])
    )
    np.testing.assert_array_equal(
        np.asarray(got["l1_decisions"]), np.asarray(ref["l1_decisions"])
    )


def test_fused_loss_availability_gate():
    """Untileable heights (e.g. vistas' 621-row crop) are handled by
    zero-weight row padding, so every upsampling shape is available;
    downscaling is not."""
    from iv2019_tpu.ops.fused_loss import fused_loss_available

    cs = get_taxonomy("cityscapes")
    vs = get_taxonomy("vistas")
    assert fused_loss_available((64, 128), (512, 1024), cs)
    assert fused_loss_available((4, 8), (32, 64), cs)  # tiny test shapes
    assert fused_loss_available((78, 107), (621, 855), vs)  # padded rows
    assert not fused_loss_available((64, 128), (32, 64), cs)  # downscale


def test_padded_height_matches_reference():
    """An untileable output height (36 rows: no divisor <= 32 is a multiple
    of 8) runs through the zero-weight-padded kernel and must match the jnp
    reference exactly."""
    tax = get_taxonomy("cityscapes")
    lr, labels, _ = _inputs(tax, 11, n_pp=2, n_pb=1, n_pi=1, h=9, w=16, scale=4)
    out_hw = (36, 64)
    want = _reference(lr, labels, tax, out_hw)
    got = define_losses_fused(
        {k: jnp.asarray(v) for k, v in lr.items()},
        {k: jnp.asarray(v) for k, v in labels.items()},
        tax, out_hw, interpret=True,
    )
    for k in ("total", "l1_segmentation", "l2_vehicle_segmentation",
              "l2_human_segmentation"):
        np.testing.assert_allclose(
            float(got[k]), float(want[k]), rtol=5e-5, atol=5e-6, err_msg=k
        )
    assert got["decisions"].shape == (4, 36, 64)


def test_train_step_with_padded_height():
    """A vistas-like odd-height crop trains through the padded fused path."""
    from helpers import synthetic_batch, tiny_model, tiny_settings
    from iv2019_tpu.train.optimizer import make_optimizer
    from iv2019_tpu.train.state import create_train_state
    from iv2019_tpu.train.step import make_train_step

    # height 36: no divisor <= the 32-row tile cap is a multiple of 8
    # (divisors {1,2,3,4,6,9,12,18}) -> kernel unavailable, jnp path engages
    settings = tiny_settings(
        fused_optimizer=False,
        height_feature_extractor=36,
        width_feature_extractor=64,
    )

    model = tiny_model(settings)
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(settings).items()
             if not k.startswith(("imageids", "raw"))}
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 36, 64, 3), jnp.float32)
    )
    tx, _ = make_optimizer(settings)
    state = create_train_state(variables, tx, settings.ema_decay)
    step = make_train_step(settings, model=model, tx=tx)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["total"]))
