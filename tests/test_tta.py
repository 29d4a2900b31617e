"""Test-time-augmentation evaluation (multi-scale / flip probability
averaging) — a beyond-reference capability built on the hierarchically-
factorized common-space probabilities (models/model.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iv2019_tpu.config import Settings, build_argparser, settings_from_args
from iv2019_tpu.models.model import hierarchical_common_probabilities
from iv2019_tpu.ops.segment_ops import gather_cids
from iv2019_tpu.problem.taxonomy import get_taxonomy
from iv2019_tpu.train.step import _make_tta_eval_step, make_eval_step

from helpers import tiny_model, tiny_settings

pytestmark = pytest.mark.slow  # multi-second tier; see pytest.ini


def _random_preds(tax, rng, shape=(2, 8, 16)):
    def head(n):
        logits = rng.normal(size=shape + (n,)).astype(np.float32)
        return logits

    l1 = head(tax.num_l1_classes)
    veh = head(tax.num_vehicle_classes)
    hum = head(tax.num_human_classes)
    return {
        "l1_logits": l1,
        "l1_probabilities": jax.nn.softmax(jnp.asarray(l1), axis=-1),
        "l2_vehicle_logits": veh,
        "l2_vehicle_probabilities": jax.nn.softmax(jnp.asarray(veh), axis=-1),
        "l2_human_logits": hum,
        "l2_human_probabilities": jax.nn.softmax(jnp.asarray(hum), axis=-1),
    }


@pytest.mark.parametrize("dataset", ["cityscapes", "vistas"])
def test_common_probabilities_sum_to_one(dataset):
    tax = get_taxonomy(dataset)
    preds = _random_preds(tax, np.random.RandomState(0))
    p = hierarchical_common_probabilities(preds, tax)
    assert p.shape[-1] == tax.num_common_classes
    np.testing.assert_allclose(np.asarray(p).sum(-1), 1.0, atol=1e-5)
    assert np.asarray(p).min() >= 0.0


@pytest.mark.parametrize("dataset", ["cityscapes", "vistas"])
def test_common_probabilities_argmax_matches_fused_decisions(dataset):
    """With confident (sharpened) heads the factorized argmax must equal the
    model's argmax decision fusion (reference :95-117 semantics)."""
    tax = get_taxonomy(dataset)
    preds = _random_preds(tax, np.random.RandomState(1), shape=(2, 16, 16))
    sharp = {
        k.replace("logits", "probabilities"): jax.nn.softmax(
            50.0 * jnp.asarray(v), axis=-1
        )
        for k, v in preds.items()
        if k.endswith("logits")
    }
    l1_decs = jnp.argmax(jnp.asarray(preds["l1_logits"]), axis=-1)
    veh_decs = jnp.argmax(jnp.asarray(preds["l2_vehicle_logits"]), axis=-1)
    hum_decs = jnp.argmax(jnp.asarray(preds["l2_human_logits"]), axis=-1)
    fused = jnp.where(
        l1_decs == tax.cid_l1_vehicle,
        gather_cids(tax.l2_vehicle_cids2common_cids, veh_decs),
        jnp.where(
            l1_decs == tax.cid_l1_human,
            gather_cids(tax.l2_human_cids2common_cids, hum_decs),
            gather_cids(tax.l1_cids2common_cids, l1_decs),
        ),
    )
    p = hierarchical_common_probabilities(sharp, tax)
    np.testing.assert_array_equal(np.asarray(jnp.argmax(p, -1)), np.asarray(fused))


@pytest.fixture(scope="module")
def tiny_eval():
    settings = tiny_settings()
    model = tiny_model(settings, train=False)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 64, 3), jnp.float32)
    )
    return settings, model, variables


def _tta_fn(settings, model, scales, flip):
    tax = get_taxonomy(settings.per_pixel_dataset_name)
    tcids2ecids = list(range(19)) + [19]  # voids already replaced
    return _make_tta_eval_step(
        settings, model, tax, tcids2ecids, 20, False, scales, flip
    )


def test_flip_tta_matches_manual_ensemble(tiny_eval):
    """flip=True must equal the hand-built two-pass ensemble: forward the
    image and its mirror, un-mirror the second distribution, average, argmax.

    (A symmetric-image identity test is NOT valid here: stride-2 SAME convs
    pad asymmetrically, so the network itself is not flip-equivariant.)
    """
    settings, model, variables = tiny_eval
    tax = get_taxonomy(settings.per_pixel_dataset_name)
    rng = np.random.RandomState(2)
    images = jnp.asarray(rng.uniform(-1, 1, (2, 32, 64, 3)).astype(np.float32))
    labels = jnp.zeros((2, 32, 64), jnp.int32)
    args = (variables["params"], variables["batch_stats"], images, labels)
    cm_flip = _tta_fn(settings, model, (1.0,), True)(*args)

    def probs(im):
        preds = model.apply(variables, im)
        return hierarchical_common_probabilities(preds, tax)

    avg = probs(images) + probs(images[:, :, ::-1, :])[:, :, ::-1, :]
    decs = jnp.argmax(avg, axis=-1).astype(jnp.int32)  # identity cid remap
    from iv2019_tpu.ops.confusion import confusion_matrix

    cm_manual = confusion_matrix(labels, decs, 20)
    np.testing.assert_array_equal(np.asarray(cm_flip), np.asarray(cm_manual))


def test_multiscale_tta_conserves_pixels(tiny_eval):
    settings, model, variables = tiny_eval
    images = jnp.asarray(
        np.random.RandomState(3).uniform(-1, 1, (2, 32, 64, 3)).astype(np.float32)
    )
    labels = jnp.zeros((2, 32, 64), jnp.int32)
    fn = _tta_fn(settings, model, (0.5, 1.0), True)
    cm = fn(variables["params"], variables["batch_stats"], images, labels)
    assert cm.shape == (20, 20)
    assert int(np.asarray(cm).sum()) == 2 * 32 * 64


def test_make_eval_step_dispatches_to_tta(tiny_eval):
    settings, model, variables = tiny_eval
    s = settings.replace(eval_scales=(0.5, 1.0), eval_flip=True, mode="eval")
    fn = make_eval_step(s, model=model, tcids2ecids=list(range(19)) + [-1])
    images = jnp.zeros((2, 32, 64, 3), jnp.float32)
    labels = jnp.zeros((2, 32, 64), jnp.int32)
    cm = fn(variables["params"], variables["batch_stats"], images, labels)
    assert cm.shape == (20, 20)
    assert int(np.asarray(cm).sum()) == 2 * 32 * 64


def test_cli_flags_and_validation():
    p = build_argparser("eval")
    args = p.parse_args(
        ["log", "16", "prob.json", "--eval_scales", "0.75", "1.0", "1.25",
         "--eval_flip"]
    )
    s = settings_from_args(args, "eval")
    assert s.eval_scales == (0.75, 1.0, 1.25)
    assert s.eval_flip is True

    with pytest.raises(ValueError, match="eval_scales must be positive"):
        tiny_settings(eval_scales=(0.0, 1.0))
    with pytest.raises(ValueError, match="spatial"):
        tiny_settings(
            eval_flip=True, spatial_partitions=2,
            height_feature_extractor=32, width_feature_extractor=64,
        )
