"""Fused (grouped-conv) adaptation+heads must equal the unfused path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iv2019_tpu.models.model import HierarchicalSegmentationModel
from iv2019_tpu.problem.taxonomy import get_taxonomy

from helpers import TINY_BLOCKS

pytestmark = pytest.mark.slow  # multi-second tier; see pytest.ini

TAX = get_taxonomy("cityscapes")
C = 16  # feature_dims_decreased in the tiny config
W = max(TAX.num_l1_classes, TAX.num_vehicle_classes, TAX.num_human_classes)
BRANCHES = ("l1_features", "l2_vehicle_features", "l2_human_features")
HEADS = (
    ("l1_logits", TAX.num_l1_classes),
    ("l2_vehicle_logits", TAX.num_vehicle_classes),
    ("l2_human_logits", TAX.num_human_classes),
)


def _model(fused: bool, train: bool = False):
    return HierarchicalSegmentationModel(
        taxonomy=TAX,
        resnet_blocks=TINY_BLOCKS,
        feature_dims_decreased=C,
        fuse_adaptation=fused,
        accumulate_norm_statistics=train,
        dtype=jnp.float32,
    )


def _map_params(unfused_vars):
    """Build fused-layout variables from unfused ones."""
    fused = jax.tree_util.tree_map(np.asarray, unfused_vars)
    p = fused["params"]
    bs = fused["batch_stats"]

    def cat(getter, pad_to=None, pad_value=0.0):
        parts = []
        for b in BRANCHES:
            a = getter(b)
            if pad_to is not None and a.shape[-1] < pad_to:
                widths = [(0, 0)] * (a.ndim - 1) + [(0, pad_to - a.shape[-1])]
                a = np.pad(a, widths, constant_values=pad_value)
            parts.append(a)
        return np.concatenate(parts, axis=-1)

    for conv in ("conv1", "conv2", "conv3"):
        mod = f"adaptation_module/fused/{conv}"
        p[mod] = {
            "conv": {"kernel": cat(lambda b: p[f"adaptation_module/{b}"][conv]["conv"]["kernel"])},
            "norm": {"BatchNorm": {
                "scale": cat(lambda b: p[f"adaptation_module/{b}"][conv]["norm"]["BatchNorm"]["scale"]),
                "bias": cat(lambda b: p[f"adaptation_module/{b}"][conv]["norm"]["BatchNorm"]["bias"]),
            }},
        }
        bs[mod] = {"norm": {"BatchNorm": {
            "mean": cat(lambda b: bs[f"adaptation_module/{b}"][conv]["norm"]["BatchNorm"]["mean"]),
            "var": cat(lambda b: bs[f"adaptation_module/{b}"][conv]["norm"]["BatchNorm"]["var"]),
        }}}
    for b in BRANCHES:
        del p[f"adaptation_module/{b}"]
        del bs[f"adaptation_module/{b}"]

    # heads: pad each branch's kernel/norm params to the common width
    def hcat(leaf, pad_value):
        parts = []
        for name, n_out in HEADS:
            a = np.asarray(leaf(name))
            widths = [(0, 0)] * (a.ndim - 1) + [(0, W - a.shape[-1])]
            parts.append(np.pad(a, widths, constant_values=pad_value))
        return np.concatenate(parts, axis=-1)

    p["softmax_classifier/fused_logits"] = {
        "conv": {"kernel": hcat(
            lambda n: p[f"softmax_classifier/{n}"]["conv"]["kernel"], 0.0)},
        "norm": {"BatchNorm": {
            "scale": hcat(lambda n: p[f"softmax_classifier/{n}"]["norm"]["BatchNorm"]["scale"], 1.0),
            "bias": hcat(lambda n: p[f"softmax_classifier/{n}"]["norm"]["BatchNorm"]["bias"], 0.0),
        }},
    }
    bs["softmax_classifier/fused_logits"] = {"norm": {"BatchNorm": {
        "mean": hcat(lambda n: bs[f"softmax_classifier/{n}"]["norm"]["BatchNorm"]["mean"], 0.0),
        "var": hcat(lambda n: bs[f"softmax_classifier/{n}"]["norm"]["BatchNorm"]["var"], 1.0),
    }}}
    for name, _ in HEADS:
        del p[f"softmax_classifier/{name}"]
        del bs[f"softmax_classifier/{name}"]
    return fused


def test_fused_adaptation_matches_unfused():
    unfused = _model(False)
    fusedm = _model(True)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 64, 3).astype(np.float32))
    variables = unfused.init(jax.random.PRNGKey(0), x)
    # randomize batch stats so the norm path is non-trivial
    variables = jax.tree_util.tree_map(np.asarray, variables)
    rng = np.random.RandomState(1)
    variables["batch_stats"] = jax.tree_util.tree_map(
        lambda a: (rng.rand(*a.shape) * 0.5 + 0.5).astype(a.dtype),
        variables["batch_stats"],
    )
    preds_a = unfused.apply(variables, x)
    fused_vars = _map_params(variables)
    preds_b = fusedm.apply(fused_vars, x)
    for k in ("l1_logits", "l2_vehicle_logits", "l2_human_logits"):
        np.testing.assert_allclose(
            np.asarray(preds_a[k]), np.asarray(preds_b[k]), rtol=1e-4, atol=1e-4
        )
    np.testing.assert_array_equal(
        np.asarray(preds_a["decisions"]), np.asarray(preds_b["decisions"])
    )


def test_fused_adaptation_trains():
    from iv2019_tpu.train.fused_update import FusedSGDM
    from iv2019_tpu.train.state import create_fused_train_state
    from iv2019_tpu.train.step import make_train_step
    from helpers import synthetic_batch, tiny_settings

    settings = tiny_settings(fuse_adaptation=True)
    model = _model(True, train=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 32, 64, 3)))
    opt = FusedSGDM(settings, variables["params"], use_pallas=False)
    state = create_fused_train_state(variables, opt)
    step_fn = make_train_step(settings, model=model, fused_opt=opt)
    state, metrics = step_fn(state, synthetic_batch(settings))
    assert np.isfinite(float(metrics["total"]))
