"""dot_conv_same == lax conv (conv2d_same semantics) and model-level parity.

The dot execution path (models/layers.dot_conv_same) reformulates every trunk
conv as MXU dot_generals so XLA keeps matmul layouts end-to-end
(docs/PERFORMANCE.md round 2). These tests pin the math: tap-shifted matmuls
must equal the conv op exactly (f32), and the full hierarchical model must
produce identical predictions and identical parameter trees under either
implementation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iv2019_tpu.models.layers import _same_padding, dot_conv_same

pytestmark = pytest.mark.slow  # multi-second tier; see pytest.ini


def _conv_ref(x, k, stride, rate):
    pad_h = _same_padding(k.shape[0], rate)
    pad_w = _same_padding(k.shape[1], rate)
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), (pad_h, pad_w),
        rhs_dilation=(rate, rate),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@pytest.mark.parametrize(
    "kh,stride,rate,cin,cout,hw",
    [
        (1, 1, 1, 8, 16, (12, 20)),
        (1, 2, 1, 8, 16, (12, 20)),
        (3, 1, 1, 8, 16, (12, 20)),
        (3, 2, 1, 8, 16, (12, 20)),
        (3, 1, 2, 8, 16, (16, 24)),
        (3, 1, 4, 8, 16, (16, 24)),
        (7, 2, 1, 3, 8, (18, 26)),
        (3, 1, 2, 8, 16, (15, 21)),  # odd sizes
    ],
)
def test_dot_conv_matches_conv(kh, stride, rate, cin, cout, hw):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, *hw, cin).astype(np.float32))
    k = jnp.asarray(rng.randn(kh, kh, cin, cout).astype(np.float32) * 0.1)
    got = dot_conv_same(x, k, stride=stride, rate=rate)
    want = _conv_ref(x, k, stride, rate)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-5)


def _tiny_model(conv_impl):
    from iv2019_tpu.models.model import HierarchicalSegmentationModel
    from iv2019_tpu.problem.taxonomy import get_taxonomy

    return HierarchicalSegmentationModel(
        taxonomy=get_taxonomy("cityscapes"),
        resnet_blocks=((1, 32, 8), (1, 64, 16), (1, 96, 24), (1, 128, 32)),
        feature_dims_decreased=16,
        conv_impl=conv_impl,
        dtype=jnp.float32,
    )


def test_model_parity_and_param_tree():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 64, 128, 3)).astype(np.float32))
    m_conv = _tiny_model("conv")
    m_dot = _tiny_model("dot")
    v = jax.jit(m_conv.init)(jax.random.PRNGKey(0), x)
    # identical parameter trees: dot mode restores conv-mode checkpoints
    v2 = jax.jit(m_dot.init)(jax.random.PRNGKey(0), x)
    assert jax.tree.structure(v) == jax.tree.structure(v2)
    for (p1, a), (p2, b) in zip(
        jax.tree_util.tree_leaves_with_path(v),
        jax.tree_util.tree_leaves_with_path(v2),
    ):
        assert p1 == p2 and a.shape == b.shape

    out_conv = jax.jit(m_conv.apply)(v, x)
    out_dot = jax.jit(m_dot.apply)(v, x)
    np.testing.assert_allclose(
        np.asarray(out_dot["l1_logits"]),
        np.asarray(out_conv["l1_logits"]),
        atol=1e-4, rtol=1e-4,
    )
    np.testing.assert_array_equal(
        np.asarray(out_dot["decisions"]), np.asarray(out_conv["decisions"])
    )


def test_gradients_match():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 16, 24, 4).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 4, 8).astype(np.float32) * 0.1)

    def loss_dot(k):
        return jnp.sum(dot_conv_same(x, k, stride=1, rate=2) ** 2)

    def loss_conv(k):
        return jnp.sum(_conv_ref(x, k, 1, 2) ** 2)

    g1 = jax.grad(loss_dot)(k)
    g2 = jax.grad(loss_conv)(k)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-3, rtol=1e-4)


def test_conv1x1_dot_bwd_matches_conv():
    """dot_bwd path: forward is the conv op itself; grads match autodiff."""
    from iv2019_tpu.models.layers import conv1x1_dot_bwd

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 12, 20, 8).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 1, 8, 16).astype(np.float32) * 0.1)
    # forward: bit-identical (same lax.conv call)
    np.testing.assert_array_equal(
        np.asarray(conv1x1_dot_bwd(x, k)), np.asarray(_conv_ref(x, k, 1, 1))
    )
    g = jnp.asarray(rng.randn(2, 12, 20, 16).astype(np.float32))

    def loss_dot(x, k):
        return jnp.sum(conv1x1_dot_bwd(x, k) * g)

    def loss_conv(x, k):
        return jnp.sum(_conv_ref(x, k, 1, 1) * g)

    got = jax.grad(loss_dot, argnums=(0, 1))(x, k)
    want = jax.grad(loss_conv, argnums=(0, 1))(x, k)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


def test_model_parity_dot_bwd():
    """Full model under conv_impl='dot_bwd': identical predictions + tree."""
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 64, 128, 3)).astype(np.float32))
    m_conv = _tiny_model("conv")
    m_db = _tiny_model("dot_bwd")
    v = jax.jit(m_conv.init)(jax.random.PRNGKey(0), x)
    v2 = jax.jit(m_db.init)(jax.random.PRNGKey(0), x)
    assert jax.tree.structure(v) == jax.tree.structure(v2)
    out_conv = jax.jit(m_conv.apply)(v, x)
    out_db = jax.jit(m_db.apply)(v, x)
    np.testing.assert_allclose(
        np.asarray(out_db["l1_logits"]), np.asarray(out_conv["l1_logits"]),
        atol=1e-4, rtol=1e-4,
    )
