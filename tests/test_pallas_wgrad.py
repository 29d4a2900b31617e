"""Root-conv wgrad Pallas kernel vs XLA's own VJP (interpret mode on CPU).

The kernel targets the audit's worst op (docs/PERFORMANCE.md: root wgrad at
~5.5x its achievable floor); these tests pin exact numerics on small shapes
so the on-chip microbenchmark (tools/wgrad_bench.py) only measures speed.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iv2019_tpu.ops.pallas_wgrad import (
    root_conv_wgrad,
    root_conv_wgrad_reference,
)


def _case(n, h, w, c, cout, k=7, seed=0, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.uniform(-1, 1, (n, h, w, c)), dtype)
    dy = jnp.asarray(rng.uniform(-1, 1, (n, h // 2, w // 2, cout)), dtype)
    return x, dy


@pytest.mark.parametrize(
    "n,h,w,c,cout,ot",
    [
        (1, 16, 16, 3, 8, 8),
        (2, 32, 64, 3, 16, 16),
        (2, 32, 64, 3, 16, 8),   # multiple oh tiles
        (1, 16, 32, 1, 8, 8),    # single channel
    ],
)
def test_matches_xla_vjp(n, h, w, c, cout, ot):
    x, dy = _case(n, h, w, c, cout)
    want = root_conv_wgrad_reference(x, dy)
    got = root_conv_wgrad(x, dy, ot=ot, interpret=True)
    assert got.shape == (7, 7, c, cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_bf16_inputs_f32_accumulation():
    x, dy = _case(2, 32, 32, 3, 16, dtype=jnp.bfloat16)
    want = root_conv_wgrad_reference(x.astype(jnp.float32), dy.astype(jnp.float32))
    got = root_conv_wgrad(x, dy, ot=16, interpret=True)
    assert got.dtype == jnp.float32
    # bf16 operand rounding only; accumulation is f32
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2)


def test_smaller_kernel_size():
    x, dy = _case(1, 24, 24, 2, 8)
    want = root_conv_wgrad_reference(x, dy, kernel_size=5)
    got = root_conv_wgrad(x, dy, kernel_size=5, ot=12, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_model_flag_grads_match_default():
    """root_wgrad_pallas=True must give identical gradients to the default
    ConvSame root (same params tree, same forward, Pallas wgrad only)."""
    from iv2019_tpu.models.resnet import ResNetV1

    blocks = ((1, 32, 8),)  # tiny stack: root + one unit

    def make(flag):
        return ResNetV1(
            blocks=blocks, output_stride=8, use_running_average=True,
            root_wgrad_pallas=flag, dtype=jnp.float32,
        )

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 32, 64, 3)), jnp.float32)
    m0, m1 = make(False), make(True)
    v0 = m0.init(jax.random.PRNGKey(0), x)
    # identical parameter trees (checkpoint compatibility)
    assert jax.tree.structure(v0) == jax.tree.structure(
        m1.init(jax.random.PRNGKey(0), x)
    )

    def loss(model, variables):
        out, _ = model.apply(variables, x)
        return jnp.sum(out**2)

    l0, g0 = jax.value_and_grad(lambda v: loss(m0, v))(v0)
    l1, g1 = jax.value_and_grad(lambda v: loss(m1, v))(v0)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    flat0 = jax.tree.leaves(g0)
    flat1 = jax.tree.leaves(g1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-5
        )
