"""Root-conv wgrad Pallas kernel vs XLA's own VJP (interpret mode on CPU).

The kernel targets the audit's worst op (docs/PERFORMANCE.md: root wgrad at
~5.5x its modeled floor); these tests pin exact numerics on small shapes so
the on-chip microbenchmark (tools/wgrad_bench.py) only measures speed.

The kernel is bf16-by-design (the W-pairing bitcast packs two bf16 lanes
into one i32), with f32 MXU accumulation — so numerics are pinned against
the XLA VJP evaluated on the SAME bf16-rounded operands, where the only
residual difference is f32 summation order (~1e-6 relative).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iv2019_tpu.ops.pallas_wgrad import (
    root_conv_wgrad,
    root_conv_wgrad_reference,
    wgrad_supported,
)

pytestmark = pytest.mark.slow  # multi-second tier; see pytest.ini


def _case(n, h, w, c, cout, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.uniform(-1, 1, (n, h, w, c)), jnp.bfloat16)
    dy = jnp.asarray(rng.uniform(-1, 1, (n, h // 2, w // 2, cout)), jnp.bfloat16)
    return x, dy


def _want(x, dy, **kw):
    return root_conv_wgrad_reference(
        x.astype(jnp.float32), dy.astype(jnp.float32), **kw
    )


@pytest.mark.parametrize(
    "n,h,w,c,cout,ot",
    [
        (1, 16, 16, 3, 8, 8),
        (2, 32, 64, 3, 16, 16),
        (2, 32, 64, 3, 16, 8),   # multiple oh tiles
        (1, 16, 32, 1, 8, 8),    # single channel
        (1, 24, 40, 3, 8, 4),    # OH=12 -> OT=4 tile path
    ],
)
def test_matches_xla_vjp(n, h, w, c, cout, ot):
    x, dy = _case(n, h, w, c, cout)
    want = _want(x, dy)
    got = root_conv_wgrad(x, dy, ot=ot, interpret=True)
    assert got.shape == (7, 7, c, cout)
    assert got.dtype == jnp.float32
    # same bf16 operands; only f32 summation order differs
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_f32_inputs_are_rounded_to_bf16():
    """f32 inputs are accepted but rounded: the pairing trick is bf16-only.

    models/resnet.py therefore routes f32 params to the XLA fallback; this
    test pins the (documented) kernel-side rounding behavior.
    """
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)), jnp.float32)
    dy = jnp.asarray(rng.uniform(-1, 1, (2, 16, 16, 16)), jnp.float32)
    want = _want(x.astype(jnp.bfloat16), dy.astype(jnp.bfloat16))
    got = root_conv_wgrad(x, dy, ot=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_smaller_kernel_size():
    x, dy = _case(1, 24, 24, 2, 8)
    want = _want(x, dy, kernel_size=5)
    got = root_conv_wgrad(x, dy, kernel_size=5, ot=12, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_wgrad_supported_gate():
    ok = ((16, 512, 1024, 3), (16, 256, 512, 64))
    assert wgrad_supported(ok[0], ok[1], 7, 2)
    # stride 1 and even kernels are out of scope
    assert not wgrad_supported(ok[0], ok[1], 7, 1)
    assert not wgrad_supported(ok[0], ok[1], 6, 2)
    # odd input dims (oh != h//2 contract broken)
    assert not wgrad_supported((16, 511, 1024, 3), ok[1], 7, 2)
    # OH with no 4/8/16 tile divisor
    assert not wgrad_supported((1, 14, 256, 3), (1, 7, 128, 3), 7, 2)


def test_model_flag_grads_match_default():
    """root_wgrad_pallas=True must give identical gradients to the default
    ConvSame root (same params tree, same forward; Pallas wgrad only).

    bf16 compute dtype so the Pallas kernel path (not the f32 XLA fallback)
    is the one exercised on TPU; under interpret/CPU the same code runs.
    """
    from iv2019_tpu.models.resnet import ResNetV1

    blocks = ((1, 32, 8),)  # tiny stack: root + one unit

    def make(flag):
        return ResNetV1(
            blocks=blocks, output_stride=8, use_running_average=True,
            root_wgrad_pallas=flag, dtype=jnp.bfloat16,
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
        return jnp.sum(out.astype(jnp.float32) ** 2)

    l0, g0 = jax.value_and_grad(lambda v: loss(m0, v))(v0)
    l1, g1 = jax.value_and_grad(lambda v: loss(m1, v))(v0)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        # both paths see bf16 operands; f32 accumulation order may differ
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=2e-2, atol=2e-2,
        )


def test_f32_model_falls_back_to_exact_xla():
    """With f32 params the custom-vjp root must be bit-identical to the
    plain ConvSame gradient (XLA fallback, no bf16 rounding anywhere)."""
    from iv2019_tpu.models.resnet import ResNetV1

    blocks = ((1, 32, 8),)

    def make(flag):
        return ResNetV1(
            blocks=blocks, output_stride=8, use_running_average=True,
            root_wgrad_pallas=flag, dtype=jnp.float32,
        )

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 32, 64, 3)), jnp.float32)
    m0, m1 = make(False), make(True)
    v0 = m0.init(jax.random.PRNGKey(0), x)

    def loss(model, variables):
        out, _ = model.apply(variables, x)
        return jnp.sum(out**2)

    _, g0 = jax.value_and_grad(lambda v: loss(m0, v))(v0)
    _, g1 = jax.value_and_grad(lambda v: loss(m1, v))(v0)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-5
        )
