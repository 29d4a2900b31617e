"""Fused bottleneck Pallas kernel vs the plain XLA composition.

Oracle: the exact eval-mode bottleneck math (1x1 -> BN -> relu -> dilated
3x3 SAME -> BN -> relu -> 1x1 -> BN -> +x -> relu) computed with lax convs
and unfolded BatchNorms; the kernel consumes the BN-folded weights.
Interpreter mode on CPU; the same kernel compiles for TPU unchanged.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iv2019_tpu.ops.pallas_block import (
    fold_bn,
    fused_bottleneck,
    fused_bottleneck_supported,
)


def _conv(x, k, rate):
    pad = rate * (k.shape[0] // 2)
    return jax.lax.conv_general_dilated(
        x.astype(jnp.float32), k.astype(jnp.float32),
        window_strides=(1, 1), padding=((pad, pad), (pad, pad)),
        rhs_dilation=(rate, rate),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _bn(x, scale, bias, mean, var, eps=1e-5):
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _ref_unit(x, params, rate):
    # bf16 between layers, f32 norm — the trunk's real dtype discipline
    # (models/layers.py: nn.Conv dtype=bf16, Norm computes f32)
    (k1, s1), (k2, s2), (k3, s3) = params
    y = jax.nn.relu(_bn(_conv(x, k1, 1), *s1)).astype(jnp.bfloat16)
    y = jax.nn.relu(_bn(_conv(y, k2, rate), *s2)).astype(jnp.bfloat16)
    y = _bn(_conv(y, k3, 1), *s3)
    return jax.nn.relu(x.astype(jnp.float32) + y)


def _make_unit(rng, c, m):
    def bn_stats(n):
        return (
            jnp.asarray(rng.uniform(0.5, 1.5, n), jnp.float32),   # scale
            jnp.asarray(rng.uniform(-0.5, 0.5, n), jnp.float32),  # bias
            jnp.asarray(rng.uniform(-0.2, 0.2, n), jnp.float32),  # mean
            jnp.asarray(rng.uniform(0.3, 1.2, n), jnp.float32),   # var
        )

    def kern(kh, kw, ci, co):
        return jnp.asarray(
            rng.normal(0, (2.0 / (kh * kw * ci)) ** 0.5, (kh, kw, ci, co)),
            jnp.float32,
        )

    return [
        (kern(1, 1, c, m), bn_stats(m)),
        (kern(3, 3, m, m), bn_stats(m)),
        (kern(1, 1, m, c), bn_stats(c)),
    ]


def _fold_unit(params):
    folded = []
    for k, (s, b, mu, v) in params:
        kf, bf = fold_bn(k, s, b, mu, v)
        folded.append((kf, bf))
    (k1, b1), (k2, b2), (k3, b3) = folded
    return (k1.reshape(k1.shape[2], k1.shape[3]), b1, k2, b2,
            k3.reshape(k3.shape[2], k3.shape[3]), b3)


@pytest.mark.parametrize(
    "n,h,w,c,m,rate,th",
    [
        (1, 16, 16, 128, 128, 2, 8),   # block3-like, minimal spatial
        (2, 24, 16, 128, 128, 2, 8),   # multi-image, odd stripe count (3)
        (1, 16, 24, 128, 128, 1, 8),   # rate 1 (block2-style)
        (1, 32, 16, 128, 128, 4, 8),   # rate 4 halo
    ],
)
def test_fused_bottleneck_matches_reference(n, h, w, c, m, rate, th):
    rng = np.random.RandomState(0)
    assert fused_bottleneck_supported(n, h, w, c, m, rate, th)
    params = _make_unit(rng, c, m)
    x = jnp.asarray(rng.normal(0, 1, (n, h, w, c)), jnp.float32)

    k1, b1, k2, b2, k3, b3 = _fold_unit(params)
    got = np.asarray(fused_bottleneck(
        x.astype(jnp.bfloat16), k1, b1, k2, b2, k3, b3,
        rate=rate, th=th, interpret=True,
    ).astype(jnp.float32))

    # tight: vs an XLA-conv oracle on the SAME folded bf16 weights — pins
    # the kernel's halo/shift/accumulation math to ~1 bf16 ulp
    bf = jnp.bfloat16
    xb = x.astype(bf)
    y = jax.nn.relu(_conv(xb, k1.reshape(1, 1, c, m).astype(bf), 1) + b1)
    y = jax.nn.relu(_conv(y.astype(bf), k2.astype(bf), rate) + b2)
    y = _conv(y.astype(bf), k3.reshape(1, 1, m, c).astype(bf), 1) + b3
    folded_want = np.asarray(jax.nn.relu(x.astype(jnp.float32) + y))
    err = np.abs(got - folded_want) / np.maximum(1.0, np.abs(folded_want))
    assert err.max() < 2e-2, err.max()

    # loose: vs the UNFOLDED eval-mode unit (conv -> BN -> relu). Folding
    # re-rounds kernel*gamma*rstd to bf16; the dispersion through three
    # layers + relu gives a fat but bounded tail on unit-variance inputs.
    want = np.asarray(_ref_unit(xb, params, rate))
    err = np.abs(got - want) / np.maximum(1.0, np.abs(want))
    assert err.max() < 1.5e-1, err.max()
    assert np.median(np.abs(got - want)) < 1e-2


def test_supported_gate():
    # block3 flagship: supported
    assert fused_bottleneck_supported(16, 64, 128, 1024, 256, 2)
    # block4 flagship: VMEM budget exceeded -> fallback
    assert not fused_bottleneck_supported(16, 64, 128, 2048, 512, 4)
    # non-128 channels -> fallback
    assert not fused_bottleneck_supported(16, 64, 128, 1024, 64, 2)
    # H not divisible by the stripe height -> fallback
    assert not fused_bottleneck_supported(16, 60, 128, 1024, 256, 2)
