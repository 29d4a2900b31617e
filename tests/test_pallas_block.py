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


def _randomize_stats(variables, rng):
    """Perturb BN scale/bias/mean/var so folding is exercised non-trivially."""
    import flax

    flat = flax.traverse_util.flatten_dict(variables)
    out = {}
    for k, v in flat.items():
        leaf = k[-1]
        if leaf in ("scale", "bias"):
            out[k] = jnp.asarray(
                rng.uniform(0.6, 1.4, v.shape) if leaf == "scale"
                else rng.uniform(-0.3, 0.3, v.shape), v.dtype)
        elif leaf == "mean":
            out[k] = jnp.asarray(rng.uniform(-0.2, 0.2, v.shape), v.dtype)
        elif leaf == "var":
            out[k] = jnp.asarray(rng.uniform(0.4, 1.1, v.shape), v.dtype)
        else:
            out[k] = v
    return flax.traverse_util.unflatten_dict(out)


def test_bottleneck_fused_flag_matches_unfused():
    """Same variables, fused_block on/off -> same eval output (folded-BN tol)."""
    from iv2019_tpu.models.layers import BottleneckV1

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.normal(0, 1, (1, 16, 16, 128)), jnp.bfloat16)
    kw = dict(depth=128, depth_bottleneck=128, stride=1, rate=2,
              use_running_average=True, dtype=jnp.bfloat16)
    unfused = BottleneckV1(fused_block=False, **kw)
    fused = BottleneckV1(fused_block=True, **kw)

    variables = unfused.init(jax.random.PRNGKey(0), x)
    variables = _randomize_stats(variables, rng)
    # identical trees: fused path declares the same params/batch_stats
    v2 = fused.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v2) == jax.tree_util.tree_structure(
        variables
    )

    yu = np.asarray(unfused.apply(variables, x), np.float32)
    yf = np.asarray(fused.apply(variables, x), np.float32)
    err = np.abs(yu - yf) / np.maximum(1.0, np.abs(yu))
    assert err.max() < 1.5e-1, err.max()
    assert np.median(np.abs(yu - yf)) < 2e-2


def test_resnet_fused_flag_matches_unfused():
    """Backbone-level: projection unit falls back, identity unit fuses.

    Pointwise fused-vs-unfused tails are intrinsic bf16 dispersion (the
    unfused path rounds conv outputs to bf16 BEFORE the BN affine; the
    fused path folds BN into the conv weights — near BN-cancellation points
    the two roundings legitimately diverge), so the assertion is against a
    float32 ground-truth model: the fused path must approximate it at least
    as well as the unfused bf16 path does. A wiring bug (halo, shift, wrong
    unit fused) fails this by orders of magnitude.
    """
    from iv2019_tpu.models.resnet import ResNetV1

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.normal(0, 0.5, (1, 64, 64, 3)), jnp.float32)
    kw = dict(blocks=((2, 128, 128),), output_stride=8,
              use_running_average=True)
    unfused = ResNetV1(fused_block=False, **kw)
    fused = ResNetV1(fused_block=True, **kw)
    truth = ResNetV1(fused_block=False, dtype=jnp.float32, **kw)

    variables = unfused.init(jax.random.PRNGKey(0), x)
    variables = _randomize_stats(variables, rng)
    yu = np.asarray(unfused.apply(variables, x)[0], np.float32)
    yf = np.asarray(fused.apply(variables, x)[0], np.float32)
    yt = np.asarray(truth.apply(variables, x)[0], np.float32)

    def rel(a, b):
        return np.abs(a - b) / np.maximum(1.0, np.abs(b))

    eu, ef = rel(yu, yt), rel(yf, yt)
    assert ef.mean() < 1.3 * eu.mean() + 1e-5, (ef.mean(), eu.mean())
    assert np.quantile(ef, 0.99) < 1.3 * np.quantile(eu, 0.99) + 1e-4
    assert ef.max() < 2 * eu.max() + 1e-3, (ef.max(), eu.max())
    # and the two bf16 paths still agree in aggregate
    assert rel(yf, yu).mean() < 1e-2


@pytest.mark.parametrize(
    "n,h,w,c,m,rate,th,ct",
    [
        (1, 16, 16, 256, 128, 4, 4, 128),   # block4-like: th == rate
        (2, 24, 16, 256, 128, 2, 4, 128),   # rate < th, multi-image
        (1, 16, 16, 384, 128, 1, 8, 128),   # rate 1, 3 C tiles
        (1, 16, 24, 256, 128, 4, 8, 256),   # th > rate, single C tile
    ],
)
def test_fused_bottleneck_ct_matches_reference(n, h, w, c, m, rate, th, ct):
    from iv2019_tpu.ops.pallas_block import (
        fused_bottleneck_ct,
        fused_bottleneck_ct_supported,
    )

    rng = np.random.RandomState(0)
    assert fused_bottleneck_ct_supported(n, h, w, c, m, rate, th, ct)
    params = _make_unit(rng, c, m)
    x = jnp.asarray(rng.normal(0, 1, (n, h, w, c)), jnp.float32)

    k1, b1, k2, b2, k3, b3 = _fold_unit(params)
    got = np.asarray(fused_bottleneck_ct(
        x.astype(jnp.bfloat16), k1, b1, k2, b2, k3, b3,
        rate=rate, th=th, ct=ct, interpret=True,
    ).astype(jnp.float32))

    # vs the XLA-conv oracle on the SAME folded bf16 weights (tight)
    bf = jnp.bfloat16
    xb = x.astype(bf)
    y = jax.nn.relu(_conv(xb, k1.reshape(1, 1, c, m).astype(bf), 1) + b1)
    y = jax.nn.relu(_conv(y.astype(bf), k2.astype(bf), rate) + b2)
    y = _conv(y.astype(bf), k3.reshape(1, 1, m, c).astype(bf), 1) + b3
    folded_want = np.asarray(jax.nn.relu(x.astype(jnp.float32) + y))
    err = np.abs(got - folded_want) / np.maximum(1.0, np.abs(folded_want))
    assert err.max() < 2e-2, err.max()

    # vs the unfolded eval-mode unit (loose; see the full-window test)
    want = np.asarray(_ref_unit(xb, params, rate))
    err = np.abs(got - want) / np.maximum(1.0, np.abs(want))
    assert err.max() < 1.5e-1, err.max()
    assert np.median(np.abs(got - want)) < 1e-2


def test_ct_supported_gate_and_pick():
    from iv2019_tpu.ops.pallas_block import (
        fused_bottleneck_ct_supported,
        pick_ct_config,
    )

    # block4 flagship (Nb up to 16): ct kernel admits what the full-window
    # kernel rejects
    assert not fused_bottleneck_supported(16, 64, 128, 2048, 512, 4)
    assert pick_ct_config(16, 64, 128, 2048, 512, 4) is not None
    # th < rate would leave the last stripe with negative new rows
    assert not fused_bottleneck_ct_supported(1, 64, 128, 2048, 512, 8, th=4)
    # non-divisible C tile
    assert not fused_bottleneck_ct_supported(1, 64, 128, 2048, 512, 4,
                                             th=4, ct=192)


def test_bottleneck_fused_flag_block4_shape_uses_ct_kernel():
    """A block4-geometry identity unit (C too wide for the full-window
    kernel) must still fuse via the ct kernel and match the unfused graph."""
    from iv2019_tpu.models.layers import BottleneckV1
    from iv2019_tpu.ops.pallas_block import pick_ct_config

    rng = np.random.RandomState(3)
    c, m, rate = 512, 128, 4
    x = jnp.asarray(rng.normal(0, 1, (1, 16, 16, c)), jnp.bfloat16)
    # this geometry must route to the ct kernel: full-window would fit at
    # these test sizes, so force the comparison at the dispatch level by
    # checking both kernels' gates explicitly on flagship block4 instead
    assert pick_ct_config(4, 64, 128, 2048, 512, 4) is not None

    kw = dict(depth=c, depth_bottleneck=m, stride=1, rate=rate,
              use_running_average=True, dtype=jnp.bfloat16)
    unfused = BottleneckV1(fused_block=False, **kw)
    fused = BottleneckV1(fused_block=True, **kw)
    variables = unfused.init(jax.random.PRNGKey(0), x)
    variables = _randomize_stats(variables, rng)
    assert jax.tree_util.tree_structure(
        fused.init(jax.random.PRNGKey(0), x)
    ) == jax.tree_util.tree_structure(variables)
    yu = np.asarray(unfused.apply(variables, x), np.float32)
    yf = np.asarray(fused.apply(variables, x), np.float32)
    err = np.abs(yu - yf) / np.maximum(1.0, np.abs(yu))
    assert err.max() < 1.5e-1, err.max()
    assert np.median(np.abs(yu - yf)) < 2e-2
