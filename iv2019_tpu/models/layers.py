"""Layer primitives with TF-slim numerical parity, flax.linen on TPU.

Replicates the exact padding / normalization / initialization conventions of
the reference's slim stack so that converted checkpoints validate:

- ``conv2d_same``: symmetric explicit padding ``keff - 1`` split low/high
  (reference: slim resnet_utils.conv2d_same used by resnet_v1, see
  resnet50_extended_feature_extractor.py:25-30)
- BatchNorm: decay 0.9, epsilon 1e-5, scale=True
  (reference resnet50_extended_model_hierarchical.py:278-354). Statistics are
  computed over the *global* (sharded) batch: under jit/SPMD this is
  cross-replica sync-BN by construction — XLA inserts the ICI collectives the
  reference hand-rolls in cross_replica_batch_normalization.py:398-429.
- variance-scaling initializer (factor 2.0, fan-in, truncated normal), the
  slim default used throughout (resnet50_...model_hierarchical.py:337)
- ResNet-v1 bottleneck unit (slim resnet_v1.bottleneck), with the dilation
  bookkeeping needed for output_stride=8

Mixed precision: convs compute in ``dtype`` (bfloat16 by default) with f32
parameters; normalization always runs in f32.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = [
    "ConvSame", "Norm", "FusedBatchNorm", "conv_norm_relu", "BottleneckV1",
    "variance_scaling_init", "dot_conv_same",
]

variance_scaling_init = nn.initializers.variance_scaling(
    2.0, "fan_in", "truncated_normal"
)


def _same_padding(kernel_size: int, rate: int) -> tuple[int, int]:
    """TF conv2d_same explicit padding: symmetric keff-1 split low/high."""
    keff = kernel_size + (kernel_size - 1) * (rate - 1)
    pad_total = keff - 1
    pad_beg = pad_total // 2
    return (pad_beg, pad_total - pad_beg)


class _Kernel(nn.Module):
    """Bare conv kernel parameter at the path <parent>/<name>/kernel — the
    exact tree position nn.Conv uses, so checkpoints are interchangeable
    between the conv and dot execution paths."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param("kernel", variance_scaling_init, self.shape, jnp.float32)


def dot_conv_same(x, kernel, stride: int = 1, rate: int = 1, out_dtype=None):
    """conv2d_same computed as MXU dot_generals instead of a conv op.

    1x1 kernels become a single (N*H*W, Cin) @ (Cin, Cout) matmul (with the
    stride folded into a preceding subsample — exact for k=1); kxk kernels
    become k*k tap-shifted matmuls accumulated in f32, which reassociates the
    conv's own f32 tap accumulation (same math, tested to bf16 tolerance).

    Rationale: XLA:TPU's conv emitters pin activations to conv-friendly
    layouts; mixing dots into a conv graph costs relayout copies (measured,
    docs/PERFORMANCE.md round 2). Expressing *every* trunk conv as dots lets
    the compiler keep one layout family end-to-end.
    """
    kh, kw, cin, cout = kernel.shape
    dt = out_dtype or x.dtype
    k = kernel.astype(dt)
    n = x.shape[0]
    if kh == 1 and kw == 1 and rate == 1:
        if stride > 1:
            x = x[:, ::stride, ::stride, :]
        ho, wo = x.shape[1], x.shape[2]
        y = jnp.dot(
            x.reshape(-1, cin), k.reshape(cin, cout),
            preferred_element_type=jnp.float32,
        )
        return y.reshape(n, ho, wo, cout).astype(dt)
    # jax.checkpoint: without it, autodiff saves all kh*kw tap slices as
    # residuals (kh*kw x the activation memory — OOMs the flagship config);
    # with it only (x, k) are saved and the slices recompute in backward,
    # like the conv op's own residual footprint.
    @jax.checkpoint
    def _taps(x, k):
        pad_h = _same_padding(kh, rate)
        pad_w = _same_padding(kw, rate)
        xp = jnp.pad(x, ((0, 0), pad_h, pad_w, (0, 0)))
        hp, wp = xp.shape[1], xp.shape[2]
        keff_h = kh + (kh - 1) * (rate - 1)
        keff_w = kw + (kw - 1) * (rate - 1)
        ho = (hp - keff_h) // stride + 1
        wo = (wp - keff_w) // stride + 1
        acc = None
        for i in range(kh):
            for j in range(kw):
                sl = jax.lax.slice(
                    xp,
                    (0, i * rate, j * rate, 0),
                    (
                        n,
                        i * rate + (ho - 1) * stride + 1,
                        j * rate + (wo - 1) * stride + 1,
                        cin,
                    ),
                    (1, stride, stride, 1),
                )
                t = jnp.dot(
                    sl.reshape(-1, cin), k[i, j], preferred_element_type=jnp.float32
                )
                acc = t if acc is None else acc + t
        return acc.reshape(n, ho, wo, cout).astype(dt)

    return _taps(x, k)


def _conv1x1_nhwc(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@jax.custom_vjp
def conv1x1_dot_bwd(x, k):
    """Stride-1 1x1 conv: XLA-conv forward, dot_general backward.

    The forward conv emitter is near-roofline on TPU (98% MFU on the wide
    trunk convs — docs/PERFORMANCE.md profile) but its *backward* transpose
    emitters run at 2.8-3.6x the forward cost. This keeps the forward op
    untouched and swaps only the VJP: dx = g @ k^T and dk = x^T @ g as MXU
    dot_generals with f32 accumulation (the conv op's own accumulation
    dtype), cast back to the operand dtypes like the conv backward would.
    """
    return _conv1x1_nhwc(x, k)


def _conv1x1_fwd(x, k):
    return _conv1x1_nhwc(x, k), (x, k)


def _conv1x1_bwd(res, g):
    x, k = res
    cin, cout = k.shape[2], k.shape[3]
    g2 = g.reshape(-1, cout)
    dx = (
        jnp.dot(g2, k.reshape(cin, cout).T, preferred_element_type=jnp.float32)
        .astype(x.dtype)
        .reshape(x.shape)
    )
    dk = (
        jax.lax.dot_general(
            x.reshape(-1, cin), g2,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        .astype(k.dtype)
        .reshape(k.shape)
    )
    return dx, dk


conv1x1_dot_bwd.defvjp(_conv1x1_fwd, _conv1x1_bwd)


class ConvSame(nn.Module):
    """2-D conv with TF resnet_utils.conv2d_same padding semantics.

    For stride 1 this equals TF 'SAME'; for stride > 1 TF 'SAME' pads
    asymmetrically while conv2d_same pads symmetrically — the reference's
    ResNet uses the latter for every strided conv, so we do too.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    rate: int = 1
    use_bias: bool = False
    feature_group_count: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        pad = _same_padding(self.kernel_size, self.rate)
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            kernel_dilation=(self.rate, self.rate),
            padding=(pad, pad),
            use_bias=self.use_bias,
            feature_group_count=self.feature_group_count,
            kernel_init=variance_scaling_init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)


class FusedBatchNorm(nn.Module):
    """Train-mode BatchNorm with the classic fused backward (ops/fused_bn).

    Drop-in for flax ``nn.BatchNorm(use_running_average=False)``: identical
    parameter tree (``scale``/``bias``), identical 'batch_stats' variables
    (``mean``/``var``), identical forward math — only the VJP differs (two
    reductions instead of autodiff through the stats graph), which is what
    keeps the 1x1-conv backward fusions lean on TPU (docs/PERFORMANCE.md).
    """

    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        from iv2019_tpu.ops.fused_bn import batch_norm_train

        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones_init(), (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (c,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        y, mean, var = batch_norm_train(x, scale, bias, self.epsilon)
        if not self.is_initializing():
            ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
            ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        return y


class Norm(nn.Module):
    """Normalization layer: batch (default) or group, f32 compute.

    BatchNorm parity: tf.contrib.layers.batch_norm(decay=0.9, epsilon=1e-5,
    scale=True). ``use_running_average`` maps the reference's
    ``batch_norm_accumulate_statistics`` (train: False -> batch stats +
    moving-stat updates; eval/predict: True -> moving stats).
    """

    norm_type: str = "batch"  # | "group"
    momentum: float = 0.9
    epsilon: float = 1e-5
    groups: int = 32
    use_running_average: bool = True
    trainable: bool = True  # norm_train_variables
    bn_impl: str = "flax"  # | "fused" (custom-VJP backward; train mode only)

    @nn.compact
    def __call__(self, x):
        in_dtype = x.dtype
        x32 = x.astype(jnp.float32)
        if self.norm_type == "batch" and self.bn_impl == "fused" and not self.use_running_average:
            y = FusedBatchNorm(
                momentum=self.momentum,
                epsilon=self.epsilon,
                name="BatchNorm",
            )(x32)
        elif self.norm_type == "batch":
            y = nn.BatchNorm(
                use_running_average=self.use_running_average,
                momentum=self.momentum,
                epsilon=self.epsilon,
                use_bias=True,
                use_scale=True,
                dtype=jnp.float32,
                param_dtype=jnp.float32,
                name="BatchNorm",
            )(x32)
        elif self.norm_type == "group":
            y = nn.GroupNorm(
                num_groups=min(self.groups, x.shape[-1]),
                epsilon=self.epsilon,
                dtype=jnp.float32,
                param_dtype=jnp.float32,
                name="GroupNorm",
            )(x32)
        elif self.norm_type == "none":
            # identity: for perf probes / ablations only
            y = x32
        else:
            raise ValueError(f"unknown norm_type {self.norm_type!r}")
        return y.astype(in_dtype)


class conv_norm_relu(nn.Module):
    """slim.conv2d default composition: conv (no bias) -> norm -> relu.

    ``activation=False`` reproduces slim.conv2d(..., activation_fn=None),
    which still applies the arg-scope normalizer (the reference's logits
    heads therefore carry a BatchNorm — see
    resnet50_extended_model_hierarchical.py:78-86).
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    rate: int = 1
    activation: bool = True
    norm_type: str = "batch"
    momentum: float = 0.9
    use_running_average: bool = True
    groups: int = 32
    feature_group_count: int = 1
    conv_impl: str = "conv"  # | "dot" (dot_conv_same; identical math)
    bn_impl: str = "flax"  # | "fused" (ops/fused_bn custom-VJP backward)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        # inline conv (named 'conv') so parameter paths are
        # <module>/conv/kernel — the layout the slim warm-start mapping
        # (utils/checkpoint.py) addresses
        if self.conv_impl == "dot" and self.feature_group_count == 1:
            kernel = _Kernel(
                (self.kernel_size, self.kernel_size, x.shape[-1], self.features),
                name="conv",
            )()
            x = dot_conv_same(
                x.astype(self.dtype), kernel, self.stride, self.rate,
                out_dtype=self.dtype,
            )
            return self._norm_act(x)
        if (
            self.conv_impl == "dot_bwd"
            and self.kernel_size == 1
            and self.stride == 1
            and self.feature_group_count == 1
        ):
            kernel = _Kernel((1, 1, x.shape[-1], self.features), name="conv")()
            x = conv1x1_dot_bwd(x.astype(self.dtype), kernel.astype(self.dtype))
            return self._norm_act(x)
        pad = _same_padding(self.kernel_size, self.rate)
        x = nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            kernel_dilation=(self.rate, self.rate),
            padding=(pad, pad),
            use_bias=False,
            feature_group_count=self.feature_group_count,
            kernel_init=variance_scaling_init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        return self._norm_act(x)

    def _norm_act(self, x):
        x = Norm(
            norm_type=self.norm_type,
            bn_impl=self.bn_impl,
            momentum=self.momentum,
            groups=self.groups,
            use_running_average=self.use_running_average,
            name="norm",
        )(x)
        if self.activation:
            x = nn.relu(x)
        return x


class _BNVars(nn.Module):
    """Raw BatchNorm variables at nn.BatchNorm's exact tree positions."""

    features: int

    @nn.compact
    def __call__(self):
        c = self.features
        scale = self.param("scale", nn.initializers.ones_init(), (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (c,), jnp.float32)
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        return scale, bias, mean.value, var.value


class _NormVars(nn.Module):
    """Mirror of Norm's child scope (norm/BatchNorm/...)."""

    features: int

    @nn.compact
    def __call__(self):
        return _BNVars(self.features, name="BatchNorm")()


class _ConvNormParams(nn.Module):
    """Parameters of a ``conv_norm_relu`` at identical tree paths —
    ``<name>/conv/kernel`` + ``<name>/norm/BatchNorm/{scale,bias}`` (params)
    and ``{mean,var}`` (batch_stats) — without executing it. Feeds the
    BN-folded weights of an eval-mode unit to the fused block kernel while
    keeping checkpoints interchangeable with the unfused path.
    """

    shape: tuple  # (kh, kw, cin, cout)

    @nn.compact
    def __call__(self):
        kernel = _Kernel(self.shape, name="conv")()
        return (kernel,) + tuple(_NormVars(self.shape[-1], name="norm")())


class BottleneckV1(nn.Module):
    """slim resnet_v1.bottleneck: 1x1 / 3x3(stride, rate) / 1x1 + projection.

    Identity shortcut (with stride subsampling) when depth_in == depth, else
    a 1x1 projection conv + norm. Final relu after the residual add.

    ``fused_block=True`` executes eval-mode identity units (stride 1,
    batch norm on running statistics) as ONE Pallas kernel
    (ops/pallas_block.fused_bottleneck) with the BatchNorms folded into the
    conv weights — ~2.7x less HBM traffic than the unfused graph, same
    parameter tree, gated to supported shapes (falls back otherwise).
    """

    depth: int
    depth_bottleneck: int
    stride: int = 1
    rate: int = 1
    norm_type: str = "batch"
    momentum: float = 0.9
    use_running_average: bool = True
    conv_impl: str = "conv"
    bn_impl: str = "flax"
    fused_block: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        depth_in = x.shape[-1]
        fused = self._fused_path(x) if self.fused_block else None
        if fused is not None:
            return fused
        kw = dict(
            norm_type=self.norm_type,
            momentum=self.momentum,
            use_running_average=self.use_running_average,
            conv_impl=self.conv_impl,
            bn_impl=self.bn_impl,
            dtype=self.dtype,
        )
        if depth_in == self.depth:
            # subsample: 1x1 max pool with stride (slim resnet_utils.subsample)
            shortcut = x if self.stride == 1 else x[:, :: self.stride, :: self.stride, :]
        else:
            shortcut = conv_norm_relu(
                self.depth, 1, self.stride, activation=False, name="shortcut", **kw
            )(x)
        residual = conv_norm_relu(self.depth_bottleneck, 1, 1, name="conv1", **kw)(x)
        residual = conv_norm_relu(
            self.depth_bottleneck, 3, self.stride, rate=self.rate, name="conv2", **kw
        )(residual)
        residual = conv_norm_relu(self.depth, 1, 1, activation=False, name="conv3", **kw)(
            residual
        )
        return nn.relu(shortcut + residual)

    def _fused_path(self, x):
        """Whole-unit Pallas kernel for supported eval-mode identity units.

        Returns None (caller falls back to the unfused graph) unless: batch
        norm on running statistics (BN folds to an affine), identity
        shortcut, stride 1, bf16 compute, and the kernel's static shape/VMEM
        gate admits the unit. Declares the SAME parameter tree as the
        unfused path, so both paths restore from the same checkpoints.
        """
        from iv2019_tpu.ops.pallas_block import (
            fold_bn,
            fused_bottleneck,
            fused_bottleneck_ct,
            fused_bottleneck_supported,
            pick_ct_config,
        )

        depth_in = x.shape[-1]
        n, h, w = x.shape[0], x.shape[1], x.shape[2]
        if not (
            self.norm_type == "batch"
            and self.use_running_average
            and self.stride == 1
            and depth_in == self.depth
            and self.dtype == jnp.bfloat16
        ):
            return None
        # prefer the full-window kernel (x resident: one HBM read of x);
        # when its VMEM gate rejects (block4: C=2048), the channel-tiled
        # rolling kernel takes over (x read twice, mids never materialized)
        full = fused_bottleneck_supported(
            n, h, w, depth_in, self.depth_bottleneck, self.rate
        )
        ct_cfg = None if full else pick_ct_config(
            n, h, w, depth_in, self.depth_bottleneck, self.rate
        )
        if not full and ct_cfg is None:
            return None
        m, c = self.depth_bottleneck, self.depth
        k1, s1, o1, mu1, v1 = _ConvNormParams((1, 1, depth_in, m), name="conv1")()
        k2, s2, o2, mu2, v2 = _ConvNormParams((3, 3, m, m), name="conv2")()
        k3, s3, o3, mu3, v3 = _ConvNormParams((1, 1, m, c), name="conv3")()
        k1f, b1f = fold_bn(k1, s1, o1, mu1, v1)
        k2f, b2f = fold_bn(k2, s2, o2, mu2, v2)
        k3f, b3f = fold_bn(k3, s3, o3, mu3, v3)
        if full:
            return fused_bottleneck(
                x.astype(jnp.bfloat16),
                k1f.reshape(depth_in, m), b1f,
                k2f, b2f,
                k3f.reshape(m, c), b3f,
                rate=self.rate,
            ).astype(x.dtype)
        th, ct = ct_cfg
        return fused_bottleneck_ct(
            x.astype(jnp.bfloat16),
            k1f.reshape(depth_in, m), b1f,
            k2f, b2f,
            k3f.reshape(m, c), b3f,
            rate=self.rate, th=th, ct=ct,
        ).astype(x.dtype)
