"""Dilated ResNet-v1-50 feature extractor backbone for dense prediction.

Structural parity with slim ``resnet_v1_50(num_classes=None,
global_pool=False, output_stride=S)`` as used by the reference
(resnet50_extended_feature_extractor.py:22-30):

- root: conv2d_same 7x7/2 (64) + BN + relu, then 3x3/2 'SAME' max pool
- 4 block groups (3/4/6/3 bottleneck units; 256/512/1024/2048 output depth;
  stride 2 on the *last* unit of blocks 1-3, slim convention)
- ``output_stride`` via slim stack_blocks_dense bookkeeping: once the
  cumulative stride reaches S, later unit strides become dilation rates

For S=8 (the reference default): block1 strides normally (stride 8 total),
block2's last-unit stride becomes rate 2 for block3, block3's becomes rate 4
for block4. Final features: (N, H/8, W/8, 2048).
"""

from __future__ import annotations

import functools
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

import jax
from iv2019_tpu.models.layers import BottleneckV1, ConvSame, Norm, variance_scaling_init

__all__ = [
    "ResNetV1",
    "RESNET50_BLOCKS",
    "RESNET101_BLOCKS",
    "RESNET152_BLOCKS",
    "FEATURE_EXTRACTOR_BLOCKS",
    "RootConvS2D",
]

# (num_units, depth, depth_bottleneck); stride 2 on last unit (blocks 1-3)
RESNET50_BLOCKS: tuple[tuple[int, int, int], ...] = (
    (3, 256, 64),
    (4, 512, 128),
    (6, 1024, 256),
    (3, 2048, 512),
)

# deeper slim variants (same bottleneck units, more block-3 repeats) — the
# capacity lever the reference leaves behind its "only resnet_v1_50"
# guard (reference system_factory.py:426-429); identical stride/dilation
# bookkeeping, warm-startable from slim ImageNet checkpoints
RESNET101_BLOCKS: tuple[tuple[int, int, int], ...] = (
    (3, 256, 64),
    (4, 512, 128),
    (23, 1024, 256),
    (3, 2048, 512),
)
RESNET152_BLOCKS: tuple[tuple[int, int, int], ...] = (
    (3, 256, 64),
    (8, 512, 128),
    (36, 1024, 256),
    (3, 2048, 512),
)

FEATURE_EXTRACTOR_BLOCKS = {
    "resnet_v1_50": RESNET50_BLOCKS,
    "resnet_v1_101": RESNET101_BLOCKS,
    "resnet_v1_152": RESNET152_BLOCKS,
}


def _unit_plan(blocks: Sequence[tuple[int, int, int]], output_stride: int):
    """slim stack_blocks_dense stride/rate bookkeeping, precomputed statically.

    Returns [[(depth, depth_bottleneck, stride, rate), ...] per block].
    """
    current_stride = 4  # after root conv + pool
    rate = 1
    plan = []
    for bi, (num_units, depth, depth_bottleneck) in enumerate(blocks):
        units = []
        last_block = bi == len(blocks) - 1
        for ui in range(num_units):
            unit_stride = 2 if (ui == num_units - 1 and not last_block) else 1
            if current_stride == output_stride:
                units.append((depth, depth_bottleneck, 1, rate))
                rate *= unit_stride
            else:
                units.append((depth, depth_bottleneck, unit_stride, 1))
                current_stride *= unit_stride
        plan.append(units)
    if current_stride > output_stride:
        raise ValueError(f"output_stride {output_stride} too small for network.")
    return plan


def _max_pool_same(x, window: int = 3, stride: int = 2):
    """TF 'SAME' max pooling (asymmetric padding, matches slim.max_pool2d)."""
    h, w = x.shape[1], x.shape[2]
    out_h = -(-h // stride)
    out_w = -(-w // stride)
    pad_h = max((out_h - 1) * stride + window - h, 0)
    pad_w = max((out_w - 1) * stride + window - w, 0)
    padding = (
        (0, 0),
        (pad_h // 2, pad_h - pad_h // 2),
        (pad_w // 2, pad_w - pad_w // 2),
        (0, 0),
    )
    return nn.max_pool(
        x, window_shape=(window, window), strides=(stride, stride), padding=padding[1:3]
    )


def _space_to_batch(x, f: int):
    """(N, H, W, C) -> (f*f*N, H/f, W/f, C) phase decomposition.

    A dense 3x3 conv on the phase grids equals a rate-f dilated conv on the
    original grid (including the zero-padding semantics at borders), so the
    dilated blocks of the backbone can run as dense convs — the layout TPUs
    like. BatchNorm statistics are unchanged: the phased batch covers exactly
    the same set of elements.
    """
    n, h, w, c = x.shape
    x = x.reshape(n, h // f, f, w // f, f, c)
    x = x.transpose(2, 4, 0, 1, 3, 5)
    return x.reshape(f * f * n, h // f, w // f, c)


def _batch_to_space(x, f: int):
    """Inverse of _space_to_batch."""
    nf, h, w, c = x.shape
    n = nf // (f * f)
    x = x.reshape(f, f, n, h, w, c)
    x = x.transpose(2, 3, 0, 4, 1, 5)
    return x.reshape(n, h * f, w * f, c)


class _RootKernel(nn.Module):
    """Holds the 7x7 root kernel under the name 'conv/kernel' so the
    parameter path matches ConvSame exactly (checkpoint compatibility)."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param("kernel", variance_scaling_init, self.shape, jnp.float32)


class RootConvS2D(nn.Module):
    """Root 7x7/2 conv executed as a 4x4/1 conv on 2x2 space-to-depth input.

    The standard TPU fix for the C=3 first layer (the conv emitter wastes
    the MXU's input-feature lanes on 3 channels): zero-pad the 7x7 kernel to
    8x8 and fold the stride-2 phase into channels, giving a dense stride-1
    conv with 12 input channels. Exactly the same linear map as
    ``ConvSame(64, 7, 2)`` including the conv2d_same (3, 3) padding — the
    parameter stays a (7, 7, 3, 64) tensor at the same tree path, so
    checkpoints and slim warm starts are unaffected (tested).
    """

    features: int = 64
    kernel_size: int = 7
    stride: int = 2
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        assert self.stride == 2 and self.kernel_size % 2 == 1
        c = x.shape[-1]
        k = _RootKernel((self.kernel_size, self.kernel_size, c, self.features),
                        name="conv")()
        f = self.stride
        ks8 = self.kernel_size + 1
        pad = (self.kernel_size - 1) // 2  # conv2d_same: symmetric keff-1
        k8 = jnp.pad(k, ((0, 1), (0, 1), (0, 0), (0, 0)))
        k4 = (
            k8.reshape(ks8 // f, f, ks8 // f, f, c, self.features)
            .transpose(0, 2, 1, 3, 4, 5)
            .reshape(ks8 // f, ks8 // f, f * f * c, self.features)
        )
        x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        n, hp, wp, _ = x.shape
        x = (
            x.reshape(n, hp // f, f, wp // f, f, c)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(n, hp // f, wp // f, f * f * c)
        )
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            k4.astype(self.dtype),
            (1, 1),
            "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=self.dtype,
        )


def _root_conv_raw(x, k, stride):
    pad = (k.shape[0] - 1) // 2
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _root_conv_pallas_wgrad(x, k, stride):
    return _root_conv_raw(x, k, stride)


def _rcpw_fwd(x, k, stride):
    return _root_conv_raw(x, k, stride), (x, k)


def _rcpw_bwd(stride, res, dy):
    from iv2019_tpu.ops.pallas_wgrad import root_conv_wgrad, wgrad_supported

    x, k = res
    # dx: XLA's input-grad emitter unchanged (it is not an audited gap op);
    # taking it from the vjp of the raw conv guarantees exact semantics
    _, vjp_x = jax.vjp(lambda xx: _root_conv_raw(xx, k, stride), x)
    (dx,) = vjp_x(dy)
    if x.dtype == jnp.bfloat16 and wgrad_supported(
        x.shape, dy.shape, k.shape[0], stride
    ):
        dw = root_conv_wgrad(x, dy, kernel_size=k.shape[0], stride=stride)
    else:
        # f32 params or kernel-unsupported shape: exact XLA wgrad
        _, vjp_k = jax.vjp(lambda kk: _root_conv_raw(x, kk, stride), k)
        (dw,) = vjp_k(dy)
    return dx.astype(x.dtype), dw.astype(k.dtype)


_root_conv_pallas_wgrad.defvjp(_rcpw_fwd, _rcpw_bwd)


class RootConvPallasWgrad(nn.Module):
    """Root 7x7/2 conv whose weight gradient is the Pallas kernel
    (ops/pallas_wgrad.py) instead of XLA's conv-backward emitter — the
    audit's worst single op (docs/PERFORMANCE.md: wgrad ~5.5x over its
    floor). Forward and dx stay on the XLA emitters; the parameter keeps
    the 'conv/kernel' path, so checkpoints/warm starts are unaffected.
    """

    features: int = 64
    kernel_size: int = 7
    stride: int = 2
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        k = _RootKernel((self.kernel_size, self.kernel_size, c, self.features),
                        name="conv")()
        return _root_conv_pallas_wgrad(
            x.astype(self.dtype), k.astype(self.dtype), self.stride
        )


class ResNetV1(nn.Module):
    """Fully-convolutional dilated ResNet-v1 (50-layer default).

    ``dilation_mode='space_to_batch'`` executes rate-r units as dense convs
    over r^2 phase-shifted subgrids — numerically identical to ``'dilated'``
    (tested). Which mode is faster depends on how well the XLA build handles
    dilated convs (A/B on the current chip favored 'dilated', so that is the
    default; the mode is a one-flag switch). Falls back to dilated convs when
    the feature map isn't divisible by the rate.
    """

    blocks: tuple[tuple[int, int, int], ...] = RESNET50_BLOCKS
    output_stride: int = 8
    norm_type: str = "batch"
    momentum: float = 0.9
    use_running_average: bool = True
    dilation_mode: str = "dilated"  # | "space_to_batch"
    root_conv_s2d: bool = False  # space-to-depth root conv (identical math)
    root_wgrad_pallas: bool = False  # Pallas kernel for the root-conv wgrad
    conv_impl: str = "conv"  # | "dot" (every unit conv as MXU matmuls)
    bn_impl: str = "flax"  # | "fused" (ops/fused_bn custom-VJP backward)
    # eval-mode identity units as single Pallas kernels (BN folded; see
    # ops/pallas_block.py); falls back per-unit outside the shape/VMEM gate
    fused_block: bool = False
    # jax.checkpoint every bottleneck unit: backward recomputes the unit's
    # internal activations (two convs + norms) from its input instead of
    # storing them — identical numerics and batch_stats, ~1/3 extra
    # backbone forward FLOPs, ~2-3x less activation memory (the dominant
    # term at megapixel sizes; rows in tools/spatial_memory_table.py)
    remat: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        kw = dict(
            norm_type=self.norm_type,
            momentum=self.momentum,
            use_running_average=self.use_running_average,
            conv_impl=self.conv_impl,
            bn_impl=self.bn_impl,
            fused_block=self.fused_block,
            dtype=self.dtype,
        )
        # root (slim names: resnet_v1_50/conv1)
        if self.root_conv_s2d and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            x = RootConvS2D(64, 7, 2, dtype=self.dtype, name="conv1")(x)
        elif (
            self.root_wgrad_pallas
            and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
        ):
            x = RootConvPallasWgrad(64, 7, 2, dtype=self.dtype, name="conv1")(x)
        else:
            x = ConvSame(64, 7, 2, dtype=self.dtype, name="conv1")(x)
        x = Norm(
            norm_type=self.norm_type,
            bn_impl=self.bn_impl,
            momentum=self.momentum,
            use_running_average=self.use_running_average,
            name="conv1_norm",
        )(x)
        x = nn.relu(x)
        x = _max_pool_same(x, 3, 2)

        end_points = {"root": x}
        plan = _unit_plan(self.blocks, self.output_stride)
        max_rate = max(u[3] for units in plan for u in units)
        use_s2b = (
            self.dilation_mode == "space_to_batch"
            and max_rate > 1
            and x.shape[1] % max_rate == 0
            and x.shape[2] % max_rate == 0
        )
        applied = 1  # current phase-decomposition factor
        factors = []  # s2b factor stack; inverted in reverse order at the end
        Unit = (
            # prevent_cse=False: the barriers CSE-protection inserts block
            # XLA buffer reuse and can *increase* peak memory; under jit the
            # compiler does not CSE away the recompute (measured in
            # tools/spatial_memory_table.py rows)
            nn.remat(BottleneckV1, prevent_cse=False)
            if self.remat
            else BottleneckV1
        )
        for bi, units in enumerate(plan):
            for ui, (depth, depth_bottleneck, stride, rate) in enumerate(units):
                conv_rate = rate
                if use_s2b:
                    if rate != applied:
                        # rates only ever grow along the network
                        f = rate // applied
                        x = _space_to_batch(x, f)
                        factors.append(f)
                        applied = rate
                    conv_rate = 1
                x = Unit(
                    depth=depth,
                    depth_bottleneck=depth_bottleneck,
                    stride=stride,
                    rate=conv_rate,
                    name=f"block{bi + 1}/unit_{ui + 1}",
                    **kw,
                )(x)
            end_points[f"block{bi + 1}"] = x
        for f in reversed(factors):
            x = _batch_to_space(x, f)
        if factors:
            end_points[f"block{len(plan)}"] = x
        return x, end_points
