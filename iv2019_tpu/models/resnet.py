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

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from iv2019_tpu.models.layers import BottleneckV1, ConvSame, Norm

__all__ = ["ResNetV1", "RESNET50_BLOCKS"]

# (num_units, depth, depth_bottleneck); stride 2 on last unit (blocks 1-3)
RESNET50_BLOCKS: tuple[tuple[int, int, int], ...] = (
    (3, 256, 64),
    (4, 512, 128),
    (6, 1024, 256),
    (3, 2048, 512),
)


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
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        kw = dict(
            norm_type=self.norm_type,
            momentum=self.momentum,
            use_running_average=self.use_running_average,
            dtype=self.dtype,
        )
        # root (slim names: resnet_v1_50/conv1)
        x = ConvSame(64, 7, 2, dtype=self.dtype, name="conv1")(x)
        x = Norm(
            norm_type=self.norm_type,
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
                x = BottleneckV1(
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
