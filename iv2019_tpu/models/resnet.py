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


class ResNetV1(nn.Module):
    """Fully-convolutional dilated ResNet-v1 (50-layer default)."""

    blocks: tuple[tuple[int, int, int], ...] = RESNET50_BLOCKS
    output_stride: int = 8
    norm_type: str = "batch"
    momentum: float = 0.9
    use_running_average: bool = True
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
        for bi, units in enumerate(plan):
            for ui, (depth, depth_bottleneck, stride, rate) in enumerate(units):
                x = BottleneckV1(
                    depth=depth,
                    depth_bottleneck=depth_bottleneck,
                    stride=stride,
                    rate=rate,
                    name=f"block{bi + 1}/unit_{ui + 1}",
                    **kw,
                )(x)
            end_points[f"block{bi + 1}"] = x
        return x, end_points
