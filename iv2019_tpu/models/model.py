"""Hierarchical semantic-segmentation model: dilated ResNet-50 + 3 heads.

TPU-native reimplementation of the reference model
(resnet50_extended_model_hierarchical.py:17-141 and
resnet50_extended_feature_extractor.py:8-51):

  features -> ResNet-v1-50 (dilated, output stride 8)
           -> extension 1x1 conv 2048->256 (+ optional dilated FOV conv)
           -> optional PSP pyramid module
           -> 3 parallel bottleneck adaptation branches
           -> 1x1 logit heads (L1 / L2-vehicle / L2-human)
           -> bilinear x8 upsample (align_corners=True) to input size
           -> softmax / argmax per head
           -> hierarchical decision fusion into the common label space

All spatial compute stays in ``compute_dtype`` (bf16 by default) on the
MXU; softmax/argmax/fusion run in f32. The decision fusion is a pair of
``where``-gated table gathers (reference :95-117).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from iv2019_tpu.config import Settings
from iv2019_tpu.models.layers import BottleneckV1, Norm, conv_norm_relu
from iv2019_tpu.models.resnet import ResNetV1
from iv2019_tpu.ops.resize import resize_bilinear, resize_bilinear_mxu
from iv2019_tpu.ops.segment_ops import gather_cids
from iv2019_tpu.problem.taxonomy import Taxonomy, get_taxonomy

__all__ = [
    "HierarchicalSegmentationModel",
    "build_model",
    "hierarchical_common_probabilities",
]


def hierarchical_common_probabilities(preds, tax: Taxonomy) -> jnp.ndarray:
    """Factorized per-pixel probabilities over the common label space.

    The probabilistic counterpart of the argmax decision fusion below
    (reference resnet50_extended_model_hierarchical.py:95-117 defines only
    the argmax form): P(common c) collects the L1 mass of every
    non-metaclass L1 class mapped to c, plus the chain-rule terms
    P(L1=vehicle) * P(vehicle-head subclass -> c) and
    P(L1=human) * P(human-head subclass -> c). Sums to 1 over the common
    space by construction. Consumed by test-time-augmentation evaluation
    (train/step.make_eval_step), where averaging over scales/flips needs a
    single distribution per pixel — a capability beyond the reference.
    """
    import numpy as np

    from iv2019_tpu.ops.segment_ops import segment_sum_channels

    l1 = preds["l1_probabilities"].astype(jnp.float32)
    veh = preds["l2_vehicle_probabilities"].astype(jnp.float32)
    hum = preds["l2_human_probabilities"].astype(jnp.float32)
    keep = np.ones(tax.num_l1_classes, np.float32)
    keep[tax.cid_l1_vehicle] = 0.0
    keep[tax.cid_l1_human] = 0.0
    n = tax.num_common_classes
    base = segment_sum_channels(l1 * keep, tax.l1_cids2common_cids, n)
    p_veh = segment_sum_channels(veh, tax.l2_vehicle_cids2common_cids, n)
    p_hum = segment_sum_channels(hum, tax.l2_human_cids2common_cids, n)
    return (
        base
        + l1[..., tax.cid_l1_vehicle : tax.cid_l1_vehicle + 1] * p_veh
        + l1[..., tax.cid_l1_human : tax.cid_l1_human + 1] * p_hum
    )


class PSPModule(nn.Module):
    """Pyramid Scene Parsing module (reference :186-207).

    Average pools at 1/1, 1/2, 1/3, 1/6 of the feature map ('VALID' slim
    pooling), 1x1 conv each, bilinear-upsample (align_corners=True) back,
    concat with the input, and fuse with a final 1x1 conv.
    """

    features: int
    norm_type: str = "batch"
    momentum: float = 0.9
    use_running_average: bool = True
    conv_impl: str = "conv"
    bn_impl: str = "flax"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h, w = x.shape[1], x.shape[2]
        kw = dict(
            norm_type=self.norm_type,
            momentum=self.momentum,
            use_running_average=self.use_running_average,
            conv_impl=self.conv_impl,
            bn_impl=self.bn_impl,
            dtype=self.dtype,
        )
        branches = [x]
        for i, div in enumerate((1, 2, 3, 6)):
            ph, pw = h // div, w // div
            pooled = nn.avg_pool(x, window_shape=(ph, pw), strides=(ph, pw))
            conv = conv_norm_relu(self.features, 1, name=f"conv{div}", **kw)(pooled)
            ups = resize_bilinear(conv.astype(jnp.float32), (h, w), align_corners=True)
            branches.append(ups.astype(x.dtype))
        cat = jnp.concatenate(branches, axis=3)
        return conv_norm_relu(self.features, 1, name="conv_final", **kw)(cat)


class HierarchicalSegmentationModel(nn.Module):
    """Full model; returns the 10-key predictions dict of the reference."""

    taxonomy: Taxonomy
    stride_feature_extractor: int = 8
    resnet_blocks: Optional[tuple] = None  # None = ResNet-50; tests use tiny stacks
    feature_dims_decreased: int = 256
    fov_expansion_kernel_size: int = 0
    fov_expansion_kernel_rate: int = 0
    psp_module: bool = False
    upsampling_method: str = "bilinear"
    dilation_mode: str = "dilated"  # | "space_to_batch" (identical results)
    root_conv_s2d: bool = False  # space-to-depth root conv (identical math)
    root_wgrad_pallas: bool = False  # Pallas kernel for the root-conv wgrad
    # run the 3 adaptation branches + logit heads as grouped convs (3x fewer
    # kernels, identical math — BatchNorm is per-channel)
    fuse_adaptation: bool = False
    norm_type: str = "batch"
    batch_norm_decay: float = 0.9
    accumulate_norm_statistics: bool = False  # True during training
    remat: bool = False  # jax.checkpoint backbone units (models/resnet.py)
    conv_impl: str = "conv"  # | "dot" (models/layers.dot_conv_same)
    bn_impl: str = "flax"  # | "fused" (ops/fused_bn custom-VJP backward)
    # eval-mode backbone identity units as single Pallas kernels
    # (ops/pallas_block.py; BN folded, identical parameter tree)
    fused_block: bool = False
    dtype: Any = jnp.bfloat16

    def _norm_kw(self):
        return dict(
            norm_type=self.norm_type,
            momentum=self.batch_norm_decay,
            use_running_average=not self.accumulate_norm_statistics,
            conv_impl=self.conv_impl,
            bn_impl=self.bn_impl,
            dtype=self.dtype,
        )

    @nn.compact
    def __call__(self, images):
        """images: (N, H, W, 3) float in [-1, 1). Returns predictions dict."""
        tax = self.taxonomy
        kw = self._norm_kw()
        hf, wf = images.shape[1], images.shape[2]

        x = images.astype(self.dtype)

        # --- feature extractor: base + extension (feature_extractor/*) ---
        from iv2019_tpu.models.resnet import RESNET50_BLOCKS

        x, end_points = ResNetV1(
            blocks=self.resnet_blocks or RESNET50_BLOCKS,
            output_stride=self.stride_feature_extractor,
            norm_type=self.norm_type,
            momentum=self.batch_norm_decay,
            use_running_average=not self.accumulate_norm_statistics,
            dilation_mode=self.dilation_mode,
            root_conv_s2d=self.root_conv_s2d,
            root_wgrad_pallas=self.root_wgrad_pallas,
            conv_impl=self.conv_impl,
            bn_impl=self.bn_impl,
            fused_block=self.fused_block,
            remat=self.remat,
            dtype=self.dtype,
            name="feature_extractor/base",
        )(x)
        if self.feature_dims_decreased > 0:
            x = conv_norm_relu(
                self.feature_dims_decreased, 1,
                name="feature_extractor/extension/decrease_fdims", **kw,
            )(x)
        if self.fov_expansion_kernel_rate > 0 and self.fov_expansion_kernel_size > 0:
            x = conv_norm_relu(
                x.shape[-1],
                self.fov_expansion_kernel_size,
                rate=self.fov_expansion_kernel_rate,
                name="feature_extractor/extension/increase_fov", **kw,
            )(x)
        if self.psp_module:
            x = PSPModule(
                self.feature_dims_decreased,
                norm_type=self.norm_type,
                momentum=self.batch_norm_decay,
                use_running_average=not self.accumulate_norm_statistics,
                conv_impl=self.conv_impl,
                bn_impl=self.bn_impl,
                dtype=self.dtype,
                name="feature_extractor/pyramid_module",
            )(x)

        # --- adaptation + heads ---
        head_kw = dict(kw)
        head_kw["groups"] = 1

        if self.fuse_adaptation:
            l1_logits, l2_vehicle_logits, l2_human_logits = self._fused_adaptation_heads(
                x, (hf, wf), kw, head_kw
            )
        else:
            # 3 parallel bottlenecks (adaptation_module/*)
            def _branch(name):
                return BottleneckV1(
                    depth=x.shape[-1], depth_bottleneck=x.shape[-1], stride=1,
                    norm_type=self.norm_type, momentum=self.batch_norm_decay,
                    use_running_average=not self.accumulate_norm_statistics,
                    conv_impl=self.conv_impl,
                    bn_impl=self.bn_impl,
                    dtype=self.dtype, name=f"adaptation_module/{name}",
                )(x)

            l1_features = _branch("l1_features")
            l2_vehicle_features = _branch("l2_vehicle_features")
            l2_human_features = _branch("l2_human_features")

            # heads: 1x1 conv (no act; arg-scope norm still applies, with
            # groups=1 => layer norm in the group-norm config) + upsample
            def _head(feat, n_out, name):
                logits = conv_norm_relu(
                    n_out, 1, activation=False, name=f"softmax_classifier/{name}",
                    **head_kw,
                )(feat)
                return self._upsample(logits, (hf, wf), name)

            l1_logits = _head(l1_features, tax.num_l1_classes, "l1_logits")
            l2_vehicle_logits = _head(l2_vehicle_features, tax.num_vehicle_classes, "l2_vehicle_logits")
            l2_human_logits = _head(l2_human_features, tax.num_human_classes, "l2_human_logits")

        # --- probabilities / decisions / fusion (f32) ---
        # argmax over logits == argmax over softmax(logits); keeping decisions
        # off the softmax lets XLA drop the full-res probability tensors
        # entirely in the training step (they are only consumed by summaries
        # and predict/eval outputs)
        l1_probs = nn.softmax(l1_logits, axis=3)
        l1_decs = jnp.argmax(l1_logits, axis=3).astype(jnp.int32)
        l2_vehicle_probs = nn.softmax(l2_vehicle_logits, axis=3)
        l2_vehicle_decs = jnp.argmax(l2_vehicle_logits, axis=3).astype(jnp.int32)
        l2_human_probs = nn.softmax(l2_human_logits, axis=3)
        l2_human_decs = jnp.argmax(l2_human_logits, axis=3).astype(jnp.int32)

        decs = jnp.where(
            l1_decs == tax.cid_l1_vehicle,
            gather_cids(tax.l2_vehicle_cids2common_cids, l2_vehicle_decs),
            jnp.where(
                l1_decs == tax.cid_l1_human,
                gather_cids(tax.l2_human_cids2common_cids, l2_human_decs),
                gather_cids(tax.l1_cids2common_cids, l1_decs),
            ),
        )

        return {
            "l1_logits": l1_logits,
            "l1_probabilities": l1_probs,
            "l1_decisions": l1_decs,
            "l2_vehicle_logits": l2_vehicle_logits,
            "l2_vehicle_probabilities": l2_vehicle_probs,
            "l2_vehicle_decisions": l2_vehicle_decs,
            "l2_human_logits": l2_human_logits,
            "l2_human_probabilities": l2_human_probs,
            "l2_human_decisions": l2_human_decs,
            "decisions": decs,
        }

    def _fused_adaptation_heads(self, x, size, kw, head_kw):
        """Grouped-conv execution of the 3 adaptation bottlenecks + heads.

        Identical math to the unfused path: the first 1x1 conv stacks the 3
        branch kernels along output channels (shared input), the 3x3 and the
        following convs run with feature_group_count=3, and BatchNorm over
        the 3C stacked channels computes exactly the per-branch per-channel
        statistics. Head outputs are padded to a common per-group width and
        sliced. Parameter layout differs from the unfused path (use one or
        the other consistently for a given checkpoint).
        """
        tax = self.taxonomy
        c = x.shape[-1]
        gkw = dict(kw)

        y = conv_norm_relu(3 * c, 1, name="adaptation_module/fused/conv1", **gkw)(x)
        y = conv_norm_relu(
            3 * c, 3, feature_group_count=3,
            name="adaptation_module/fused/conv2", **gkw,
        )(y)
        y = conv_norm_relu(
            3 * c, 1, feature_group_count=3, activation=False,
            name="adaptation_module/fused/conv3", **gkw,
        )(y)
        shortcut = jnp.concatenate([x, x, x], axis=-1)
        feats = nn.relu(shortcut + y)

        head_width = max(
            tax.num_l1_classes, tax.num_vehicle_classes, tax.num_human_classes
        )
        logits = conv_norm_relu(
            3 * head_width, 1, feature_group_count=3, activation=False,
            name="softmax_classifier/fused_logits", **head_kw,
        )(feats)
        l1 = logits[..., 0 : tax.num_l1_classes]
        veh = logits[..., head_width : head_width + tax.num_vehicle_classes]
        hum = logits[..., 2 * head_width : 2 * head_width + tax.num_human_classes]
        return (
            self._upsample(l1, size, "l1_logits"),
            self._upsample(veh, size, "l2_vehicle_logits"),
            self._upsample(hum, size, "l2_human_logits"),
        )

    def _upsample(self, logits, size, name):
        """x8 logit upsampler (reference _create_upsampler :143-184)."""
        if self.upsampling_method == "no":
            return logits.astype(jnp.float32)
        if self.upsampling_method == "hybrid":
            # 3x3 transpose conv (stride 1, slim default) then resize
            logits = nn.ConvTranspose(
                features=logits.shape[-1],
                kernel_size=(3, 3),
                padding="SAME",
                use_bias=True,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name=f"softmax_classifier/{name}/upsampling/conv_transpose",
            )(logits)
        # matmul formulation: the x8 upsample runs on the MXU instead of
        # serialized gathers (identical math to TF1 align_corners bilinear)
        return resize_bilinear_mxu(logits.astype(jnp.float32), size, align_corners=True)


def build_model(settings: Settings) -> HierarchicalSegmentationModel:
    """Model from Settings (the reference's params-driven construction)."""
    from iv2019_tpu.models.resnet import FEATURE_EXTRACTOR_BLOCKS

    return HierarchicalSegmentationModel(
        taxonomy=get_taxonomy(settings.per_pixel_dataset_name),
        resnet_blocks=FEATURE_EXTRACTOR_BLOCKS[settings.name_feature_extractor],
        stride_feature_extractor=settings.stride_feature_extractor,
        feature_dims_decreased=settings.feature_dims_decreased,
        fov_expansion_kernel_size=settings.fov_expansion_kernel_size,
        fov_expansion_kernel_rate=settings.fov_expansion_kernel_rate,
        psp_module=settings.psp_module,
        upsampling_method=settings.upsampling_method,
        dilation_mode=settings.dilation_mode,
        root_conv_s2d=settings.root_conv_s2d,
        root_wgrad_pallas=settings.root_wgrad_pallas,
        remat=settings.remat,
        conv_impl=settings.conv_impl,
        bn_impl=settings.bn_impl,
        fused_block=settings.fused_block and settings.mode != "train",
        fuse_adaptation=settings.fuse_adaptation,
        norm_type=settings.norm_layer,
        batch_norm_decay=settings.batch_norm_decay,
        accumulate_norm_statistics=(
            settings.batch_norm_accumulate_statistics and settings.mode == "train"
        ),
        dtype=jnp.bfloat16 if settings.compute_dtype == "bfloat16" else jnp.float32,
    )
