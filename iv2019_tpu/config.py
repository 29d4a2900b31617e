"""Settings / flag registry for the TPU-native segmentation system.

Mirrors the public configuration surface of the reference
(``SemanticSegmentationArguments``, reference utils/utils.py:7-257, plus the
per-module ``add_*_arguments`` hooks and the ``_add_extra_args`` constants of
train.py:42-68), re-expressed as a typed dataclass. The same object flows
through the whole system (the reference passes a mutated argparse Namespace as
Estimator ``params``).

Derived training math (steps per epoch, LR boundary epoch->step conversion)
follows reference system_factory.py:189-248.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
from typing import Any, Optional

__all__ = ["Settings", "build_argparser", "settings_from_args", "TRAIN", "EVAL", "PREDICT"]

TRAIN = "train"
EVAL = "eval"
PREDICT = "predict"


@dataclasses.dataclass
class Settings:
    """All system settings. Field groups mirror the reference flag registry."""

    # -- system size (utils.py:34-48) --------------------------------------
    height_system: Optional[int] = None
    width_system: Optional[int] = None
    height_feature_extractor: int = 512
    width_feature_extractor: int = 1024

    # -- mode / dirs -------------------------------------------------------
    mode: str = TRAIN
    log_dir: str = ""
    per_pixel_dataset_name: str = "cityscapes"

    # -- problem definitions ----------------------------------------------
    training_problem_def_path: str = ""
    inference_problem_def_path: Optional[str] = None
    evaluation_problem_def_path: Optional[str] = None
    train_void_class: bool = False

    # -- training schedule (utils.py:56-119) -------------------------------
    Ntrain: int = 2975
    Ne: int = 17
    Nb: int = 4
    learning_rate_schedule: str = "piecewise_constant"  # | polynomial_decay
    learning_rate_initial: float = 0.01
    learning_rate_boundaries: tuple[int, ...] = (8, 15, 17)  # epochs
    learning_rate_decay: Optional[float] = None
    learning_rate_values: Optional[tuple[float, ...]] = None
    learning_rate_final: float = 0.5
    learning_rate_power: float = 0.9
    optimizer: str = "SGDM"  # | SGD
    momentum: float = 0.9
    use_nesterov: bool = False
    ema_decay: float = 0.9
    regularization_weight: float = 0.00017
    bootstrapping_percentage: int = -1
    save_checkpoints_steps: Optional[int] = None
    save_summaries_steps: int = 120
    init_ckpt_path: str = ""

    # -- mixed-supervision sub-batches (train.py:62-68) --------------------
    Nb_per_pixel: int = 4
    Nb_per_bbox: int = 8
    Nb_per_image: int = 4
    preserve_aspect_ratio_per_pixel: bool = False
    preserve_aspect_ratio_per_bbox: bool = True
    preserve_aspect_ratio_per_image: bool = True
    preserve_aspect_ratio: bool = False

    # -- augmentation (reference preprocessing/augmentation_library.py; the
    #    reference keeps the call sites disabled at input_cityscapes.py:104-120,
    #    so the default here is off = reference parity). Applied on device to
    #    the per-pixel sub-batch inside the train step, in the reference
    #    call-site order: color, blur, flip, scale.
    augmentations: tuple[str, ...] = ()  # subset of {color, blur, flip, scale}
    scaling_poi: tuple[float, float] = (1.0, 2.0)  # reference call-site value
    random_seed: int = 0

    # -- model (resnet50_extended_model_hierarchical.py:228-269) -----------
    name_feature_extractor: str = "resnet_v1_50"
    stride_feature_extractor: int = 8
    feature_dims_decreased: int = 256
    fov_expansion_kernel_size: int = 0
    fov_expansion_kernel_rate: int = 0
    upsampling_method: str = "bilinear"  # no | bilinear | hybrid
    psp_module: bool = False
    norm_layer: str = "batch"  # | group
    norm_train_variables: bool = True
    batch_norm_accumulate_statistics: bool = True
    batch_norm_decay: float = 0.9
    # no-op under SPMD: BatchNorm reduces over the full (sharded) global
    # batch, so cross-replica statistics are the only behavior — the flag is
    # accepted for reference CLI parity (utils/utils.py:111-113) and setting
    # it changes nothing
    cross_replica_norm: bool = False

    # -- numerics / TPU ----------------------------------------------------
    compute_dtype: str = "bfloat16"  # conv/matmul compute dtype; params stay f32
    num_devices: Optional[int] = None  # None = all visible devices
    # multi-slice (DCN) scaling: >1 builds a 2-D ('replica', 'data') mesh —
    # batch shards over both axes, XLA emits hierarchical (ICI-then-DCN)
    # collectives (parallel/mesh.create_mesh)
    num_slices: int = 1
    # spatial SPMD partitioning: >1 adds a 'spatial' mesh axis sharding the
    # image-height dim of every image/label/activation — XLA inserts conv
    # halo exchanges automatically. Lifts the reference's max-trainable-
    # image-size ceiling (input_vistas.py:7-10): per-chip activation memory
    # falls by this factor. Requires H divisible by 8*spatial_partitions.
    spatial_partitions: int = 1
    # rematerialize each backbone bottleneck unit in the backward pass
    # (jax.checkpoint): the unit's internal activations are recomputed
    # instead of stored — identical numerics, ~1/3 more backbone forward
    # FLOPs, large activation-memory savings at megapixel sizes. Composes
    # with spatial_partitions and grad_accum_steps (the three memory
    # levers; measured in tools/spatial_memory_table.py).
    remat: bool = False
    # split every train step into N sequential microbatches (lax.scan over
    # equal slices of all three supervision sub-batches), averaging the
    # gradients — one optimizer/EMA update per step at ~1/N the activation
    # memory. BatchNorm normalizes with per-microbatch statistics (the
    # same semantics as running with Nb_per_*/N), running stats advance N
    # momentum updates per step. The decision-gated weak losses normalize
    # by their own microbatch's gated-pixel count (the standard
    # accumulation semantics for dynamically-weighted losses) — measured
    # ~1e-4 relative vs the monolithic step, exact when the gate counts
    # are microbatch-uniform. Requires N | Nb_per_pixel/bbox/image.
    grad_accum_steps: int = 1
    # multi-host (multi-process) SPMD: every host runs the same program over
    # its local chips and JAX stitches them into one global mesh
    # (parallel/multihost.py). num_processes=1 (default) is single-process;
    # 0 means auto-detect (TPU pod slices — JAX reads the TPU metadata);
    # >1 requires coordinator_address ("host:port") and a distinct
    # process_id per process. Nb_per_* stay GLOBAL batch sizes — each
    # process's input pipeline produces Nb/num_processes examples from a
    # disjoint stride of the records.
    coordinator_address: str = ""
    num_processes: int = 1
    process_id: int = 0
    # deterministic host input pipelines: seeds the shuffle buffers and
    # random crops (on-device augmentations are already deterministic via
    # random_seed). None (default) = OS entropy, so interrupted runs resume
    # with a fresh record order. Multi-host decorrelates per process
    # (input_seed + 7919 * process_id).
    input_seed: Optional[int] = None
    # overlap checkpoint writes with training (orbax background thread);
    # reads (resume, eval sweeps) and train-exit always await in-flight
    # writes, so semantics are identical — only the step loop stops
    # blocking on disk I/O (utils/checkpoint.py)
    async_checkpoints: bool = True
    # single fused flat-vector kernel for SGDM + weight decay + EMA instead of
    # per-parameter update fusions (identical math; see train/fused_update.py)
    fused_optimizer: bool = True
    # run dilated backbone blocks as dense convs over phase-decomposed grids
    # (identical results; TPU-friendly layout — see models/resnet.py)
    dilation_mode: str = "dilated"  # | "space_to_batch" (identical results)
    # execute the 7x7/2 root conv as a 4x4/1 conv on 2x2 space-to-depth
    # input (identical math, same parameter; models/resnet.RootConvS2D)
    root_conv_s2d: bool = False
    root_wgrad_pallas: bool = False
    # execute every trunk conv as MXU dot_generals (1x1 -> one matmul,
    # kxk -> k*k tap-shifted matmuls; identical math, same parameters —
    # models/layers.dot_conv_same). With no conv ops left between the root
    # and the loss, XLA keeps matmul-friendly layouts end-to-end instead of
    # inserting conv<->dot relayout copies (docs/PERFORMANCE.md round 2).
    conv_impl: str = "conv"  # | "dot" | "dot_bwd" (1x1 convs keep the XLA
    # conv forward but take dot_general gradients — layers.conv1x1_dot_bwd)
    # train-mode BatchNorm backward: 'fused' uses the classic two-reduction
    # custom VJP (ops/fused_bn) instead of autodiff through flax's stats
    # graph — same math/params/stats, leaner conv-backward fusions on TPU
    bn_impl: str = "flax"  # | "fused"
    # hand-written Pallas kernel for the fused optimizer update
    # (ops/pallas_update.py; identical results). Auto-disabled on CPU.
    pallas_update: bool = True
    # weight of the weak (L2 vehicle/human) losses in the total:
    # total = L1 + coeff * (L2_vehicle + L2_human). The reference hardcodes
    # 0.1 (define_losses_hierarchical.py:203); exposed here as the main
    # knob for balancing weak-supervision signal against dense GT when the
    # per-pixel/weak data mix departs from the paper's
    weak_loss_coefficient: float = 0.1
    # eval/predict-mode backbone identity units as single Pallas kernels
    # (ops/pallas_block.py): BN folded into the convs, whole unit in VMEM,
    # ~2.7x less HBM traffic per unit. Identical parameter tree; per-unit
    # shape/VMEM gate falls back to the unfused graph. Train mode ignores
    # it (the BN statistics barrier — see the module docstring).
    fused_block: bool = False
    # Pallas-fused upsample+softmax-CE+gates loss kernel (ops/fused_loss.py):
    # computes the reference losses from stride-8 logits tile-wise in VMEM
    # without materializing full-resolution f32 logit tensors (identical
    # math, tested). Applies to training with bilinear upsampling; runs in
    # interpreter mode off-TPU.
    fused_loss: bool = True
    # grouped-conv execution of the 3 adaptation branches + heads (identical
    # math, 3x fewer kernels; different parameter layout than unfused)
    fuse_adaptation: bool = False
    # rasterize bbox weak labels on device from padded (cid, box) tensors
    # instead of on the host CPU (the reference's py_func bottleneck;
    # boxes are rasterized at the crop resolution, +-1px at box edges vs
    # rasterize-then-NN-resize)
    rasterize_on_device: bool = False
    # ship per-image weak labels as (Nb, 15) multinomial vectors and tile on
    # device instead of host-tiled dense (Nb, H, W, 15) — ~30 MB less
    # host->device transfer per weak image, exact same labels (the vector is
    # constant across the image, so resize/crop cannot change it)
    compact_image_labels: bool = False

    # -- inference / evaluation (utils.py:121-178) -------------------------
    ckpt_path: Optional[str] = None
    eval_all_ckpts: bool = False
    Neval: int = 500
    replace_voids: bool = False
    # test-time augmentation at evaluation (beyond reference): average
    # hierarchically-factorized common-space probabilities over these input
    # scales (and an optional horizontal flip) before the argmax — the
    # standard segmentation multi-scale/flip ensemble, compiled as ONE XLA
    # program (train/step._make_tta_eval_step)
    eval_scales: tuple[float, ...] = (1.0,)
    eval_flip: bool = False
    # native-resolution evaluation (beyond reference): resize eval inputs +
    # labels to this size instead of (hf, wf). The model is fully
    # convolutional so the plain eval graph handles any static size; with
    # --sliding_window the image is instead tiled with (hf, wf) windows at
    # window_overlap overlap and the factorized common-space probabilities
    # are stitched on a canvas (train/step._make_window_eval_step) — the
    # standard crop-of-training-size protocol, one XLA program, all shapes
    # static.
    eval_size: Optional[tuple[int, int]] = None
    sliding_window: bool = False
    window_overlap: float = 0.5
    # per-window blending: 'uniform' averages overlapping windows equally,
    # 'gaussian' weights by a center-peaked bump (sigma = size/8) so window
    # borders defer to better-centered neighbors — the standard
    # seam-suppression choice for sliding-window segmentation
    window_blend: str = "uniform"
    restore_emas: bool = False
    predict_dir: str = ""
    results_dir: Optional[str] = None
    plotting: bool = False
    plotting_overlapped: bool = False  # reference predict.py:127-135
    plot_l1_confidence: bool = False  # reference predict.py:109-123
    plot_l2_confidence: bool = False
    # no-op here: the reference's interactive plt.waitforbuttonpress wait
    # (predict.py:125,135); this CLI saves figures headlessly instead
    timeout: float = 10.0
    export_color_decisions: bool = False
    export_overlapped_color_decisions: bool = False  # reference predict.py:155-165
    export_lids_images: bool = False
    predict_keys: tuple[str, ...] = (
        "decisions",
        "l1_probabilities",
        "l2_vehicle_probabilities",
        "rawimages",
        "rawimagespaths",
    )

    # -- dataset paths -----------------------------------------------------
    tfrecords_path: str = ""
    tfrecords_path_per_pixel: str = ""
    dataset_directory: str = ""
    # OpenImages weak-label sources
    openimages_image_dir: str = ""
    openimages_bboxes_path: str = ""  # imageid2bboxes pickle/json
    openimages_image_labels_path: str = ""  # imageid2mids pickle/json
    # weak-label MID aggregation: "v2" (15 fine classes,
    # input_subset_bboxes_v2.py:38-53) or the legacy "v1" (10 aggregated
    # classes — all human MIDs merged, signs merged;
    # input_subset_bboxes.py:37-52). v1 cids are projected into the v2
    # space so the 15-class loss tables apply unchanged.
    openimages_label_space: str = "v2"
    # synthetic-data mode for benchmarking / tests without datasets on disk
    synthetic_data: bool = False

    # -- legacy / misc -----------------------------------------------------
    enable_xla: bool = True  # XLA is always on for JAX; kept for CLI parity
    distribute: bool = False  # kept for parity; JAX shards whenever >1 device

    # -- derived at runtime (filled by finalize()) -------------------------
    height_network: int = 0
    width_network: int = 0
    num_examples_per_epoch: int = 0
    num_batches_per_epoch: int = 0
    num_training_steps: int = 0
    learning_rate_boundaries_epochs: tuple[int, ...] = ()
    learning_rate_boundaries_steps: tuple[int, ...] = ()
    learning_rate_values_resolved: tuple[float, ...] = ()

    # ----------------------------------------------------------------------

    def replace(self, **kw: Any) -> "Settings":
        return dataclasses.replace(self, **kw)

    def validate(self) -> None:
        """Reference _validate_settings (system_factory.py:424-461)."""
        if self.height_network != self.height_feature_extractor or (
            self.width_network != self.width_feature_extractor
        ):
            raise ValueError(
                "For now height/width_network must equal "
                "height/width_feature_extractor (patch-wise training is not "
                "implemented)."
            )
        if self.learning_rate_schedule == "piecewise_constant":
            if bool(self.learning_rate_decay) == bool(self.learning_rate_values):
                raise AttributeError(
                    "If learning_rate_schedule is piecewise_constant exactly one "
                    "of learning_rate_decay or learning_rate_values must be given."
                )
        if self.upsampling_method not in ("no", "bilinear", "hybrid"):
            raise ValueError(f"unknown upsampling_method {self.upsampling_method}")
        if bool(self.fov_expansion_kernel_rate) != bool(self.fov_expansion_kernel_size):
            raise ValueError(
                "Both or neither of fov_expansion_kernel_{rate,size} must be set."
            )
        if self.name_feature_extractor not in (
            "resnet_v1_50", "resnet_v1_101", "resnet_v1_152"
        ):
            # the reference guards to resnet_v1_50 only
            # (system_factory.py:426-429); the deeper slim variants are a
            # pure capacity lever here (models/resnet.py block tables)
            raise NotImplementedError(
                "Only resnet_v1_{50,101,152} feature extractors are "
                "implemented."
            )
        if any(s <= 0 for s in self.eval_scales):
            raise ValueError(f"eval_scales must be positive, got {self.eval_scales}")
        if (self.eval_flip or tuple(self.eval_scales) != (1.0,)) and (
            self.spatial_partitions > 1
        ):
            # rescaled inputs change the H sharding contract mid-graph
            raise ValueError(
                "eval_scales/eval_flip (TTA) does not compose with "
                "spatial_partitions > 1; run TTA eval on the data mesh."
            )
        if not 0.0 <= self.window_overlap < 1.0:
            raise ValueError(
                f"window_overlap must be in [0, 1), got {self.window_overlap}"
            )
        if self.window_blend not in ("uniform", "gaussian"):
            raise ValueError(
                f"window_blend must be 'uniform' or 'gaussian', got "
                f"{self.window_blend!r}"
            )
        if self.eval_size is not None:
            eh, ew = self.eval_size
            if eh <= 0 or ew <= 0:
                raise ValueError(f"eval_size must be positive, got {self.eval_size}")
        if self.sliding_window:
            if self.eval_size is None:
                raise ValueError(
                    "--sliding_window needs --eval_size H W (the native "
                    "resolution to tile with (hf, wf) windows)."
                )
            eh, ew = self.eval_size
            if eh < self.height_feature_extractor or ew < self.width_feature_extractor:
                raise ValueError(
                    f"eval_size {self.eval_size} must be >= the window size "
                    f"({self.height_feature_extractor}, "
                    f"{self.width_feature_extractor})."
                )
            if self.spatial_partitions > 1:
                # dynamic window slices across a sharded H axis would insert
                # halo collectives per window; run windows on the data mesh
                raise ValueError(
                    "sliding_window does not compose with "
                    "spatial_partitions > 1."
                )
        if self.grad_accum_steps < 1:
            raise ValueError("grad_accum_steps must be >= 1.")
        if self.grad_accum_steps > 1:
            for name in ("Nb_per_pixel", "Nb_per_bbox", "Nb_per_image"):
                nb = getattr(self, name)
                if nb % self.grad_accum_steps:
                    raise ValueError(
                        f"grad_accum_steps={self.grad_accum_steps} must divide "
                        f"{name}={nb} (equal microbatch slices per supervision "
                        "type)."
                    )
        if self.bootstrapping_percentage != -1 and not (
            1 <= self.bootstrapping_percentage <= 100
        ):
            # registered-but-unconsumed in the reference (utils/utils.py:114);
            # here it is functional: bootstrapped CE keeps the top-p% hardest
            # per-pixel losses (losses/hierarchical.py:bootstrap_weights)
            raise ValueError(
                "--bootstrapping_percentage must be -1 (off) or in [1, 100], "
                f"got {self.bootstrapping_percentage}"
            )
        if self.openimages_label_space not in ("v1", "v2"):
            raise ValueError(
                f"openimages_label_space must be 'v1' or 'v2', got "
                f"{self.openimages_label_space!r}."
            )
        if self.num_processes < 0:
            raise ValueError("num_processes must be >= 0 (0 = TPU-pod auto).")
        if self.num_processes > 1:
            if not self.coordinator_address:
                raise ValueError(
                    "num_processes > 1 requires --coordinator_address host:port."
                )
            if not 0 <= self.process_id < self.num_processes:
                raise ValueError(
                    f"process_id {self.process_id} outside "
                    f"[0, {self.num_processes})."
                )
            for name in ("Nb_per_pixel", "Nb_per_bbox", "Nb_per_image"):
                nb = getattr(self, name)
                if nb % self.num_processes:
                    raise ValueError(
                        f"{name}={nb} must divide by num_processes="
                        f"{self.num_processes} (global batch, split per host)."
                    )

    def finalize(self) -> "Settings":
        """Fill derived fields. Returns a new Settings (self is untouched).

        Mirrors reference system_factory train() derived math
        (system_factory.py:197-248) incl. LR boundary epoch->step conversion.
        """
        s = self.replace(
            height_network=self.height_feature_extractor,
            width_network=self.width_feature_extractor,
        )
        # default for piecewise constant: decay 0.5 when nothing given
        lr_decay = s.learning_rate_decay
        lr_values = s.learning_rate_values
        if s.learning_rate_schedule == "piecewise_constant" and not (lr_decay or lr_values):
            lr_decay = 0.5

        # epoch/step math (patch-wise factors are ==1 by the validate() assert)
        num_examples_per_epoch = int(
            s.Ntrain
            * (s.height_network // s.height_feature_extractor)
            * (s.width_network // s.width_feature_extractor)
        )
        num_batches_per_epoch = int(num_examples_per_epoch / s.Nb)
        num_training_steps = int(s.Ne * num_batches_per_epoch)

        boundaries = list(s.learning_rate_boundaries)
        values: tuple[float, ...] = ()
        if s.learning_rate_schedule == "piecewise_constant":
            last_boundary = s.Ne - boundaries[-1]
            if last_boundary == 0:
                boundaries.pop()
            elif last_boundary < 0:
                raise ValueError("Ne is less than learning rate boundaries.")
            boundaries_steps = [b * num_batches_per_epoch for b in boundaries]
            if lr_decay:
                values = tuple(
                    s.learning_rate_initial * lr_decay**i
                    for i in range(len(boundaries_steps) + 1)
                )
            else:
                assert lr_values is not None
                values = tuple(lr_values)
                if len(values) != len(boundaries_steps) + 1:
                    raise ValueError(
                        f"piecewise_constant needs len(values) == len(boundaries)+1; "
                        f"got {len(values)} values, {len(boundaries_steps)} boundaries."
                    )
        else:
            boundaries_steps = []

        save_ckpt = s.save_checkpoints_steps or num_batches_per_epoch

        s = s.replace(
            learning_rate_decay=lr_decay,
            num_examples_per_epoch=num_examples_per_epoch,
            num_batches_per_epoch=num_batches_per_epoch,
            num_training_steps=num_training_steps,
            learning_rate_boundaries_epochs=tuple(boundaries),
            learning_rate_boundaries_steps=tuple(boundaries_steps),
            learning_rate_values_resolved=values,
            save_checkpoints_steps=save_ckpt,
        )
        s.validate()
        return s

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=1, default=str)

    def dump(self, path: str) -> None:
        """Persist settings for future reference (system_factory.py:252-261)."""
        items = sorted(dataclasses.asdict(self).items())
        with open(path, "w") as f:
            for i, (k, v) in enumerate(items):
                print(f"{i:2} : {k} : {v}", file=f)


# ---------------------------------------------------------------------------
# argparse surface (CLI parity with the reference entry points)
# ---------------------------------------------------------------------------


def _add_system_arguments(p: argparse.ArgumentParser) -> None:
    p.add_argument("--height_system", type=int, default=None)
    p.add_argument("--width_system", type=int, default=None)
    p.add_argument("--height_feature_extractor", type=int, default=512)
    p.add_argument("--width_feature_extractor", type=int, default=1024)
    p.add_argument("--enable_xla", action="store_true", default=True)
    p.add_argument("--compute_dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--num_devices", type=int, default=None)
    p.add_argument("--num_slices", type=int, default=1,
                   help="multi-slice (DCN) scaling: ('replica','data') mesh")
    p.add_argument("--spatial_partitions", type=int, default=1,
                   help="shard image height across chips (megapixel inputs)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize backbone units in backward "
                        "(identical numerics, less activation memory)")
    p.add_argument("--grad_accum_steps", type=int, default=1,
                   help="sequential microbatches per optimizer step "
                        "(averaged gradients, ~1/N activation memory)")
    p.add_argument("--coordinator_address", type=str, default="",
                   help="multi-host: JAX distributed coordinator host:port")
    p.add_argument("--num_processes", type=int, default=1,
                   help="multi-host process count; 0 = auto (TPU pod)")
    p.add_argument("--process_id", type=int, default=0,
                   help="this process's id in [0, num_processes)")
    p.add_argument("--async_checkpoints", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="overlap checkpoint writes with training steps")
    p.add_argument("--input_seed", type=int, default=None,
                   help="seed the host input pipelines (shuffle, crops) for "
                        "reproducible runs; default: OS entropy")
    p.add_argument("--fused_block", action="store_true",
                   help="eval/predict: run supported backbone identity units "
                        "as single Pallas kernels (BN folded into the convs; "
                        "ops/pallas_block.py). Ignored during training")
    p.add_argument("--synthetic_data", action="store_true")


def _add_model_arguments(p: argparse.ArgumentParser) -> None:
    """reference resnet50_extended_model_hierarchical.py:228-269"""
    p.add_argument("--stride_feature_extractor", type=int, default=8)
    p.add_argument("--name_feature_extractor", type=str, default="resnet_v1_50",
                   choices=["resnet_v1_50", "resnet_v1_101", "resnet_v1_152"])
    p.add_argument("--feature_dims_decreased", type=int, default=256)
    p.add_argument("--fov_expansion_kernel_size", type=int, default=0)
    p.add_argument("--fov_expansion_kernel_rate", type=int, default=0)
    p.add_argument("--upsampling_method", type=str, default="bilinear",
                   choices=["no", "bilinear", "hybrid"])
    p.add_argument("--psp_module", action="store_true")
    p.add_argument("--norm_layer", type=str, default="batch", choices=["batch", "group"])
    p.add_argument("--cross_replica_norm", action="store_true")
    p.add_argument("--norm_train_variables", action="store_true", default=True)
    p.add_argument("--batch_norm_accumulate_statistics", action="store_true", default=True)
    p.add_argument("--batch_norm_decay", type=float, default=0.9)


def _add_train_arguments(p: argparse.ArgumentParser) -> None:
    """reference utils/utils.py:56-119"""
    p.add_argument("log_dir", type=str)
    p.add_argument("per_pixel_dataset_name", type=str, choices=["cityscapes", "vistas"])
    p.add_argument("--Ntrain", type=int, default=2975)
    p.add_argument("--init_ckpt_path", type=str, default="")
    p.add_argument("--training_problem_def_path", type=str, default="")
    p.add_argument("--save_checkpoints_steps", type=int, default=None)
    p.add_argument("--save_summaries_steps", type=int, default=120)
    p.add_argument("--train_void_class", action="store_true")
    p.add_argument("--Ne", type=int, default=17)
    p.add_argument("--Nb", type=int, default=4)
    p.add_argument("--learning_rate_schedule", type=str, default="piecewise_constant",
                   choices=["piecewise_constant", "polynomial_decay"])
    p.add_argument("--learning_rate_initial", type=float, default=0.01)
    p.add_argument("--learning_rate_boundaries", type=int, default=[8, 15, 17], nargs="*")
    g = p.add_mutually_exclusive_group()
    g.add_argument("--learning_rate_decay", type=float, default=None)
    g.add_argument("--learning_rate_values", type=float, nargs="*", default=None)
    p.add_argument("--learning_rate_final", type=float, default=0.5)
    p.add_argument("--learning_rate_power", type=float, default=0.9)
    p.add_argument("--optimizer", type=str, default="SGDM", choices=["SGD", "SGDM"])
    p.add_argument("--ema_decay", type=float, default=0.9)
    p.add_argument("--regularization_weight", type=float, default=0.00017)
    p.add_argument(
        "--bootstrapping_percentage", type=int, default=-1,
        help="bootstrapped CE: keep only the top-p%% hardest (highest-loss) "
        "non-void pixels in the L1 loss; -1 disables (reference registers "
        "this flag at utils/utils.py:114 but never consumes it)",
    )
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--use_nesterov", action="store_true")
    p.add_argument("--distribute", action="store_true")
    # mixed-supervision sub-batch sizes (reference hard-codes 4/8/4 in
    # train.py:62-64; exposed as flags here, with those defaults)
    p.add_argument("--Nb_per_pixel", type=int, default=None)
    p.add_argument("--Nb_per_bbox", type=int, default=None)
    p.add_argument("--Nb_per_image", type=int, default=None)
    p.add_argument("--weak_loss_coefficient", type=float, default=0.1,
                   help="weight of the L2 vehicle/human (weak) losses in the "
                        "total; the reference hardcodes 0.1 "
                        "(define_losses_hierarchical.py:203)")
    p.add_argument("--augmentations", type=str, default="",
                   help="comma list from {color,blur,flip,scale}; default off "
                        "(reference parity: call sites disabled, "
                        "input_cityscapes.py:104-120)")
    p.add_argument("--random_seed", type=int, default=0)
    p.add_argument("--tfrecords_path_per_pixel", type=str, default="")
    p.add_argument("--dataset_directory", type=str, default="")
    p.add_argument("--openimages_image_dir", type=str, default="")
    p.add_argument("--openimages_bboxes_path", type=str, default="")
    p.add_argument("--openimages_image_labels_path", type=str, default="")
    p.add_argument("--openimages_label_space", type=str, default="v2",
                   choices=("v1", "v2"),
                   help="MID aggregation: v2 = 15 fine weak classes "
                        "(input_subset_bboxes_v2.py:38-53); v1 = legacy 10 "
                        "aggregated classes (input_subset_bboxes.py:37-52)")


def _add_inference_arguments(p: argparse.ArgumentParser) -> None:
    """reference utils/utils.py:121-150"""
    p.add_argument("log_dir", type=str)
    p.add_argument("training_problem_def_path", type=str)
    p.add_argument("predict_dir", type=str)
    p.add_argument("--ckpt_path", type=str, default=None)
    p.add_argument("--inference_problem_def_path", type=str, default=None)
    p.add_argument("--replace_voids", action="store_true")
    p.add_argument("--Nb", type=int, default=1)
    p.add_argument("--restore_emas", action="store_true")
    p.add_argument("--train_void_class", action="store_true")
    p.add_argument("--results_dir", type=str, default=None)
    p.add_argument("--per_pixel_dataset_name", type=str, default=None,
                   choices=["cityscapes", "vistas"],
                   help="training dataset (default: read from log_dir/settings.txt)")
    p.add_argument("--plotting", action="store_true")
    p.add_argument("--plotting_overlapped", action="store_true")
    p.add_argument("--plot_l1_confidence", action="store_true")
    p.add_argument("--plot_l2_confidence", action="store_true")
    p.add_argument("--timeout", type=float, default=10.0)
    p.add_argument("--export_color_decisions", action="store_true")
    p.add_argument("--export_overlapped_color_decisions", action="store_true")
    p.add_argument("--export_lids_images", action="store_true")
    p.add_argument("--preserve_aspect_ratio", action="store_true")
    _add_tta_arguments(p)


def _add_tta_arguments(p: argparse.ArgumentParser) -> None:
    """Inference-time ensembling / native-resolution flags (beyond
    reference), shared by evaluate and predict."""
    p.add_argument("--eval_scales", type=float, nargs="*", default=[1.0],
                   help="test-time augmentation: average factorized "
                        "probabilities over these input scales (e.g. "
                        "0.75 1.0 1.25) before the argmax")
    p.add_argument("--eval_flip", action="store_true",
                   help="test-time augmentation: also average with the "
                        "horizontally-flipped input")
    p.add_argument("--eval_size", type=int, nargs=2, default=None,
                   metavar=("H", "W"),
                   help="run inference at this resolution instead of "
                        "resizing inputs to (hf, wf); the network is fully "
                        "convolutional so any static size works")
    p.add_argument("--sliding_window", action="store_true",
                   help="tile the eval_size image with (hf, wf) windows at "
                        "--window_overlap overlap and stitch probabilities "
                        "(crop-of-training-size protocol)")
    p.add_argument("--window_overlap", type=float, default=0.5,
                   help="fractional overlap between adjacent sliding "
                        "windows (default 0.5)")
    p.add_argument("--window_blend", type=str, default="uniform",
                   choices=["uniform", "gaussian"],
                   help="how overlapping windows combine: equal averaging "
                        "or a center-peaked Gaussian weight that fades "
                        "window seams")


def _add_evaluate_arguments(p: argparse.ArgumentParser) -> None:
    """reference utils/utils.py:152-178"""
    p.add_argument("log_dir", type=str)
    p.add_argument("Neval", type=int)
    p.add_argument("training_problem_def_path", type=str)
    p.add_argument("--eval_all_ckpts", action="store_true")
    p.add_argument("--ckpt_path", type=str, default=None)
    p.add_argument("--evaluation_problem_def_path", type=str, default=None)
    _add_tta_arguments(p)
    p.add_argument("--replace_voids", action="store_true")
    p.add_argument("--train_void_class", action="store_true")
    p.add_argument("--Nb", type=int, default=1)
    p.add_argument("--restore_emas", action="store_true")
    p.add_argument("--tfrecords_path", type=str, default="")
    p.add_argument("--dataset_directory", type=str, default="")
    p.add_argument("--per_pixel_dataset_name", type=str, default=None,
                   choices=["cityscapes", "vistas"],
                   help="training dataset (default: read from log_dir/settings.txt; "
                        "the reference makes this a required positional, "
                        "evaluate.py:29-33)")


def build_argparser(mode: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    _add_system_arguments(p)
    _add_model_arguments(p)
    if mode == TRAIN:
        _add_train_arguments(p)
    elif mode == PREDICT:
        _add_inference_arguments(p)
    elif mode == EVAL:
        _add_evaluate_arguments(p)
    return p


def dataset_name_from_log_dir(log_dir: str) -> Optional[str]:
    """Read per_pixel_dataset_name from a training run's settings.txt.

    Evaluate/predict must rebuild the *trained* model (vistas and
    cityscapes differ in head widths: 53/12/5 vs 14/7/3); defaulting
    silently to cityscapes against a vistas checkpoint fails deep inside
    checkpoint restore with a shape error. The reference forces the user
    to repeat the dataset name as a positional (evaluate.py:29-33); we
    read it from the run itself.
    """
    try:
        with open(os.path.join(log_dir, "settings.txt")) as f:
            for line in f:
                parts = [t.strip() for t in line.split(":")]
                if len(parts) == 3 and parts[1] == "per_pixel_dataset_name":
                    return parts[2]
    except OSError:
        return None
    return None


# model-architecture-determining flags: eval/predict must rebuild the
# TRAINED architecture or checkpoint restore fails with shape errors deep
# inside orbax. Read from the run's settings.txt unless explicitly given.
_MODEL_SHAPE_FIELDS = {
    "name_feature_extractor": str,
    "stride_feature_extractor": int,
    "feature_dims_decreased": int,
    "fov_expansion_kernel_size": int,
    "fov_expansion_kernel_rate": int,
    "psp_module": lambda s: s == "True",
    "upsampling_method": str,
}


def trained_model_fields_from_log_dir(log_dir: str) -> dict:
    """Read the architecture-determining fields from a training run's
    settings.txt ('i : key : value' lines, Settings.dump). Missing file or
    keys -> empty/partial dict."""
    out: dict = {}
    try:
        with open(os.path.join(log_dir, "settings.txt")) as f:
            for line in f:
                parts = [t.strip() for t in line.split(" : ", 2)]
                if len(parts) == 3 and parts[1] in _MODEL_SHAPE_FIELDS:
                    out[parts[1]] = _MODEL_SHAPE_FIELDS[parts[1]](parts[2])
    except OSError:
        pass
    return out


def resolve_trained_model(
    settings: Settings, argv: Optional[list] = None
) -> Settings:
    """Apply the trained run's architecture flags for eval/predict modes.

    A flag the user passed explicitly (present in ``argv``) must match the
    training run — a contradiction is a hard error here, not a shape
    mismatch deep inside checkpoint restore. Flags not given fall back to
    the trained values (the reference instead requires the user to repeat
    every model flag, system_factory.py:426-429 + evaluate.py:29-33).
    """
    argv = sys.argv[1:] if argv is None else argv

    def given(key: str) -> bool:
        # both argparse spellings: "--key value" and "--key=value"
        return any(t == f"--{key}" or t.startswith(f"--{key}=") for t in argv)

    updates = {}
    for key, trained in trained_model_fields_from_log_dir(settings.log_dir).items():
        current = getattr(settings, key)
        if given(key):
            if current != trained:
                raise SystemExit(
                    f"--{key} {current} contradicts the training run in "
                    f"{settings.log_dir} (settings.txt says {trained})."
                )
        elif current != trained:
            updates[key] = trained
    return settings.replace(**updates) if updates else settings


def resolve_dataset_name(settings: Settings, explicit: Optional[str]) -> Settings:
    """Apply the trained dataset name for eval/predict modes.

    ``explicit`` is the CLI value (None = flag not given -> use the
    training run's settings.txt). An explicit value that contradicts the
    training run is a hard error, not a silent shape mismatch later.
    """
    trained = dataset_name_from_log_dir(settings.log_dir)
    if explicit is None:
        return settings.replace(per_pixel_dataset_name=trained or "cityscapes")
    if trained and trained != explicit:
        raise SystemExit(
            f"--per_pixel_dataset_name {explicit} contradicts the training "
            f"run in {settings.log_dir} (settings.txt says {trained})."
        )
    return settings


def settings_from_args(args: argparse.Namespace, mode: str, **extra: Any) -> Settings:
    """Build Settings from parsed CLI args + programmatic extras."""
    field_names = {f.name for f in dataclasses.fields(Settings)}
    kw = {k: v for k, v in vars(args).items() if k in field_names and v is not None}
    for k in ("learning_rate_boundaries", "learning_rate_values", "predict_keys",
              "eval_scales", "eval_size"):
        if k in kw and isinstance(kw[k], list):
            kw[k] = tuple(kw[k])
    if isinstance(kw.get("augmentations"), str):
        kw["augmentations"] = tuple(
            a.strip() for a in kw["augmentations"].split(",") if a.strip()
        )
    kw.update(extra)
    kw["mode"] = mode
    return Settings(**kw)
