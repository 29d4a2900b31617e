"""Jitted train / eval / predict step builders.

One traced+compiled XLA program per mode (the JAX analog of the reference's
mode-switched graph assembly, define_estimator_hierarchical.py:39-239):

- train_step: forward (mixed [pp|pb|pi] batch) -> hierarchical losses + L2
  reg -> grads -> SGDM update -> EMA update -> batch mIoU metric. Donated
  train state; batch sharded over the mesh 'data' axis, parameters
  replicated. XLA SPMD inserts the gradient all-reduce and makes BatchNorm
  statistics global-batch (sync-BN) automatically.
- eval_step: forward -> training->evaluation cid remap (probability
  summation) -> optional void replacement -> NN resize to label size ->
  batch confusion matrix (accumulated on device across steps).
- predict_step: forward -> selected heads resized to the requested output.

The images of the three supervision types are concatenated *inside* jit so
that each sub-batch stays evenly sharded on its own leading axis — the
per-device view is [pp_local | pb_local | pi_local], exactly the reference's
per-tower layout (get_temp_Nb contract).
"""

from __future__ import annotations

from typing import Any, Callable, Mapping, Optional

import jax
import jax.numpy as jnp

from iv2019_tpu.config import Settings
from iv2019_tpu.losses.hierarchical import define_losses, l2_regularization
from iv2019_tpu.models.model import build_model
from iv2019_tpu.ops.confusion import (
    batch_mean_iou,
    confusion_matrix,
    mean_iou_from_cm,
)
from iv2019_tpu.ops.resize import resize_bilinear, resize_nearest
from iv2019_tpu.ops.segment_ops import gather_cids, remap_probabilities
from iv2019_tpu.problem.problem_def import replace_voids
from iv2019_tpu.problem.taxonomy import get_taxonomy
from iv2019_tpu.train.optimizer import make_optimizer
from iv2019_tpu.train.state import TrainState
from iv2019_tpu.utils.compile import jit as tuned_jit

__all__ = ["make_train_step", "make_eval_step", "make_predict_step", "forward"]


def _summary_weight_masks(labels, l1_decisions, tax, weak_ix):
    """Loss weight masks recomputed for one example per head (summaries only;
    the fused kernel consumes the full-batch weights internally)."""
    import jax.numpy as jnp

    from iv2019_tpu.ops.segment_ops import segment_sum_channels

    pp = labels["prolabels_per_pixel"]
    l1_mask = (
        gather_cids(tax.per_pixel_cids2l1_cids, pp[0]) != tax.num_l1_classes - 1
    ).astype(jnp.float32)
    pb = labels["prolabels_per_bbox"]
    pi = labels["prolabels_per_image"]
    if pb.shape[0] or pi.shape[0]:
        weak0 = pb[0] if pb.shape[0] else pi[0]

        def _weak_mask(table, num, cid):
            lab = segment_sum_channels(weak0[None], table, num)[0]
            not_void = (1.0 - lab[..., -1]) > 0.01
            gate = jnp.logical_and(
                l1_decisions[weak_ix] == cid,
                jnp.max(lab[..., :-1], axis=-1) >= 0.01,
            )
            return jnp.logical_and(not_void, gate).astype(jnp.float32)

        veh = _weak_mask(
            tax.per_bbox_cids2vehicle_cids, tax.num_vehicle_classes, tax.cid_l1_vehicle
        )
        hum = _weak_mask(
            tax.per_bbox_cids2human_cids, tax.num_human_classes, tax.cid_l1_human
        )
    else:
        veh = (
            gather_cids(tax.per_pixel_cids2vehicle_cids, pp[0])
            != tax.num_vehicle_classes - 1
        ).astype(jnp.float32)
        hum = (
            gather_cids(tax.per_pixel_cids2human_cids, pp[0])
            != tax.num_human_classes - 1
        ).astype(jnp.float32)
    return {
        "l1_weights": l1_mask,
        "l2_vehicle_weights": veh,
        "l2_human_weights": hum,
    }


def forward(model, params, batch_stats, images, train: bool):
    variables = {"params": params, "batch_stats": batch_stats}
    if train:
        preds, mutated = model.apply(variables, images, mutable=["batch_stats"])
        return preds, mutated["batch_stats"]
    preds = model.apply(variables, images)
    return preds, batch_stats


def make_train_step(settings: Settings, model=None, tx=None, fused_opt=None, mesh=None) -> Callable:
    """Returns train_step(state, batch) -> (state, metrics), jit-compiled.

    batch: dict with 'proimages_per_pixel' (Npp,H,W,3), 'proimages_per_bbox',
    'proimages_per_image', 'prolabels_per_pixel' (int32), 'prolabels_per_bbox'
    / 'prolabels_per_image' ((N,H,W,15) f32).

    With ``fused_opt`` (train/fused_update.FusedSGDM) the L2 regularization
    enters through the optimizer's fused weight-decay gradient (identical
    math) instead of the loss, and the EMA lives in the fused opt state.
    """
    model = model or build_model(settings.replace(mode="train"))
    fused = fused_opt is not None
    if tx is None and not fused:
        tx, _ = make_optimizer(settings)
    tax = get_taxonomy(settings.per_pixel_dataset_name)
    # fused Pallas loss: run the model to stride-8 logits only (the x8
    # upsample + CE + gates happen tile-wise in VMEM, ops/fused_loss.py).
    # Parameter structure is identical (the bilinear upsampler is
    # parameter-free), so checkpoints/eval/predict are unaffected.
    from iv2019_tpu.ops.fused_loss import fused_loss_available

    use_fused_loss = (
        settings.fused_loss
        and getattr(model, "upsampling_method", None) == "bilinear"
        # spatial partitioning shards H: the Pallas loss would force an
        # all-gather of the full-resolution weak labels; the jnp loss is
        # SPMD-partitioned by XLA (H included) and stays distributed
        and not (mesh is not None and "spatial" in mesh.axis_names)
        # degenerate supervision mixes (per-pixel-only / weak-only / 2-way)
        # produce zero-row operands, which Mosaic does not compile; the jnp
        # loss handles empty sub-batches exactly
        and settings.Nb_per_pixel > 0
        and settings.Nb_per_bbox > 0
        and settings.Nb_per_image > 0
        # bootstrapped CE needs a batch-global sort over the raw L1 losses,
        # which the tile-wise Pallas loss never materializes
        and settings.bootstrapping_percentage == -1
        and fused_loss_available(
            (1, 1),
            (settings.height_feature_extractor, settings.width_feature_extractor),
            tax,
        )
    )
    loss_model = model.clone(upsampling_method="no") if use_fused_loss else model
    reg_weight = settings.regularization_weight
    ema_decay = settings.ema_decay
    # output_Nclasses equals the common fused label space for these problems
    num_classes = tax.num_common_classes
    augmentations = tuple(settings.augmentations)
    # unlabeled cid for label padding = void cid of the per-pixel space
    # (reference call site: max(_replacevoids(training lids2cids)))
    unlabeled_cid = len(tax.per_pixel_cids2l1_cids) - 1
    scaling_poi = tuple(settings.scaling_poi)
    aug_seed = settings.random_seed

    accum = settings.grad_accum_steps
    if accum > 1 and mesh is not None:
        # each microbatch must still shard evenly over the batch axes —
        # smaller slices would be partially replicated, inflating memory
        # instead of saving it
        import math

        from iv2019_tpu.parallel.mesh import batch_axes

        shards = math.prod(mesh.shape[a] for a in batch_axes(mesh))
        for name in ("Nb_per_pixel", "Nb_per_bbox", "Nb_per_image"):
            nb = getattr(settings, name)
            if nb and (nb // accum) % shards:
                raise ValueError(
                    f"grad_accum_steps={accum}: microbatch {name}={nb}//"
                    f"{accum} must divide by the {shards} batch shards of "
                    "the mesh."
                )

    def _assemble(batch: Mapping[str, Any], key_fold):
        """Images/labels tensors from one (micro)batch dict: augmentation,
        device-side bbox rasterization, compact image-label tiling, and the
        [pp|pb|pi] concat (the reference's per-tower layout)."""
        pp_images = batch["proimages_per_pixel"]
        pp_labels = batch["prolabels_per_pixel"]
        if augmentations:
            # on-device, batched, deterministic per (seed, step[, microbatch])
            from iv2019_tpu.ops.augment import apply_augmentations

            key = jax.random.fold_in(jax.random.PRNGKey(aug_seed), key_fold)
            pp_images, pp_labels = apply_augmentations(
                key, pp_images, pp_labels, augmentations, unlabeled_cid,
                scaling_poi,
            )
        images = jnp.concatenate(
            [
                pp_images,
                batch["proimages_per_bbox"],
                batch["proimages_per_image"],
            ],
            axis=0,
        )
        if "bbox_cids" in batch:
            # device-side weak-label rasterization from padded box tensors
            from iv2019_tpu.ops.rasterize import rasterize_bboxes

            h, w = images.shape[1], images.shape[2]
            prolabels_per_bbox = jax.vmap(
                lambda c, b: rasterize_bboxes(c, b, h, w)
            )(batch["bbox_cids"], batch["bbox_coords"])
        else:
            prolabels_per_bbox = batch["prolabels_per_bbox"]
        if "image_label_vecs" in batch:
            # compact per-image labels: tile the (Nb, C) multinomial vectors
            # to (Nb, H, W, C) on device (XLA fuses the broadcast — the host
            # never materializes or transfers the dense array)
            vecs = batch["image_label_vecs"]
            h, w = images.shape[1], images.shape[2]
            prolabels_per_image = jnp.broadcast_to(
                vecs[:, None, None, :], (vecs.shape[0], h, w, vecs.shape[1])
            )
        else:
            prolabels_per_image = batch["prolabels_per_image"]
        labels = {
            "prolabels_per_pixel": pp_labels,
            "prolabels_per_bbox": prolabels_per_bbox,
            "prolabels_per_image": prolabels_per_image,
        }
        return images, labels

    def _loss_and_grad(params, batch_stats, images, labels):
        def loss_fn(params):
            preds, new_batch_stats = forward(
                loss_model, params, batch_stats, images, True
            )
            if use_fused_loss:
                from iv2019_tpu.ops.fused_loss import define_losses_fused

                losses = define_losses_fused(
                    preds, labels, tax, images.shape[1:3], mesh=mesh,
                    weak_loss_coefficient=settings.weak_loss_coefficient,
                )
                decisions = losses["decisions"]
            else:
                losses = define_losses(
                    preds, labels, tax,
                    weak_loss_coefficient=settings.weak_loss_coefficient,
                    bootstrapping_percentage=settings.bootstrapping_percentage,
                )
                decisions = preds["decisions"]
            if fused:
                total = losses["total"]  # reg gradient added by the optimizer
                reg = 0.0
            else:
                reg = l2_regularization(params, reg_weight)
                total = losses["total"] + reg
            return total, (losses, reg, new_batch_stats, decisions)

        return jax.value_and_grad(loss_fn, has_aux=True)(params)

    def _weight_masks(labels, losses, decisions, n_pp, n_total):
        # loss weight masks for TB image summaries (reference
        # define_losses_hierarchical.py:140,167,187): one per-pixel example
        # for L1, one weak example for the gated L2 heads (where the paper's
        # decision gating is visible).
        weak_ix = n_pp if n_total > n_pp else 0
        if use_fused_loss:
            return _summary_weight_masks(
                labels, losses["l1_decisions"], tax, weak_ix
            )
        return {
            "l1_weights": losses["l1_weights"][0],
            "l2_vehicle_weights": losses["l2_vehicle_weights"][weak_ix],
            "l2_human_weights": losses["l2_human_weights"][weak_ix],
        }

    def train_step(state: TrainState, batch: Mapping[str, Any]):
        if accum == 1:
            images, labels = _assemble(batch, state.step)
            n_pp = labels["prolabels_per_pixel"].shape[0]
            (total, (losses, reg, new_batch_stats, decisions)), grads = (
                _loss_and_grad(state.params, state.batch_stats, images, labels)
            )
            miou = batch_mean_iou(
                labels["prolabels_per_pixel"], decisions[:n_pp], num_classes
            )
            weight_masks = _weight_masks(
                labels, losses, decisions, n_pp, images.shape[0]
            )
        else:
            # sequential microbatches (lax.scan): 1/accum activation memory,
            # gradients averaged, ONE optimizer/EMA update. The weighted
            # losses normalize per microbatch (sum(w*l)/count(w) over the
            # slice), so the average equals the monolithic step exactly when
            # gate counts are slice-uniform and to ~1e-4 relative otherwise
            # (tests/test_grad_accum.py pins both).
            # BatchNorm normalizes per microbatch and its running stats
            # advance `accum` momentum updates per step (the semantics of
            # training with Nb/accum); the confusion matrix is additive, so
            # the summed matrix gives exactly the full-batch train mIoU.
            # restack each batch tensor to [accum, N/accum, ...] and scan
            # over the (replicated) microbatch axis. Under SPMD the restack
            # is one reshard of the batch (scan's per-iteration slice then
            # runs on the replicated dim — no all-gather); slicing the
            # sharded batch dim directly instead would all-gather the full
            # global batch onto every device each iteration.
            batch_dict = dict(batch)

            def split(a):
                return a.reshape((accum, a.shape[0] // accum) + a.shape[1:])

            mbs = jax.tree_util.tree_map(split, batch_dict)
            if mesh is not None and "spatial" not in mesh.axis_names:
                # pin the restack to microbatch-major sharding (dim 1 = the
                # batch shards) so the scan body's per-iteration operand and
                # everything downstream stays batch-sharded — without the
                # constraint XLA's propagation pays the gains back
                from jax.sharding import NamedSharding, PartitionSpec as P

                from iv2019_tpu.parallel.mesh import batch_axes

                stacked = NamedSharding(mesh, P(None, batch_axes(mesh)))
                sliced = NamedSharding(mesh, P(batch_axes(mesh)))
                mbs = jax.tree_util.tree_map(
                    lambda a: jax.lax.with_sharding_constraint(a, stacked)
                    if a.shape[1] else a,
                    mbs,
                )
            else:
                sliced = None

            def body(carry, xs):
                i, mb = xs
                if sliced is not None:
                    mb = jax.tree_util.tree_map(
                        lambda a: jax.lax.with_sharding_constraint(a, sliced)
                        if a.shape[0] else a,
                        mb,
                    )
                batch_stats, gsum, acc = carry
                images, labels = _assemble(mb, state.step * accum + i)
                n_pp = labels["prolabels_per_pixel"].shape[0]
                (total, (losses, reg, new_bs, decisions)), grads = (
                    _loss_and_grad(state.params, batch_stats, images, labels)
                )
                cm = confusion_matrix(
                    labels["prolabels_per_pixel"], decisions[:n_pp], num_classes
                )
                masks = _weight_masks(
                    labels, losses, decisions, n_pp, images.shape[0]
                )
                acc = {
                    "total": acc["total"] + total,
                    "l1": acc["l1"] + losses["l1_segmentation"],
                    "veh": acc["veh"] + losses["l2_vehicle_segmentation"],
                    "hum": acc["hum"] + losses["l2_human_segmentation"],
                    # params-only: identical every microbatch (0.0 when the
                    # fused optimizer owns the weight-decay gradient)
                    "reg": jnp.asarray(reg, jnp.float32),
                    "cm": acc["cm"] + cm,
                    # summaries show the same examples as the accum=1 step
                    # (the first microbatch holds pp[0] and the first weak)
                    "masks": jax.tree_util.tree_map(
                        lambda new, old: jnp.where(i == 0, new, old),
                        masks, acc["masks"],
                    ),
                }
                gsum = jax.tree_util.tree_map(jnp.add, gsum, grads)
                return (new_bs, gsum, acc), None

            zero_masks = {
                "l1_weights": jnp.zeros(
                    batch_dict["prolabels_per_pixel"].shape[1:3], jnp.float32
                ),
            }
            zero_masks["l2_vehicle_weights"] = zero_masks["l1_weights"]
            zero_masks["l2_human_weights"] = zero_masks["l1_weights"]
            init = (
                state.batch_stats,
                jax.tree_util.tree_map(jnp.zeros_like, state.params),
                {
                    "total": jnp.zeros((), jnp.float32),
                    "l1": jnp.zeros((), jnp.float32),
                    "veh": jnp.zeros((), jnp.float32),
                    "hum": jnp.zeros((), jnp.float32),
                    "reg": jnp.zeros((), jnp.float32),
                    "cm": jnp.zeros((num_classes, num_classes), jnp.int32),
                    "masks": zero_masks,
                },
            )
            (new_batch_stats, gsum, acc), _ = jax.lax.scan(
                body, init, (jnp.arange(accum), mbs)
            )
            grads = jax.tree_util.tree_map(lambda g: g / accum, gsum)
            total = acc["total"] / accum
            losses = {
                "l1_segmentation": acc["l1"] / accum,
                "l2_vehicle_segmentation": acc["veh"] / accum,
                "l2_human_segmentation": acc["hum"] / accum,
            }
            reg = acc["reg"]
            miou = mean_iou_from_cm(acc["cm"])
            weight_masks = acc["masks"]

        if fused:
            new_params, new_opt_state, reg = fused_opt.update(
                grads, state.opt_state, state.params, state.step
            )
            total = total + reg
            new_state = state.replace(
                step=state.step + 1,
                params=new_params,
                opt_state=new_opt_state,
                batch_stats=new_batch_stats,
            )
        else:
            new_state = state.replace(batch_stats=new_batch_stats).apply_gradients(
                grads, tx, ema_decay
            )

        metrics = {
            "total": total,
            "l1_segmentation": losses["l1_segmentation"],
            "l2_vehicle_segmentation": losses["l2_vehicle_segmentation"],
            "l2_human_segmentation": losses["l2_human_segmentation"],
            "regularization": reg,
            # online batch mIoU on the per-pixel slice (reference
            # define_metrics)
            "miou": miou,
            "weight_masks": weight_masks,
        }
        return new_state, metrics

    return tuned_jit(train_step, donate_argnums=(0,))


def make_eval_step(settings: Settings, model=None, tcids2ecids=None) -> Callable:
    """Returns eval_step(params, batch_stats, images, prolabels) -> (K', K') cm.

    Implements the EVAL graph of the reference
    (define_estimator_hierarchical.py:161-194): training->evaluation cid remap
    via probability summation, optional top-2 void replacement, NN resize of
    decisions to label size, then the batch confusion matrix.
    """
    settings = settings.replace(mode="eval")
    model = model or build_model(settings)
    if tcids2ecids is None:
        tcids2ecids = settings_eval_map(settings)
    tcids2ecids = replace_voids(list(tcids2ecids))
    num_eval_classes = max(tcids2ecids) + 1
    do_replace_voids = settings.replace_voids
    tax = get_taxonomy(settings.per_pixel_dataset_name)
    # L1 probabilities live in the L1 head space; compose L1 -> common ->
    # eval so the probability remap is consistent with the fused decisions.
    # (The reference's probs remap silently no-ops for the hierarchical
    # model — unsorted_segment_sum shape mismatch swallowed at
    # define_estimator_hierarchical.py:516-522; we do it properly.)
    l1_cids2ecids = [tcids2ecids[c] for c in tax.l1_cids2common_cids]

    if getattr(settings, "sliding_window", False):
        return _make_window_eval_step(
            settings, model, tax, tcids2ecids, num_eval_classes,
            do_replace_voids,
        )

    tta_scales = tuple(getattr(settings, "eval_scales", (1.0,)) or (1.0,))
    tta_flip = bool(getattr(settings, "eval_flip", False))
    if tta_flip or tta_scales != (1.0,):
        return _make_tta_eval_step(
            settings, model, tax, tcids2ecids, num_eval_classes,
            do_replace_voids, tta_scales, tta_flip,
        )

    def eval_step(params, batch_stats, images, prolabels):
        preds, _ = forward(model, params, batch_stats, images, False)
        decs = gather_cids(tcids2ecids, preds["decisions"])
        if do_replace_voids:
            l1_probs = remap_probabilities(preds["l1_probabilities"], l1_cids2ecids)
            pad = num_eval_classes - l1_probs.shape[-1]
            if pad > 0:
                l1_probs = jnp.pad(l1_probs, ((0, 0), (0, 0), (0, 0), (0, pad)))
            decs = _replace_void_decisions(l1_probs, decs)
        label_hw = prolabels.shape[1:3]
        decs = resize_nearest(decs, label_hw, align_corners=True)
        return confusion_matrix(prolabels, decs, num_eval_classes)

    return tuned_jit(eval_step)


def _make_tta_eval_step(
    settings, model, tax, tcids2ecids, num_eval_classes,
    do_replace_voids, scales, flip,
):
    """Test-time-augmentation EVAL graph (beyond reference).

    Averages hierarchically-factorized common-space probabilities
    (models/model.hierarchical_common_probabilities) over input scales and
    an optional horizontal flip, remaps the averaged distribution to the
    evaluation label space (probability summation — the same remap the
    base eval graph applies, define_estimator_hierarchical.py:490-528),
    and takes the argmax there. One traced program: every scale is a
    static shape, so the whole ensemble compiles into one XLA executable.
    """
    from iv2019_tpu.models.model import hierarchical_common_probabilities
    from iv2019_tpu.ops.resize import resize_bilinear_mxu

    stride = settings.stride_feature_extractor

    def eval_step(params, batch_stats, images, prolabels):
        h, w = images.shape[1], images.shape[2]
        acc = None
        for s in scales:
            sh = max(int(round(h * s / stride)) * stride, stride)
            sw = max(int(round(w * s / stride)) * stride, stride)
            for do_flip in (False, True) if flip else (False,):
                im = images[:, :, ::-1, :] if do_flip else images
                if (sh, sw) != (h, w):
                    im = resize_bilinear_mxu(im, (sh, sw), align_corners=True)
                preds, _ = forward(model, params, batch_stats, im, False)
                p = hierarchical_common_probabilities(preds, tax)
                if do_flip:
                    p = p[:, :, ::-1, :]
                if (sh, sw) != (h, w):
                    p = resize_bilinear_mxu(p, (h, w), align_corners=True)
                acc = p if acc is None else acc + p
        probs_e = remap_probabilities(acc, tcids2ecids)
        pad = num_eval_classes - probs_e.shape[-1]
        if pad > 0:
            probs_e = jnp.pad(probs_e, ((0, 0), (0, 0), (0, 0), (0, pad)))
        decs = jnp.argmax(probs_e, axis=-1).astype(jnp.int32)
        if do_replace_voids:
            decs = _replace_void_decisions(probs_e, decs)
        label_hw = prolabels.shape[1:3]
        decs = resize_nearest(decs, label_hw, align_corners=True)
        return confusion_matrix(prolabels, decs, num_eval_classes)

    return tuned_jit(eval_step)


def window_origins(full: int, win: int, overlap: float) -> list[int]:
    """Static sliding-window start offsets covering [0, full).

    Windows of size ``win`` advance by ``win * (1 - overlap)``; the last
    window is clamped flush to the edge so coverage is exact. All values are
    Python ints computed at trace time — the compiled program sees only
    static shapes.
    """
    if win >= full:
        return [0]
    stride = max(int(round(win * (1.0 - overlap))), 1)
    origins = list(range(0, full - win + 1, stride))
    if origins[-1] != full - win:
        origins.append(full - win)
    return origins


def window_weight(wh: int, ww: int, blend: str):
    """Per-window contribution weight map (wh, ww, 1), trace-time constant.

    ``uniform``: every pixel weighs 1 — plain averaging. ``gaussian``: a
    separable Gaussian bump (sigma = size/8, the standard sliding-window
    blending choice) so window-center predictions dominate and seams fade
    where overlapping windows disagree; floored at 1e-3 of the peak to keep
    the canvas division well-conditioned where only one window covers.
    """
    import numpy as np

    if blend == "uniform":
        return np.ones((wh, ww, 1), np.float32)
    if blend != "gaussian":
        raise ValueError(f"unknown window_blend {blend!r}")

    def axis(n):
        c = (n - 1) / 2.0
        sigma = n / 8.0
        return np.exp(-0.5 * ((np.arange(n) - c) / sigma) ** 2)

    w = axis(wh)[:, None] * axis(ww)[None, :]
    return np.maximum(w / w.max(), 1e-3).astype(np.float32)[..., None]


def _window_plans(settings, full_hw, scales):
    """Per-scale static tiling plans: list of (sh, sw, origins, count).

    Each scale rescales ``full_hw`` to a stride-multiple size clamped to at
    least the (hf, wf) window, then tiles it with windows at
    ``window_overlap`` overlap. ``count`` is the per-pixel accumulated
    window weight (window_weight summed over origins) — a trace-time numpy
    constant used as the canvas divisor.
    """
    import numpy as np

    wh = settings.height_feature_extractor
    ww = settings.width_feature_extractor
    stride = settings.stride_feature_extractor
    eh, ew = full_hw
    weight = window_weight(
        wh, ww, getattr(settings, "window_blend", "uniform")
    )
    plans = []
    for s in scales:
        sh = max(int(round(eh * s / stride)) * stride, wh)
        sw = max(int(round(ew * s / stride)) * stride, ww)
        oys = window_origins(sh, wh, settings.window_overlap)
        oxs = window_origins(sw, ww, settings.window_overlap)
        origins = np.array([(y, x) for y in oys for x in oxs], np.int32)
        count = np.zeros((sh, sw, 1), np.float32)
        for oy, ox in origins:
            count[oy : oy + wh, ox : ox + ww] += weight
        plans.append((sh, sw, origins, count))
    return plans, weight


def _make_window_eval_step(
    settings, model, tax, tcids2ecids, num_eval_classes, do_replace_voids
):
    """Sliding-window EVAL graph (beyond reference).

    Evaluates a native-resolution image (``eval_size``) by tiling it with
    windows of the training size (hf, wf) at ``window_overlap`` overlap —
    the standard crop-of-training-size protocol. Each window's
    hierarchically-factorized common-space probabilities
    (models/model.hierarchical_common_probabilities) are accumulated on a
    probability canvas with a lax.scan over static window origins (the
    per-pixel window count is a trace-time numpy constant), then the
    averaged distribution is remapped to the evaluation label space and
    argmaxed — exactly the base eval graph's remap
    (define_estimator_hierarchical.py:490-528). One XLA program: the window
    shape is static, so the forward compiles once and is reused nw times by
    the scan.

    Composes with multi-scale / flip TTA (``eval_scales`` / ``eval_flip``):
    each ensemble member rescales the full image (clamped to at least the
    window size), tiles + stitches its own canvas over its own static
    origins, resizes the averaged canvas back to ``eval_size``, and the
    members' distributions are averaged before the label-space remap —
    the standard multi-scale sliding-window protocol, still one traced
    XLA program.
    """
    from iv2019_tpu.models.model import hierarchical_common_probabilities
    from iv2019_tpu.ops.resize import resize_bilinear_mxu

    wh = settings.height_feature_extractor
    ww = settings.width_feature_extractor
    eh, ew = settings.eval_size
    nc = tax.num_common_classes
    scales = tuple(getattr(settings, "eval_scales", (1.0,)) or (1.0,))
    flip = bool(getattr(settings, "eval_flip", False))
    plans, wmap = _window_plans(settings, (eh, ew), scales)

    def eval_step(params, batch_stats, images, prolabels):
        b, _, _, ch = images.shape

        def stitch(im, sh, sw, origins, count):
            canvas = jnp.zeros((b, sh, sw, nc), jnp.float32)

            def body(canvas, o):
                oy, ox = o[0], o[1]
                win = jax.lax.dynamic_slice(im, (0, oy, ox, 0), (b, wh, ww, ch))
                preds, _ = forward(model, params, batch_stats, win, False)
                p = hierarchical_common_probabilities(preds, tax)
                p = p * jnp.asarray(wmap)
                cur = jax.lax.dynamic_slice(
                    canvas, (0, oy, ox, 0), (b, wh, ww, nc)
                )
                return (
                    jax.lax.dynamic_update_slice(canvas, cur + p, (0, oy, ox, 0)),
                    None,
                )

            canvas, _ = jax.lax.scan(body, canvas, jnp.asarray(origins))
            return canvas / jnp.asarray(count)

        acc = None
        for sh, sw, origins, count in plans:
            for do_flip in (False, True) if flip else (False,):
                im = images[:, :, ::-1, :] if do_flip else images
                if (sh, sw) != (eh, ew):
                    im = resize_bilinear_mxu(im, (sh, sw), align_corners=True)
                p = stitch(im, sh, sw, origins, count)
                if do_flip:
                    p = p[:, :, ::-1, :]
                if (sh, sw) != (eh, ew):
                    p = resize_bilinear_mxu(p, (eh, ew), align_corners=True)
                acc = p if acc is None else acc + p
        probs_e = remap_probabilities(acc, tcids2ecids)
        pad = num_eval_classes - probs_e.shape[-1]
        if pad > 0:
            probs_e = jnp.pad(probs_e, ((0, 0), (0, 0), (0, 0), (0, pad)))
        decs = jnp.argmax(probs_e, axis=-1).astype(jnp.int32)
        if do_replace_voids:
            decs = _replace_void_decisions(probs_e, decs)
        label_hw = prolabels.shape[1:3]
        decs = resize_nearest(decs, label_hw, align_corners=True)
        return confusion_matrix(prolabels, decs, num_eval_classes)

    return tuned_jit(eval_step)


def settings_eval_map(settings: Settings):
    """training_cids2evaluation_cids from settings/problem defs."""
    from iv2019_tpu.problem.problem_def import load_problem_def

    train_pd = load_problem_def(settings.training_problem_def_path)
    if settings.evaluation_problem_def_path:
        eval_pd = load_problem_def(settings.evaluation_problem_def_path)
        if eval_pd.training_cids2evaluation_cids is not None:
            return list(eval_pd.training_cids2evaluation_cids)
    return train_pd.evaluation_cids_map(settings.train_void_class)


def _replace_void_decisions(probs, decs):
    """Top-2 void replacement (reference _replace_voids, :573-630).

    Where the decision equals the void class (the last channel of ``probs``)
    take the second-most-probable class instead. ``probs`` must live in the
    same label space as ``decs`` (the reference applies this after the eval
    cid remap; in predict mode we do the same, which fixes a latent label-
    space inconsistency of the reference's predict path).
    """
    top2 = jax.lax.top_k(probs, 2)[1]
    void_mask = decs == probs.shape[-1] - 1
    return jnp.where(void_mask, top2[..., 1], top2[..., 0]).astype(jnp.int32)


_HEAD_KEYS = (
    "l1_probabilities", "l2_vehicle_probabilities", "l2_human_probabilities"
)


def _tta_predict_heads(settings, model, scales, flip):
    """Per-head probabilities averaged over a scale/flip ensemble (beyond
    reference): each head's softmax distribution is computed per member,
    resized back to the input resolution, and averaged — the predict-mode
    counterpart of _make_tta_eval_step's common-space averaging, keeping
    the reference predict output contract (three per-head tensors)."""
    from iv2019_tpu.ops.resize import resize_bilinear_mxu

    stride = settings.stride_feature_extractor

    def compute(params, batch_stats, images):
        h, w = images.shape[1], images.shape[2]
        acc = None
        n = 0
        for s in scales:
            sh = max(int(round(h * s / stride)) * stride, stride)
            sw = max(int(round(w * s / stride)) * stride, stride)
            for do_flip in (False, True) if flip else (False,):
                im = images[:, :, ::-1, :] if do_flip else images
                if (sh, sw) != (h, w):
                    im = resize_bilinear_mxu(im, (sh, sw), align_corners=True)
                preds, _ = forward(model, params, batch_stats, im, False)
                member = []
                for k in _HEAD_KEYS:
                    p = preds[k]
                    if do_flip:
                        p = p[:, :, ::-1, :]
                    if (sh, sw) != (h, w):
                        p = resize_bilinear_mxu(p, (h, w), align_corners=True)
                    member.append(p)
                acc = member if acc is None else [a + m for a, m in zip(acc, member)]
                n += 1
        return tuple(a / n for a in acc)

    return compute


def _window_predict_heads(settings, model, tax, scales, flip):
    """Sliding-window per-head probability canvases (beyond reference).

    The predict-mode counterpart of _make_window_eval_step: tiles the
    ``eval_size`` input with (hf, wf) windows per scale/flip member,
    stitches each head's softmax distribution on its own canvas (averaging
    keeps each head normalized over its label space), and averages the
    members. Decisions are re-derived from the averaged heads by the
    model's argmax fusion in make_predict_step."""
    from iv2019_tpu.ops.resize import resize_bilinear_mxu

    wh = settings.height_feature_extractor
    ww = settings.width_feature_extractor
    eh, ew = settings.eval_size
    ncs = (
        tax.num_l1_classes,
        len(tax.l2_vehicle_cids2common_cids),
        len(tax.l2_human_cids2common_cids),
    )
    plans, wmap = _window_plans(settings, (eh, ew), scales)

    def compute(params, batch_stats, images):
        b, ih, iw, ch = images.shape
        if (ih, iw) != (eh, ew):
            raise ValueError(
                f"sliding-window predict compiled for eval_size ({eh}, {ew}) "
                f"but got images of ({ih}, {iw}); the predict pipeline must "
                "resize to eval_size"
            )

        def stitch(im, sh, sw, origins, count):
            canvases = tuple(
                jnp.zeros((b, sh, sw, nc), jnp.float32) for nc in ncs
            )

            def body(canvases, o):
                oy, ox = o[0], o[1]
                win = jax.lax.dynamic_slice(im, (0, oy, ox, 0), (b, wh, ww, ch))
                preds, _ = forward(model, params, batch_stats, win, False)
                new = []
                for canvas, k in zip(canvases, _HEAD_KEYS):
                    p = preds[k].astype(jnp.float32) * jnp.asarray(wmap)
                    cur = jax.lax.dynamic_slice(
                        canvas, (0, oy, ox, 0), (b, wh, ww, p.shape[-1])
                    )
                    new.append(
                        jax.lax.dynamic_update_slice(
                            canvas, cur + p, (0, oy, ox, 0)
                        )
                    )
                return tuple(new), None

            canvases, _ = jax.lax.scan(body, canvases, jnp.asarray(origins))
            return tuple(c / jnp.asarray(count) for c in canvases)

        acc = None
        n = 0
        for sh, sw, origins, count in plans:
            for do_flip in (False, True) if flip else (False,):
                im = images[:, :, ::-1, :] if do_flip else images
                if (sh, sw) != (eh, ew):
                    im = resize_bilinear_mxu(im, (sh, sw), align_corners=True)
                member = []
                for p in stitch(im, sh, sw, origins, count):
                    if do_flip:
                        p = p[:, :, ::-1, :]
                    if (sh, sw) != (eh, ew):
                        p = resize_bilinear_mxu(p, (eh, ew), align_corners=True)
                    member.append(p)
                acc = member if acc is None else [a + m for a, m in zip(acc, member)]
                n += 1
        return tuple(a / n for a in acc)

    return compute


def make_predict_step(
    settings: Settings, output_size: Optional[tuple[int, int]] = None, model=None
) -> Callable:
    """Returns predict_step(params, batch_stats, images) -> predictions dict.

    Mirrors the PREDICT graph (define_estimator_hierarchical.py:204-237):
    select the 4 supported heads, resize to the system size (or the given
    output_size), optional void replacement. Output resize uses
    align_corners=True as the reference does.

    Beyond reference: with ``eval_scales``/``eval_flip`` the per-head
    probabilities are averaged over the scale/flip ensemble; with
    ``sliding_window`` (+ ``eval_size``) they are stitched from
    training-size windows — decisions are then re-derived from the
    averaged heads by the same argmax fusion the model applies.
    """
    settings = settings.replace(mode="predict")
    model = model or build_model(settings)
    if output_size is None and settings.height_system and settings.width_system:
        output_size = (settings.height_system, settings.width_system)
    do_replace_voids = settings.replace_voids
    tax = get_taxonomy(settings.per_pixel_dataset_name)

    sliding = bool(getattr(settings, "sliding_window", False))
    scales = tuple(getattr(settings, "eval_scales", (1.0,)) or (1.0,))
    flip = bool(getattr(settings, "eval_flip", False))
    if sliding:
        compute_heads = _window_predict_heads(settings, model, tax, scales, flip)
    elif flip or scales != (1.0,):
        compute_heads = _tta_predict_heads(settings, model, scales, flip)
    else:
        compute_heads = None

    def _fuse(l1p, vehp, hump):
        # argmax fusion over the averaged per-head distributions — the same
        # two-level tf.where cascade as the model's hard fusion
        # (resnet50_extended_model_hierarchical.py:95-117)
        l1_decs = jnp.argmax(l1p, -1).astype(jnp.int32)
        return jnp.where(
            l1_decs == tax.cid_l1_vehicle,
            gather_cids(
                tax.l2_vehicle_cids2common_cids,
                jnp.argmax(vehp, -1).astype(jnp.int32),
            ),
            jnp.where(
                l1_decs == tax.cid_l1_human,
                gather_cids(
                    tax.l2_human_cids2common_cids,
                    jnp.argmax(hump, -1).astype(jnp.int32),
                ),
                gather_cids(tax.l1_cids2common_cids, l1_decs),
            ),
        )

    def predict_step(params, batch_stats, images):
        if compute_heads is None:
            preds, _ = forward(model, params, batch_stats, images, False)
            out = {
                "l1_probabilities": preds["l1_probabilities"],
                "l2_vehicle_probabilities": preds["l2_vehicle_probabilities"],
                "l2_human_probabilities": preds["l2_human_probabilities"],
                "decisions": preds["decisions"],
            }
        else:
            l1p, vehp, hump = compute_heads(params, batch_stats, images)
            out = {
                "l1_probabilities": l1p,
                "l2_vehicle_probabilities": vehp,
                "l2_human_probabilities": hump,
                "decisions": _fuse(l1p, vehp, hump),
            }
        if output_size is not None:
            for k in ("l1_probabilities", "l2_vehicle_probabilities", "l2_human_probabilities"):
                out[k] = resize_bilinear(out[k], output_size, align_corners=True)
            out["decisions"] = resize_nearest(
                out["decisions"], output_size, align_corners=True
            )
        if do_replace_voids:
            # project L1 probabilities into the common space so the top-2
            # lookup is consistent with the fused decisions' label space
            common_probs = remap_probabilities(
                out["l1_probabilities"], tax.l1_cids2common_cids
            )
            pad = tax.num_common_classes - common_probs.shape[-1]
            if pad > 0:
                common_probs = jnp.pad(
                    common_probs, ((0, 0), (0, 0), (0, 0), (0, pad))
                )
            out["decisions"] = _replace_void_decisions(common_probs, out["decisions"])
        return out

    return tuned_jit(predict_step)
