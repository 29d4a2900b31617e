"""Hierarchical mixed-supervision losses — the paper's core algorithm.

Parity with reference define_losses_hierarchical.py:14-224:

- batch layout contract: images are concatenated [per_pixel | per_bbox |
  per_image] along batch (reference per_pixel_per_bbox_per_image.py:50-77,
  loss convention define_losses_hierarchical.py:8-12)
- L1 (root) head: sparse softmax CE on the per-pixel sub-batch only, void
  pixels masked (:129-137)
- L2 (vehicle / human) heads: dense softmax CE over the *whole* batch
  against labels projected into each head's space; weights are
    per-pixel part: 1 - P(void)                                   (:154,:175)
    weak part:      (P(void) < 0.99)
                    ∧ (L1 online decision == metaclass cid)
                    ∧ (max non-void gt prob >= 0.01)              (:159-165)
  i.e. the root classifier's own decisions gate where weak labels produce
  gradient — self-training via hierarchy.
- total = L1 + 0.1 * (L2_vehicle + L2_human) (+ L2 regularization) (:202-206)
- weighted-loss reduction: sum(loss*w) / count_nonzero(w), zero-safe
  (tf.losses.compute_weighted_loss default SUM_BY_NONZERO_WEIGHTS)

Everything is computed in f32 from the f32 upsampled logits; gates and
labels are stop-gradiented as in the reference (:107,:118,:126).
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp

from iv2019_tpu.ops.segment_ops import gather_cids, segment_sum_channels
from iv2019_tpu.problem.taxonomy import Taxonomy

__all__ = [
    "define_losses",
    "l2_regularization",
    "weighted_loss",
    "bootstrap_weights",
]

WEAK_LOSS_COEFFICIENT = 0.1  # reference :203


def weighted_loss(raw_loss, weights):
    """tf.losses.compute_weighted_loss with SUM_BY_NONZERO_WEIGHTS reduction."""
    raw_loss = raw_loss.astype(jnp.float32)
    weights = weights.astype(jnp.float32)
    num_present = jnp.sum(weights != 0.0)
    total = jnp.sum(raw_loss * weights)
    return jnp.where(num_present > 0, total / jnp.maximum(num_present, 1.0), 0.0)


def bootstrap_weights(raw_loss, weights, percentage: int):
    """Online hard-example mining: keep the top-``percentage``% highest-loss
    pixels among the currently-weighted ones, zeroing the rest.

    Realizes ``--bootstrapping_percentage``. The reference registers the flag
    (utils/utils.py:114-115, "percentage of pixels ... for bootstrapping") but
    never consumes it; the semantics here follow the flag's documented intent —
    bootstrapped CE (Wu et al. 2016, arXiv:1605.06885): the keep-threshold is
    the k-th largest valid per-pixel loss with k = max(1, floor(valid·p/100)),
    computed batch-globally so scarce hard classes compete fairly across
    images. Ties at the threshold are kept (may retain slightly more than k).

    TPU notes: one static-shape descending sort + a dynamic gather for the
    threshold — everything stays inside jit, no host sync, no dynamic shapes.
    """
    flat_loss = raw_loss.reshape(-1).astype(jnp.float32)
    flat_w = weights.reshape(-1).astype(jnp.float32)
    valid = flat_w != 0.0
    num_valid = jnp.sum(valid.astype(jnp.int32))
    masked = jnp.where(valid, flat_loss, jnp.finfo(jnp.float32).min)
    sorted_desc = jnp.sort(masked)[::-1]
    k = jnp.maximum(num_valid * percentage // 100, 1)
    thr = sorted_desc[jnp.clip(k - 1, 0, masked.size - 1)]
    keep = jnp.logical_and(flat_loss >= thr, valid)
    return (flat_w * keep.astype(jnp.float32)).reshape(weights.shape)


def _sparse_softmax_ce(logits, labels):
    """Per-pixel sparse CE; labels must be valid indices (mask separately).

    Formulated as a one-hot multiply-reduce rather than take_along_axis:
    per-pixel channel gathers serialize on TPU (profiled ~34 ms/step) while
    the compare+select form fuses into the log_softmax pass.
    """
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    labels = jnp.clip(labels, 0, logits.shape[-1] - 1)
    one_hot = jax.nn.one_hot(labels, logits.shape[-1], dtype=log_probs.dtype)
    return -jnp.sum(one_hot * log_probs, axis=-1)


def _dense_softmax_ce(logits, labels):
    """Dense (multinomial-label) CE per pixel."""
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.sum(labels.astype(jnp.float32) * log_probs, axis=-1)


def _l2_head_loss(
    logits, per_pixel_labels_1h, weak_labels, l1_decisions, metaclass_cid: int, n_pp: int
):
    """Shared vehicle/human L2 loss with decision-gated weak weights."""
    labels = jnp.concatenate([per_pixel_labels_1h, weak_labels], axis=0)
    labels = jax.lax.stop_gradient(labels)
    raw = _dense_softmax_ce(logits, labels)

    pp_weights = 1.0 - labels[:n_pp, ..., -1]
    weak_void = labels[n_pp:, ..., -1]
    not_void = (1.0 - weak_void) > 0.01
    l1_correct = jnp.logical_and(
        jax.lax.stop_gradient(l1_decisions[n_pp:]) == metaclass_cid,
        jnp.max(labels[n_pp:, ..., :-1], axis=-1) >= 0.01,
    )
    weak_weights = jnp.logical_and(not_void, l1_correct).astype(jnp.float32)
    weights = jnp.concatenate([pp_weights, weak_weights], axis=0)
    return weighted_loss(raw, weights), weights


def define_losses(
    predictions: Mapping[str, Any],
    labels: Mapping[str, Any],
    taxonomy: Taxonomy,
    weak_loss_coefficient: float = WEAK_LOSS_COEFFICIENT,
    bootstrapping_percentage: int = -1,
) -> dict[str, jnp.ndarray]:
    """Training losses for the mixed-supervision batch.

    Args:
      predictions: model output dict (l1_logits (N,H,W,C1), l1_decisions
        (N,H,W), l2_{vehicle,human}_logits).
      labels: dict with 'prolabels_per_pixel' (Npp,H,W) int32,
        'prolabels_per_bbox' (Npb,H,W,15) f32, 'prolabels_per_image'
        (Npi,H,W,15) f32. Any weak sub-batch may be empty (size 0).
      taxonomy: label-space tables for the per-pixel dataset.

    Returns dict: total (w/o regularization — added by the train step),
    l1_segmentation, l2_vehicle_segmentation, l2_human_segmentation.
    """
    tax = taxonomy
    pp = labels["prolabels_per_pixel"]
    pb = labels["prolabels_per_bbox"]
    pi = labels["prolabels_per_image"]
    n_pp = pp.shape[0]

    l1_logits = predictions["l1_logits"]
    l1_decisions = predictions["l1_decisions"]

    # --- L1: sparse CE on the per-pixel slice only --------------------------
    l1_labels = gather_cids(tax.per_pixel_cids2l1_cids, pp)
    l1_labels = jax.lax.stop_gradient(l1_labels)
    l1_raw = _sparse_softmax_ce(l1_logits[:n_pp], l1_labels)
    # void = max cid of the L1 table; weights keep labels <= max-1
    l1_weights = (l1_labels <= int(tax.per_pixel_cids2l1_cids.max()) - 1).astype(
        jnp.float32
    )
    if bootstrapping_percentage != -1:
        # bootstrapped CE on the root head only: the L2 heads' weights encode
        # the paper's decision-gating mechanism and stay untouched.
        l1_weights = bootstrap_weights(l1_raw, l1_weights, bootstrapping_percentage)
    l1_loss = weighted_loss(l1_raw, l1_weights)

    # --- L2 heads: per-pixel one-hot + weak segment-sum projections ---------
    def _project(weak, table, n):
        if weak.shape[0] == 0:
            return jnp.zeros((0, *weak.shape[1:3], n), jnp.float32)
        return segment_sum_channels(weak, table, n)

    # vehicle
    veh_pp = jax.nn.one_hot(
        gather_cids(tax.per_pixel_cids2vehicle_cids, pp),
        tax.num_vehicle_classes,
        dtype=jnp.float32,
    )
    veh_weak = jnp.concatenate(
        [
            _project(pb, tax.per_bbox_cids2vehicle_cids, tax.num_vehicle_classes),
            _project(pi, tax.per_bbox_cids2vehicle_cids, tax.num_vehicle_classes),
        ],
        axis=0,
    )
    l2_vehicle_loss, l2_vehicle_weights = _l2_head_loss(
        predictions["l2_vehicle_logits"], veh_pp, veh_weak, l1_decisions,
        tax.cid_l1_vehicle, n_pp,
    )

    # human
    hum_pp = jax.nn.one_hot(
        gather_cids(tax.per_pixel_cids2human_cids, pp),
        tax.num_human_classes,
        dtype=jnp.float32,
    )
    hum_weak = jnp.concatenate(
        [
            _project(pb, tax.per_bbox_cids2human_cids, tax.num_human_classes),
            _project(pi, tax.per_bbox_cids2human_cids, tax.num_human_classes),
        ],
        axis=0,
    )
    l2_human_loss, l2_human_weights = _l2_head_loss(
        predictions["l2_human_logits"], hum_pp, hum_weak, l1_decisions,
        tax.cid_l1_human, n_pp,
    )

    seg_loss = l1_loss + weak_loss_coefficient * (l2_vehicle_loss + l2_human_loss)
    return {
        "total": seg_loss,
        "l1_segmentation": l1_loss,
        "l2_vehicle_segmentation": l2_vehicle_loss,
        "l2_human_segmentation": l2_human_loss,
        # weight masks exposed for debug summaries
        # (reference tf.summary.image 'l2_*_weights', :140,:167,:187)
        "l1_weights": l1_weights,
        "l2_vehicle_weights": l2_vehicle_weights,
        "l2_human_weights": l2_human_weights,
    }


def l2_regularization(params, weight_decay: float) -> jnp.ndarray:
    """slim l2_regularizer parity: weight_decay * sum_k ||W_k||^2 / 2.

    Applied to conv / dense kernels only (slim regularizes ``weights``, not
    biases or norm parameters).
    """
    leaves = jax.tree_util.tree_leaves_with_path(params)
    total = 0.0
    for path, leaf in leaves:
        last = path[-1]
        key = getattr(last, "key", getattr(last, "name", str(last)))
        if key == "kernel":
            total = total + jnp.sum(jnp.square(leaf.astype(jnp.float32)))
    return weight_decay * total * 0.5
