"""On-device confusion-matrix accumulation and mIoU.

Replaces the reference's C++ ``tf.confusion_matrix`` /
``metrics_impl._streaming_confusion_matrix`` ops
(reference define_metrics.py:5-20, define_estimator_hierarchical.py:185-194)
with XLA-native formulations:

- small K: one-hot matmul — a (P, K) x (P, K) contraction that runs on the
  MXU instead of a serialized scatter
- large K: flat scatter-add (K*K bincount)

Streaming evaluation keeps a (K, K) int32 accumulator in device memory and
adds each batch's matrix; across a device mesh the per-device partial
matrices are summed by ``jax.lax.psum``/sharded reduction at the end.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["confusion_matrix", "batch_mean_iou", "metrics_from_confusion_matrix"]

_EPSILON = 1e-9
# above this many K*K cells, one-hot matmul's (P, K) operands get too wide
# and a scatter-add wins
_MATMUL_MAX_CLASSES = 128


def confusion_matrix(labels, predictions, num_classes: int, weights=None):
    """Confusion matrix of shape (num_classes, num_classes), int32.

    ``cm[i, j]`` counts pixels with label i predicted as j, matching
    ``tf.confusion_matrix``. Out-of-range entries (e.g. padded pixels given
    label >= num_classes) are dropped via the weights mask.

    labels, predictions: integer arrays of identical shape.
    weights: optional {0,1} mask of the same shape.
    """
    labels = labels.reshape(-1).astype(jnp.int32)
    predictions = predictions.reshape(-1).astype(jnp.int32)
    valid = (labels >= 0) & (labels < num_classes) & (predictions >= 0) & (
        predictions < num_classes
    )
    if weights is not None:
        valid = valid & (weights.reshape(-1) > 0)

    if num_classes <= _MATMUL_MAX_CLASSES:
        # MXU path: (K, P) x (P, K) matmul of one-hot encodings.
        lab_oh = jax.nn.one_hot(jnp.where(valid, labels, -1), num_classes, dtype=jnp.float32)
        pred_oh = jax.nn.one_hot(
            jnp.where(valid, predictions, -1), num_classes, dtype=jnp.float32
        )
        cm = jnp.dot(lab_oh.T, pred_oh, preferred_element_type=jnp.float32)
        return cm.astype(jnp.int32)

    flat = labels * num_classes + predictions
    flat = jnp.where(valid, flat, num_classes * num_classes)
    counts = jnp.zeros(num_classes * num_classes + 1, dtype=jnp.int32).at[flat].add(1)
    return counts[:-1].reshape(num_classes, num_classes)


def batch_mean_iou(labels, decisions, num_classes: int):
    """Batch mIoU, the online training metric (reference define_metrics.py:5-20).

    Uses the reference's exact formula: mean over *all* classes of
    inter / (union + eps) — classes absent from both labels and decisions
    contribute 0 (no nan-masking here, unlike the eval-time report).
    """
    return mean_iou_from_cm(confusion_matrix(labels, decisions, num_classes))


def mean_iou_from_cm(cm):
    """The batch_mean_iou formula on a (summed) confusion matrix — the
    matrix is additive, so accumulating per-microbatch matrices and applying
    this gives exactly the full-batch metric (train/step.py grad accum)."""
    cm = cm.astype(jnp.float32)
    inter = jnp.diagonal(cm)
    union = cm.sum(axis=0) + cm.sum(axis=1) - inter
    return jnp.mean(inter / (union + _EPSILON))


def metrics_from_confusion_matrix(cm: np.ndarray) -> dict:
    """Numpy metric post-processing (reference utils/utils.py:385-446 math).

    Returns global accuracy, per-class accuracies / IoUs (percent), and
    nan-masked means.
    """
    cm = np.asarray(cm)
    with np.errstate(divide="ignore", invalid="ignore"):
        global_accuracy = np.trace(cm) / np.sum(cm) * 100
        accuracies = np.diagonal(cm) / np.sum(cm, 1) * 100
        inter = np.diagonal(cm)
        union = np.sum(cm, 0) + np.sum(cm, 1) - np.diagonal(cm)
        ious = inter / np.where(union > 0, union, np.ones_like(union)) * 100
    notnan_mask = np.logical_not(np.isnan(accuracies))
    mean_accuracy = float(np.mean(accuracies[notnan_mask]))
    mean_iou = float(np.mean(ious[notnan_mask]))
    return {
        "global_accuracy": float(global_accuracy),
        "accuracies": accuracies,
        "ious": ious,
        "notnan_mask": notnan_mask,
        "mean_accuracy": mean_accuracy,
        "mean_iou": mean_iou,
    }
