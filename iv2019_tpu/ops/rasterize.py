"""Bounding-box -> dense multinomial-label rasterization.

The reference generates weak ground truth from OpenImages bboxes with a
``tf.py_func`` numpy loop over up to 516 boxes — its input pipeline's
bottleneck (reference input_subset_bboxes_v2.py:74-98, speedup note :3-4).

Here rasterization is O(N + H*W) and fully vectorized, so it can run either
on host (numpy) or on device (jnp under jit, batched with vmap):

1. scatter the 4 signed corner deltas of each box into a (H+1, W+1, C) grid
2. 2-D inclusive cumulative sum -> per-pixel box-coverage counts
3. per-pixel normalization to a multinomial distribution, void (last
   channel) where no box covers the pixel

Semantics match the reference exactly: pixel box extents are
``int(coord * size)`` with the *max* edge inclusive, per-pixel counts are
normalized by their sum when > 0.5 else replaced by one-hot void. The
count-weighted multinomial over overlapping boxes ([2,1,0] -> [2/3,1/3,0])
is the v1 pipeline's formula (reference input_subset_bboxes.py:66-84),
which v2 kept — so this module covers the legacy v1 reader's labeling
semantics too (SURVEY C19); v1's remaining delta is only its hard-coded
10-class mid2cid table, superseded by the mapping files the v2 reader
(input/openimages.py) loads.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from iv2019_tpu.problem.taxonomy import NUM_WEAK_CLASSES

__all__ = [
    "rasterize_bboxes",
    "rasterize_bboxes_np",
    "rasterize_bboxes_pyloop",
    "image_label_multinomial_np",
]


def _corner_indices(cids, boxes, height: int, width: int, xp):
    """Common integer corner math. boxes: (N, 4) normalized (xmin, xmax, ymin, ymax)."""
    xmin = xp.floor(boxes[:, 0].astype(xp.float64) * width).astype(xp.int32)
    xmax = xp.floor(boxes[:, 1].astype(xp.float64) * width).astype(xp.int32)
    ymin = xp.floor(boxes[:, 2].astype(xp.float64) * height).astype(xp.int32)
    ymax = xp.floor(boxes[:, 3].astype(xp.float64) * height).astype(xp.int32)
    # max edge is inclusive (reference slices [min:max+1]); numpy slicing clamps
    # to the array bounds, mirror that with clipping
    y0 = xp.clip(ymin, 0, height)
    y1 = xp.clip(ymax + 1, 0, height)
    x0 = xp.clip(xmin, 0, width)
    x1 = xp.clip(xmax + 1, 0, width)
    valid = (cids >= 0) & (cids < NUM_WEAK_CLASSES) & (y1 > y0) & (x1 > x0)
    return y0, y1, x0, x1, valid


def rasterize_bboxes(cids, boxes, height: int, width: int) -> jnp.ndarray:
    """Device-side rasterization of one image's padded box list.

    Args:
      cids: (N,) int32 weak-label class ids; padding entries must be -1.
      boxes: (N, 4) float32 normalized (xmin, xmax, ymin, ymax).
      height, width: static output size.

    Returns:
      (height, width, NUM_WEAK_CLASSES) float32 per-pixel multinomial.
    """
    cids = jnp.asarray(cids, jnp.int32)
    boxes = jnp.asarray(boxes)
    y0, y1, x0, x1, valid = _corner_indices(cids, boxes, height, width, jnp)
    # route invalid boxes to the (H, W) gutter cells so they never contribute
    safe_cid = jnp.where(valid, cids, 0)
    gy0 = jnp.where(valid, y0, height)
    gy1 = jnp.where(valid, y1, height)
    gx0 = jnp.where(valid, x0, width)
    gx1 = jnp.where(valid, x1, width)

    delta = jnp.zeros((height + 1, width + 1, NUM_WEAK_CLASSES), jnp.float32)
    delta = delta.at[gy0, gx0, safe_cid].add(1.0)
    delta = delta.at[gy1, gx0, safe_cid].add(-1.0)
    delta = delta.at[gy0, gx1, safe_cid].add(-1.0)
    delta = delta.at[gy1, gx1, safe_cid].add(1.0)

    counts = jnp.cumsum(jnp.cumsum(delta[:height, :width], axis=0), axis=1)
    total = counts.sum(axis=-1, keepdims=True)
    void = jnp.zeros((NUM_WEAK_CLASSES,), jnp.float32).at[-1].set(1.0)
    return jnp.where(total > 0.5, counts / jnp.maximum(total, 1e-12), void)


def rasterize_bboxes_np(cids, boxes, height: int, width: int) -> np.ndarray:
    """Host-side rasterization (native C++ kernel when available, bit-exact
    vs :func:`rasterize_bboxes_pyloop`, ~13x faster)."""
    from iv2019_tpu import native

    fast = native.rasterize_bboxes(
        np.asarray(cids, np.int32), np.asarray(boxes, np.float32),
        height, width, NUM_WEAK_CLASSES,
    )
    if fast is not None:
        return fast
    return rasterize_bboxes_pyloop(cids, boxes, height, width)


def rasterize_bboxes_pyloop(cids, boxes, height: int, width: int) -> np.ndarray:
    """Pure-python oracle; loop form mirrors the reference py_func
    (input_subset_bboxes_v2.py:74-98)."""
    rla = np.zeros((height, width, NUM_WEAK_CLASSES), dtype=np.float32)
    for cid, (bxmin, bxmax, bymin, bymax) in zip(np.asarray(cids), np.asarray(boxes)):
        if not (0 <= cid < NUM_WEAK_CLASSES):
            continue
        xmin = int(bxmin * width)
        xmax = int(bxmax * width)
        ymin = int(bymin * height)
        ymax = int(bymax * height)
        rla[ymin : ymax + 1, xmin : xmax + 1, cid] += 1
    total = np.sum(rla, axis=2, keepdims=True)
    void = np.concatenate(
        [np.zeros(NUM_WEAK_CLASSES - 1, np.float32), np.ones(1, np.float32)]
    )
    return np.where(total > 0.5, rla / np.maximum(total, 1e-12), void)


def image_label_multinomial_np(cids_present) -> np.ndarray:
    """Image-level weak label: uniform multinomial over present classes.

    (reference input_subset_image_labels.py:73-96). Returns a
    (NUM_WEAK_CLASSES,) float32 vector; one-hot void when no class present.
    """
    vec = np.zeros(NUM_WEAK_CLASSES, dtype=np.float32)
    present = [c for c in set(int(c) for c in cids_present) if 0 <= c < NUM_WEAK_CLASSES - 1]
    if present:
        vec[np.asarray(present)] = 1.0 / len(present)
    else:
        vec[-1] = 1.0
    return vec
