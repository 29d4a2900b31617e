"""TF1-exact image resizing for TPU (XLA-friendly gathers + lerps).

The reference relies on TF r1.12 ``tf.image.resize_images`` semantics in three
distinct flavors:

- model upsampler: bilinear, ``align_corners=True``
  (reference resnet50_extended_model_hierarchical.py:167)
- prediction resize: bilinear/NN, ``align_corners=True``
  (reference define_estimator_hierarchical.py:556-563)
- input pipelines: bilinear/NN, ``align_corners=False`` (TF1 legacy, *not*
  half-pixel centers) (reference utils/utils.py:592-595)

``jax.image.resize`` implements half-pixel-center sampling (TF2 default) and
matches *neither*, so we implement the TF1 kernels exactly:

- scale = (in-1)/(out-1) if align_corners and out>1 else in/out
- bilinear: src = dst * scale; top-left floor + lerp, clamped
- nearest:  src = floor(dst*scale) (legacy) or round(dst*scale) (aligned),
  clamped to in-1

All index/weight tables are computed with numpy at trace time (output sizes
are static under jit), so the hot path is two 1-D gathers + fused lerps per
spatial axis — memory-bound ops XLA fuses well on TPU. The same functions
work on numpy inputs for the host-side input pipeline.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
import jax.numpy as jnp

__all__ = [
    "resize_bilinear",
    "resize_bilinear_mxu",
    "resize_nearest",
    "resize_nearest_hw",
    "resize_images",
    "resize_labels",
]


def _tf1_scale(in_size: int, out_size: int, align_corners: bool) -> np.float32:
    """TF computes the scale AND coordinates in float32 — float64 here gives
    off-by-one indices at exact integer boundaries (e.g. 11 * (30/22))."""
    if align_corners and out_size > 1:
        return np.float32(in_size - 1) / np.float32(out_size - 1)
    return np.float32(in_size) / np.float32(out_size)


def _bilinear_tables(in_size: int, out_size: int, align_corners: bool):
    """(lo_idx, hi_idx, frac) numpy tables for one axis, TF1 semantics."""
    scale = _tf1_scale(in_size, out_size, align_corners)
    src = np.arange(out_size, dtype=np.float32) * scale
    lo = np.floor(src).astype(np.int64)
    lo = np.clip(lo, 0, in_size - 1)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = (src - lo).astype(np.float32)
    return lo, hi, frac


def _nearest_table(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    scale = _tf1_scale(in_size, out_size, align_corners)
    src = np.arange(out_size, dtype=np.float32) * scale
    if align_corners:
        # TF uses roundf: half away from zero (NOT numpy's half-to-even)
        idx = np.floor(src + np.float32(0.5)).astype(np.int64)
    else:
        idx = np.floor(src).astype(np.int64)
    return np.clip(idx, 0, in_size - 1)


def _ns(x):
    """Array namespace (numpy for np inputs, jnp otherwise)."""
    return np if isinstance(x, np.ndarray) else jnp


def resize_bilinear(images, size: Sequence[int], align_corners: bool = False):
    """TF1 bilinear resize of NHWC (or HWC) float images to ``size`` (h, w).

    Returns float32 (like tf.image.resize_images on float input).
    """
    xp = _ns(images)
    squeeze = images.ndim == 3
    if squeeze:
        images = images[None]
    n, in_h, in_w, c = images.shape
    out_h, out_w = int(size[0]), int(size[1])
    if (in_h, in_w) == (out_h, out_w):
        out = images.astype(xp.float32)
        return out[0] if squeeze else out

    y_lo, y_hi, y_frac = _bilinear_tables(in_h, out_h, align_corners)
    x_lo, x_hi, x_frac = _bilinear_tables(in_w, out_w, align_corners)

    imgs = images.astype(xp.float32)
    # gather along W then lerp: (N, H, out_w, C)
    left = xp.take(imgs, x_lo, axis=2)
    right = xp.take(imgs, x_hi, axis=2)
    wx = x_frac.reshape(1, 1, out_w, 1)
    row = left + (right - left) * wx
    # gather along H then lerp: (N, out_h, out_w, C)
    top = xp.take(row, y_lo, axis=1)
    bot = xp.take(row, y_hi, axis=1)
    wy = y_frac.reshape(1, out_h, 1, 1)
    out = top + (bot - top) * wy
    return out[0] if squeeze else out


def _bilinear_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """(out, in) dense interpolation matrix with <=2 nonzeros per row."""
    lo, hi, frac = _bilinear_tables(in_size, out_size, align_corners)
    m = np.zeros((out_size, in_size), dtype=np.float32)
    rows = np.arange(out_size)
    np.add.at(m, (rows, lo), 1.0 - frac)
    np.add.at(m, (rows, hi), frac)
    return m


def resize_bilinear_mxu(images, size: Sequence[int], align_corners: bool = False):
    """TF1-exact bilinear resize as two MXU matmuls (NHWC, jnp only).

    Mathematically identical to :func:`resize_bilinear` but formulated as
    contractions with trace-time-constant interpolation matrices, which XLA
    maps onto the systolic array instead of serializing gathers — the fast
    path for the in-model x8 logit upsampler. f32 accumulation.
    """
    n, in_h, in_w, c = images.shape
    out_h, out_w = int(size[0]), int(size[1])
    if (in_h, in_w) == (out_h, out_w):
        return images.astype(jnp.float32)
    wh = jnp.asarray(_bilinear_matrix(in_h, out_h, align_corners))
    ww = jnp.asarray(_bilinear_matrix(in_w, out_w, align_corners))
    x = images.astype(jnp.float32)
    # W axis first (cheaper at the small H), then H axis
    # (n, h, w, c) x (out_w, w) -> (n, h, c, out_w)
    x = jax.lax.dot_general(
        x, ww, (((2,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (n, h, c, out_w)
    # (n, h, c, out_w) x (out_h, h) -> (n, c, out_w, out_h)
    x = jax.lax.dot_general(
        x, wh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (n, c, out_w, out_h)
    return jnp.transpose(x, (0, 3, 2, 1))


def _resize_nearest_axes(features, size, align_corners: bool, axis0: int):
    xp = _ns(features)
    in_h = features.shape[axis0]
    in_w = features.shape[axis0 + 1]
    out_h, out_w = int(size[0]), int(size[1])
    if (in_h, in_w) == (out_h, out_w):
        return features
    y_idx = _nearest_table(in_h, out_h, align_corners)
    x_idx = _nearest_table(in_w, out_w, align_corners)
    out = xp.take(features, y_idx, axis=axis0)
    out = xp.take(out, x_idx, axis=axis0 + 1)
    return out


def resize_nearest(features, size: Sequence[int], align_corners: bool = False):
    """TF1 nearest-neighbor resize along the two spatial axes.

    Batched convention: rank >= 3 is treated as N,H,W[,C] (leading batch
    axis); rank 2 as H,W. For *unbatched* H,W,C tensors use
    :func:`resize_nearest_hw`.
    """
    axis0 = 1 if features.ndim >= 3 else 0
    return _resize_nearest_axes(features, size, align_corners, axis0)


def resize_nearest_hw(features, size: Sequence[int], align_corners: bool = False):
    """NN-resize with the spatial dims leading: H,W[,C] (single example)."""
    return _resize_nearest_axes(features, size, align_corners, 0)


def resize_images(images, size, method: str = "bilinear", align_corners: bool = False):
    """Dispatch on method name, mirroring tf.image.resize_images usage."""
    if method == "bilinear":
        return resize_bilinear(images, size, align_corners)
    if method in ("nearest", "nearest_neighbor"):
        return resize_nearest(images, size, align_corners)
    raise ValueError(f"unsupported resize method {method!r}")


def resize_labels(labels, size, align_corners: bool = False):
    """NN-resize integer label maps (NHW or HW)."""
    return resize_nearest(labels, size, align_corners)
