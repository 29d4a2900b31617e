"""On-device augmentation library (batched, static-shape, jax.random).

TPU-native reimplementation of reference
preprocessing/augmentation_library.py. The reference unbatches images and
builds per-image dynamic-shape crop/resize/pad graphs; XLA requires static
shapes, so the geometric transforms are reformulated as *warps*: every
output pixel gathers from per-image dynamically-computed source coordinates
(static output shape, traced indices) and the whole batch runs as one
vmapped kernel — no unstack loop, no py_func.

Semantics parity (factor ranges, floor sizing, TF1-legacy resampling,
mean-constant padding, probabilities):
- random_upscaling (:38-158): random crop of size floor(HW/f), f~U[lo,hi],
  resized back with TF1 bilinear (image) / NN (label)
- random_downscaling (:160-296): image shrunk to floor(HW/f), centered on a
  canvas padded with the image mean; labels padded with unlabeled_cid
- random_scaling (:21-36): per image picks up- or down-scaling with p=1/2
- random_flipping (:298-321): per-image horizontal flip, p=1/2
- random_color (:323-406): one of 4 brightness/saturation/hue/contrast
  orderings (batch-wide selector, per-image deltas), applied with p=1/2,
  clipped to [0,1]
- random_blur (:408-466): p=1/2; cv2-parity median/bilateral filters as
  batched gather+sort / gather+weight kernels (`_median_filter` quantizes
  to uint8 like cv2.medianBlur; `_bilateral_filter` applies the space and
  range Gaussians of cv2.bilateralFilter), radius drawn per image,
  oracle-tested against cv2 in tests/test_blur_parity.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "apply_augmentations",
    "random_flipping",
    "random_scaling",
    "random_upscaling",
    "random_downscaling",
    "random_color",
    "random_blur",
    "VALID_AUGMENTATIONS",
]

VALID_AUGMENTATIONS = ("color", "blur", "flip", "scale")


def apply_augmentations(key, images, labels, names, unlabeled_cid: int,
                        poi=(1.0, 2.0)):
    """Apply the selected augmentations to a (images, int-labels) batch.

    Order matches the reference call site (input_cityscapes.py:104-120):
    color, blur, flip, scale. ``images`` are in [-1, 1) (post-centering);
    the color distortions run in [0, 1] exactly as the reference applies
    them before ``from_0_1_to_m1_1``. ``poi`` is the scaling factor range
    (reference call-site constant [1.0, 2.0]); ``unlabeled_cid`` pads labels
    revealed by downscaling (reference: max(training_lids2cids)).
    """
    names = tuple(names)
    unknown = set(names) - set(VALID_AUGMENTATIONS)
    if unknown:
        raise ValueError(f"unknown augmentations {sorted(unknown)}; "
                         f"valid: {VALID_AUGMENTATIONS}")
    k_color, k_blur, k_flip, k_scale = jax.random.split(key, 4)
    if "color" in names:
        images = random_color(k_color, (images + 1.0) * 0.5) * 2.0 - 1.0
    if "blur" in names:
        images = random_blur(k_blur, images)
    if "flip" in names:
        images, labels = random_flipping(k_flip, images, labels)
    if "scale" in names:
        images, labels = random_scaling(
            k_scale, images, labels, tuple(poi), unlabeled_cid
        )
    return images, labels


# --- geometric: warp helpers ----------------------------------------------


def _axis_coords(out_size: int, src_size, src_offset):
    """TF1-legacy bilinear coords for resizing ``src_size`` -> ``out_size``.

    src_size is a traced scalar (dynamic crop size); output length is static.
    Returns (lo, hi, frac) index arrays into the *original* image, offset by
    ``src_offset``.
    """
    y = jnp.arange(out_size, dtype=jnp.float32)
    src = y * (src_size.astype(jnp.float32) / out_size)
    lo = jnp.floor(src)
    frac = src - lo
    lo = jnp.clip(lo.astype(jnp.int32), 0, src_size - 1)
    hi = jnp.clip(lo + 1, 0, src_size - 1)
    return lo + src_offset, hi + src_offset, frac


def _warp_bilinear(image, size_hw, offset_hw):
    """Resample crop [offset, offset+size) of ``image`` to the full frame."""
    h, w = image.shape[0], image.shape[1]
    ylo, yhi, fy = _axis_coords(h, size_hw[0], offset_hw[0])
    xlo, xhi, fx = _axis_coords(w, size_hw[1], offset_hw[1])
    rows_lo = jnp.take(image, ylo, axis=0)
    rows_hi = jnp.take(image, yhi, axis=0)
    rows = rows_lo + (rows_hi - rows_lo) * fy[:, None, None]
    cols_lo = jnp.take(rows, xlo, axis=1)
    cols_hi = jnp.take(rows, xhi, axis=1)
    return cols_lo + (cols_hi - cols_lo) * fx[None, :, None]


def _warp_nearest(label, size_hw, offset_hw):
    h, w = label.shape[0], label.shape[1]

    def _idx(out_size, src_size, off):
        y = jnp.arange(out_size, dtype=jnp.float32)
        idx = jnp.floor(y * (src_size.astype(jnp.float32) / out_size)).astype(jnp.int32)
        return jnp.clip(idx, 0, src_size - 1) + off

    yi = _idx(h, size_hw[0], offset_hw[0])
    xi = _idx(w, size_hw[1], offset_hw[1])
    return jnp.take(jnp.take(label, yi, axis=0), xi, axis=1)


# --- geometric: public ops -------------------------------------------------


def random_flipping(key, images, labels):
    """Per-image horizontal flip with p=1/2."""
    flip = jax.random.bernoulli(key, 0.5, (images.shape[0],))
    fi = jnp.where(flip[:, None, None, None], images[:, :, ::-1, :], images)
    fl = jnp.where(flip[:, None, None], labels[:, :, ::-1], labels)
    return fi, fl


def random_upscaling(key, images, labels, poi):
    """Random crop of size floor(HW/f), f ~ U[poi], resized back up."""
    n, h, w = images.shape[:3]
    k_f, k_oy, k_ox = jax.random.split(key, 3)
    inv = jax.random.uniform(k_f, (n,), minval=1.0 / poi[1], maxval=1.0 / poi[0])
    ch = jnp.floor(inv * h).astype(jnp.int32)
    cw = jnp.floor(inv * w).astype(jnp.int32)
    oy = (jax.random.uniform(k_oy, (n,)) * (h - ch + 1).astype(jnp.float32)).astype(jnp.int32)
    ox = (jax.random.uniform(k_ox, (n,)) * (w - cw + 1).astype(jnp.float32)).astype(jnp.int32)

    pi = jax.vmap(_warp_bilinear)(images, jnp.stack([ch, cw], 1), jnp.stack([oy, ox], 1))
    pl = jax.vmap(_warp_nearest)(labels, jnp.stack([ch, cw], 1), jnp.stack([oy, ox], 1))
    return pi, pl


def random_downscaling(key, images, labels, poi, unlabeled_cid: int):
    """Shrink to floor(HW/f) centered on a mean-padded canvas."""
    n, h, w = images.shape[:3]
    inv = jax.random.uniform(key, (n,), minval=1.0 / poi[1], maxval=1.0 / poi[0])
    sh = jnp.floor(inv * h).astype(jnp.int32)
    sw = jnp.floor(inv * w).astype(jnp.int32)
    pad_y = (h - sh) // 2
    pad_x = (w - sw) // 2

    def _one(image, label, sh, sw, py, px):
        # output pixel y maps to small-image pixel (y - py), which samples the
        # original at (y - py) * h / sh (TF1 bilinear big->small resize)
        yy = jnp.arange(h, dtype=jnp.int32) - py
        xx = jnp.arange(w, dtype=jnp.int32) - px
        valid = (
            (yy >= 0) & (yy < sh)
        )[:, None] & ((xx >= 0) & (xx < sw))[None, :]

        ylo, yhi, fy = _axis_coords_small(yy, sh, h)
        xlo, xhi, fx = _axis_coords_small(xx, sw, w)
        rows_lo = jnp.take(image, ylo, axis=0)
        rows_hi = jnp.take(image, yhi, axis=0)
        rows = rows_lo + (rows_hi - rows_lo) * fy[:, None, None]
        cols_lo = jnp.take(rows, xlo, axis=1)
        cols_hi = jnp.take(rows, xhi, axis=1)
        out = cols_lo + (cols_hi - cols_lo) * fx[None, :, None]
        mean = jnp.mean(
            jnp.where(valid[..., None], out, 0.0),
            where=valid[..., None], axis=(0, 1), keepdims=True,
        ).mean()
        pro_im = jnp.where(valid[..., None], out, mean)

        yn = jnp.clip(
            jnp.floor(yy.astype(jnp.float32) * (h / jnp.maximum(sh, 1))).astype(jnp.int32),
            0, h - 1,
        )
        xn = jnp.clip(
            jnp.floor(xx.astype(jnp.float32) * (w / jnp.maximum(sw, 1))).astype(jnp.int32),
            0, w - 1,
        )
        lab = jnp.take(jnp.take(label, yn, axis=0), xn, axis=1)
        pro_la = jnp.where(valid, lab, unlabeled_cid)
        return pro_im, pro_la

    return jax.vmap(_one)(images, labels, sh, sw, pad_y, pad_x)


def _axis_coords_small(out_rel, src_small, src_big: int):
    """Bilinear coords sampling the *original* axis for a small-image pixel."""
    src = out_rel.astype(jnp.float32) * (src_big / jnp.maximum(src_small, 1).astype(jnp.float32))
    lo = jnp.floor(src)
    frac = src - lo
    lo = jnp.clip(lo.astype(jnp.int32), 0, src_big - 1)
    hi = jnp.clip(lo + 1, 0, src_big - 1)
    return lo, hi, frac


def random_scaling(key, images, labels, poi, unlabeled_cid: int):
    """Per image: upscaling or downscaling with p=1/2 (reference :21-36)."""
    k_sel, k_up, k_down = jax.random.split(key, 3)
    up_i, up_l = random_upscaling(k_up, images, labels, poi)
    dn_i, dn_l = random_downscaling(k_down, images, labels, poi, unlabeled_cid)
    sel = jax.random.uniform(k_sel, (images.shape[0],)) > 0.5
    pi = jnp.where(sel[:, None, None, None], up_i, dn_i)
    pl = jnp.where(sel[:, None, None], up_l, dn_l)
    return pi, pl


# --- illumination ----------------------------------------------------------


def _rgb_to_hsv(rgb):
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    mx = jnp.max(rgb, axis=-1)
    mn = jnp.min(rgb, axis=-1)
    d = mx - mn
    safe_d = jnp.where(d > 0, d, 1.0)
    h = jnp.where(
        mx == r, (g - b) / safe_d % 6.0,
        jnp.where(mx == g, (b - r) / safe_d + 2.0, (r - g) / safe_d + 4.0),
    ) / 6.0
    h = jnp.where(d > 0, h, 0.0)
    s = jnp.where(mx > 0, d / jnp.where(mx > 0, mx, 1.0), 0.0)
    return jnp.stack([h, s, mx], axis=-1)


def _hsv_to_rgb(hsv):
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1 - s)
    q = v * (1 - f * s)
    t = v * (1 - (1 - f) * s)
    i = i.astype(jnp.int32) % 6
    r = jnp.choose(i, [v, q, p, p, t, v], mode="clip")
    g = jnp.choose(i, [t, v, v, q, p, p], mode="clip")
    b = jnp.choose(i, [p, p, t, v, v, q], mode="clip")
    return jnp.stack([r, g, b], axis=-1)


def _adjust_brightness(img, delta):
    return img + delta


def _adjust_saturation(img, factor):
    hsv = _rgb_to_hsv(jnp.clip(img, 0.0, 1.0))
    hsv = hsv.at[..., 1].set(jnp.clip(hsv[..., 1] * factor, 0.0, 1.0))
    return _hsv_to_rgb(hsv)


def _adjust_hue(img, delta):
    hsv = _rgb_to_hsv(jnp.clip(img, 0.0, 1.0))
    hsv = hsv.at[..., 0].set((hsv[..., 0] + delta) % 1.0)
    return _hsv_to_rgb(hsv)


def _adjust_contrast(img, factor):
    mean = jnp.mean(img, axis=(0, 1), keepdims=True)  # per-channel
    return (img - mean) * factor + mean


_BRIGHTNESS_MAX_DELTA = 32.0 / 255.0
_SAT_CON_RANGE = (0.7, 1.3)
_HUE_MAX_DELTA = 0.1


def random_color(key, images):
    """One of 4 distortion orderings with p=1/2, batch-wide selector."""
    n = images.shape[0]
    k_sel, k_b, k_s, k_h, k_c = jax.random.split(key, 5)
    col_r = jax.random.randint(k_sel, (), 0, 8)
    deltas_b = jax.random.uniform(
        k_b, (n,), minval=-_BRIGHTNESS_MAX_DELTA, maxval=_BRIGHTNESS_MAX_DELTA
    )
    factors_s = jax.random.uniform(k_s, (n,), minval=_SAT_CON_RANGE[0], maxval=_SAT_CON_RANGE[1])
    deltas_h = jax.random.uniform(k_h, (n,), minval=-_HUE_MAX_DELTA, maxval=_HUE_MAX_DELTA)
    factors_c = jax.random.uniform(k_c, (n,), minval=_SAT_CON_RANGE[0], maxval=_SAT_CON_RANGE[1])

    def _distort(img, db, fs, dh, fc):
        ops = {
            "b": partial(_adjust_brightness, delta=db),
            "s": partial(_adjust_saturation, factor=fs),
            "h": partial(_adjust_hue, delta=dh),
            "c": partial(_adjust_contrast, factor=fc),
        }
        orderings = ["bshc", "sbch", "chbs", "hsbc"]  # reference orderings 0-3

        def _apply(order):
            def _fn(x):
                for op in order:
                    x = ops[op](x)
                return jnp.clip(x, 0.0, 1.0)
            return _fn

        return jax.lax.switch(
            jnp.minimum(col_r, 4),
            [_apply(o) for o in orderings] + [lambda x: x],
            img,
        )

    return jax.vmap(_distort)(images, deltas_b, factors_s, deltas_h, factors_c)


def blur_max_radius(h: int, w: int) -> int:
    """Max blur radius at a resolution: the reference draws kernel size
    ``2*(randint(0, rint(1.4*(res+1))) + 1) + 1`` with res in megapixels
    (augmentation_library.py:448-452), i.e. radius in [1, rint(1.4*(res+1))].
    """
    res = h * w / 1e6
    return max(int(np.rint(1.4 * (res + 1.0))), 1)


def blur_sigma_space(h: int, w: int) -> float:
    """Reference bilateral sigma: rint(25*(res+1)), res in megapixels
    (augmentation_library.py:458)."""
    res = h * w / 1e6
    return float(np.rint(25.0 * (res + 1.0)))


def _median_filter(img, radius, max_radius: int):
    """cv2.medianBlur parity: uint8-quantized median over a (2r+1)^2 window,
    BORDER_REPLICATE, per-channel; ``radius`` may be a traced scalar in
    [1, max_radius] (taps outside the current radius are masked out of the
    sort). Reference augmentation_library.py:454-457.
    """
    h, w = img.shape[0], img.shape[1]
    R = max_radius
    q = jnp.floor(img * 255.0)  # cv2 path quantizes: (img*255).astype(uint8)
    p = jnp.pad(q, [(R, R), (R, R), (0, 0)], mode="edge")
    taps, dys, dxs = [], [], []
    for dy in range(-R, R + 1):
        for dx in range(-R, R + 1):
            taps.append(p[R + dy : R + dy + h, R + dx : R + dx + w])
            dys.append(dy)
            dxs.append(dx)
    x = jnp.stack(taps, axis=-1)  # (h, w, c, K)
    off = jnp.maximum(jnp.abs(jnp.asarray(dys)), jnp.abs(jnp.asarray(dxs)))
    invalid = off > radius  # (K,)
    # masked median: invalid taps sort to the end; the median of the
    # k^2 = (2r+1)^2 valid taps is the element at index 2r^2+2r
    x = jnp.where(invalid, jnp.inf, x)
    x = jnp.sort(x, axis=-1)
    idx = 2 * radius * radius + 2 * radius
    med = jnp.take_along_axis(
        x, jnp.broadcast_to(idx, x.shape[:-1])[..., None], axis=-1
    )[..., 0]
    return med / 255.0


def _bilateral_filter(img, radius, max_radius: int, sigma: float):
    """cv2.bilateralFilter parity: Gaussian space weight exp(-.5 d2/ss^2) x
    Gaussian range weight exp(-.5 (L1 color diff)^2/sc^2), window diameter
    2r+1 (cv2 radius = d//2), BORDER_REFLECT_101. The reference calls it on
    [0,1) floats with sigmaColor = sigmaSpace = rint(25*(res+1))
    (augmentation_library.py:457-459) — with unit-range data the range
    kernel is then ~1, but the implementation is exact for any sigma.
    """
    h, w = img.shape[0], img.shape[1]
    R = max_radius
    p = jnp.pad(img, [(R, R), (R, R), (0, 0)], mode="reflect")
    num = jnp.zeros_like(img)
    den = jnp.zeros((h, w, 1), img.dtype)
    inv2s2 = 0.5 / (sigma * sigma)
    for dy in range(-R, R + 1):
        for dx in range(-R, R + 1):
            tap = p[R + dy : R + dy + h, R + dx : R + dx + w]
            # cv2 gathers a CIRCULAR window: sqrt(dy^2+dx^2) <= radius
            valid = ((dy * dy + dx * dx) <= radius * radius).astype(img.dtype)
            space_w = jnp.exp(-(dy * dy + dx * dx) * inv2s2)
            diff = jnp.abs(tap - img).sum(axis=-1, keepdims=True)
            wgt = valid * space_w * jnp.exp(-(diff * diff) * inv2s2)
            num = num + wgt * tap
            den = den + wgt
    return num / den


def random_blur(key, images):
    """p=1/2 blur, cv2-parity: median or bilateral, batch-wide selector,
    per-image resolution-dependent random kernel size.

    Faithful to reference augmentation_library.py:408-466: ``blu_r ~ U{0..3}``
    selects median (0) / bilateral (1) / identity (2, 3) for the WHOLE batch;
    each image then draws its own kernel radius in [1, rint(1.4*(res+1))]
    (median additionally uint8-quantizes like cv2.medianBlur). Implemented
    as masked-window gather/sort kernels on device instead of a cv2 py_func.
    """
    n, h, w = images.shape[0], images.shape[1], images.shape[2]
    max_r = blur_max_radius(h, w)
    sigma = blur_sigma_space(h, w)
    k1, k2 = jax.random.split(key)
    blu_r = jax.random.randint(k1, (), 0, 4)
    radii = jax.random.randint(k2, (n,), 1, max_r + 1)

    def _median(args):
        imgs, r = args
        return jax.vmap(lambda im, ri: _median_filter(im, ri, max_r))(imgs, r)

    def _bilateral(args):
        imgs, r = args
        return jax.vmap(
            lambda im, ri: _bilateral_filter(im, ri, max_r, sigma)
        )(imgs, r)

    return jax.lax.switch(
        jnp.minimum(blu_r, 2),
        [_median, _bilateral, lambda a: a[0]],
        (images, radii),
    )
