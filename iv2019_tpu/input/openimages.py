"""OpenImages (OpenScapes) weak-supervision input pipelines.

Two pipelines, parity with the reference:

- bounding boxes (input_subset_bboxes_v2.py): a {imageid: [(mid, (xmin,
  xmax, ymin, ymax)), ...]} mapping (pickle or json) + a JPEG directory.
  Ground truth is a dense per-pixel 15-class multinomial rasterized from the
  boxes — overlap-normalized, void where no box (reference :74-98) — then
  aspect-preserving resized + randomly cropped to (hf, wf).
- image-level labels (input_subset_image_labels.py): {imageid: [mids]};
  ground truth is a single multinomial vector (uniform over present
  classes) tiled to the image size (:73-96,:107).

Both honor ``--openimages_label_space``: "v2" (default, 15 fine classes) or
the legacy "v1" aggregation (input_subset_bboxes.py:37-52 — human MIDs
merged, signs merged), realized as a projection into the v2 space so losses
and fusion need no second set of tables. The v1 normalization formula
(input_subset_bboxes.py:71-83) is identical to v2's, so rasterization code
is shared.

The reference's serial ``tf.py_func`` rasterizer is replaced by the
vectorized corner-delta rasterizer in ops/rasterize.py (numpy here on host;
the identical jnp kernel can run on device). ``MAX_N_BBOXES`` padding
(reference :33) is unnecessary off-graph but kept as a sanity bound.
"""

from __future__ import annotations

import io
import json
import os
import pickle
from typing import Iterator, Optional

import numpy as np
from PIL import Image

from iv2019_tpu import native
from iv2019_tpu.config import Settings
from iv2019_tpu.input import core
from iv2019_tpu.ops.rasterize import (
    image_label_multinomial_np,
    rasterize_bboxes_np,
)
from iv2019_tpu.problem.taxonomy import (
    NUM_WEAK_CLASSES,
    OPEN_IMAGES_MID2CID,
    OPEN_IMAGES_MID2CID_V1,
    V1_CID2V2_CID,
)

__all__ = [
    "bbox_train_input",
    "image_labels_train_input",
    "synthetic_weak_batches",
    "mid2cid_for",
    "MAX_N_BBOXES",
]

MAX_N_BBOXES = 516  # reference input_subset_bboxes_v2.py:33


def mid2cid_for(settings: Settings) -> dict:
    """MID -> v2 weak cid under the selected --openimages_label_space.

    "v2" is the 15-class map (input_subset_bboxes_v2.py:38-53). "v1"
    reproduces the legacy aggregation (input_subset_bboxes.py:37-52: human
    MIDs merged, signs merged) by composing its 10-class cids with the
    V1_CID2V2_CID injection, so the downstream 15-class tables apply
    unchanged while the *label semantics* are exactly v1's.
    """
    if settings.openimages_label_space == "v1":
        return {
            mid: int(V1_CID2V2_CID[cid])
            for mid, cid in OPEN_IMAGES_MID2CID_V1.items()
        }
    return OPEN_IMAGES_MID2CID


def _load_mapping(path: str) -> dict:
    if path.endswith(".json"):
        with open(path) as f:
            return json.load(f)
    with open(path, "rb") as f:
        return pickle.load(f)


def _read_image(image_dir: str, imageid: str) -> np.ndarray:
    path = os.path.join(image_dir, imageid + ".jpg")
    with open(path, "rb") as f:
        buf = f.read()
    # GIL-free libjpeg decode with RGB coercion (PIL-parity-tested); PIL
    # fallback covers exotic color spaces (CMYK) and missing codec libs
    arr = native.decode_image(buf, force_rgb=True)
    if arr is not None:
        return arr
    img = Image.open(io.BytesIO(buf))
    if img.mode != "RGB":
        img = img.convert("RGB")
    return np.asarray(img)


def transform_boxes_for_crop(
    coords: np.ndarray, in_hw, target_hw, crop_offset=(0, 0), resized_hw=None
) -> np.ndarray:
    """Map normalized (xmin, xmax, ymin, ymax) boxes through an
    aspect-preserving resize + crop to the crop's normalized coordinates."""
    th, tw = target_hw
    if resized_hw is None:
        resized_hw = (th, tw)
    rh, rw = resized_hw
    oy, ox = crop_offset
    out = np.empty_like(coords)
    out[:, 0] = (coords[:, 0] * rw - ox) / tw
    out[:, 1] = (coords[:, 1] * rw - ox) / tw
    out[:, 2] = (coords[:, 2] * rh - oy) / th
    out[:, 3] = (coords[:, 3] * rh - oy) / th
    return np.clip(out, 0.0, 1.0)


def bbox_train_input(
    settings: Settings, seed: Optional[int] = None
) -> Iterator[dict]:
    """Yields batched {'proimages' (Nb,hf,wf,3) in [-1,1), 'prolabels'
    (Nb,hf,wf,15) f32, 'imageids'} dicts.

    With ``settings.rasterize_on_device`` the dense labels are replaced by
    padded {'bbox_cids' (Nb, MAX_N) int32, 'bbox_coords' (Nb, MAX_N, 4) f32}
    in crop coordinates; the train step rasterizes on device
    (ops/rasterize.rasterize_bboxes) — the TPU-native answer to the
    reference's host py_func bottleneck (input_subset_bboxes_v2.py:3-4).
    """
    if seed is None:
        seed = settings.input_seed  # --input_seed: reproducible pipelines
    if settings.synthetic_data:
        yield from synthetic_weak_batches(settings, kind="bbox", seed=seed or 0)
        return

    imageid2bboxes = _load_mapping(settings.openimages_bboxes_path)
    image_dir = settings.openimages_image_dir
    mid2cid = mid2cid_for(settings)
    hw = (settings.height_feature_extractor, settings.width_feature_extractor)
    # per-item rng: deterministic under --input_seed and race-free across
    # the decode pool (a shared RandomState would depend on scheduling)
    make_rng = core.per_item_rng_factory(seed)
    on_device = settings.rasterize_on_device

    def _pre(indexed) -> dict:
        index, (imageid, bboxes) = indexed
        rng = make_rng(index)
        image = core.convert_image_dtype(_read_image(image_dir, imageid))
        h, w = image.shape[:2]
        cids = np.asarray(
            [mid2cid.get(mid, -1) for mid, _ in bboxes], np.int32
        )
        coords = np.asarray([c for _, c in bboxes], np.float32).reshape(-1, 4)
        if on_device:
            if settings.preserve_aspect_ratio:
                rh, rw = core.aspect_preserving_size((h, w), hw, "max")
            else:
                rh, rw = hw
            oy = rng.randint(0, rh - hw[0] + 1) if rh > hw[0] else 0
            ox = rng.randint(0, rw - hw[1] + 1) if rw > hw[1] else 0
            proimage = core.resize_bilinear_fast(image, (rh, rw))[
                oy : oy + hw[0], ox : ox + hw[1]
            ]
            n = min(len(cids), MAX_N_BBOXES)
            pad_cids = np.full((MAX_N_BBOXES,), -1, np.int32)
            pad_coords = np.zeros((MAX_N_BBOXES, 4), np.float32)
            pad_cids[:n] = cids[:n]
            pad_coords[:n] = transform_boxes_for_crop(
                coords[:n], (h, w), hw, (oy, ox), (rh, rw)
            )
            return {
                "proimages": proimage,
                "bbox_cids": pad_cids,
                "bbox_coords": pad_coords,
                "imageids": imageid,
            }
        rla = rasterize_bboxes_np(cids, coords, h, w)
        proimage, prolabel = core.resize_images_and_labels(
            image, rla, hw, settings.preserve_aspect_ratio, rng
        )
        return {"proimages": proimage, "prolabels": prolabel, "imageids": imageid}

    from iv2019_tpu.parallel.multihost import shard_records

    items = core.shuffle_repeat(
        lambda: shard_records(imageid2bboxes.items()), seed=seed
    )
    mapped = core.parallel_map(_pre, enumerate(items))
    for batch in core.batched(mapped, settings.Nb):
        batch["proimages"] = core.from_0_1_to_m1_1(batch["proimages"])
        yield batch


def image_labels_train_input(
    settings: Settings, seed: Optional[int] = None
) -> Iterator[dict]:
    """Image-level labels pipeline; same contract as bbox_train_input."""
    if seed is None:
        seed = settings.input_seed  # --input_seed: reproducible pipelines
    if settings.synthetic_data:
        yield from synthetic_weak_batches(settings, kind="image", seed=seed or 0)
        return

    imageid2mids = _load_mapping(settings.openimages_image_labels_path)
    image_dir = settings.openimages_image_dir
    mid2cid = mid2cid_for(settings)
    hw = (settings.height_feature_extractor, settings.width_feature_extractor)
    # per-item rng: deterministic under --input_seed and race-free across
    # the decode pool (a shared RandomState would depend on scheduling)
    make_rng = core.per_item_rng_factory(seed)
    compact = settings.compact_image_labels

    def _pre(indexed) -> dict:
        index, (imageid, mids) = indexed
        rng = make_rng(index)
        image = core.convert_image_dtype(_read_image(image_dir, imageid))
        cids = [mid2cid.get(mid, -1) for mid in mids]
        vec = image_label_multinomial_np([c for c in cids if c >= 0])
        if compact:
            # the multinomial is constant across the image, so resize/crop
            # leaves it unchanged — ship the (15,) vector, tile on device
            # (train/step.py), saving the dense (H, W, 15) h2d transfer;
            # the shared helper does aspect+crop with the native kernel
            proimage, _ = core.resize_images_and_labels(
                image, None, hw, settings.preserve_aspect_ratio, rng
            )
            return {
                "proimages": proimage,
                "image_label_vecs": vec.astype(np.float32),
                "imageids": imageid,
            }
        rla = np.broadcast_to(vec, (*image.shape[:2], NUM_WEAK_CLASSES))
        proimage, prolabel = core.resize_images_and_labels(
            image, np.ascontiguousarray(rla), hw, settings.preserve_aspect_ratio, rng
        )
        return {"proimages": proimage, "prolabels": prolabel, "imageids": imageid}

    from iv2019_tpu.parallel.multihost import shard_records

    items = core.shuffle_repeat(
        lambda: shard_records(imageid2mids.items()), seed=seed
    )
    mapped = core.parallel_map(_pre, enumerate(items))
    for batch in core.batched(mapped, settings.Nb):
        batch["proimages"] = core.from_0_1_to_m1_1(batch["proimages"])
        yield batch


def synthetic_weak_batches(
    settings: Settings, kind: str = "bbox", seed: int = 0
) -> Iterator[dict]:
    """Random weak-label batches with real shapes; bbox kind rasterizes a few
    random boxes so the label statistics resemble data."""
    rng = np.random.RandomState(seed)
    h, w = settings.height_feature_extractor, settings.width_feature_extractor
    n = settings.Nb
    while True:
        images = rng.uniform(-1, 1, (n, h, w, 3)).astype(np.float32)
        labels = np.empty((n, h, w, NUM_WEAK_CLASSES), np.float32)
        for i in range(n):
            if kind == "bbox":
                k = rng.randint(1, 8)
                cids = rng.randint(0, NUM_WEAK_CLASSES - 1, size=k).astype(np.int32)
                x = np.sort(rng.rand(k, 2), axis=1)
                y = np.sort(rng.rand(k, 2), axis=1)
                boxes = np.stack([x[:, 0], x[:, 1], y[:, 0], y[:, 1]], 1).astype(
                    np.float32
                )
                labels[i] = rasterize_bboxes_np(cids, boxes, h, w)
            else:
                k = rng.randint(0, 4)
                vec = image_label_multinomial_np(
                    rng.randint(0, NUM_WEAK_CLASSES - 1, size=k)
                )
                labels[i] = vec
        yield {
            "proimages": images,
            "prolabels": labels,
            "imageids": [f"synthetic_{kind}"] * n,
        }
