"""Cityscapes / Vistas per-pixel input pipelines (TFRecord KEYS2FEATURES_v5).

Parity with reference input_cityscapes.py / input_vistas.py:

- train: TFRecord -> decode PNG/JPEG image + PNG label -> lids2cids gather
  (voids replaced) -> resize (optionally aspect-preserving + shared random
  crop) to (hf, wf) -> shuffle(2000) + repeat -> batch -> [-1, 1) scaling
- evaluate: plain decode -> eval lids2cids -> plain resize -> batch

Vistas differences are data-level only (JPEG images, variable sizes); both
datasets run through the same code with the format auto-detected by PIL.

A ``synthetic`` mode generates random batches with the exact shapes/dtypes
of the real pipeline for benchmarking without datasets on disk.
"""

from __future__ import annotations

import io
from typing import Iterator, Optional

import numpy as np
from PIL import Image

from iv2019_tpu import native
from iv2019_tpu.config import Settings
from iv2019_tpu.input import core
from iv2019_tpu.input.tfrecord import parse_example, read_tfrecords
from iv2019_tpu.problem.problem_def import ProblemDef

__all__ = ["train_input", "evaluate_input", "synthetic_train_batches"]


def _decode(buf: bytes) -> np.ndarray:
    # native libpng/libjpeg decode is GIL-free (PIL-parity-tested,
    # tests/test_native.py); PIL remains the fallback + oracle
    arr = native.decode_image(buf)
    if arr is not None:
        return arr
    return np.asarray(Image.open(io.BytesIO(buf)))


def _parse_record(record: bytes):
    ex = parse_example(record)
    image = _decode(ex["image/encoded"][0])
    label = _decode(ex["label/encoded"][0])
    if label.ndim == 3:
        label = label[..., 0]
    im_path = ex.get("image/path", [b""])[0].decode("utf-8", "replace")
    la_path = ex.get("label/path", [b""])[0].decode("utf-8", "replace")
    return image, label, im_path, la_path


def train_input(
    settings: Settings,
    problem_def: ProblemDef,
    tfrecords_path: Optional[str] = None,
    seed: Optional[int] = None,
) -> Iterator[dict]:
    """Yields batched {'proimages', 'prolabels', 'rawimagespaths',
    'rawlabelspaths'} dicts; proimages f32 (Nb, hf, wf, 3) in [-1, 1),
    prolabels int32 (Nb, hf, wf)."""
    if seed is None:
        seed = settings.input_seed  # --input_seed: reproducible pipelines
    if settings.synthetic_data:
        yield from synthetic_train_batches(settings, problem_def, seed or 0)
        return

    path = tfrecords_path or settings.tfrecords_path or settings.tfrecords_path_per_pixel
    lut = problem_def.lids2cids_voids_replaced()
    hw = (settings.height_feature_extractor, settings.width_feature_extractor)
    # per-item rng: deterministic under --input_seed and race-free across
    # the decode pool (a shared RandomState would depend on scheduling)
    make_rng = core.per_item_rng_factory(seed)

    def _prebatch(indexed: tuple) -> dict:
        index, record = indexed
        image, label, im_path, la_path = _parse_record(record)
        image = core.convert_image_dtype(image)
        label = core.map_lids_to_cids(label, lut)
        proimage, prolabel = core.resize_images_and_labels(
            image, label, hw, settings.preserve_aspect_ratio, make_rng(index)
        )
        return {
            "proimages": proimage,
            "prolabels": prolabel,
            "rawimagespaths": im_path,
            "rawlabelspaths": la_path,
        }

    # multi-host: each process keeps a disjoint stride of the record stream
    from iv2019_tpu.parallel.multihost import shard_records

    records = core.shuffle_repeat(
        lambda: shard_records(read_tfrecords(path)), seed=seed
    )
    mapped = core.parallel_map(_prebatch, enumerate(records))
    for batch in core.batched(mapped, settings.Nb):
        batch["proimages"] = core.from_0_1_to_m1_1(batch["proimages"])
        yield batch


def evaluate_input(
    settings: Settings,
    problem_def: ProblemDef,
    tfrecords_path: Optional[str] = None,
) -> Iterator[dict]:
    """One epoch of eval batches: plain resize, eval label space
    (reference input_cityscapes.py:190-246)."""
    if settings.synthetic_data:
        yield from synthetic_eval_batches(settings, problem_def)
        return

    path = tfrecords_path or settings.tfrecords_path
    lut = problem_def.lids2cids_voids_replaced()
    # --eval_size evaluates at native/custom resolution (beyond reference);
    # default matches the reference's resize-to-(hf, wf) eval pipeline
    hw = settings.eval_size or (
        settings.height_feature_extractor, settings.width_feature_extractor
    )

    def _pre(record: bytes) -> dict:
        image, label, im_path, la_path = _parse_record(record)
        image = core.convert_image_dtype(image)
        label = core.map_lids_to_cids(label, lut)
        # labels are NN-resized to the feature-extractor size, like the
        # reference's eval pipeline (input_cityscapes.py:201-203) — the
        # confusion matrix is computed at (hf, wf)
        proimage, prolabel = core.resize_images_and_labels(image, label, hw)
        return {
            "proimages": core.from_0_1_to_m1_1(proimage),
            "prolabels": prolabel,
            "rawimagespaths": im_path,
            "rawlabelspaths": la_path,
        }

    mapped = core.parallel_map(_pre, read_tfrecords(path))
    yield from core.batched(mapped, settings.Nb)


# --- synthetic ----------------------------------------------------------


def synthetic_train_batches(
    settings: Settings, problem_def: ProblemDef, seed: int = 0
) -> Iterator[dict]:
    rng = np.random.RandomState(seed)
    h, w = settings.height_feature_extractor, settings.width_feature_extractor
    n = settings.Nb
    nc = problem_def.output_num_classes(settings.train_void_class)
    while True:
        yield {
            "proimages": rng.uniform(-1, 1, (n, h, w, 3)).astype(np.float32),
            "prolabels": rng.randint(0, nc, (n, h, w)).astype(np.int32),
            "rawimagespaths": ["synthetic"] * n,
            "rawlabelspaths": ["synthetic"] * n,
        }


def synthetic_eval_batches(
    settings: Settings, problem_def: ProblemDef, seed: int = 0, num_batches: int = 8
) -> Iterator[dict]:
    rng = np.random.RandomState(seed)
    h, w = settings.eval_size or (
        settings.height_feature_extractor, settings.width_feature_extractor
    )
    n = settings.Nb
    nc = problem_def.output_num_classes(settings.train_void_class)
    for _ in range(num_batches):
        yield {
            "proimages": rng.uniform(-1, 1, (n, h, w, 3)).astype(np.float32),
            "prolabels": rng.randint(0, nc, (n, h, w)).astype(np.int32),
            "rawimagespaths": ["synthetic"] * n,
            "rawlabelspaths": ["synthetic"] * n,
        }
