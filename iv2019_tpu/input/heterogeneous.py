"""Heterogeneous-supervision batch combiner.

Zips the per-pixel, per-bbox and per-image pipelines into one training
element per step (reference per_pixel_per_bbox_per_image.py:20-87). The
reference concatenates images host-side into a [pp | pb | pi] batch; here
the three image sub-batches stay *separate* arrays so each can be sharded
evenly on its own leading axis across the device mesh — the concatenation
happens inside the jitted train step, which preserves the reference's
per-tower layout contract (define_losses_hierarchical.py:8-12) on every
device while letting XLA own the data movement.

Also provides the 2-way (per_pixel + per_bbox) variant
(reference per_pixel_per_bbox.py) via Nb_per_image = 0.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np

from iv2019_tpu.config import Settings
from iv2019_tpu.input.cityscapes import train_input as per_pixel_train_input
from iv2019_tpu.input.openimages import (
    bbox_train_input,
    image_labels_train_input,
)
from iv2019_tpu.problem.problem_def import ProblemDef
from iv2019_tpu.problem.taxonomy import NUM_WEAK_CLASSES

__all__ = ["train_input"]


def _empty_weak(settings: Settings) -> dict:
    h, w = settings.height_feature_extractor, settings.width_feature_extractor
    return {
        "proimages": np.zeros((0, h, w, 3), np.float32),
        "prolabels": np.zeros((0, h, w, NUM_WEAK_CLASSES), np.float32),
        "imageids": [],
    }


def train_input(
    settings: Settings, problem_def: ProblemDef, seed: Optional[int] = None
) -> Iterator[dict]:
    """Yields combined train batches:

    {'proimages_per_pixel', 'proimages_per_bbox', 'proimages_per_image',
     'prolabels_per_pixel', 'prolabels_per_bbox', 'prolabels_per_image',
     'imageids_per_bbox', 'imageids_per_image', 'rawimagespaths',
     'rawlabelspaths'}

    Sub-batch sizes follow Nb_per_pixel / Nb_per_bbox / Nb_per_image with the
    per-type aspect policies of the reference (train.py:62-68).

    Multi-host: Nb_per_* are GLOBAL batch sizes; this process's pipelines
    produce ``Nb_x / process_count`` examples each from a disjoint record
    stride (parallel/multihost.py), and the prefetcher assembles the global
    sharded arrays.
    """
    from iv2019_tpu.parallel import multihost

    if seed is None:
        seed = settings.input_seed  # --input_seed: reproducible pipelines
    pc = multihost.process_count()
    if pc > 1:
        settings = settings.replace(
            Nb_per_pixel=multihost.local_share(settings.Nb_per_pixel),
            Nb_per_bbox=multihost.local_share(settings.Nb_per_bbox),
            Nb_per_image=multihost.local_share(settings.Nb_per_image),
        )
        # decorrelate shuffle order / random crops across hosts
        if seed is not None:
            seed = seed + 7919 * multihost.process_index()
    s_pp = settings.replace(
        Nb=settings.Nb_per_pixel,
        preserve_aspect_ratio=settings.preserve_aspect_ratio_per_pixel,
    )
    pp_iter = per_pixel_train_input(s_pp, problem_def, seed=seed)

    pb_iter = pi_iter = None
    if settings.Nb_per_bbox > 0:
        s_pb = settings.replace(
            Nb=settings.Nb_per_bbox,
            preserve_aspect_ratio=settings.preserve_aspect_ratio_per_bbox,
        )
        pb_iter = bbox_train_input(s_pb, seed=None if seed is None else seed + 1)
    if settings.Nb_per_image > 0:
        s_pi = settings.replace(
            Nb=settings.Nb_per_image,
            preserve_aspect_ratio=settings.preserve_aspect_ratio_per_image,
        )
        pi_iter = image_labels_train_input(s_pi, seed=None if seed is None else seed + 2)

    empty = _empty_weak(settings)
    while True:
        pp = next(pp_iter)
        pb = next(pb_iter) if pb_iter is not None else empty
        pi = next(pi_iter) if pi_iter is not None else empty
        batch = {
            "proimages_per_pixel": pp["proimages"],
            "proimages_per_bbox": pb["proimages"],
            "proimages_per_image": pi["proimages"],
            "prolabels_per_pixel": pp["prolabels"],
            "imageids_per_bbox": pb["imageids"],
            "imageids_per_image": pi["imageids"],
            "rawimagespaths": pp.get("rawimagespaths", []),
            "rawlabelspaths": pp.get("rawlabelspaths", []),
        }
        if "bbox_cids" in pb:
            # device-side rasterization path: padded box tensors instead of
            # dense per-pixel multinomials
            batch["bbox_cids"] = pb["bbox_cids"]
            batch["bbox_coords"] = pb["bbox_coords"]
        else:
            batch["prolabels_per_bbox"] = pb["prolabels"]
        if "image_label_vecs" in pi:
            # compact per-image labels: (Nb, 15) vectors tiled on device
            batch["image_label_vecs"] = pi["image_label_vecs"]
        else:
            batch["prolabels_per_image"] = pi["prolabels"]
        yield batch
