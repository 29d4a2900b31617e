"""Dataset-agnostic predict input: recursive media glob -> device-ready batches.

Parity with reference dataset_agnostic_predict_input.py:93-154: recursive
glob over png/jpg/jpeg/ppm, PIL open with RGB-mode coercion, resize
(optionally aspect-preserving 'max' + center behavior of the reference's
plain resize) to (hf, wf), [-1, 1) scaling, batch (forced to 1 when images
have different raw sizes).
"""

from __future__ import annotations

import glob
import os
from typing import Iterator

import numpy as np
from PIL import Image

from iv2019_tpu import native
from iv2019_tpu.config import Settings
from iv2019_tpu.input import core

__all__ = ["predict_input", "SUPPORTED_EXTENSIONS"]

SUPPORTED_EXTENSIONS = ("png", "PNG", "jpg", "JPG", "jpeg", "JPEG", "ppm", "PPM")


def _find_images(predict_dir: str) -> list[str]:
    fnames: list[str] = []
    for ext in SUPPORTED_EXTENSIONS:
        fnames.extend(
            glob.glob(os.path.join(predict_dir, "**", f"*.{ext}"), recursive=True)
        )
    return sorted(set(fnames))


def predict_input(settings: Settings) -> Iterator[dict]:
    """Yields {'proimages' (1,hf,wf,3), 'rawimages', 'rawimagespaths'}.

    Batch size is forced to 1 (arbitrary raw sizes; reference
    dataset_agnostic_predict_input.py:138-142).
    """
    # --eval_size runs inference at native/custom resolution (beyond
    # reference); default matches the reference's resize-to-(hf, wf)
    hw = settings.eval_size or (
        settings.height_feature_extractor, settings.width_feature_extractor
    )

    def _load(path: str) -> dict:
        with open(path, "rb") as f:
            buf = f.read()
        # GIL-free native decode with RGB coercion where supported
        # (png/jpeg); PIL fallback handles ppm and exotic modes
        raw = native.decode_image(buf, force_rgb=True)
        if raw is None:
            import io as _io

            img = Image.open(_io.BytesIO(buf))
            if img.mode != "RGB":
                img = img.convert("RGB")
            raw = np.asarray(img)
        image = core.convert_image_dtype(raw)
        pro, _ = core.resize_images_and_labels(
            image, None, hw, preserve_aspect_ratio=settings.preserve_aspect_ratio
        )
        return {
            "proimages": core.from_0_1_to_m1_1(pro)[None],
            "rawimages": raw,
            "rawimagespaths": path,
        }

    paths = _find_images(settings.predict_dir)
    yield from core.parallel_map(_load, iter(paths))
