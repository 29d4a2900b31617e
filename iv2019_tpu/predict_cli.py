"""Prediction entry point (reference code/predict.py parity).

Usage:
  python -m iv2019_tpu.predict_cli LOG_DIR PROBLEM_DEF PREDICT_DIR [flags]

Iterates the system's predict generator, times each image ("input pipeline +
network", reference predict.py:92), optionally plots live (matplotlib), and
exports label-id / color / overlapped PNGs (reference predict.py:88-169).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
from PIL import Image

from iv2019_tpu.config import PREDICT, build_argparser, settings_from_args
from iv2019_tpu.input.dataset_agnostic import predict_input
from iv2019_tpu.system import SemanticSegmentation

PREDICT_KEYS = (
    "decisions",
    "l1_probabilities",
    "l2_vehicle_probabilities",
    "rawimages",
    "rawimagespaths",
)


def _export(item, out_dir: str, palette: np.ndarray, cids2lids: np.ndarray,
            export_lids: bool, export_color: bool) -> None:
    path = item.get("rawimagespaths", "image")
    stem = os.path.splitext(os.path.basename(str(path)))[0]
    decisions = np.asarray(item["decisions"], np.int32)
    if export_lids and cids2lids.size:
        lids = cids2lids[np.clip(decisions, 0, len(cids2lids) - 1)]
        Image.fromarray(lids.astype(np.uint8)).save(
            os.path.join(out_dir, f"{stem}_lids.png")
        )
    if export_color:
        color = palette[np.clip(decisions, 0, len(palette) - 1)]
        Image.fromarray(color).save(os.path.join(out_dir, f"{stem}_color.png"))
        raw = item.get("rawimages")
        if raw is not None and raw.shape[:2] == color.shape[:2]:
            overlapped = (0.5 * raw + 0.5 * color).astype(np.uint8)
            Image.fromarray(overlapped).save(
                os.path.join(out_dir, f"{stem}_overlapped.png")
            )


def main(argv):
    args = build_argparser(PREDICT).parse_args(argv)
    settings = settings_from_args(args, PREDICT, predict_keys=PREDICT_KEYS)

    def _predict_fn(s, _problem_def):
        return predict_input(s)

    system = SemanticSegmentation({"predict": _predict_fn}, settings=settings)
    pd = system.inference_problem_def
    palette = pd.palette()
    cids2lids = np.asarray(pd.cids2lids, np.int64)

    results_dir = settings.results_dir or os.path.join(
        settings.log_dir, "predictions"
    )
    os.makedirs(results_dir, exist_ok=True)

    plot = None
    if settings.plotting:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plot = plt

    n = 0
    t0 = time.time()
    for item in system.predict():
        t1 = time.time()
        print(f"{n}: input pipeline + network: {t1 - t0:.3f}s "
              f"({item.get('rawimagespaths', '')})")
        _export(
            item, results_dir, palette, cids2lids,
            settings.export_lids_images, settings.export_color_decisions or True,
        )
        if plot is not None:
            color = palette[np.clip(item["decisions"], 0, len(palette) - 1)]
            plot.imsave(os.path.join(results_dir, f"plot_{n:05}.png"), color)
        n += 1
        t0 = time.time()
    print(f"predicted {n} images -> {results_dir}")
    return n


if __name__ == "__main__":
    main(sys.argv[1:])
