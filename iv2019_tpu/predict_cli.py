"""Prediction entry point (reference code/predict.py parity).

Usage:
  python -m iv2019_tpu.predict_cli LOG_DIR PROBLEM_DEF PREDICT_DIR [flags]

Iterates the system's predict generator, times each image ("input pipeline +
network", reference predict.py:92), and produces the reference's artifact
kinds (predict.py:88-169):

- ``--export_lids_images``: label-id PNGs via cids2lids
- ``--export_color_decisions``: palette-colorized decision PNGs
- ``--export_overlapped_color_decisions``: 0.5-alpha blend of raw + color
- ``--plotting [--plot_l1_confidence --plot_l2_confidence]``: the plain
  plotting mode — raw | colorized decisions | optional confidence panel
  (max over classes of p^50, the reference's contrast stretch, rendered
  with the nipy_spectral colormap)
- ``--plotting_overlapped``: the overlapped plotting mode

This environment is headless, so "live" matplotlib windows become PNG
frames under results_dir (Agg backend); the figures match the reference's
panel layout. With no flags at all, color decisions are exported so the
tool always produces something useful.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
from PIL import Image

from iv2019_tpu.config import (
    PREDICT,
    build_argparser,
    resolve_dataset_name,
    resolve_trained_model,
    settings_from_args,
)
from iv2019_tpu.input.dataset_agnostic import predict_input
from iv2019_tpu.system import SemanticSegmentation

PREDICT_KEYS = (
    "decisions",
    "l1_probabilities",
    "l2_vehicle_probabilities",
    "rawimages",
    "rawimagespaths",
)


def _confidence_panel(item) -> np.ndarray:
    """Reference predict.py:113-118: [max_c l1_p^50 | max_c l2v_p^50]."""
    panels = []
    for key in ("l1_probabilities", "l2_vehicle_probabilities"):
        p = np.asarray(item[key], np.float32)
        panels.append(np.amax(np.power(p, 50), axis=2))
    return np.concatenate(panels, axis=1)


def _overlapped(item, palette) -> np.ndarray:
    color = palette[np.clip(item["decisions"], 0, len(palette) - 1)]
    raw = np.asarray(item["rawimages"])
    alpha = 0.5
    return (alpha * raw + (1 - alpha) * color).astype(np.uint8)


def _export(item, out_dir, palette, cids2lids, settings, default_color) -> None:
    path = item.get("rawimagespaths", "image")
    stem = os.path.splitext(os.path.basename(str(path)))[0]
    decisions = np.asarray(item["decisions"], np.int32)
    if settings.export_lids_images and cids2lids.size:
        lids = cids2lids[np.clip(decisions, 0, len(cids2lids) - 1)]
        Image.fromarray(lids.astype(np.uint8)).save(
            os.path.join(out_dir, f"{stem}_result_lids.png")
        )
    if settings.export_color_decisions or default_color:
        color = palette[np.clip(decisions, 0, len(palette) - 1)]
        Image.fromarray(color).save(
            os.path.join(out_dir, f"{stem}_result_color.png")
        )
    if settings.export_overlapped_color_decisions and "rawimages" in item:
        Image.fromarray(_overlapped(item, palette)).save(
            os.path.join(out_dir, f"{stem}_result_overlapped_color.png")
        )


def _plot_frame(item, out_dir, palette, settings, n, plt) -> None:
    """One frame of the live-plotting modes, written as a PNG."""
    if settings.plotting_overlapped:
        plt.imsave(
            os.path.join(out_dir, f"plot_overlapped_{n:05}.png"),
            _overlapped(item, palette),
        )
        return
    with_conf = settings.plot_l1_confidence or settings.plot_l2_confidence
    ncols = 3 if with_conf else 2
    fig, axs = plt.subplots(1, ncols, figsize=(5 * ncols, 4))
    axs[0].imshow(np.asarray(item["rawimages"]))
    axs[0].set_title("input")
    axs[1].imshow(palette[np.clip(item["decisions"], 0, len(palette) - 1)])
    axs[1].set_title("decisions")
    if with_conf:
        conf = axs[2].imshow(_confidence_panel(item), cmap="nipy_spectral")
        axs[2].set_title("confidence (p^50)")
        fig.colorbar(conf, ax=axs[2], ticks=[])
    for ax in axs:
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, f"plot_{n:05}.png"))
    plt.close(fig)


def main(argv):
    from iv2019_tpu.utils.platform import (
        enable_compilation_cache,
        honor_platform_env,
    )

    honor_platform_env()
    enable_compilation_cache()
    args = build_argparser(PREDICT).parse_args(argv)
    settings = settings_from_args(args, PREDICT, predict_keys=PREDICT_KEYS)
    settings = resolve_dataset_name(settings, args.per_pixel_dataset_name)
    settings = resolve_trained_model(settings, argv)

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

    any_flag = (
        settings.plotting or settings.plotting_overlapped
        or settings.export_lids_images or settings.export_color_decisions
        or settings.export_overlapped_color_decisions
    )
    default_color = not any_flag

    plt = None
    if settings.plotting or settings.plotting_overlapped:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt  # noqa: PLC0415

    n = 0
    total = 0.0
    t0 = time.time()
    for item in system.predict():
        dt = time.time() - t0
        total += dt
        sys.stdout.write(f"Time per image (input pipeline + network): {dt:.3f}s\r")
        sys.stdout.flush()
        _export(item, results_dir, palette, cids2lids, settings, default_color)
        if plt is not None:
            _plot_frame(item, results_dir, palette, settings, n, plt)
        n += 1
        t0 = time.time()
    print(f"\nTotal time (input pipeline + network): {total:.3f}s; "
          f"predicted {n} images -> {results_dir}")
    return n


if __name__ == "__main__":
    main(sys.argv[1:])
