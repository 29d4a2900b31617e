"""Real-data-format ingestion: procedural dataset -> train_cli -> evaluate_cli.

Complements test_cli_smoke (which uses --synthetic_data, bypassing the
readers): this generates an actual on-disk dataset — Cityscapes-layout
labelIds PNGs packed into v5 TFRecords, OpenImages-style bbox/image-label
pickles + JPEGs — and drives the real CLIs over it on CPU. Pins the full
ingestion path: TFRecord proto parsing, PNG/JPEG decode, lids2cids mapping,
bbox rasterization from pickle coords, weak-label vector construction.
"""

import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-second tier; see pytest.ini

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PROBLEM = os.path.join(
    REPO, "iv2019_tpu", "problem_definitions", "cityscapes", "problem01.json"
)
ENV = dict(
    os.environ,
    JAX_PLATFORMS="cpu",
    JAX_PLATFORM_NAME="cpu",  # the axon plugin ignores JAX_PLATFORMS
    PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
)
SIZE = ["--height_feature_extractor", "64", "--width_feature_extractor", "128"]


def _run(module, args, timeout=1500):
    proc = subprocess.run(
        [sys.executable, "-m", module, *args],
        capture_output=True, text=True, env=ENV, cwd=REPO, timeout=timeout,
    )
    assert proc.returncode == 0, (
        f"{module} failed\nSTDOUT:\n{proc.stdout[-4000:]}\n"
        f"STDERR:\n{proc.stderr[-4000:]}"
    )
    return proc


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from synthetic_scenes import generate

    out = str(tmp_path_factory.mktemp("scenes"))
    paths = generate(out, n_train=6, n_val=4, n_weak=6, h=64, w=128)
    return paths


def test_generator_formats(dataset):
    from iv2019_tpu.input.tfrecord import parse_example, read_tfrecords

    records = list(read_tfrecords(dataset["tfrecords_train"]))
    n = len(records)
    parsed = parse_example(records[0])
    assert any("image" in k for k in parsed)
    assert n == 6
    with open(dataset["openimages_bboxes_path"], "rb") as f:
        bboxes = pickle.load(f)
    for _, boxes in bboxes.items():
        for mid, (x0, x1, y0, y1) in boxes:
            assert mid.startswith("/m/")
            assert 0.0 <= x0 < x1 <= 1.0 and 0.0 <= y0 < y1 <= 1.0


def test_train_and_evaluate_on_disk_dataset(dataset, tmp_path_factory):
    log_dir = str(tmp_path_factory.mktemp("scenes_run") / "log")
    _run("iv2019_tpu.train_cli", [
        log_dir, "cityscapes",
        "--tfrecords_path_per_pixel", dataset["tfrecords_train"],
        "--openimages_image_dir", dataset["openimages_image_dir"],
        "--openimages_bboxes_path", dataset["openimages_bboxes_path"],
        "--openimages_image_labels_path", dataset["openimages_image_labels_path"],
        *SIZE,
        "--Ntrain", "2", "--Ne", "1",
        "--Nb_per_pixel", "1", "--Nb_per_bbox", "1", "--Nb_per_image", "1",
        "--learning_rate_boundaries", "1", "--learning_rate_values", "0.01",
        "--save_checkpoints_steps", "1",
    ])
    assert os.path.exists(os.path.join(log_dir, "train_metrics.jsonl"))
    _run("iv2019_tpu.evaluate_cli", [
        log_dir, "4", PROBLEM,
        "--tfrecords_path", dataset["tfrecords_val"],
        *SIZE, "--Nb", "1",
    ])
    eval_dirs = [d for d in os.listdir(log_dir) if d.startswith("eval_")]
    assert eval_dirs
    with open(
        os.path.join(log_dir, sorted(eval_dirs)[-1], "all_metrics.p"), "rb"
    ) as f:
        metrics = pickle.load(f)
    assert np.isfinite(metrics[0]["mean_iou"])
