"""Input-pipeline tests: transforms, batching, combiner, TFRecord path."""

import io

import numpy as np
import pytest
from PIL import Image

from iv2019_tpu.input import core
from iv2019_tpu.input.cityscapes import evaluate_input, train_input
from iv2019_tpu.input.heterogeneous import train_input as hetero_train_input
from iv2019_tpu.problem.problem_def import load_problem_def
from iv2019_tpu.problem.taxonomy import NUM_WEAK_CLASSES

from helpers import tiny_settings

import os

_PKG = os.path.join(os.path.dirname(__file__), "..", "iv2019_tpu")
CITYSCAPES_JSON = os.path.join(_PKG, "problem_definitions", "cityscapes", "problem01.json")


class TestCoreTransforms:
    def test_convert_image_dtype(self):
        img = np.array([[0, 128, 255]], np.uint8)
        out = core.convert_image_dtype(img)
        np.testing.assert_allclose(out, [[0.0, 128 / 255, 1.0]], rtol=1e-6)

    def test_from_0_1_to_m1_1(self):
        np.testing.assert_allclose(
            core.from_0_1_to_m1_1(np.array([0.0, 0.5, 1.0])), [-1.0, 0.0, 1.0]
        )

    def test_aspect_preserving_size_max_mode(self):
        # reference 'max' mode: tightest size covering the target, with ceil
        assert core.aspect_preserving_size((100, 200), (50, 50)) == (50, 100)
        assert core.aspect_preserving_size((100, 200), (50, 150)) == (75, 150)
        assert core.aspect_preserving_size((30, 40), (60, 60)) == (60, 80)

    def test_resize_images_and_labels_plain(self):
        img = np.random.RandomState(0).rand(10, 20, 3).astype(np.float32)
        lbl = np.random.RandomState(1).randint(0, 5, (10, 20)).astype(np.int32)
        pi, pl = core.resize_images_and_labels(img, lbl, (8, 16))
        assert pi.shape == (8, 16, 3) and pl.shape == (8, 16)

    def test_resize_images_and_labels_aspect_crop_shared_offset(self):
        # image with x-gradient; label equals column index -> after shared
        # crop, equal crops must stay consistent
        w_in, h_in = 32, 16
        img = np.tile(np.arange(w_in, dtype=np.float32) / w_in, (h_in, 1))[..., None]
        lbl = np.tile(np.arange(w_in, dtype=np.int32), (h_in, 1))
        rng = np.random.RandomState(3)
        pi, pl = core.resize_images_and_labels(
            img, lbl, (16, 16), preserve_aspect_ratio=True, rng=rng
        )
        assert pi.shape == (16, 16, 1) and pl.shape == (16, 16)
        # both were cropped at the same x offset: image value tracks label/w
        np.testing.assert_allclose(pi[0, :, 0], pl[0] / w_in, atol=0.05)

    def test_shuffle_repeat_covers_all(self):
        items = list(range(10))
        it = core.shuffle_repeat(lambda: iter(items), buffer_size=4, seed=0)
        seen = [next(it) for _ in range(30)]
        assert set(seen[:20]) == set(items)  # every item seen within 2 epochs

    def test_parallel_map_preserves_order(self):
        out = list(core.parallel_map(lambda x: x * 2, iter(range(100)), num_workers=8))
        assert out == [x * 2 for x in range(100)]

    def test_batched(self):
        it = iter([{"a": np.zeros(3), "b": "s%d" % i} for i in range(5)])
        batches = list(core.batched(it, 2))
        assert len(batches) == 2  # drop remainder
        assert batches[0]["a"].shape == (2, 3)
        assert batches[0]["b"] == ["s0", "s1"]


class TestSyntheticPipelines:
    def test_synthetic_train_batches(self):
        s = tiny_settings(synthetic_data=True)
        pd = load_problem_def(CITYSCAPES_JSON)
        batch = next(train_input(s, pd))
        assert batch["proimages"].shape == (2, 32, 64, 3)
        assert batch["prolabels"].shape == (2, 32, 64)
        assert batch["prolabels"].dtype == np.int32
        assert batch["proimages"].min() >= -1 and batch["proimages"].max() < 1

    def test_input_seed_reproducible(self):
        """--input_seed makes the host pipelines bitwise-reproducible;
        distinct seeds decorrelate; default (None) stays OS-entropy."""
        pd = load_problem_def(CITYSCAPES_JSON)

        def first_batch(**kw):
            return next(hetero_train_input(
                tiny_settings(synthetic_data=True, **kw), pd
            ))

        a = first_batch(input_seed=7)
        b = first_batch(input_seed=7)
        c = first_batch(input_seed=8)
        for k in ("proimages_per_pixel", "prolabels_per_pixel",
                  "proimages_per_bbox", "prolabels_per_bbox"):
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)
        assert not np.array_equal(
            a["proimages_per_pixel"], c["proimages_per_pixel"]
        )

    def test_heterogeneous_combiner_layout(self):
        s = tiny_settings(synthetic_data=True)
        pd = load_problem_def(CITYSCAPES_JSON)
        batch = next(hetero_train_input(s, pd))
        assert batch["proimages_per_pixel"].shape == (2, 32, 64, 3)
        assert batch["proimages_per_bbox"].shape == (2, 32, 64, 3)
        assert batch["proimages_per_image"].shape == (2, 32, 64, 3)
        assert batch["prolabels_per_pixel"].shape == (2, 32, 64)
        assert batch["prolabels_per_bbox"].shape == (2, 32, 64, NUM_WEAK_CLASSES)
        assert batch["prolabels_per_image"].shape == (2, 32, 64, NUM_WEAK_CLASSES)
        # weak labels are per-pixel multinomials
        np.testing.assert_allclose(
            batch["prolabels_per_bbox"].sum(-1), 1.0, atol=1e-5
        )

    def test_two_way_variant(self):
        s = tiny_settings(synthetic_data=True, Nb_per_image=0)
        pd = load_problem_def(CITYSCAPES_JSON)
        batch = next(hetero_train_input(s, pd))
        assert batch["proimages_per_image"].shape[0] == 0
        assert batch["proimages_per_bbox"].shape[0] == 2


class TestTfrecordPipeline:
    @pytest.fixture()
    def tfrecords(self, tmp_path):
        tf = pytest.importorskip("tensorflow")
        rng = np.random.RandomState(0)
        path = str(tmp_path / "train.tfrecords")
        with tf.io.TFRecordWriter(path) as w:
            for i in range(4):
                img = rng.randint(0, 255, (64, 128, 3), np.uint8)
                lbl = rng.randint(0, 34, (64, 128), np.uint8)
                img_png = io.BytesIO()
                Image.fromarray(img).save(img_png, format="PNG")
                lbl_png = io.BytesIO()
                Image.fromarray(lbl).save(lbl_png, format="PNG")

                def _b(v):
                    return tf.train.Feature(bytes_list=tf.train.BytesList(value=[v]))

                ex = tf.train.Example(
                    features=tf.train.Features(
                        feature={
                            "image/encoded": _b(img_png.getvalue()),
                            "label/encoded": _b(lbl_png.getvalue()),
                            "image/path": _b(f"im{i}.png".encode()),
                            "label/path": _b(f"la{i}.png".encode()),
                        }
                    )
                )
                w.write(ex.SerializeToString())
        return path

    def test_train_input_from_tfrecords(self, tfrecords):
        s = tiny_settings(tfrecords_path=tfrecords)
        pd = load_problem_def(CITYSCAPES_JSON)
        batch = next(train_input(s, pd, seed=0))
        assert batch["proimages"].shape == (2, 32, 64, 3)
        assert batch["prolabels"].shape == (2, 32, 64)
        # raw lids (0..33) were mapped to cids with voids -> 19
        assert batch["prolabels"].max() <= 19
        assert batch["proimages"].min() >= -1.0 and batch["proimages"].max() <= 1.0
        assert batch["rawimagespaths"][0].startswith("im")

    def test_input_seed_reproducible_real_data(self, tfrecords):
        """--input_seed is deterministic on the REAL pipeline too: shuffle
        order and random crop offsets are derived per item (core.
        per_item_rng_factory), so thread scheduling in parallel_map cannot
        change the result (a shared RandomState would)."""
        pd = load_problem_def(CITYSCAPES_JSON)
        # aspect-preserving 'max' resize of 64x128 raw to a 32x96 target
        # leaves slack in W -> the random crop offset actually matters
        def batches(**kw):
            s = tiny_settings(
                tfrecords_path=tfrecords, preserve_aspect_ratio=True,
                width_feature_extractor=96, **kw,
            )
            it = train_input(s, pd)
            return [next(it) for _ in range(2)]

        a = batches(input_seed=3)
        b = batches(input_seed=3)
        c = batches(input_seed=4)
        for ba, bb in zip(a, b):
            np.testing.assert_array_equal(ba["proimages"], bb["proimages"])
            np.testing.assert_array_equal(ba["prolabels"], bb["prolabels"])
            assert ba["rawimagespaths"] == bb["rawimagespaths"]
        assert any(
            not np.array_equal(ba["proimages"], bc["proimages"])
            for ba, bc in zip(a, c)
        )

    def test_evaluate_input_from_tfrecords(self, tfrecords):
        s = tiny_settings(tfrecords_path=tfrecords, Nb=2)
        pd = load_problem_def(CITYSCAPES_JSON)
        batches = list(evaluate_input(s, pd))
        assert len(batches) == 2
        # labels NN-resized to the feature size (reference eval protocol)
        assert batches[0]["prolabels"].shape == (2, 32, 64)
        assert batches[0]["proimages"].shape == (2, 32, 64, 3)
