"""Tests for confusion matrix, segment ops, and bbox rasterization."""

import numpy as np
import jax.numpy as jnp

from iv2019_tpu.ops.confusion import (
    batch_mean_iou,
    confusion_matrix,
    metrics_from_confusion_matrix,
)
from iv2019_tpu.ops.rasterize import (
    image_label_multinomial_np,
    rasterize_bboxes,
    rasterize_bboxes_np,
)
from iv2019_tpu.ops.segment_ops import (
    colorize_cids,
    gather_cids,
    remap_probabilities,
    segment_sum_channels,
)
from iv2019_tpu.problem.taxonomy import NUM_WEAK_CLASSES


class TestConfusionMatrix:
    def test_against_numpy(self):
        rng = np.random.RandomState(0)
        k = 20
        labels = rng.randint(0, k, size=(2, 32, 32))
        preds = rng.randint(0, k, size=(2, 32, 32))
        cm = np.asarray(confusion_matrix(jnp.asarray(labels), jnp.asarray(preds), k))
        want = np.zeros((k, k), np.int64)
        for l, p in zip(labels.ravel(), preds.ravel()):
            want[l, p] += 1
        np.testing.assert_array_equal(cm, want)

    def test_large_k_scatter_path(self):
        rng = np.random.RandomState(1)
        k = 200  # > matmul threshold
        labels = rng.randint(0, k, size=(1000,))
        preds = rng.randint(0, k, size=(1000,))
        cm = np.asarray(confusion_matrix(jnp.asarray(labels), jnp.asarray(preds), k))
        assert cm.sum() == 1000
        assert cm.shape == (k, k)

    def test_out_of_range_dropped(self):
        labels = jnp.asarray([0, 1, 25, -1])
        preds = jnp.asarray([0, 1, 1, 1])
        cm = np.asarray(confusion_matrix(labels, preds, 3))
        assert cm.sum() == 2

    def test_perfect_prediction_miou(self):
        labels = jnp.asarray(np.random.RandomState(2).randint(0, 4, size=(4, 16, 16)))
        miou = float(batch_mean_iou(labels, labels, 4))
        assert miou > 0.999

    def test_metrics_report(self):
        cm = np.diag([10, 20, 30]).astype(np.int32)
        m = metrics_from_confusion_matrix(cm)
        assert abs(m["global_accuracy"] - 100.0) < 1e-6
        assert abs(m["mean_iou"] - 100.0) < 1e-6


class TestSegmentOps:
    def test_segment_sum_channels(self):
        # project 4 channels into 2 segments
        labels = jnp.asarray(np.random.RandomState(3).rand(2, 3, 3, 4).astype(np.float32))
        seg = np.array([0, 1, 0, 1])
        out = np.asarray(segment_sum_channels(labels, seg, 2))
        want = np.stack(
            [np.asarray(labels)[..., 0] + np.asarray(labels)[..., 2],
             np.asarray(labels)[..., 1] + np.asarray(labels)[..., 3]], axis=-1)
        np.testing.assert_allclose(out, want, rtol=1e-6)

    def test_remap_probabilities_preserves_mass(self):
        probs = jnp.asarray(np.random.RandomState(4).dirichlet(np.ones(5), size=(2, 4, 4)).astype(np.float32))
        out = np.asarray(remap_probabilities(probs, [2, 1, 1, 0, 2]))
        assert out.shape == (2, 4, 4, 3)
        np.testing.assert_allclose(out.sum(-1), 1.0, rtol=1e-5)

    def test_gather_and_colorize(self):
        table = [5, 6, 7]
        cids = jnp.asarray([[0, 2], [1, 0]])
        np.testing.assert_array_equal(np.asarray(gather_cids(table, cids)), [[5, 7], [6, 5]])
        palette = np.arange(30).reshape(10, 3).astype(np.uint8)
        col = np.asarray(colorize_cids(jnp.asarray([[5]]), palette))
        np.testing.assert_array_equal(col[0, 0], [15, 16, 17])


class TestRasterize:
    def _random_case(self, seed, n_boxes, h, w):
        rng = np.random.RandomState(seed)
        cids = rng.randint(-1, NUM_WEAK_CLASSES, size=(n_boxes,)).astype(np.int32)
        x = np.sort(rng.rand(n_boxes, 2), axis=1)
        y = np.sort(rng.rand(n_boxes, 2), axis=1)
        boxes = np.stack([x[:, 0], x[:, 1], y[:, 0], y[:, 1]], axis=1).astype(np.float32)
        return cids, boxes, h, w

    def test_device_matches_numpy_oracle(self):
        for seed in range(3):
            cids, boxes, h, w = self._random_case(seed, 24, 40, 56)
            want = rasterize_bboxes_np(cids, boxes, h, w)
            got = np.asarray(rasterize_bboxes(jnp.asarray(cids), jnp.asarray(boxes), h, w))
            np.testing.assert_allclose(got, want, atol=1e-5)

    def test_is_multinomial(self):
        cids, boxes, h, w = self._random_case(7, 16, 32, 32)
        rla = np.asarray(rasterize_bboxes(jnp.asarray(cids), jnp.asarray(boxes), h, w))
        np.testing.assert_allclose(rla.sum(-1), 1.0, atol=1e-5)
        assert (rla >= 0).all()

    def test_empty_boxes_all_void(self):
        cids = np.full((8,), -1, np.int32)
        boxes = np.zeros((8, 4), np.float32)
        rla = np.asarray(rasterize_bboxes(jnp.asarray(cids), jnp.asarray(boxes), 16, 16))
        assert (rla[..., -1] == 1.0).all()
        assert (rla[..., :-1] == 0.0).all()

    def test_overlap_normalization(self):
        # two overlapping boxes of different classes -> 1/2, 1/2 in overlap
        cids = np.array([0, 1], np.int32)
        boxes = np.array([[0.0, 0.5, 0.0, 0.5], [0.25, 0.75, 0.25, 0.75]], np.float32)
        rla = np.asarray(rasterize_bboxes(jnp.asarray(cids), jnp.asarray(boxes), 16, 16))
        # pixel (6, 6) is inside both
        np.testing.assert_allclose(rla[6, 6, 0], 0.5)
        np.testing.assert_allclose(rla[6, 6, 1], 0.5)
        # pixel (1, 1) only inside first box
        np.testing.assert_allclose(rla[1, 1, 0], 1.0)

    def test_image_label_vector(self):
        v = image_label_multinomial_np([2, 5, 2])
        assert abs(v[2] - 0.5) < 1e-6 and abs(v[5] - 0.5) < 1e-6
        v_empty = image_label_multinomial_np([])
        assert v_empty[-1] == 1.0
