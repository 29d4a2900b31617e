"""Regression tests for VERDICT round-1 weak #3/#4/#5:

- checkpoints restore across fused/unfused optimizer layouts
- predict passthrough features are indexed per item (Nb>1 safe)
- eval batches group to the mesh size instead of replicating
- the replication fallback warns
"""

import os
import warnings

import numpy as np
import pytest

from helpers import tiny_model, tiny_settings
from iv2019_tpu.input.cityscapes import evaluate_input
from iv2019_tpu.input.heterogeneous import train_input as hetero_train_input
from iv2019_tpu.system import SemanticSegmentation, _group_eval_batches

pytestmark = pytest.mark.slow  # multi-second tier; see pytest.ini

_PKG = os.path.join(os.path.dirname(__file__), "..", "iv2019_tpu")
CITYSCAPES_JSON = os.path.join(
    _PKG, "problem_definitions", "cityscapes", "problem01.json"
)


def _model_fn(s):
    return tiny_model(s, train=(s.mode == "train"))


def _train_system(tmp_path, **kw):
    settings = tiny_settings(
        log_dir=str(tmp_path / "log"),
        training_problem_def_path=CITYSCAPES_JSON,
        synthetic_data=True,
        save_checkpoints_steps=2,
        **kw,
    )
    system = SemanticSegmentation(
        {"train": hetero_train_input, "eval": evaluate_input},
        model_fn=_model_fn,
        settings=settings,
    )
    system.train(max_steps=2, log_every=1)
    return system


@pytest.mark.parametrize("train_fused", [True, False])
def test_cross_layout_checkpoint_restore(tmp_path, train_fused):
    """A checkpoint trained with one optimizer layout must be evaluable with
    the other (reference behavior: savers are layout-free)."""
    system = _train_system(tmp_path, fused_optimizer=train_fused)
    other = SemanticSegmentation(
        {"eval": evaluate_input},
        model_fn=_model_fn,
        settings=system.settings.replace(fused_optimizer=not train_fused),
    )
    metrics = other.evaluate()
    assert np.isfinite(metrics[0]["mean_iou"])


def test_cross_layout_restore_with_emas(tmp_path):
    system = _train_system(tmp_path, fused_optimizer=True)
    other = SemanticSegmentation(
        {"eval": evaluate_input},
        model_fn=_model_fn,
        settings=system.settings.replace(fused_optimizer=False, restore_emas=True),
    )
    metrics = other.evaluate()
    assert np.isfinite(metrics[0]["mean_iou"])


class TestGroupEvalBatches:
    def _b(self, n, hw=(4, 6), tag=0):
        return {
            "proimages": np.full((n, *hw, 3), tag, np.float32),
            "prolabels": np.full((n, *hw), tag, np.int32),
            "paths": [f"p{tag}_{i}" for i in range(n)],
        }

    def test_groups_to_mesh_size(self):
        batches = [self._b(1, tag=i) for i in range(8)]
        out = list(_group_eval_batches(iter(batches), 4))
        assert len(out) == 2
        assert out[0]["proimages"].shape[0] == 4
        assert out[0]["paths"] == ["p0_0", "p1_0", "p2_0", "p3_0"]
        # grouping preserves example order and values
        np.testing.assert_array_equal(
            out[1]["prolabels"][:, 0, 0], [4, 5, 6, 7]
        )

    def test_partial_tail_and_shape_change_flush(self):
        batches = [self._b(1, tag=0), self._b(1, hw=(8, 6), tag=1), self._b(1, hw=(8, 6), tag=2)]
        out = list(_group_eval_batches(iter(batches), 4))
        # shape change forces a flush: [b0], [b1, b2]; both padded to 4 rows
        assert len(out) == 2
        assert out[0]["proimages"].shape == (4, 4, 6, 3)
        assert out[1]["proimages"].shape == (4, 8, 6, 3)
        # padded label rows are the ignore value (-1) and padded images zero
        np.testing.assert_array_equal(out[0]["prolabels"][1:], -1)
        np.testing.assert_array_equal(out[0]["proimages"][1:], 0.0)
        # real rows untouched
        np.testing.assert_array_equal(out[1]["prolabels"][0], 1)
        np.testing.assert_array_equal(out[1]["prolabels"][1], 2)

    def test_tail_padding_single_compiled_shape(self):
        # 9 Nb=1 batches on a 4-chip mesh: 2 full groups + padded tail, all
        # the SAME shape -> one jit compile per eval sweep (VERDICT r2 #7)
        batches = [self._b(1, tag=i) for i in range(9)]
        out = list(_group_eval_batches(iter(batches), 4))
        assert len(out) == 3
        assert {o["proimages"].shape for o in out} == {(4, 4, 6, 3)}
        np.testing.assert_array_equal(out[2]["prolabels"][0, 0, 0], 8)
        np.testing.assert_array_equal(out[2]["prolabels"][1:], -1)

    def test_padded_rows_do_not_affect_confusion_matrix(self):
        import jax.numpy as jnp

        from iv2019_tpu.ops.confusion import confusion_matrix

        batches = [self._b(1, tag=1)]
        (out,) = _group_eval_batches(iter(batches), 4)
        labels = jnp.asarray(out["prolabels"])
        preds = jnp.zeros_like(labels)  # predict class 0 everywhere
        cm = np.asarray(confusion_matrix(labels, preds, 3))
        # only the 24 real pixels (label 1, pred 0) counted; -1 rows dropped
        assert cm.sum() == 24 and cm[1, 0] == 24

    def test_unsigned_labels_pad_out_of_range(self):
        batches = [{
            "proimages": np.zeros((1, 4, 6, 3), np.float32),
            "prolabels": np.ones((1, 4, 6), np.uint8),
        }]
        (out,) = _group_eval_batches(iter(batches), 2)
        assert out["prolabels"].dtype == np.uint8
        np.testing.assert_array_equal(out["prolabels"][1], 255)

    def test_group_one_is_identity(self):
        batches = [self._b(2, tag=0), self._b(1, tag=1)]
        out = list(_group_eval_batches(iter(batches), 1))
        assert len(out) == 2
        assert out[0]["proimages"].shape[0] == 2


def test_prefetch_replication_warns():
    import jax

    from iv2019_tpu.input.prefetch import device_prefetch
    from iv2019_tpu.parallel.mesh import create_mesh

    mesh = create_mesh()  # 8 virtual CPU devices (conftest)
    if mesh.size == 1:
        pytest.skip("single-device mesh")
    # the warning fires once per (name, dim, mesh) key; reset so earlier
    # tests that also hit the fallback don't mask this one
    import iv2019_tpu.input.prefetch as prefetch_mod

    prefetch_mod._warned_replication.clear()
    batch = {"x": np.zeros((3, 4), np.float32)}
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        out = list(device_prefetch(iter([batch]), mesh))
    assert len(out) == 1
    assert any("replicated" in str(w.message) for w in rec)


def test_predict_rawimages_indexed_per_item(tmp_path):
    """Nb>1 predict: each yielded item gets its own raw image / path."""
    system = _train_system(tmp_path)
    s = system.settings.replace(mode="predict", Nb=2, height_system=None)
    rng = np.random.RandomState(0)
    raws = [rng.randint(0, 255, (12 + 4 * i, 20, 3), np.uint8) for i in range(2)]

    def fake_predict_input(settings, pd):
        h, w = settings.height_feature_extractor, settings.width_feature_extractor
        yield {
            "proimages": rng.uniform(-1, 1, (2, h, w, 3)).astype(np.float32),
            "rawimages": raws,
            "rawimagespaths": ["a.png", "b.png"],
        }

    sys2 = SemanticSegmentation(
        {"predict": fake_predict_input}, model_fn=_model_fn, settings=s
    )
    outs = list(sys2.predict())
    assert len(outs) == 2
    # arbitrary-size path resizes each item to ITS raw size
    assert outs[0]["decisions"].shape == raws[0].shape[:2]
    assert outs[1]["decisions"].shape == raws[1].shape[:2]
    assert outs[0]["rawimagespaths"] == "a.png"
    assert outs[1]["rawimagespaths"] == "b.png"
