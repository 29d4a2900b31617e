"""Integration tests: SemanticSegmentation orchestrator end-to-end on
synthetic data with a tiny model (train -> checkpoint -> evaluate -> predict).
"""

import os

import numpy as np
import pytest
from PIL import Image

from iv2019_tpu.input.cityscapes import evaluate_input
from iv2019_tpu.input.dataset_agnostic import predict_input
from iv2019_tpu.input.heterogeneous import train_input as hetero_train_input
from iv2019_tpu.system import SemanticSegmentation

from helpers import tiny_model, tiny_settings

pytestmark = pytest.mark.slow  # multi-second tier; see pytest.ini

_PKG = os.path.join(os.path.dirname(__file__), "..", "iv2019_tpu")
CITYSCAPES_JSON = os.path.join(
    _PKG, "problem_definitions", "cityscapes", "problem01.json"
)


def _settings(tmp_path, **kw):
    return tiny_settings(
        log_dir=str(tmp_path / "log"),
        training_problem_def_path=CITYSCAPES_JSON,
        synthetic_data=True,
        save_checkpoints_steps=2,
        **kw,
    )


@pytest.fixture()
def trained_system(tmp_path):
    settings = _settings(tmp_path)

    def model_fn(s):
        return tiny_model(s, train=(s.mode == "train"))

    system = SemanticSegmentation(
        {
            "train": hetero_train_input,
            "eval": evaluate_input,
            "predict": lambda s, pd: predict_input(s),
        },
        model_fn=model_fn,
        settings=settings,
    )
    # cap to 2 steps for test speed
    system.train(max_steps=2, log_every=1)
    return system


class TestSystem:
    def test_settings_and_cid_maps(self, tmp_path):
        settings = _settings(tmp_path)
        system = SemanticSegmentation({}, settings=settings)
        assert system.output_Nclasses == 20
        assert system.training_cids2evaluation_cids == list(range(19)) + [-1]
        assert system.eval_res_dir.endswith("eval_00")

    def test_train_creates_checkpoints_and_logs(self, trained_system):
        s = trained_system.settings
        assert os.path.exists(os.path.join(s.log_dir, "settings.txt"))
        assert os.path.exists(os.path.join(s.log_dir, "all_code.zip"))
        assert os.path.exists(os.path.join(s.log_dir, "train_metrics.jsonl"))
        from iv2019_tpu.utils.checkpoint import CheckpointManager

        ckpt = CheckpointManager(s.log_dir)
        assert ckpt.latest_step() == 2

    def test_settings_txt_overwrite_refused(self, trained_system):
        with pytest.raises(AssertionError):
            trained_system.train()

    def test_evaluate_from_checkpoint(self, trained_system):
        metrics = trained_system.evaluate()
        assert len(metrics) == 1
        cm = metrics[0]["confusion_matrix"]
        # void trimmed: 19x19
        assert cm.shape == (19, 19)
        assert "mean_iou" in metrics[0]
        assert np.isfinite(metrics[0]["mean_iou"])

    def test_predict_from_checkpoint(self, trained_system, tmp_path):
        # create 2 images to predict
        pdir = tmp_path / "imgs"
        pdir.mkdir()
        rng = np.random.RandomState(0)
        for i in range(2):
            Image.fromarray(
                rng.randint(0, 255, (40, 50, 3), np.uint8)
            ).save(pdir / f"im{i}.png")
        sys2 = SemanticSegmentation(
            {"predict": lambda s, pd: predict_input(s)},
            model_fn=trained_system._model_fn,
            settings=trained_system.settings.replace(
                mode="predict", predict_dir=str(pdir), Nb=1
            ),
        )
        outs = list(sys2.predict())
        assert len(outs) == 2
        out = outs[0]
        # height/width_system unset -> predictions resized to raw image size
        assert out["decisions"].shape == (40, 50)
        assert out["l1_probabilities"].shape == (40, 50, 14)
        assert str(out["rawimagespaths"]).endswith(".png")

    def test_restore_emas_path(self, trained_system):
        s = trained_system.settings.replace(restore_emas=True)
        sys2 = SemanticSegmentation(
            {"eval": evaluate_input},
            model_fn=trained_system._model_fn,
            settings=s,
        )
        metrics = sys2.evaluate()
        assert np.isfinite(metrics[0]["mean_iou"])
