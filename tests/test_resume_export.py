"""Resume-from-checkpoint, StableHLO export, and vistas eval-flow tests."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iv2019_tpu.input.cityscapes import synthetic_eval_batches
from iv2019_tpu.input.heterogeneous import train_input as hetero_train_input
from iv2019_tpu.problem.problem_def import load_problem_def
from iv2019_tpu.train.loop import train as run_train
from iv2019_tpu.utils.checkpoint import CheckpointManager

from helpers import tiny_model, tiny_settings

pytestmark = pytest.mark.slow  # multi-second tier; see pytest.ini

_PKG = os.path.join(os.path.dirname(__file__), "..", "iv2019_tpu")
CITYSCAPES_JSON = os.path.join(_PKG, "problem_definitions", "cityscapes", "problem01.json")
VISTAS_JSON = os.path.join(_PKG, "problem_definitions", "vistas", "problem01.json")


class TestResume:
    def test_training_resumes_from_latest_checkpoint(self, tmp_path):
        settings = tiny_settings(
            log_dir=str(tmp_path),
            training_problem_def_path=CITYSCAPES_JSON,
            synthetic_data=True,
            save_checkpoints_steps=2,
        )
        pd = load_problem_def(CITYSCAPES_JSON)
        model = tiny_model(settings, train=True)

        run_train(
            settings, hetero_train_input(settings, pd), model=model,
            max_steps=2, log_every=1, image_summaries=False,
        )
        assert CheckpointManager(str(tmp_path)).latest_step() == 2

        # second invocation restores step 2 and continues to 4
        run_train(
            settings, hetero_train_input(settings, pd), model=model,
            max_steps=4, log_every=1, image_summaries=False,
        )
        steps = CheckpointManager(str(tmp_path)).all_steps()
        assert 4 in steps and 2 in steps  # unbounded retention

    def test_warm_start_vs_resume_mutually_exclusive(self, tmp_path):
        settings = tiny_settings(
            log_dir=str(tmp_path),
            training_problem_def_path=CITYSCAPES_JSON,
            synthetic_data=True,
            save_checkpoints_steps=1,
        )
        pd = load_problem_def(CITYSCAPES_JSON)
        model = tiny_model(settings, train=True)
        run_train(
            settings, hetero_train_input(settings, pd), model=model,
            max_steps=1, log_every=1, image_summaries=False,
        )
        with pytest.raises(ValueError, match="mutually exclusive"):
            run_train(
                settings.replace(init_ckpt_path="/nonexistent.npz"),
                hetero_train_input(settings, pd), model=model,
                max_steps=2, image_summaries=False,
            )


def test_stablehlo_export(tmp_path):
    from iv2019_tpu.tools.export_model import export_stablehlo

    settings = tiny_settings()
    model = tiny_model(settings, train=False)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 64, 3)))
    paths = export_stablehlo(model, variables, (1, 32, 64, 3), str(tmp_path))
    text = open(paths["stablehlo"]).read()
    assert "stablehlo" in text or "mhlo" in text or "func.func" in text
    assert os.path.getsize(paths["stablehlo"]) > 10_000


def test_vistas_eval_flow():
    """66-class eval path: synthetic batches -> confusion matrix -> metrics."""
    from iv2019_tpu.ops.confusion import confusion_matrix
    from iv2019_tpu.utils.metrics import print_metrics_from_confusion_matrix

    pd = load_problem_def(VISTAS_JSON)
    settings = tiny_settings(per_pixel_dataset_name="vistas", Nb=2)
    rng = np.random.RandomState(0)
    cm = None
    for batch in synthetic_eval_batches(settings, pd, num_batches=2):
        labels = batch["prolabels"]
        preds = rng.randint(0, 66, labels.shape)
        bcm = confusion_matrix(jnp.asarray(labels), jnp.asarray(preds), 66)
        cm = bcm if cm is None else cm + bcm
    cm = np.asarray(cm).astype(np.int64)
    assert cm.shape == (66, 66)
    m = print_metrics_from_confusion_matrix(cm, list(pd.cids2labels))
    assert np.isfinite(m["mean_iou"])
