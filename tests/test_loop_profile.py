"""Automatic periodic profiler traces (VERDICT round-1 missing #3).

The reference writes a Chrome trace every max(steps//50, save_ckpt_steps)
steps (_RunMetadataHook). Our loop must leave jax.profiler trace dirs under
log_dir/profile/step_N when profile_every is set (system.train wires the
reference cadence by default).
"""

import os

from helpers import tiny_model, tiny_settings
from iv2019_tpu.input.heterogeneous import train_input
from iv2019_tpu.train.loop import default_profile_every, train
import pytest

pytestmark = pytest.mark.slow  # multi-second tier; see pytest.ini

_PKG = os.path.join(os.path.dirname(__file__), "..", "iv2019_tpu")
CITYSCAPES_JSON = os.path.join(
    _PKG, "problem_definitions", "cityscapes", "problem01.json"
)


def test_default_cadence_matches_reference():
    s = tiny_settings(save_checkpoints_steps=7)
    assert default_profile_every(s, 1000) == 20  # 1000 // 50
    assert default_profile_every(s, 100) == 7  # save_ckpt dominates


def test_periodic_trace_written(tmp_path):
    settings = tiny_settings(
        log_dir=str(tmp_path / "log"),
        training_problem_def_path=CITYSCAPES_JSON,
        synthetic_data=True,
        save_checkpoints_steps=100,
    )
    from iv2019_tpu.problem.problem_def import load_problem_def

    pd = load_problem_def(CITYSCAPES_JSON)
    model = tiny_model(settings)
    train(
        settings,
        train_input(settings, pd, seed=0),
        model=model,
        max_steps=3,
        log_every=1,
        profile_every=2,
        image_summaries=False,
    )
    trace_dir = os.path.join(settings.log_dir, "profile", "step_2")
    assert os.path.isdir(trace_dir), os.listdir(settings.log_dir)
    # a non-empty xplane/trace artifact exists somewhere under it
    found = [
        os.path.join(r, f)
        for r, _, fs in os.walk(trace_dir)
        for f in fs
    ]
    assert found, "trace directory is empty"
