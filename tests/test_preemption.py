"""Graceful preemption: SIGTERM mid-training saves a checkpoint and exits.

TPU-pod maintenance/eviction delivers SIGTERM to the training process; the
loop (train/loop.py) finishes the in-flight step, saves at the true step
count, and returns — so resume-from-latest loses no work. (The reference's
Estimator process just dies and replays from the last periodic save.)
"""

import os
import signal

import numpy as np

from iv2019_tpu.input.heterogeneous import train_input as hetero_train_input
from iv2019_tpu.problem.problem_def import load_problem_def
from iv2019_tpu.train.loop import train as run_train
from iv2019_tpu.utils.checkpoint import CheckpointManager

from helpers import tiny_model, tiny_settings
import pytest

pytestmark = pytest.mark.slow  # multi-second tier; see pytest.ini

_PKG = os.path.join(os.path.dirname(__file__), "..", "iv2019_tpu")
CITYSCAPES_JSON = os.path.join(
    _PKG, "problem_definitions", "cityscapes", "problem01.json"
)

NUM_STEPS = 50  # far more than run before the preemption arrives


def _preempting_batches(batches, after: int):
    """Yield batches; deliver SIGTERM to this process after ``after`` of
    them. The iterator runs on the prefetch thread — os.kill still delivers
    to the main thread (Python signal semantics), exactly like an external
    preemption notice racing the step loop."""
    for i, b in enumerate(batches):
        if i == after:
            os.kill(os.getpid(), signal.SIGTERM)
        yield b


def test_seeded_runs_are_bitwise_identical(tmp_path):
    """--input_seed (host pipelines) + random_seed (on-device augment) +
    fixed init => two runs produce identical parameters."""
    import jax

    finals = []
    for run in ("a", "b"):
        settings = tiny_settings(
            log_dir=str(tmp_path / run),
            training_problem_def_path=CITYSCAPES_JSON,
            synthetic_data=True,
            input_seed=13,
        )
        pd = load_problem_def(CITYSCAPES_JSON)
        state = run_train(
            settings, hetero_train_input(settings, pd),
            model=tiny_model(settings, train=True),
            max_steps=3, log_every=100, image_summaries=False,
        )
        finals.append(jax.device_get(state.params))
    a_leaves = jax.tree_util.tree_leaves_with_path(finals[0])
    b_leaves = jax.tree_util.tree_leaves_with_path(finals[1])
    for (pa, va), (pb, vb) in zip(a_leaves, b_leaves):
        assert pa == pb
        np.testing.assert_array_equal(va, vb, err_msg=str(pa))


def test_sigterm_saves_checkpoint_and_exits(tmp_path):
    settings = tiny_settings(
        log_dir=str(tmp_path),
        training_problem_def_path=CITYSCAPES_JSON,
        synthetic_data=True,
        save_checkpoints_steps=NUM_STEPS,  # periodic save would land at 50
    )
    pd = load_problem_def(CITYSCAPES_JSON)
    model = tiny_model(settings, train=True)
    prev_handler = signal.getsignal(signal.SIGTERM)

    state = run_train(
        settings,
        _preempting_batches(hetero_train_input(settings, pd), after=4),
        model=model,
        max_steps=NUM_STEPS,
        log_every=100,
        image_summaries=False,
    )

    # exited early, after at least one step
    final = int(np.asarray(state.step))
    assert 0 < final < NUM_STEPS
    # checkpoint saved at the exact step the loop stopped on
    mgr = CheckpointManager(str(tmp_path))
    assert mgr.latest_step() == final
    mgr.close()
    # the previous SIGTERM disposition is restored
    assert signal.getsignal(signal.SIGTERM) == prev_handler

    # resume continues from the preemption checkpoint
    state2 = run_train(
        settings,
        hetero_train_input(settings, pd),
        model=model,
        max_steps=final + 1,
        log_every=100,
        image_summaries=False,
    )
    assert int(np.asarray(state2.step)) == final + 1
