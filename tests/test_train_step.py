"""End-to-end train/eval/predict step tests on the 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iv2019_tpu.parallel.mesh import (
    create_mesh,
    local_batch_size,
    replicate,
    shard_batch,
)
from iv2019_tpu.train.optimizer import make_learning_rate_fn, make_optimizer
from iv2019_tpu.train.state import EmaState, create_train_state
from iv2019_tpu.train.step import make_eval_step, make_predict_step, make_train_step

from helpers import synthetic_batch, tiny_model, tiny_settings


@pytest.fixture(scope="module")
def setup():
    settings = tiny_settings()
    model = tiny_model(settings, train=True)
    x = jnp.zeros((2, 32, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    # keep the canonical copy on host: tests donate device buffers to XLA
    variables = jax.tree_util.tree_map(np.asarray, variables)
    return settings, model, variables


class TestLearningRateSchedule:
    def test_piecewise_boundaries(self):
        s = tiny_settings(
            Ntrain=100, Nb=4, Ne=17,
            learning_rate_boundaries=(8, 15, 17),
            learning_rate_values=(0.01, 0.005, 0.0025),
        )
        # last boundary == Ne is popped -> 2 boundaries, first 2+1 values used
        assert len(s.learning_rate_boundaries_steps) == 2
        lr_fn = make_learning_rate_fn(s)
        b0, b1 = s.learning_rate_boundaries_steps
        assert float(lr_fn(jnp.asarray(0))) == pytest.approx(0.01)
        assert float(lr_fn(jnp.asarray(b0))) == pytest.approx(0.01)  # inclusive left
        assert float(lr_fn(jnp.asarray(b0 + 1))) == pytest.approx(0.005)
        assert float(lr_fn(jnp.asarray(b1 + 5))) == pytest.approx(0.0025)

    def test_decay_derived_values(self):
        s = tiny_settings(
            learning_rate_values=None, learning_rate_decay=0.5,
            learning_rate_boundaries=(1,), Ne=2,
        )
        assert s.learning_rate_values_resolved == (0.01, 0.005)

    def test_polynomial(self):
        s = tiny_settings(
            learning_rate_schedule="polynomial_decay",
            learning_rate_values=None, learning_rate_decay=None,
            learning_rate_initial=0.1, learning_rate_final=0.01,
            learning_rate_power=1.0,
        )
        lr_fn = make_learning_rate_fn(s)
        assert float(lr_fn(jnp.asarray(0))) == pytest.approx(0.1)
        assert float(lr_fn(jnp.asarray(s.num_training_steps))) == pytest.approx(0.01)


class TestEma:
    def test_constant_value_converges(self):
        params = {"w": jnp.asarray([2.0, 4.0])}
        ema = EmaState.create(params)
        for t in range(200):
            ema = ema.update(params, jnp.asarray(t), 0.9)
        out = ema.debiased()
        np.testing.assert_allclose(np.asarray(out["w"]), [2.0, 4.0], rtol=1e-4)

    def test_debias_early_steps(self):
        # after one update with decay_t = min(0.9, 1/10) = 0.1:
        # biased = 0.9 * v, debiased = 0.9 v / (1 - 0.1) = v
        params = {"w": jnp.asarray(5.0)}
        ema = EmaState.create(params).update(params, jnp.asarray(0), 0.9)
        out = ema.debiased()
        np.testing.assert_allclose(float(out["w"]), 5.0, rtol=1e-6)

    def test_fallback_before_any_update(self):
        params = {"w": jnp.asarray(3.0)}
        ema = EmaState.create(params)
        out = ema.debiased(fallback=params)
        assert float(out["w"]) == 3.0


class TestTrainStep:
    def test_single_step_runs_and_updates(self, setup):
        settings, model, variables = setup
        tx, _ = make_optimizer(settings)
        state = create_train_state(variables, tx, settings.ema_decay)
        step_fn = make_train_step(settings, model=model, tx=tx)
        batch = synthetic_batch(settings)
        # snapshot before the step: the input state is donated to XLA
        w0 = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
        new_state, metrics = step_fn(state, batch)
        assert int(new_state.step) == 1
        assert np.isfinite(float(metrics["total"]))
        assert float(metrics["regularization"]) > 0
        # params changed
        w1 = np.asarray(jax.tree_util.tree_leaves(new_state.params)[0])
        assert not np.allclose(w0, w1)

    def test_per_pixel_only_empty_weak_batches(self, setup):
        """Degenerate mixes (Nb_per_bbox=0, Nb_per_image=0) must train.

        Zero-row weak operands do not compile through the Mosaic fused
        loss (regression: the pp-only train_cli run hung in compile);
        make_train_step must route them to the jnp loss.
        """
        settings, model, variables = setup
        s = settings.replace(Nb_per_bbox=0, Nb_per_image=0)
        tx, _ = make_optimizer(s)
        state = create_train_state(
            jax.tree_util.tree_map(jnp.asarray, variables), tx, s.ema_decay
        )
        step_fn = make_train_step(s, model=model, tx=tx)
        batch = {**synthetic_batch(settings)}
        for k in ("proimages_per_bbox", "proimages_per_image",
                  "prolabels_per_bbox", "prolabels_per_image"):
            batch[k] = batch[k][:0]
        new_state, metrics = step_fn(state, batch)
        assert int(new_state.step) == 1
        assert np.isfinite(float(metrics["total"]))
        assert float(metrics["l1_segmentation"]) > 0

    def test_sharded_multi_device(self, setup):
        settings, model, variables = setup
        mesh = create_mesh()
        assert mesh.size == 8
        # sub-batches divisible by 8
        s8 = tiny_settings(Nb_per_pixel=8, Nb_per_bbox=8, Nb_per_image=8, Nb=8)
        tx, _ = make_optimizer(s8)
        state = create_train_state(variables, tx, s8.ema_decay)
        state = replicate(state, mesh)
        batch = shard_batch(synthetic_batch(s8), mesh)
        step_fn = make_train_step(s8, model=model, tx=tx)
        new_state, metrics = step_fn(state, batch)
        assert np.isfinite(float(metrics["total"]))
        assert int(new_state.step) == 1

    def test_local_batch_size(self):
        mesh = create_mesh()
        assert local_batch_size(16, mesh) == 2
        with pytest.raises(ValueError):
            local_batch_size(12, mesh)


class TestEvalPredict:
    def test_eval_step_confusion_matrix(self, setup):
        settings, _, variables = setup
        model = tiny_model(settings, train=False)
        tcids2ecids = list(range(19)) + [-1]
        eval_fn = make_eval_step(settings, model=model, tcids2ecids=tcids2ecids)
        images = jnp.zeros((2, 32, 64, 3), jnp.float32)
        labels = jnp.zeros((2, 32, 64), jnp.int32)
        cm = eval_fn(variables["params"], variables["batch_stats"], images, labels)
        assert cm.shape == (20, 20)
        assert int(cm.sum()) == 2 * 32 * 64

    def test_predict_step_shapes(self, setup):
        settings, _, variables = setup
        model = tiny_model(settings, train=False)
        pred_fn = make_predict_step(settings, output_size=(64, 128), model=model)
        images = jnp.zeros((1, 32, 64, 3), jnp.float32)
        out = pred_fn(variables["params"], variables["batch_stats"], images)
        assert out["decisions"].shape == (1, 64, 128)
        assert out["l1_probabilities"].shape == (1, 64, 128, 14)
        assert out["decisions"].dtype == jnp.int32
        # fused decisions live in the 20-class common space
        assert int(jnp.max(out["decisions"])) <= 19
