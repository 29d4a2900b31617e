"""Fused flat-vector optimizer must match the reference (optax + loss-reg) path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iv2019_tpu.train.fused_update import FusedSGDM, make_weight_decay_mask
from iv2019_tpu.train.optimizer import make_optimizer
from iv2019_tpu.train.state import create_fused_train_state, create_train_state
from iv2019_tpu.train.step import make_train_step

from helpers import synthetic_batch, tiny_model, tiny_settings

pytestmark = pytest.mark.slow  # multi-second tier; see pytest.ini


def _init(settings):
    model = tiny_model(settings, train=True)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 32, 64, 3), jnp.float32)
    )
    return model, jax.tree_util.tree_map(np.asarray, variables)


class TestFusedMatchesReferencePath:
    def test_params_match_after_steps(self):
        settings = tiny_settings()
        model, variables = _init(settings)
        batch = synthetic_batch(settings)

        # reference path: optax SGDM + L2 reg through the loss
        tx, _ = make_optimizer(settings)
        state_ref = create_train_state(variables, tx, settings.ema_decay)
        step_ref = make_train_step(settings, model=model, tx=tx)

        # fused path
        fused_opt = FusedSGDM(settings, variables["params"])
        state_fused = create_fused_train_state(variables, fused_opt)
        step_fused = make_train_step(settings, model=model, fused_opt=fused_opt)

        for i in range(3):
            state_ref, m_ref = step_ref(state_ref, batch)
            state_fused, m_fused = step_fused(state_fused, batch)

        p_ref = jax.tree_util.tree_leaves(state_ref.params)
        p_fused = jax.tree_util.tree_leaves(state_fused.params)
        for a, b in zip(p_ref, p_fused):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6
            )
        # losses agree (total includes the reg term on both paths)
        assert float(m_ref["total"]) == pytest.approx(
            float(m_fused["total"]), rel=1e-3
        )
        assert float(m_ref["regularization"]) == pytest.approx(
            float(m_fused["regularization"]), rel=1e-3
        )

    def test_ema_matches_reference_path(self):
        settings = tiny_settings()
        model, variables = _init(settings)
        batch = synthetic_batch(settings)

        tx, _ = make_optimizer(settings)
        state_ref = create_train_state(variables, tx, settings.ema_decay)
        step_ref = make_train_step(settings, model=model, tx=tx)
        fused_opt = FusedSGDM(settings, variables["params"])
        state_fused = create_fused_train_state(variables, fused_opt)
        step_fused = make_train_step(settings, model=model, fused_opt=fused_opt)

        for _ in range(2):
            state_ref, _ = step_ref(state_ref, batch)
            state_fused, _ = step_fused(state_fused, batch)

        ema_ref = state_ref.ema.debiased(fallback=state_ref.params)
        ema_fused = fused_opt.ema_params(state_fused.opt_state, state_fused.params)
        for a, b in zip(
            jax.tree_util.tree_leaves(ema_ref), jax.tree_util.tree_leaves(ema_fused)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6
            )


class TestPallasUpdatePath:
    def test_pallas_matches_jnp_path(self):
        settings = tiny_settings()
        model, variables = _init(settings)
        batch = synthetic_batch(settings)

        opt_jnp = FusedSGDM(settings, variables["params"], use_pallas=False)
        opt_pl = FusedSGDM(settings, variables["params"], use_pallas=True)
        s_jnp = create_fused_train_state(variables, opt_jnp)
        s_pl = create_fused_train_state(variables, opt_pl)
        step_jnp = make_train_step(settings, model=model, fused_opt=opt_jnp)
        step_pl = make_train_step(settings, model=model, fused_opt=opt_pl)

        for _ in range(2):
            s_jnp, m_jnp = step_jnp(s_jnp, batch)
            s_pl, m_pl = step_pl(s_pl, batch)

        for a, b in zip(
            jax.tree_util.tree_leaves(s_jnp.params),
            jax.tree_util.tree_leaves(s_pl.params),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(
            np.asarray(s_jnp.opt_state.ema_biased),
            np.asarray(s_pl.opt_state.ema_biased),
            rtol=1e-5, atol=1e-7,
        )
        assert float(m_jnp["regularization"]) == pytest.approx(
            float(m_pl["regularization"]), rel=1e-5
        )


def test_weight_decay_mask_kernels_only():
    params = {
        "conv": {"kernel": np.ones((2, 3)), "bias": np.ones((3,))},
        "norm": {"scale": np.ones((4,)), "bias": np.ones((4,))},
    }
    mask = make_weight_decay_mask(params)
    assert mask.sum() == 6  # only the kernel entries
    assert mask.size == 6 + 3 + 8
