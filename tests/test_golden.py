"""Golden-step regression: a fixed-seed tiny training run must stay stable.

SURVEY §4 calls for golden small-step integration runs. Rather than pinning
exact float values (fragile across XLA versions), this pins the *behavioral*
invariants of three steps: losses finite and ordered sanely, loss decreases
on a constant batch, EMA/momentum state evolves, LR schedule applied.
"""

import numpy as np
import jax
import pytest

from iv2019_tpu.train.fused_update import FusedSGDM
from iv2019_tpu.train.state import create_fused_train_state
from iv2019_tpu.train.step import make_train_step

from helpers import synthetic_batch, tiny_model, tiny_settings


def test_three_step_descent_and_state_evolution():
    settings = tiny_settings()
    model = tiny_model(settings, train=True)
    variables = model.init(jax.random.PRNGKey(42), np.zeros((2, 32, 64, 3), np.float32))
    variables = jax.tree_util.tree_map(np.asarray, variables)
    opt = FusedSGDM(settings, variables["params"], use_pallas=False)
    state = create_fused_train_state(variables, opt)
    step_fn = make_train_step(settings, model=model, fused_opt=opt)
    batch = synthetic_batch(settings, seed=42)

    totals = []
    for i in range(3):
        state, metrics = step_fn(state, batch)
        metrics.pop("weight_masks", None)
        m = {k: float(v) for k, v in metrics.items()}
        assert np.isfinite(m["total"]), f"step {i}: non-finite loss"
        assert m["total"] > 0
        assert m["l1_segmentation"] > 0
        assert m["regularization"] > 0
        assert 0.0 <= m["miou"] <= 1.0
        totals.append(m["total"])

    # training on a constant batch must reduce the loss
    assert totals[-1] < totals[0], totals
    assert int(state.step) == 3
    # momentum and EMA evolved
    assert float(np.abs(np.asarray(state.opt_state.momentum)).max()) > 0
    assert float(np.abs(np.asarray(state.opt_state.ema_biased)).max()) > 0
    prod = float(state.opt_state.ema_decay_product)
    # decay_t = min(0.9, (1+t)/(10+t)): t=0,1,2 -> 1/10, 2/11, 3/12
    assert prod == pytest.approx((1 / 10) * (2 / 11) * (3 / 12), rel=1e-4)
