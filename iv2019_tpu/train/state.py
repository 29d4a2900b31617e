"""Train state: params, norm statistics, optimizer state, EMA shadow.

The EMA subsystem reproduces ``tf.train.ExponentialMovingAverage(decay,
num_updates=global_step, zero_debias=True)`` over model variables except the
BatchNorm moving statistics (reference define_estimator_hierarchical.py:96-111):

- effective decay_t = min(decay, (1 + t) / (10 + t))
- biased shadow:  s <- s - (1 - decay_t) * (s - v),  s_0 = 0
- zero-debias:    v_ema = s / (1 - prod_t decay_t)

(TF approximates the debias denominator with ``pow(decay_t, t)``; we track
the exact running product — identical for constant decay, strictly more
correct while ``num_updates`` ramps.)

As a plain pytree the EMA survives sharding, checkpointing and restore with
no special cases — none of the reference's under-distribution restrictions
(system_factory.py:236-238) apply.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

__all__ = ["EmaState", "TrainState", "create_train_state"]


class EmaState(struct.PyTreeNode):
    biased: Any  # shadow pytree (zero-initialized)
    decay_product: jnp.ndarray  # prod_t decay_t, scalar f32

    @classmethod
    def create(cls, params):
        return cls(
            biased=jax.tree.map(jnp.zeros_like, params),
            decay_product=jnp.asarray(1.0, jnp.float32),
        )

    def update(self, params, step, base_decay: float) -> "EmaState":
        t = step.astype(jnp.float32)
        decay = jnp.minimum(base_decay, (1.0 + t) / (10.0 + t))
        biased = jax.tree.map(
            lambda s, v: s - (1.0 - decay) * (s - v.astype(s.dtype)),
            self.biased,
            params,
        )
        return EmaState(biased=biased, decay_product=self.decay_product * decay)

    def debiased(self, fallback=None):
        """Zero-debiased EMA parameters (use for eval/predict with --restore_emas)."""
        denom = 1.0 - self.decay_product
        safe = jnp.maximum(denom, 1e-12)
        out = jax.tree.map(lambda s: s / safe, self.biased)
        if fallback is not None:
            # before any update the shadow is all-zero; fall back to raw params
            out = jax.tree.map(
                lambda e, f: jnp.where(denom > 0, e, f), out, fallback
            )
        return out


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    ema: Optional[EmaState]

    def apply_gradients(self, grads, tx: optax.GradientTransformation, ema_decay: float):
        updates, new_opt_state = tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        new_step = self.step + 1
        new_ema = self.ema
        if new_ema is not None:
            # TF applies the EMA op in UPDATE_OPS, i.e. with the pre-increment
            # global step as num_updates
            new_ema = new_ema.update(new_params, self.step, ema_decay)
        return self.replace(
            step=new_step, params=new_params, opt_state=new_opt_state, ema=new_ema
        )


def create_train_state(
    variables, tx: optax.GradientTransformation, ema_decay: float
) -> TrainState:
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        ema=EmaState.create(params) if ema_decay > 0 else None,
    )


def create_fused_train_state(variables, fused_opt) -> TrainState:
    """TrainState for the fused flat-vector optimizer (train/fused_update.py).

    The EMA shadow lives inside the fused opt state; ``ema`` is None.
    """
    return TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=fused_opt.init(),
        ema=None,
    )
