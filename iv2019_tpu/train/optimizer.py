"""Optimizer and learning-rate schedules (optax).

Parity with reference define_optimizer.py:3-26:
- piecewise-constant LR over *step* boundaries (epoch boundaries are
  converted by Settings.finalize(), reference system_factory.py:213-233);
  TF semantics: value i applies while boundaries[i-1] < step <= boundaries[i]
- polynomial decay: (lr0 - end) * (1 - step/N)^power + end, step clamped
- SGD / SGD-momentum (optionally Nesterov); L2 regularization enters through
  the loss (reference adds it to the total loss, not decoupled weight decay)
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import optax

from iv2019_tpu.config import Settings

__all__ = ["make_learning_rate_fn", "make_optimizer"]


def make_learning_rate_fn(settings: Settings) -> Callable:
    if settings.learning_rate_schedule == "piecewise_constant":
        boundaries = jnp.asarray(settings.learning_rate_boundaries_steps, jnp.int32)
        values = jnp.asarray(settings.learning_rate_values_resolved, jnp.float32)

        def lr_fn(step):
            idx = jnp.sum(step > boundaries)  # step == boundary keeps left value
            return values[idx]

        return lr_fn

    if settings.learning_rate_schedule == "polynomial_decay":
        lr0 = settings.learning_rate_initial
        end = settings.learning_rate_final
        power = settings.learning_rate_power
        n = max(settings.num_training_steps, 1)

        def lr_fn(step):
            frac = jnp.clip(step.astype(jnp.float32) / n, 0.0, 1.0)
            return (lr0 - end) * (1.0 - frac) ** power + end

        return lr_fn

    raise ValueError(f"unknown learning_rate_schedule {settings.learning_rate_schedule}")


def make_optimizer(settings: Settings) -> tuple[optax.GradientTransformation, Callable]:
    lr_fn = make_learning_rate_fn(settings)
    if settings.optimizer == "SGDM":
        tx = optax.sgd(
            learning_rate=lr_fn,
            momentum=settings.momentum,
            nesterov=settings.use_nesterov,
        )
    elif settings.optimizer == "SGD":
        tx = optax.sgd(learning_rate=lr_fn)
    else:
        raise ValueError(f"unknown optimizer {settings.optimizer}")
    return tx, lr_fn
