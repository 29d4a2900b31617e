"""Fused flat-vector optimizer update: SGD(M) + weight decay + EMA in O(1) kernels.

XLA emits one fusion per parameter tensor for the optimizer update and one
reduce per kernel for the L2 regularization term — ~60 kernels/step for
ResNet-50's 161 parameter arrays. On TPU (and especially on this
environment, where per-kernel launch overhead is several ms) that costs more
than the math. This module flattens the gradient/parameter pytrees into one
contiguous f32 vector and performs

    g' = g + wd * w                  (L2 regularization gradient)
    m  = g' + mu * m                 (momentum; Nesterov optional)
    w  = w - lr * m
    s  = s - (1 - d_t) * (s - w)     (EMA shadow, TF semantics)

as a single fused elementwise pass, plus one reduce for the regularization
metric. Mathematically identical to the loss-based L2 + optax.sgd path
(TF create_train_op minimizes data_loss + wd*||w||^2/2, so the gradient it
feeds MomentumOptimizer is exactly g + wd*w).

BatchNorm scale/bias are regularized by neither the reference (slim
regularizes conv ``weights`` only) nor us: a static 0/1 weight-decay mask
over the flat vector selects kernel entries.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.flatten_util import ravel_pytree

from iv2019_tpu.config import Settings
from iv2019_tpu.train.optimizer import make_learning_rate_fn

__all__ = ["FusedOptState", "FusedSGDM", "make_weight_decay_mask"]


def make_weight_decay_mask(params: Any) -> np.ndarray:
    """Flat 0/1 f32 mask: 1 for 'kernel' leaves (conv/dense weights)."""
    mask_tree = jax.tree_util.tree_map_with_path(
        lambda path, leaf: np.full(
            leaf.shape,
            1.0 if getattr(path[-1], "key", None) == "kernel" else 0.0,
            np.float32,
        ),
        params,
    )
    flat, _ = ravel_pytree(mask_tree)
    return np.asarray(flat, np.float32)


class FusedOptState(struct.PyTreeNode):
    momentum: jnp.ndarray  # flat f32
    ema_biased: jnp.ndarray  # flat f32 (zeros when ema disabled)
    ema_decay_product: jnp.ndarray  # scalar f32


class FusedSGDM:
    """Flat-vector SGD(M) + weight decay + TF-semantics EMA."""

    def __init__(self, settings: Settings, params_template: Any):
        self.lr_fn = make_learning_rate_fn(settings)
        self.momentum = settings.momentum if settings.optimizer == "SGDM" else 0.0
        self.nesterov = settings.use_nesterov
        self.weight_decay = settings.regularization_weight
        self.ema_decay = settings.ema_decay
        flat, self.unravel = ravel_pytree(params_template)
        self.num_params = flat.size
        self.wd_mask = jnp.asarray(make_weight_decay_mask(params_template))

    def init(self) -> FusedOptState:
        # distinct buffers: the train step donates the whole state and XLA
        # rejects donating one buffer twice
        return FusedOptState(
            momentum=jnp.zeros((self.num_params,), jnp.float32),
            ema_biased=jnp.zeros((self.num_params,), jnp.float32),
            ema_decay_product=jnp.asarray(1.0, jnp.float32),
        )

    def update(self, grads: Any, opt_state: FusedOptState, params: Any, step):
        """Returns (new_params, new_opt_state, reg_loss_metric)."""
        g, _ = ravel_pytree(grads)
        w, _ = ravel_pytree(params)
        g = g.astype(jnp.float32)
        w = w.astype(jnp.float32)

        wd_w = self.wd_mask * w
        g = g + self.weight_decay * wd_w
        m = g + self.momentum * opt_state.momentum
        if self.nesterov:
            upd = g + self.momentum * m
        else:
            upd = m
        lr = self.lr_fn(step)
        w_new = w - lr * upd

        if self.ema_decay > 0:
            t = step.astype(jnp.float32)
            d = jnp.minimum(self.ema_decay, (1.0 + t) / (10.0 + t))
            ema = opt_state.ema_biased - (1.0 - d) * (opt_state.ema_biased - w_new)
            prod = opt_state.ema_decay_product * d
        else:
            ema = opt_state.ema_biased
            prod = opt_state.ema_decay_product

        reg = 0.5 * self.weight_decay * jnp.sum(wd_w * w)
        new_state = FusedOptState(momentum=m, ema_biased=ema, ema_decay_product=prod)
        return self.unravel(w_new), new_state, reg

    def ema_params(self, opt_state: FusedOptState, fallback_params: Any) -> Any:
        """Zero-debiased EMA parameters as a pytree (for --restore_emas)."""
        denom = 1.0 - opt_state.ema_decay_product
        flat_fb, _ = ravel_pytree(fallback_params)
        flat = jnp.where(
            denom > 0,
            opt_state.ema_biased / jnp.maximum(denom, 1e-12),
            flat_fb.astype(jnp.float32),
        )
        return self.unravel(flat)
