"""Training-mode batch norm with a hand-written (classic fused) backward.

Forward math is identical to flax ``nn.BatchNorm`` with
``use_fast_variance=True`` (reference parity: tf.contrib.layers.batch_norm,
decay=0.9, epsilon=1e-5 — see models/layers.Norm): per-channel
``mean = E[x]``, ``var = max(0, E[x^2] - E[x]^2)``,
``y = (x - mean) * rsqrt(var + eps) * scale + bias``.

The *backward* replaces autodiff-through-the-stats-graph with the classic
two-reduction formulation

    dbeta  = sum(g)
    dgamma = sum(g * xhat)
    dx     = scale * rstd * (g - dbeta/m - xhat * dgamma/m)

Why this matters on TPU: autodiff through flax's ``max(0, E[x^2]-E[x]^2)``
produces a thicket of eq/select/div ops plus separate cotangent paths through
E[x] and E[x^2] — on the flagship model XLA fuses five f32[C] reductions and
the select chains into every 1x1-conv backward fusion (see
docs/PERFORMANCE.md round-2 profile; those fusions run at 2.8-3.6x their
forward cost where 3x3 convs run at 2.1x). The fused form needs exactly two
reductions over (g, xhat) and one elementwise pass for dx, all in the convs'
native layouts (no Pallas, no layout boundary).

Gradient-parity caveat (tested): the formulas are algebraically identical to
the autodiff gradients wherever the ``max(0, .)`` clamp is inactive, i.e.
whenever the batch variance is positive. A clamped channel (constant input)
is a measure-zero event where autodiff picks the subgradient through the
clamp; we pick the unclamped branch.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["batch_norm_train", "batch_stats"]


def batch_stats(x):
    """flax-identical batch statistics over all non-channel axes (f32).

    mean = E[x], var = max(0, E[x^2] - E[x]^2) — the ``use_fast_variance``
    single-pass form, so fused and flax paths see bit-identical stats.
    """
    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(x, axis=axes)
    mean2 = jnp.mean(jnp.square(x), axis=axes)
    var = jnp.maximum(0.0, mean2 - jnp.square(mean))
    return mean, var


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def batch_norm_train(x, scale, bias, epsilon):
    """Normalize ``x`` by its own batch statistics; classic fused backward.

    Returns ``(y, mean, var)``; mean/var feed the running-average update
    (non-differentiated — their cotangents are assumed zero, which holds
    because flax-style running stats live in a mutable 'batch_stats'
    collection outside the grad).
    """
    mean, var = batch_stats(x)
    rstd = jax.lax.rsqrt(var + epsilon)
    y = (x - mean) * (rstd * scale) + bias
    return y, mean, var


def _fwd(x, scale, bias, epsilon):
    mean, var = batch_stats(x)
    rstd = jax.lax.rsqrt(var + epsilon)
    y = (x - mean) * (rstd * scale) + bias
    return (y, mean, var), (x, mean, rstd, scale)


def _bwd(epsilon, res, cotangents):
    g, _g_mean, _g_var = cotangents  # stats outputs feed non-diff state only
    x, mean, rstd, scale = res
    m = x.size // x.shape[-1]
    axes = tuple(range(x.ndim - 1))
    xhat = (x - mean) * rstd
    dbeta = jnp.sum(g, axis=axes)
    dgamma = jnp.sum(g * xhat, axis=axes)
    dx = (scale * rstd) * (g - dbeta / m - xhat * (dgamma / m))
    return dx, dgamma, dbeta


batch_norm_train.defvjp(_fwd, _bwd)
