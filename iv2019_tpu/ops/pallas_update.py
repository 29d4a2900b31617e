"""Pallas TPU kernel: fused SGDM + weight-decay + EMA parameter update.

One VMEM-tiled pass over the flat parameter vector computing

    g' = g + wd * (mask * w)
    m' = g' + mu * m
    w' = w - lr * (g' + mu * m')   (Nesterov)  |  w - lr * m'   (plain)
    s' = s - (1 - decay) * (s - w')
    partial_reg[i] = sum(mask * w * w) over the tile

with scalars (lr, decay) prefetched to SMEM. Guarantees the 4-in/3-out
single-pass data movement XLA sometimes splits across fusions; tiles of
512x128 f32 keep 7 buffers < 2 MB VMEM with the implicit double-buffered
pipeline fetching the next tile during compute.

Falls back to interpreter mode off-TPU so the same code path is unit-tested
on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_update_pallas", "pad_to_tile", "TILE"]

TILE = 512 * 128  # f32 elements per grid step (~256 KB per operand buffer)


def pad_to_tile(n: int) -> int:
    return -(-n // TILE) * TILE


def _kernel(scalars_ref, w_ref, g_ref, m_ref, s_ref, mask_ref,
            w_out, m_out, s_out, reg_out, *, momentum, weight_decay, nesterov):
    lr = scalars_ref[0]
    decay = scalars_ref[1]
    i = pl.program_id(0)
    w = w_ref[:]
    g = g_ref[:].astype(jnp.float32)
    m = m_ref[:]
    s = s_ref[:]
    mask = mask_ref[:]

    wd_w = mask * w
    g = g + weight_decay * wd_w
    m_new = g + momentum * m
    upd = g + momentum * m_new if nesterov else m_new
    w_new = w - lr * upd
    s_new = s - (1.0 - decay) * (s - w_new)

    w_out[:] = w_new
    m_out[:] = m_new
    s_out[:] = s_new
    # sequential grid on TPU: accumulate the regularization sum across steps
    @pl.when(i == 0)
    def _():
        reg_out[0, 0] = 0.0

    reg_out[0, 0] += jnp.sum(wd_w * w)


@functools.partial(
    jax.jit, static_argnames=("momentum", "weight_decay", "nesterov", "interpret")
)
def fused_update_pallas(
    w, g, m, s, mask, lr, ema_decay, *,
    momentum: float, weight_decay: float, nesterov: bool = False,
    interpret: bool = False,
):
    """All vectors f32 (N,) with N % TILE == 0 (see pad_to_tile).

    Returns (w', m', s', reg) where reg = sum(mask * w^2) (pre-update).
    """
    n = w.shape[0]
    assert n % TILE == 0, f"pad to a multiple of {TILE} (got {n})"
    grid = (n // TILE,)
    scalars = jnp.stack([lr.astype(jnp.float32), ema_decay.astype(jnp.float32)])

    # index maps receive the prefetched scalar ref as an extra argument
    vec_spec = pl.BlockSpec((TILE,), lambda i, _s: (i,), memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _kernel, momentum=momentum, weight_decay=weight_decay, nesterov=nesterov
    )
    w2, m2, s2, regs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[vec_spec] * 5,
            out_specs=[
                vec_spec,
                vec_spec,
                vec_spec,
                pl.BlockSpec((1, 1), lambda i, _s: (0, 0), memory_space=pltpu.SMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n,), jnp.float32),
            jax.ShapeDtypeStruct((n,), jnp.float32),
            jax.ShapeDtypeStruct((n,), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(scalars, w, g, m, s, mask)
    return w2, m2, s2, regs[0, 0]
