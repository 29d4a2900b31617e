"""Fused residual-bottleneck Pallas kernel (inference / BN-folded).

One kernel owns a whole slim bottleneck unit (reference
resnet_v1.bottleneck — 1x1 conv -> BN -> relu -> 3x3 dilated conv -> BN ->
relu -> 1x1 conv -> BN -> +identity -> relu) for the stride-1 identity
units of the dilated trunk, with every BatchNorm folded into the conv
weights (eval/predict mode, running statistics).

Why a block-spanning kernel (VERDICT r3 next-1c, the "one untried lever"):
XLA cannot fuse conv->conv, so the unfused unit materializes both
mid-channel activations to HBM and re-reads x for the residual add —
~2.7x the fused kernel's HBM traffic per unit:

    unfused:  read x | write a1, read a1 | write a2, read a2 |
              write a3, read a3 + read x | write out
    fused:    read x | write out

At block3 flagship shapes ((N,64,128,1024), mid 256, rate 2) that is
~1.47 GB vs ~0.54 GB per unit for Nb=16. The catch — and the reason this
cannot help the TRAIN step — is the BatchNorm statistics barrier:
train-mode BN needs the full batch's post-conv moments before the relu,
so a fused train kernel must either materialize anyway (what XLA already
does) or recompute conv1+conv2 in a second sweep, whose FLOP cost
(~1.1 ms/unit at peak) exceeds the traffic saved (~0.4 ms/unit at the
measured 620 GB/s). In eval the stats are constants and fold away, so the
fusion is free of that tax.

Kernel structure (grid = (N, H/TH), one TH-row output stripe per step):

- x stays in HBM (`pl.ANY`); each step DMAs a (TH+2R)-row halo window
  into a double-buffered VMEM scratch (prefetch issued one step ahead, so
  the copy overlaps the previous stripe's MXU work). Halo rows outside
  the image are masked to zero *after* conv1 (zero-filling x would leak
  relu(b1) through the folded bias).
- conv1 (1x1) is one (rows*W, C) @ (C, M) MXU dot over the halo window.
- the dilated 3x3 is 9 tap-shifted (TH*W, M) @ (M, M) dots accumulated in
  f32 — H taps are static row slices of the halo window, W taps are
  static pad/slice sublane shifts (zero padding = conv2d_same, stride 1).
- conv3 (1x1) + folded bias + residual add (x re-read from the already
  resident halo window — no second HBM read) + final relu, written
  through the auto-pipelined output stripe.

All dots run in bf16 with f32 accumulation (`preferred_element_type`),
matching the trunk's compute dtype. Supported shapes are gated by
`fused_bottleneck_supported` (channel multiples of 128, VMEM budget);
block4 (C=2048, mid 512) exceeds the full-window VMEM budget and runs the
channel-tiled rolling-window variant `fused_bottleneck_ct` below instead.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "fused_bottleneck",
    "fused_bottleneck_supported",
    "fused_bottleneck_ct",
    "fused_bottleneck_ct_supported",
    "pick_ct_config",
    "fold_bn",
]

# VMEM budget for gating (bytes); v5e has ~16 MiB usable per core.
_VMEM_BUDGET = 14 * 1024 * 1024


def fold_bn(kernel, scale, bias, mean, var, epsilon=1e-5):
    """Fold an inference BatchNorm into the preceding conv.

    BN(conv(x)) = conv(x) * g + (beta - mean * g) with g = scale*rsqrt(var+eps)
    => kernel' = kernel * g (per output channel), bias' = beta - mean * g.
    Returns (kernel_folded_f32, bias_f32).
    """
    g = scale * jax.lax.rsqrt(var + epsilon)
    return kernel * g, bias - mean * g


def _vmem_bytes(th, r, w, c, m):
    rows = th + 2 * r
    xh = 2 * rows * w * c * 2          # double-buffered bf16 halo window
    y1 = rows * w * m * 2              # bf16 mid activation
    y2 = th * w * m * 4                # f32 tap accumulator
    wts = (c * m + 9 * m * m + m * c) * 2
    out = 2 * th * w * c * 2           # double-buffered output stripe
    return xh + y1 + y2 + wts + out


def fused_bottleneck_supported(n, h, w, c, m, rate, th=8):
    """Static gate: can the fused kernel run this identity unit?"""
    return (
        rate >= 1
        and c % 128 == 0
        and m % 128 == 0
        and w % 8 == 0
        and h % th == 0
        and h // th >= 2
        and h >= th + rate  # edge DMA branches assume one interior overlap
        and _vmem_bytes(th, rate, w, c, m) <= _VMEM_BUDGET
    )


def _shift_w(x, dw):
    """Shift a (rows, W, M) array along W by dw with zero fill.

    Output[w] = x[w + dw] (conv tap at offset dw), zeros where w+dw is
    outside [0, W) — conv2d_same zero padding.
    """
    if dw == 0:
        return x
    if dw > 0:
        return jnp.pad(x[:, dw:, :], ((0, 0), (0, dw), (0, 0)))
    return jnp.pad(x[:, :dw, :], ((0, 0), (-dw, 0), (0, 0)))


def _kernel(th, r, hh, x_hbm, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
            out_ref, xh, sem):
    n = pl.program_id(0)
    h = pl.program_id(1)
    n_h = pl.num_programs(1)
    rows = th + 2 * r

    def start_copy(nn_, hh_, slot):
        """DMA the halo window for stripe (nn_, hh_) into xh[slot].

        Three static-size branches keep xh[i] <-> logical row hh_*th - r + i
        aligned in every case; out-of-image rows are left as garbage and
        masked after conv1.
        """
        row0 = hh_ * th - r

        @pl.when(hh_ == 0)
        def _():
            pltpu.make_async_copy(
                x_hbm.at[nn_, pl.ds(0, th + r)],
                xh.at[slot, pl.ds(r, th + r)],
                sem.at[slot],
            ).start()

        @pl.when(jnp.logical_and(hh_ > 0, hh_ < n_h - 1))
        def _():
            pltpu.make_async_copy(
                x_hbm.at[nn_, pl.ds(row0, rows)],
                xh.at[slot, pl.ds(0, rows)],
                sem.at[slot],
            ).start()

        @pl.when(hh_ == n_h - 1)
        def _():
            pltpu.make_async_copy(
                x_hbm.at[nn_, pl.ds(row0, th + r)],
                xh.at[slot, pl.ds(0, th + r)],
                sem.at[slot],
            ).start()

    def wait_copy(hh_, slot):
        # wait on the same (possibly partial) transfer shape that was started
        @pl.when(jnp.logical_or(hh_ == 0, hh_ == n_h - 1))
        def _():
            pltpu.make_async_copy(
                x_hbm.at[0, pl.ds(0, th + r)],
                xh.at[slot, pl.ds(0, th + r)],
                sem.at[slot],
            ).wait()

        @pl.when(jnp.logical_and(hh_ > 0, hh_ < n_h - 1))
        def _():
            pltpu.make_async_copy(
                x_hbm.at[0, pl.ds(0, rows)],
                xh.at[slot, pl.ds(0, rows)],
                sem.at[slot],
            ).wait()

    g = n * n_h + h  # global stripe index drives the double-buffer parity
    slot = g % 2

    @pl.when(g == 0)
    def _():
        start_copy(n, h, slot)

    # prefetch the next stripe (possibly the next image's stripe 0)
    nxt = g + 1
    last = nxt >= pl.num_programs(0) * n_h

    @pl.when(jnp.logical_not(last))
    def _():
        start_copy(nxt // n_h, nxt % n_h, nxt % 2)

    wait_copy(h, slot)

    x_win = xh[slot]  # (rows, W, C) bf16; xh[i] <-> logical row h*th - r + i
    w = x_win.shape[1]
    c = x_win.shape[2]
    m = w1_ref.shape[1]

    # conv1: one MXU dot over the whole halo window, f32 accumulate
    y1 = jnp.dot(
        x_win.reshape(rows * w, c), w1_ref[...],
        preferred_element_type=jnp.float32,
    ) + b1_ref[...]
    y1 = jnp.maximum(y1, 0.0).reshape(rows, w, m)
    # zero halo rows outside the image (SAME zero padding for conv2)
    row0 = h * th - r
    logical = row0 + jax.lax.broadcasted_iota(jnp.int32, (rows, 1, 1), 0)
    y1 = jnp.where(
        jnp.logical_and(logical >= 0, logical < hh), y1, 0.0
    ).astype(jnp.bfloat16)

    # dilated 3x3 as 9 tap-shifted dots, f32 accumulation
    acc = jnp.zeros((th * w, m), jnp.float32)
    for ti, dh in enumerate((-r, 0, r)):
        rows_tap = y1[r + dh:r + dh + th]
        for tj, dw in enumerate((-r, 0, r)):
            tap = _shift_w(rows_tap, dw).reshape(th * w, m)
            acc += jnp.dot(
                tap, w2_ref[ti * 3 + tj],
                preferred_element_type=jnp.float32,
            )
    y2 = jnp.maximum(acc + b2_ref[...], 0.0).astype(jnp.bfloat16)

    # conv3 + folded bias + residual (x rows already resident) + final relu
    y3 = jnp.dot(y2, w3_ref[...], preferred_element_type=jnp.float32)
    y3 = y3 + b3_ref[...] + x_win[r:r + th].reshape(th * w, c).astype(
        jnp.float32
    )
    out_ref[0] = jnp.maximum(y3, 0.0).reshape(th, w, c).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("rate", "th", "interpret"))
def fused_bottleneck(x, w1, b1, w2, b2, w3, b3, *, rate, th=8,
                     interpret=None):
    """relu(x + conv1x1_3(relu(conv3x3_rate(relu(conv1x1_1(x)))))).

    x: (N,H,W,C) bf16; w1: (C,M) bf16; w2: (3,3,M,M) bf16 (dilation
    ``rate``, SAME); w3: (M,C) bf16; b*: f32 folded-BN biases. Returns
    (N,H,W,C) in x.dtype.
    """
    if interpret is None:
        # Mosaic needs a real TPU; tests exercise the kernel via interpreter
        interpret = jax.default_backend() not in ("tpu", "axon")
    n, hh, w, c = x.shape
    m = w1.shape[1]
    assert fused_bottleneck_supported(n, hh, w, c, m, rate, th), (
        (n, hh, w, c, m, rate, th)
    )
    r = rate
    rows = th + 2 * r

    weight_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    flops_unit = 2 * hh * w * (c * m + 9 * m * m + m * c)
    return pl.pallas_call(
        functools.partial(_kernel, th, r, hh),
        grid=(n, hh // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x: manual halo DMA
            weight_spec,  # w1
            weight_spec,  # b1
            weight_spec,  # w2 (9, M, M)
            weight_spec,  # b2
            weight_spec,  # w3
            weight_spec,  # b3
        ],
        out_specs=pl.BlockSpec(
            (1, th, w, c), lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, rows, w, c), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=n * flops_unit,
            bytes_accessed=2 * x.size * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        x.astype(jnp.bfloat16),
        w1.astype(jnp.bfloat16),
        b1.astype(jnp.float32).reshape(1, m),
        w2.astype(jnp.bfloat16).reshape(9, m, m),
        b2.astype(jnp.float32).reshape(1, m),
        w3.astype(jnp.bfloat16),
        b3.astype(jnp.float32).reshape(1, c),
    )


# ---------------------------------------------------------------------------
# Channel-tiled rolling-window variant (block4: C=2048, M=512, rate=4).
#
# The full-window kernel above keeps the (rows, W, C) x halo resident, which
# at C=2048 alone exceeds VMEM. This variant restructures the unit so VMEM
# holds only M-width state:
#
# - grid (N, H/TH, C/CT), iterated ct-fastest (TPU grids are sequential);
# - a y1 RING buffer (TH+2R rows, W, M) rolls down the image: each stripe
#   shifts it by TH rows and conv1-computes only the TH new rows — NO conv1
#   halo recompute (the full-window kernel recomputes conv1 on halo rows,
#   which at block4's C=2048 would cost more FLOPs than the fusion saves);
# - conv1 reduces over C in CT-wide tiles: x tiles are manually DMA'd
#   (double-buffered) and accumulated in one f32 (TH*W, M) accumulator;
# - conv2 (9 tap dots) runs once per stripe (at ct==0) into a y2 scratch
#   that persists across the stripe's ct steps;
# - conv3 + folded bias + residual + relu stream per CT tile: x residual
#   tiles and output tiles ride Pallas' automatic pipeline.
#
# HBM traffic per block4 unit image: read x twice (conv1 + residual) +
# write out = ~100 MB vs ~134 MB for the XLA-fused unfused graph — the
# y1/y2 mid activations (2x 16.8 MB round trips) never touch HBM.
# ---------------------------------------------------------------------------


def _ct_vmem_bytes(th, r, w, c, m, ct):
    ring = (th + 2 * r) * w * m * 2
    acc = th * w * m * 4
    y2 = th * w * m * 2
    xt = 2 * th * w * ct * 2           # conv1 input tiles, double-buffered
    xres = 2 * th * w * ct * 2         # auto-pipelined residual tiles
    out = 2 * th * w * ct * 2          # auto-pipelined output tiles
    wts = (c * m + 9 * m * m + m * c) * 2 + (m + c) * 4
    return ring + acc + y2 + xt + xres + out + wts


def fused_bottleneck_ct_supported(n, h, w, c, m, rate, th=4, ct=128):
    """Static gate for the channel-tiled rolling kernel."""
    return (
        rate >= 1
        and th >= rate            # last stripe's new-row count (th - r) >= 0
        and c % ct == 0
        and ct % 128 == 0
        and m % 128 == 0
        and w % 8 == 0
        and h % th == 0
        and h // th >= 2
        and h >= th + rate        # warmup computes th + r rows
        and _ct_vmem_bytes(th, rate, w, c, m, ct) <= _VMEM_BUDGET
    )


def pick_ct_config(n, h, w, c, m, rate):
    """Largest (th, ct) the VMEM gate admits, or None."""
    for th in (8, 4):
        for ct in (512, 256, 128):
            if fused_bottleneck_ct_supported(n, h, w, c, m, rate, th, ct):
                return th, ct
    return None


def _ct_kernel(th, r, ct, hh, x_hbm, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref,
               b3_ref, xres_ref, out_ref, ring, acc, y2, xt, sem):
    n = pl.program_id(0)
    h = pl.program_id(1)
    c_idx = pl.program_id(2)
    n_h = pl.num_programs(1)
    n_ct = pl.num_programs(2)
    w = ring.shape[1]
    m = ring.shape[2]

    def conv1_rows(row0, nrows, dst_row):
        """conv1 for x rows [row0, row0+nrows) -> ring[dst_row:+nrows].

        nrows is static (<= th). C-tile reduction with double-buffered
        manual DMA; w1 is pre-tiled (n_ct, CT, M) so tile selection is a
        cheap leading-dim index.
        """

        def start(i, slot):
            pltpu.make_async_copy(
                x_hbm.at[n, pl.ds(row0, nrows), :, pl.ds(i * ct, ct)],
                xt.at[slot, pl.ds(0, nrows)],
                sem.at[slot],
            ).start()

        def wait(slot):
            pltpu.make_async_copy(
                x_hbm.at[0, pl.ds(0, nrows), :, pl.ds(0, ct)],
                xt.at[slot, pl.ds(0, nrows)],
                sem.at[slot],
            ).wait()

        start(0, 0)
        acc[pl.ds(0, nrows * w)] = jnp.broadcast_to(
            b1_ref[...].astype(jnp.float32), (nrows * w, m)
        )

        def body(i, _):
            @pl.when(i + 1 < n_ct)
            def _():
                start(i + 1, (i + 1) % 2)

            wait(i % 2)
            acc[pl.ds(0, nrows * w)] += jnp.dot(
                xt[i % 2, pl.ds(0, nrows)].reshape(nrows * w, ct),
                w1_ref[i],
                preferred_element_type=jnp.float32,
            )
            return 0

        jax.lax.fori_loop(0, n_ct, body, 0, unroll=False)
        ring[pl.ds(dst_row, nrows)] = (
            jnp.maximum(acc[pl.ds(0, nrows * w)], 0.0)
            .reshape(nrows, w, m)
            .astype(jnp.bfloat16)
        )

    @pl.when(c_idx == 0)
    def _stripe_head():
        @pl.when(h == 0)
        def _warmup():
            # ring rows [0, r) are logical rows [-r, 0): zero (SAME padding)
            ring[pl.ds(0, r)] = jnp.zeros((r, w, m), jnp.bfloat16)
            conv1_rows(0, th, r)
            conv1_rows(th, r, r + th)

        @pl.when(jnp.logical_and(h > 0, h < n_h - 1))
        def _roll():
            # shift the window down by th rows (read-then-write: overlap-safe)
            keep = ring[pl.ds(th, 2 * r)]
            ring[pl.ds(0, 2 * r)] = keep
            conv1_rows(h * th + r, th, 2 * r)

        @pl.when(h == n_h - 1)
        def _tail():
            keep = ring[pl.ds(th, 2 * r)]
            ring[pl.ds(0, 2 * r)] = keep
            if th > r:  # static: new rows that are still inside the image
                conv1_rows(h * th + r, th - r, 2 * r)
            # logical rows >= H: zero (SAME padding)
            ring[pl.ds(th + r, r)] = jnp.zeros((r, w, m), jnp.bfloat16)

        # conv2: dilated 3x3 as 9 tap-shifted dots over the ring
        acc2 = jnp.zeros((th * w, m), jnp.float32)
        for ti, dh in enumerate((-r, 0, r)):
            rows_tap = ring[pl.ds(r + dh, th)]
            for tj, dw in enumerate((-r, 0, r)):
                tap = _shift_w(rows_tap, dw).reshape(th * w, m)
                acc2 += jnp.dot(
                    tap, w2_ref[ti * 3 + tj],
                    preferred_element_type=jnp.float32,
                )
        y2[...] = jnp.maximum(acc2 + b2_ref[...], 0.0).astype(jnp.bfloat16)

    # conv3 tile + folded bias + residual + final relu (every ct step)
    y3 = jnp.dot(y2[...], w3_ref[c_idx], preferred_element_type=jnp.float32)
    y3 = y3 + b3_ref[c_idx] + xres_ref[0].reshape(th * w, ct).astype(
        jnp.float32
    )
    out_ref[0] = jnp.maximum(y3, 0.0).reshape(th, w, ct).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("rate", "th", "ct", "interpret"))
def fused_bottleneck_ct(x, w1, b1, w2, b2, w3, b3, *, rate, th=4, ct=128,
                        interpret=None):
    """Channel-tiled rolling-window fused bottleneck (same math as
    ``fused_bottleneck``; admits block4's C=2048 where the full-window
    kernel exceeds VMEM). Args as ``fused_bottleneck``."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    n, hh, w, c = x.shape
    m = w1.shape[1]
    assert fused_bottleneck_ct_supported(n, hh, w, c, m, rate, th, ct), (
        (n, hh, w, c, m, rate, th, ct)
    )
    r = rate
    n_ct = c // ct

    weight_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    flops_unit = 2 * hh * w * (c * m + 9 * m * m + m * c)
    return pl.pallas_call(
        functools.partial(_ct_kernel, th, r, ct, hh),
        grid=(n, hh // th, n_ct),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x: manual conv1 tile DMA
            weight_spec,  # w1 (n_ct, CT, M)
            weight_spec,  # b1 (1, M)
            weight_spec,  # w2 (9, M, M)
            weight_spec,  # b2 (1, M)
            weight_spec,  # w3 (n_ct, M, CT)
            weight_spec,  # b3 (n_ct, 1, CT)
            pl.BlockSpec(  # x again: auto-pipelined residual tiles
                (1, th, w, ct), lambda i, j, k: (i, j, 0, k),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, th, w, ct), lambda i, j, k: (i, j, 0, k),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * r, w, m), jnp.bfloat16),  # y1 ring
            pltpu.VMEM((th * w, m), jnp.float32),          # conv1 accumulator
            pltpu.VMEM((th * w, m), jnp.bfloat16),         # y2 (per stripe)
            pltpu.VMEM((2, th, w, ct), jnp.bfloat16),      # conv1 x tiles
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=n * flops_unit,
            bytes_accessed=3 * x.size * 2,  # x twice + out once
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        x.astype(jnp.bfloat16),
        w1.astype(jnp.bfloat16).reshape(n_ct, ct, m),
        b1.astype(jnp.float32).reshape(1, m),
        w2.astype(jnp.bfloat16).reshape(9, m, m),
        b2.astype(jnp.float32).reshape(1, m),
        w3.astype(jnp.bfloat16).reshape(m, n_ct, ct).swapaxes(0, 1),
        b3.astype(jnp.float32).reshape(n_ct, 1, ct),
        x.astype(jnp.bfloat16),
    )
