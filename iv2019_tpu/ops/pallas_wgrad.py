"""Pallas TPU kernel: weight gradient of the 7x7/stride-2 root convolution.

Why this exists (VERDICT r3 task #1): the per-op roofline audit
(tools/roofline_audit.py, docs/PERFORMANCE.md) puts the whole residual gap
of the train step inside XLA's conv *backward* emitters, with the root-conv
wgrad the worst single op at ~5.5x its achievable floor. Every from-outside
lever (dot reformulations, flags) is a measured dead end; this kernel is
the from-inside test: a hand-written wgrad that either beats the emitter
(real milliseconds) or shows the audited floor is loose.

The op (reference root conv: resnet50_extended_feature_extractor.py:22-30,
slim conv2d_same 7x7 stride 2 -> here models/resnet.py ConvSame):

    dW[kh,kw,c,o] = sum_{n,oh,ow} x[n, 2*oh+kh-3, 2*ow+kw-3, c] * dy[n,oh,ow,o]

Design (TPU-first, no gathers, no in-kernel relayouts):
- Host-side prep (cheap, vectorizable pads/reshape views only — NO
  transpose; the measured s2d transpose costs milliseconds, a pad does not):
  pad x by (3 top/left, 5 bottom/right) to even dims, then view as
  (N, Hp/2, 2, Wp/2, 6) where the trailing 6 = (w-phase, channel). Under
  this phase decomposition every tap (kh,kw,c) of the stride-2 conv becomes
  a STATIC CONTIGUOUS slice: h-block = oh + kh//2 (phase kh%2), w-block =
  ow + kw//2 (phase kw%2), channel c.
- Kernel grid (N, OH/OT): 12 strided DMAs pull the (h-phase, w-phase,
  channel) planes for the tile into VMEM as (OT+4, OWp) buffers (W on
  lanes — the C=3-minor layout never exists on chip, so no 128-lane
  padding waste).
- The 147-tap LHS (OT, 147, OW) is assembled from static slices of those
  12 planes, then one batched MXU contraction per tile
  (OT x [147, OW] @ [OW, Cout], f32 accumulation across the whole grid in
  a resident VMEM accumulator).

Returns dW as (7*7*3, Cout) -> reshaped (7,7,3,Cout) by the caller wrapper.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["root_conv_wgrad", "root_conv_wgrad_reference"]


def root_conv_wgrad_reference(x, dy, kernel_size: int = 7, stride: int = 2):
    """Oracle: XLA's own wgrad (the VJP of the conv w.r.t. its weights)."""
    k = kernel_size

    def fwd(w):
        return _conv_same(x, w, stride)

    w0 = jnp.zeros((k, k, x.shape[-1], dy.shape[-1]), jnp.float32)
    _, vjp = jax.vjp(fwd, w0)
    return vjp(dy.astype(jnp.float32))[0]


def _conv_same(x, w, stride: int):
    """conv2d_same semantics (models/layers.py ConvSame: symmetric
    (keff-1)//2 padding, which for odd k equals SAME with explicit pads)."""
    k = w.shape[0]
    pad = (k - 1) // 2
    return jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w,
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _wgrad_kernel(
    x6, dy_ref, out_ref, planes, sems, *, K: int, C: int, OT: int,
    OW: int, Cout: int, HB: int
):
    """One grid step: tile of OT output rows for one image.

    x6: (N, Hp2, 2, Wp2, KC) in HBM (KC = 2*C w-phase/channel planes)
    dy_ref: (1, OT, OW, Cout) VMEM block
    out_ref: (TAPS_PAD, Cout) f32 accumulation block — constant index map,
      so it stays VMEM-resident across every grid step
    planes: VMEM scratch (2, KC, OT + HB - 1, OWB) — DMA'd phase planes
    """
    n = pl.program_id(0)
    t = pl.program_id(1)
    first = jnp.logical_and(n == 0, t == 0)
    KC = 2 * C
    taps = K * K * C
    taps_pad = out_ref.shape[0]

    # --- DMA the 2*KC phase planes for this tile ---
    row0 = t * OT
    dmas = []
    for hp in range(2):
        for p in range(KC):
            dma = pltpu.make_async_copy(
                x6.at[n, pl.ds(row0, OT + HB - 1), hp, :, p],
                planes.at[hp, p],
                sems.at[hp * KC + p],
            )
            dma.start()
            dmas.append(dma)
    for dma in dmas:
        dma.wait()

    # --- assemble the (OT, taps, OW) LHS from static slices ---
    dy = dy_ref[0]  # (OT, OW, Cout)
    lhs_parts = []
    for kh in range(K):
        hp, dh = kh % 2, kh // 2
        for kw in range(K):
            wp, dw_ = kw % 2, kw // 2
            for c in range(C):
                p = wp * C + c
                # (OT, OW) static contiguous slice of the plane
                tap = planes[hp, p, dh : dh + OT, dw_ : dw_ + OW]
                lhs_parts.append(tap)
    lhs = jnp.stack(lhs_parts, axis=1)  # (OT, taps, OW)

    # --- batched MXU contraction over OW; sum batch on the VPU ---
    part = jax.lax.dot_general(
        lhs, dy,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (OT, taps, Cout)
    tile_dw = jnp.sum(part, axis=0)  # (taps, Cout)
    if taps_pad > taps:
        tile_dw = jnp.pad(tile_dw, ((0, taps_pad - taps), (0, 0)))

    @pl.when(first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += tile_dw


def root_conv_wgrad(
    x, dy, kernel_size: int = 7, stride: int = 2, ot: int = 32,
    interpret=None,
):
    """dW (k,k,C,Cout) f32 for a stride-2 'conv2d_same' conv via Pallas.

    x: (N, H, W, C) float/bf16, C small (root conv C=3)
    dy: (N, H//2, W//2, Cout)
    interpret: None = auto (interpreter off-TPU so CPU tests/eval work).
    """
    if interpret is None:
        # interpreter off-TPU (CPU tests/eval); the tunneled chip's backend
        # may be named 'axon' rather than 'tpu', so gate on cpu explicitly
        interpret = jax.default_backend() == "cpu"
    return _root_conv_wgrad(
        x, dy, kernel_size=kernel_size, stride=stride, ot=ot,
        interpret=bool(interpret),
    )


@functools.partial(jax.jit, static_argnames=("kernel_size", "stride", "ot", "interpret"))
def _root_conv_wgrad(
    x, dy, kernel_size: int = 7, stride: int = 2, ot: int = 32,
    interpret: bool = False,
):
    assert stride == 2, "kernel is specialized for the stride-2 root conv"
    K = int(kernel_size)
    N, H, W, C = x.shape
    _, OH, OW, Cout = dy.shape
    assert OH == H // 2 and OW == W // 2, (x.shape, dy.shape)
    pad = (K - 1) // 2  # conv2d_same symmetric padding (models/layers.py:142)

    # largest tile <= ot that divides OH (grid must cover OH exactly)
    OT = next(t for t in range(min(ot, OH), 0, -1) if OH % t == 0)
    HB = K // 2 + 1  # h-blocks touched per output row (kh//2 in [0, HB))

    # host-side: pad to phase-aligned dims; view with (w-phase, channel)
    # folded into the minor dim. All reshapes below are contiguous views.
    Hp = 2 * (OH + HB - 1)  # room for h-block oh + kh//2
    Wp = 2 * (OW + HB - 1)
    xp = jnp.pad(
        x, ((0, 0), (pad, Hp - H - pad), (pad, Wp - W - pad), (0, 0))
    )
    x6 = xp.reshape(N, Hp // 2, 2, Wp // 2, 2 * C)

    taps = K * K * C
    taps_pad = -(-taps // 8) * 8  # f32 sublane multiple
    grid = (N, OH // OT)

    out = pl.pallas_call(
        functools.partial(
            _wgrad_kernel, K=K, C=C, OT=OT, OW=OW, Cout=Cout, HB=HB
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x6 stays in HBM
            pl.BlockSpec(
                (1, OT, OW, Cout), lambda n, t: (n, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (taps_pad, Cout), lambda n, t: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((taps_pad, Cout), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 2 * C, OT + HB - 1, Wp // 2), x.dtype),
            pltpu.SemaphoreType.DMA((4 * C,)),
        ],
        interpret=interpret,
    )(x6, dy)
    return out[:taps].reshape(K, K, C, Cout)
