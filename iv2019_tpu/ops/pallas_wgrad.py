"""Pallas TPU kernel: weight gradient of the 7x7/stride-2 root convolution.

Why this exists (VERDICT r2 task #1): the per-op roofline audit
(tools/roofline_audit.py, docs/PERFORMANCE.md) puts the root-conv wgrad at
~5.5x its modeled floor inside XLA's conv-backward-filter emitter. Every
from-outside lever (dot reformulations, flags) is a measured dead end; this
kernel is the from-inside test: a hand-written wgrad that either beats the
emitter (real milliseconds) or shows the audited floor is loose.

The op (reference root conv: resnet50_extended_feature_extractor.py:22-30,
slim conv2d_same 7x7 stride 2 -> here models/resnet.py ConvSame):

    dW[kh,kw,c,o] = sum_{n,oh,ow} x[n, 2*oh+kh-3, 2*ow+kw-3, c] * dy[n,oh,ow,o]

Design, driven by what this Mosaic version actually supports (measured on
chip, docs/PERFORMANCE.md "root-wgrad kernel study"): no strided vector
slices, no bitwidth-changing bitcasts, no scatter-add, minor-split reshapes
crash — but dense DMAs, same-width bitcasts, shifts/masks, contiguous
slices, ref-slice writes, and 2-d dots all work. So:

- XLA prep (~0.2 ms, measured): pad each image to (Hp, Wc) = (2*OH+8,
  2*OW+8-ish), split channels, and pair adjacent W pixels into one i32
  (bitcast). Result: (C, N, Hp, L2) i32 planes, L2 = Wc/2, all dims
  8-aligned. No transposes of the (w, c)-interleaved minor dim — the
  XLA 12-plane phase transpose costs ~2.7 ms (measured), the pad+pair
  costs ~0.2 ms.
- Kernel grid (N, OH/OT): DMA C row-tiles (2*OT+8, L2) i32; un-pair the
  W pixels with a same-width bitcast trick (i32 << 16 -> f32 bits of the
  even bf16 lane; i32 & 0xFFFF0000 -> odd), giving 2*C parity planes as
  bf16 values with every tap a CONTIGUOUS slice (lane shift kw//2,
  sublane rows 2*oh+kh).
- im2row in VMEM scratch: lhsim[(kw,c)*8 + kh, oh*OW:(oh+1)*OW] =
  plane[2*oh+kh, s:s+OW], written as 8-row blocks (the 8th row is junk
  rows discarded at the end — keeps every ref write 8-sublane aligned).
- One 2-d MXU dot per tile: (168, OT*OW) @ (OT*OW, Cout), where the dy
  operand is the FREE (major+sublane merge) reshape of the (OT, OW, Cout)
  block. f32 accumulation in a VMEM-resident output block across the grid.

Measured at the flagship shape (16,512,1024,3)->(.,256,512,64), tunneled
v5e-class chip, dispatch overhead subtracted: this kernel ~1.2 ms vs XLA's
conv-backward-filter ~3.6 ms (2.5-3x); the audit floor of 0.41 ms ignores
the im2row data movement (~0.7 ms at VMEM copy bandwidth), so the true
achievable floor for this op is ~1.0-1.2 ms — the audit floor is loose by
~2.5x on this op. See docs/PERFORMANCE.md for the study.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["root_conv_wgrad", "root_conv_wgrad_reference", "wgrad_supported"]


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


def wgrad_supported(x_shape, dy_shape, kernel_size: int, stride: int) -> bool:
    """Shapes the kernel handles; callers fall back to XLA otherwise."""
    n, h, w, c = x_shape
    _, oh, ow, _ = dy_shape
    if stride != 2 or kernel_size % 2 == 0:
        return False
    if oh != h // 2 or ow != w // 2 or h % 2 or w % 2:
        return False
    if jax.default_backend() != "cpu" and ow % 128:
        # compiled path: im2row lane writes at oh*OW offsets must be
        # 128-lane aligned (the interpreter has no such constraint)
        return False
    # need an OT that divides OH, is a multiple of 4 (DMA row alignment),
    # and keeps the im2row scratch (<=16 rows) in VMEM
    return any(oh % t == 0 for t in (16, 8, 4))


def _lane_unpair(vi):
    """(R, L2) i32 -> even, odd (R, L2) bf16 lane planes.

    Little-endian pairing: bf16 lane 2l sits in the LOW 16 bits of i32
    lane l. f32 bits of a bf16 are (bits << 16), so a same-width i32->f32
    bitcast after shift/mask recovers the values exactly.
    """
    ev = jax.lax.bitcast_convert_type(jax.lax.shift_left(vi, 16), jnp.float32)
    od = jax.lax.bitcast_convert_type(
        jnp.bitwise_and(vi, jnp.int32(-65536)), jnp.float32)
    return ev.astype(jnp.bfloat16), od.astype(jnp.bfloat16)


def _wgrad_kernel_impl(xi, dy_ref, out_ref, tiles, lhsim, sems, *, K: int,
                       C: int, OT: int, OW: int, ROWS: int, L2: int):
    """One grid step: OT output rows of one image.

    xi: (C, N, Hp, L2) i32 in HBM (W-paired channel planes)
    dy_ref: (1, OT, OW, Cout) VMEM block
    out_ref: ((kw,c)-blocks of 8 rows, Cout) f32 — constant index map, so
      it stays VMEM-resident and accumulates across the whole grid
    tiles: VMEM scratch (C, ROWS, L2) i32 — DMA'd channel row-tiles
    lhsim: VMEM scratch (taps8, OT*OW) bf16 — the im2row matrix
    """
    n = pl.program_id(0)
    t = pl.program_id(1)
    first = jnp.logical_and(n == 0, t == 0)

    @pl.when(first)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    row0 = 2 * t * OT
    dmas = []
    for c in range(C):
        dma = pltpu.make_async_copy(
            xi.at[c, n, pl.ds(row0, ROWS), :], tiles.at[c], sems.at[c])
        dma.start()
        dmas.append(dma)
    for dma in dmas:
        dma.wait()

    for c in range(C):
        ev, od = _lane_unpair(tiles[c])
        for kw in range(K):
            j = kw * C + c
            plane = ev if kw % 2 == 0 else od
            s = kw // 2
            for oh in range(OT):
                lhsim[j * 8: j * 8 + 8, oh * OW:(oh + 1) * OW] = (
                    plane[2 * oh: 2 * oh + 8, s: s + OW])

    d = dy_ref[0].reshape(OT * OW, dy_ref.shape[3])  # free view
    part = jax.lax.dot_general(
        lhsim[...], d, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_ref[...] += part


def root_conv_wgrad(x, dy, kernel_size: int = 7, stride: int = 2,
                    ot: int = 16, interpret=None):
    """dW (k,k,C,Cout) f32 for a stride-2 'conv2d_same' conv via Pallas.

    x: (N, H, W, C) bf16/f32, C small (root conv C=3)
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


@functools.partial(
    jax.jit, static_argnames=("kernel_size", "stride", "ot", "interpret"))
def _root_conv_wgrad(x, dy, kernel_size: int = 7, stride: int = 2,
                     ot: int = 16, interpret: bool = False):
    assert stride == 2, "kernel is specialized for the stride-2 root conv"
    K = int(kernel_size)
    N, H, W, C = x.shape
    _, OH, OW, Cout = dy.shape
    assert OH == H // 2 and OW == W // 2, (x.shape, dy.shape)
    pad = (K - 1) // 2

    OT = next(t for t in (16, 8, 4) if OH % t == 0 and t <= max(4, ot))
    ROWS = 2 * OT + 8

    # --- XLA prep: pad, channel-split, W-pair into i32 ---
    # rows: tap rows 2*oh+kh-pad -> [0, 2*OH+2*pad-2]; plus DMA tiles of
    # ROWS rows at offset 2*t*OT -> need Hp >= 2*OH+8 (junk rows are read
    # but never used when K < 9)
    Hp = 2 * OH + 8
    # bf16 lanes: tap lane 2*ow+kw-pad -> [0, 2*OW+2*pad-2]; pair to i32
    # lanes L2, 128-aligned (Mosaic DMA slice shapes on the lane dim must
    # match the (8,128) tiling)
    L2 = ((OW + pad) + 127) // 128 * 128
    Wc = 2 * L2
    xp = jnp.pad(
        x.astype(jnp.bfloat16),
        ((0, 0), (pad, Hp - H - pad), (pad, Wc - W - pad), (0, 0)))
    # (N, Hp, Wc, C) -> (C, N, Hp, L2) i32: pair adjacent W pixels
    xcs = jnp.stack([xp[..., c] for c in range(C)], axis=0)
    xi = jax.lax.bitcast_convert_type(
        xcs.reshape(C, N, Hp, L2, 2), jnp.int32)

    taps8 = K * C * 8  # (kw, c) blocks of 8 rows (kh 0..K-1 + junk)
    grid = (N, OH // OT)

    out = pl.pallas_call(
        functools.partial(
            _wgrad_kernel_impl, K=K, C=C, OT=OT, OW=OW, ROWS=ROWS, L2=L2),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # xi stays in HBM
            pl.BlockSpec((1, OT, OW, Cout), lambda n, t: (n, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((taps8, Cout), lambda n, t: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((taps8, Cout), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((C, ROWS, L2), jnp.int32),       # DMA'd channel tiles
            pltpu.VMEM((taps8, OT * OW), jnp.bfloat16),  # im2row
            pltpu.SemaphoreType.DMA((C,)),
        ],
        interpret=interpret,
    )(xi, dy.astype(jnp.bfloat16))

    # rows (kw*C + c)*8 + kh -> dW[kh, kw, c]
    idx = np.zeros((K, K, C), np.int32)
    for kh in range(K):
        for kw in range(K):
            for c in range(C):
                idx[kh, kw, c] = (kw * C + c) * 8 + kh
    return out[idx.reshape(-1)].reshape(K, K, C, Cout)
