"""Pallas-fused hierarchical loss: x8 upsample + softmax CE + decision gates.

The reference computes the paper's loss on logits bilinearly upsampled to the
input resolution (model upsampler resnet50_extended_model_hierarchical.py:
143-184 feeding define_losses_hierarchical.py:14-217). Materializing those
full-resolution f32 logit tensors costs ~800 MB of HBM traffic per step plus
the CE/gate elementwise passes on lane-hostile (C=14/7/3) tensors.

This kernel never materializes them: a grid over (image, row-tile) upsamples
the stride-8 logits tile-by-tile in VMEM (two small MXU matmuls per channel
with trace-time TF1 align_corners interpolation matrices — bit-identical to
ops/resize.resize_bilinear_mxu), computes log-softmax, the three CE terms,
the decision-gated weak weights, and the fused hierarchical decisions, and
writes only per-cell partial sums + the int32 decision maps. The custom VJP
recomputes per tile and accumulates gradients directly at stride 8.

Semantics are the reference's exactly (verified against the TF oracle via
losses/hierarchical.define_losses in tests/test_fused_loss.py):

- L1: sparse softmax CE on the per-pixel slice, void masked (:131-137)
- L2 vehicle/human: dense CE over the whole batch; weights = per-pixel
  non-void | (not-void-weak & l1_decision==metaclass & gt-agrees) (:149-187)
- gates and labels carry no gradient (argmax / comparisons)
- weighted-loss reduction SUM_BY_NONZERO_WEIGHTS (weights here are binary)
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from iv2019_tpu.ops.resize import _bilinear_matrix
from iv2019_tpu.problem.taxonomy import Taxonomy

__all__ = ["make_fused_hierarchical_loss", "fused_loss_available"]


def _pick_tile(h_out: int, w_out: int, n_slices: int):
    """Largest Mosaic-legal divisor of h_out whose working set fits VMEM.

    Output blocks are (.., tile, W): Mosaic requires the second-to-last
    block dim to be a multiple of 8 or equal to the full dim. Returns None
    when no legal tile fits the VMEM budget (caller falls back to the jnp
    loss path — e.g. vistas' 621-row crop, whose only divisors are odd).
    """
    budget_bytes = 6 * 1024 * 1024  # leave headroom for double buffering
    per_row = max(n_slices, 1) * w_out * 4
    cap = max(min(budget_bytes // per_row, 32, h_out), 1)
    for t in range(cap, 0, -1):
        if h_out % t == 0 and (t % 8 == 0 or t == h_out):
            return t
    return None


def fused_loss_available(in_hw, out_hw, tax: Taxonomy) -> bool:
    """Whether the Pallas kernel supports these shapes (else use the jnp path).

    Untileable heights are handled by zero-weight row padding inside the
    kernel factory, so only upsampling (out >= in) is required.
    """
    return out_hw[0] >= in_hw[0] and out_hw[1] >= in_hw[1]


def _select_gather(table, idx, dtype=jnp.int32):
    """Compare+select chain lookup of a small static table (fuses on TPU)."""
    out = jnp.full(idx.shape, int(table[0]), dtype)
    for k in range(1, len(table)):
        out = jnp.where(idx == k, int(table[k]), out)
    return out


def make_fused_hierarchical_loss(
    tax: Taxonomy,
    n_pp: int,
    n_weak: int,
    in_hw: tuple[int, int],
    out_hw: tuple[int, int],
    interpret: bool = False,
):
    """Build the fused loss for static shapes.

    Returns ``loss_fn(l1_lr, veh_lr, hum_lr, pp_l1, pp_veh, pp_hum, weak)``:

      l1_lr/veh_lr/hum_lr: (N, h, w, C) f32 stride-8 logits (pre-upsample)
      pp_l1/pp_veh/pp_hum: (Npp, H, W) int32 per-head label index maps
        (taxonomy gathers of the per-pixel labels, done by the caller)
      weak: (Nw, H, W, 15) f32 weak multinomials ([pb | pi] concatenated)

    -> dict with l1/vehicle/human (sum, count) pairs, full-res fused
    ``decisions`` and ``l1_decisions`` (N, H, W) int32. Differentiable in
    the three logit tensors (custom VJP; labels/gates carry no gradient,
    matching the reference).
    """
    h, w = int(in_hw[0]), int(in_hw[1])
    H, W = int(out_hw[0]), int(out_hw[1])
    n = n_pp + n_weak
    c1 = tax.num_l1_classes
    cv = tax.num_vehicle_classes
    ch = tax.num_human_classes
    cw = len(tax.per_bbox_cids2vehicle_cids)  # 15 weak classes
    n_slices = 2 * (c1 + cv + ch) + cw + 8
    # Untileable heights (e.g. vistas' 621-row crop, odd divisors only) are
    # padded to the next tileable height with zero-weight rows: the A matrix
    # gets zero interpolation rows (upsampled values 0), per-pixel label
    # rows are padded with the void cid and weak rows with the void channel,
    # so the padded rows contribute exactly nothing to sums, counts, or
    # gradients; decision maps are sliced back to H by the caller.
    Hp = H
    tile = _pick_tile(H, W, n_slices)
    if tile is None:
        Hp = -(-H // 8) * 8
        while (tile := _pick_tile(Hp, W, n_slices)) is None:
            Hp += 8
    t_cells = Hp // tile

    A = _bilinear_matrix(h, H, align_corners=True)  # (H, h)
    if Hp != H:
        A = np.concatenate([A, np.zeros((Hp - H, h), np.float32)], axis=0)
    B = _bilinear_matrix(w, W, align_corners=True).T.copy()  # (w, W)
    pb2veh = [int(x) for x in tax.per_bbox_cids2vehicle_cids]
    pb2hum = [int(x) for x in tax.per_bbox_cids2human_cids]
    l1_t = [int(x) for x in tax.l1_cids2common_cids]
    veh_t = [int(x) for x in tax.l2_vehicle_cids2common_cids]
    hum_t = [int(x) for x in tax.l2_human_cids2common_cids]
    cid_v, cid_h = int(tax.cid_l1_vehicle), int(tax.cid_l1_human)

    def _upsampled(A_t, Bm, ref, c):
        lr = ref[0, c]  # (h, w) f32
        tmp = jnp.dot(A_t, lr, preferred_element_type=jnp.float32)
        return jnp.dot(tmp, Bm, preferred_element_type=jnp.float32)  # (tile, W)

    def _head(A_t, Bm, ref, c_head):
        """Upsampled channels + log-sum-exp + first-max argmax."""
        u = [_upsampled(A_t, Bm, ref, c) for c in range(c_head)]
        m = u[0]
        for c in range(1, c_head):
            m = jnp.maximum(m, u[c])
        se = jnp.exp(u[0] - m)
        for c in range(1, c_head):
            se = se + jnp.exp(u[c] - m)
        lse = m + jnp.log(se)
        dec = jnp.zeros(u[0].shape, jnp.int32)
        best = u[0]
        for c in range(1, c_head):
            better = u[c] > best
            dec = jnp.where(better, c, dec)
            best = jnp.maximum(best, u[c])
        return u, lse, dec

    def _weak_proj(wk, table, num):
        lab = [None] * num
        for k in range(cw):
            j = table[k]
            lab[j] = wk[k] if lab[j] is None else lab[j] + wk[k]
        zero = jnp.zeros_like(wk[0])
        return [zero if x is None else x for x in lab]

    def _ce_sparse(u, lse, lab, c_head):
        """-logp[lab] via select chain (lab values in [0, c_head))."""
        ce = lse - u[0]
        for c in range(1, c_head):
            ce = jnp.where(lab == c, lse - u[c], ce)
        return ce

    def _store_parts(part_ref, slot_vals):
        # Mosaic cannot store scalars to VMEM: place the 6 partial sums in
        # rows of one (8, 128) tile (lane 0 is read back outside)
        rows = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        acc = jnp.zeros((8, 128), jnp.float32)
        for i, v in enumerate(slot_vals):
            acc = acc + jnp.where(rows == i, v, 0.0)
        part_ref[0, 0] = acc

    def _ce_dense(u, lse, lab_list):
        ce = jnp.zeros_like(u[0])
        for c, lab_c in enumerate(lab_list):
            ce = ce + lab_c * (lse - u[c])
        return ce

    def _weak_gate(lab_list, l1_dec, cid):
        not_void = (1.0 - lab_list[-1]) > 0.01
        mx = lab_list[0]
        for x in lab_list[1:-1]:
            mx = jnp.maximum(mx, x)
        agree = mx >= 0.01
        return jnp.logical_and(not_void, jnp.logical_and(l1_dec == cid, agree))

    # ---------------- forward kernel ----------------

    def fwd_kernel(A_ref, B_ref, l1_ref, veh_ref, hum_ref,
                   ppl1_ref, ppveh_ref, pphum_ref, weak_ref,
                   part_ref, dec_ref, l1dec_ref):
        ni = pl.program_id(0)
        A_t = A_ref[...]
        Bm = B_ref[...]

        u1, lse1, d1 = _head(A_t, Bm, l1_ref, c1)
        uv, lsev, dv = _head(A_t, Bm, veh_ref, cv)
        uh, lseh, dh = _head(A_t, Bm, hum_ref, ch)

        dec = jnp.where(
            d1 == cid_v,
            _select_gather(veh_t, dv),
            jnp.where(d1 == cid_h, _select_gather(hum_t, dh), _select_gather(l1_t, d1)),
        )
        dec_ref[0] = dec
        l1dec_ref[0] = d1

        is_pp = ni < n_pp

        @pl.when(is_pp)
        def _():
            l1lab = ppl1_ref[0]
            ce1 = _ce_sparse(u1, lse1, l1lab, c1)
            w1 = (l1lab != c1 - 1).astype(jnp.float32)
            vlab = ppveh_ref[0]
            cev = _ce_sparse(uv, lsev, vlab, cv)
            wv = (vlab != cv - 1).astype(jnp.float32)
            hlab = pphum_ref[0]
            ceh = _ce_sparse(uh, lseh, hlab, ch)
            wh = (hlab != ch - 1).astype(jnp.float32)
            _store_parts(part_ref, [
                jnp.sum(ce1 * w1), jnp.sum(w1),
                jnp.sum(cev * wv), jnp.sum(wv),
                jnp.sum(ceh * wh), jnp.sum(wh),
            ])

        @pl.when(jnp.logical_not(is_pp))
        def _():
            wk = [weak_ref[0, k] for k in range(cw)]
            vlab = _weak_proj(wk, pb2veh, cv)
            wv = _weak_gate(vlab, d1, cid_v).astype(jnp.float32)
            hlab = _weak_proj(wk, pb2hum, ch)
            wh = _weak_gate(hlab, d1, cid_h).astype(jnp.float32)
            zero = jnp.zeros((), jnp.float32)
            _store_parts(part_ref, [
                zero, zero,
                jnp.sum(_ce_dense(uv, lsev, vlab) * wv), jnp.sum(wv),
                jnp.sum(_ce_dense(uh, lseh, hlab) * wh), jnp.sum(wh),
            ])

    # ---------------- backward kernel ----------------

    def bwd_kernel(g_ref, A_ref, B_ref, l1_ref, veh_ref, hum_ref,
                   ppl1_ref, ppveh_ref, pphum_ref, weak_ref,
                   dl1_ref, dveh_ref, dhum_ref):
        ni = pl.program_id(0)
        ti = pl.program_id(1)
        A_t = A_ref[...]
        Bm = B_ref[...]
        gl1 = g_ref[0, 0]
        gv = g_ref[0, 1]
        gh = g_ref[0, 2]

        @pl.when(ti == 0)
        def _():
            dl1_ref[...] = jnp.zeros_like(dl1_ref)
            dveh_ref[...] = jnp.zeros_like(dveh_ref)
            dhum_ref[...] = jnp.zeros_like(dhum_ref)

        u1, lse1, d1 = _head(A_t, Bm, l1_ref, c1)
        uv, lsev, _ = _head(A_t, Bm, veh_ref, cv)
        uh, lseh, _ = _head(A_t, Bm, hum_ref, ch)

        is_pp = ni < n_pp

        def _accum(dref, dup, c):
            # d lr[c] += A_t^T @ (dup @ B^T); cheap order: contract W first
            tmp = jnp.dot(dup, Bm.T, preferred_element_type=jnp.float32)  # (tile, w)
            dref[0, c] += jnp.dot(A_t.T, tmp, preferred_element_type=jnp.float32)

        @pl.when(is_pp)
        def _():
            l1lab = ppl1_ref[0]
            w1 = (l1lab != c1 - 1).astype(jnp.float32) * gl1
            for c in range(c1):
                p = jnp.exp(u1[c] - lse1)
                onehot = (l1lab == c).astype(jnp.float32)
                _accum(dl1_ref, w1 * (p - onehot), c)
            vlab = ppveh_ref[0]
            wv = (vlab != cv - 1).astype(jnp.float32) * gv
            for c in range(cv):
                p = jnp.exp(uv[c] - lsev)
                onehot = (vlab == c).astype(jnp.float32)
                _accum(dveh_ref, wv * (p - onehot), c)
            hlab = pphum_ref[0]
            wh = (hlab != ch - 1).astype(jnp.float32) * gh
            for c in range(ch):
                p = jnp.exp(uh[c] - lseh)
                onehot = (hlab == c).astype(jnp.float32)
                _accum(dhum_ref, wh * (p - onehot), c)

        @pl.when(jnp.logical_not(is_pp))
        def _():
            # dl1 stays at its ti==0 zeros: the weak slice contributes no
            # L1 gradient (gates are argmax comparisons)
            wk = [weak_ref[0, k] for k in range(cw)]
            vlab = _weak_proj(wk, pb2veh, cv)
            wv = _weak_gate(vlab, d1, cid_v).astype(jnp.float32) * gv
            for c in range(cv):
                p = jnp.exp(uv[c] - lsev)
                _accum(dveh_ref, wv * (p - vlab[c]), c)
            hlab = _weak_proj(wk, pb2hum, ch)
            wh = _weak_gate(hlab, d1, cid_h).astype(jnp.float32) * gh
            for c in range(ch):
                p = jnp.exp(uh[c] - lseh)
                _accum(dhum_ref, wh * (p - hlab[c]), c)

    # ---------------- pallas_call wrappers ----------------

    vmem = pltpu.VMEM
    npp_ix = max(n_pp, 1)
    nwk_ix = max(n_weak, 1)

    def _common_in_specs():
        return [
            pl.BlockSpec((tile, h), lambda ni, ti: (ti, 0), memory_space=vmem),
            pl.BlockSpec((w, W), lambda ni, ti: (0, 0), memory_space=vmem),
            pl.BlockSpec((1, c1, h, w), lambda ni, ti: (ni, 0, 0, 0), memory_space=vmem),
            pl.BlockSpec((1, cv, h, w), lambda ni, ti: (ni, 0, 0, 0), memory_space=vmem),
            pl.BlockSpec((1, ch, h, w), lambda ni, ti: (ni, 0, 0, 0), memory_space=vmem),
            pl.BlockSpec(
                (1, tile, W),
                lambda ni, ti: (jnp.minimum(ni, npp_ix - 1), ti, 0),
                memory_space=vmem,
            ),
            pl.BlockSpec(
                (1, tile, W),
                lambda ni, ti: (jnp.minimum(ni, npp_ix - 1), ti, 0),
                memory_space=vmem,
            ),
            pl.BlockSpec(
                (1, tile, W),
                lambda ni, ti: (jnp.minimum(ni, npp_ix - 1), ti, 0),
                memory_space=vmem,
            ),
            pl.BlockSpec(
                (1, cw, tile, W),
                lambda ni, ti: (jnp.clip(ni - n_pp, 0, nwk_ix - 1), 0, ti, 0),
                memory_space=vmem,
            ),
        ]

    def _pad_rows(t, value):
        if Hp == H:
            return t
        pad = jnp.full((t.shape[0], Hp - H, W), value, t.dtype)
        return jnp.concatenate([t, pad], axis=1)

    def _prep(l1_lr, veh_lr, hum_lr, pp_l1, pp_veh, pp_hum, weak):
        if n_weak:
            weak_cm = jnp.transpose(weak, (0, 3, 1, 2)).astype(jnp.float32)
            if Hp != H:
                # pad weak rows with the pure-void distribution: gate weight 0
                pad = jnp.zeros((weak_cm.shape[0], cw, Hp - H, W), jnp.float32)
                pad = pad.at[:, -1].set(1.0)
                weak_cm = jnp.concatenate([weak_cm, pad], axis=2)
        else:
            weak_cm = jnp.zeros((1, cw, Hp, W), jnp.float32)
        args = (
            jnp.asarray(A),
            jnp.asarray(B),
            jnp.transpose(l1_lr, (0, 3, 1, 2)).astype(jnp.float32),
            jnp.transpose(veh_lr, (0, 3, 1, 2)).astype(jnp.float32),
            jnp.transpose(hum_lr, (0, 3, 1, 2)).astype(jnp.float32),
            # per-pixel label pads are each head's void cid: weight 0
            _pad_rows(pp_l1.astype(jnp.int32), c1 - 1)
            if n_pp else jnp.zeros((1, Hp, W), jnp.int32),
            _pad_rows(pp_veh.astype(jnp.int32), cv - 1)
            if n_pp else jnp.zeros((1, Hp, W), jnp.int32),
            _pad_rows(pp_hum.astype(jnp.int32), ch - 1)
            if n_pp else jnp.zeros((1, Hp, W), jnp.int32),
            weak_cm,
        )
        return args

    def _forward(l1_lr, veh_lr, hum_lr, pp_l1, pp_veh, pp_hum, weak):
        args = _prep(l1_lr, veh_lr, hum_lr, pp_l1, pp_veh, pp_hum, weak)
        parts, dec, l1dec = pl.pallas_call(
            fwd_kernel,
            grid=(n, t_cells),
            in_specs=_common_in_specs(),
            out_specs=(
                pl.BlockSpec((1, 1, 8, 128), lambda ni, ti: (ni, ti, 0, 0), memory_space=vmem),
                pl.BlockSpec((1, tile, W), lambda ni, ti: (ni, ti, 0), memory_space=vmem),
                pl.BlockSpec((1, tile, W), lambda ni, ti: (ni, ti, 0), memory_space=vmem),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((n, t_cells, 8, 128), jnp.float32),
                jax.ShapeDtypeStruct((n, Hp, W), jnp.int32),
                jax.ShapeDtypeStruct((n, Hp, W), jnp.int32),
            ),
            interpret=interpret,
        )(*args)
        sums = jnp.sum(parts[..., 0], axis=(0, 1))
        return sums, dec[:, :H], l1dec[:, :H]

    def _backward(g3, l1_lr, veh_lr, hum_lr, pp_l1, pp_veh, pp_hum, weak):
        args = _prep(l1_lr, veh_lr, hum_lr, pp_l1, pp_veh, pp_hum, weak)
        g = g3.reshape(1, 3).astype(jnp.float32)
        dl1, dveh, dhum = pl.pallas_call(
            bwd_kernel,
            grid=(n, t_cells),
            in_specs=[
                pl.BlockSpec((1, 3), lambda ni, ti: (0, 0), memory_space=pltpu.SMEM)
            ] + _common_in_specs(),
            out_specs=(
                pl.BlockSpec((1, c1, h, w), lambda ni, ti: (ni, 0, 0, 0), memory_space=vmem),
                pl.BlockSpec((1, cv, h, w), lambda ni, ti: (ni, 0, 0, 0), memory_space=vmem),
                pl.BlockSpec((1, ch, h, w), lambda ni, ti: (ni, 0, 0, 0), memory_space=vmem),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((n, c1, h, w), jnp.float32),
                jax.ShapeDtypeStruct((n, cv, h, w), jnp.float32),
                jax.ShapeDtypeStruct((n, ch, h, w), jnp.float32),
            ),
            interpret=interpret,
        )(g, *args)
        to_nhwc = lambda x: jnp.transpose(x, (0, 2, 3, 1))
        return to_nhwc(dl1), to_nhwc(dveh), to_nhwc(dhum)

    @jax.custom_vjp
    def fused_loss(l1_lr, veh_lr, hum_lr, pp_l1, pp_veh, pp_hum, weak):
        sums, dec, l1dec = _forward(l1_lr, veh_lr, hum_lr, pp_l1, pp_veh, pp_hum, weak)
        return {
            "l1_sum": sums[0], "l1_cnt": sums[1],
            "veh_sum": sums[2], "veh_cnt": sums[3],
            "hum_sum": sums[4], "hum_cnt": sums[5],
            "decisions": dec, "l1_decisions": l1dec,
        }

    def fused_fwd(l1_lr, veh_lr, hum_lr, pp_l1, pp_veh, pp_hum, weak):
        out = fused_loss(l1_lr, veh_lr, hum_lr, pp_l1, pp_veh, pp_hum, weak)
        return out, (l1_lr, veh_lr, hum_lr, pp_l1, pp_veh, pp_hum, weak)

    def fused_bwd(res, ct):
        l1_lr, veh_lr, hum_lr, pp_l1, pp_veh, pp_hum, weak = res
        # counts / decisions / labels carry no gradient (argmax, comparisons,
        # stop-gradient labels — reference semantics)
        g3 = jnp.stack([
            jnp.asarray(ct["l1_sum"], jnp.float32),
            jnp.asarray(ct["veh_sum"], jnp.float32),
            jnp.asarray(ct["hum_sum"], jnp.float32),
        ])
        dl1, dveh, dhum = _backward(
            g3, l1_lr, veh_lr, hum_lr, pp_l1, pp_veh, pp_hum, weak
        )
        zero = lambda x: jnp.zeros_like(x)
        return (
            dl1.astype(l1_lr.dtype),
            dveh.astype(veh_lr.dtype),
            dhum.astype(hum_lr.dtype),
            zero(pp_l1), zero(pp_veh), zero(pp_hum), zero(weak),
        )

    fused_loss.defvjp(fused_fwd, fused_bwd)
    return fused_loss


def _compute_fused(l1_lr, veh_lr, hum_lr, pp, pb, pi, tax, out_hw, interpret):
    """Local (per-shard) fused-loss computation on concrete-shape operands."""
    from iv2019_tpu.ops.segment_ops import gather_cids

    n_pp = pp.shape[0]
    weak = jnp.concatenate([pb, pi], axis=0) if (pb.shape[0] + pi.shape[0]) else pb
    loss_fn = make_fused_hierarchical_loss(
        tax, n_pp, weak.shape[0], l1_lr.shape[1:3], out_hw, interpret=interpret
    )
    pp_l1 = gather_cids(tax.per_pixel_cids2l1_cids, pp) if n_pp else pp
    pp_veh = gather_cids(tax.per_pixel_cids2vehicle_cids, pp) if n_pp else pp
    pp_hum = gather_cids(tax.per_pixel_cids2human_cids, pp) if n_pp else pp
    return loss_fn(l1_lr, veh_lr, hum_lr, pp_l1, pp_veh, pp_hum, weak)


def define_losses_fused(
    predictions, labels, tax: Taxonomy, out_hw,
    interpret: bool | None = None, mesh=None,
    weak_loss_coefficient: float | None = None,
):
    """Drop-in counterpart of losses.hierarchical.define_losses computing the
    reference losses from *stride-8* logits via the fused kernel.

    predictions: dict with low-res 'l1_logits'/'l2_vehicle_logits'/
    'l2_human_logits' (N, h, w, C). labels: the standard train labels dict at
    full resolution. Returns the reference losses dict plus full-resolution
    'decisions' and 'l1_decisions'.

    With ``mesh`` (a 1-D data mesh whose axis evenly divides every sub-batch)
    the kernel runs under ``jax.shard_map``: each device processes its local
    [pp | pb | pi] slice — the reference's per-tower contract — and only the
    six partial-sum scalars cross ICI (psum). Without it, an SPMD partitioner
    would have to all-gather the full-resolution weak labels to feed the
    un-annotated Pallas call.
    """
    if interpret is None:
        # Mosaic needs a real TPU; tests exercise the kernel via interpreter
        interpret = jax.default_backend() not in ("tpu", "axon")

    pp = labels["prolabels_per_pixel"]
    pb = labels["prolabels_per_bbox"]
    pi = labels["prolabels_per_image"]
    n_pp_g, n_pb_g, n_pi_g = pp.shape[0], pb.shape[0], pi.shape[0]

    shardable = (
        mesh is not None
        and mesh.size > 1
        # spatial partitioning splits H, not batch: the per-type [pp|pb|pi]
        # shard_map layout below assumes batch-only sharding — the jnp loss
        # path (SPMD-partitioned by XLA, including H) handles that mesh
        and "spatial" not in mesh.axis_names
        and all(k % mesh.size == 0 for k in (n_pp_g, n_pb_g, n_pi_g))
    )
    if shardable:
        from jax.sharding import PartitionSpec as P

        # batch shards over every mesh axis (1-D data mesh, or the 2-D
        # multi-slice ('replica', 'data') mesh — parallel/mesh.py); the
        # scalar psums below reduce hierarchically (ICI within a slice,
        # DCN across slices) when the mesh is 2-D.
        axis = tuple(mesh.axis_names)

        # The logits are [pp | pb | pi] concatenated along batch; sharding
        # the *concatenated* axis would hand each device a contiguous slice
        # that mixes supervision types (wrong pp/weak assignment). Split the
        # per-type slices back out (XLA folds slice-of-concat away), shard
        # each on its own leading axis — the reference's per-tower
        # get_temp_Nb contract — and re-concatenate the local slices inside.
        def split3(t):
            return (
                t[:n_pp_g],
                t[n_pp_g : n_pp_g + n_pb_g],
                t[n_pp_g + n_pb_g :],
            )

        args = (
            *split3(predictions["l1_logits"]),
            *split3(predictions["l2_vehicle_logits"]),
            *split3(predictions["l2_human_logits"]),
            pp, pb, pi,
        )

        def local(l1a, l1b, l1c, va, vb, vc, ha, hb, hc, pp, pb, pi):
            l1_lr = jnp.concatenate([l1a, l1b, l1c], axis=0)
            veh_lr = jnp.concatenate([va, vb, vc], axis=0)
            hum_lr = jnp.concatenate([ha, hb, hc], axis=0)
            out = _compute_fused(
                l1_lr, veh_lr, hum_lr, pp, pb, pi, tax, out_hw, interpret
            )
            for k in ("l1_sum", "l1_cnt", "veh_sum", "veh_cnt",
                      "hum_sum", "hum_cnt"):
                out[k] = jax.lax.psum(out[k], axis)
            # split the decision maps back per type so the global stitch
            # restores [pp | pb | pi] order (a sharded concat output would
            # interleave devices' local slices)
            a, b_ = pp.shape[0], pp.shape[0] + pb.shape[0]
            for k in ("decisions", "l1_decisions"):
                t = out.pop(k)
                out[f"{k}_pp"] = t[:a]
                out[f"{k}_pb"] = t[a:b_]
                out[f"{k}_pi"] = t[b_:]
            return out

        parts = jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(axis),) * 12,
            out_specs={
                "l1_sum": P(), "l1_cnt": P(), "veh_sum": P(), "veh_cnt": P(),
                "hum_sum": P(), "hum_cnt": P(),
                **{f"{k}_{t}": P(axis) for k in ("decisions", "l1_decisions")
                   for t in ("pp", "pb", "pi")},
            },
            # pallas_call out_shapes carry no varying-mesh-axes annotation
            check_vma=False,
        )(*args)
        out = {k: v for k, v in parts.items() if not k.startswith(("decisions", "l1_decisions"))}
        for k in ("decisions", "l1_decisions"):
            out[k] = jnp.concatenate(
                [parts[f"{k}_pp"], parts[f"{k}_pb"], parts[f"{k}_pi"]], axis=0
            )
    else:
        out = _compute_fused(
            predictions["l1_logits"], predictions["l2_vehicle_logits"],
            predictions["l2_human_logits"], pp, pb, pi, tax, out_hw, interpret,
        )

    def _norm(s, c):
        return jnp.where(c > 0, s / jnp.maximum(c, 1.0), 0.0)

    l1_loss = _norm(out["l1_sum"], out["l1_cnt"])
    veh_loss = _norm(out["veh_sum"], out["veh_cnt"])
    hum_loss = _norm(out["hum_sum"], out["hum_cnt"])
    from iv2019_tpu.losses.hierarchical import WEAK_LOSS_COEFFICIENT

    coeff = (
        WEAK_LOSS_COEFFICIENT
        if weak_loss_coefficient is None else weak_loss_coefficient
    )
    return {
        "total": l1_loss + coeff * (veh_loss + hum_loss),
        "l1_segmentation": l1_loss,
        "l2_vehicle_segmentation": veh_loss,
        "l2_human_segmentation": hum_loss,
        "decisions": out["decisions"],
        "l1_decisions": out["l1_decisions"],
    }
