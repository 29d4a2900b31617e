"""Per-op achievable-roofline audit: measured step time vs physical limits.

The driver's flat roofline (XLA FLOP count / peak bf16) assumes every FLOP
can saturate the MXU. Real convnets can't: a conv with Cout=64 uses half of
the MXU's 128 lanes no matter who emits it, and early-block tensors are
bandwidth-bound. This tool computes, for every convolution in the dumped
HLO, the *achievable* time

    t_op = max( 2*M*K'*N' / peak_flops,  bytes_moved / hbm_bw )

with K', N' the contraction/output channel dims padded to the 128-lane MXU
tile (M is padded to sublanes), and for every other profiled op the
bandwidth bound of its fusion outputs+inputs, then aggregates against the
measured per-op times from a jax.profiler trace (tools/profile_step.py
produces both inputs).

Usage: python tools/roofline_audit.py TRACE_DIR [HLO_TXT] [steps]
Prints a per-bucket table: measured ms, achievable ms, ratio — and the
whole-step achievable floor. This is the honest denominator for
"percent of roofline" claims in docs/PERFORMANCE.md.
"""

from __future__ import annotations

import collections
import re
import sys

PEAK_FLOPS = 197e12  # v5e bf16
HBM_BW = 819e9  # v5e bytes/s

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1, "u8": 1,
                "s8": 1, "f16": 2, "u16": 2, "s16": 2, "f64": 8, "s64": 8}


def _ceil_to(x, m):
    return -(-x // m) * m


def parse_hlo(path):
    """name -> (dtype, shape list); plus conv instructions with windows."""
    shapes = {}
    convs = []
    shape_re = re.compile(r"%([\w\.\-]+) = (?:\()?(\w+)\[([\d,]*)\]")
    conv_re = re.compile(
        r"%([\w\.\-]+) = (\w+)\[([\d,]+)\][^=]*convolution\(%([\w\.\-]+), "
        r"%([\w\.\-]+)\), window=\{size=(\d+)x(\d+)[^}]*\}, "
        r"dim_labels=(\S+?),.*?op_name=\"([^\"]+)\""
    )
    for ln in open(path):
        s = ln.strip()
        m = shape_re.match(s.lstrip("ROOT "))
        if m:
            name, dt, dims = m.groups()
            shapes[name] = (dt, [int(d) for d in dims.split(",")] if dims else [])
        m = conv_re.match(s.lstrip("ROOT "))
        if m:
            convs.append(m.groups())
    return shapes, convs


def conv_achievable(out_dt, out_shape, lhs_shape, rhs_shape, win, dim_labels):
    """max(compute-with-lane-padding, bandwidth) seconds for one conv."""
    kh, kw = win
    out_elems = 1
    for d in out_shape:
        out_elems *= d
    # identify channel dims from dim_labels (e.g. b01f_01io->b01f or
    # f01b_i01o->01bf for wgrad): contraction size K = cin*kh*kw where cin is
    # the rhs 'i' dim; N = rhs 'o' dim; M = out_elems / N.
    rhs_labels = dim_labels.split("_")[1].split("-")[0]
    i_pos, o_pos = rhs_labels.index("i"), rhs_labels.index("o")
    cin, cout = rhs_shape[i_pos], rhs_shape[o_pos]
    m = out_elems // max(cout, 1)
    k = cin * kh * kw
    flops_padded = 2.0 * _ceil_to(m, 8) * _ceil_to(k, 128) * _ceil_to(cout, 128)
    b = _DTYPE_BYTES.get(out_dt, 2)
    bytes_moved = (
        out_elems * b
        + _prod(lhs_shape) * b
        + _prod(rhs_shape) * b
    )
    return max(flops_padded / PEAK_FLOPS, bytes_moved / HBM_BW)


def _prod(xs):
    p = 1
    for x in xs:
        p *= x
    return p


def main():
    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from trace_summary import load_hlo_info, load_trace

    trace_dir = sys.argv[1]
    hlo_path = sys.argv[2] if len(sys.argv) > 2 else f"{trace_dir}/hlo.txt"
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    agg = load_trace(trace_dir, steps)
    info = load_hlo_info(hlo_path)
    shapes, convs = parse_hlo(hlo_path)

    # achievable time per op_name (a layer may lower to several HLO convs)
    conv_ach = collections.Counter()
    for name, dt, dims, lhs, rhs, wh, ww, dim_labels, op_name in convs:
        out_shape = [int(d) for d in dims.split(",")]
        lhs_shape = shapes.get(lhs, ("bf16", []))[1]
        rhs_shape = shapes.get(rhs, ("bf16", []))[1]
        conv_ach[op_name] += conv_achievable(
            dt, out_shape, lhs_shape, rhs_shape, (int(wh), int(ww)), dim_labels
        )

    def fusion_bytes(trace_name):
        dt, dims = shapes.get(trace_name, ("bf16", []))
        out_b = _prod(dims) * _DTYPE_BYTES.get(dt, 2) if dims else 0
        return out_b * 2  # read >= write for elementwise; conservative floor

    meas_by_layer = collections.Counter()
    meas_other = ach_other = 0.0
    for tn, dur in agg.items():
        op_name = info.get(tn, info.get(tn.split(".remat")[0], ""))
        t_meas = dur / steps / 1e6  # seconds
        if op_name in conv_ach:
            meas_by_layer[op_name] += t_meas
        else:
            meas_other += t_meas
            ach_other += fusion_bytes(tn) / HBM_BW

    meas_conv = sum(meas_by_layer.values())
    ach_conv = sum(conv_ach[n] for n in meas_by_layer)

    rows = sorted(
        ((t - conv_ach[n], t, conv_ach[n], n) for n, t in meas_by_layer.items()),
        reverse=True,
    )
    print(f"{'measured':>9} {'achievable':>10} {'ratio':>6}  layer (sorted by absolute gap)")
    for _, t, a, name in rows[:25]:
        short = name.replace("jit(train_step)/", "")[-90:]
        print(f"{t*1e3:8.2f}m {a*1e3:9.2f}m {t/max(a,1e-9):6.2f}  {short}")
    total_meas = meas_conv + meas_other
    total_ach = ach_conv + ach_other
    print(f"\nconv ops:  measured {meas_conv*1e3:7.1f} ms  achievable {ach_conv*1e3:7.1f} ms  ({meas_conv/max(ach_conv,1e-9):.2f}x)")
    print(f"other ops: measured {meas_other*1e3:7.1f} ms  achievable(bw floor) {ach_other*1e3:7.1f} ms")
    print(
        f"step:      measured {total_meas*1e3:7.1f} ms  achievable floor "
        f"{total_ach*1e3:7.1f} ms  ({total_meas/max(total_ach,1e-9):.2f}x above floor)"
    )


if __name__ == "__main__":
    main()
