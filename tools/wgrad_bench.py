"""On-chip microbenchmark: root-conv wgrad — XLA emitter vs Pallas kernel.

The audit (tools/roofline_audit.py, docs/PERFORMANCE.md) says the root-conv
wgrad runs at ~5.5x its achievable floor inside XLA's conv backward emitter.
This tool measures, on the real chip at the flagship operand shapes:

  1. XLA's wgrad emitter (the conv VJP alone, f32 out)
  2. the Pallas kernel (ops/pallas_wgrad.py), including its host-side pad
  3. the achievable floor for the op (lane-padded MXU compute vs HBM bytes)

Usage: python tools/wgrad_bench.py [N H W Cout] [--ot 32]
Prints one JSON line; run only when the chip is idle (single-client).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_FLOPS = 197e12  # v5e bf16
HBM_BW = 819e9


def _time(fn, *args, iters=30, warmup=5):
    import jax

    out = None
    for _ in range(warmup):
        out = fn(*args)
    # scalar readback = reliable completion barrier on the tunneled chip
    float(jax.numpy.asarray(out).ravel()[0].astype("float32"))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jax.numpy.asarray(out).ravel()[0].astype("float32"))
    return (time.perf_counter() - t0) / iters, out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("shape", nargs="*", type=int, default=[16, 512, 1024, 64])
    p.add_argument("--ot", type=int, default=32)
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args()
    n, h, w, cout = (args.shape + [16, 512, 1024, 64])[:4]

    import jax
    import jax.numpy as jnp

    from iv2019_tpu.ops.pallas_wgrad import (
        root_conv_wgrad,
        root_conv_wgrad_reference,
    )

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.uniform(-1, 1, (n, h, w, 3)), jnp.bfloat16)
    dy = jnp.asarray(rng.uniform(-1, 1, (n, h // 2, w // 2, cout)), jnp.bfloat16)

    xla_fn = jax.jit(root_conv_wgrad_reference)
    pallas_fn = jax.jit(lambda a, b: root_conv_wgrad(a, b, ot=args.ot))

    t_xla, out_xla = _time(xla_fn, x, dy, iters=args.iters)
    t_pal, out_pal = _time(pallas_fn, x, dy, iters=args.iters)

    diff = float(
        jnp.max(jnp.abs(jnp.asarray(out_xla) - jnp.asarray(out_pal)))
    )
    ref = float(jnp.max(jnp.abs(jnp.asarray(out_xla))))

    # achievable floor (the audit's model): M=7*7*3 taps padded to sublanes,
    # N=cout padded to 128 lanes, K = all pixels; vs HBM bytes for x + dy
    m_pad = -(-147 // 8) * 8
    n_pad = -(-cout // 128) * 128
    k = n * (h // 2) * (w // 2)
    t_compute = 2.0 * m_pad * n_pad * k / PEAK_FLOPS
    bytes_moved = x.size * 2 + dy.size * 2 + 147 * cout * 4
    t_bw = bytes_moved / HBM_BW
    floor_ms = max(t_compute, t_bw) * 1e3

    print(json.dumps({
        "metric": "root_wgrad_ms",
        "value": round(t_pal * 1e3, 3),
        "unit": "ms",
        "vs_baseline": round(t_xla / t_pal, 3),
        "detail": {
            "xla_ms": round(t_xla * 1e3, 3),
            "pallas_ms": round(t_pal * 1e3, 3),
            "floor_ms": round(floor_ms, 3),
            "pallas_vs_floor": round(t_pal * 1e3 / floor_ms, 2),
            "xla_vs_floor": round(t_xla * 1e3 / floor_ms, 2),
            "max_abs_diff": diff, "ref_max": ref,
            "shape": [n, h, w, 3, cout], "ot": args.ot,
            "device": str(jax.devices()[0].device_kind),
        },
    }))


if __name__ == "__main__":
    main()
