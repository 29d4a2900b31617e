"""Measured-achievable HBM bandwidth probe (VERDICT r3 missing #3).

The roofline audit's bandwidth floors (tools/roofline_audit.py) divide
bytes by the v5e SPEC number (819 GB/s). No real kernel streams at spec:
this tool measures what THIS chip achieves on the access patterns the
train step's bandwidth-bound ops actually use, so the audit can use a
measured-achievable denominator instead of a theoretical one.

Patterns (all at flagship-step shapes, bf16 like the step's conv operands):

- ``copy``: out = in + 1 elementwise stream (read + write, unit stride) —
  the best case any fusion can hope for.
- ``dgrad1x1``: (M,256) x (256,1024) matmul at block3 conv1's backward-
  input shape — bandwidth-bound per the audit (reads 67 MB + weights,
  writes 268 MB).
- ``wgrad1x1``: (M,1024)^T x (M,256) contraction over M=131k pixels at
  the same layer — reads 335 MB, writes ~1 MB; the audit's dominant
  bucket is made of these.
- ``fwd1x1``: the forward (M,1024)x(1024,256) for completeness.

Methodology: 30-iteration loops timed with a scalar host readback as the
completion barrier (tunneled-chip rule, bench.py), minus nothing — loop
amortizes dispatch. Prints one JSON line with achieved GB/s per pattern.

Usage: python tools/membw_probe.py [iters]
"""

from __future__ import annotations

import json
import sys
import time


def main(iters: int = 30):
    import jax
    import jax.numpy as jnp
    import numpy as np

    M = 16 * 64 * 128  # flagship stride-8 pixel count (Nb=16 @ 512x1024)
    K, N = 1024, 256  # block3 conv1 channel dims

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(M, K), jnp.bfloat16)
    dy = jnp.asarray(rng.randn(M, N), jnp.bfloat16)
    w = jnp.asarray(rng.randn(K, N), jnp.bfloat16)
    big = jnp.asarray(rng.randn(M, K), jnp.bfloat16)

    bf = 2

    def _bytes(*arrs):
        return sum(a.size * bf for a in arrs)

    cases = {
        # name: (jitted fn, args, bytes moved per call)
        "copy": (
            jax.jit(lambda a: a + jnp.bfloat16(1)), (big,), _bytes(big) * 2,
        ),
        "fwd1x1": (
            jax.jit(lambda a, b: jax.lax.dot(a, b,
                                             preferred_element_type=jnp.float32
                                             ).astype(jnp.bfloat16)),
            (x, w), _bytes(x, w) + M * N * bf,
        ),
        "dgrad1x1": (
            jax.jit(lambda g, b: jax.lax.dot(g, b.T,
                                             preferred_element_type=jnp.float32
                                             ).astype(jnp.bfloat16)),
            (dy, w), _bytes(dy, w) + M * K * bf,
        ),
        "wgrad1x1": (
            jax.jit(lambda a, g: jax.lax.dot_general(
                a, g, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)),
            (x, dy), _bytes(x, dy) + K * N * 4,
        ),
    }

    out = {}
    for name, (fn, args, nbytes) in cases.items():
        r = fn(*args)
        float(jnp.sum(r[:1, :1]))  # warm + barrier
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*args)
        float(jnp.sum(r[:1, :1]))
        dt = (time.perf_counter() - t0) / iters
        out[name] = {
            "ms": round(dt * 1e3, 3),
            "achieved_GBps": round(nbytes / dt / 1e9, 1),
            "bytes": nbytes,
        }

    spec = 819.0
    out["spec_GBps"] = spec
    out["copy_efficiency_vs_spec"] = round(
        out["copy"]["achieved_GBps"] / spec, 3
    )
    print(json.dumps({
        "metric": "hbm_achieved_bandwidth",
        "value": out["copy"]["achieved_GBps"],
        "unit": "GB/s",
        "vs_baseline": out["copy_efficiency_vs_spec"],
        "detail": out,
    }))
    return out


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 30)
