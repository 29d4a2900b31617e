"""Microbenchmark: 1x1-conv formulations on the flagship shapes.

Round-2 perf attack (VERDICT next-round #1): the train-step profile shows
1x1 convs at 120 ms/step vs ~50 ms theoretical. This probe times, per shape:
  conv   : lax 1x1 convolution (what flax nn.Conv emits)
  conv+bn: same with fused BN-stat reduces (what the model compiles to)
  dot    : reshape -> jnp.dot -> reshape
  dot+bn : dot with BN-stat reduces
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# (label, N, H, W, Cin, Cout) — representative 1x1 convs per block
SHAPES = [
    ("block1 64->256 @128x256", 16, 128, 256, 64, 256),
    ("block1 256->64 @128x256", 16, 128, 256, 256, 64),
    ("block2 512->128", 16, 64, 128, 512, 128),
    ("block2 128->512", 16, 64, 128, 128, 512),
    ("block3 1024->256", 16, 64, 128, 1024, 256),
    ("block3 256->1024", 16, 64, 128, 256, 1024),
    ("block4 2048->512", 16, 64, 128, 2048, 512),
    ("block4 512->2048", 16, 64, 128, 512, 2048),
    ("block4 shortcut 1024->2048", 16, 64, 128, 1024, 2048),
]

PEAK = 197e12

INNER = 20  # ops per jit call: amortizes the ~1 ms tunnel dispatch overhead


def timeit(fn, x, k, reps=3):
    """Time fn(x, k) averaged over INNER in-graph iterations.

    Each iteration perturbs x by a scan carry so the ops are neither CSE'd
    nor DCE'd; the carry is a scalar so the extra work is negligible.
    """

    @jax.jit
    def many(x, k):
        def body(carry, i):
            out = fn(x + carry.astype(x.dtype), k)
            first = jax.tree_util.tree_leaves(out)[0]
            return first.reshape(-1)[0].astype(jnp.float32) * 1e-9, None

        carry, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(INNER))
        return carry

    float(many(x, k))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(many(x, k))
        best = min(best, (time.perf_counter() - t0) / INNER)
    return best


def main():
    rng = np.random.RandomState(0)
    for label, n, h, w, cin, cout in SHAPES:
        x4 = jnp.asarray(rng.randn(n, h, w, cin).astype(np.float32), jnp.bfloat16)
        x2 = x4.reshape(-1, cin)
        wk = jnp.asarray(rng.randn(cin, cout).astype(np.float32) * 0.01, jnp.bfloat16)
        wk4 = wk.reshape(1, 1, cin, cout)
        flops = 2.0 * n * h * w * cin * cout
        ideal = flops / PEAK * 1e3

        @jax.jit
        def conv(x, k):
            return jax.lax.conv_general_dilated(
                x, k, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.bfloat16)

        @jax.jit
        def conv_bn(x, k):
            y = jax.lax.conv_general_dilated(
                x, k, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.bfloat16)
            y32 = y.astype(jnp.float32)
            return y, jnp.mean(y32, (0, 1, 2)), jnp.mean(y32 * y32, (0, 1, 2))

        @jax.jit
        def dot(x, k):
            return jnp.dot(x, k, preferred_element_type=jnp.bfloat16)

        @jax.jit
        def dot_bn(x, k):
            y = jnp.dot(x, k, preferred_element_type=jnp.bfloat16)
            y32 = y.astype(jnp.float32)
            return y, jnp.mean(y32, 0), jnp.mean(y32 * y32, 0)

        r = {
            "conv": timeit(conv, x4, wk4),
            "conv+bn": timeit(conv_bn, x4, wk4),
            "dot": timeit(dot, x2, wk),
            "dot+bn": timeit(dot_bn, x2, wk),
        }
        msg = " ".join(f"{k}={v*1e3:6.3f}ms({flops/v/PEAK*100:4.0f}%)" for k, v in r.items())
        print(f"{label:28s} ideal={ideal:6.3f}ms  {msg}")


if __name__ == "__main__":
    main()
