"""Max-trainable-size table under spatial partitioning (VERDICT r3 #8).

AOT-compiles the real train step over an 8-device mesh for a grid of
vistas-like resolutions x spatial factors and reports XLA's per-device
memory analysis (temp + arguments). This extends the round-2 single-point
measurement (6.72 -> 1.89 GB at 512x1024) into the table directly
comparable to the reference's memory-tuned ceilings
(input_vistas.py:7-10: 827x1139 / 918x1266 / 1240x1710 on 4 GPUs).

Run on CPU (no chip needed — memory analysis is static):
  JAX_PLATFORM_NAME=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/spatial_memory_table.py [--quick]

Prints a markdown table + one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()

# memory analysis is static — always run on the virtual CPU mesh, never the
# chip (the axon TPU plugin ignores JAX_PLATFORMS, so force it via config)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

V5E_HBM_GB = 16.0


def analyze(h: int, w: int, spatial: int, nb: int = 2, remat: bool = False,
            accum: int = 1, ndev: int = 8):
    """Per-device memory (GB) for one train-step config on the 8-dev mesh."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from iv2019_tpu.config import Settings
    from iv2019_tpu.models.model import build_model
    from iv2019_tpu.parallel.mesh import create_mesh, replicate, shard_batch
    from iv2019_tpu.problem.taxonomy import NUM_WEAK_CLASSES
    from iv2019_tpu.train.optimizer import make_optimizer
    from iv2019_tpu.train.state import create_train_state
    from iv2019_tpu.train.step import make_train_step

    settings = Settings(
        per_pixel_dataset_name="vistas",
        Nb_per_pixel=nb, Nb_per_bbox=nb, Nb_per_image=nb, Nb=nb,
        height_feature_extractor=h, width_feature_extractor=w,
        Ntrain=256, Ne=3,
        learning_rate_boundaries=(1, 2),
        learning_rate_values=(0.01, 0.005, 0.0025),
        compute_dtype="bfloat16",
        spatial_partitions=spatial,
        remat=remat,
        grad_accum_steps=accum,
        num_devices=ndev,
    ).finalize()
    mesh = create_mesh(ndev, spatial_partitions=spatial)
    model = build_model(settings.replace(mode="train"))
    tx, _ = make_optimizer(settings)

    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3), jnp.float32))
    )
    variables = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), variables
    )
    state = create_train_state(variables, tx, settings.ema_decay)
    state = replicate(state, mesh)
    step_fn = make_train_step(settings, model=model, tx=tx, mesh=mesh)

    eye = np.eye(NUM_WEAK_CLASSES, dtype=np.float32)
    rng = np.random.RandomState(0)
    batch = {
        "proimages_per_pixel": rng.uniform(-1, 1, (nb, h, w, 3)).astype(np.float32),
        "proimages_per_bbox": rng.uniform(-1, 1, (nb, h, w, 3)).astype(np.float32),
        "proimages_per_image": rng.uniform(-1, 1, (nb, h, w, 3)).astype(np.float32),
        "prolabels_per_pixel": rng.randint(0, 60, (nb, h, w)).astype(np.int32),
        "prolabels_per_bbox": eye[rng.randint(0, 15, (nb, h, w))],
        "prolabels_per_image": eye[rng.randint(0, 15, (nb, h, w))],
    }
    batch = shard_batch(batch, mesh)

    inner = step_fn.__wrapped__ if hasattr(step_fn, "__wrapped__") else step_fn
    compiled = jax.jit(inner, donate_argnums=(0,)).lower(state, batch).compile()
    ma = compiled.memory_analysis()
    gb = 1 / (1024**3)
    return {
        "temp_gb": round(ma.temp_size_in_bytes * gb, 3),
        "args_gb": round(ma.argument_size_in_bytes * gb, 3),
        "output_gb": round(ma.output_size_in_bytes * gb, 3),
        "total_gb": round(
            (ma.temp_size_in_bytes + ma.argument_size_in_bytes) * gb, 3
        ),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true",
                   help="2 sizes x 2 factors (CI smoke)")
    p.add_argument("--nb", type=int, default=None,
                   help="global per-type batch (default: 8//factor, one "
                        "image per data shard)")
    p.add_argument("--sizes", type=str, default=None,
                   help="comma list of HxW (e.g. '920x1268,1240x1712') — "
                       "select a subset so big rows can run in separate "
                       "bounded invocations")
    p.add_argument("--factors", type=str, default=None,
                   help="comma list of spatial factors (e.g. '2,4,8')")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize backbone units (--remat flag rows)")
    p.add_argument("--accum", type=int, default=1,
                   help="grad_accum_steps for the rows (sequential "
                        "microbatches; nb must divide by it)")
    p.add_argument("--ndev", type=int, default=8,
                   help="mesh size (1 = the single-chip lever rows)")
    args = p.parse_args()

    if args.quick:
        sizes = [(512, 1024)]
        factors = [1, 4]
    else:
        # vistas-like ladder up to and beyond the reference's 1240x1710 cap
        sizes = [(512, 1024), (832, 1140), (920, 1268), (1240, 1712), (1536, 2112)]
        factors = [1, 2, 4, 8]
    if args.sizes:
        sizes = [tuple(int(d) for d in s.split("x")) for s in args.sizes.split(",")]
    if args.factors:
        factors = [int(f) for f in args.factors.split(",")]

    rows = []
    for h, w in sizes:
        for f in factors:
            if h % (f * 32) != 0:
                # spatial sharding needs H divisible by factor x stride tiles
                h_adj = -(-h // (f * 32)) * (f * 32)
            else:
                h_adj = h
            # constant per-data-shard load: one image per data shard, with
            # each image split over f chips (the table's comparison point)
            nb = max(args.ndev // f, 1) if args.nb is None else args.nb
            if nb % args.accum:
                nb = args.accum * max(nb // args.accum, 1)
            try:
                m = analyze(h_adj, w, f, nb=nb, remat=args.remat,
                            accum=args.accum, ndev=args.ndev)
                rows.append({"h": h_adj, "w": w, "spatial": f,
                             "remat": args.remat, "accum": args.accum,
                             "ndev": args.ndev, "nb": nb, **m})
                fit = "fits" if m["total_gb"] <= V5E_HBM_GB else "OOM"
                print(f"| {h_adj}x{w} | x{f} | {m['temp_gb']:.2f} | "
                      f"{m['args_gb']:.2f} | {m['total_gb']:.2f} | {fit} |",
                      flush=True)
            except Exception as e:
                rows.append({"h": h_adj, "w": w, "spatial": f,
                             "remat": args.remat, "accum": args.accum,
                             "error": str(e)[:200]})
                print(f"| {h_adj}x{w} | x{f} | - | - | - | error: {str(e)[:80]} |",
                      flush=True)

    print(json.dumps({
        "metric": "spatial_memory_table",
        "value": len([r for r in rows if "error" not in r]),
        "unit": "configs",
        "vs_baseline": None,
        "detail": {"rows": rows, "hbm_gb": V5E_HBM_GB, "nb_per_type": "8//factor" if args.nb is None else args.nb},
    }))


if __name__ == "__main__":
    main()
