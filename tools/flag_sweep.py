"""XLA-TPU compiler-flag sweep for the flagship train step.

Usage: python tools/flag_sweep.py 'flag=val,flag2=val2' [steps]

Compiles the bench train step with the given compiler options and reports
step time. Round-2 perf attack: the profile shows 1x1 convs at ~2x their
roofline; autotuning/emitter flags are the cheapest lever to test.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build():
    import jax
    import jax.numpy as jnp

    from iv2019_tpu.config import Settings
    from iv2019_tpu.models.model import build_model
    from iv2019_tpu.problem.taxonomy import NUM_WEAK_CLASSES
    from iv2019_tpu.train.state import create_fused_train_state
    from iv2019_tpu.train.fused_update import FusedSGDM
    from iv2019_tpu.train.step import make_train_step

    h, w = 512, 1024
    npp, npb, npi = 4, 8, 4
    settings = Settings(
        per_pixel_dataset_name="cityscapes",
        Nb_per_pixel=npp, Nb_per_bbox=npb, Nb_per_image=npi, Nb=npp,
        height_feature_extractor=h, width_feature_extractor=w,
        Ntrain=2975, Ne=17,
        learning_rate_boundaries=(8, 15, 17),
        learning_rate_values=(0.01, 0.005, 0.0025),
        compute_dtype="bfloat16",
    ).finalize()
    model = build_model(settings.replace(mode="train"))
    rng = np.random.RandomState(0)
    eye = np.eye(NUM_WEAK_CLASSES, dtype=np.float32)
    batch = {
        "proimages_per_pixel": jnp.asarray(rng.uniform(-1, 1, (npp, h, w, 3)).astype(np.float32)),
        "proimages_per_bbox": jnp.asarray(rng.uniform(-1, 1, (npb, h, w, 3)).astype(np.float32)),
        "proimages_per_image": jnp.asarray(rng.uniform(-1, 1, (npi, h, w, 3)).astype(np.float32)),
        "prolabels_per_pixel": jnp.asarray(rng.randint(0, 20, (npp, h, w)).astype(np.int32)),
        "prolabels_per_bbox": jnp.asarray(eye[rng.randint(0, 15, (npb, h, w))]),
        "prolabels_per_image": jnp.asarray(eye[rng.randint(0, 15, (npi, h, w))]),
    }
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((2, h, w, 3), jnp.float32))
    fused_opt = FusedSGDM(settings, variables["params"])
    state = create_fused_train_state(variables, fused_opt)
    step_fn = make_train_step(settings, model=model, fused_opt=fused_opt)
    raw = step_fn.__wrapped__ if hasattr(step_fn, "__wrapped__") else step_fn
    return raw, state, batch


def main():
    import jax

    opts = {}
    if len(sys.argv) > 1 and sys.argv[1] not in ("", "-"):
        for kv in sys.argv[1].split(","):
            k, v = kv.split("=", 1)
            opts[k.strip()] = v.strip()
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    raw, state, batch = build()
    t0 = time.perf_counter()
    compiled = (
        jax.jit(raw, donate_argnums=(0,))
        .lower(state, batch)
        .compile(compiler_options=opts or None)
    )
    compile_s = time.perf_counter() - t0

    for _ in range(3):
        state, metrics = compiled(state, batch)
    float(metrics["total"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = compiled(state, batch)
    float(metrics["total"])
    dt = (time.perf_counter() - t0) / steps
    print(f"RESULT step_ms={dt*1e3:.2f} img_s={16/dt:.2f} compile_s={compile_s:.0f} opts={opts}")


if __name__ == "__main__":
    main()
