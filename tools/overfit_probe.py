"""Learning-evidence probe: overfit the flagship model on one fixed batch.

Short of training on real Cityscapes (datasets are not available in this
environment), this is the strongest end-to-end quality signal we can
produce: run the REAL mixed-supervision train step (hierarchical losses,
decision gates, EMA, fused optimizer — the exact program train_cli compiles)
on a single fixed synthetic batch and show the optimization actually works:
total loss falls monotonically-ish and per-pixel train accuracy climbs
toward 1.0. A broken gradient path, loss term, or optimizer wiring shows up
immediately as a flat curve.

Usage: python tools/overfit_probe.py [steps] [--size HxW]
Prints one JSON line with the loss/accuracy trajectory.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(steps: int = 200, h: int = 128, w: int = 256):
    import jax
    import jax.numpy as jnp

    from iv2019_tpu.config import Settings
    from iv2019_tpu.models.model import build_model
    from iv2019_tpu.problem.taxonomy import NUM_WEAK_CLASSES
    from iv2019_tpu.train.step import make_train_step

    npp, npb, npi = 2, 2, 2
    settings = Settings(
        per_pixel_dataset_name="cityscapes",
        Nb_per_pixel=npp, Nb_per_bbox=npb, Nb_per_image=npi, Nb=npp,
        height_feature_extractor=h, width_feature_extractor=w,
        Ntrain=64, Ne=17,
        learning_rate_boundaries=(8, 15, 17),
        learning_rate_values=(0.01, 0.005, 0.0025),
        compute_dtype="bfloat16",
        regularization_weight=0.0,  # pure fit: no pull away from the data
        bn_impl=os.environ.get("IV_BN_IMPL", "flax"),
    ).finalize()

    model = build_model(settings.replace(mode="train"))
    rng = np.random.RandomState(0)

    def img(n):
        return jnp.asarray(rng.uniform(-1, 1, (n, h, w, 3)).astype(np.float32))

    # piecewise-constant label regions (not pure noise) so there is real
    # image->label structure to learn; labels are a blocky function of x
    def blocky(n, num_classes, block=32):
        base = rng.randint(0, num_classes, (n, h // block, w // block))
        return np.repeat(np.repeat(base, block, axis=1), block, axis=2)

    eye = np.eye(NUM_WEAK_CLASSES, dtype=np.float32)
    pp_labels = blocky(npp, 20).astype(np.int32)
    batch = {
        "proimages_per_pixel": img(npp),
        "proimages_per_bbox": img(npb),
        "proimages_per_image": img(npi),
        "prolabels_per_pixel": jnp.asarray(pp_labels),
        "prolabels_per_bbox": jnp.asarray(eye[blocky(npb, 15)]),
        "prolabels_per_image": jnp.asarray(eye[blocky(npi, 15)]),
    }

    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((2, h, w, 3), jnp.float32)
    )
    from iv2019_tpu.train.fused_update import FusedSGDM
    from iv2019_tpu.train.state import create_fused_train_state

    fused_opt = FusedSGDM(settings, variables["params"])
    state = create_fused_train_state(variables, fused_opt)
    step_fn = make_train_step(settings, model=model, fused_opt=fused_opt)

    losses, mious, trace_steps = [], [], []
    for i in range(steps):
        state, metrics = step_fn(state, batch)
        if i % max(steps // 20, 1) == 0 or i == steps - 1:
            losses.append(round(float(metrics["total"]), 4))
            # the train step's own batch mIoU (confusion-matrix based, in
            # the label space the loss trains — the system's real metric)
            mious.append(round(float(metrics["miou"]), 4))
            trace_steps.append(i)

    result = {
        "metric": "overfit_probe",
        "steps": trace_steps,
        "loss": losses,
        "train_miou": mious,
        "loss_drop": round(losses[0] - losses[-1], 4),
        "final_miou": mious[-1],
        "learned": bool(losses[-1] < 0.1 * losses[0] and mious[-1] > 0.8),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    steps = int(args[0]) if args else 200
    size = next((a.split("=")[1] for a in sys.argv if a.startswith("--size")), None)
    if size:
        h, w = (int(v) for v in size.split("x"))
        main(steps, h, w)
    else:
        main(steps)
