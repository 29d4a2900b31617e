"""Capture a jax.profiler trace of the flagship train step and summarize it.

Usage:
  python tools/profile_step.py [outdir]          # trace + per-op summary
  python tools/profile_step.py --summarize DIR   # re-summarize existing trace

Builds the same configuration as bench.py, traces a few steps on the real
device, and prints the top HLO ops by self-time (via the tensorboard profile
plugin's xplane parser). This is the round-2 replacement for guessing where
the 230 ms step goes (VERDICT.md round-1 weak #1).
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys


def capture(outdir: str, steps: int = 5):
    import jax
    import numpy as np
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    # reuse bench's setup by inlining its main()'s construction
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
        # same perf-experiment env overrides as bench.py, so A/B variants
        # can be profiled, not just timed
        conv_impl=os.environ.get("IV_CONV_IMPL", "conv"),
        bn_impl=os.environ.get("IV_BN_IMPL", "flax"),
        dilation_mode=os.environ.get("IV_DILATION_MODE", "dilated"),
        root_conv_s2d=os.environ.get("IV_ROOT_S2D", "0") == "1",
        root_wgrad_pallas=os.environ.get("IV_ROOT_WGRAD_PALLAS", "0") == "1",
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

    # optimized HLO with op_name metadata: lets trace_summary.py map fusion
    # names back to model layers
    try:
        from iv2019_tpu.utils.compile import jit as tuned_jit

        inner = step_fn.__wrapped__ if hasattr(step_fn, "__wrapped__") else step_fn
        txt = tuned_jit(inner, donate_argnums=(0,)).lower(state, batch).compile().as_text()
        os.makedirs(outdir, exist_ok=True)
        with open(os.path.join(outdir, "hlo.txt"), "w") as f:
            f.write(txt)
        print("hlo written to", os.path.join(outdir, "hlo.txt"))
    except Exception as e:
        print("hlo dump failed:", e)

    for _ in range(3):
        state, metrics = step_fn(state, batch)
    float(metrics["total"])

    with jax.profiler.trace(outdir):
        for _ in range(steps):
            state, metrics = step_fn(state, batch)
        float(metrics["total"])
    print("trace written to", outdir)


def summarize(outdir: str, top: int = 40):
    """Parse the xplane and print per-op self time, grouped and raw."""
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    paths = glob.glob(os.path.join(outdir, "**", "*.xplane.pb"), recursive=True)
    assert paths, f"no xplane under {outdir}"
    data, _ = raw_to_tool_data.xspace_to_tool_data(paths, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    obj = json.loads(data)
    # hlo_stats: list-of-dict table (gviz). Find rows.
    cols = [c["label"] for c in obj["cols"]]
    rows = [[c["v"] for c in r["c"]] for r in obj["rows"]]
    i_cat = cols.index("HLO op category") if "HLO op category" in cols else None
    i_name = cols.index("HLO op name")
    i_self = next(i for i, c in enumerate(cols) if "self time" in c.lower() and "fraction" not in c.lower())
    by_cat = {}
    for r in rows:
        cat = r[i_cat] if i_cat is not None else "?"
        by_cat[cat] = by_cat.get(cat, 0.0) + float(r[i_self] or 0)
    print("== self time by category (us, all traced steps) ==")
    for k, v in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"{v:12.0f}  {k}")
    print("\n== top ops ==")
    rows.sort(key=lambda r: -float(r[i_self] or 0))
    for r in rows[:top]:
        cat = r[i_cat] if i_cat is not None else "?"
        print(f"{float(r[i_self]):12.0f}  {cat:28s} {str(r[i_name])[:110]}")


if __name__ == "__main__":
    if sys.argv[1:2] == ["--summarize"]:
        summarize(sys.argv[2])
    else:
        outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace"
        capture(outdir)
        try:
            summarize(outdir)
        except Exception as e:  # keep the trace even if parsing fails
            print("summarize failed:", e)
