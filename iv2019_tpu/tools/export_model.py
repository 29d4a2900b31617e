"""Model export tooling: jitted forward -> StableHLO / HLO artifacts.

TPU-native counterpart of the reference's frozen-graph tooling
(tools/pb2pbtxt.py and export_frozen_graph_saver, define_savers.py:68-69):
instead of a TF GraphDef, the deployable artifact of a JAX model is its
StableHLO module (portable, runnable by any XLA backend) plus the weights.

Usage:
  python -m iv2019_tpu.tools.export_model LOG_DIR PROBLEM_DEF OUT_DIR \
      [--height 512 --width 1024]

Writes:
  OUT_DIR/forward.stablehlo.mlir   — portable StableHLO text
  OUT_DIR/forward.hlo.txt          — optimized HLO (debug/inspection)
"""

from __future__ import annotations

import argparse
import os
import sys


def export_stablehlo(
    model, variables, input_shape, out_dir: str, wire_u8: bool = False,
    predict_fn=None,
) -> dict:
    """Export the forward pass as StableHLO.

    ``wire_u8=True`` exports a wire-optimized serving signature: the input
    is raw uint8 NHWC (normalized to [-1,1) on device — reference
    from_0_1_to_m1_1, input_pipelines/utils.py:96-112) and output 0 is the
    decisions cast to uint8 — 4x less host<->device transfer per request in
    both directions, which dominates serving latency on a tunneled chip.

    ``predict_fn(images) -> predictions dict`` overrides the plain
    ``model.apply`` forward — used to export the sliding-window /
    TTA-ensembled predict program (train/step.make_predict_step), which is
    still one static-shape XLA program and so serves unmodified through
    the C++ PJRT loader.
    """
    import jax
    import jax.numpy as jnp

    os.makedirs(out_dir, exist_ok=True)
    apply_fn = predict_fn or (lambda images: model.apply(variables, images))

    if wire_u8:

        def forward(images_u8):
            images = images_u8.astype(jnp.float32) / 255.0 * 2.0 - 1.0
            preds = apply_fn(images)
            return preds["decisions"].astype(jnp.uint8), preds["l1_probabilities"]

        in_spec = jax.ShapeDtypeStruct(input_shape, jnp.uint8)
    else:

        def forward(images):
            preds = apply_fn(images)
            return preds["decisions"], preds["l1_probabilities"]

        in_spec = jax.ShapeDtypeStruct(input_shape, jnp.float32)

    lowered = jax.jit(forward).lower(in_spec)
    paths = {}
    shlo_path = os.path.join(out_dir, "forward.stablehlo.mlir")
    with open(shlo_path, "w") as f:
        f.write(lowered.as_text())
    paths["stablehlo"] = shlo_path
    try:
        compiled = lowered.compile()
        hlo_path = os.path.join(out_dir, "forward.hlo.txt")
        with open(hlo_path, "w") as f:
            f.write(compiled.as_text())
        paths["hlo"] = hlo_path
    except Exception as e:  # compile may fail off-accelerator; export still useful
        paths["hlo_error"] = str(e)
    return paths


def main(argv):
    p = argparse.ArgumentParser()
    p.add_argument("log_dir")
    p.add_argument("training_problem_def_path")
    p.add_argument("out_dir")
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--restore_emas", action="store_true")
    p.add_argument("--wire_u8", action="store_true",
                   help="uint8 wire signature (serving)")
    p.add_argument("--eval_size", type=int, nargs=2, default=None,
                   metavar=("H", "W"),
                   help="export a native-resolution program at this input "
                        "size (the (hf, wf) training size stays --height "
                        "--width)")
    p.add_argument("--sliding_window", action="store_true",
                   help="export the sliding-window predict program: tile "
                        "eval_size with (height, width) windows, stitch "
                        "per-head probabilities, fuse decisions — bounded "
                        "activation memory at megapixel serving sizes")
    p.add_argument("--window_overlap", type=float, default=0.5)
    p.add_argument("--window_blend", type=str, default="uniform",
                   choices=["uniform", "gaussian"])
    p.add_argument("--eval_flip", action="store_true")
    p.add_argument("--eval_scales", type=float, nargs="*", default=[1.0])
    p.add_argument("--fused_block", action="store_true",
                   help="whole-bottleneck Pallas kernels for supported "
                        "identity units (ops/pallas_block.py). The exported "
                        "module carries Mosaic custom calls — consumable by "
                        "the same-version PJRT loader, not portable "
                        "StableHLO")
    args = p.parse_args(argv)

    from iv2019_tpu.config import Settings
    from iv2019_tpu.models.model import build_model
    from iv2019_tpu.system import SemanticSegmentation

    settings = Settings(
        mode="predict",
        log_dir=args.log_dir,
        training_problem_def_path=args.training_problem_def_path,
        height_feature_extractor=args.height,
        width_feature_extractor=args.width,
        restore_emas=args.restore_emas,
        eval_size=tuple(args.eval_size) if args.eval_size else None,
        sliding_window=args.sliding_window,
        window_overlap=args.window_overlap,
        window_blend=args.window_blend,
        eval_flip=args.eval_flip,
        eval_scales=tuple(args.eval_scales),
        fused_block=args.fused_block,
    )
    system = SemanticSegmentation({}, settings=settings)
    s = system.settings.replace(mode="predict")
    model = build_model(s)
    params, batch_stats = system._restore_variables(model)
    variables = {"params": params, "batch_stats": batch_stats}

    predict_fn = None
    in_hw = (args.height, args.width)
    ensembled = (
        s.sliding_window or s.eval_flip or tuple(s.eval_scales) != (1.0,)
    )
    if ensembled or s.eval_size:
        # the full predict program (window stitching / TTA ensembling) is
        # one static-shape XLA module — export it instead of the bare
        # forward; plain eval_size needs no wrapper (fully-convolutional)
        in_hw = s.eval_size or in_hw
        if ensembled:
            from iv2019_tpu.train.step import make_predict_step

            step = make_predict_step(s, model=model)
            inner = step.__wrapped__ if hasattr(step, "__wrapped__") else step
            predict_fn = lambda images: inner(params, batch_stats, images)  # noqa: E731

    paths = export_stablehlo(
        model,
        variables,
        (1, *in_hw, 3),
        args.out_dir,
        wire_u8=args.wire_u8,
        predict_fn=predict_fn,
    )
    print(paths)
    return paths


if __name__ == "__main__":
    main(sys.argv[1:])
