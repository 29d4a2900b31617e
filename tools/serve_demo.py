"""End-to-end C++ serving demo: export StableHLO, serve it through PJRT.

Usage:
  python tools/serve_demo.py [--height 256 --width 512] [--tiny] [--iters 10]

1. Builds the hierarchical model (flagship ResNet-50, or a tiny stack with
   --tiny for a fast smoke), initializes parameters, exports the forward
   pass as StableHLO (iv2019_tpu/tools/export_model.export_stablehlo).
2. Compiles iv2019_tpu/serving/pjrt_loader.cc (build-on-demand) and runs it
   against the discovered PJRT plugin — a pure C++ process executing the
   model on the TPU, no Python/JAX in the serving path.

Run this when the chip is otherwise idle (single-client constraint).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--stream", action="store_true",
                   help="persistent-server mode: send --iters frames over pipes")
    p.add_argument("--batch", type=int, default=1,
                   help="requests per frame (compiled batch dim N)")
    p.add_argument("--u8", action="store_true",
                   help="uint8 wire input (export wire_u8): 4x less transfer")
    p.add_argument("--pipelined", action="store_true",
                   help="with --stream: measure pipelined req/s (infer_many) "
                        "in addition to sequential p50")
    p.add_argument("--out_dir", default=None)
    p.add_argument("--module", default=None,
                   help="path to an existing forward.stablehlo.mlir from a "
                        "previous run (skips model build + export; the "
                        "height/width/batch/u8 flags must match the export)")
    args = p.parse_args()

    import jax

    # Export on CPU: StableHLO is platform-neutral, and the parent process
    # must NOT hold a TPU client while the C++ loader creates its own
    # (single-client constraint on the tunneled chip — verify skill notes).
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from iv2019_tpu import serving
    from iv2019_tpu.models.model import HierarchicalSegmentationModel, build_model
    from iv2019_tpu.problem.taxonomy import get_taxonomy
    from iv2019_tpu.tools.export_model import export_stablehlo
    from iv2019_tpu.config import Settings

    h, w = args.height, args.width
    if args.module:
        nb = args.batch
        shape = (nb, h, w, 3)
        paths = {"stablehlo": args.module}
        print(f"reusing export {args.module}")
        return _drive(args, paths, shape)
    if args.tiny:
        model = HierarchicalSegmentationModel(
            taxonomy=get_taxonomy("cityscapes"),
            resnet_blocks=((1, 32, 8), (1, 64, 16), (1, 96, 24), (1, 128, 32)),
            feature_dims_decreased=16,
        )
    else:
        model = build_model(Settings(
            per_pixel_dataset_name="cityscapes", mode="predict",
            height_feature_extractor=h, width_feature_extractor=w,
        ))
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3), jnp.float32)
    )
    nb = args.batch
    shape = (nb, h, w, 3)
    out_dir = args.out_dir or tempfile.mkdtemp(prefix="serve_demo_")
    paths = export_stablehlo(model, variables, shape, out_dir, wire_u8=args.u8)
    size_mb = os.path.getsize(paths["stablehlo"]) / 1e6
    print(f"exported {paths['stablehlo']} ({size_mb:.1f} MB, batch {nb}, "
          f"{'u8' if args.u8 else 'f32'} wire)")
    return _drive(args, paths, shape)


def _drive(args, paths, shape):
    from iv2019_tpu import serving

    nb = shape[0]
    if args.stream:
        import time

        import numpy as np

        rng = np.random.RandomState(0)
        dtype = "uint8" if args.u8 else "float32"

        def _frame():
            if args.u8:
                return rng.randint(0, 256, shape, dtype=np.uint8)
            return rng.uniform(-1, 1, shape).astype(np.float32)

        lat = []
        with serving.StreamServer(
            paths["stablehlo"], shape, input_dtype=dtype
        ) as srv:
            for i in range(args.iters):
                frame = _frame()
                t0 = time.perf_counter()
                out = srv.infer(frame)
                lat.append((time.perf_counter() - t0) * 1e3)
                if i == 0:
                    print(f"first request (incl. compile): {lat[0]:.0f} ms, "
                          f"output0 {len(out)} bytes", file=sys.stderr)
            pipelined = None
            if args.pipelined:
                frames = [_frame() for _ in range(args.iters)]
                t0 = time.perf_counter()
                outs = srv.infer_many(frames)
                dt = time.perf_counter() - t0
                pipelined = {
                    "req_per_s": round(len(outs) / dt, 2),
                    "img_per_s": round(len(outs) * nb / dt, 2),
                }
        steady = sorted(lat[1:]) or lat
        print(json.dumps({
            "metric": "pjrt_stream_p50_latency_ms",
            "value": round(steady[len(steady) // 2], 2),
            "unit": "ms",
            "detail": {"requests": len(lat), "first_ms": round(lat[0], 1),
                       "output0_bytes": len(out), "batch": nb,
                       "wire": "u8" if args.u8 else "f32",
                       "pipelined": pipelined},
        }))
        return

    report = serving.serve(
        paths["stablehlo"], shape, iters=args.iters,
        input_dtype="uint8" if args.u8 else "float32",
    )
    stderr = report.pop("stderr", "")
    print(stderr, file=sys.stderr)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
