"""Static fused-block coverage table (VERDICT r4 next-#3 "done" artifact).

Walks the backbone's slim unit plan at a given input shape and reports,
per block, how many units run fused under --fused_block and through which
kernel (full-window vs channel-tiled rolling), using the exact dispatch
gates of models/layers.BottleneckV1._fused_path.

Usage: python tools/fused_coverage.py [N H W] [backbone]
       (defaults: 1 512 1024 resnet_v1_50 — the flagship predict shape)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iv2019_tpu.models.resnet import FEATURE_EXTRACTOR_BLOCKS, _unit_plan
from iv2019_tpu.ops.pallas_block import (
    fused_bottleneck_supported,
    pick_ct_config,
)


def coverage(n=1, h=512, w=1024, backbone="resnet_v1_50", output_stride=8):
    plan = _unit_plan(FEATURE_EXTRACTOR_BLOCKS[backbone], output_stride)
    # feature-map size entering block1 = input / 4 (root conv + pool)
    fh, fw = h // 4, w // 4
    rows = []
    depth_in = 64 * 4 // 4  # root conv outputs 64; block1 projects to 256
    depth_in = 64
    for bi, units in enumerate(plan):
        fused_full = fused_ct = identity = 0
        for depth, mid, stride, rate in units:
            is_identity = stride == 1 and depth_in == depth
            if is_identity:
                identity += 1
                if fused_bottleneck_supported(n, fh, fw, depth, mid, rate):
                    fused_full += 1
                elif pick_ct_config(n, fh, fw, depth, mid, rate):
                    fused_ct += 1
            if stride > 1:
                fh, fw = fh // stride, fw // stride
            depth_in = depth
        rows.append({
            "block": f"block{bi + 1}",
            "units": len(units),
            "identity_units": identity,
            "fused_full_window": fused_full,
            "fused_channel_tiled": fused_ct,
            "unfused": len(units) - fused_full - fused_ct,
        })
    total = {
        "units": sum(r["units"] for r in rows),
        "fused": sum(r["fused_full_window"] + r["fused_channel_tiled"]
                     for r in rows),
    }
    return rows, total


def main():
    args = sys.argv[1:]
    n, h, w = (int(x) for x in args[:3]) if len(args) >= 3 else (1, 512, 1024)
    backbone = args[3] if len(args) > 3 else "resnet_v1_50"
    rows, total = coverage(n, h, w, backbone)
    print(f"fused-block coverage at N={n} {h}x{w} {backbone}:")
    print("| block | units | identity | fused (full-window) | "
          "fused (channel-tiled) | unfused |")
    print("|---|---:|---:|---:|---:|---:|")
    for r in rows:
        print(f"| {r['block']} | {r['units']} | {r['identity_units']} | "
              f"{r['fused_full_window']} | {r['fused_channel_tiled']} | "
              f"{r['unfused']} |")
    print(f"| **total** | {total['units']} |  | | | "
          f"**{total['units'] - total['fused']}** |")
    print(json.dumps({"rows": rows, "total": total}))


if __name__ == "__main__":
    main()
