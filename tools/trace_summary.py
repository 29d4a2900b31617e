"""Summarize a jax.profiler chrome trace against a dumped HLO text.

Usage: python tools/trace_summary.py TRACE_DIR [HLO_TXT] [steps]

Aggregates device op time from the trace's vm.trace.json.gz, maps fusion
names to their HLO metadata (layer op_name), and prints buckets + top layers.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import re
import sys


def load_trace(trace_dir: str, steps: int):
    f = glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz")[0]
    ev = json.load(gzip.open(f))["traceEvents"]
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name" and "args" in e
    }
    agg = collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and pids.get(e["pid"], "").startswith("/device:TPU"):
            n = e.get("name", "")
            if n.startswith("jit_") or (len(n) <= 2 and n.isdigit()):
                continue
            agg[n] += e.get("dur", 0)
    return agg


def load_timeline(trace_dir: str):
    """Per-step device busy/idle accounting from the trace timeline.

    Returns {steps, span_ms, busy_ms, idle_ms, gaps}: span is the mean
    module-execution wall per step (from the "XLA Modules" lane), busy the
    union of op-lane intervals inside it, idle their difference, and gaps
    the largest per-step idle holes with the op names flanking them.
    VERDICT r4 next-#2: separates "ops run slower in-graph than standalone"
    (inside op durations) from "the compute stream sits idle" (between ops).
    """
    f = glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz")[0]
    ev = json.load(gzip.open(f))["traceEvents"]
    pids = {}
    tids = {}
    for e in ev:
        if e.get("ph") != "M" or "args" not in e:
            continue
        if e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
        elif e.get("name") == "thread_name":
            tids[(e["pid"], e.get("tid"))] = e["args"].get("name", "")

    modules, ops = [], []
    for e in ev:
        if e.get("ph") != "X":
            continue
        if not pids.get(e["pid"], "").startswith("/device:TPU"):
            continue
        lane = tids.get((e["pid"], e.get("tid")), "")
        item = (e["ts"], e["ts"] + e.get("dur", 0), e.get("name", ""))
        if "Module" in lane:
            modules.append(item)
        elif "Op" in lane or "Step" not in lane:
            ops.append(item)
    if not modules:  # fall back: treat the longest-name group as modules
        by_name = collections.defaultdict(list)
        for it in ops:
            by_name[it[2]].append(it)
        if by_name:
            name = max(by_name, key=lambda n: sum(b - a for a, b, _ in by_name[n]))
            modules = by_name.pop(name)
            ops = [it for its in by_name.values() for it in its]
    modules.sort()
    ops.sort()

    steps = []
    for m0, m1, _ in modules:
        inside = [(max(a, m0), min(b, m1), n) for a, b, n in ops
                  if b > m0 and a < m1]
        inside.sort()
        busy = 0.0
        gaps = []
        cur_end = m0
        cur_name = "(module start)"
        for a, b, n in inside:
            if a > cur_end:
                gaps.append((a - cur_end, cur_name, n))
            if b > cur_end:
                busy += b - max(a, cur_end)
                cur_end = b
                cur_name = n
        if m1 > cur_end:
            gaps.append((m1 - cur_end, cur_name, "(module end)"))
        steps.append({"span": m1 - m0, "busy": busy,
                      "gaps": sorted(gaps, reverse=True)[:8]})
    if not steps:
        return None
    span = sum(s["span"] for s in steps) / len(steps) / 1e3
    busy = sum(s["busy"] for s in steps) / len(steps) / 1e3
    mid = steps[len(steps) // 2]  # a representative (steady-state) step
    return {
        "steps": len(steps),
        "span_ms": round(span, 2),
        "busy_ms": round(busy, 2),
        "idle_ms": round(span - busy, 2),
        "gaps": [
            {"ms": round(g / 1e3, 3), "after": a[:90], "before": b[:90]}
            for g, a, b in mid["gaps"]
        ],
    }


def load_hlo_info(hlo_path: str):
    info = {}
    for ln in open(hlo_path):
        s = ln.strip()
        m = re.match(r"(?:ROOT )?%([\w\.\-_]+) = ", s)
        if not m:
            continue
        op_name = re.search(r'op_name="([^"]+)"', s)
        info[m.group(1)] = op_name.group(1) if op_name else ""
    return info


def main():
    trace_dir = sys.argv[1]
    hlo_path = sys.argv[2] if len(sys.argv) > 2 else None
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    agg = load_trace(trace_dir, steps)
    info = load_hlo_info(hlo_path) if hlo_path else {}

    def layer(n):
        o = info.get(n, info.get(n.split(".remat")[0], ""))
        return o.replace("jit(train_step)/", "")

    total = sum(agg.values())
    print(f"total device time/step: {total/steps/1e3:.1f} ms")
    remat = sum(d for n, d in agg.items() if ".remat" in n)
    print(f"remat: {remat/steps/1e3:.1f} ms")

    if info:
        buckets = collections.Counter()
        for n, d in agg.items():
            o = layer(n)
            if "conv_general_dilated" in o:
                if "conv2/conv" in o:
                    b = "conv3x3"
                elif "base/conv1/" in o:
                    b = "rootconv"
                elif any(k in o for k in ("conv1/conv", "conv3/conv", "shortcut",
                                          "decrease_fdims", "softmax_classifier",
                                          "adaptation")):
                    b = "conv1x1"
                else:
                    b = "conv_other"
            elif "_upsample" in o:
                b = "upsample"
            elif o == "":
                b = "(noname)"
            else:
                b = "other"
            buckets[b] += d
        print("\n== buckets (ms/step) ==")
        for k, v in buckets.most_common():
            print(f"{v/steps/1e3:8.2f}  {k}")

        bylayer = collections.Counter()
        for n, d in agg.items():
            bylayer[layer(n)[:130]] += d
        print("\n== top 30 layers ==")
        for k, v in bylayer.most_common(30):
            print(f"{v/steps/1e3:8.2f}  {k}")
    else:
        print("\n== top 30 ops ==")
        for n, d in agg.most_common(30):
            print(f"{d/steps/1e3:8.2f}  {n[:100]}")


if __name__ == "__main__":
    main()
