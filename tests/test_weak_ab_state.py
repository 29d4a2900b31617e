"""tools/weak_ab.py cross-session state persistence (no JAX, no chip).

The seeded weak-supervision sweep (VERDICT r3 #3) costs ~2 h of chip time
per 3-seed run; sessions are shorter than that and the /tmp workdir dies
with them. The sweep therefore persists each completed arm's eval metrics
to a --state JSONL (committable into the repo) and never retrains an arm
recorded there. These tests pin that contract.
"""

import importlib.util
import json
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location(
    "weak_ab", os.path.join(REPO, "tools", "weak_ab.py"))
weak_ab = importlib.util.module_from_spec(spec)
spec.loader.exec_module(weak_ab)

CFG = {"rate": 0.2, "n_pp": 24, "n_weak": 256, "n_val": 48, "ne": 48}


def _record(path, arm, seed, coeff, cfg, metrics):
    rec = {"arm": arm, "seed": seed,
           "coeff": coeff if arm == "weak" else None,
           "config": cfg, "metrics": metrics}
    with open(path, "a") as f:
        f.write(json.dumps(rec) + "\n")


def test_state_hit_short_circuits_training(tmp_path):
    sp = str(tmp_path / "arms.jsonl")
    _record(sp, "pp", 0, None, CFG,
            {"mean_iou": 61.0, "ious": np.arange(20.0).tolist()})
    state = weak_ab._load_state(sp)
    # paths={} would crash run_arm anywhere past the state lookup
    out = weak_ab.run_arm(str(tmp_path), {}, "pp", 0, CFG["ne"],
                          coeff=0.1, state=state, state_path=sp, cfg=CFG)
    assert out["mean_iou"] == 61.0


def test_state_misses_on_any_config_change(tmp_path):
    sp = str(tmp_path / "arms.jsonl")
    _record(sp, "pp", 0, None, CFG, {"mean_iou": 61.0})
    state = weak_ab._load_state(sp)
    for delta in ({"rate": 0.5}, {"ne": 24}, {"n_pp": 48}):
        assert weak_ab._state_key("pp", 0, None, {**CFG, **delta}) not in state
    # same config, other arm/seed also miss
    assert weak_ab._state_key("weak", 0, 0.1, CFG) not in state
    assert weak_ab._state_key("pp", 1, None, CFG) not in state


def test_weak_arms_key_on_coefficient_pp_does_not(tmp_path):
    k_pp = weak_ab._state_key("pp", 0, None, CFG)
    # pp arms are coefficient-independent: run_arm passes coeff=None via
    # the arm=="pp" branch of the record, so any coeff hits the same key
    assert weak_ab._state_key("pp", 0, None, CFG) == k_pp
    assert (weak_ab._state_key("weak", 0, 0.1, CFG)
            != weak_ab._state_key("weak", 0, 0.5, CFG))


def test_workdir_completion_is_recorded_to_state(tmp_path):
    # an arm finished in the workdir (eval artifact present) must be
    # harvested into the state file when reused; arm dirs embed the cfg
    # hash so a different-config rerun can never harvest a stale arm
    import pickle
    log_dir = tmp_path / f"pp_s0_{weak_ab._cfg_tag(CFG)}" / "eval_00"
    log_dir.mkdir(parents=True)
    with open(log_dir / "all_metrics.p", "wb") as f:
        pickle.dump([{"mean_iou": 59.5, "ious": [1.0, 2.0]}], f)
    sp = str(tmp_path / "arms.jsonl")
    out = weak_ab.run_arm(str(tmp_path), {}, "pp", 0, CFG["ne"],
                          coeff=0.1, state={}, state_path=sp, cfg=CFG)
    assert out["mean_iou"] == 59.5
    state = weak_ab._load_state(sp)
    assert weak_ab._state_key("pp", 0, None, CFG) in state


def test_missing_state_file_is_empty(tmp_path):
    assert weak_ab._load_state(str(tmp_path / "nope.jsonl")) == {}


def test_corrupt_state_lines_are_skipped(tmp_path):
    # a line truncated by a mid-append crash must not block resume
    sp = str(tmp_path / "arms.jsonl")
    _record(sp, "pp", 0, None, CFG, {"mean_iou": 61.0})
    with open(sp, "a") as f:
        f.write('{"arm": "pp", "seed": 1, "conf\n')   # truncated
        f.write("\n")                                  # blank
        f.write('{"no": "keys"}\n')                    # wrong schema
    state = weak_ab._load_state(sp)
    assert weak_ab._state_key("pp", 0, None, CFG) in state
    assert len(state) == 1


def test_state_is_strict_json(tmp_path):
    # NaN metrics must be written as null (jq/JSON.parse-safe)
    import math
    sp = str(tmp_path / "arms.jsonl")
    # drive _record through run_arm's workdir-harvest path
    import pickle
    log_dir = tmp_path / f"pp_s0_{weak_ab._cfg_tag(CFG)}" / "eval_00"
    log_dir.mkdir(parents=True)
    with open(log_dir / "all_metrics.p", "wb") as f:
        pickle.dump([{"mean_iou": 59.5,
                      "accuracies": [1.0, float("nan")]}], f)
    weak_ab.run_arm(str(tmp_path), {}, "pp", 0, CFG["ne"],
                    coeff=0.1, state={}, state_path=sp, cfg=CFG)
    raw = open(sp).read()
    assert "NaN" not in raw
    rec = json.loads(raw)  # strict parse must succeed
    assert rec["metrics"]["accuracies"][1] is None
    assert not math.isnan(rec["metrics"]["mean_iou"])
