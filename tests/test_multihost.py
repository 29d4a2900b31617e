"""Multi-host (multi-process) SPMD training (parallel/multihost.py).

The reference is single-host only (MirroredStrategy,
reference system_factory.py:279-283); TPU pods beyond 8 chips are
multi-process. These tests run a REAL 2-process JAX cluster on CPU
(2 local devices each -> a 4-device global mesh, gloo collectives) through
the actual code paths — multihost.initialize from Settings flags,
per-process local batches assembled by input/prefetch._to_device via
jax.make_array_from_process_local_data, replicated state placement — and
pin that the result matches the single-process 4-device run on the same
global batch.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from iv2019_tpu.config import Settings
from iv2019_tpu.parallel import multihost

pytestmark = pytest.mark.slow  # multi-second tier; see pytest.ini

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_worker(extra_args, timeout=600):
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_PLATFORM_NAME")}
    return subprocess.Popen(
        [sys.executable, WORKER, *extra_args],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
    )


def _result(proc, timeout=600):
    out, _ = proc.communicate(timeout=timeout)
    assert proc.returncode == 0, out
    for line in out.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise AssertionError(f"no RESULT line in:\n{out}")


def test_two_process_matches_single_process():
    port = _free_port()
    procs = [
        _run_worker(["--pid", str(i), "--nproc", "2", "--port", str(port)])
        for i in range(2)
    ]
    ref_proc = _run_worker([])
    res = [_result(p) for p in procs]
    ref = _result(ref_proc)

    # both processes observe the same replicated losses/params
    assert res[0]["losses"] == pytest.approx(res[1]["losses"], rel=1e-6)
    assert res[0]["param_sq_norm"] == pytest.approx(
        res[1]["param_sq_norm"], rel=1e-6
    )
    # and they match the single-process run on the same global batch
    # (cross-process gloo all-reduce vs in-process reduction ordering)
    assert res[0]["losses"] == pytest.approx(ref["losses"], rel=2e-4)
    assert res[0]["param_sq_norm"] == pytest.approx(
        ref["param_sq_norm"], rel=2e-4
    )


def test_two_process_composes_with_spatial_partitioning():
    """Multi-host 'data' axis (across processes) x 'spatial' axis (within
    each process's local devices): the composed mesh must reproduce the
    single-process spatial run — gradient all-reduce crosses processes
    while conv halo exchanges stay process-local (parallel/mesh.py
    device-order guarantee)."""
    port = _free_port()
    procs = [
        _run_worker(["--pid", str(i), "--nproc", "2", "--port", str(port),
                     "--spatial", "2"])
        for i in range(2)
    ]
    ref_proc = _run_worker(["--spatial", "2"])
    res = [_result(p) for p in procs]
    ref = _result(ref_proc)

    assert res[0]["losses"] == pytest.approx(res[1]["losses"], rel=1e-6)
    assert res[0]["losses"] == pytest.approx(ref["losses"], rel=2e-4)
    assert res[0]["param_sq_norm"] == pytest.approx(
        ref["param_sq_norm"], rel=2e-4
    )


def test_two_process_composes_with_multislice():
    """Multi-host processes x multi-slice 'replica' (DCN) axis: with 2
    processes of 2 local devices and num_slices=2 the global mesh is
    (replica=2, data=2) with one whole process per slice (contiguous
    device order, parallel/mesh.create_mesh docstring) — the gradient
    all-reduce crosses processes on the replica axis while 'data' stays
    process-local. Losses and params must reproduce the single-process
    2-slice run on the same global batch."""
    port = _free_port()
    procs = [
        _run_worker(["--pid", str(i), "--nproc", "2", "--port", str(port),
                     "--slices", "2"])
        for i in range(2)
    ]
    ref_proc = _run_worker(["--slices", "2"])
    res = [_result(p) for p in procs]
    ref = _result(ref_proc)

    assert res[0]["losses"] == pytest.approx(res[1]["losses"], rel=1e-6)
    assert res[0]["losses"] == pytest.approx(ref["losses"], rel=2e-4)
    assert res[0]["param_sq_norm"] == pytest.approx(
        ref["param_sq_norm"], rel=2e-4
    )


def test_local_share_and_shard_records_single_process():
    assert multihost.local_share(8) == 8  # process_count() == 1 here
    assert list(multihost.shard_records(range(5))) == [0, 1, 2, 3, 4]
    assert list(multihost.shard_records(range(7), index=1, count=3)) == [1, 4]
    assert list(multihost.shard_records(range(7), index=0, count=3)) == [0, 3, 6]


def test_settings_validation():
    with pytest.raises(ValueError, match="coordinator_address"):
        Settings(num_processes=2).finalize().validate()
    with pytest.raises(ValueError, match="process_id"):
        Settings(num_processes=2, coordinator_address="h:1",
                 process_id=5).finalize().validate()
    with pytest.raises(ValueError, match="num_processes"):
        Settings(num_processes=3, coordinator_address="h:1",
                 Nb_per_pixel=4, Nb_per_bbox=4,
                 Nb_per_image=4).finalize().validate()
    # 0 = TPU-pod auto-detection is a valid configuration
    Settings(num_processes=0).finalize().validate()


EVAL_WORKER = os.path.join(HERE, "multihost_eval_worker.py")


def test_two_process_eval_sweep_matches_single_process(tmp_path):
    """--eval_all_ckpts across 2 processes: each evaluates a disjoint slice
    of the checkpoint list on its own local mesh; the allgathered merge
    must equal the single-process sweep, on every process (system.py
    evaluate; pod-scale analog of reference system_factory.py:378-397)."""
    log_dir = str(tmp_path / "log")

    def _run(extra):
        env = {k: v for k, v in os.environ.items()
               if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_PLATFORM_NAME")}
        return subprocess.Popen(
            [sys.executable, EVAL_WORKER, "--log_dir", log_dir, *extra],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )

    # reference run first: trains the tiny model (2 checkpoints) then sweeps
    ref = _result(_run([]))
    assert len(ref["steps"]) == 2

    port = _free_port()
    procs = [
        _run(["--pid", str(i), "--nproc", "2", "--port", str(port)])
        for i in range(2)
    ]
    res = [_result(p) for p in procs]

    for r in res:
        assert r["steps"] == ref["steps"]
        # integer confusion-matrix content must merge exactly
        assert r["cm_sums"] == ref["cm_sums"]
        assert r["mean_ious"] == pytest.approx(ref["mean_ious"], rel=1e-4)
        assert r["global_accuracies"] == pytest.approx(
            ref["global_accuracies"], rel=1e-4
        )
    # both processes hold the identical merged sweep
    assert res[0]["mean_ious"] == pytest.approx(res[1]["mean_ious"], rel=1e-9)
