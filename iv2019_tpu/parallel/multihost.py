"""Multi-host (multi-process) SPMD support.

The reference is strictly single-host (MirroredStrategy over local GPUs,
reference system_factory.py:279-283). TPU pods beyond one host (any slice
larger than 8 chips) are multi-PROCESS: every host runs the same program,
sees only its local chips, and JAX stitches them into one global device
list after ``jax.distributed.initialize``. This module is the thin layer
that makes the rest of the framework process-count-agnostic:

- ``initialize(settings)``: bring up the JAX distributed runtime from the
  ``--coordinator_address/--num_processes/--process_id`` flags (explicit
  clusters) or automatically on TPU pod slices (no flags needed there —
  JAX reads the TPU metadata).
- ``put_sharded(x, sharding)``: the single entry point for host->device
  batch/state placement. Single-process it is ``jax.device_put``; multi-
  process it assembles a global ``jax.Array`` from each process's local
  shard via ``jax.make_array_from_process_local_data`` (the data-parallel
  contract: every process feeds exactly its addressable slice of the
  global batch).
- ``local_share(n)`` / ``shard_records(it)``: input-pipeline helpers —
  each process reads a disjoint stride of the record stream and produces
  ``global_Nb / process_count`` examples per step.
- ``is_primary()``: gates filesystem side effects (checkpoints, metric
  logs, profiler traces, settings.txt) to process 0, matching the
  chief-only semantics of the reference's Estimator.

Everything under ``jit`` is already global-view SPMD, so no training-step
code changes across 1 or N processes; gradient all-reduce and sync-BN ride
ICI within a host and DCN across hosts exactly as laid out by the mesh
(parallel/mesh.py).
"""

from __future__ import annotations

import itertools
from typing import Iterable, Iterator, Optional

import jax
import numpy as np

__all__ = [
    "initialize",
    "process_index",
    "process_count",
    "is_primary",
    "local_share",
    "shard_records",
    "put_sharded",
]

_initialized = False


def initialize(settings=None) -> None:
    """Bring up the JAX distributed runtime (idempotent).

    Three configurations:

    - explicit cluster: ``--coordinator_address host:port --num_processes N
      --process_id i`` on every process (the generic path; also what the
      multi-process tests use on CPU).
    - TPU pod slice: ``--num_processes 0`` ("auto") — calls
      ``jax.distributed.initialize()`` with no arguments; JAX discovers
      coordinator/count/id from the TPU VM metadata.
    - single process (default ``num_processes=1``, no coordinator): no-op.
    """
    global _initialized
    if _initialized:
        return
    if settings is None:
        return
    coord = getattr(settings, "coordinator_address", "") or ""
    nproc = getattr(settings, "num_processes", 1)
    if nproc == 0:  # auto-detect (TPU pod)
        jax.distributed.initialize()
        _initialized = True
    elif coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=nproc,
            process_id=getattr(settings, "process_id", 0),
        )
        _initialized = True
    elif nproc > 1:
        raise ValueError(
            "num_processes > 1 requires --coordinator_address host:port "
            "(or --num_processes 0 for TPU-pod auto-detection)."
        )


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_primary() -> bool:
    """True on the process that owns filesystem side effects (chief)."""
    return jax.process_index() == 0


def local_share(n_global: int, what: str = "batch size") -> int:
    """Per-process item count: global // process_count, exact division.

    The per-device count is further constrained by the mesh
    (parallel/mesh.local_batch_size); this is only the host-pipeline split.
    """
    pc = jax.process_count()
    div, mod = divmod(n_global, pc)
    if mod:
        raise ValueError(
            f"global {what} {n_global} not divisible by {pc} processes."
        )
    return div


def shard_records(it: Iterable, index: Optional[int] = None,
                  count: Optional[int] = None) -> Iterator:
    """Disjoint stride of a record stream for this process.

    Record k goes to process ``k % process_count`` — the standard
    shard-by-stride input split (each process sees ~1/P of every epoch,
    no coordination needed).
    """
    index = jax.process_index() if index is None else index
    count = jax.process_count() if count is None else count
    if count == 1:
        return iter(it)
    return itertools.islice(iter(it), index, None, count)


def put_sharded(x, sharding):
    """Place a host array on devices with ``sharding`` (process-agnostic).

    Single-process: ``jax.device_put`` (async H2D DMA). Multi-process: the
    host array is this process's LOCAL portion — exactly the concatenation
    of its addressable shards of the global array (a batch-sharded leaf is
    the local sub-batch; a replicated leaf is the full array, identical on
    every process). ``make_array_from_process_local_data`` validates that
    contract and infers the global shape from the sharding.
    """
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    device_set = getattr(sharding, "device_set", None)
    if device_set is not None and all(
        d.process_index == jax.process_index() for d in device_set
    ):
        # fully addressable (e.g. the per-process local mesh the
        # multi-process eval sweep runs on): plain async H2D put
        return jax.device_put(x, sharding)
    return jax.make_array_from_process_local_data(sharding, np.asarray(x))
