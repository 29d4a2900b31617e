"""Device mesh and sharding layout for SPMD data parallelism.

The reference's distribution strategy is single-host MirroredStrategy data
parallelism with NCCL all-reduce (reference system_factory.py:279-283) and a
hand-rolled cross-replica BatchNorm (cross_replica_batch_normalization.py).

TPU-native equivalent: a 1-D ``jax.sharding.Mesh`` over all chips with the
global batch sharded on the ``data`` axis. Under ``jit`` XLA SPMD inserts
every needed collective over ICI:

- gradient all-reduce: implicit in the sharded reverse-mode grad
- sync-BN: batch statistics are global-batch means by construction
- eval confusion matrices: partial sums reduce when the (K, K) output is
  requested replicated

The per-tower sub-batch contract of the reference (``get_temp_Nb``,
input_pipelines/utils.py:118-124) is preserved by sharding each supervision
type's sub-batch separately: every device sees a proportional slice of
[per_pixel | per_bbox | per_image].
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "create_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "replicate",
    "local_batch_size",
]

DATA_AXIS = "data"
REPLICA_AXIS = "replica"  # multi-slice (DCN) outer axis


def create_mesh(
    num_devices: Optional[int] = None, devices=None, num_slices: int = 1
) -> Mesh:
    """Data-parallel mesh over the first ``num_devices`` devices.

    ``num_slices > 1`` builds the multi-slice layout ('replica', 'data'):
    the outer axis enumerates ICI-disconnected slices (linked over DCN), the
    inner axis the chips within a slice. The batch shards over *both* axes
    (see batch_sharding), so per-batch collectives that reduce scalars
    (loss psums, gradient all-reduce) become a fast within-slice ICI
    reduction followed by a small cross-slice DCN reduction — XLA emits the
    hierarchical collective automatically for a 2-D mesh. Slices are taken
    contiguously from the device list (JAX orders devices slice-major, and
    the CPU test mesh has no slice structure to violate).
    """
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    devices = np.asarray(devices)
    if num_slices <= 1:
        return Mesh(devices, (DATA_AXIS,))
    if len(devices) % num_slices:
        raise ValueError(
            f"{len(devices)} devices not divisible by {num_slices} slices."
        )
    grid = devices.reshape(num_slices, len(devices) // num_slices)
    return Mesh(grid, (REPLICA_AXIS, DATA_AXIS))


def batch_axes(mesh: Mesh) -> tuple:
    """The mesh axes the batch dimension shards over (all of them)."""
    return tuple(mesh.axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard leading (batch) axis across every mesh axis (1-D data mesh or
    2-D multi-slice ('replica', 'data') mesh)."""
    return NamedSharding(mesh, P(batch_axes(mesh)))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _put(x, sharding):
    return jax.device_put(x, sharding)


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """device_put a pytree of host arrays with batch-axis sharding.

    Zero-size leaves (empty weak sub-batches) are replicated — XLA cannot
    shard an empty axis.
    """
    bs = batch_sharding(mesh)
    rs = replicated_sharding(mesh)
    return jax.tree.map(
        lambda x: _put(x, bs if np.shape(x) and np.shape(x)[0] > 0 else rs), batch
    )


def replicate(tree: Any, mesh: Mesh) -> Any:
    return jax.device_put(tree, replicated_sharding(mesh))


def local_batch_size(global_nb: int, mesh: Mesh) -> int:
    """get_temp_Nb parity: per-device batch; global must divide evenly."""
    n = mesh.size
    div, mod = divmod(global_nb, n)
    if mod:
        raise ValueError(f"batch size {global_nb} not divisible by {n} devices.")
    return div
