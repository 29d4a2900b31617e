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

Beyond the reference's reach, two more mesh axes compose with ``data``:

- ``replica`` (``num_slices > 1``): multi-slice DCN scaling — batch shards
  over (replica, data); XLA reduces hierarchically (ICI within a slice,
  DCN across).
- ``spatial`` (``spatial_partitions > 1``): image-height SPMD partitioning
  for megapixel inputs — the H axis of every image/label shards across
  chips, and XLA inserts the conv halo exchanges (collective-permute) and
  global-stat all-reduces automatically. This directly lifts the
  max-trainable-image-size ceiling the reference documents
  (input_vistas.py:7-10: 4 GPUs capped at 1240x1710 with Nb=4); per-chip
  activation memory falls by the spatial factor.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "create_mesh",
    "batch_axes",
    "batch_sharding",
    "image_sharding",
    "replicated_sharding",
    "shard_batch",
    "replicate",
    "local_batch_size",
]

DATA_AXIS = "data"
REPLICA_AXIS = "replica"  # multi-slice (DCN) outer axis
SPATIAL_AXIS = "spatial"  # image-height partitioning (megapixel inputs)


def create_mesh(
    num_devices: Optional[int] = None,
    devices=None,
    num_slices: int = 1,
    spatial_partitions: int = 1,
) -> Mesh:
    """Mesh over the first ``num_devices`` devices.

    Axis layout by configuration (unused axes omitted):
    ``('replica',)? + ('data',) + ('spatial',)?`` — batch shards over
    replica+data, image height over spatial. Slices are taken contiguously
    from the device list (JAX orders devices slice-major); within a slice,
    spatial neighbors are adjacent devices so halo exchanges ride the
    shortest ICI hops.
    """
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    devices = np.asarray(devices)
    n = len(devices)
    if num_slices * spatial_partitions > n or n % (num_slices * spatial_partitions):
        raise ValueError(
            f"{n} devices not divisible into {num_slices} slices x "
            f"{spatial_partitions} spatial partitions."
        )
    shape, names = [], []
    if num_slices > 1:
        shape.append(num_slices)
        names.append(REPLICA_AXIS)
    shape.append(n // (num_slices * spatial_partitions))
    names.append(DATA_AXIS)
    if spatial_partitions > 1:
        shape.append(spatial_partitions)
        names.append(SPATIAL_AXIS)
    if len(names) == 1:
        return Mesh(devices, (DATA_AXIS,))
    return Mesh(devices.reshape(shape), tuple(names))


def batch_axes(mesh: Mesh) -> tuple:
    """The mesh axes the batch dimension shards over (all but spatial)."""
    return tuple(a for a in mesh.axis_names if a != SPATIAL_AXIS)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across every non-spatial mesh axis."""
    return NamedSharding(mesh, P(batch_axes(mesh)))


def image_sharding(mesh: Mesh) -> NamedSharding:
    """Batch on (replica, data); image height on 'spatial' when present."""
    if SPATIAL_AXIS in mesh.axis_names:
        return NamedSharding(mesh, P(batch_axes(mesh), SPATIAL_AXIS))
    return batch_sharding(mesh)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _put(x, sharding):
    from iv2019_tpu.parallel.multihost import put_sharded

    return put_sharded(x, sharding)


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """device_put a pytree of host arrays with batch(+spatial) sharding.

    Every batch entry is [N, H, ...] (images [N,H,W,3], sparse labels
    [N,H,W], multinomial labels [N,H,W,C]), so with a spatial axis dim 1
    shards too (when divisible). Zero-size leaves (empty weak sub-batches)
    are replicated — XLA cannot shard an empty axis.
    """
    bs = batch_sharding(mesh)
    ims = image_sharding(mesh)
    rs = replicated_sharding(mesh)
    n_sp = mesh.shape.get(SPATIAL_AXIS, 1)

    def pick(path, x):
        shape = np.shape(x)
        if not shape or shape[0] == 0:
            return rs
        # only rank>=3 arrays whose dim 1 is image height shard spatially
        # (images [N,H,W,3], labels [N,H,W(,C)]); a [N,C] array with
        # divisible C and the padded box tensors bbox_coords (N,516,4)
        # must not get dim 1 labeled 'spatial' (silent resharding every
        # step). Box tensors are recognized by their batch key.
        key = path[-1].key if path and hasattr(path[-1], "key") else ""
        if (
            len(shape) >= 3
            and not str(key).startswith("bbox")
            and shape[1] % n_sp == 0
        ):
            return ims
        return bs

    return jax.tree_util.tree_map_with_path(
        lambda p, x: _put(x, pick(p, x)), batch
    )


def replicate(tree: Any, mesh: Mesh) -> Any:
    return jax.device_put(tree, replicated_sharding(mesh))


def local_batch_size(global_nb: int, mesh: Mesh) -> int:
    """get_temp_Nb parity: per-device batch; global must divide evenly.

    Only the non-spatial axes consume batch items (a spatial group of
    chips shares each image, split along H).
    """
    n = math.prod(mesh.shape[a] for a in batch_axes(mesh))
    div, mod = divmod(global_nb, n)
    if mod:
        raise ValueError(f"batch size {global_nb} not divisible by {n} batch shards.")
    return div
