"""Checkpointing: orbax save/restore + ImageNet warm-start conversion.

Replaces the reference's three checkpoint mechanisms
(SURVEY.md §5.4; reference define_savers.py, define_initializers.py):

1. periodic train checkpoints — orbax CheckpointManager, one per epoch by
   default, unbounded retention (reference system_factory.py:246-248,287-295)
2. warm start from slim ``resnet_v1_50`` ImageNet weights by name mapping
   with the reference's exclusion list (define_initializers.py:100-105);
   accepts an ``.npz`` of slim variables, with an optional TF-checkpoint ->
   npz converter that uses TensorFlow only if it is importable
3. EMA shadow restore for eval/predict (--restore_emas): the EMA pytree is
   part of the saved state; ``debiased`` params are materialized on demand
   (define_savers.py:38-66 name-remap equivalent)
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

__all__ = [
    "CheckpointManager",
    "slim_name_to_flax_path",
    "warm_start_from_npz",
    "convert_tf_checkpoint_to_npz",
]

# reference define_initializers.py:100-105
WARM_START_EXCLUSIONS = (
    "global_step",
    "train_ops",
    "ExponentialMovingAverage",
    "Momentum",
    "classifier",
    "extension",
    "psp",
)


class CheckpointManager:
    """Thin orbax wrapper bound to a log_dir.

    ``async_save=True`` overlaps the checkpoint write with subsequent
    training steps (orbax's background thread): ``save`` returns after
    the host copy is snapshotted, and the write is awaited before any
    read (``latest_step``/``restore``) and in ``close``. The reference's
    Estimator saver blocks the step loop for the full write
    (system_factory.py:287-295); on TPU pods async saves are the norm.
    """

    def __init__(self, log_dir: str, keep: Optional[int] = None,
                 async_save: bool = False):
        self._dir = os.path.abspath(os.path.join(log_dir, "checkpoints"))
        os.makedirs(self._dir, exist_ok=True)
        self._async = async_save
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(max_to_keep=keep, create=True),
        )

    def save(self, step: int, state: Any, force: bool = False) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state), force=force)
        if not self._async:
            self._mgr.wait_until_finished()

    def wait_until_finished(self) -> None:
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        self._mgr.wait_until_finished()  # an in-flight save IS the latest
        return self._mgr.latest_step()

    def all_steps(self) -> list[int]:
        self._mgr.wait_until_finished()
        return list(self._mgr.all_steps())

    def restore(self, step: Optional[int] = None, template: Any = None) -> Any:
        self._mgr.wait_until_finished()
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self._dir}")
        if template is not None:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(template)
            )
        return self._mgr.restore(step)

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()


# --- ImageNet warm start ---------------------------------------------------


def slim_name_to_flax_path(name: str) -> Optional[tuple[str, ...]]:
    """Map a slim resnet_v1_50 variable name to our flax tree path.

    Examples:
      resnet_v1_50/conv1/weights
        -> ('params', 'feature_extractor/base', 'conv1', 'conv', 'kernel')
      resnet_v1_50/block1/unit_1/bottleneck_v1/conv2/BatchNorm/gamma
        -> ('params', 'feature_extractor/base', 'block1/unit_1', 'conv2',
            'norm', 'BatchNorm', 'scale')
      .../BatchNorm/moving_mean -> ('batch_stats', ..., 'BatchNorm', 'mean')
    """
    name = name.split(":")[0]
    if any(e in name for e in WARM_START_EXCLUSIONS):
        return None
    m = re.match(r"(?:.*?)?resnet_v1_(?:50|101|152)/(.*)", name)
    if not m:
        return None
    rest = m.group(1)

    bn_map = {
        "gamma": ("params", "scale"),
        "beta": ("params", "bias"),
        "moving_mean": ("batch_stats", "mean"),
        "moving_variance": ("batch_stats", "var"),
    }
    base = "feature_extractor/base"

    # root conv
    m = re.match(r"conv1/weights$", rest)
    if m:
        return ("params", base, "conv1", "conv", "kernel")
    m = re.match(r"conv1/BatchNorm/(\w+)$", rest)
    if m and m.group(1) in bn_map:
        col, leaf = bn_map[m.group(1)]
        return (col, base, "conv1_norm", "BatchNorm", leaf)

    # block units
    m = re.match(
        r"(block\d+)/(unit_\d+)/bottleneck_v1/(conv\d|shortcut)/(weights|BatchNorm/\w+)$",
        rest,
    )
    if m:
        block, unit, conv, tail = m.groups()
        module = f"{block}/{unit}"
        if tail == "weights":
            return ("params", base, module, conv, "conv", "kernel")
        bn_leaf = tail.split("/")[1]
        if bn_leaf in bn_map:
            col, leaf = bn_map[bn_leaf]
            return (col, base, module, conv, "norm", "BatchNorm", leaf)
    return None


def _get_path(tree, path):
    node = tree
    for p in path:
        node = node[p]
    return node


def _set_path(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node[p]
    node[path[-1]] = value


def warm_start_from_npz(
    params: Any, batch_stats: Any, npz_path: str
) -> tuple[Any, Any, int]:
    """Initialize backbone variables from an npz of slim variable names.

    Shape-checked name mapping (the reference's substring+shape matching,
    define_initializers.py:83-128). Returns (params, batch_stats,
    num_restored). Unmatched model variables keep their random init.
    """
    arrays = np.load(npz_path)
    params = jax.tree.map(lambda x: x, params)  # shallow copy as dicts
    params = jax.tree_util.tree_map(np.asarray, params)
    batch_stats = jax.tree_util.tree_map(np.asarray, batch_stats)
    tree = {"params": params, "batch_stats": batch_stats}

    restored = 0
    for name in arrays.files:
        path = slim_name_to_flax_path(name)
        if path is None:
            continue
        try:
            current = _get_path(tree, path)
        except KeyError:
            continue
        value = arrays[name]
        if value.shape != current.shape:
            raise ValueError(
                f"shape mismatch for {name}: ckpt {value.shape} vs model "
                f"{current.shape}"
            )
        _set_path(tree, path, value.astype(current.dtype))
        restored += 1
    return tree["params"], tree["batch_stats"], restored


def convert_tf_checkpoint_to_npz(ckpt_path: str, out_path: str) -> int:
    """One-time TF checkpoint -> npz conversion (requires TensorFlow)."""
    import tensorflow as tf  # optional tool-time dependency

    reader = tf.train.load_checkpoint(ckpt_path)
    shapes = reader.get_variable_to_shape_map()
    out = {}
    for name in shapes:
        if any(e in name for e in WARM_START_EXCLUSIONS):
            continue
        out[name] = reader.get_tensor(name)
    np.savez(out_path, **out)
    return len(out)
