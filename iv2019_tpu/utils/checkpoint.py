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
    "tf_trained_name_to_flax_path",
    "warm_start_from_npz",
    "restore_trained_from_npz",
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


_BN_LEAF_MAP = {
    "gamma": ("params", "scale"),
    "beta": ("params", "bias"),
    "moving_mean": ("batch_stats", "mean"),
    "moving_variance": ("batch_stats", "var"),
}


def _backbone_rest_to_path(rest: str) -> Optional[tuple[str, ...]]:
    """Map the part after ``resnet_v1_*/`` to our flax tree path."""
    base = "feature_extractor/base"

    # root conv
    if re.match(r"conv1/weights$", rest):
        return ("params", base, "conv1", "conv", "kernel")
    m = re.match(r"conv1/BatchNorm/(\w+)$", rest)
    if m and m.group(1) in _BN_LEAF_MAP:
        col, leaf = _BN_LEAF_MAP[m.group(1)]
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
        if bn_leaf in _BN_LEAF_MAP:
            col, leaf = _BN_LEAF_MAP[bn_leaf]
            return (col, base, module, conv, "norm", "BatchNorm", leaf)
    return None


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
    return _backbone_rest_to_path(m.group(1))


# our conv_norm_relu modules: TF scope suffix -> (flax module name template)
_PSP_CONV_NAMES = {
    "Conv": "conv1",
    "Conv_1": "conv2",
    "Conv_2": "conv3",
    "Conv_3": "conv6",
    "Conv_4": "conv_final",
}
_UPSAMPLING_HEADS = {
    "upsampling": "l1_logits",
    "upsampling_1": "l2_vehicle_logits",
    "upsampling_2": "l2_human_logits",
}


def _cnr_tail_to_path(module: str, tail: str) -> Optional[tuple[str, ...]]:
    """weights / BatchNorm-leaf tail of a conv_norm_relu module -> path."""
    if tail == "weights":
        return ("params", module, "conv", "kernel")
    m = re.match(r"BatchNorm/(\w+)$", tail)
    if m and m.group(1) in _BN_LEAF_MAP:
        col, leaf = _BN_LEAF_MAP[m.group(1)]
        return (col, module, "norm", "BatchNorm", leaf)
    return None


def tf_trained_name_to_flax_path(
    name: str,
) -> Optional[tuple[bool, tuple[str, ...]]]:
    """Map ANY variable of the reference's full trained model to our tree.

    Extends the ImageNet warm-start mapping (``slim_name_to_flax_path``) to
    the whole trained network — the scopes created by
    resnet50_extended_model_hierarchical.py:52-86 and
    resnet50_extended_feature_extractor.py:36-49:

      feature_extractor/resnet_v1_50/...             (backbone)
      feature_extractor/extension/{decrease_fdims,increase_fov}/...
      feature_extractor/pyramid_module/Conv[_k]/...  (optional PSP)
      adaptation_module/{l1,l2_vehicle,l2_human}_features/bottleneck_v1/...
      softmax_classifier/{l1,l2_vehicle,l2_human}_logits/...
      softmax_classifier/upsampling[_k]/Conv2d_transpose/... (hybrid only)

    plus the EMA shadow names the predict/evaluate saver reads when
    ``--restore_emas`` (define_savers.py:44-47):

      exponential_moving_averages/<name>/ExponentialMovingAverage

    Returns ``(is_ema, flax_path)`` or None for non-model variables
    (global_step, Momentum slots, train_ops).
    """
    name = name.split(":")[0]
    is_ema = False
    m = re.match(r"exponential_moving_averages/(.*)/ExponentialMovingAverage$", name)
    if m:
        is_ema, name = True, m.group(1)

    if (
        name in ("global_step",)
        or name.endswith("/Momentum")
        or name.startswith("train_ops")
    ):
        return None

    # backbone (with or without the feature_extractor/ prefix)
    m = re.match(r"(?:feature_extractor/)?resnet_v1_(?:50|101|152)/(.*)", name)
    if m:
        path = _backbone_rest_to_path(m.group(1))
        return (is_ema, path) if path else None

    # extension convs
    m = re.match(
        r"feature_extractor/extension/(decrease_fdims|increase_fov)/(.*)", name
    )
    if m:
        path = _cnr_tail_to_path(f"feature_extractor/extension/{m.group(1)}", m.group(2))
        return (is_ema, path) if path else None

    # PSP pyramid module (slim auto-names: Conv, Conv_1, ..., Conv_4)
    m = re.match(r"feature_extractor/pyramid_module/(Conv(?:_\d)?)/(.*)", name)
    if m and m.group(1) in _PSP_CONV_NAMES:
        module = f"feature_extractor/pyramid_module"
        path = _cnr_tail_to_path(
            _PSP_CONV_NAMES[m.group(1)], m.group(2)
        )
        if path:
            return (is_ema, (path[0], module) + path[1:])
        return None

    # adaptation branches (resnet_v1.bottleneck with explicit scopes)
    m = re.match(
        r"adaptation_module/(l1_features|l2_vehicle_features|l2_human_features)"
        r"/bottleneck_v1/(conv\d|shortcut)/(.*)",
        name,
    )
    if m:
        branch, conv, tail = m.groups()
        path = _cnr_tail_to_path(conv, tail)
        if path:
            return (is_ema, (path[0], f"adaptation_module/{branch}") + path[1:])
        return None

    # logit heads (slim.conv2d with arg-scope BatchNorm, no biases)
    m = re.match(
        r"softmax_classifier/(l1_logits|l2_vehicle_logits|l2_human_logits)/(.*)",
        name,
    )
    if m:
        path = _cnr_tail_to_path(f"softmax_classifier/{m.group(1)}", m.group(2))
        return (is_ema, path) if path else None

    # hybrid upsampler transpose convs (slim auto-uniquified scopes; called
    # once per head in l1/vehicle/human order — reference :85-86,164-180)
    m = re.match(
        r"softmax_classifier/(upsampling(?:_\d)?)/Conv2d_transpose/(weights|biases)$",
        name,
    )
    if m and m.group(1) in _UPSAMPLING_HEADS:
        head = _UPSAMPLING_HEADS[m.group(1)]
        module = f"softmax_classifier/{head}/upsampling/conv_transpose"
        leaf = "kernel" if m.group(2) == "weights" else "bias"
        return (is_ema, ("params", module, leaf))
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


def _tf_transpose_conv_to_flax(w: np.ndarray) -> np.ndarray:
    """tf.layers.conv2d_transpose weights [kh,kw,out,in] -> flax ConvTranspose
    kernel (kh,kw,in,out).

    TF's transpose conv is the *gradient* of a forward conv (spatial flip +
    channel swap); flax's ``nn.ConvTranspose`` (transpose_kernel=False) is a
    fractionally-strided regular conv — so the equivalent flax kernel is the
    spatially flipped, channel-swapped TF tensor (verified numerically in
    tests/test_trained_checkpoint.py).
    """
    return np.ascontiguousarray(w.transpose(0, 1, 3, 2)[::-1, ::-1])


def restore_trained_from_npz(
    variables: Any, npz_path: str, restore_emas: bool = False
) -> tuple[Any, Any, int]:
    """Restore the FULL trained model from a converted reference checkpoint.

    The TPU analog of pointing the reference's predict/evaluate at its
    released trained checkpoint: every model variable (backbone, extension,
    PSP, adaptation branches, heads, hybrid upsamplers) is loaded by name;
    with ``restore_emas`` the EMA shadow value replaces the raw value for
    every parameter that has one (BatchNorm moving stats never do —
    define_estimator_hierarchical.py:104-106), mirroring the predict saver's
    name remap (define_savers.py:44-47).

    Returns ``(params, batch_stats, num_restored)``. Raises if any model
    parameter present in ``variables`` has no counterpart in the npz (a
    trained checkpoint must cover the whole model — unlike the ImageNet
    warm start, partial restore here means a wrong architecture).
    """
    arrays = np.load(npz_path)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    batch_stats = jax.tree_util.tree_map(
        np.asarray, variables.get("batch_stats", {})
    )
    tree = {"params": params, "batch_stats": batch_stats}

    # raw names first; under restore_emas the EMA shadow overrides wherever
    # one exists (BN moving stats and any un-shadowed var keep raw values)
    chosen: dict[tuple[str, ...], str] = {}
    for want_ema in (False, True) if restore_emas else (False,):
        for name in arrays.files:
            mapped = tf_trained_name_to_flax_path(name)
            if mapped is None:
                continue
            is_ema, path = mapped
            if is_ema == want_ema:
                chosen[path] = name

    restored = 0
    for path, name in chosen.items():
        try:
            current = _get_path(tree, path)
        except KeyError:
            continue  # e.g. increase_fov/PSP vars for a model built without
        value = arrays[name]
        if path[-1] in ("kernel", "bias") and "conv_transpose" in path[-2]:
            if path[-1] == "kernel":
                value = _tf_transpose_conv_to_flax(value)
        if value.shape != current.shape:
            raise ValueError(
                f"shape mismatch for {name}: ckpt {value.shape} vs model "
                f"{current.shape}"
            )
        _set_path(tree, path, value.astype(current.dtype))
        restored += 1

    # every model parameter must have been covered
    missing = []
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    restored_paths = set(chosen.keys())
    for keypath, _ in flat:
        path = tuple(
            k.key if hasattr(k, "key") else str(k) for k in keypath
        )
        if path not in restored_paths:
            missing.append("/".join(path))
    if missing:
        raise ValueError(
            f"trained checkpoint {npz_path} is missing {len(missing)} model "
            f"variables (architecture mismatch?): {missing[:8]}..."
        )
    return tree["params"], tree["batch_stats"], restored


def convert_tf_checkpoint_to_npz(
    ckpt_path: str, out_path: str, full: bool = False
) -> int:
    """One-time TF checkpoint -> npz conversion (requires TensorFlow).

    ``full=False``: ImageNet warm-start subset (reference exclusion list,
    define_initializers.py:100-105). ``full=True``: the whole trained model
    including EMA shadows — everything ``tf_trained_name_to_flax_path`` can
    map — for ``restore_trained_from_npz``.
    """
    import tensorflow as tf  # optional tool-time dependency

    reader = tf.train.load_checkpoint(ckpt_path)
    shapes = reader.get_variable_to_shape_map()
    out = {}
    for name in shapes:
        if full:
            if tf_trained_name_to_flax_path(name) is None:
                continue
        elif any(e in name for e in WARM_START_EXCLUSIONS):
            continue
        out[name] = reader.get_tensor(name)
    np.savez(out_path, **out)
    return len(out)
