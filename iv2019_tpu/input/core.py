"""Host-side input-pipeline core: shuffle/repeat, parallel map, batching,
and the preprocessing transforms shared by all dataset pipelines.

TPU-native replacement for the reference's tf.data stages
(prebatch -> batch -> postbatch; reference input_cityscapes.py:122-188):
pure Python/numpy with a thread pool (the reference's NUM_PARALLEL_CALLS=15
tf.data threading, input_cityscapes.py:22) feeding a device prefetcher
(see prefetch.py). Decode (PIL) and resize release the GIL for the heavy
parts, so threads scale on the host while the TPU computes.

Preprocessing parity:
- ``convert_image_dtype``: uint8 -> f32 in [0, 1)
- label mapping: lids2cids gather with voids replaced
- ``resize_images_and_labels``: plain resize, or aspect-preserving 'max'
  mode (ceil) + shared random crop (reference input_pipelines/utils.py:181-247
  + utils/utils.py:531-607)
- ``from_0_1_to_m1_1``: [0,1) -> [-1,1) (input_pipelines/utils.py:96-112)
"""

from __future__ import annotations

import itertools
import math
import os
import random
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable, Iterator, Optional, Sequence

import numpy as np

from iv2019_tpu import native
from iv2019_tpu.ops.resize import resize_bilinear, resize_nearest_hw

__all__ = [
    "SHUFFLE_BUFFER",
    "NUM_PARALLEL_CALLS",
    "shuffle_repeat",
    "per_item_rng_factory",
    "parallel_map",
    "batched",
    "from_0_1_to_m1_1",
    "convert_image_dtype",
    "map_lids_to_cids",
    "aspect_preserving_size",
    "resize_bilinear_fast",
    "resize_images_and_labels",
]

SHUFFLE_BUFFER = 2000  # reference input_cityscapes.py:21
# reference input_cityscapes.py:22; overridable for host-scaling studies
# (bench.py input --workers N) and for many-core TPU-VM hosts
NUM_PARALLEL_CALLS = int(os.environ.get("IV_INPUT_WORKERS", "15"))


def shuffle_repeat(
    items_factory: Callable[[], Iterable],
    buffer_size: int = SHUFFLE_BUFFER,
    seed: Optional[int] = None,
    repeat: bool = True,
) -> Iterator:
    """Streaming shuffle buffer + infinite repeat (tf.data shuffle_and_repeat)."""
    rng = random.Random(seed)
    while True:
        buf: list = []
        for item in items_factory():
            if len(buf) < buffer_size:
                buf.append(item)
                continue
            idx = rng.randrange(len(buf))
            buf[idx], item = item, buf[idx]
            yield item
        rng.shuffle(buf)
        yield from buf
        if not repeat:
            return


def per_item_rng_factory(
    seed: Optional[int],
) -> Callable[[int], np.random.RandomState]:
    """Deterministic, thread-safe randomness for parallel_map workers.

    A single shared RandomState across the decode pool makes draw order
    depend on thread scheduling (and concurrent access is not
    thread-safe). Instead each item gets its own RandomState derived from
    ``(seed, item_index)`` via SeedSequence spawn keys — identical crops
    for identical ``--input_seed`` regardless of worker count or
    scheduling. ``seed=None`` draws base entropy from the OS once (the
    unseeded default stays nondeterministic across runs but is still
    race-free within one)."""
    base = np.random.SeedSequence(seed)

    def make(index: int) -> np.random.RandomState:
        child = np.random.SeedSequence(
            entropy=base.entropy, spawn_key=(index,)
        )
        return np.random.RandomState(np.random.MT19937(child))

    return make


def parallel_map(
    fn: Callable, it: Iterator, num_workers: int = NUM_PARALLEL_CALLS, depth: int = 32
) -> Iterator:
    """Ordered parallel map over an iterator with bounded read-ahead."""
    with ThreadPoolExecutor(max_workers=num_workers) as pool:
        futures = []
        try:
            for item in itertools.islice(it, depth):
                futures.append(pool.submit(fn, item))
            for item in it:
                out = futures.pop(0).result()
                futures.append(pool.submit(fn, item))
                yield out
            for f in futures:
                yield f.result()
        finally:
            for f in futures:
                f.cancel()


def batched(it: Iterator[dict], batch_size: int) -> Iterator[dict]:
    """Stack dicts of numpy arrays along a new leading axis."""
    while True:
        items = list(itertools.islice(it, batch_size))
        if len(items) < batch_size:
            return
        out = {}
        for k in items[0]:
            v0 = items[0][k]
            if isinstance(v0, np.ndarray):
                out[k] = np.stack([d[k] for d in items])
            else:
                out[k] = [d[k] for d in items]
        yield out


# --- transforms ------------------------------------------------------------


def convert_image_dtype(image: np.ndarray) -> np.ndarray:
    """uint8 [0,255] -> float32 [0,1) (tf.image.convert_image_dtype parity)."""
    if image.dtype == np.uint8:
        out = native.u8_to_f32(image, center=False)
        if out is not None:
            return out
        return image.astype(np.float32) / 255.0
    return image.astype(np.float32)


def from_0_1_to_m1_1(images: np.ndarray) -> np.ndarray:
    return (images - 0.5) / 0.5


def map_lids_to_cids(label: np.ndarray, lids2cids_voids_replaced: np.ndarray) -> np.ndarray:
    if label.dtype == np.uint8:
        out = native.map_lut_i32(label, lids2cids_voids_replaced)
        if out is not None:
            return out
    return lids2cids_voids_replaced[label.astype(np.int64)].astype(np.int32)


def aspect_preserving_size(
    in_hw: Sequence[int], target_hw: Sequence[int], mode: str = "max"
) -> tuple[int, int]:
    """Tight cover ('max') or fit ('min') size with ceil, TF1 parity
    (reference utils/utils.py:569-589)."""
    fh, fw = in_hw
    th, tw = target_hw
    sh, sw = th / fh, tw / fw
    scale = max(sh, sw) if mode == "max" else min(sh, sw)
    return (int(math.ceil(scale * fh)), int(math.ceil(scale * fw)))


def resize_bilinear_fast(image: np.ndarray, target_hw: Sequence[int]) -> np.ndarray:
    """Bilinear resize via the native C++ kernel (~80x faster), falling
    back to the Python oracle when the native library is unavailable."""
    rh, rw = int(target_hw[0]), int(target_hw[1])
    rimage = native.resize_bilinear_f32(image.astype(np.float32), (rh, rw))
    return rimage if rimage is not None else resize_bilinear(image, (rh, rw))


def resize_images_and_labels(
    image: np.ndarray,
    label: Optional[np.ndarray],
    target_hw: Sequence[int],
    preserve_aspect_ratio: bool = False,
    rng: Optional[np.random.RandomState] = None,
):
    """Resize one (H, W, C) image + optional label to ``target_hw``.

    Labels may be rank-2 int (sparse) or rank-3 float (multinomial); both use
    NN resize. With ``preserve_aspect_ratio`` the pair is resized 'max'-tight
    then randomly cropped with a *shared* offset (reference
    input_pipelines/utils.py:181-247).
    """
    th, tw = int(target_hw[0]), int(target_hw[1])
    if preserve_aspect_ratio:
        rh, rw = aspect_preserving_size(image.shape[:2], (th, tw), "max")
    else:
        rh, rw = th, tw

    # native C++ kernels (bit-exact vs the Python oracle, ~80x faster);
    # labels here are single examples with spatial dims leading:
    # (H, W) int sparse or (H, W, C) float multinomial
    image = resize_bilinear_fast(image, (rh, rw))
    if label is not None:
        rlabel = native.resize_nearest(label, (rh, rw))
        label = rlabel if rlabel is not None else resize_nearest_hw(label, (rh, rw))

    if preserve_aspect_ratio and (rh, rw) != (th, tw):
        rng = rng or np.random
        oy = rng.randint(0, rh - th + 1)
        ox = rng.randint(0, rw - tw + 1)
        image = image[oy : oy + th, ox : ox + tw]
        if label is not None:
            label = label[oy : oy + th, ox : ox + tw]
    return image, label
