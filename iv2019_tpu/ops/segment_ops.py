"""Label-space projection ops (segment sums, cid gathers, palette lookup).

XLA-native replacements for ``tf.unsorted_segment_sum`` / ``tf.gather`` /
``tf.gather_nd`` used throughout the reference:

- channelwise segment-sum of multinomial labels into a head's label space
  (reference define_losses_hierarchical.py:219-224)
- probability remap to new cids by channel summation
  (reference define_estimator_hierarchical.py:490-528)
- cid lookup-table gather and palette colorization
  (reference define_estimator_hierarchical.py:400-406)

The segment-sums are expressed as a matmul with a static 0/1 projection
matrix — on TPU a (…, Cin) x (Cin, Cout) contraction on the MXU, which XLA
fuses with neighbors, instead of a scatter.
"""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp

__all__ = [
    "projection_matrix",
    "segment_sum_channels",
    "remap_probabilities",
    "gather_cids",
    "colorize_cids",
]


def projection_matrix(segment_ids: np.ndarray, num_segments: int, dtype=np.float32) -> np.ndarray:
    """Static (Cin, Cout) 0/1 matrix M with M[i, segment_ids[i]] = 1."""
    segment_ids = np.asarray(segment_ids)
    m = np.zeros((len(segment_ids), num_segments), dtype=dtype)
    m[np.arange(len(segment_ids)), segment_ids] = 1.0
    return m


def segment_sum_channels(labels, segment_ids: np.ndarray, num_segments: int):
    """Sum label channels into ``num_segments`` output channels.

    labels: (..., Cin) float multinomial distributions.
    Equivalent to the reference's transpose + unsorted_segment_sum + transpose
    (_segment_sum, define_losses_hierarchical.py:219-224) but runs as one MXU
    matmul with a trace-time-constant projection matrix.
    """
    proj = jnp.asarray(projection_matrix(segment_ids, num_segments, np.float32))
    # HIGHEST precision: label values are arbitrary floats and the projection
    # must be numerically exact (default TPU matmul precision rounds to bf16)
    return jnp.dot(
        labels.astype(jnp.float32),
        proj,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def remap_probabilities(probs, old_cids2new_cids) -> jnp.ndarray:
    """Sum probability channels mapped to the same new cid.

    P(A ∪ B) = P(A) + P(B) for disjoint classes
    (reference define_estimator_hierarchical.py:490-528). ``old_cids2new_cids``
    must already have voids replaced.
    """
    table = np.asarray(old_cids2new_cids)
    return segment_sum_channels(probs, table, int(table.max()) + 1)


_SELECT_CHAIN_MAX = 128


def gather_cids(table, cids):
    """Lookup-table gather: out[...] = table[cids[...]] (tf.gather parity).

    TPU executes vector-gather-from-tiny-table as a serialized scalar loop
    (profiled at ~66 ms for an 8M-pixel lookup through a 14-entry table!).
    For small static tables we emit an unrolled select chain instead — K
    compares+selects fused into one VPU pass over the indices, ~100x faster.
    Out-of-range indices clamp (matching jnp.take's default TPU behavior).
    """
    table = np.asarray(table)
    if table.ndim == 1 and len(table) <= _SELECT_CHAIN_MAX:
        cids = jnp.clip(cids, 0, len(table) - 1)
        out = jnp.full(cids.shape, int(table[-1]), dtype=jnp.int32)
        for k in range(len(table) - 2, -1, -1):
            out = jnp.where(cids == k, np.int32(table[k]), out)
        return out
    return jnp.take(jnp.asarray(table, dtype=jnp.int32), cids, axis=0)


def colorize_cids(cids, palette):
    """cids (..., H, W) int -> (..., H, W, 3) uint8 via palette gather."""
    pal = jnp.asarray(palette, dtype=jnp.uint8)
    return jnp.take(pal, cids, axis=0)
