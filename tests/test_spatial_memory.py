"""Pin the AOT memory-analysis path behind tools/spatial_memory_table.py.

VERDICT r2 #8: the spatial-partitioning size-ceiling table (docs/
PERFORMANCE.md) is produced by ``tools.spatial_memory_table.analyze`` —
this test pins that the analysis path itself works (8-device CPU mesh,
real train step, XLA memory_analysis) and that spatial sharding actually
reduces per-device temp memory, so the documented table can always be
regenerated.
"""

import os
import sys

import pytest

pytestmark = pytest.mark.slow  # multi-second tier; see pytest.ini

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)


def test_memory_analysis_and_spatial_reduction():
    import jax

    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh (conftest sets XLA_FLAGS)")

    from spatial_memory_table import analyze

    # same per-data-shard load in both configs: 8 images over 8 data shards
    # vs 2 images each split over 4 chips
    base = analyze(256, 512, 1, nb=8)
    spat = analyze(256, 512, 4, nb=2)

    for m in (base, spat):
        assert m["temp_gb"] > 0
        assert m["args_gb"] > 0

    # splitting each image across 4 chips must cut per-device activation
    # (temp) memory; round-2 measured 6.72 -> 1.89 GB at the flagship size
    assert spat["temp_gb"] < 0.75 * base["temp_gb"], (base, spat)
