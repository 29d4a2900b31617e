"""Spatial (image-height) SPMD partitioning: parity with the 1-D data mesh.

`spatial_partitions > 1` adds a 'spatial' mesh axis (parallel/mesh.py) that
shards the H dim of every image/label; XLA's SPMD partitioner inserts the
conv halo exchanges (collective-permute) and stat all-reduces. These tests
pin that the partitioned train step computes the *same* result as the
batch-only mesh, that shards really split H, and the mesh/batch-size
bookkeeping.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iv2019_tpu.config import Settings
from iv2019_tpu.models.model import HierarchicalSegmentationModel
from iv2019_tpu.parallel.mesh import (
    batch_axes,
    create_mesh,
    local_batch_size,
    replicate,
    shard_batch,
)
from iv2019_tpu.problem.taxonomy import NUM_WEAK_CLASSES, get_taxonomy
from iv2019_tpu.train.optimizer import make_optimizer
from iv2019_tpu.train.state import create_train_state
from iv2019_tpu.train.step import make_train_step

pytestmark = [
    pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 (virtual) devices"),
    pytest.mark.slow,  # multi-second tier; see pytest.ini
]


def _settings(n, h, w):
    return Settings(
        per_pixel_dataset_name="cityscapes",
        Nb_per_pixel=n, Nb_per_bbox=n, Nb_per_image=n, Nb=n,
        height_feature_extractor=h, width_feature_extractor=w,
        Ntrain=n * 4, Ne=3,
        learning_rate_boundaries=(1, 2),
        learning_rate_values=(0.01, 0.005, 0.0025),
        compute_dtype="float32",
        fused_loss=False,  # identical loss code on both meshes
    ).finalize()


def _batch(n, h, w, seed=0):
    rng = np.random.RandomState(seed)
    eye = np.eye(NUM_WEAK_CLASSES, dtype=np.float32)
    return {
        "proimages_per_pixel": rng.uniform(-1, 1, (n, h, w, 3)).astype(np.float32),
        "proimages_per_bbox": rng.uniform(-1, 1, (n, h, w, 3)).astype(np.float32),
        "proimages_per_image": rng.uniform(-1, 1, (n, h, w, 3)).astype(np.float32),
        "prolabels_per_pixel": rng.randint(0, 20, (n, h, w)).astype(np.int32),
        "prolabels_per_bbox": eye[rng.randint(0, NUM_WEAK_CLASSES, (n, h, w))],
        "prolabels_per_image": eye[rng.randint(0, NUM_WEAK_CLASSES, (n, h, w))],
    }


def test_mesh_layouts():
    m = create_mesh(8, spatial_partitions=2)
    assert m.axis_names == ("data", "spatial")
    assert m.shape == {"data": 4, "spatial": 2}
    assert batch_axes(m) == ("data",)
    assert local_batch_size(8, m) == 2  # batch divides over 4 data shards
    m3 = create_mesh(8, num_slices=2, spatial_partitions=2)
    assert m3.axis_names == ("replica", "data", "spatial")
    assert m3.shape == {"replica": 2, "data": 2, "spatial": 2}
    assert local_batch_size(8, m3) == 2
    with pytest.raises(ValueError):
        create_mesh(8, spatial_partitions=3)


def test_shard_batch_splits_height():
    mesh = create_mesh(8, spatial_partitions=2)
    b = shard_batch(_batch(4, 32, 64), mesh)
    img = b["proimages_per_pixel"]
    assert img.shape == (4, 32, 64, 3)
    shard = img.addressable_shards[0].data
    assert shard.shape == (1, 16, 64, 3)  # batch/4, H/2
    lbl = b["prolabels_per_pixel"].addressable_shards[0].data
    assert lbl.shape == (1, 16, 64)


def test_prefetch_to_device_spatial_sharding():
    """The device prefetcher shards H on spatial meshes (and falls back
    to batch-only sharding for H-indivisible arrays)."""
    from iv2019_tpu.input.prefetch import _to_device

    mesh = create_mesh(8, spatial_partitions=2)
    batch = {
        "img": np.zeros((4, 32, 64, 3), np.float32),
        "odd_h": np.zeros((4, 33, 64), np.float32),  # 33 % 2 != 0
        "meta": ["a", "b"],
    }
    out = _to_device(batch, mesh)
    assert out["img"].addressable_shards[0].data.shape == (1, 16, 64, 3)
    assert out["odd_h"].addressable_shards[0].data.shape == (1, 33, 64)
    assert out["meta"] == ["a", "b"]


def test_box_tensors_never_shard_spatially():
    """bbox_coords (N, 516, 4) is rank 3 with a divisible dim 1, but its
    dim 1 is the padded box count, not image height — it must shard on the
    batch axis only (prefetch._to_device and mesh.shard_batch)."""
    from iv2019_tpu.input.prefetch import _to_device
    from iv2019_tpu.parallel.mesh import shard_batch

    mesh = create_mesh(8, spatial_partitions=2)
    batch = {
        "bbox_coords": np.zeros((4, 516, 4), np.float32),
        "bbox_cids": np.zeros((4, 516), np.int32),
    }
    for out in (_to_device(dict(batch), mesh), shard_batch(dict(batch), mesh)):
        # batch axis sharded (4 -> 1 per data shard), box dim NOT sharded
        assert out["bbox_coords"].addressable_shards[0].data.shape == (1, 516, 4)
        assert out["bbox_cids"].addressable_shards[0].data.shape == (1, 516)


def test_train_step_parity_data_vs_spatial():
    """One train step: ('data','spatial') mesh == 1-D data mesh, same batch."""
    n, h, w = 8, 32, 64
    settings = _settings(n, h, w)
    model = HierarchicalSegmentationModel(
        taxonomy=get_taxonomy("cityscapes"),
        resnet_blocks=((2, 32, 8), (2, 64, 16)),
        feature_dims_decreased=16,
        accumulate_norm_statistics=True,
        dtype=jnp.float32,
    )
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((2, h, w, 3), jnp.float32)
    )
    host_vars = jax.tree.map(np.asarray, variables)
    tx, _ = make_optimizer(settings)
    batch_host = _batch(n, h, w)

    results = {}
    for name, mesh in (
        ("data", create_mesh(8)),
        ("spatial", create_mesh(8, spatial_partitions=2)),
    ):
        state = replicate(
            create_train_state(
                jax.tree.map(jnp.asarray, host_vars), tx, settings.ema_decay
            ),
            mesh,
        )
        step = make_train_step(settings, model=model, tx=tx, mesh=mesh)
        new_state, metrics = step(state, shard_batch(dict(batch_host), mesh))
        jax.block_until_ready(new_state.params)
        results[name] = (
            float(metrics["total"]),
            jax.tree.map(np.asarray, new_state.params),
        )

    loss_d, params_d = results["data"]
    loss_s, params_s = results["spatial"]
    np.testing.assert_allclose(loss_s, loss_d, rtol=1e-5)
    for (p1, a), (p2, b) in zip(
        jax.tree_util.tree_leaves_with_path(params_d),
        jax.tree_util.tree_leaves_with_path(params_s),
    ):
        assert p1 == p2
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-4, err_msg=str(p1))


def test_eval_step_parity_data_vs_spatial():
    """EVAL graph (cid remap + resize + confusion matrix) over a spatial
    mesh == data mesh — the megapixel-inference path (evaluate/predict use
    system.mesh, which honors --spatial_partitions)."""
    from iv2019_tpu.train.step import make_eval_step

    n, h, w = 8, 32, 64
    settings = _settings(n, h, w)
    model = HierarchicalSegmentationModel(
        taxonomy=get_taxonomy("cityscapes"),
        resnet_blocks=((2, 32, 8), (2, 64, 16)),
        feature_dims_decreased=16,
        accumulate_norm_statistics=False,
        dtype=jnp.float32,
    )
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((2, h, w, 3), jnp.float32)
    )
    host_vars = jax.tree.map(np.asarray, variables)
    rng = np.random.RandomState(7)
    images = rng.uniform(-1, 1, (n, h, w, 3)).astype(np.float32)
    labels = rng.randint(0, 20, (n, h, w)).astype(np.int32)

    eval_step = make_eval_step(
        settings, model=model, tcids2ecids=list(range(19)) + [-1]
    )
    cms = {}
    for name, mesh in (
        ("data", create_mesh(8)),
        ("spatial", create_mesh(8, spatial_partitions=2)),
    ):
        v = replicate(jax.tree.map(jnp.asarray, host_vars), mesh)
        sharded = shard_batch({"im": images, "la": labels}, mesh)
        cm = eval_step(
            v["params"], v["batch_stats"], sharded["im"], sharded["la"]
        )
        cms[name] = np.asarray(jax.device_get(cm))

    assert cms["data"].sum() == n * h * w  # every pixel counted once
    np.testing.assert_array_equal(cms["data"], cms["spatial"])


def test_forward_collectives_present():
    """The partitioned forward actually contains halo exchanges."""
    mesh = create_mesh(8, spatial_partitions=2)
    model = HierarchicalSegmentationModel(
        taxonomy=get_taxonomy("cityscapes"),
        resnet_blocks=((1, 16, 8),),
        feature_dims_decreased=8,
        dtype=jnp.float32,
    )
    x = jnp.zeros((4, 32, 64, 3), jnp.float32)
    v = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    from iv2019_tpu.parallel.mesh import image_sharding

    xs = jax.device_put(x, image_sharding(mesh))
    vs = replicate(v, mesh)
    txt = (
        jax.jit(lambda v, x: model.apply(v, x)["l1_logits"])
        .lower(vs, xs)
        .compile()
        .as_text()
    )
    assert "collective-permute" in txt
