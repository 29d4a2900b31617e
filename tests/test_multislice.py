"""Multi-slice (DCN) 2-D mesh: ('replica', 'data') sharding end-to-end.

The reference scales with single-host MirroredStrategy only; the TPU-native
design extends the same SPMD program to multi-slice pods by adding an outer
mesh axis (parallel/mesh.create_mesh(num_slices=...)). These tests run the
full mixed-supervision train step on a 2x4 virtual mesh and pin that:
- the batch shards over both axes,
- the fused-loss shard_map psums over both axes,
- losses match the 1-D mesh bit-for-bit (same global batch, same math).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iv2019_tpu.config import Settings
from iv2019_tpu.models.model import HierarchicalSegmentationModel
from iv2019_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    replicate,
    shard_batch,
)
from iv2019_tpu.problem.taxonomy import NUM_WEAK_CLASSES, get_taxonomy
from iv2019_tpu.train.optimizer import make_optimizer
from iv2019_tpu.train.state import create_train_state
from iv2019_tpu.train.step import make_train_step

pytestmark = pytest.mark.slow  # multi-second tier; see pytest.ini


def _settings(n, h, w):
    return Settings(
        per_pixel_dataset_name="cityscapes",
        Nb_per_pixel=n, Nb_per_bbox=n, Nb_per_image=n, Nb=n,
        height_feature_extractor=h, width_feature_extractor=w,
        Ntrain=n * 4, Ne=3,
        learning_rate_boundaries=(1, 2),
        learning_rate_values=(0.01, 0.005, 0.0025),
        compute_dtype="float32",
    ).finalize()


def _model():
    return HierarchicalSegmentationModel(
        taxonomy=get_taxonomy("cityscapes"),
        resnet_blocks=((2, 32, 8), (2, 64, 16)),
        feature_dims_decreased=16,
        accumulate_norm_statistics=True,
        dtype=jnp.float32,
    )


def _batch(n, h, w):
    rng = np.random.RandomState(0)
    eye = np.eye(NUM_WEAK_CLASSES, dtype=np.float32)
    return {
        "proimages_per_pixel": rng.uniform(-1, 1, (n, h, w, 3)).astype(np.float32),
        "proimages_per_bbox": rng.uniform(-1, 1, (n, h, w, 3)).astype(np.float32),
        "proimages_per_image": rng.uniform(-1, 1, (n, h, w, 3)).astype(np.float32),
        "prolabels_per_pixel": rng.randint(0, 20, (n, h, w)).astype(np.int32),
        "prolabels_per_bbox": eye[rng.randint(0, NUM_WEAK_CLASSES, (n, h, w))],
        "prolabels_per_image": eye[rng.randint(0, NUM_WEAK_CLASSES, (n, h, w))],
    }


def test_create_mesh_2d():
    mesh = create_mesh(num_slices=2)
    assert mesh.axis_names == ("replica", "data")
    assert mesh.devices.shape == (2, 4)
    sh = batch_sharding(mesh)
    assert sh.spec == jax.sharding.PartitionSpec(("replica", "data"))


def test_create_mesh_bad_slices():
    with pytest.raises(ValueError, match="not divisible"):
        create_mesh(num_devices=6, num_slices=4)


def test_train_step_multislice_matches_1d():
    h, w = 32, 64
    n = 8
    settings = _settings(n, h, w)
    model = _model()
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((n, h, w, 3), jnp.float32)
    )
    tx, _ = make_optimizer(settings)
    host_batch = _batch(n, h, w)

    results = {}
    for name, mesh in (
        ("1d", create_mesh()),
        ("2d", create_mesh(num_slices=2)),
    ):
        # fresh buffers per mesh: the donated train state may alias them
        fresh = jax.tree.map(np.asarray, variables)
        state = replicate(create_train_state(fresh, tx, settings.ema_decay), mesh)
        batch = shard_batch(dict(host_batch), mesh)
        step_fn = make_train_step(settings, model=model, tx=tx, mesh=mesh)
        new_state, metrics = step_fn(state, batch)
        jax.block_until_ready(new_state.params)
        results[name] = (
            float(metrics["total"]),
            np.asarray(jax.tree.leaves(new_state.params)[0]),
        )
    assert np.isfinite(results["1d"][0])
    np.testing.assert_allclose(results["1d"][0], results["2d"][0], rtol=1e-6)
    np.testing.assert_allclose(results["1d"][1], results["2d"][1], rtol=1e-5)


def test_settings_num_slices_plumbs_to_system_mesh(tmp_path):
    import os

    import iv2019_tpu
    from iv2019_tpu.system import SemanticSegmentation

    problem_json = os.path.join(
        os.path.dirname(iv2019_tpu.__file__),
        "problem_definitions", "cityscapes", "problem01.json",
    )
    settings = _settings(2, 32, 64).replace(
        log_dir=str(tmp_path / "log"),
        training_problem_def_path=problem_json,
        num_slices=2,
    )
    system = SemanticSegmentation({}, settings=settings)
    assert system.mesh.axis_names == ("replica", "data")
