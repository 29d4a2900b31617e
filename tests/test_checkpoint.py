"""Tests for checkpointing utilities: slim-name mapping and warm start."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iv2019_tpu.utils.checkpoint import (
    CheckpointManager,
    slim_name_to_flax_path,
    warm_start_from_npz,
)

from helpers import tiny_model, tiny_settings


class TestSlimNameMapping:
    def test_root_conv(self):
        assert slim_name_to_flax_path("resnet_v1_50/conv1/weights") == (
            "params", "feature_extractor/base", "conv1", "conv", "kernel",
        )

    def test_root_bn(self):
        assert slim_name_to_flax_path("resnet_v1_50/conv1/BatchNorm/gamma") == (
            "params", "feature_extractor/base", "conv1_norm", "BatchNorm", "scale",
        )
        assert slim_name_to_flax_path(
            "resnet_v1_50/conv1/BatchNorm/moving_mean"
        ) == ("batch_stats", "feature_extractor/base", "conv1_norm", "BatchNorm", "mean")

    def test_block_unit(self):
        got = slim_name_to_flax_path(
            "resnet_v1_50/block2/unit_3/bottleneck_v1/conv2/weights"
        )
        assert got == (
            "params", "feature_extractor/base", "block2/unit_3", "conv2",
            "conv", "kernel",
        )
        got = slim_name_to_flax_path(
            "resnet_v1_50/block1/unit_1/bottleneck_v1/shortcut/BatchNorm/beta"
        )
        assert got == (
            "params", "feature_extractor/base", "block1/unit_1", "shortcut",
            "norm", "BatchNorm", "bias",
        )

    def test_scoped_prefix(self):
        # converter output may carry the feature_extractor/base scope prefix
        assert slim_name_to_flax_path(
            "feature_extractor/base/resnet_v1_50/conv1/weights"
        ) == ("params", "feature_extractor/base", "conv1", "conv", "kernel")

    def test_exclusions(self):
        assert slim_name_to_flax_path("global_step") is None
        assert (
            slim_name_to_flax_path(
                "exponential_moving_averages/resnet_v1_50/conv1/weights/"
                "ExponentialMovingAverage"
            )
            is None
        )
        assert slim_name_to_flax_path("resnet_v1_50/logits/weights") is None


class TestWarmStart:
    def test_restores_matching_arrays(self, tmp_path):
        settings = tiny_settings()
        model = tiny_model(settings)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 64, 3), jnp.float32)
        )
        variables = jax.tree_util.tree_map(np.asarray, variables)

        # build an npz with slim names matching the tiny model's shapes
        base = variables["params"]["feature_extractor/base"]
        conv1 = base["conv1"]["conv"]["kernel"]
        gamma = base["conv1_norm"]["BatchNorm"]["scale"]
        unit_conv2 = base["block1/unit_1"]["conv2"]["conv"]["kernel"]
        unit_bn_mean = variables["batch_stats"]["feature_extractor/base"][
            "block1/unit_1"]["conv2"]["norm"]["BatchNorm"]["mean"]
        npz_path = str(tmp_path / "imagenet.npz")
        np.savez(
            npz_path,
            **{
                "resnet_v1_50/conv1/weights": np.full_like(conv1, 0.123),
                "resnet_v1_50/conv1/BatchNorm/gamma": np.full_like(gamma, 0.456),
                "resnet_v1_50/block1/unit_1/bottleneck_v1/conv2/weights":
                    np.full_like(unit_conv2, 0.789),
                "resnet_v1_50/block1/unit_1/bottleneck_v1/conv2/BatchNorm/moving_mean":
                    np.full_like(unit_bn_mean, 0.111),
                "global_step": np.asarray(100),
            },
        )
        params, batch_stats, n = warm_start_from_npz(
            variables["params"], variables["batch_stats"], npz_path
        )
        assert n == 4
        np.testing.assert_allclose(
            params["feature_extractor/base"]["conv1"]["conv"]["kernel"], 0.123
        )
        np.testing.assert_allclose(
            params["feature_extractor/base"]["conv1_norm"]["BatchNorm"]["scale"], 0.456
        )
        np.testing.assert_allclose(
            params["feature_extractor/base"]["block1/unit_1"]["conv2"]["conv"]["kernel"],
            0.789,
        )
        np.testing.assert_allclose(
            batch_stats["feature_extractor/base"]["block1/unit_1"]["conv2"]["norm"][
                "BatchNorm"]["mean"],
            0.111,
        )

    def test_shape_mismatch_raises(self, tmp_path):
        settings = tiny_settings()
        model = tiny_model(settings)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 64, 3), jnp.float32)
        )
        npz_path = str(tmp_path / "bad.npz")
        np.savez(npz_path, **{"resnet_v1_50/conv1/weights": np.zeros((1, 1, 3, 64))})
        with pytest.raises(ValueError, match="shape mismatch"):
            warm_start_from_npz(
                variables["params"], variables["batch_stats"], npz_path
            )


class TestCheckpointManager:
    def test_save_restore_roundtrip(self, tmp_path):
        state = {
            "params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
            "step": np.asarray(5),
        }
        mgr = CheckpointManager(str(tmp_path))
        mgr.save(5, state)
        assert mgr.latest_step() == 5
        restored = mgr.restore(template=state)
        np.testing.assert_array_equal(restored["params"]["w"], state["params"]["w"])
        mgr.close()

    def test_all_steps_retention(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path))
        for s in (1, 2, 3):
            mgr.save(s, {"x": np.asarray(s)})
        assert mgr.all_steps() == [1, 2, 3]  # unbounded retention
        mgr.close()

    def test_async_save_read_after_write(self, tmp_path):
        # async saves overlap the write with training; every read path must
        # await in-flight writes so semantics match the blocking manager
        state = {"params": {"w": np.arange(4, dtype=np.float32)}}
        mgr = CheckpointManager(str(tmp_path), async_save=True)
        mgr.save(1, state)
        assert mgr.latest_step() == 1  # awaits the in-flight write
        mgr.save(2, {"params": {"w": state["params"]["w"] * 2}})
        restored = mgr.restore(template=state)  # awaits, then reads step 2
        np.testing.assert_array_equal(
            restored["params"]["w"], state["params"]["w"] * 2
        )
        mgr.close()

        # a fresh (reader) manager sees both completed steps on disk
        reader = CheckpointManager(str(tmp_path))
        assert reader.all_steps() == [1, 2]
        reader.close()

    def test_async_close_flushes(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path), async_save=True)
        mgr.save(7, {"x": np.asarray(7)})
        mgr.close()  # must flush the pending write
        reader = CheckpointManager(str(tmp_path))
        assert reader.latest_step() == 7
        reader.close()
