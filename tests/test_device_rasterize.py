"""Device-side weak-label rasterization path: box transform + train-step wiring."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iv2019_tpu.input.openimages import MAX_N_BBOXES, transform_boxes_for_crop
from iv2019_tpu.ops.rasterize import rasterize_bboxes, rasterize_bboxes_np
from iv2019_tpu.train.fused_update import FusedSGDM
from iv2019_tpu.train.state import create_fused_train_state
from iv2019_tpu.train.step import make_train_step

from helpers import synthetic_batch, tiny_model, tiny_settings


class TestBoxTransform:
    def test_identity_when_no_crop(self):
        coords = np.array([[0.1, 0.5, 0.2, 0.8]], np.float32)
        out = transform_boxes_for_crop(coords, (100, 200), (100, 200))
        np.testing.assert_allclose(out, coords, atol=1e-6)

    def test_crop_shifts_and_clips(self):
        # resized to 200x400, cropped 100x200 at offset (50, 100)
        coords = np.array([[0.0, 1.0, 0.0, 1.0]], np.float32)
        out = transform_boxes_for_crop(
            coords, (100, 200), (100, 200), crop_offset=(50, 100),
            resized_hw=(200, 400),
        )
        # full box still covers the whole crop after clipping
        np.testing.assert_allclose(out, [[0.0, 1.0, 0.0, 1.0]], atol=1e-6)

        small = np.array([[0.0, 0.25, 0.0, 0.25]], np.float32)
        out = transform_boxes_for_crop(
            small, (100, 200), (100, 200), crop_offset=(50, 100),
            resized_hw=(200, 400),
        )
        # box [0, 100]x[0, 50] px -> crop starts at (50, 100):
        # x: (0..100 - 100)/200 -> [0, 0]; y: (0..50 - 50)/100 -> [0, 0]
        np.testing.assert_allclose(out, [[0.0, 0.0, 0.0, 0.0]], atol=1e-6)


@pytest.mark.slow  # multi-second tier; see pytest.ini
class TestTrainStepDeviceRasterize:
    def test_step_runs_with_box_tensors(self):
        settings = tiny_settings(rasterize_on_device=True)
        model = tiny_model(settings, train=True)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((2, 32, 64, 3), jnp.float32)
        )
        opt = FusedSGDM(settings, variables["params"], use_pallas=False)
        state = create_fused_train_state(variables, opt)
        step_fn = make_train_step(settings, model=model, fused_opt=opt)

        batch = synthetic_batch(settings)
        del batch["prolabels_per_bbox"]
        rng = np.random.RandomState(0)
        n = settings.Nb_per_bbox
        cids = np.full((n, MAX_N_BBOXES), -1, np.int32)
        coords = np.zeros((n, MAX_N_BBOXES, 4), np.float32)
        cids[:, 0] = 2  # one car box per image
        coords[:, 0] = [0.2, 0.8, 0.2, 0.8]
        batch["bbox_cids"] = cids
        batch["bbox_coords"] = coords

        state, metrics = step_fn(state, batch)
        assert np.isfinite(float(metrics["total"]))
        assert int(state.step) == 1

    def test_device_equals_host_for_same_resolution(self):
        """When no resize is involved, device rasterization == host path."""
        rng = np.random.RandomState(3)
        h, w = 32, 64
        k = 6
        cids = rng.randint(0, 15, size=(k,)).astype(np.int32)
        x = np.sort(rng.rand(k, 2), axis=1)
        y = np.sort(rng.rand(k, 2), axis=1)
        coords = np.stack([x[:, 0], x[:, 1], y[:, 0], y[:, 1]], 1).astype(np.float32)
        host = rasterize_bboxes_np(cids, coords, h, w)
        dev = np.asarray(rasterize_bboxes(jnp.asarray(cids), jnp.asarray(coords), h, w))
        np.testing.assert_allclose(dev, host, atol=1e-5)
