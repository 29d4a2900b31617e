"""Compact per-image weak labels: (Nb, 15) vectors tiled on device.

Exactness contract: the on-device broadcast must give the SAME step as the
host-tiled dense (Nb, H, W, 15) path — the multinomial is constant across
the image, so resize/crop cannot change it (input/openimages.py compact
branch; reference dense tiling: input_subset_image_labels.py:107).
"""

import numpy as np
import jax
import jax.numpy as jnp

from iv2019_tpu.train.fused_update import FusedSGDM
from iv2019_tpu.train.state import create_fused_train_state
from iv2019_tpu.train.step import make_train_step

from helpers import synthetic_batch, tiny_model, tiny_settings
import pytest

pytestmark = pytest.mark.slow  # multi-second tier; see pytest.ini


def _setup():
    settings = tiny_settings()
    model = tiny_model(settings, train=True)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 32, 64, 3), jnp.float32)
    )
    opt = FusedSGDM(settings, variables["params"], use_pallas=False)
    state = create_fused_train_state(variables, opt)
    step_fn = make_train_step(settings, model=model, fused_opt=opt)
    return settings, state, step_fn


def test_compact_equals_dense():
    settings, state, step_fn = _setup()
    rng = np.random.RandomState(1)
    npi = settings.Nb_per_image
    vecs = rng.dirichlet(np.ones(15), size=npi).astype(np.float32)

    batch = synthetic_batch(settings)
    h, w = settings.height_feature_extractor, settings.width_feature_extractor
    batch["prolabels_per_image"] = np.broadcast_to(
        vecs[:, None, None, :], (npi, h, w, 15)
    ).copy()
    # the step donates its state buffers: run each variant on its own copy
    state_d, metrics_d = step_fn(jax.tree.map(jnp.copy, state), batch)

    compact = dict(batch)
    del compact["prolabels_per_image"]
    compact["image_label_vecs"] = vecs
    state_c, metrics_c = step_fn(jax.tree.map(jnp.copy, state), compact)

    np.testing.assert_allclose(
        float(metrics_d["total"]), float(metrics_c["total"]), rtol=1e-6
    )
    for a, b in zip(
        jax.tree.leaves(state_d.params), jax.tree.leaves(state_c.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_pipeline_ships_vectors(tmp_path):
    """image_labels_train_input with compact_image_labels yields (Nb, 15)
    vectors and no dense prolabels; heterogeneous passes them through."""
    import json
    import os

    from PIL import Image

    from iv2019_tpu.input.openimages import image_labels_train_input
    from iv2019_tpu.problem.taxonomy import OPEN_IMAGES_MID2CID

    img_dir = tmp_path / "images"
    os.makedirs(img_dir)
    mids = list(OPEN_IMAGES_MID2CID)
    rng = np.random.RandomState(0)
    id2mids = {}
    for i in range(3):
        iid = f"im{i}"
        Image.fromarray(
            rng.randint(0, 255, (64, 96, 3), np.uint8)
        ).save(img_dir / f"{iid}.jpg")
        id2mids[iid] = [mids[i], mids[i + 1]]
    with open(tmp_path / "labels.json", "w") as f:
        json.dump(id2mids, f)

    settings = tiny_settings(
        compact_image_labels=True,
        openimages_image_dir=str(img_dir),
        openimages_image_labels_path=str(tmp_path / "labels.json"),
    )
    batch = next(image_labels_train_input(settings, seed=0))
    assert "prolabels" not in batch
    assert batch["image_label_vecs"].shape == (settings.Nb, 15)
    np.testing.assert_allclose(batch["image_label_vecs"].sum(-1), 1.0, atol=1e-5)
    assert batch["proimages"].shape == (
        settings.Nb, settings.height_feature_extractor,
        settings.width_feature_extractor, 3,
    )
    # [-1, 1] range contract preserved (255/255 -> exactly 1.0)
    assert batch["proimages"].min() >= -1.0 and batch["proimages"].max() <= 1.0
