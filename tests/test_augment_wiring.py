"""Augmentation is reachable from the train pipeline (VERDICT round-1 missing #2).

The reference keeps augmentation call sites disabled
(input_cityscapes.py:104-120); parity means the capability is wired behind a
flag with default off. These tests check: the CLI flag parses, the train
step applies augmentations deterministically per (seed, step), default-off
leaves the computation untouched, and invalid names fail fast.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from helpers import synthetic_batch, tiny_model, tiny_settings
from iv2019_tpu.config import TRAIN, build_argparser, settings_from_args
from iv2019_tpu.ops.augment import apply_augmentations
from iv2019_tpu.train.optimizer import make_optimizer
from iv2019_tpu.train.state import create_train_state
from iv2019_tpu.train.step import make_train_step

pytestmark = pytest.mark.slow  # multi-second tier; see pytest.ini


def test_cli_flag_parses():
    p = build_argparser(TRAIN)
    args = p.parse_args(["/tmp/log", "cityscapes", "--augmentations", "color,flip"])
    s = settings_from_args(args, TRAIN)
    assert s.augmentations == ("color", "flip")
    # default off = reference parity
    args = p.parse_args(["/tmp/log", "cityscapes"])
    assert settings_from_args(args, TRAIN).augmentations == ()


def test_invalid_name_raises():
    key = jax.random.PRNGKey(0)
    img = jnp.zeros((1, 8, 8, 3))
    lab = jnp.zeros((1, 8, 8), jnp.int32)
    with pytest.raises(ValueError, match="unknown augmentations"):
        apply_augmentations(key, img, lab, ("flip", "cutmix"), 19)


def test_apply_augmentations_deterministic_per_key():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.uniform(-1, 1, (2, 16, 24, 3)).astype(np.float32))
    lab = jnp.asarray(rng.randint(0, 20, (2, 16, 24)).astype(np.int32))
    names = ("color", "blur", "flip", "scale")
    a_img, a_lab = apply_augmentations(jax.random.PRNGKey(3), img, lab, names, 19)
    b_img, b_lab = apply_augmentations(jax.random.PRNGKey(3), img, lab, names, 19)
    np.testing.assert_array_equal(np.asarray(a_img), np.asarray(b_img))
    np.testing.assert_array_equal(np.asarray(a_lab), np.asarray(b_lab))
    c_img, _ = apply_augmentations(jax.random.PRNGKey(4), img, lab, names, 19)
    assert not np.array_equal(np.asarray(a_img), np.asarray(c_img))
    # shapes/dtypes are pipeline contracts
    assert a_img.shape == img.shape and a_lab.shape == lab.shape
    assert a_lab.dtype == jnp.int32
    # labels stay in the valid per-pixel cid range (incl. unlabeled padding)
    assert int(jnp.max(a_lab)) <= 19 and int(jnp.min(a_lab)) >= 0


def _run_one_step(settings, batch):
    model = tiny_model(settings)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, settings.height_feature_extractor,
                   settings.width_feature_extractor, 3), jnp.float32),
    )
    tx, _ = make_optimizer(settings)
    state = create_train_state(variables, tx, settings.ema_decay)
    step = make_train_step(settings, model=model, tx=tx)
    new_state, metrics = step(state, batch)
    metrics.pop("weight_masks", None)
    return new_state, {k: float(v) for k, v in metrics.items()}


def test_train_step_flag_changes_computation_and_is_deterministic():
    base = tiny_settings(fused_optimizer=False)
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(base).items()
             if not k.startswith("imageids") and not k.startswith("raw")}

    _, plain = _run_one_step(base, batch)
    aug_settings = tiny_settings(
        fused_optimizer=False, augmentations=("flip", "scale"), random_seed=11
    )
    _, aug_a = _run_one_step(aug_settings, batch)
    _, aug_b = _run_one_step(aug_settings, batch)

    # deterministic per seed
    assert aug_a == aug_b
    # the flag actually changes the computation
    assert aug_a["total"] != plain["total"]
    # different seed -> different augmentation draw
    _, aug_c = _run_one_step(aug_settings.replace(random_seed=12), batch)
    assert aug_c["total"] != aug_a["total"]
    assert np.isfinite(aug_a["total"])
