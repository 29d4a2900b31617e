"""Shared test helpers: tiny model configs and synthetic batches."""

import numpy as np
import jax
import jax.numpy as jnp

from iv2019_tpu.config import Settings
from iv2019_tpu.models.model import HierarchicalSegmentationModel
from iv2019_tpu.problem.taxonomy import NUM_WEAK_CLASSES, get_taxonomy

# 2-unit single-block ResNet keeps CPU compile times tolerable
TINY_BLOCKS = ((2, 32, 8), (2, 64, 16))


def tiny_settings(**kw) -> Settings:
    defaults = dict(
        per_pixel_dataset_name="cityscapes",
        height_feature_extractor=32,
        width_feature_extractor=64,
        Nb_per_pixel=2,
        Nb_per_bbox=2,
        Nb_per_image=2,
        Nb=2,
        Ntrain=16,
        Ne=3,
        learning_rate_boundaries=(1, 2),
        learning_rate_values=(0.01, 0.005, 0.0025),
        feature_dims_decreased=16,
        compute_dtype="float32",
        ema_decay=0.9,
    )
    defaults.update(kw)
    return Settings(**defaults).finalize()


def tiny_model(settings: Settings, train: bool = True) -> HierarchicalSegmentationModel:
    return HierarchicalSegmentationModel(
        taxonomy=get_taxonomy(settings.per_pixel_dataset_name),
        stride_feature_extractor=8,
        resnet_blocks=TINY_BLOCKS,
        feature_dims_decreased=settings.feature_dims_decreased,
        psp_module=settings.psp_module,
        upsampling_method=settings.upsampling_method,
        norm_type=settings.norm_layer,
        batch_norm_decay=settings.batch_norm_decay,
        accumulate_norm_statistics=train,
        remat=settings.remat,
        dtype=jnp.float32,
    )


def synthetic_batch(settings: Settings, seed: int = 0):
    rng = np.random.RandomState(seed)
    h, w = settings.height_feature_extractor, settings.width_feature_extractor
    npp, npb, npi = settings.Nb_per_pixel, settings.Nb_per_bbox, settings.Nb_per_image

    def img(n):
        return rng.uniform(-1, 1, size=(n, h, w, 3)).astype(np.float32)

    weak_pb = np.zeros((npb, h, w, NUM_WEAK_CLASSES), np.float32)
    weak_pb[..., 2] = 1.0  # car everywhere
    weak_pi = np.zeros((npi, h, w, NUM_WEAK_CLASSES), np.float32)
    weak_pi[..., -1] = 1.0  # void
    return {
        "proimages_per_pixel": img(npp),
        "proimages_per_bbox": img(npb),
        "proimages_per_image": img(npi),
        "prolabels_per_pixel": rng.randint(0, 20, size=(npp, h, w)).astype(np.int32),
        "prolabels_per_bbox": weak_pb,
        "prolabels_per_image": weak_pi,
    }
