"""resnet_v1_{101,152} feature extractors (models/resnet.py block tables).

The reference CLI advertises resnet_v1_101 but its factory guards to
resnet_v1_50 only (reference system_factory.py:426-429); here the deeper
slim variants are real: same stride/dilation bookkeeping, same param
naming (warm-startable from slim ImageNet checkpoints), more block-3
units. Structural checks use jax.eval_shape (no compile cost).
"""

import jax
import numpy as np
import pytest

from iv2019_tpu.config import Settings
from iv2019_tpu.models.model import build_model
from iv2019_tpu.models.resnet import (
    FEATURE_EXTRACTOR_BLOCKS,
    RESNET101_BLOCKS,
    RESNET152_BLOCKS,
    _unit_plan,
)
from iv2019_tpu.utils.checkpoint import slim_name_to_flax_path


def _settings(name):
    return Settings(
        per_pixel_dataset_name="cityscapes",
        Nb_per_pixel=1, Nb_per_bbox=0, Nb_per_image=0, Nb=1,
        height_feature_extractor=64, width_feature_extractor=128,
        name_feature_extractor=name,
        Ntrain=4, Ne=3,
        learning_rate_boundaries=(1, 2),
        learning_rate_values=(0.01, 0.005, 0.0025),
        mode="train",
    ).finalize()


def test_unit_plan_resnet101_output_stride_8():
    plan = _unit_plan(RESNET101_BLOCKS, 8)  # [[(d, db, stride, rate)]]
    assert [len(b) for b in plan] == [3, 4, 23, 3]
    # output_stride 8 reached after block 1's stride cut; blocks 2-4 run
    # dilated with compounding rates (slim stack_blocks_dense semantics)
    assert all(u[2] == 1 for u in plan[2])  # block 3: no spatial stride
    assert plan[2][0][3] == 2 and plan[3][0][3] == 4  # rates 2 then 4
    plan152 = _unit_plan(RESNET152_BLOCKS, 8)
    assert [len(b) for b in plan152] == [3, 8, 36, 3]


@pytest.mark.parametrize("name,n_block3", [
    ("resnet_v1_101", 23),
    ("resnet_v1_152", 36),
])
def test_param_tree_structure(name, n_block3):
    s = _settings(name)
    s.validate()
    model = build_model(s)
    x = np.zeros((1, 64, 128, 3), np.float32)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
    base = shapes["params"]["feature_extractor/base"]
    block3_units = {k for k in base if k.startswith("block3/")}
    assert len(block3_units) == n_block3
    assert f"block3/unit_{n_block3}" in block3_units
    # bottleneck widths unchanged (slim tables)
    k = base["block3/unit_1"]["conv1"]["conv"]["kernel"]
    assert k.shape[-1] == 256


def test_warm_start_name_mapping_deep_variants():
    p = slim_name_to_flax_path(
        "resnet_v1_101/block3/unit_23/bottleneck_v1/conv2/BatchNorm/gamma"
    )
    assert p is not None and p[0] == "params"
    assert "block3/unit_23" in p
    p50 = slim_name_to_flax_path(
        "resnet_v1_50/block3/unit_6/bottleneck_v1/conv2/BatchNorm/gamma"
    )
    assert p50 is not None
    assert slim_name_to_flax_path("vgg16/conv1/weights") is None


def test_validate_rejects_unknown():
    with pytest.raises(NotImplementedError):
        _settings("resnet_v1_101").replace(
            name_feature_extractor="mobilenet_v2"
        ).validate()


def test_blocks_table_consistency():
    for name, blocks in FEATURE_EXTRACTOR_BLOCKS.items():
        assert len(blocks) == 4
        assert [b[1] for b in blocks] == [256, 512, 1024, 2048]
        assert [b[2] for b in blocks] == [64, 128, 256, 512]
