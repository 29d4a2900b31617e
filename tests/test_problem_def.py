"""Tests for the problem-definition / taxonomy label-space core."""

import os

import numpy as np
import pytest

from iv2019_tpu.problem.problem_def import (
    ProblemDef,
    derive_output_num_classes,
    load_problem_def,
    replace_voids,
)
from iv2019_tpu.problem.taxonomy import NUM_WEAK_CLASSES, get_taxonomy

_PKG = os.path.join(os.path.dirname(__file__), "..", "iv2019_tpu")
CITYSCAPES_JSON = os.path.join(_PKG, "problem_definitions", "cityscapes", "problem01.json")
VISTAS_JSON = os.path.join(_PKG, "problem_definitions", "vistas", "problem01.json")


def test_replace_voids():
    assert replace_voids([-1, 0, 1, -1, 2]) == [3, 0, 1, 3, 2]
    assert replace_voids([0, 1, 2]) == [0, 1, 2]


def test_output_num_classes():
    # cityscapes: max cid 18, has void -> 20
    assert derive_output_num_classes([-1, 0, 18]) == 20
    assert derive_output_num_classes([0, 18]) == 19
    assert derive_output_num_classes([0, 18], train_void_class=True) == 20


def test_load_cityscapes_problem_def():
    pd = load_problem_def(CITYSCAPES_JSON)
    assert len(pd.lids2cids) == 34
    assert pd.has_void
    assert pd.output_num_classes() == 20
    assert pd.num_classes == 19
    assert len(pd.cids2labels) == 20
    assert pd.cids2labels[-1] == "void"
    assert pd.palette().shape == (20, 3)
    lut = pd.lids2cids_voids_replaced()
    assert lut.dtype == np.int32
    assert lut.max() == 19 and lut.min() == 0
    # default eval remap: identity with void -> -1 at tail
    remap = pd.evaluation_cids_map()
    assert remap == list(range(19)) + [-1]


def test_load_vistas_problem_def():
    pd = load_problem_def(VISTAS_JSON)
    assert len(pd.lids2cids) == 66
    assert pd.output_num_classes() == 66


def test_invalid_lids2cids_raises():
    pd = ProblemDef(
        lids2cids=(0, 2),  # gap: 1 missing
        cids2labels=("a", "b", "c"),
        cids2colors=((0, 0, 0), (1, 1, 1), (2, 2, 2)),
        cids2lids=(0, 1, 2),
    )
    with pytest.raises(ValueError):
        pd.validate()


@pytest.mark.parametrize("name,n_l1,n_veh,n_hum,n_common", [
    ("cityscapes", 14, 7, 3, 20),
    ("vistas", 53, 12, 5, 66),
])
def test_taxonomy_shapes(name, n_l1, n_veh, n_hum, n_common):
    tax = get_taxonomy(name)
    assert tax.num_l1_classes == n_l1
    assert tax.num_vehicle_classes == n_veh
    assert tax.num_human_classes == n_hum
    assert tax.num_common_classes == n_common
    assert len(tax.per_pixel_cids2l1_cids) == (20 if name == "cityscapes" else 66)
    assert len(tax.per_bbox_cids2l1_cids) == NUM_WEAK_CLASSES


def test_taxonomy_fusion_consistency_cityscapes():
    tax = get_taxonomy("cityscapes")
    # the vehicle metaclass L1 cid fuses through the vehicle head
    assert tax.cid_l1_vehicle == 12
    assert tax.cid_l1_human == 11
    # L1 "vehicle" cid maps to car (13) in the common space via table
    assert tax.l1_cids2common_cids[tax.cid_l1_vehicle] == 13
    # vehicle head cids land in common cids 13..19
    assert set(tax.l2_vehicle_cids2common_cids.tolist()) == set(range(13, 20))
    # human head: person 11, rider 12, void 19
    assert tax.l2_human_cids2common_cids.tolist() == [11, 12, 19]
    # consistency: per-pixel -> L1 metaclass agrees with per-pixel -> head != void
    for cid in range(20):
        is_vehicle_l1 = tax.per_pixel_cids2l1_cids[cid] == tax.cid_l1_vehicle
        is_vehicle_head = tax.per_pixel_cids2vehicle_cids[cid] != tax.num_vehicle_classes - 1
        assert is_vehicle_l1 == is_vehicle_head


def test_taxonomy_fusion_consistency_vistas():
    tax = get_taxonomy("vistas")
    assert tax.l1_cids2common_cids[tax.cid_l1_vehicle] == 52
    assert tax.l1_cids2common_cids[tax.cid_l1_human] == 19
    for cid in range(66):
        is_human_l1 = tax.per_pixel_cids2l1_cids[cid] == tax.cid_l1_human
        is_human_head = tax.per_pixel_cids2human_cids[cid] != tax.num_human_classes - 1
        assert is_human_l1 == is_human_head


def test_unknown_taxonomy_raises():
    with pytest.raises(ValueError):
        get_taxonomy("kitti")
