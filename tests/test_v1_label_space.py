"""Legacy OpenImages v1 label space (--openimages_label_space v1).

Reference: input_subset_bboxes.py:37-52 (10 aggregated classes) vs
input_subset_bboxes_v2.py:38-53 (15 fine classes). The rebuild realizes v1
as a projection into the v2 space (taxonomy.V1_CID2V2_CID); these tests pin
(a) the aggregation semantics, (b) the soundness of the projection against
the v2 loss/fusion tables, and (c) end-to-end pipeline behavior.
"""

import os
import pickle

import numpy as np
import pytest
from PIL import Image

from iv2019_tpu.input.openimages import bbox_train_input, mid2cid_for
from iv2019_tpu.problem.taxonomy import (
    OPEN_IMAGES_MID2CID,
    OPEN_IMAGES_MID2CID_V1,
    V1_CID2V2_CID,
    get_taxonomy,
)

from helpers import tiny_settings


class TestV1Map:
    def test_aggregation_semantics(self):
        m = mid2cid_for(tiny_settings(openimages_label_space="v1"))
        # all five human MIDs collapse to the person cid
        humans = ["/m/01g317", "/m/04yx4", "/m/03bt1vf", "/m/01bl7v", "/m/05r655"]
        assert {m[mid] for mid in humans} == {6}
        # both sign MIDs collapse to the traffic-sign cid
        assert m["/m/01mqdt"] == m["/m/02pv19"] == 12
        # unaggregated classes keep their v2 cids
        for mid in ["/m/0199g", "/m/01bjv", "/m/0k4j", "/m/04_sv", "/m/07jdr", "/m/07r04"]:
            assert m[mid] == OPEN_IMAGES_MID2CID[mid]
        assert m["void"] == 14

    def test_v2_is_default(self):
        assert mid2cid_for(tiny_settings()) is OPEN_IMAGES_MID2CID

    def test_projection_sound_against_loss_tables(self):
        """Every member of a v1 aggregate must hit the same head cid as its
        v1 representative under the v2 tables — otherwise the projection
        would change v1's loss semantics."""
        v2 = OPEN_IMAGES_MID2CID
        v1 = OPEN_IMAGES_MID2CID_V1
        for name in ("cityscapes", "vistas"):
            tax = get_taxonomy(name)
            for table in (
                tax.per_bbox_cids2l1_cids,
                tax.per_bbox_cids2vehicle_cids,
                tax.per_bbox_cids2human_cids,
                tax.per_bbox_cids2common_cids,
            ):
                for mid, v1cid in v1.items():
                    rep = V1_CID2V2_CID[v1cid]
                    assert table[v2[mid]] == table[rep], (name, mid)

    def test_rejects_unknown_space(self):
        with pytest.raises(ValueError, match="openimages_label_space"):
            tiny_settings(openimages_label_space="v3")


class TestV1Pipeline:
    def _make_dataset(self, tmp_path, bboxes):
        img_dir = tmp_path / "imgs"
        os.makedirs(img_dir, exist_ok=True)
        rng = np.random.RandomState(0)
        mapping = {}
        for i, boxes in enumerate(bboxes):
            imageid = f"im{i}"
            arr = rng.randint(0, 255, (40, 70, 3), np.uint8)
            Image.fromarray(arr).save(img_dir / f"{imageid}.jpg")
            mapping[imageid] = boxes
        pkl = tmp_path / "bboxes.pkl"
        with open(pkl, "wb") as f:
            pickle.dump(mapping, f)
        return str(img_dir), str(pkl)

    def test_v1_merges_humans_in_rasterized_labels(self, tmp_path):
        # one man box + one woman box, disjoint; under v1 both land on cid 6
        boxes = [
            [
                ("/m/04yx4", (0.0, 0.4, 0.0, 0.9)),  # man
                ("/m/03bt1vf", (0.6, 1.0, 0.0, 0.9)),  # woman
            ]
        ] * 2
        img_dir, pkl = self._make_dataset(tmp_path, boxes)
        common = dict(
            openimages_image_dir=img_dir,
            openimages_bboxes_path=pkl,
            Nb=2,
            input_seed=7,
        )
        s_v1 = tiny_settings(openimages_label_space="v1", **common)
        s_v2 = tiny_settings(**common)
        b1 = next(bbox_train_input(s_v1))
        b2 = next(bbox_train_input(s_v2))
        la1, la2 = b1["prolabels"], b2["prolabels"]
        # v1: all human mass on cid 6; cids 7, 8 empty
        assert la1[..., 6].max() > 0.9
        assert la1[..., 7].max() == 0 and la1[..., 8].max() == 0
        # v2: man on 7, woman on 8, nothing on 6
        assert la2[..., 7].max() > 0.9 and la2[..., 8].max() > 0.9
        assert la2[..., 6].max() == 0
        # the *union* of human mass is identical (same pixels, same seed)
        h1 = la1[..., 6]
        h2 = la2[..., 6:11].sum(-1)
        np.testing.assert_allclose(h1, h2, atol=1e-5)
        # images identical — the label space doesn't perturb the image path
        np.testing.assert_allclose(b1["proimages"], b2["proimages"], atol=1e-6)

    def test_v1_equals_v2_without_aggregated_classes(self, tmp_path):
        boxes = [
            [("/m/0k4j", (0.1, 0.7, 0.1, 0.8)), ("/m/01bjv", (0.3, 0.9, 0.2, 0.6))]
        ] * 2
        img_dir, pkl = self._make_dataset(tmp_path, boxes)
        common = dict(
            openimages_image_dir=img_dir,
            openimages_bboxes_path=pkl,
            Nb=2,
            input_seed=3,
        )
        b1 = next(bbox_train_input(tiny_settings(openimages_label_space="v1", **common)))
        b2 = next(bbox_train_input(tiny_settings(**common)))
        np.testing.assert_allclose(b1["prolabels"], b2["prolabels"], atol=1e-6)
