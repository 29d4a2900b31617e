"""CLI smoke tests: argument parsing + settings assembly for all entry points."""

import os

import pytest

from iv2019_tpu.config import EVAL, PREDICT, TRAIN, build_argparser, settings_from_args

_PKG = os.path.join(os.path.dirname(__file__), "..", "iv2019_tpu")
CITYSCAPES_JSON = os.path.join(_PKG, "problem_definitions", "cityscapes", "problem01.json")


class TestTrainCli:
    def test_defaults(self):
        args = build_argparser(TRAIN).parse_args(["/tmp/log", "cityscapes"])
        s = settings_from_args(args, TRAIN)
        assert s.log_dir == "/tmp/log"
        assert s.per_pixel_dataset_name == "cityscapes"
        assert s.Nb == 4 and s.Ne == 17
        assert s.learning_rate_boundaries == (8, 15, 17)
        assert s.optimizer == "SGDM"
        assert s.stride_feature_extractor == 8

    def test_extra_args_constants(self):
        from iv2019_tpu.train_cli import _add_extra_args

        args = build_argparser(TRAIN).parse_args(["/tmp/log", "cityscapes"])
        s = _add_extra_args(settings_from_args(args, TRAIN))
        # reference train.py:62-68
        assert (s.Nb_per_pixel, s.Nb_per_bbox, s.Nb_per_image) == (4, 8, 4)
        assert not s.preserve_aspect_ratio_per_pixel
        assert s.preserve_aspect_ratio_per_bbox
        assert s.preserve_aspect_ratio_per_image
        assert s.training_problem_def_path.endswith("cityscapes/problem01.json")

    def test_vistas_constants(self):
        from iv2019_tpu.train_cli import _add_extra_args

        args = build_argparser(TRAIN).parse_args(["/tmp/log", "vistas"])
        s = _add_extra_args(settings_from_args(args, TRAIN))
        assert s.Ntrain == 18000
        assert (s.height_feature_extractor, s.width_feature_extractor) == (621, 855)

    def test_sub_batch_overrides(self):
        from iv2019_tpu.train_cli import _add_extra_args, _apply_sub_batch_overrides

        args = build_argparser(TRAIN).parse_args(
            ["/tmp/log", "cityscapes", "--Nb_per_image", "0", "--Nb_per_pixel", "2"]
        )
        s = _apply_sub_batch_overrides(
            _add_extra_args(settings_from_args(args, TRAIN)), args
        )
        assert (s.Nb_per_pixel, s.Nb_per_bbox, s.Nb_per_image) == (2, 8, 0)
        assert s.Nb == 2

    def test_lr_flags(self):
        args = build_argparser(TRAIN).parse_args(
            ["/tmp/log", "cityscapes", "--learning_rate_values", "0.1", "0.05",
             "--learning_rate_boundaries", "5", "--Ne", "10"]
        )
        s = settings_from_args(args, TRAIN).finalize()
        assert s.learning_rate_values_resolved == (0.1, 0.05)


class TestEvalPredictCli:
    def test_eval_args(self):
        args = build_argparser(EVAL).parse_args(
            ["/tmp/log", "500", CITYSCAPES_JSON, "--eval_all_ckpts", "--Nb", "2"]
        )
        s = settings_from_args(args, EVAL)
        assert s.Neval == 500
        assert s.eval_all_ckpts
        assert s.Nb == 2
        assert s.training_problem_def_path == CITYSCAPES_JSON

    def test_predict_args(self):
        args = build_argparser(PREDICT).parse_args(
            ["/tmp/log", CITYSCAPES_JSON, "/tmp/images", "--restore_emas",
             "--replace_voids", "--plotting"]
        )
        s = settings_from_args(args, PREDICT)
        assert s.predict_dir == "/tmp/images"
        assert s.restore_emas and s.replace_voids and s.plotting
        assert s.Nb == 1  # predict default
