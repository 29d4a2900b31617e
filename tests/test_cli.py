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

    def test_memory_lever_flags(self):
        args = build_argparser(TRAIN).parse_args(
            ["/tmp/log", "cityscapes", "--remat", "--grad_accum_steps", "2"]
        )
        s = settings_from_args(args, TRAIN)
        assert s.remat is True
        assert s.grad_accum_steps == 2
        # defaults: both levers off
        args = build_argparser(TRAIN).parse_args(["/tmp/log", "cityscapes"])
        s = settings_from_args(args, TRAIN)
        assert s.remat is False and s.grad_accum_steps == 1

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


class TestDatasetNameResolution:
    """Eval/predict must rebuild the *trained* model: the dataset name
    comes from log_dir/settings.txt unless explicitly (and consistently)
    given — a cityscapes-headed model against a vistas checkpoint dies
    deep in restore otherwise (regression from the vistas quality run)."""

    def _trained_log(self, tmp_path, name):
        from iv2019_tpu.config import Settings

        s = Settings(
            per_pixel_dataset_name=name, log_dir=str(tmp_path), mode="train",
            Ntrain=8, Ne=3, learning_rate_boundaries=(1, 2),
            learning_rate_values=(0.01, 0.005, 0.0025),
        ).finalize()
        s.dump(str(tmp_path / "settings.txt"))
        return str(tmp_path)

    def test_reads_trained_name(self, tmp_path):
        from iv2019_tpu.config import dataset_name_from_log_dir

        log = self._trained_log(tmp_path, "vistas")
        assert dataset_name_from_log_dir(log) == "vistas"
        assert dataset_name_from_log_dir(str(tmp_path / "missing")) is None

    def test_eval_infers_vistas_from_settings(self, tmp_path):
        from iv2019_tpu.config import resolve_dataset_name

        log = self._trained_log(tmp_path, "vistas")
        args = build_argparser(EVAL).parse_args(["" + log, "10", CITYSCAPES_JSON])
        s = settings_from_args(args, EVAL)
        s = resolve_dataset_name(s, args.per_pixel_dataset_name)
        assert s.per_pixel_dataset_name == "vistas"

    def test_explicit_mismatch_is_hard_error(self, tmp_path):
        import pytest

        from iv2019_tpu.config import resolve_dataset_name

        log = self._trained_log(tmp_path, "vistas")
        args = build_argparser(EVAL).parse_args(
            [log, "10", CITYSCAPES_JSON, "--per_pixel_dataset_name", "cityscapes"]
        )
        s = settings_from_args(args, EVAL)
        with pytest.raises(SystemExit, match="contradicts"):
            resolve_dataset_name(s, args.per_pixel_dataset_name)

    def test_no_settings_txt_defaults_cityscapes(self, tmp_path):
        from iv2019_tpu.config import resolve_dataset_name

        args = build_argparser(EVAL).parse_args(
            [str(tmp_path), "10", CITYSCAPES_JSON]
        )
        s = settings_from_args(args, EVAL)
        s = resolve_dataset_name(s, args.per_pixel_dataset_name)
        assert s.per_pixel_dataset_name == "cityscapes"


class TestTrainedModelResolution:
    """Eval/predict must rebuild the trained *architecture* too: backbone
    name, head width, PSP, FOV kernel, upsampler — read from
    log_dir/settings.txt unless explicitly (and consistently) overridden
    (regression: evaluating a --name_feature_extractor resnet_v1_101 run
    restored a resnet_v1_50 template and died inside orbax)."""

    def _trained_log(self, tmp_path, **kw):
        from iv2019_tpu.config import Settings

        s = Settings(
            per_pixel_dataset_name="cityscapes", log_dir=str(tmp_path),
            mode="train", Ntrain=8, Ne=3, learning_rate_boundaries=(1, 2),
            learning_rate_values=(0.01, 0.005, 0.0025), **kw,
        ).finalize()
        s.dump(str(tmp_path / "settings.txt"))
        return str(tmp_path)

    def test_infers_architecture_fields(self, tmp_path):
        from iv2019_tpu.config import resolve_trained_model

        log = self._trained_log(
            tmp_path, name_feature_extractor="resnet_v1_101",
            feature_dims_decreased=128, psp_module=True,
        )
        argv = [log, "10", CITYSCAPES_JSON]
        args = build_argparser(EVAL).parse_args(argv)
        s = resolve_trained_model(settings_from_args(args, EVAL), argv)
        assert s.name_feature_extractor == "resnet_v1_101"
        assert s.feature_dims_decreased == 128
        assert s.psp_module is True

    def test_explicit_match_passes(self, tmp_path):
        from iv2019_tpu.config import resolve_trained_model

        log = self._trained_log(
            tmp_path, name_feature_extractor="resnet_v1_101"
        )
        argv = [log, "10", CITYSCAPES_JSON,
                "--name_feature_extractor", "resnet_v1_101"]
        args = build_argparser(EVAL).parse_args(argv)
        s = resolve_trained_model(settings_from_args(args, EVAL), argv)
        assert s.name_feature_extractor == "resnet_v1_101"

    def test_explicit_mismatch_is_hard_error(self, tmp_path):
        import pytest

        from iv2019_tpu.config import resolve_trained_model

        log = self._trained_log(
            tmp_path, name_feature_extractor="resnet_v1_101"
        )
        argv = [log, "10", CITYSCAPES_JSON,
                "--name_feature_extractor", "resnet_v1_50"]
        args = build_argparser(EVAL).parse_args(argv)
        with pytest.raises(SystemExit, match="contradicts"):
            resolve_trained_model(settings_from_args(args, EVAL), argv)

    def test_explicit_mismatch_equals_form(self, tmp_path):
        import pytest

        from iv2019_tpu.config import resolve_trained_model

        log = self._trained_log(
            tmp_path, name_feature_extractor="resnet_v1_101"
        )
        argv = [log, "10", CITYSCAPES_JSON,
                "--name_feature_extractor=resnet_v1_50"]
        args = build_argparser(EVAL).parse_args(argv)
        with pytest.raises(SystemExit, match="contradicts"):
            resolve_trained_model(settings_from_args(args, EVAL), argv)

    def test_no_settings_txt_keeps_cli_values(self, tmp_path):
        from iv2019_tpu.config import resolve_trained_model

        argv = [str(tmp_path), "10", CITYSCAPES_JSON]
        args = build_argparser(EVAL).parse_args(argv)
        s = resolve_trained_model(settings_from_args(args, EVAL), argv)
        assert s.name_feature_extractor == "resnet_v1_50"


def test_real_data_runbook_flags_exist():
    """Every --flag in tools/real_data_runbook.sh must be a real CLI flag,
    so the runbook cannot rot (VERDICT r2 #10: parity run must be a single
    command the day the datasets exist)."""
    import re
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = open(os.path.join(root, "tools", "real_data_runbook.sh")).read()
    flags = set(re.findall(r"--([A-Za-z_]+)", script))

    from iv2019_tpu.config import build_argparser

    known = set()
    for mode in ("train", "eval", "predict"):
        parser = build_argparser(mode)
        for action in parser._actions:
            for opt in action.option_strings:
                known.add(opt.lstrip("-"))
    missing = flags - known
    assert not missing, f"runbook references unknown flags: {sorted(missing)}"
