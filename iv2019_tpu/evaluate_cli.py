"""Evaluation entry point (reference code/evaluate.py parity).

Usage:
  python -m iv2019_tpu.evaluate_cli LOG_DIR NEVAL PROBLEM_DEF [flags]

Evaluates one checkpoint (or all with --eval_all_ckpts), prints per-class
metrics online, and dumps ``all_metrics.txt`` + ``all_metrics.p``
(reference evaluate.py:54-67).
"""

from __future__ import annotations

import os
import pickle
import sys

from iv2019_tpu.config import (
    EVAL,
    build_argparser,
    resolve_dataset_name,
    resolve_trained_model,
    settings_from_args,
)
from iv2019_tpu.input.cityscapes import evaluate_input
from iv2019_tpu.system import SemanticSegmentation
from iv2019_tpu.utils.metrics import print_metrics_from_confusion_matrix


def main(argv):
    from iv2019_tpu.utils.platform import (
        enable_compilation_cache,
        honor_platform_env,
    )

    honor_platform_env()
    enable_compilation_cache()
    args = build_argparser(EVAL).parse_args(argv)
    settings = settings_from_args(args, EVAL)
    settings = resolve_dataset_name(settings, args.per_pixel_dataset_name)
    settings = resolve_trained_model(settings, argv)

    system = SemanticSegmentation({"eval": evaluate_input}, settings=settings)
    all_metrics = system.evaluate()

    from iv2019_tpu.parallel import multihost

    if not multihost.is_primary():
        # multi-process sweep: every process holds the merged metrics, but
        # only the chief writes the artifacts (shared filesystem)
        return all_metrics

    out_dir = system.eval_res_dir
    labels = list(system.evaluation_problem_def.cids2labels)
    if (
        -1 in system.evaluation_problem_def.lids2cids
        and not settings.train_void_class
    ):
        labels = labels[:-1]
    with open(os.path.join(out_dir, "all_metrics.txt"), "w") as f:
        for metrics in all_metrics:
            print(f"step: {metrics['global_step']}", file=f)
            print_metrics_from_confusion_matrix(
                metrics["confusion_matrix"], labels, printfile=f, summary=True
            )
    with open(os.path.join(out_dir, "all_metrics.p"), "wb") as f:
        pickle.dump(all_metrics, f)
    return all_metrics


if __name__ == "__main__":
    main(sys.argv[1:])
