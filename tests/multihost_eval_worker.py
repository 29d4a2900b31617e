"""Worker for the multi-process eval sweep test (tests/test_multihost.py).

One process of a 2-process CPU "cluster" (2 local devices each) running
``system.evaluate()`` with ``--eval_all_ckpts`` over a shared log_dir, or
the single-process 4-device reference run (which also trains the tiny
model first to create the checkpoints). The sweep is embarrassingly
parallel across checkpoints: each process evaluates a disjoint slice on
its own local mesh, then the partial confusion matrices are allgathered
(system.py evaluate); every process must end up with the same merged
all_metrics, equal to the single-process sweep. Pod-scale analog of the
reference's serial sweep (system_factory.py:378-397).

Run (reference):    python multihost_eval_worker.py --log_dir D
Run (distributed):  python multihost_eval_worker.py --log_dir D \
                        --pid I --nproc 2 --port P
"""

import argparse
import json
import os
import sys

parser = argparse.ArgumentParser()
parser.add_argument("--log_dir", required=True)
parser.add_argument("--pid", type=int, default=None)
parser.add_argument("--nproc", type=int, default=2)
parser.add_argument("--port", type=int, default=0)
args = parser.parse_args()
distributed = args.pid is not None

os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["JAX_PLATFORMS"] = "cpu"
local_devices = 2 if distributed else 4
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={local_devices}"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import helpers  # noqa: E402
from iv2019_tpu.input.cityscapes import evaluate_input  # noqa: E402
from iv2019_tpu.input.heterogeneous import train_input  # noqa: E402
from iv2019_tpu.system import SemanticSegmentation  # noqa: E402

_PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "iv2019_tpu"
)
CITYSCAPES_JSON = os.path.join(
    _PKG, "problem_definitions", "cityscapes", "problem01.json"
)

settings = helpers.tiny_settings(
    log_dir=args.log_dir,
    training_problem_def_path=CITYSCAPES_JSON,
    synthetic_data=True,
    save_checkpoints_steps=2,
    eval_all_ckpts=True,
    Neval=8,
    coordinator_address=f"localhost:{args.port}" if distributed else "",
    num_processes=args.nproc if distributed else 1,
    process_id=args.pid or 0,
)


def model_fn(s):
    return helpers.tiny_model(s, train=(s.mode == "train"))


input_fns = {"train": train_input, "eval": evaluate_input}

if not distributed:
    # the reference run creates the checkpoints the cluster then sweeps
    system = SemanticSegmentation(input_fns, model_fn=model_fn,
                                  settings=settings)
    system.train(max_steps=4, log_every=2)
else:
    system = SemanticSegmentation(
        {"eval": evaluate_input}, model_fn=model_fn, settings=settings
    )

all_metrics = system.evaluate()

if distributed:
    # spatial_partitions does not compose with the per-process eval mesh:
    # the guard must fire before any filesystem side effects
    from iv2019_tpu.parallel import multihost  # noqa: E402

    assert jax.process_count() == 2
    guard = SemanticSegmentation.__new__(SemanticSegmentation)
    guard._settings = settings.replace(spatial_partitions=2)
    guard._mesh = None
    try:
        guard.evaluate()
        raise AssertionError("expected NotImplementedError for spatial eval")
    except NotImplementedError:
        pass
    assert multihost.is_primary() == (args.pid == 0)

out = {
    "process": args.pid,
    "steps": [m["global_step"] for m in all_metrics],
    "mean_ious": [float(m["mean_iou"]) for m in all_metrics],
    "global_accuracies": [float(m["global_accuracy"]) for m in all_metrics],
    "cm_sums": [int(m["confusion_matrix"].sum()) for m in all_metrics],
}
print("RESULT " + json.dumps(out), flush=True)
