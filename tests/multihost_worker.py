"""Worker for tests/test_multihost.py: one process of a 2-process CPU
"cluster" (2 local devices each -> 4 global), or the single-process
4-device reference run. Prints one JSON line with per-step losses and the
final parameter norm; the test compares them across configurations.

Run (distributed):  python multihost_worker.py --pid I --nproc 2 --port P
Run (reference):    python multihost_worker.py
"""

import argparse
import json
import os
import sys

parser = argparse.ArgumentParser()
parser.add_argument("--pid", type=int, default=None)
parser.add_argument("--nproc", type=int, default=2)
parser.add_argument("--port", type=int, default=0)
parser.add_argument("--spatial", type=int, default=1,
                    help="spatial_partitions: composes the multi-host 'data' "
                         "axis (across processes) with image-height sharding "
                         "(within each process's local chips)")
parser.add_argument("--slices", type=int, default=1,
                    help="num_slices: composes multi-host processes with the "
                         "multi-slice 'replica' (DCN) outer mesh axis — with "
                         "2 procs x 2 local devices, each slice is one whole "
                         "process (contiguous device order), so 'replica' "
                         "crosses processes and 'data' stays process-local")
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

import numpy as np  # noqa: E402

import helpers  # noqa: E402
from iv2019_tpu.input.prefetch import _to_device  # noqa: E402
from iv2019_tpu.parallel import multihost  # noqa: E402
from iv2019_tpu.parallel.mesh import create_mesh, replicate  # noqa: E402
from iv2019_tpu.train.optimizer import make_optimizer  # noqa: E402
from iv2019_tpu.train.state import create_train_state  # noqa: E402
from iv2019_tpu.train.step import make_train_step  # noqa: E402

N_GLOBAL = 4  # per supervision type

settings = helpers.tiny_settings(
    Nb_per_pixel=N_GLOBAL, Nb_per_bbox=N_GLOBAL, Nb_per_image=N_GLOBAL,
    Nb=N_GLOBAL, Ntrain=N_GLOBAL * 4,
    coordinator_address=f"localhost:{args.port}" if distributed else "",
    num_processes=args.nproc if distributed else 1,
    process_id=args.pid or 0,
)
settings.validate()
multihost.initialize(settings)  # no-op when single-process
assert jax.device_count() == 4, jax.device_count()

if distributed:
    # replicated put of a zero-size leaf (empty weak sub-batch contract)
    from iv2019_tpu.parallel.mesh import replicated_sharding

    mesh0 = create_mesh()
    z = multihost.put_sharded(
        np.zeros((0, 3), np.float32), replicated_sharding(mesh0)
    )
    assert z.shape == (0, 3)
    # record striding: disjoint, complete
    mine = list(multihost.shard_records(range(10)))
    assert mine == list(range(args.pid or 0, 10, args.nproc)), mine

mesh = create_mesh(num_slices=args.slices, spatial_partitions=args.spatial)
if args.slices > 1:
    assert mesh.shape["replica"] == args.slices, dict(mesh.shape)
if args.spatial > 1:
    # 4 devices as (data=4/F, spatial=F); device order puts 'data' across
    # processes and 'spatial' within a process (create_mesh docstring), so
    # each process still feeds full-height images for its batch share
    assert mesh.shape["spatial"] == args.spatial, dict(mesh.shape)
model = helpers.tiny_model(settings)
tx, _ = make_optimizer(settings)

batch = helpers.synthetic_batch(settings, seed=123)
if distributed:
    # each process feeds exactly its addressable slice of the global batch
    share = N_GLOBAL // args.nproc
    lo, hi = args.pid * share, (args.pid + 1) * share
    batch = {k: v[lo:hi] for k, v in batch.items()}

variables = jax.jit(
    lambda: model.init(
        jax.random.PRNGKey(0),
        np.zeros((3 * N_GLOBAL, settings.height_feature_extractor,
                  settings.width_feature_extractor, 3), np.float32),
    )
)()
variables = jax.device_get(variables)
state = create_train_state(variables, tx, settings.ema_decay)
state = replicate(state, mesh)
step_fn = make_train_step(settings, model=model, tx=tx, mesh=mesh)

device_batch = _to_device(batch, mesh)
out = {"process": args.pid, "losses": []}
for _ in range(2):
    state, metrics = step_fn(state, device_batch)
    out["losses"].append(float(jax.device_get(metrics["total"])))

sq = jax.jit(
    lambda p: sum(jax.tree.leaves(jax.tree.map(lambda a: (a * a).sum(), p)))
)(state.params)
out["param_sq_norm"] = float(jax.device_get(sq))
print("RESULT " + json.dumps(out), flush=True)
