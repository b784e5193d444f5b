"""Worker process for tests/test_distributed_multiprocess.py.

Runs ONE JAX process of a multi-process CPU cluster (SURVEY.md §4's
multi-node clause, VERDICT r3 next-step #5): `jax.distributed.initialize`
against a shared coordinator, a global mesh spanning BOTH processes'
devices, process-local shards assembled into global arrays, and the
production `make_sharded_mpc_step` solve whose psum-reduced stats cross
the process boundary through the gloo CPU collectives.

Usage: python _distributed_worker.py <process_id> <num_processes> <port>
Prints one JSON line `{"process_id": ..., "total": ..., "converged": ...,
"control0": [...], "checksum": ...}` on success.
"""

import json
import sys

PID = int(sys.argv[1])
NPROC = int(sys.argv[2])
PORT = sys.argv[3]

import jax  # noqa: E402

# Pin the backend BEFORE distributed init / first device use.  The config
# route (not env vars) survives hosting plugins that override JAX_PLATFORMS
# (repo conftest gotcha).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.config.update("jax_enable_x64", True)

from copra_tpu.parallel import distributed_init  # noqa: E402

distributed_init(coordinator_address=f"127.0.0.1:{PORT}",
                 num_processes=NPROC, process_id=PID)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

import copra_tpu as ct  # noqa: E402
from copra_tpu.parallel import (batch_axes, make_mesh,  # noqa: E402
                                make_sharded_mpc_step)

from fixtures import (A, B, D, M, N_MAT, SMALL_N, SMALL_X0, UD,  # noqa: E402
                      U_LOWER, U_UPPER, WU, WX, XD, X_LOWER, X_UPPER)

assert jax.process_count() == NPROC, jax.process_count()
assert len(jax.devices()) == 4 * NPROC, len(jax.devices())

BATCH = 16
mesh = make_mesh()                      # 1-D ("batch",) over ALL processes
shard = NamedSharding(mesh, P("batch"))
repl = NamedSharding(mesh, P())


def global_batched(full_np):
    """Per-process local rows -> one global sharded array."""
    local = np.asarray(full_np).reshape(
        (NPROC, BATCH // NPROC) + np.asarray(full_np).shape[1:])[PID]
    return jax.make_array_from_process_local_data(
        shard, local, np.asarray(full_np).shape)


def global_replicated(full_np):
    return jax.make_array_from_process_local_data(
        repl, np.asarray(full_np), np.asarray(full_np).shape)


# same scenario fleet as tests/test_parallel.py::batched_lti
rng = np.random.default_rng(42)
x0s = np.repeat(np.asarray(SMALL_X0)[None], BATCH, axis=0)
x0s[1:] += rng.normal(scale=[0.02, 0.1], size=(BATCH - 1, 2))
x0s[:, 1] = np.minimum(x0s[:, 1], -0.1)

base = ct.LTISystem.create(A, B, D, SMALL_X0, SMALL_N)
system = base.with_x0(jnp.asarray(x0s))
axes = batch_axes(system)
system = jax.tree_util.tree_map(
    lambda leaf, ax: (global_batched(leaf) if ax == 0
                      else global_replicated(leaf)),
    system, axes, is_leaf=lambda x: x is None)

costs = [ct.TargetCost.create(M, XD, weights=WX),
         ct.ControlCost.create(N_MAT, UD, weights=WU)]
constraints = [ct.TrajectoryBoundConstraint.create(X_LOWER, X_UPPER),
               ct.ControlBoundConstraint.create(U_LOWER, U_UPPER)]

step = make_sharded_mpc_step(mesh, costs, constraints,
                             ct.SolverOptions(max_iter=4000))
res, stats = step(system, None)

# cross-process collectives: stats are psum/pmax over the global mesh axis
total = int(stats["total"])
converged = int(stats["converged"])

# every process can read fully-replicated values; the per-lane control is
# sharded — gather this process's local lanes and reduce to a checksum the
# parent compares across workers (process-local shards must agree on the
# global solution)
local_first_controls = {}
for s in res.control.addressable_shards:
    lane0 = s.index[0].start or 0
    local_first_controls[lane0] = np.asarray(s.data)[:, 0].tolist()
checksum = float(jnp.sum(res.control ** 2))   # replicated reduction

control0 = None
if 0 in local_first_controls:
    # lane 0 of the fleet is the golden SmallSystem scenario
    full_u0 = np.asarray(
        [s.data for s in res.control.addressable_shards
         if (s.index[0].start or 0) == 0][0])[0]
    control0 = full_u0.tolist()

print(json.dumps({
    "process_id": PID,
    "n_processes": jax.process_count(),
    "n_global_devices": len(jax.devices()),
    "total": total,
    "converged": converged,
    "checksum": checksum,
    "control0": control0,
    "local_lanes": sorted(local_first_controls),
}), flush=True)
