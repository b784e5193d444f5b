"""Scenario-parallel and mesh-sharded MPC solving.

The reference (ANYbotics/copra) is single-process, single-threaded C++ — it
has no parallel or distributed machinery at all (SURVEY.md §2.3; grep over
``/root/reference`` finds no threads/MPI/NCCL/CUDA).  The TPU-native design
adds the parallelism layers as first-class capabilities:

* **Scenario data-parallelism (DP)** — `vmap` over batched systems, sharded
  over a mesh axis via `NamedSharding`; the TPU analog of running one
  ``copra::LMPC`` per scenario.
* **Mesh / multi-host scaling** — `jax.sharding.Mesh` + GSPMD; collectives
  ride ICI within a slice and DCN across slices.
* **Explicit-collective path** — `shard_map`-wrapped solve with `psum`-based
  batch statistics for uniform early-exit across shards.
"""

from .batch import (batch_axes, batch_size, solve_mpc_batch,
                    stack_systems, warm_start_axes)
from .mesh import (batch_sharding, distributed_init, make_mesh,
                   make_sharded_mpc_step, shard_batch, sharded_solve_mpc)
from .horizon import lqr_solve_sharded
from .model import solve_qp_model_parallel

__all__ = [
    "batch_axes", "batch_size", "solve_mpc_batch", "stack_systems",
    "warm_start_axes",
    "make_mesh", "batch_sharding", "shard_batch", "sharded_solve_mpc",
    "make_sharded_mpc_step", "distributed_init",
    "solve_qp_model_parallel", "lqr_solve_sharded",
]
