"""Device meshes, shardings, and the multi-host solve path.

The reference has no distributed layer (SURVEY.md §2.3); this module is the
TPU-native communication backend called for by the design: a
`jax.sharding.Mesh` over chips, `NamedSharding` placement of the scenario
batch, GSPMD-partitioned `jit` for the solve, and a `shard_map` path with
explicit `psum` collectives (riding ICI within a slice, DCN across slices).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..constraints import Constraint
from ..costs import CostFunction
from ..mpc import MPCResult
from ..qp.types import SolverOptions, WarmStart
from ..systems import System
from .batch import batch_axes, solve_mpc_batch, warm_start_axes

BATCH_AXIS = "batch"


def make_mesh(shape: Optional[Tuple[int, ...]] = None,
              axis_names: Tuple[str, ...] = (BATCH_AXIS,),
              devices=None) -> Mesh:
    """Build a device mesh; defaults to a 1-D ``("batch",)`` mesh over all
    devices — scenario DP is the natural partitioning of batched MPC."""
    if devices is None:
        devices = jax.devices()
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh, axis: str = BATCH_AXIS) -> NamedSharding:
    """Sharding that splits the leading (scenario) axis over ``axis``."""
    return NamedSharding(mesh, P(axis))


def shard_batch(tree, mesh: Mesh, axis: str = BATCH_AXIS,
                reference=None):
    """Place a batched pytree on the mesh: batched leaves sharded on their
    leading axis, unbatched leaves replicated.

    ``reference``: optional in_axes tree (from :func:`batch_axes`) marking
    which leaves are batched; by default every leaf is treated as batched.
    """
    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    if reference is None:
        return jax.device_put(tree, shard)
    return jax.tree_util.tree_map(
        lambda leaf, ax: jax.device_put(leaf, shard if ax == 0 else repl),
        tree, reference,
        is_leaf=lambda x: x is None)


def sharded_solve_mpc(system: System,
                      costs: Sequence[CostFunction] = (),
                      constraints: Sequence[Constraint] = (),
                      options: SolverOptions = SolverOptions(),
                      warm_start: Optional[WarmStart] = None,
                      mesh: Optional[Mesh] = None,
                      axis: str = BATCH_AXIS) -> MPCResult:
    """One GSPMD-partitioned batched solve over the mesh.

    A sharding constraint pins the scenario axis to the mesh; XLA then
    partitions the entire condense→build→solve pipeline with no cross-device
    communication (scenario DP is embarrassingly parallel — the collectives
    XLA inserts are only for the replicated cost/constraint broadcasts).
    """
    if mesh is None:
        mesh = make_mesh()
    shard = NamedSharding(mesh, P(axis))
    axes = batch_axes(system)
    system = jax.tree_util.tree_map(
        lambda leaf, ax: (jax.lax.with_sharding_constraint(leaf, shard)
                          if ax == 0 else leaf),
        system, axes, is_leaf=lambda x: x is None)
    return solve_mpc_batch(system, costs, constraints, options, warm_start)


def make_sharded_mpc_step(mesh: Mesh,
                          costs: Sequence[CostFunction],
                          constraints: Sequence[Constraint],
                          options: SolverOptions = SolverOptions(),
                          axis: str = BATCH_AXIS,
                          with_stats: bool = True):
    """Build the jitted receding-horizon step used in production serving.

    Returns ``step(system, warm) -> (MPCResult, stats)`` where ``stats`` is a
    dict of `psum`-reduced batch metrics (scenarios converged, max residuals,
    mean iterations) computed inside `shard_map` — explicit XLA collectives
    over the ``axis`` mesh dimension, the TPU-native equivalent of a
    NCCL/MPI reduction layer (which the reference lacks, SURVEY.md §2.3).

    The solve itself uses uniform iteration counts across shards
    (``early_exit`` is forced off) so no lane or shard straggles — the fix
    for skewed early-exit in SURVEY.md §7.3 item 5.
    """
    costs = tuple(costs)
    constraints = tuple(constraints)
    opts = options.replace(early_exit=False)

    def local_solve(system, warm):
        res = solve_mpc_batch(system, costs, constraints, opts, warm)
        if not with_stats:
            return res, {}
        sol = res.solution
        n_conv = jax.lax.psum(jnp.sum(sol.status == 0), axis)
        n_tot = jax.lax.psum(sol.status.shape[0], axis)
        stats = {
            "converged": n_conv,
            "total": n_tot,
            "max_primal_residual": jax.lax.pmax(
                jnp.max(sol.primal_residual), axis),
            "max_dual_residual": jax.lax.pmax(
                jnp.max(sol.dual_residual), axis),
        }
        return res, stats

    def specs_for(tree, axes_tree):
        return jax.tree_util.tree_map(
            lambda _, ax: P(axis) if ax == 0 else P(),
            tree, axes_tree, is_leaf=lambda x: x is None)

    @jax.jit
    def step(system, warm):
        sys_axes = batch_axes(system)
        in_specs = (specs_for(system, sys_axes),
                    specs_for(warm, warm_start_axes(warm))
                    if warm is not None else None)
        mapped = jax.shard_map(
            local_solve, mesh=mesh, in_specs=in_specs,
            out_specs=(P(axis), P()), check_vma=False)
        return mapped(system, warm)

    return step


def distributed_init(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host bring-up: `jax.distributed.initialize` wrapper.

    On TPU pods the arguments are auto-detected from the environment; after
    this, `jax.devices()` spans all hosts and `make_mesh` builds a global
    mesh whose collectives ride ICI intra-slice and DCN across slices.
    """
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
