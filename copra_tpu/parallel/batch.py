"""Batched (vmapped) MPC solving — scenario data-parallelism on one chip.

Reference analog: none — copra solves one scenario per ``LMPC::solve()``
call on one CPU core (``/root/reference/src/LMPC.cpp:112-128``).  Here a
batch of scenarios is one pytree with a leading batch axis on some or all
leaves; `solve_mpc_batch` vmaps the full condense→build→solve→replay
pipeline over it.  Unbatched leaves (e.g. shared dynamics with per-scenario
initial states) broadcast automatically.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..constraints import Constraint
from ..costs import CostFunction
from ..mpc import MPCResult, solve_mpc
from ..qp.types import SolverOptions, WarmStart
from ..systems import LTISystem, System

# Canonical (unbatched) ranks of each system leaf; a leaf with higher rank
# carries a leading batch axis and gets mapped.
_LTI_NDIM = dict(A=2, B=2, d=1, x0=1)
_LTV_NDIM = dict(A=3, B=3, d=2, x0=1)


def batch_axes(system: System) -> System:
    """Build a vmap ``in_axes`` tree for a possibly-batched system.

    Leaves whose rank exceeds the canonical system rank are mapped over
    axis 0; canonical-rank leaves broadcast (axis ``None``).
    """
    nd = _LTI_NDIM if isinstance(system, LTISystem) else _LTV_NDIM
    leaves = {f: (0 if getattr(system, f).ndim > n else None)
              for f, n in nd.items()}
    treedef = jax.tree_util.tree_structure(system)
    order = nd.keys()  # dataclass field order == flatten order
    return jax.tree_util.tree_unflatten(treedef, [leaves[f] for f in order])


def warm_start_axes(warm: WarmStart) -> WarmStart:
    """vmap axes for a warm start: leaves with rank > 1 are batched."""
    return WarmStart(*[0 if getattr(warm, f).ndim > 1 else None
                       for f in ("x", "y", "z")])


def batch_size(system: System) -> int:
    """Leading batch dimension of a batched system (error if unbatched)."""
    axes = batch_axes(system)
    for f in _LTI_NDIM if isinstance(system, LTISystem) else _LTV_NDIM:
        if getattr(axes, f) == 0:
            return getattr(system, f).shape[0]
    raise ValueError("system has no batched leaf.")


def stack_systems(systems: Sequence[System]) -> System:
    """Stack scenario pytrees into one batched system (all leaves batched)."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *systems)


def solve_mpc_batch(system: System,
                    costs: Sequence[CostFunction] = (),
                    constraints: Sequence[Constraint] = (),
                    options: SolverOptions = SolverOptions(),
                    warm_start: Optional[WarmStart] = None,
                    solver=None) -> MPCResult:
    """vmap of :func:`copra_tpu.solve_mpc` over the scenario batch axis.

    Costs/constraints are shared across the batch (their array leaves
    broadcast).  For uniform progress across batch lanes prefer
    ``options.replace(early_exit=False)`` — a single fused kernel schedule
    with no per-lane divergence (SURVEY.md §7.3 item 5).
    """
    costs = tuple(costs)
    constraints = tuple(constraints)
    axes = batch_axes(system)

    if warm_start is None:
        def run(sys_):
            return solve_mpc(sys_, costs, constraints, options, None, solver)
        return jax.vmap(run, in_axes=(axes,))(system)

    def run_warm(sys_, w):
        return solve_mpc(sys_, costs, constraints, options, w, solver)
    return jax.vmap(run_warm, in_axes=(axes, warm_start_axes(warm_start)))(
        system, warm_start)
