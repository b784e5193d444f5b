"""Receding-horizon (closed-loop) MPC: warm-started, fully on-device.

The reference has no closed-loop driver — users call ``LMPC::solve()`` in
their own loop, re-seeding ``x0`` each tick (``/root/reference/src/LMPC.cpp:
112-128``; the qpOASES default even cold-starts every call,
``src/solvers/qpOASESSolver.cpp:114-118``).  Here the whole loop is a pure
``lax.scan``: solve → apply u₀ → propagate the plant → shift the warm start,
with no host round-trips (SURVEY.md §7.3 item 4).  Batched scenarios vmap
over the same scan.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from jax import lax

from .constraints import Constraint
from .costs import CostFunction
from .mpc import build_qp
from .qp.registry import get_solver
from .qp.types import QPSolution, SolverOptions, WarmStart
from .systems import LTISystem, Preview, System, condense

Array = jax.Array


def shift_warm_start(warm: WarmStart, udim: int) -> WarmStart:
    """Shift the primal one control step forward (receding-horizon seed).

    ``U = [u_0..u_{N-1}]`` becomes ``[u_1..u_{N-1}, u_{N-1}]``; the duals are
    kept as-is — the constraint geometry moves slowly between ticks, so the
    previous multipliers remain an excellent ADMM seed.
    """
    x = warm.x
    shifted = jnp.concatenate([x[..., udim:], x[..., -udim:]], axis=-1)
    return dataclasses.replace(warm, x=shifted)


def cold_start(preview: Preview, nr_eq: int, nr_ineq: int,
               dtype=jnp.float32) -> WarmStart:
    """All-zeros warm-start pytree with the right static shapes."""
    n = preview.full_udim
    m = nr_eq + nr_ineq + n
    return WarmStart(x=jnp.zeros((n,), dtype), y=jnp.zeros((m,), dtype),
                     z=jnp.zeros((m,), dtype))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ClosedLoopResult:
    """Trace of one closed-loop rollout."""

    states: Array        # [T+1, x] realized plant states
    controls: Array      # [T, u] applied first controls
    solutions: QPSolution  # stacked per-tick QP solutions


def _first_step_plant(system: System) -> Callable[[Array, Array], Array]:
    """Default plant = the model's own step-0 dynamics."""
    if isinstance(system, LTISystem):
        A, B, d = system.A, system.B, system.d
    else:
        A, B, d = system.A[0], system.B[0], system.d[0]

    def plant(x, u):
        return A @ x + B @ u + d

    return plant


def make_receding_step(system: System,
                       costs: Sequence[CostFunction],
                       constraints: Sequence[Constraint],
                       options: SolverOptions = SolverOptions(),
                       solver=None):
    """Build ``step(x0, warm) -> (u0, full_U, solution, next_warm)``.

    The preview matrices are condensed once (the dynamics model is fixed
    across ticks — the standard receding-horizon setup); only the
    x0-dependent QP vectors are rebuilt each tick, mirroring what the
    reference recomputes through ``updateSystem`` (``src/LMPC.cpp:247-269``)
    but without re-condensing.
    """
    solve = solver or get_solver(None)
    costs = tuple(costs)
    constraints = tuple(constraints)
    preview = condense(system)
    udim = preview.udim

    def step(x0: Array, warm: Optional[WarmStart]):
        qp = build_qp(preview, x0, costs, constraints)
        sol = solve(qp, options, warm)
        nxt = shift_warm_start(WarmStart(x=sol.x, y=sol.y, z=sol.z), udim)
        return sol.x[:udim], sol.x, sol, nxt

    return step, preview


def closed_loop(system: System,
                costs: Sequence[CostFunction],
                constraints: Sequence[Constraint],
                n_ticks: int,
                options: SolverOptions = SolverOptions(),
                plant: Optional[Callable[[Array, Array], Array]] = None,
                solver=None,
                use_plan: bool = False) -> ClosedLoopResult:
    """Run ``n_ticks`` of warm-started receding-horizon control as one
    ``lax.scan`` — jittable and vmappable over scenario batches.

    ``plant`` maps ``(x, u) -> next x`` and defaults to the model's own
    step-0 dynamics (perfect-model rollout).

    ``use_plan=True`` drives the loop through the precompiled
    :mod:`copra_tpu.plan` fast path (factorize once, x0-affine tick
    updates with an exact host-f64 unconstrained seed) instead of the
    per-tick QP rebuild — the production configuration; requires the
    default solver.
    """
    plant_fn = plant or _first_step_plant(system)

    if use_plan and solver is None:
        from .plan import make_control_plan, make_plan_step

        plan = make_control_plan(system, costs, constraints)
        plan_step = make_plan_step(plan, options)
        udim = system.udim

        def tick_plan(carry, _):
            x, warm = carry
            U, sol, nxt = plan_step(x, warm)
            u0 = U[:udim]
            x_next = plant_fn(x, u0)
            return (x_next, nxt), (x_next, u0, sol)

        # probe once to size the warm pytree
        _, sol0, warm0 = plan_step(system.x0, None)
        warm0 = jax.tree_util.tree_map(jnp.zeros_like, warm0)
        (_, _), (xs, us, sols) = lax.scan(
            tick_plan, (system.x0, warm0), None, length=n_ticks)
        states = jnp.concatenate([system.x0[None], xs], axis=0)
        return ClosedLoopResult(states=states, controls=us, solutions=sols)

    step_fn, preview = make_receding_step(system, costs, constraints,
                                          options, solver)

    # probe solve to size the warm-start pytree (shapes are static)
    qp0 = build_qp(preview, system.x0, tuple(costs), tuple(constraints))
    warm0 = cold_start(preview, qp0.nr_eq, qp0.nr_ineq, qp0.Q.dtype)

    def tick(carry, _):
        x, warm = carry
        u0, _, sol, nxt = step_fn(x, warm)
        x_next = plant_fn(x, u0)
        return (x_next, nxt), (x_next, u0, sol)

    (_, _), (xs, us, sols) = lax.scan(
        tick, (system.x0, warm0), None, length=n_ticks)
    states = jnp.concatenate([system.x0[None], xs], axis=0)
    return ClosedLoopResult(states=states, controls=us, solutions=sols)
