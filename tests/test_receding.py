"""Receding-horizon closed-loop tests: warm starts, shifting, convergence.

The reference leaves the receding loop to the user and cold-starts its
default solver every call (``src/solvers/qpOASESSolver.cpp:114-118``); the
warm-started on-device loop is a first-class capability here (BASELINE.md
config 4), so it gets its own behavioral contract: the closed-loop plant
must regulate to the target and warm-started solves must not lose accuracy.
"""

import jax
import jax.numpy as jnp
import numpy as np

import copra_tpu as ct
from copra_tpu.receding import (closed_loop, cold_start, make_receding_step,
                                shift_warm_start)

from fixtures import (A, B, D, M, N_MAT, SMALL_N, SMALL_X0, UD, U_LOWER,
                      U_UPPER, WU, WX, XD, X_LOWER, X_UPPER)


def setup():
    system = ct.LTISystem.create(A, B, D, SMALL_X0, SMALL_N)
    costs = (ct.TargetCost.create(M, XD, weights=WX),
             ct.ControlCost.create(N_MAT, UD, weights=WU),)
    constraints = (ct.TrajectoryBoundConstraint.create(X_LOWER, X_UPPER),
                   ct.ControlBoundConstraint.create(U_LOWER, U_UPPER),)
    return system, costs, constraints


def test_shift_warm_start():
    w = ct.WarmStart(x=jnp.arange(6.0), y=jnp.zeros(3), z=jnp.zeros(3))
    s = shift_warm_start(w, udim=2)
    np.testing.assert_allclose(np.asarray(s.x), [2, 3, 4, 5, 4, 5])
    np.testing.assert_allclose(np.asarray(s.y), 0.0)


def test_receding_step_warm_matches_cold():
    system, costs, constraints = setup()
    step, preview = make_receding_step(system, costs, constraints,
                                       ct.SolverOptions(max_iter=3000))
    u0_cold, U_cold, sol, warm = step(system.x0, None)
    # warm-started re-solve of the same tick returns the same solution
    u0_warm, U_warm, sol_w, _ = step(system.x0, warm)
    np.testing.assert_allclose(np.asarray(U_cold), np.asarray(U_warm),
                               atol=1e-6)
    assert int(sol_w.iterations) <= int(sol.iterations)


def test_closed_loop_regulates_velocity():
    system, costs, constraints = setup()
    n_ticks = 60
    res = jax.jit(lambda s: closed_loop(s, costs, constraints, n_ticks,
                                        ct.SolverOptions(max_iter=1500)))(
        system)
    assert res.states.shape == (n_ticks + 1, 2)
    assert res.controls.shape == (n_ticks, 1)
    vel = np.asarray(res.states)[:, 1]
    # regulates toward the target velocity -1 and respects v <= 0
    assert vel.max() <= 1e-6
    assert abs(vel[-1] - XD[1]) < abs(vel[0] - XD[1])
    assert np.asarray(res.controls).max() <= U_UPPER[0] + 1e-6
    # every tick's QP converged
    assert int(np.asarray(res.solutions.status).max()) == ct.STATUS_SOLVED


def test_closed_loop_batched_vmap():
    system, costs, constraints = setup()
    batch = 8
    rng = np.random.default_rng(3)
    x0s = SMALL_X0[None] + rng.normal(scale=[0.02, 0.2], size=(batch, 2))
    x0s[:, 1] = np.minimum(x0s[:, 1], -0.2)

    def run(x0):
        return closed_loop(system.with_x0(x0), costs, constraints, 20,
                           ct.SolverOptions(max_iter=1000))

    res = jax.jit(jax.vmap(run))(jnp.asarray(x0s))
    assert res.states.shape == (batch, 21, 2)
    assert np.asarray(res.states)[:, :, 1].max() <= 1e-6


def test_cold_start_shapes():
    system, costs, constraints = setup()
    preview = ct.condense(system)
    qp = ct.build_qp(preview, system.x0, costs, constraints)
    w = cold_start(preview, qp.nr_eq, qp.nr_ineq)
    assert w.x.shape == (preview.full_udim,)
    assert w.y.shape == (qp.nr_eq + qp.nr_ineq + preview.full_udim,)


def test_closed_loop_via_plan_matches_rebuild():
    """closed_loop(use_plan=True) == the per-tick rebuild loop."""
    system, costs, constraints = setup()
    opts = ct.SolverOptions(max_iter=1500)
    r1 = jax.jit(lambda s: closed_loop(s, costs, constraints, 20, opts))(
        system)
    # the plan path builds its host-f64 seed maps eagerly — call it
    # outside jit (the per-tick step jits internally)
    r2 = closed_loop(system, costs, constraints, 20, opts, use_plan=True)
    np.testing.assert_allclose(np.asarray(r1.states), np.asarray(r2.states),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(r1.controls),
                               np.asarray(r2.controls), atol=2e-3)
