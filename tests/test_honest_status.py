"""Honest status reporting across every solve path (VERDICT r1 items).

The production serving paths run fixed iteration counts; they must still
report non-convergence, true dual residuals, and infeasibility certificates
— never a hardcoded success (the failure class docs/PERFORMANCE.md lesson
#1 warns about).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import copra_tpu as ct
from copra_tpu.plan import make_control_plan, make_plan_step
from copra_tpu.qp.riccati import solve_mpc_stagewise

from fixtures import (A, B, D, M, N_MAT, SMALL_N, SMALL_X0, UD, U_LOWER,
                      U_UPPER, WU, WX, XD)


def box_setup(dtype=np.float64):
    system = ct.LTISystem.create(A.astype(dtype), B.astype(dtype),
                                 D.astype(dtype), SMALL_X0.astype(dtype),
                                 SMALL_N)
    costs = (ct.TargetCost.create(M.astype(dtype), XD.astype(dtype),
                                  weights=WX.astype(dtype)),
             ct.ControlCost.create(N_MAT.astype(dtype), UD.astype(dtype),
                                   weights=WU.astype(dtype)))
    constraints = (ct.ControlBoundConstraint.create(
        U_LOWER.astype(dtype), U_UPPER.astype(dtype)),)
    return system, costs, constraints


def test_fixed_iteration_mode_detects_primal_infeasibility():
    """Serving paths run early_exit=False; an infeasible QP must produce
    the certificate there too (VERDICT r1 weak #3)."""
    n = 4
    qp = ct.DenseQP.create(
        np.eye(n), np.zeros(n),
        Aeq=np.array([[1.0, 0, 0, 0]]), beq=np.array([10.0]),
        lb=np.zeros(n), ub=np.ones(n))
    sol = ct.solve_qp(qp, ct.SolverOptions(max_iter=2000, early_exit=False,
                                           polish=False))
    assert int(sol.status) == ct.STATUS_PRIMAL_INFEASIBLE


def test_fixed_iteration_mode_feasible_stays_solved():
    rng = np.random.default_rng(7)
    Q0 = rng.normal(size=(6, 6))
    Q = Q0 @ Q0.T + np.eye(6)
    qp = ct.DenseQP.create(Q, rng.normal(size=6),
                           lb=-np.ones(6), ub=np.ones(6))
    sol = ct.solve_qp(qp, ct.SolverOptions(max_iter=500, early_exit=False))
    assert int(sol.status) == ct.STATUS_SOLVED


def test_plan_step_single_reports_unconverged():
    """One ADMM iteration cannot converge a bound-active tick — the box
    fast path must say so (status != 0, real dual residual)."""
    system, costs, constraints = box_setup()
    plan = make_control_plan(system, costs, constraints)
    step = make_plan_step(plan, ct.SolverOptions(max_iter=1,
                                                 eps_abs=1e-9,
                                                 eps_rel=0.0))
    # x0 far below target -> controls saturate at the upper bound
    _, sol, _ = step(jnp.asarray([0.0, -8.0]), None)
    assert int(sol.status) != ct.STATUS_SOLVED
    assert float(sol.dual_residual) > 0.0

    # and a generous budget converges
    step_ok = make_plan_step(plan, ct.SolverOptions(max_iter=4000))
    _, sol_ok, _ = step_ok(jnp.asarray(SMALL_X0), None)
    assert int(sol_ok.status) == ct.STATUS_SOLVED


def test_plan_step_fused_reports_unconverged():
    """The Pallas fused serving tick (r1 hardcoded status=0, ADVICE medium):
    unconverged lanes must report STATUS_MAX_ITER and a true dual
    residual."""
    system, costs, constraints = box_setup(np.float32)
    batch = 4
    rng = np.random.default_rng(3)
    x0s = np.stack([np.array([0.0, -8.0]),   # saturating lane
                    SMALL_X0,
                    SMALL_X0 + rng.normal(scale=0.05, size=2),
                    np.array([0.2, -6.0])]).astype(np.float32)
    plan = jax.jit(jax.vmap(lambda x0: make_control_plan(
        system.with_x0(x0), costs, constraints)))(jnp.asarray(x0s))
    step = make_plan_step(plan, ct.SolverOptions(max_iter=1, eps_abs=1e-9,
                                                 eps_rel=0.0),
                          batched=True, use_fused=True)
    _, sol, _ = step(plan, jnp.asarray(x0s), None)
    status = np.asarray(sol.status)
    assert (status != ct.STATUS_SOLVED).any()
    assert np.asarray(sol.dual_residual).max() > 0.0
    # dual residual is per-lane and real, not a broadcast zero
    assert np.asarray(sol.dual_residual).shape == (batch,)

    # with a budget and a tolerance matching the f32 noise floor at this
    # problem scale (controls saturate at 200, |e| ~ 1e3 in the correction
    # space -> primal floor ~1e-3), every lane converges honestly
    step_ok = make_plan_step(plan, ct.SolverOptions(max_iter=800,
                                                    eps_abs=5e-3),
                             batched=True, use_fused=True)
    _, sol_ok, _ = step_ok(plan, jnp.asarray(x0s), None)
    assert (np.asarray(sol_ok.status) == ct.STATUS_SOLVED).all()


def test_stagewise_dual_residual_is_real():
    """solve_stagewise must report the true stationarity residual
    (VERDICT r1 weak #6) and fail honestly on a tiny budget."""
    system, costs, constraints = box_setup()
    X, U, info = solve_mpc_stagewise(system, costs, constraints,
                                     ct.SolverOptions(max_iter=600))
    assert float(info.dual_residual) >= 0.0
    # converged solve: dual residual small relative to the cost scale (1e4)
    assert float(info.dual_residual) <= 1e-3 * 1e4
    assert int(info.status) == ct.STATUS_SOLVED

    # starved budget from a zero seed: must not claim success
    Xb, Ub, bad = solve_mpc_stagewise(
        system, costs, constraints,
        ct.SolverOptions(max_iter=1, seed="zero", eps_abs=1e-9))
    assert int(bad.status) != ct.STATUS_SOLVED


def test_inform_single_and_batched():
    rng = np.random.default_rng(11)
    Q0 = rng.normal(size=(5, 5))
    qp = ct.DenseQP.create(Q0 @ Q0.T + np.eye(5), rng.normal(size=5),
                           lb=-np.ones(5), ub=np.ones(5))
    sol = ct.solve_qp(qp, ct.SolverOptions())
    msg = sol.inform()
    assert "solved" in msg
    assert "residual" in msg

    qpb = jax.tree_util.tree_map(
        lambda leaf: jnp.stack([leaf, leaf]), qp)
    solb = ct.solve_qp_batched(qpb, ct.SolverOptions())
    msgb = solb.inform()
    assert "2/2 solved" in msgb
    assert "worst primal residual" in msgb


def test_checkpoint_mismatched_template_raises(tmp_path):
    from copra_tpu.checkpoint import load_pytree, save_pytree

    warm = ct.WarmStart(x=jnp.ones((3,)), y=jnp.zeros((5,)),
                        z=jnp.zeros((5,)))
    path = str(tmp_path / "w.npz")
    save_pytree(path, warm)

    # wrong leaf shapes -> raise, not silent flatten-order reassignment
    bad = ct.WarmStart(x=jnp.ones((4,)), y=jnp.zeros((5,)),
                       z=jnp.zeros((5,)))
    with pytest.raises(ValueError, match="shape mismatch"):
        load_pytree(path, bad)

    # wrong structure -> raise
    with pytest.raises(ValueError, match="structure mismatch"):
        load_pytree(path, {"x": jnp.ones((3,)), "y": jnp.zeros((5,)),
                           "z": jnp.zeros((5,))})

    # matching template round-trips
    got, _ = load_pytree(path, warm)
    np.testing.assert_array_equal(np.asarray(got.x), np.asarray(warm.x))


def test_double_init_guard_applies_to_subclasses():
    """The move-semantics guard must use isinstance, not the class name
    (VERDICT r1 weak #8)."""

    class MyControlBound(ct.ControlBoundConstraint):
        pass

    system, costs, _ = box_setup()
    ctl = ct.LMPC(system)
    sub = MyControlBound.create(U_LOWER, U_UPPER)
    ctl.add_constraint(sub)
    with pytest.raises(ct.InitializationError):
        ctl.add_constraint(sub)
