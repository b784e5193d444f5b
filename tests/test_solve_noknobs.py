"""The NO-KNOBS entry points (VERDICT r4 #7).

``ct.solve`` must take any well-posed problem cold — zero solver
options — and either meet the accuracy contract or return an honest
status (the qpOASES-default UX,
``/root/reference/src/solvers/qpOASESSolver.cpp:66-118``).
``ct.make_stagewise_server`` is the serving-side analog: measured
equilibration decision, measured rho, measured warm budget, top-up.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import copra_tpu as ct
from copra_tpu.qp.native import native_available, solve_qp_native

import fixtures as fx


def _small_system():
    system = ct.LTISystem.create(fx.A, fx.B, fx.D, fx.SMALL_X0,
                                 fx.SMALL_N)
    costs = (ct.TargetCost.create(fx.M, fx.XD, weights=fx.WX),
             ct.ControlCost.create(fx.N_MAT, fx.UD, weights=fx.WU))
    cons = (ct.TrajectoryBoundConstraint.create(fx.X_LOWER, fx.X_UPPER),
            ct.ControlBoundConstraint.create(fx.U_LOWER, fx.U_UPPER))
    return system, costs, cons


@pytest.mark.parametrize("engine", ["auto", "condensed", "stagewise"])
def test_solve_meets_golden_contract_no_options(engine):
    system, costs, cons = _small_system()
    res = ct.solve(system, costs, cons, engine=engine)
    assert int(np.asarray(res.solution.status)) == ct.STATUS_SOLVED
    u = np.asarray(res.control).ravel()
    assert np.abs(u - fx.GOLDEN_CONTROL).max() < 2e-4
    assert float(ct.replay_dynamics(system, res.trajectory,
                                    res.control)) <= 1e-8


def test_solve_native_engine_exact():
    if not native_available():                      # pragma: no cover
        pytest.skip("native oracle unavailable")
    system, costs, cons = _small_system()
    res = ct.solve(system, costs, cons, engine="native")
    u = np.asarray(res.control).ravel()
    assert np.abs(u - fx.GOLDEN_CONTROL).max() < 2e-4


def test_solve_reports_infeasible_honestly():
    """Crossed bounds: the no-knobs path must certify infeasibility,
    not return a silently-wrong answer (reference SI_fail parity)."""
    system, costs, _ = _small_system()
    cons = (ct.ControlBoundConstraint.create([2.0], [-2.0]),)  # lb > ub
    res = ct.solve(system, costs, cons)
    assert int(np.asarray(res.solution.status)) in (
        ct.STATUS_PRIMAL_INFEASIBLE, ct.STATUS_MAX_ITER,
        ct.STATUS_DUAL_INFEASIBLE)
    assert int(np.asarray(res.solution.status)) != ct.STATUS_SOLVED


def test_solve_picks_stagewise_for_long_horizons():
    """nvar beyond the condensed knee routes to the stagewise engine
    automatically and still meets the contract vs the exact oracle."""
    if not native_available():                      # pragma: no cover
        pytest.skip("native oracle unavailable")
    N = 400                                         # nvar = 400 > 300
    T = 0.02
    A = np.array([[1.0, T], [0.0, 1.0]])
    B = np.array([[T * T / 2], [T]])
    system = ct.LTISystem.create(A, B, np.zeros(2),
                                 np.array([1.0, 0.0]), N)
    costs = (ct.SimpleTrajectoryCost.create(
                 np.zeros(2), weights=np.array([5.0, 0.5])),
             ct.SimpleControlCost.create(np.zeros(1),
                                         weights=np.array([1e-3])))
    cons = (ct.ControlBoundConstraint.create([-1.0], [1.0]),)
    res = ct.solve(system, costs, cons)
    assert int(np.asarray(res.solution.status)) == ct.STATUS_SOLVED
    prev = ct.condense(system)
    qp = ct.build_qp(prev, system.x0, costs, cons)
    exact = solve_qp_native(jax.tree_util.tree_map(
        lambda a: np.asarray(a, np.float64), qp))
    scale = max(1.0, np.abs(np.asarray(exact.x)).max())
    err = np.abs(np.asarray(res.control).ravel()
                 - np.asarray(exact.x)).max() / scale
    assert err <= 1e-4, f"long-horizon auto solve vs oracle: {err:.2e}"


def test_solve_rejects_unknown_engine():
    system, costs, cons = _small_system()
    with pytest.raises(ValueError, match="unknown engine"):
        ct.solve(system, costs, cons, engine="quantum")


def test_stagewise_server_no_knobs_fleet():
    """make_stagewise_server: measured policies end-to-end on a small
    ZMP fleet — converged ticks, oracle-gated applied control."""
    from copra_tpu.autospan import span_matrix
    from copra_tpu.qp.riccati import from_mpc

    N, T, h = 40, 0.02, 0.8
    A = np.array([[1.0, T, T * T / 2], [0, 1.0, T], [0, 0, 1.0]],
                 np.float32)
    B = np.array([[T ** 3 / 6], [T * T / 2], [T]], np.float32)
    zrow = np.array([[1.0, 0.0, -h / 9.81]], np.float32)
    Z = np.asarray(span_matrix(zrow, N + 1))
    ref = np.array([0.1 * min(k // 14, 2) for k in range(N + 1)],
                   np.float32)
    system = ct.LTISystem.create(A, B, np.zeros(3, np.float32),
                                 np.zeros(3, np.float32), N)
    costs = (ct.TrajectoryCost(M=jnp.asarray(Z, jnp.float32),
                               p=jnp.asarray(ref),
                               weights=jnp.ones(N + 1, jnp.float32)),
             ct.SimpleControlCost(p=jnp.zeros(N, jnp.float32),
                                  weights=jnp.full(N, 1e-6,
                                                   jnp.float32)))
    cons = (ct.TrajectoryConstraint(E=jnp.asarray(Z, jnp.float32),
                                    f=jnp.asarray(ref + 0.05)),
            ct.TrajectoryConstraint(E=jnp.asarray(-Z, jnp.float32),
                                    f=jnp.asarray(-(ref - 0.05))))
    sqp = from_mpc(system, costs, cons)
    fleet = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (2,) + a.shape), sqp)

    tick, policy = ct.make_stagewise_server(fleet, return_policy=True)
    assert policy["warm_iters"] >= 1
    assert policy["rho"] > 0
    x0 = jnp.zeros((2, 3), jnp.float32)
    X, U, info, warm = tick(x0)
    assert (np.asarray(info.status) == ct.STATUS_SOLVED).all(), \
        info.inform()
    X, U, info, warm = tick(X[:, 1], warm)
    assert (np.asarray(info.status) == ct.STATUS_SOLVED).all(), \
        info.inform()

    if native_available():
        plan = ct.make_control_plan(system, costs, cons)
        x_used = np.asarray(X[:, 0], np.float64)  # the tick's state?
        # gate the APPLIED control of lane 0 at the state the tick
        # solved (the post-plant x0 passed in)
        qp = ct.plan_qp(plan, np.asarray(x_used[0]))
        exact = solve_qp_native(jax.tree_util.tree_map(
            lambda a: np.asarray(a, np.float64), qp))
        scale = max(1.0, np.abs(np.asarray(exact.x)).max())
        err = abs(float(np.asarray(U)[0, 0, 0])
                  - float(np.asarray(exact.x)[0])) / scale
        assert err <= 1e-4, f"server applied control vs oracle: {err:.2e}"


def test_solve_unconstrained_is_direct_lqr():
    """Cost-only problems route to the exact one-sweep LQ solve (no
    iterations) and match the oracle to solver precision."""
    system, costs, _ = _small_system()
    res = ct.solve(system, costs, ())
    assert int(np.asarray(res.solution.status)) == ct.STATUS_SOLVED
    assert int(np.asarray(res.solution.iterations)) == 1
    if native_available():
        prev = ct.condense(system)
        qp = ct.build_qp(prev, system.x0, costs, ())
        exact = solve_qp_native(jax.tree_util.tree_map(
            lambda a: np.asarray(a, np.float64), qp))
        scale = max(1.0, np.abs(np.asarray(exact.x)).max())
        err = np.abs(np.asarray(res.control).ravel()
                     - np.asarray(exact.x)).max() / scale
        assert err <= 1e-6, f"direct LQR vs oracle: {err:.2e}"
