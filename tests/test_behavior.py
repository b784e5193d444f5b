"""End-to-end behavioral MPC tests: the reference's §4.2 contract.

Mirrors ``/root/reference/test/TestTimeInvariantSystems.cpp``: the point-mass
-under-gravity fixture in four constraint flavors (Bounded / Ineq / Mixed /
Eq) crossed with TargetCost / TrajectoryCost / MixedCost, with the same
semantic oracles: terminal velocity within 1e-3 of target, constraint
satisfaction within 1e-6, dynamics replay within 1e-10.

The reference runs these at N=300; we run the full cross at N=100 for suite
speed and keep one N=300 flavor as the long-horizon canary (bench covers
N=300 perf).  The physics conclusions are horizon-independent here: the mass
reaches the target velocity well before either horizon ends.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import copra_tpu as ct

from fixtures import (A, B, D, EQ_E, EQ_P, EQ_X0, INEQ_E, INEQ_G, INEQ_H,
                      INEQ_P, M, MIXED_E, MIXED_G, MIXED_P, N_MAT, UD,
                      U_LOWER, U_UPPER, WU, WX, XD, X_LOWER, X_UPPER)

N_STEP = 100
X0 = np.array([0.0, -5.0])
# the reference contract is ABSOLUTE constraint satisfaction (1e-6), so
# run with eps_rel=0 — the relative OSQP criterion would exit while the
# worst row still violates by ~eps_rel*|bound|; the physics assertions
# below are the real oracle.
OPTS = ct.SolverOptions(max_iter=4000, eps_abs=1e-7, eps_rel=0.0)


def _split(X):
    X = np.asarray(X)
    return X[0::2], X[1::2]


def x_cost_of(kind):
    if kind == "target":
        return ct.TargetCost.create(M, XD, weights=WX)
    if kind == "trajectory":
        return ct.TrajectoryCost.create(M, XD, weights=WX)
    # MixedCost pair used by the reference (TestTimeInvariantSystems.cpp:159-166)
    return ct.MixedCost.create(M, np.zeros((2, 1)), XD, weights=WX)


def u_cost_of(kind):
    if kind == "mixed":
        return ct.MixedCost.create(np.zeros((1, 2)), N_MAT, UD, weights=WU)
    return ct.ControlCost.create(N_MAT, UD, weights=WU)


def solve(system, costs, constraints):
    res = ct.solve_mpc(system, costs, constraints, OPTS)
    assert int(jnp.max(res.solution.status)) == ct.STATUS_SOLVED
    assert float(ct.replay_dynamics(system, res.trajectory,
                                    res.control)) <= 1e-10
    return res


def check_physics(res, cost_kind):
    pos, vel = _split(res.trajectory)
    # MixedCost does not evaluate x_N -> check X_{N-1}
    # (TestTimeInvariantSystems.cpp:195)
    v_term = vel[-2] if cost_kind == "mixed" else vel[-1]
    assert abs(XD[1] - v_term) <= 1e-3
    assert pos.max() <= X0[0] + 1e-6
    return pos, vel, np.asarray(res.control)


@pytest.mark.parametrize("cost_kind", ["target", "trajectory", "mixed"])
def test_bounded_system(cost_kind):
    """Box bounds on v and u (reference BoundedSystem tests, :28-205)."""
    system = ct.LTISystem.create(A, B, D, X0, N_STEP)
    costs = [x_cost_of(cost_kind), u_cost_of(cost_kind)]
    constraints = [ct.TrajectoryBoundConstraint.create(X_LOWER, X_UPPER),
                   ct.ControlBoundConstraint.create(U_LOWER, U_UPPER)]
    res = solve(system, costs, constraints)
    _, vel, control = check_physics(res, cost_kind)
    assert vel.max() <= X_UPPER[1] + 1e-6
    assert control.max() <= U_UPPER[0] + 1e-6


@pytest.mark.parametrize("cost_kind", ["target", "trajectory", "mixed"])
def test_ineq_system(cost_kind):
    """G u <= h and E x <= p inequality rows (reference IneqSystem,
    :315-489)."""
    system = ct.LTISystem.create(A, B, D, X0, N_STEP)
    costs = [x_cost_of(cost_kind), u_cost_of(cost_kind)]
    constraints = [ct.TrajectoryConstraint.create(INEQ_E, INEQ_P),
                   ct.ControlConstraint.create(INEQ_G, INEQ_H)]
    res = solve(system, costs, constraints)
    _, vel, control = check_physics(res, cost_kind)
    assert vel.max() <= INEQ_P[0] + 1e-6
    assert control.max() <= INEQ_H[0] + 1e-6


@pytest.mark.parametrize("cost_kind", ["target", "trajectory", "mixed"])
def test_mixed_system(cost_kind):
    """E x + G u <= p mixed rows (reference MixedSystem, :492-646)."""
    system = ct.LTISystem.create(A, B, D, X0, N_STEP)
    costs = [x_cost_of(cost_kind), u_cost_of(cost_kind)]
    constraints = [ct.MixedConstraint.create(MIXED_E, MIXED_G, MIXED_P)]
    res = solve(system, costs, constraints)
    _, vel, control = check_physics(res, cost_kind)
    # the mixed constraint itself: v_k + u_k <= 200 for k = 0..N-1
    assert (vel[:-1] + control).max() <= MIXED_P[0] + 1e-6


@pytest.mark.parametrize("cost_kind", ["target", "trajectory", "mixed"])
def test_eq_system(cost_kind):
    """Trajectory equality pins the position (reference EqSystem,
    :649-839): the controller must hold the mass immobile against gravity."""
    system = ct.LTISystem.create(A, B, D, EQ_X0, N_STEP)
    xd = np.array([0.0, 0.0])
    if cost_kind == "target":
        x_cost = ct.TargetCost.create(M, xd, weights=WX)
    elif cost_kind == "trajectory":
        x_cost = ct.TrajectoryCost.create(M, xd, weights=WX)
    else:
        x_cost = ct.MixedCost.create(M, np.zeros((2, 1)), xd, weights=WX)
    costs = [x_cost, u_cost_of(cost_kind)]
    constraints = [ct.TrajectoryConstraint.create(EQ_E, EQ_P,
                                                  is_inequality=False)]
    res = solve(system, costs, constraints)
    pos, vel = _split(res.trajectory)
    assert abs(vel[-2 if cost_kind == "mixed" else -1]) <= 1e-3
    assert pos.max() <= EQ_X0[0] + 1e-6
    assert np.abs(pos).max() <= 1e-6          # equality held everywhere


def test_bounded_system_n300_canary():
    """One full-length N=300 solve — the reference's actual horizon and the
    largest in-tree problem (time_invariant_systems.h:60)."""
    system = ct.LTISystem.create(A, B, D, X0, 300)
    costs = [x_cost_of("target"), u_cost_of("target")]
    constraints = [ct.TrajectoryBoundConstraint.create(X_LOWER, X_UPPER),
                   ct.ControlBoundConstraint.create(U_LOWER, U_UPPER)]
    res = ct.solve_mpc(system, costs, constraints,
                       ct.SolverOptions(max_iter=8000, eps_abs=1e-7,
                                        eps_rel=0.0))
    assert int(jnp.max(res.solution.status)) == ct.STATUS_SOLVED
    assert float(ct.replay_dynamics(system, res.trajectory,
                                    res.control)) <= 1e-10
    _, vel, control = check_physics(res, "target")
    assert vel.max() <= X_UPPER[1] + 1e-6
    assert control.max() <= U_UPPER[0] + 1e-6


def test_simple_trajectory_cost_equivalence():
    """SimpleTrajectoryCost == TrajectoryCost with M = I, per-step and
    full-horizon (reference TestTimeInvariantSystems.cpp:207-258)."""
    system = ct.LTISystem.create(A, B, D, X0, 30)
    u_cost = ct.ControlCost.create(N_MAT, UD, weights=WU)
    bounds = [ct.ControlBoundConstraint.create(U_LOWER, U_UPPER)]
    o = ct.SolverOptions(max_iter=3000)

    r_full = ct.solve_mpc(system, [ct.TrajectoryCost.create(
        M, XD, weights=WX), u_cost], bounds, o)
    r_simple = ct.solve_mpc(system, [ct.SimpleTrajectoryCost.create(
        XD, weights=WX), u_cost], bounds, o)
    np.testing.assert_allclose(np.asarray(r_simple.control),
                               np.asarray(r_full.control), atol=1e-8)
    np.testing.assert_allclose(np.asarray(r_simple.trajectory),
                               np.asarray(r_full.trajectory), atol=1e-8)
    # full-horizon entry mode
    n_x = 31
    M_full = np.asarray(ct.span_matrix(M, 2 * n_x))
    p_full = np.asarray(ct.span_vector(XD, 2 * n_x))
    w_full = np.asarray(ct.span_vector(WX, 2 * n_x))
    r_full2 = ct.solve_mpc(system, [ct.TrajectoryCost.create(
        M_full, p_full, weights=w_full), u_cost], bounds, o)
    r_simple2 = ct.solve_mpc(system, [ct.SimpleTrajectoryCost.create(
        p_full, weights=w_full), u_cost], bounds, o)
    np.testing.assert_allclose(np.asarray(r_simple2.control),
                               np.asarray(r_full2.control), atol=1e-8)


def test_simple_control_cost_equivalence():
    """SimpleControlCost == ControlCost with N = I
    (reference TestTimeInvariantSystems.cpp:259-309)."""
    system = ct.LTISystem.create(A, B, D, X0, 30)
    x_cost = ct.TargetCost.create(M, XD, weights=WX)
    bounds = [ct.ControlBoundConstraint.create(U_LOWER, U_UPPER)]
    o = ct.SolverOptions(max_iter=3000)

    r_full = ct.solve_mpc(system, [x_cost, ct.ControlCost.create(
        N_MAT, UD, weights=WU)], bounds, o)
    r_simple = ct.solve_mpc(system, [x_cost, ct.SimpleControlCost.create(
        UD, weights=WU)], bounds, o)
    np.testing.assert_allclose(np.asarray(r_simple.control),
                               np.asarray(r_full.control), atol=1e-8)
    # full-horizon entry mode
    N_full = np.asarray(ct.span_matrix(N_MAT, 30))
    ud_full = np.asarray(ct.span_vector(UD, 30))
    wu_full = np.asarray(ct.span_vector(WU, 30))
    r_full2 = ct.solve_mpc(system, [x_cost, ct.ControlCost.create(
        N_full, ud_full, weights=wu_full)], bounds, o)
    r_simple2 = ct.solve_mpc(system, [x_cost, ct.SimpleControlCost.create(
        ud_full, weights=wu_full)], bounds, o)
    np.testing.assert_allclose(np.asarray(r_simple2.control),
                               np.asarray(r_full2.control), atol=1e-8)
