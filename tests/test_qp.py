"""QP solver conformance.

Plays the role of the reference's ``test/TestSolvers.cpp``: the Scilab qld
fixture must solve, and solutions are cross-validated against an independent
solver (scipy SLSQP here, where the reference cross-checks backends against
QuadProg, ``TestSolvers.cpp:38-103``) and against KKT optimality conditions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import optimize

import copra_tpu as ct

from fixtures import (QLD_AEQ, QLD_AINEQ, QLD_BEQ, QLD_BINEQ, QLD_C, QLD_Q,
                      QLD_XL, QLD_XU)


def scipy_reference(Q, c, Aeq, beq, Aineq, bineq, lb, ub):
    n = Q.shape[0]
    cons = []
    if Aeq is not None and len(Aeq):
        cons.append({"type": "eq",
                     "fun": lambda x: Aeq @ x - beq,
                     "jac": lambda x: Aeq})
    if Aineq is not None and len(Aineq):
        cons.append({"type": "ineq",
                     "fun": lambda x: bineq - Aineq @ x,
                     "jac": lambda x: -Aineq})
    res = optimize.minimize(
        lambda x: 0.5 * x @ Q @ x + c @ x, np.zeros(n),
        jac=lambda x: Q @ x + c,
        bounds=list(zip(np.where(np.isfinite(lb), lb, -1e12),
                        np.where(np.isfinite(ub), ub, 1e12))),
        constraints=cons, method="SLSQP",
        options={"maxiter": 500, "ftol": 1e-14})
    assert res.success, res.message
    return res.x


def kkt_residuals(qp, x, y):
    """Stationarity + primal feasibility of a stacked-form solution."""
    C, l, u, _ = ct.qp.stack_constraints(qp, ct.SolverOptions())
    C, l, u = np.asarray(C), np.asarray(l), np.asarray(u)
    x, y = np.asarray(x), np.asarray(y)
    stat = np.max(np.abs(np.asarray(qp.Q) @ x + np.asarray(qp.c) + C.T @ y))
    Cx = C @ x
    prim = np.max(np.maximum(Cx - u, 0) + np.maximum(l - Cx, 0))
    return stat, prim


def make_qld_qp(dtype=jnp.float64):
    return ct.DenseQP.create(
        jnp.asarray(QLD_Q, dtype), jnp.asarray(QLD_C, dtype),
        jnp.asarray(QLD_AEQ, dtype), jnp.asarray(QLD_BEQ, dtype),
        jnp.asarray(QLD_AINEQ, dtype), jnp.asarray(QLD_BINEQ, dtype),
        jnp.asarray(QLD_XL, dtype), jnp.asarray(QLD_XU, dtype))


def test_qld_problem_matches_scipy():
    qp = make_qld_qp()
    sol = ct.solve_qp(qp)
    assert int(sol.status) == ct.STATUS_SOLVED
    x_ref = scipy_reference(QLD_Q, QLD_C, QLD_AEQ, QLD_BEQ, QLD_AINEQ,
                            QLD_BINEQ, QLD_XL, QLD_XU)
    np.testing.assert_allclose(np.asarray(sol.x), x_ref, atol=1e-6)
    stat, prim = kkt_residuals(qp, sol.x, sol.y)
    assert stat < 1e-6 and prim < 1e-7


def test_qld_problem_jit():
    qp = make_qld_qp()
    sol = jax.jit(lambda q: ct.solve_qp(q))(qp)
    x_ref = scipy_reference(QLD_Q, QLD_C, QLD_AEQ, QLD_BEQ, QLD_AINEQ,
                            QLD_BINEQ, QLD_XL, QLD_XU)
    np.testing.assert_allclose(np.asarray(sol.x), x_ref, atol=1e-6)


def random_qp(rng, n, me, mi, strict_convex=True):
    R = rng.normal(size=(n, n))
    Q = R @ R.T + (1.0 if strict_convex else 1e-6) * np.eye(n)
    c = rng.normal(size=n)
    Aeq = rng.normal(size=(me, n)) if me else np.zeros((0, n))
    beq = rng.normal(size=me) if me else np.zeros(0)
    Aineq = rng.normal(size=(mi, n)) if mi else np.zeros((0, n))
    # keep feasible: bineq above value at a feasible-ish point
    bineq = Aineq @ rng.normal(size=n) * 0 + rng.uniform(0.5, 2.0, size=mi) \
        if mi else np.zeros(0)
    lb = np.full(n, -5.0)
    ub = np.full(n, 5.0)
    return Q, c, Aeq, beq, Aineq, bineq, lb, ub


@pytest.mark.parametrize("n,me,mi", [(4, 0, 0), (6, 2, 3), (12, 0, 8),
                                     (20, 4, 10)])
def test_random_qps_match_scipy(n, me, mi):
    rng = np.random.default_rng(n * 100 + me * 10 + mi)
    Q, c, Aeq, beq, Aineq, bineq, lb, ub = random_qp(rng, n, me, mi)
    qp = ct.DenseQP.create(Q, c, Aeq, beq, Aineq, bineq, lb, ub)
    sol = ct.solve_qp(qp, ct.SolverOptions(max_iter=20000))
    x_ref = scipy_reference(Q, c, Aeq, beq, Aineq, bineq, lb, ub)
    np.testing.assert_allclose(np.asarray(sol.x), x_ref, atol=2e-5)


def test_batched_solve():
    rng = np.random.default_rng(7)
    batch = 16
    n, mi = 8, 4
    Qs, cs, As, bs = [], [], [], []
    for _ in range(batch):
        Q, c, _, _, Aineq, bineq, lb, ub = random_qp(rng, n, 0, mi)
        Qs.append(Q); cs.append(c); As.append(Aineq); bs.append(bineq)
    qp = ct.DenseQP.create(
        jnp.asarray(np.stack(Qs)), jnp.asarray(np.stack(cs)),
        Aineq=jnp.asarray(np.stack(As)), bineq=jnp.asarray(np.stack(bs)),
        lb=jnp.broadcast_to(jnp.asarray(lb), (batch, n)),
        ub=jnp.broadcast_to(jnp.asarray(ub), (batch, n)))
    sols = ct.solve_qp_batched(qp)
    assert sols.x.shape == (batch, n)
    for i in range(batch):
        x_ref = scipy_reference(Qs[i], cs[i], None, None, As[i], bs[i],
                                lb, ub)
        np.testing.assert_allclose(np.asarray(sols.x[i]), x_ref, atol=2e-5)


def test_warm_start_reduces_iterations():
    rng = np.random.default_rng(3)
    Q, c, Aeq, beq, Aineq, bineq, lb, ub = random_qp(rng, 10, 2, 5)
    qp = ct.DenseQP.create(Q, c, Aeq, beq, Aineq, bineq, lb, ub)
    opts = ct.SolverOptions(polish=False)
    cold = ct.solve_qp(qp, opts)
    warm = ct.solve_qp(qp, opts,
                       ct.WarmStart(x=cold.x, y=cold.y, z=cold.z))
    assert int(warm.iterations) <= int(cold.iterations)
    # adaptive path checks every rho_update_interval iterations — a warm
    # start from the solution must converge within the first check
    assert int(warm.iterations) <= ct.SolverOptions().rho_update_interval


def test_fixed_iteration_mode():
    rng = np.random.default_rng(4)
    Q, c, *_rest = random_qp(rng, 6, 0, 0)
    qp = ct.DenseQP.create(Q, c, lb=_rest[-2], ub=_rest[-1])
    opts = ct.SolverOptions(early_exit=False, max_iter=300)
    sol = ct.solve_qp(qp, opts)
    assert int(sol.iterations) == 300


def test_unknown_solver_raises():
    with pytest.raises(ct.SolverError):
        ct.get_solver("nope")


def test_primal_infeasible_detection():
    """Contradictory equality + bounds -> primal-infeasible certificate
    (SURVEY.md §5 failure-detection parity: per-scenario status codes)."""
    n = 4
    qp = ct.DenseQP.create(
        np.eye(n), np.zeros(n),
        Aeq=np.array([[1.0, 0, 0, 0]]), beq=np.array([10.0]),
        lb=np.zeros(n), ub=np.ones(n))      # x0 <= 1 but x0 must equal 10
    sol = ct.solve_qp(qp, ct.SolverOptions(max_iter=4000))
    assert int(sol.status) in (ct.STATUS_MAX_ITER, 2)
    # must NOT report solved
    assert int(sol.status) != ct.STATUS_SOLVED


def test_dual_infeasible_unbounded_below():
    """Unbounded linear direction -> not 'solved'."""
    n = 3
    Q = np.zeros((n, n))
    Q[0, 0] = 1.0                            # flat in x1,x2
    qp = ct.DenseQP.create(Q + 1e-12 * np.eye(n),
                           np.array([0.0, -1.0, 0.0]))
    sol = ct.solve_qp(qp, ct.SolverOptions(max_iter=2000, polish=False))
    assert int(sol.status) != ct.STATUS_SOLVED


def test_nonfinite_inputs_never_report_solved():
    """NaN/inf problem data must yield a failed status, not silent garbage
    (SURVEY.md §5 failure-detection guard)."""
    n = 4
    Q = np.eye(n)
    Q[0, 0] = np.nan
    qp = ct.DenseQP.create(Q, np.zeros(n), lb=-np.ones(n), ub=np.ones(n))
    sol = ct.solve_qp(qp, ct.SolverOptions(max_iter=50))
    assert int(sol.status) != ct.STATUS_SOLVED

    qp2 = ct.DenseQP.create(np.eye(n), np.full(n, np.inf),
                            lb=-np.ones(n), ub=np.ones(n))
    sol2 = ct.solve_qp(qp2, ct.SolverOptions(max_iter=50))
    assert int(sol2.status) != ct.STATUS_SOLVED
