"""Stagewise Riccati-in-ADMM solver vs the condensed oracle and goldens.

The long-horizon (sequence-parallel-friendly) path of SURVEY.md §5: O(N)
work per iteration, every iterate dynamics-exact.  The condensed solver is
the cross-validation oracle; the golden vectors are the numerical contract.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import copra_tpu as ct
from copra_tpu.qp.riccati import (from_mpc, lqr_solve, solve_mpc_stagewise,
                                  solve_stagewise)

from fixtures import (A, B, D, GOLDEN_CONTROL, M, N_MAT, SMALL_N, SMALL_X0,
                      UD, U_LOWER, U_UPPER, WU, WX, XD, X_LOWER, X_UPPER,
                      ltv_matrices)


def costs_constraints():
    return ((ct.TargetCost.create(M, XD, weights=WX),
             ct.ControlCost.create(N_MAT, UD, weights=WU)),
            (ct.TrajectoryBoundConstraint.create(X_LOWER, X_UPPER),
             ct.ControlBoundConstraint.create(U_LOWER, U_UPPER)))


def test_lqr_sweep_matches_condensed_unconstrained():
    system = ct.LTISystem.create(A, B, D, SMALL_X0, SMALL_N)
    costs, _ = costs_constraints()
    sqp = from_mpc(system, costs, ())
    X, U = lqr_solve(sqp.A, sqp.B, sqp.d, sqp.Qx, sqp.qx, sqp.Ru, sqp.ru,
                     sqp.x0)
    ref = ct.solve_mpc(system, costs, ())
    np.testing.assert_allclose(np.asarray(U).ravel(),
                               np.asarray(ref.control), atol=1e-9)
    np.testing.assert_allclose(np.asarray(X).ravel(),
                               np.asarray(ref.trajectory), atol=1e-9)


def test_stagewise_golden():
    system = ct.LTISystem.create(A, B, D, SMALL_X0, SMALL_N)
    costs, cons = costs_constraints()
    Xs, Us, info = solve_mpc_stagewise(
        system, costs, cons,
        ct.SolverOptions(max_iter=1500, early_exit=False))
    assert int(info.status) == ct.STATUS_SOLVED
    np.testing.assert_allclose(np.asarray(Us).ravel(), GOLDEN_CONTROL,
                               atol=2e-4)
    # dynamics hold exactly for the Riccati iterate (not just at optimum)
    assert float(ct.replay_dynamics(system, Xs.reshape(-1),
                                    Us.reshape(-1))) <= 1e-12


def test_stagewise_ltv():
    As, Bs, Ds = ltv_matrices()
    system = ct.LTVSystem.create(As, Bs, Ds, SMALL_X0)
    costs, cons = costs_constraints()
    from fixtures import GOLDEN_LTV_CONTROL
    Xs, Us, info = solve_mpc_stagewise(
        system, costs, cons,
        ct.SolverOptions(max_iter=1500, early_exit=False))
    np.testing.assert_allclose(np.asarray(Us).ravel(), GOLDEN_LTV_CONTROL,
                               atol=2e-4)


def test_stagewise_long_horizon_vs_condensed():
    """N=300 (the reference's largest in-tree horizon): stagewise and
    condensed must agree on the bounded problem."""
    N = 300
    x0 = np.array([0.0, -5.0])
    system = ct.LTISystem.create(A, B, D, x0, N)
    costs, cons = costs_constraints()
    ref = ct.solve_mpc(system, costs, cons,
                       ct.SolverOptions(max_iter=8000, eps_abs=1e-7,
                                        eps_rel=0.0))
    _, Us, _ = solve_mpc_stagewise(
        system, costs, cons,
        ct.SolverOptions(max_iter=20000, early_exit=False))
    np.testing.assert_allclose(np.asarray(Us).ravel(),
                               np.asarray(ref.control), atol=5e-5)


def test_stagewise_vmap_batch():
    batch = 4
    rng = np.random.default_rng(0)
    x0s = SMALL_X0[None] + rng.normal(scale=[0.02, 0.1], size=(batch, 2))
    x0s[:, 1] = np.minimum(x0s[:, 1], -0.2)
    system = ct.LTISystem.create(A, B, D, SMALL_X0, SMALL_N)
    costs, cons = costs_constraints()
    sqp = from_mpc(system, costs, cons)

    def solve_one(x0):
        import dataclasses
        return solve_stagewise(dataclasses.replace(sqp, x0=x0),
                               ct.SolverOptions(max_iter=3000,
                                                early_exit=False))

    Xs, Us, info = jax.jit(jax.vmap(solve_one))(jnp.asarray(x0s))
    assert Us.shape == (batch, SMALL_N, 1)
    for b in range(batch):
        assert float(ct.replay_dynamics(
            system.with_x0(jnp.asarray(x0s[b])), Xs[b].reshape(-1),
            Us[b].reshape(-1))) <= 1e-10


def test_stagewise_rejects_coupling_costs():
    system = ct.LTISystem.create(A, B, D, SMALL_X0, SMALL_N)
    mixed = ct.MixedCost.create(M, np.zeros((2, 1)), XD, weights=WX)
    with pytest.raises(ct.DimensionError):
        from_mpc(system, (mixed,), ())
    ineq = ct.TrajectoryConstraint.create(np.array([[0.0, 1.0]]),
                                          np.array([0.0]))
    with pytest.raises(ct.DimensionError):
        from_mpc(system, (), (ineq,))


def test_lqr_assoc_matches_serial():
    """Log-depth associative-scan LQR == serial Riccati to ~1e-10 on
    random LTV problems (incl. linear cost terms and drift)."""
    from copra_tpu.qp.riccati import lqr_solve_assoc
    rng = np.random.default_rng(0)
    for trial, (n, x, u) in enumerate([(8, 3, 2), (13, 2, 1), (32, 4, 3)]):
        A_ = 0.8 * np.stack([np.eye(x)] * n) + 0.1 * rng.normal(
            size=(n, x, x))
        B_ = rng.normal(size=(n, x, u))
        d_ = 0.1 * rng.normal(size=(n, x))
        Qx = np.stack([np.eye(x) * w
                       for w in rng.uniform(0.5, 2.0, n + 1)])
        qx = rng.normal(size=(n + 1, x))
        Ru = np.stack([np.eye(u) * w for w in rng.uniform(0.5, 2.0, n)])
        ru = rng.normal(size=(n, u))
        x0 = rng.normal(size=x)
        args = tuple(map(jnp.asarray, (A_, B_, d_, Qx, qx, Ru, ru, x0)))
        X1, U1 = ct.lqr_solve(*args)
        X2, U2 = lqr_solve_assoc(*args)
        np.testing.assert_allclose(np.asarray(U2), np.asarray(U1),
                                   atol=1e-9, err_msg=f"trial {trial}")
        np.testing.assert_allclose(np.asarray(X2), np.asarray(X1),
                                   atol=1e-9, err_msg=f"trial {trial}")


def test_lqr_assoc_under_jit_and_vmap():
    from copra_tpu.qp.riccati import lqr_solve_assoc
    rng = np.random.default_rng(1)
    n, x, u, batch = 10, 2, 1, 4
    A_ = jnp.asarray(0.9 * np.stack([np.eye(x)] * n)
                     + 0.05 * rng.normal(size=(n, x, x)))
    B_ = jnp.asarray(rng.normal(size=(n, x, u)))
    d_ = jnp.asarray(0.1 * rng.normal(size=(n, x)))
    Qx = jnp.asarray(np.stack([np.eye(x)] * (n + 1)))
    qx = jnp.zeros((n + 1, x))
    Ru = jnp.asarray(np.stack([np.eye(u)] * n))
    ru = jnp.zeros((n, u))
    x0s = jnp.asarray(rng.normal(size=(batch, x)))

    f = jax.jit(jax.vmap(
        lambda x0: lqr_solve_assoc(A_, B_, d_, Qx, qx, Ru, ru, x0)))
    Xb, Ub = f(x0s)
    assert Xb.shape == (batch, n + 1, x)
    X1, U1 = ct.lqr_solve(A_, B_, d_, Qx, qx, Ru, ru, x0s[2])
    np.testing.assert_allclose(np.asarray(Ub[2]), np.asarray(U1),
                               atol=1e-9)


def test_stagewise_parallel_scan_matches_serial():
    """Riccati-in-ADMM with the log-depth sweep == the serial sweep."""
    system = ct.LTISystem.create(A, B, D, SMALL_X0, SMALL_N)
    costs, cons = costs_constraints()
    o = ct.SolverOptions(max_iter=2000, early_exit=False)
    X1, U1, _ = solve_mpc_stagewise(system, costs, cons, o)
    X2, U2, _ = solve_mpc_stagewise(system, costs, cons, o,
                                    parallel_scan=True)
    np.testing.assert_allclose(np.asarray(U2), np.asarray(U1), atol=1e-8)
    np.testing.assert_allclose(np.asarray(X2), np.asarray(X1), atol=1e-8)
