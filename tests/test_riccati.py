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


def test_stagewise_return_warm_receding():
    """return_warm=True hands back the (z, y) tuple; warm-started ticks at
    a small iteration budget track the exact solution through a receding
    loop (the deployment pattern; VERDICT r2 #8)."""
    import dataclasses

    system = ct.LTISystem.create(A, B, D, SMALL_X0, SMALL_N)
    costs, cons = costs_constraints()
    sqp = from_mpc(system, costs, cons)

    cold_opts = ct.SolverOptions(max_iter=2000, early_exit=False)
    warm_opts = ct.SolverOptions(max_iter=150, early_exit=False)
    X, U, info, warm = solve_stagewise(sqp, cold_opts, return_warm=True)
    assert int(info.status) == ct.STATUS_SOLVED

    rng = np.random.default_rng(9)
    x0 = np.asarray(SMALL_X0, np.float64)
    for _ in range(3):
        x0 = x0 + rng.normal(scale=[0.002, 0.005])
        sqp_t = dataclasses.replace(sqp, x0=jnp.asarray(x0, sqp.x0.dtype))
        X, U, info, warm = solve_stagewise(sqp_t, warm_opts,
                                           warm_start=warm,
                                           return_warm=True)
    # the warm 150-iteration tick tracks the converged solution (this
    # fixture's spectrum is harsh — cold start needs ~2000 iterations;
    # the load-bearing claim is the warm-vs-cold comparison below)
    Xr, Ur, info_r = solve_stagewise(sqp_t, cold_opts)
    np.testing.assert_allclose(np.asarray(U), np.asarray(Ur), atol=5e-3)
    # and beats the cold tick at the SAME iteration budget
    Xc, Uc, _ = solve_stagewise(sqp_t, warm_opts)
    e_warm = np.abs(np.asarray(U) - np.asarray(Ur)).max()
    e_cold = np.abs(np.asarray(Uc) - np.asarray(Ur)).max()
    assert e_warm <= e_cold + 1e-12


def test_make_stagewise_step_fleet():
    """Serving facade: stack_stagewise fleet + cold/warm ticks reproduce
    per-lane solve_stagewise."""
    from copra_tpu.qp.riccati import make_stagewise_step, stack_stagewise

    system = ct.LTISystem.create(A, B, D, SMALL_X0, SMALL_N)
    costs, cons = costs_constraints()
    sqp = from_mpc(system, costs, cons)
    fleet = stack_stagewise([sqp, sqp], repeats=2)   # 4 lanes
    assert fleet.A.shape[0] == 4

    opts = ct.SolverOptions(max_iter=300, early_exit=False)
    tick = make_stagewise_step(fleet, opts)
    rng = np.random.default_rng(3)
    x0s = SMALL_X0[None] + rng.normal(scale=[0.01, 0.05], size=(4, 2))
    x0b = jnp.asarray(x0s, fleet.x0.dtype)
    X, U, info, warm = tick(x0b)                      # cold (10x budget)
    assert (np.asarray(info.status) == ct.STATUS_SOLVED).all()
    X, U, info, warm = tick(x0b, warm)                # warm tick
    import dataclasses as _dc
    ref = solve_stagewise(_dc.replace(sqp, x0=x0b[0]),
                          ct.SolverOptions(max_iter=3000,
                                           early_exit=False))
    np.testing.assert_allclose(np.asarray(U[0]), np.asarray(ref[1]),
                               atol=1e-5)


def test_stagewise_rejects_genuinely_coupling_entries():
    system = ct.LTISystem.create(A, B, D, SMALL_X0, SMALL_N)
    mixed = ct.MixedCost.create(M, np.zeros((2, 1)), XD, weights=WX)
    with pytest.raises(ct.DimensionError):
        from_mpc(system, (mixed,), ())
    # full-horizon constraint with a NON-block-diagonal E couples stages
    rng = np.random.default_rng(5)
    E_dense = rng.normal(size=((SMALL_N + 1) * 2, (SMALL_N + 1) * 2))
    dense = ct.TrajectoryConstraint.create(E_dense,
                                           np.zeros((SMALL_N + 1) * 2))
    with pytest.raises(ct.DimensionError):
        from_mpc(system, (), (dense,))


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


# ---- general per-stage rows (VERDICT r2 item 2) ----

def general_row_setup():
    """Double integrator with trajectory/control/mixed inequality rows
    (the mixed row is active at the optimum)."""
    system = ct.LTISystem.create(A, B, D, np.array([0.0, -3.0]), 12)
    costs = (ct.TargetCost.create(np.eye(2), [0.0, -2.0],
                                  weights=[10.0, 1e4]),
             ct.ControlCost.create([[1.0]], [0.0], weights=[1e-4]))
    cons = (ct.TrajectoryConstraint.create(np.array([[0.0, 1.0]]), [0.5]),
            ct.ControlConstraint.create(np.array([[1.0]]), [120.0]),
            ct.MixedConstraint.create(np.array([[0.0, 0.1]]),
                                      np.array([[1.0]]), [90.0]),
            ct.ControlBoundConstraint.create([-999.0], [999.0]))
    return system, costs, cons


@pytest.mark.parametrize("parallel_scan", [False, True])
def test_stagewise_general_rows_match_condensed(parallel_scan):
    """Per-stage rows (trajectory + control + mixed, mixed active) through
    Riccati-in-ADMM == the condensed solution to near machine precision."""
    system, costs, cons = general_row_setup()
    ref = ct.solve_mpc(system, costs, cons,
                       ct.SolverOptions(max_iter=20000, eps_abs=1e-10,
                                        eps_rel=0.0))
    X, U, info = solve_mpc_stagewise(
        system, costs, cons, ct.SolverOptions(max_iter=4000),
        parallel_scan=parallel_scan)
    assert int(info.status) == ct.STATUS_SOLVED
    np.testing.assert_allclose(np.asarray(U).ravel(),
                               np.asarray(ref.control), atol=1e-8)
    # every Riccati iterate is dynamics-exact
    assert float(ct.replay_dynamics(system, X.reshape(-1),
                                    U.reshape(-1))) <= 1e-12
    # the mixed row is genuinely active (0.1 v + u == 90 somewhere)
    mixed_val = 0.1 * np.asarray(X).reshape(-1, 2)[:-1, 1] \
        + np.asarray(U).ravel()
    assert mixed_val.max() > 90.0 - 1e-6


def test_lqr_cross_terms_vs_dense_kkt():
    """Cross-cost LQR (serial and associative) vs a dense KKT oracle."""
    from copra_tpu.qp.riccati import lqr_solve_assoc
    rng = np.random.default_rng(7)
    N, x, u = 6, 2, 2
    A_ = 0.8 * np.stack([np.eye(x)] * N) + 0.1 * rng.normal(size=(N, x, x))
    B_ = rng.normal(size=(N, x, u))
    d_ = 0.1 * rng.normal(size=(N, x))
    Qx = np.stack([np.eye(x) * w for w in rng.uniform(0.5, 2.0, N + 1)])
    qx = rng.normal(size=(N + 1, x))
    Ru = np.stack([np.eye(u) * w for w in rng.uniform(1.0, 2.0, N)])
    ru = rng.normal(size=(N, u))
    S = 0.3 * rng.normal(size=(N, x, u))   # keeps joint Hessians PD
    x0 = rng.normal(size=x)

    # dense equality-constrained KKT over w = (x_1..N, u_0..N-1)
    nw = N * x + N * u

    def xi(k):      # x_k slice in w (k>=1)
        return slice((k - 1) * x, k * x)

    def ui(k):
        return slice(N * x + k * u, N * x + (k + 1) * u)

    H = np.zeros((nw, nw))
    g = np.zeros(nw)
    for k in range(N + 1):
        if k >= 1:
            H[xi(k), xi(k)] += Qx[k]
            g[xi(k)] += qx[k]
    for k in range(N):
        H[ui(k), ui(k)] += Ru[k]
        g[ui(k)] += ru[k]
        if k >= 1:
            H[xi(k), ui(k)] += S[k]
            H[ui(k), xi(k)] += S[k].T
        # k = 0 cross term is x0' S_0 u_0 -> linear in u_0
        else:
            g[ui(0)] += S[0].T @ x0
    C = np.zeros((N * x, nw))
    b = np.zeros(N * x)
    for k in range(N):
        C[k * x:(k + 1) * x, xi(k + 1)] = -np.eye(x)
        if k >= 1:
            C[k * x:(k + 1) * x, xi(k)] = A_[k]
        else:
            b[:x] -= A_[0] @ x0
        C[k * x:(k + 1) * x, ui(k)] = B_[k]
        b[k * x:(k + 1) * x] -= d_[k]
    KKT = np.block([[H, C.T], [C, np.zeros((N * x, N * x))]])
    sol = np.linalg.solve(KKT, np.concatenate([-g, b]))
    U_ref = sol[N * x:nw].reshape(N, u)

    args = tuple(map(jnp.asarray, (A_, B_, d_, Qx, qx, Ru, ru, x0)))
    Sj = jnp.asarray(S)
    X1, U1 = ct.lqr_solve(*args, S=Sj)
    X2, U2 = lqr_solve_assoc(*args, S=Sj)
    np.testing.assert_allclose(np.asarray(U1), U_ref, atol=1e-9)
    np.testing.assert_allclose(np.asarray(U2), U_ref, atol=1e-8)


def test_stagewise_zmp_preview_vs_condensed():
    """BASELINE config 5 class (bipedal ZMP, full-size time-varying rows):
    the stagewise path takes the workload it exists for (VERDICT r2 #2)
    and matches the condensed solution to 1e-4 in ~half the iterations."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "examples"))
    from bipedal_walking import footstep_plan, lipm_system
    from copra_tpu.autospan import span_matrix

    horizon, T = 300, 0.005
    A_, B_, d_, zmp_row = lipm_system(T, 0.8)
    ref, lo, hi = footstep_plan(4, horizon, T)
    Zfull = np.asarray(span_matrix(zmp_row, horizon + 1))
    base = ct.LTISystem(A=jnp.asarray(A_), B=jnp.asarray(B_),
                        d=jnp.asarray(d_), x0=jnp.zeros(3), horizon=horizon)
    costs = (ct.TrajectoryCost(M=jnp.asarray(Zfull), p=jnp.asarray(ref[0]),
                               weights=jnp.ones(horizon + 1)),
             ct.SimpleControlCost(p=jnp.zeros(horizon),
                                  weights=jnp.full(horizon, 1e-6)))
    cons = (ct.TrajectoryConstraint(E=jnp.asarray(Zfull),
                                    f=jnp.asarray(hi[0])),
            ct.TrajectoryConstraint(E=jnp.asarray(-Zfull),
                                    f=jnp.asarray(-lo[0])))
    res = ct.solve_mpc(base, costs, cons, ct.SolverOptions(max_iter=3000))
    assert int(res.solution.status) == ct.STATUS_SOLVED
    sqp = from_mpc(base, costs, cons)
    assert sqp.nr_rows == 2            # full-size block-diag rows detected
    # fixed-count: the 1e-4 match needs the full 300 iterations, not the
    # first eps-criterion chunk the early exit would stop at
    X, U, info = solve_stagewise(sqp, ct.SolverOptions(max_iter=300,
                                                       rho=1.0,
                                                       early_exit=False))
    assert int(info.status) == ct.STATUS_SOLVED
    np.testing.assert_allclose(np.asarray(U).ravel(),
                               np.asarray(res.control), atol=1e-4)
    zmp = Zfull @ np.asarray(X).reshape(-1)
    assert (zmp <= hi[0] + 1e-6).all()
    assert (zmp >= lo[0] - 1e-6).all()
    assert float(info.dual_residual) > 0.0     # never a hardcoded zero
