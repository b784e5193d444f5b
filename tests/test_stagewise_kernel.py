"""Fused stagewise tick kernel vs the XLA solve_stagewise oracle.

The kernel must reproduce ``solve_stagewise`` update-for-update: same
seeds, same iterates, same residuals/statuses.  Runs in the Pallas
interpreter on CPU (x64), so agreement is to near machine precision.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import copra_tpu as ct
from copra_tpu.ops.stagewise_kernel import (build_fused_plan,
                                            lqr_solve_fixed,
                                            precompute_lqr_gains,
                                            solve_stagewise_fused)
from copra_tpu.qp.riccati import (StagewiseQP, from_mpc, lqr_solve,
                                  solve_stagewise)


def _random_sqp(key, N=17, x=3, u=2, r=2, with_rows=True, inf_frac=0.3):
    ks = jax.random.split(key, 12)
    A = 0.95 * jnp.eye(x) + 0.08 * jax.random.normal(ks[0], (N, x, x))
    B = jax.random.normal(ks[1], (N, x, u)) * 0.5
    d = jax.random.normal(ks[2], (N, x)) * 0.01
    Qm = jax.random.normal(ks[3], (N + 1, x, x)) * 0.3
    Qx = jnp.einsum("kij,kil->kjl", Qm, Qm) + 0.1 * jnp.eye(x)
    qx = jax.random.normal(ks[4], (N + 1, x)) * 0.2
    Rm = jax.random.normal(ks[5], (N, u, u)) * 0.3
    Ru = jnp.einsum("kij,kil->kjl", Rm, Rm) + 0.5 * jnp.eye(u)
    ru = jax.random.normal(ks[6], (N, u)) * 0.2
    x0 = jax.random.normal(ks[7], (x,)) * 0.3
    xlb = jnp.full((N + 1, x), -0.8)
    xub = jnp.full((N + 1, x), 0.8)
    # a fraction of coordinates unbounded: exercises the rho-masked
    # (unsplit) coordinate path
    mask = jax.random.uniform(ks[8], (N + 1, x)) < inf_frac
    xlb = jnp.where(mask, -jnp.inf, xlb)
    xub = jnp.where(mask, jnp.inf, xub)
    ulb = jnp.full((N, u), -1.5)
    uub = jnp.full((N, u), 1.5)
    if with_rows:
        Cx = jax.random.normal(ks[9], (N, r, x))
        Cu = jax.random.normal(ks[10], (N, r, u))
        mid = jax.random.normal(ks[11], (N, r)) * 0.1
        clo, chi = mid - 0.7, mid + 0.7
    else:
        Cx = Cu = clo = chi = None
    return StagewiseQP(A=A, B=B, d=d, Qx=Qx, qx=qx, Ru=Ru, ru=ru, x0=x0,
                       xlb=xlb, xub=xub, ulb=ulb, uub=uub,
                       Cx=Cx, Cu=Cu, clo=clo, chi=chi)


def _batch(sqp, B, key):
    sqps = jax.tree_util.tree_map(
        lambda a: jnp.stack([a] * B), sqp)
    x0s = sqp.x0[None] + 0.1 * jax.random.normal(key, (B, sqp.xdim))
    return dataclasses.replace(sqps, x0=x0s)


def test_fixed_gains_lqr_matches_full_riccati():
    """lqr_solve_fixed(gains) == lqr_solve for the same stage Hessians,
    including cross terms — the algebra the fused kernel relies on."""
    key = jax.random.PRNGKey(0)
    sqp = _random_sqp(key, N=13, x=3, u=2, with_rows=False)
    N, x, u = sqp.horizon, sqp.xdim, sqp.udim
    S = 0.05 * jax.random.normal(jax.random.PRNGKey(1), (N, x, u))
    X0, U0 = lqr_solve(sqp.A, sqp.B, sqp.d, sqp.Qx, sqp.qx, sqp.Ru,
                       sqp.ru, sqp.x0, S=S)
    gains = precompute_lqr_gains(sqp.A, sqp.B, sqp.d, sqp.Qx, sqp.Ru, S)
    X1, U1 = lqr_solve_fixed(gains, sqp.A, sqp.B, sqp.d, sqp.qx, sqp.ru,
                             sqp.x0)
    np.testing.assert_allclose(np.asarray(X1), np.asarray(X0),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(U1), np.asarray(U0),
                               atol=1e-10)


@pytest.mark.parametrize("with_rows", [False, True])
def test_fused_matches_xla_cold(with_rows):
    key = jax.random.PRNGKey(2 if with_rows else 3)
    sqp = _random_sqp(key, with_rows=with_rows)
    opts = ct.SolverOptions(max_iter=40, early_exit=False)
    sqp_b = _batch(sqp, 3, jax.random.PRNGKey(7))
    Xo, Uo, io = jax.vmap(
        lambda s: solve_stagewise(s, opts))(sqp_b)
    Xf, Uf, if_ = solve_stagewise_fused(sqp_b, opts, interpret=True)
    np.testing.assert_allclose(np.asarray(Xf), np.asarray(Xo), atol=1e-9)
    np.testing.assert_allclose(np.asarray(Uf), np.asarray(Uo), atol=1e-9)
    np.testing.assert_allclose(np.asarray(if_.primal_residual),
                               np.asarray(io.primal_residual), atol=1e-9)
    np.testing.assert_allclose(np.asarray(if_.dual_residual),
                               np.asarray(io.dual_residual), atol=1e-9)
    assert np.array_equal(np.asarray(if_.status), np.asarray(io.status))


@pytest.mark.parametrize("with_rows", [False, True])
def test_fused_matches_xla_warm_tick(with_rows):
    """Warm-started receding tick: carry the warm tuple across a solve
    (the config-5 serving pattern) through both paths."""
    key = jax.random.PRNGKey(4 if with_rows else 5)
    sqp = _random_sqp(key, with_rows=with_rows)
    opts = ct.SolverOptions(max_iter=30, early_exit=False)
    sqp_b = _batch(sqp, 2, jax.random.PRNGKey(8))

    _, _, _, warm_o = jax.vmap(
        lambda s: solve_stagewise(s, opts, return_warm=True))(sqp_b)
    _, _, _, warm_f = solve_stagewise_fused(sqp_b, opts, interpret=True,
                                            return_warm=True)
    for a, b in zip(warm_f, warm_o):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-9)

    # next tick from the carried state, new x0
    x0n = sqp_b.x0 + 0.02
    sqp_n = dataclasses.replace(sqp_b, x0=x0n)
    Xo, Uo, io = jax.vmap(
        lambda s, w: solve_stagewise(s, opts, warm_start=w))(
            sqp_n, warm_o)
    Xf, Uf, if_ = solve_stagewise_fused(sqp_n, opts, warm_start=warm_f,
                                        interpret=True)
    np.testing.assert_allclose(np.asarray(Xf), np.asarray(Xo), atol=1e-9)
    np.testing.assert_allclose(np.asarray(Uf), np.asarray(Uo), atol=1e-9)


def test_fused_zmp_class_workload():
    """ZMP-shaped problem (x=3, u=1, r=2 trajectory rows re-expressed
    through the dynamics) via from_mpc — the BASELINE config-5 class —
    against both the XLA stagewise path and golden convergence."""
    N = 40
    T = 0.05
    A = jnp.array([[1.0, T, T * T / 2], [0, 1.0, T], [0, 0, 1.0]])
    B = jnp.array([[T ** 3 / 6], [T * T / 2], [T]])
    d = jnp.zeros(3)
    z_row = jnp.array([1.0, 0.0, -0.26])
    system = ct.LTISystem.create(A, B, d, jnp.array([0.01, 0.0, 0.0]), N)
    ref = 0.05 * jnp.sin(jnp.linspace(0, 2 * jnp.pi, N + 1))
    Zfull = jax.scipy.linalg.block_diag(*([z_row[None, :]] * (N + 1)))
    costs = (ct.TrajectoryCost(M=Zfull, p=ref,
                               weights=jnp.ones(N + 1)),
             ct.SimpleControlCost(p=jnp.zeros(N),
                                  weights=jnp.full(N, 1e-6)))
    cons = (ct.TrajectoryConstraint(E=Zfull, f=ref + 0.04),
            ct.TrajectoryConstraint(E=-Zfull, f=-(ref - 0.04)))
    sqp = from_mpc(system, costs, cons)
    sqp_b = jax.tree_util.tree_map(lambda a: jnp.stack([a, a]), sqp)
    opts = ct.SolverOptions(max_iter=300, early_exit=False)
    Xo, Uo, io = jax.vmap(lambda s: solve_stagewise(s, opts))(sqp_b)
    Xf, Uf, if_ = solve_stagewise_fused(sqp_b, opts, interpret=True)
    np.testing.assert_allclose(np.asarray(Uf), np.asarray(Uo), atol=1e-8)
    np.testing.assert_allclose(np.asarray(Xf), np.asarray(Xo), atol=1e-8)
    # dynamics replay holds for every Riccati iterate (reference replay
    # oracle, /root/reference test contract <= 1e-10)
    Xs, Us = np.asarray(Xf[0]), np.asarray(Uf[0])
    for k in range(N):
        err = Xs[k + 1] - (np.asarray(A) @ Xs[k]
                           + np.asarray(B) @ Us[k]).ravel()
        assert np.abs(err).max() < 1e-10


def test_fused_single_problem_roundtrip():
    """Unbatched StagewiseQP in == unbatched result out."""
    sqp = _random_sqp(jax.random.PRNGKey(9), with_rows=True)
    opts = ct.SolverOptions(max_iter=25, early_exit=False)
    Xo, Uo, _ = solve_stagewise(sqp, opts)
    Xf, Uf, info = solve_stagewise_fused(sqp, opts, interpret=True)
    assert Xf.shape == Xo.shape and Uf.shape == Uo.shape
    np.testing.assert_allclose(np.asarray(Xf), np.asarray(Xo), atol=1e-9)
    assert np.asarray(info.status).shape == ()


def test_plan_reuse_matches_fresh_build():
    sqp = _random_sqp(jax.random.PRNGKey(11), with_rows=True)
    sqp_b = _batch(sqp, 2, jax.random.PRNGKey(12))
    opts = ct.SolverOptions(max_iter=20, early_exit=False)
    plan = build_fused_plan(sqp_b, opts)
    X1, U1, _ = solve_stagewise_fused(sqp_b, opts, interpret=True)
    X2, U2, _ = solve_stagewise_fused(sqp_b, opts, interpret=True,
                                      plan=plan)
    np.testing.assert_allclose(np.asarray(X1), np.asarray(X2), atol=0)
    np.testing.assert_allclose(np.asarray(U1), np.asarray(U2), atol=0)


def test_make_stagewise_step_fused_backend_matches_xla():
    """The serving facade's fused backend reproduces the XLA backend
    across a cold + two warm receding ticks."""
    from copra_tpu.qp.riccati import make_stagewise_step
    sqp = _random_sqp(jax.random.PRNGKey(21), N=12, with_rows=True)
    sqp_b = _batch(sqp, 2, jax.random.PRNGKey(22))
    opts = ct.SolverOptions(max_iter=20, early_exit=False)
    tick_x = make_stagewise_step(sqp_b, opts, backend="xla")
    tick_f = make_stagewise_step(sqp_b, opts, backend="fused")
    x0s = [sqp_b.x0 + 0.01 * k for k in range(3)]
    Xx, Ux, ix, wx = tick_x(x0s[0])
    Xf, Uf, if_, wf = tick_f(x0s[0])
    np.testing.assert_allclose(np.asarray(Uf), np.asarray(Ux), atol=1e-9)
    for k in (1, 2):
        Xx, Ux, ix, wx = tick_x(x0s[k], wx)
        Xf, Uf, if_, wf = tick_f(x0s[k], wf)
        np.testing.assert_allclose(np.asarray(Uf), np.asarray(Ux),
                                   atol=1e-9)
        np.testing.assert_allclose(np.asarray(Xf), np.asarray(Xx),
                                   atol=1e-9)
    assert np.array_equal(np.asarray(if_.status), np.asarray(ix.status))


def test_dual_residual_parallel_matches_serial():
    """Log-depth (associative-scan) adjoint == serial scan adjoint."""
    from copra_tpu.qp.riccati import stagewise_dual_residual
    sqp = _random_sqp(jax.random.PRNGKey(31), N=19, with_rows=True)
    key = jax.random.PRNGKey(32)
    N, x, u, r = sqp.horizon, sqp.xdim, sqp.udim, sqp.nr_rows
    ks = jax.random.split(key, 5)
    X = jax.random.normal(ks[0], (N + 1, x))
    U = jax.random.normal(ks[1], (N, u))
    yX = jax.random.normal(ks[2], (N + 1, x))
    yU = jax.random.normal(ks[3], (N, u))
    yS = jax.random.normal(ks[4], (N, r))
    r0 = stagewise_dual_residual(sqp, X, U, yX, yU, yS)
    r1 = stagewise_dual_residual(sqp, X, U, yX, yU, yS, parallel=True)
    np.testing.assert_allclose(float(r1), float(r0), rtol=1e-12)
    r0b = stagewise_dual_residual(sqp, X, U, yX, yU)
    r1b = stagewise_dual_residual(sqp, X, U, yX, yU, parallel=True)
    np.testing.assert_allclose(float(r1b), float(r0b), rtol=1e-12)


def test_fused_chunked_lane_path():
    """B > LANES exercises the lax.map chunking (2 chunks of 128)."""
    sqp = _random_sqp(jax.random.PRNGKey(41), N=8, x=2, u=1, r=1)
    sqp_b = _batch(sqp, 130, jax.random.PRNGKey(42))
    opts = ct.SolverOptions(max_iter=15, early_exit=False)
    Xo, Uo, io = jax.vmap(lambda s: solve_stagewise(s, opts))(sqp_b)
    Xf, Uf, if_ = solve_stagewise_fused(sqp_b, opts, interpret=True)
    np.testing.assert_allclose(np.asarray(Uf), np.asarray(Uo), atol=1e-9)
    np.testing.assert_allclose(np.asarray(Xf), np.asarray(Xo), atol=1e-9)
    assert np.array_equal(np.asarray(if_.status), np.asarray(io.status))


def test_lmpc_as_stagewise_step():
    """LMPC facade -> stagewise serving tick (the config-5 entry point),
    matching the facade's own solve."""
    from fixtures import (A, B, D, M, N_MAT, SMALL_N, SMALL_X0, UD,
                          U_LOWER, U_UPPER, WU, WX, XD)
    system = ct.LTISystem.create(A, B, D, SMALL_X0, SMALL_N)
    ctrl = ct.LMPC(system,
                   options=ct.SolverOptions(max_iter=400,
                                            early_exit=False))
    ctrl.add_cost(ct.TargetCost.create(M, XD, weights=WX))
    ctrl.add_cost(ct.ControlCost.create(N_MAT, UD, weights=WU))
    ctrl.add_constraint(ct.ControlBoundConstraint.create(U_LOWER,
                                                         U_UPPER))
    tick = ctrl.as_stagewise_step(backend="xla")
    X, U, info, warm = tick(jnp.asarray(SMALL_X0))
    assert int(info.status) == 0
    assert ctrl.solve()
    np.testing.assert_allclose(np.asarray(U).ravel(),
                               np.asarray(ctrl.control()), atol=5e-4)
    # warm receding tick from the carried state
    X2, U2, info2, warm = tick(jnp.asarray(SMALL_X0) + 0.01, warm)
    assert U2.shape == U.shape


def test_fused_mode_selection():
    """Mode policy: ZMP class -> resident; robot scale (quadruped class,
    x=12/u=12/r=12) -> streamed; beyond both -> guidance error."""
    from copra_tpu.ops.stagewise_kernel import fused_mode
    assert fused_mode(300, 3, 1, 2, jnp.float32) == "resident"
    assert fused_mode(100, 12, 12, 12, jnp.float32) == "streamed"
    assert fused_mode(200, 12, 12, 12, jnp.float32) == "streamed"
    with pytest.raises(ValueError, match="envelope exceeded"):
        # resident warm/work state itself outgrows VMEM here
        fused_mode(1000, 12, 12, 12, jnp.float32)
    with pytest.raises(ValueError, match="envelope exceeded"):
        fused_mode(50, 64, 64, 64, jnp.float32)


@pytest.mark.parametrize("with_rows", [False, True])
def test_streamed_robot_scale_matches_xla(with_rows):
    """Robot-scale dims (x=12, u=12, r=12 — the reference's quadruped
    class) route to the STREAMED kernel and must reproduce the XLA
    oracle update-for-update, cold and warm (VERDICT r3 #1)."""
    from copra_tpu.ops.stagewise_kernel import build_fused_plan
    key = jax.random.PRNGKey(51 if with_rows else 52)
    sqp = _random_sqp(key, N=15, x=12, u=12, r=12, with_rows=with_rows)
    sqp_b = _batch(sqp, 2, jax.random.PRNGKey(53))
    opts = ct.SolverOptions(max_iter=12, early_exit=False)
    plan = build_fused_plan(sqp_b, opts)
    assert plan.plan_fwd is not None, "expected the streamed mode"

    Xo, Uo, io, warm_o = jax.vmap(
        lambda s: solve_stagewise(s, opts, return_warm=True))(sqp_b)
    Xf, Uf, if_, warm_f = solve_stagewise_fused(
        sqp_b, opts, interpret=True, return_warm=True, plan=plan)
    np.testing.assert_allclose(np.asarray(Xf), np.asarray(Xo), atol=1e-9)
    np.testing.assert_allclose(np.asarray(Uf), np.asarray(Uo), atol=1e-9)
    np.testing.assert_allclose(np.asarray(if_.primal_residual),
                               np.asarray(io.primal_residual), atol=1e-9)
    np.testing.assert_allclose(np.asarray(if_.dual_residual),
                               np.asarray(io.dual_residual), atol=1e-9)
    assert np.array_equal(np.asarray(if_.status), np.asarray(io.status))

    # warm receding tick at a shifted state
    x0n = sqp_b.x0 + 0.02
    sqp_n = dataclasses.replace(sqp_b, x0=x0n)
    Xo2, Uo2, _ = jax.vmap(
        lambda s, w: solve_stagewise(s, opts, warm_start=w))(
            sqp_n, warm_o)
    Xf2, Uf2, _ = solve_stagewise_fused(
        sqp_n, opts, warm_start=warm_f, interpret=True,
        plan=dataclasses.replace(plan, sqp=sqp_n))
    np.testing.assert_allclose(np.asarray(Xf2), np.asarray(Xo2),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(Uf2), np.asarray(Uo2),
                               atol=1e-9)


@pytest.mark.parametrize("backend", ["xla", "fused"])
def test_topup_converges_straggler_lanes(backend):
    """options.topup_iters (VERDICT r4 #5): a fleet tick whose fixed
    count leaves lanes unconverged runs ONE bounded extra pass and
    delivers converged_frac 1.0; an already-converged fleet's results
    are bit-identical with the option on or off (the cond never fires
    on the value path)."""
    key = jax.random.PRNGKey(7)
    sqp = _random_sqp(key, N=12, with_rows=True)
    sqp_b = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (4,) + a.shape), sqp)
    from copra_tpu.qp.riccati import make_stagewise_step
    base = ct.SolverOptions(max_iter=6, eps_abs=1e-7, eps_rel=0.0,
                            early_exit=False, rho=0.1)
    copts = base.replace(max_iter=4000)

    # starved budget, no top-up: the perturbed tick ships stragglers
    tick0 = make_stagewise_step(sqp_b, base, cold_options=copts,
                                backend=backend)
    x0a = jnp.broadcast_to(sqp.x0, (4, sqp.xdim))
    X, U, info, warm = tick0(x0a)
    assert (np.asarray(info.status) == ct.STATUS_SOLVED).all()
    x0b = x0a + 0.5     # big jump: 6 warm iterations cannot recover
    _, _, info0, _ = tick0(x0b, warm)
    assert not (np.asarray(info0.status) == ct.STATUS_SOLVED).all(), \
        "fixture too easy: starved tick converged anyway"

    # same budget + top-up: every lane converges
    tick1 = make_stagewise_step(sqp_b, base.replace(topup_iters=4000),
                                cold_options=copts, backend=backend)
    _, _, info_a, warm1 = tick1(x0a)
    _, U1, info1, _ = tick1(x0b, warm1)
    assert (np.asarray(info1.status) == ct.STATUS_SOLVED).all(), \
        info1.inform()

    # converged fleet: value path identical with the option on
    _, Uq, infoq, _ = tick0(x0a, warm)
    _, Ut, infot, _ = tick1(x0a, warm1)
    np.testing.assert_allclose(np.asarray(Ut), np.asarray(Uq),
                               rtol=0, atol=1e-12)
