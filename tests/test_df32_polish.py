"""Compensated-f32 (df32) polish: primitives exactness + floor retirement.

The fused f32 stagewise kernel's accuracy floor is ~2e-5 on
1e4-curvature problems (measured; ops/df32.py docstring).  These tests
pin (a) the error-free transforms the polish is built from, (b) that
the polish strictly improves the delivered solution toward the f64
oracle of the same f32-data QP, and (c) the integration contract
(honest statuses, eager-plan requirement, f32-only guard).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import copra_tpu as ct
from copra_tpu.autospan import span_matrix
from copra_tpu.ops import df32
from copra_tpu.ops.stagewise_kernel import solve_stagewise_fused
from copra_tpu.qp.riccati import from_mpc, solve_stagewise

F32 = jnp.float32


# ---- primitives: error-free transforms vs exact f64 ------------------

def _rand32(key, shape, scale=1.0):
    return (scale * jax.random.normal(key, shape)).astype(F32)


def test_two_sum_exact():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    a = _rand32(k1, (512,), 1.0)
    b = _rand32(k2, (512,), 1e-4)
    s, e = jax.jit(df32.two_sum)(a, b)
    exact = a.astype(np.float64) + b.astype(np.float64)
    got = np.asarray(s, np.float64) + np.asarray(e, np.float64)
    np.testing.assert_array_equal(got, exact)


def test_two_prod_exact():
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    a = _rand32(k1, (512,), 3.0)
    b = _rand32(k2, (512,), 0.3)
    p, e = jax.jit(df32.two_prod)(a, b)
    exact = a.astype(np.float64) * b.astype(np.float64)
    got = np.asarray(p, np.float64) + np.asarray(e, np.float64)
    # f32 products are exactly representable in f64 -> equality
    np.testing.assert_array_equal(got, exact)


def test_df_mul_presplit_matches_f64():
    rng = np.random.default_rng(2)
    c64 = rng.normal(size=512) * 2.0
    ch = c64.astype(np.float32)
    cl = (c64 - ch.astype(np.float64)).astype(np.float32)
    sc = np.float32(4097.0) * ch
    chh = sc - (sc - ch)
    chl = ch - chh
    xh = rng.normal(size=512).astype(np.float32)
    xl = (rng.normal(size=512) * 1e-8).astype(np.float32)
    ph, pl = jax.jit(df32.df_mul_presplit)(
        jnp.asarray(chh), jnp.asarray(chl), jnp.asarray(cl),
        jnp.asarray(xh), jnp.asarray(xl))
    got = np.asarray(ph, np.float64) + np.asarray(pl, np.float64)
    exact = c64 * (xh.astype(np.float64) + xl.astype(np.float64))
    assert np.abs(got - exact).max() <= 1e-13 * np.abs(exact).max()


def test_df_clip_takes_exact_bounds():
    xh = jnp.asarray([0.5, 2.5, -3.5], F32)
    xl = jnp.asarray([1e-9, -1e-9, 1e-9], F32)
    lbh = jnp.asarray([-1.0, -1.0, -1.0], F32)
    ubh = jnp.asarray([1.0, 1.0, 1.0], F32)
    z = jnp.zeros(3, F32)
    h, l = df32.df_clip(xh, xl, lbh, z, ubh, z)
    np.testing.assert_array_equal(np.asarray(h), [0.5, 1.0, -1.0])
    np.testing.assert_array_equal(
        np.asarray(l), np.asarray([1e-9, 0.0, 0.0], np.float32))
    # +/-inf bounds: pass-through, no NaNs
    inf = jnp.asarray([np.inf] * 3, F32)
    h, l = df32.df_clip(xh, xl, -inf, z, inf, z)
    np.testing.assert_array_equal(np.asarray(h), np.asarray(xh))


# ---- the config-1-class workload (saturated u-box, curvature 1e4) ----

def _box_problem(batch=16, N=10):
    A = np.array([[1.0, 0.1], [0.0, 1.0]])
    B = np.array([[0.005], [0.1]])
    rng = np.random.default_rng(1)
    x0s = np.array([1.0, 0.0])[None] + rng.normal(
        scale=[0.3, 0.2], size=(batch, 2))
    pos_row = np.asarray(span_matrix(np.array([[1.0, 0.0]]), N + 1))
    system = ct.LTISystem.create(
        A.astype(np.float32), B.astype(np.float32),
        np.zeros(2, np.float32), x0s[0].astype(np.float32), N)
    costs = (ct.TrajectoryCost(M=jnp.asarray(pos_row, F32),
                               p=jnp.zeros(N + 1, F32),
                               weights=jnp.full(N + 1, 10.0, F32)),
             ct.SimpleControlCost(p=jnp.zeros(N, F32),
                                  weights=jnp.full(N, 1e-3, F32)))
    cons = (ct.ControlBoundConstraint.create([-2.0], [2.0]),)
    sqp = from_mpc(system, costs, cons)
    sqp_b = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (batch,) + a.shape), sqp)
    return dataclasses.replace(sqp_b, x0=jnp.asarray(x0s, F32))


def _oracle64(sqp_b, opts):
    sqp64 = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float64), sqp_b)
    _, U64, _ = jax.vmap(
        lambda s: solve_stagewise(s, opts.replace(max_iter=20000)))(sqp64)
    return np.asarray(U64, np.float64)


def test_polish_retires_the_f32_floor_box():
    sqp_b = _box_problem()
    opts = ct.SolverOptions(max_iter=3000, early_exit=False, rho=0.1,
                            polish=False)
    U64 = _oracle64(sqp_b, opts)
    _, U0, _ = solve_stagewise_fused(sqp_b, opts)
    err0 = np.abs(np.asarray(U0, np.float64) - U64).max()
    _, U1, info1 = solve_stagewise_fused(
        sqp_b, opts.replace(polish_iters=100))
    err1 = np.abs(np.asarray(U1, np.float64) - U64).max()
    # the f32 phase floors above ~9e-6 here; the polish must cut it by
    # >= 2.5x and land the batch inside the 1e-5 golden contract
    assert err0 > 5e-6, f"f32 floor unexpectedly low: {err0:.2e}"
    assert err1 <= err0 / 2.5, f"polish too weak: {err0:.2e}->{err1:.2e}"
    assert err1 <= 1e-5
    assert (np.asarray(info1.status) == ct.STATUS_SOLVED).all()


def test_polish_residuals_strictly_improve():
    sqp_b = _box_problem(batch=8)
    opts = ct.SolverOptions(max_iter=3000, early_exit=False, rho=0.1,
                            polish=False)
    _, _, i0 = solve_stagewise_fused(sqp_b, opts)
    _, _, i1 = solve_stagewise_fused(sqp_b,
                                     opts.replace(polish_iters=50))
    assert float(np.max(np.asarray(i1.primal_residual))) \
        < 0.5 * float(np.max(np.asarray(i0.primal_residual)))
    assert float(np.max(np.asarray(i1.dual_residual))) \
        < 0.5 * float(np.max(np.asarray(i0.dual_residual)))


# ---- general rows (ZMP-like polygon) ---------------------------------

def _zmp_problem(batch=4, N=40):
    T, h = 0.02, 0.8
    A = np.array([[1.0, T, T * T / 2], [0.0, 1.0, T], [0.0, 0.0, 1.0]])
    B = np.array([[T ** 3 / 6], [T * T / 2], [T]])
    zrow = np.array([[1.0, 0.0, -h / 9.81]])
    Z = np.asarray(span_matrix(zrow, N + 1))
    per = max(N // 3, 1)
    ref = np.array([0.2 * min(k // per, 2) for k in range(N + 1)])
    system = ct.LTISystem.create(A.astype(np.float32),
                                 B.astype(np.float32),
                                 np.zeros(3, np.float32),
                                 np.zeros(3, np.float32), N)
    costs = (ct.TrajectoryCost(M=jnp.asarray(Z, F32),
                               p=jnp.asarray(ref, F32),
                               weights=jnp.ones(N + 1, F32)),
             ct.SimpleControlCost(p=jnp.zeros(N, F32),
                                  weights=jnp.full(N, 1e-6, F32)))
    cons = (ct.TrajectoryConstraint(E=jnp.asarray(Z, F32),
                                    f=jnp.asarray(ref + 0.05, F32)),
            ct.TrajectoryConstraint(E=jnp.asarray(-Z, F32),
                                    f=jnp.asarray(-(ref - 0.05), F32)))
    sqp = from_mpc(system, costs, cons)
    sqp_b = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (batch,) + a.shape), sqp)
    rng = np.random.default_rng(7)
    x0s = 0.01 * rng.normal(size=(batch, 3))
    return dataclasses.replace(sqp_b, x0=jnp.asarray(x0s, F32))


def test_polish_improves_row_problem():
    sqp_b = _zmp_problem()
    opts = ct.SolverOptions(max_iter=2000, early_exit=False, rho=1.0,
                            polish=False)
    U64 = _oracle64(sqp_b, opts)
    _, U0, _ = solve_stagewise_fused(sqp_b, opts)
    _, U1, _ = solve_stagewise_fused(sqp_b,
                                     opts.replace(polish_iters=60))
    err0 = np.abs(np.asarray(U0, np.float64) - U64).max()
    err1 = np.abs(np.asarray(U1, np.float64) - U64).max()
    assert err1 < err0, f"row polish regressed: {err0:.2e}->{err1:.2e}"
    assert err1 <= max(err0 / 2, 2e-6), \
        f"row polish too weak: {err0:.2e}->{err1:.2e}"


def test_polish_improves_drifting_system():
    """Regression: the polish plan's affine term is (A'V)d, whose
    einsum orientation was once flipped — invisible on d == 0
    workloads (every bench config), divergent on drifting systems
    (gravity, LTV affine dynamics)."""
    sqp_b = _box_problem(batch=8)
    d = jnp.broadcast_to(jnp.asarray([0.02, -0.04], F32),
                         sqp_b.d.shape[-2:])
    sqp_b = dataclasses.replace(
        sqp_b, d=jnp.broadcast_to(d, sqp_b.d.shape))
    opts = ct.SolverOptions(max_iter=3000, early_exit=False, rho=0.1,
                            polish=False)
    U64 = _oracle64(sqp_b, opts)
    _, U0, _ = solve_stagewise_fused(sqp_b, opts)
    _, U1, _ = solve_stagewise_fused(sqp_b,
                                     opts.replace(polish_iters=80))
    err0 = np.abs(np.asarray(U0, np.float64) - U64).max()
    err1 = np.abs(np.asarray(U1, np.float64) - U64).max()
    assert err1 < err0, \
        f"polish regressed on drifting system: {err0:.2e}->{err1:.2e}"
    assert err1 <= 1e-5


# ---- contracts --------------------------------------------------------

def test_polish_noop_for_f64():
    """polish_iters on f64 data is a NO-OP, not an error (ADVICE r4):
    one SolverOptions carrying the polish must drive both the f32
    serving plan and its f64 oracle/cross-validation builds."""
    sqp_b = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float64), _box_problem(batch=2))
    opts = ct.SolverOptions(max_iter=400, early_exit=False,
                            polish_iters=10)
    X, U, info = solve_stagewise_fused(sqp_b, opts)
    Xr, Ur, _ = solve_stagewise_fused(sqp_b, opts.replace(polish_iters=0))
    np.testing.assert_allclose(np.asarray(U), np.asarray(Ur),
                               rtol=0, atol=0)


def test_polish_under_jit_needs_eager_plan():
    sqp_b = _box_problem(batch=2)
    opts = ct.SolverOptions(max_iter=10, early_exit=False,
                            polish_iters=5)

    @jax.jit
    def run(s):
        return solve_stagewise_fused(s, opts)[1]

    with pytest.raises(ValueError, match="eagerly-built plan"):
        run(sqp_b)


def test_polish_through_serving_facade():
    """make_stagewise_step builds the df32 plan eagerly; warm ticks
    polish under jit via the plan argument."""
    from copra_tpu.qp.riccati import make_stagewise_step
    sqp_b = _box_problem(batch=4)
    opts = ct.SolverOptions(max_iter=300, early_exit=False, rho=0.1,
                            polish=False, polish_iters=20)
    tick = make_stagewise_step(sqp_b, opts, backend="fused")
    X, U, info, warm = tick(sqp_b.x0)
    X, U, info, warm = tick(sqp_b.x0 + 0.01, warm)
    assert np.isfinite(np.asarray(U)).all()
