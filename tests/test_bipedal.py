"""Bipedal CoM preview control (BASELINE.md config 5): N=300, time-varying
ZMP reference and support polygon, both axes vmapped.

This is the long-horizon stress config: a 300-var QP with 1204 full-size
inequality rows, exercising the full-horizon entry modes of
TrajectoryCost/TrajectoryConstraint.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

import jax
import jax.numpy as jnp

import copra_tpu as ct
from copra_tpu.autospan import span_matrix
from bipedal_walking import footstep_plan, lipm_system, solve_preview


def test_bipedal_preview_solves_and_respects_polygon():
    X, U, zmp, (ref, lo, hi), sol = solve_preview(
        horizon=300, options=ct.SolverOptions(max_iter=3000))
    zmp = np.asarray(zmp)
    assert (np.asarray(sol.status) == ct.STATUS_SOLVED).all()
    # ZMP inside the moving support polygon (the hard constraint)
    assert (zmp <= hi + 1e-6).all()
    assert (zmp >= lo - 1e-6).all()
    # dynamics replay per axis
    A, B, d, _ = lipm_system(0.005, 0.8)
    for ax in range(2):
        sys_ax = ct.LTISystem.create(A, B, d, np.zeros(3), 300)
        assert float(ct.replay_dynamics(
            sys_ax, X[ax], U[ax])) <= 1e-8
    # the CoM makes forward progress toward the footsteps
    com_x = np.asarray(X)[0, 0::3]
    assert com_x[-1] > 0.01
    assert com_x.max() <= ref[0].max() + 0.06


def _bipedal_fleet(horizon, robots, t_samp=0.02):
    """The serving formulation of the example (both axes x ``robots``
    lanes) as a batched StagewiseQP, f64 on CPU so the fused
    interpreter cross below is exact-class."""
    from copra_tpu.qp.riccati import from_mpc, stack_stagewise

    A, B, d, zmp_row = lipm_system(t_samp, 0.8)
    ref, lo, hi = footstep_plan(n_steps=4, horizon=horizon, T=t_samp)
    Zfull = jnp.asarray(np.asarray(span_matrix(zmp_row, horizon + 1)))
    base = ct.LTISystem(A=jnp.asarray(A), B=jnp.asarray(B),
                        d=jnp.asarray(d), x0=jnp.zeros(3),
                        horizon=horizon)

    def axis_sqp(ax):
        costs = (ct.TrajectoryCost(M=Zfull, p=jnp.asarray(ref[ax]),
                                   weights=jnp.ones(horizon + 1)),
                 ct.SimpleControlCost(p=jnp.zeros(horizon),
                                      weights=jnp.full(horizon, 1e-6)))
        cons = (ct.TrajectoryConstraint(E=Zfull, f=jnp.asarray(hi[ax])),
                ct.TrajectoryConstraint(E=-Zfull,
                                        f=jnp.asarray(-lo[ax])))
        return from_mpc(base, costs, cons)

    fleet = stack_stagewise([axis_sqp(0), axis_sqp(1)], repeats=robots)
    zmp_mats = np.stack([np.asarray(Zfull)] * (2 * robots))
    bounds = (np.repeat(lo, robots, axis=0), np.repeat(hi, robots, axis=0))
    return fleet, (A, B, d), zmp_mats, bounds


def test_bipedal_fused_vs_xla_receding_cross():
    """The flagship config-5 pairing ON the bipedal formulation: the
    fused Pallas tick kernel must reproduce the XLA scan path
    update-for-update across a cold + two warm receding ticks (the
    generic cross in test_stagewise_kernel runs random draws; this
    pins the N-long ZMP polygon workload itself)."""
    from copra_tpu.qp.riccati import make_stagewise_step

    fleet, (A, B, d), _, _ = _bipedal_fleet(horizon=60, robots=2)
    opts = ct.SolverOptions(max_iter=15, early_exit=False, rho=1.0)
    tick_x = make_stagewise_step(fleet, opts, backend="xla")
    tick_f = make_stagewise_step(fleet, opts, backend="fused")

    x0 = jnp.zeros((4, 3))
    Xx, Ux, ix, wx = tick_x(x0)
    Xf, Uf, if_, wf = tick_f(x0)
    np.testing.assert_allclose(np.asarray(Uf), np.asarray(Ux), atol=1e-9)
    for _ in range(2):
        x0 = Xx[:, 1]                               # step the plant
        Xx, Ux, ix, wx = tick_x(x0, wx)
        Xf, Uf, if_, wf = tick_f(x0, wf)
        np.testing.assert_allclose(np.asarray(Uf), np.asarray(Ux),
                                   atol=1e-9)
        np.testing.assert_allclose(np.asarray(Xf), np.asarray(Xx),
                                   atol=1e-9)
    assert np.array_equal(np.asarray(if_.status), np.asarray(ix.status))


def test_bipedal_receding_stays_in_polygon_and_matches_oracle():
    """Warm-started receding bipedal serving: every tick's realized ZMP
    stays inside the moving support polygon, statuses are honest, and
    the final tick's delivered control matches the exact f64 native
    oracle of the same QP (the suite-level analog of the
    `bench_all --config 5` gate)."""
    from copra_tpu.qp.native import native_available, solve_qp_native
    from copra_tpu.qp.riccati import make_stagewise_step

    H = 60
    fleet, (A, B, d), zmp_mats, (lo_b, hi_b) = _bipedal_fleet(H, robots=1)
    opts = ct.SolverOptions(max_iter=4000, eps_abs=1e-9, eps_rel=0.0,
                            early_exit=False)
    tick = make_stagewise_step(fleet, opts, backend="xla")

    x0 = jnp.zeros((2, 3))
    warm = None
    for t in range(3):
        x_used = np.asarray(x0, np.float64)    # the state U solves for
        X, U, info, warm = tick(x0, warm)
        assert (np.asarray(info.status) == ct.STATUS_SOLVED).all(), \
            f"tick {t}: {np.asarray(info.status)}"
        Xh = np.asarray(X, np.float64).reshape(2, -1)
        zmp = np.einsum("lrc,lc->lr", zmp_mats, Xh)
        assert (zmp <= hi_b + 1e-7).all() and (zmp >= lo_b - 1e-7).all(), \
            f"tick {t}: ZMP left the support polygon"
        x0 = X[:, 1]

    if not native_available():                       # pragma: no cover
        return
    # exact oracle on the per-axis condensed QP at the state the final
    # tick's delivered control actually solved for
    x_last = x_used
    _, _, _, zmp_row = lipm_system(0.02, 0.8)
    ref, lo, hi = footstep_plan(n_steps=4, horizon=H, T=0.02)
    Zfull = np.asarray(span_matrix(zmp_row, H + 1))
    for ax in range(2):
        system = ct.LTISystem.create(A, B, d, x_last[ax], H)
        costs = (ct.TrajectoryCost(M=jnp.asarray(Zfull),
                                   p=jnp.asarray(ref[ax]),
                                   weights=jnp.ones(H + 1)),
                 ct.SimpleControlCost(p=jnp.zeros(H),
                                      weights=jnp.full(H, 1e-6)))
        cons = (ct.TrajectoryConstraint(E=jnp.asarray(Zfull),
                                        f=jnp.asarray(hi[ax])),
                ct.TrajectoryConstraint(E=-jnp.asarray(Zfull),
                                        f=jnp.asarray(-lo[ax])))
        plan = ct.make_control_plan(system, costs, cons)
        exact = solve_qp_native(ct.plan_qp(plan, x_last[ax]))
        assert int(exact.status) == ct.STATUS_SOLVED
        scale = max(1.0, np.abs(np.asarray(exact.x)).max())
        err = np.abs(np.asarray(U, np.float64)[ax].reshape(-1)
                     - np.asarray(exact.x)).max() / scale
        assert err <= 1e-5, f"axis {ax}: stagewise vs oracle {err:.2e}"


def test_footstep_plan_shapes():
    ref, lo, hi = footstep_plan(4, 300, 0.005)
    assert ref.shape == (2, 301)
    assert (hi - lo > 0).all()
    # plan steps forward in x and alternates in y
    assert ref[0, -1] > ref[0, 0]
    assert abs(ref[1]).max() > 0
