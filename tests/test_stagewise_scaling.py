"""Stagewise diagonal equilibration (the Ruiz analog for the Riccati
engine, SURVEY.md §7.3 hard-part 1).

Badly-scaled robot MPC (forces O(100 N) vs states O(0.1)) stalls ADMM:
measured on the config-6 quadruped, 60k f64 iterations reach only
1.5e-3 unscaled while the curvature-equilibrated problem converges in
~100.  These tests pin (a) the exactness of the reparametrization,
(b) the convergence win on the ill-scaled class, and (c) the serving
facades' original-units contract under ``scaling="auto"``.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import copra_tpu as ct
from copra_tpu.qp.riccati import (StagewiseQP, make_stagewise_multistep,
                                  make_stagewise_step, scale_stagewise,
                                  solve_stagewise, stagewise_scales)


def _ill_scaled_sqp(N=12, x=4, u=2):
    """Point-mass-with-forces class: control in Newtons (O(100)), state
    in meters (O(0.1)) — the quadruped scaling pathology, small."""
    dt, m = 0.02, 20.0
    A1 = np.eye(4)
    A1[0, 2] = A1[1, 3] = dt
    B1 = np.zeros((4, 2))
    B1[2, 0] = B1[3, 1] = dt / m
    w = np.array([100.0, 100.0, 5.0, 5.0])
    Qx = np.repeat(np.diag(w)[None], N + 1, 0)
    qx = np.repeat((-w * np.array([0.1, -0.05, 0.0, 0.0]))[None], N + 1, 0)
    return StagewiseQP(
        A=jnp.asarray(np.repeat(A1[None], N, 0)),
        B=jnp.asarray(np.repeat(B1[None], N, 0)),
        d=jnp.zeros((N, 4)),
        Qx=jnp.asarray(Qx), qx=jnp.asarray(qx),
        Ru=jnp.asarray(np.repeat((1e-5 * np.eye(2))[None], N, 0)),
        ru=jnp.zeros((N, 2)),
        x0=jnp.asarray([0.0, 0.0, 0.2, -0.1]),
        xlb=jnp.full((N + 1, 4), -0.5), xub=jnp.full((N + 1, 4), 0.5),
        ulb=jnp.full((N, 2), -120.0), uub=jnp.full((N, 2), 120.0),
        Cx=None, Cu=None, clo=None, chi=None)


def test_scale_roundtrip_exact():
    """Solving the scaled problem and mapping back equals solving the
    raw problem to high accuracy (exact reparametrization)."""
    sqp = _ill_scaled_sqp()
    Dx, Du = stagewise_scales(sqp)
    assert float(jnp.max(Du)) > 10.0       # force coordinates detected
    sqp_s = scale_stagewise(sqp, Dx, Du)
    opts = ct.SolverOptions(max_iter=60000, early_exit=True,
                            eps_abs=1e-11, eps_rel=0.0)
    X0, U0, i0 = solve_stagewise(sqp, opts)
    X1, U1, i1 = solve_stagewise(sqp_s, opts)
    np.testing.assert_allclose(np.asarray(U1) * np.asarray(Du),
                               np.asarray(U0), atol=2e-5)
    np.testing.assert_allclose(np.asarray(X1) * np.asarray(Dx),
                               np.asarray(X0), atol=2e-5)


def test_scaling_fixes_ill_conditioned_convergence():
    """At a fixed small budget the scaled problem converges and the raw
    problem does not — the real config-6 quadruped workload (x=12,
    u=12 forces O(100 N), r=12 friction rows), reduced horizon."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench_all import _srb_quadruped
    sqp = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float64)
        if jnp.issubdtype(a.dtype, jnp.floating) else a,
        _srb_quadruped(N=16))
    Dx, Du = stagewise_scales(sqp)
    assert float(jnp.max(Du)) > 10.0       # force coordinates detected
    sqp_s = scale_stagewise(sqp, Dx, Du)
    opts = ct.SolverOptions(max_iter=800, early_exit=True,
                            eps_abs=1e-8, eps_rel=0.0)
    _, _, i_raw = solve_stagewise(sqp, opts)
    _, _, i_scaled = solve_stagewise(sqp_s, opts)
    assert int(i_scaled.status) == 0
    assert int(i_scaled.iterations) < int(i_raw.iterations)
    assert int(i_raw.status) != 0          # raw stalls at this budget


@pytest.mark.parametrize("backend", ["xla", "fused"])
def test_step_facade_scaling_original_units(backend):
    """make_stagewise_step(scaling='auto') takes/returns ORIGINAL units
    and converges where the unscaled facade cannot."""
    sqp = _ill_scaled_sqp()
    sqp_b = jax.tree_util.tree_map(lambda a: jnp.stack([a, a]), sqp)
    sqp_b = dataclasses.replace(
        sqp_b, x0=sqp_b.x0 + jnp.asarray([[0.0] * 4, [0.01] * 4]))
    opts = ct.SolverOptions(max_iter=60, early_exit=False)
    tick = make_stagewise_step(sqp_b, opts,
                               cold_options=opts.replace(max_iter=600),
                               backend=backend, scaling="auto")
    X, U, info, warm = tick(sqp_b.x0)
    # original units: forces O(10-100), states O(0.1)
    assert float(jnp.max(jnp.abs(U))) > 5.0
    assert float(jnp.max(jnp.abs(X))) < 1.0
    assert info.x.shape == (2, sqp.horizon * sqp.udim)
    np.testing.assert_allclose(np.asarray(info.x),
                               np.asarray(U).reshape(2, -1), atol=0)
    # dynamics replay in original units (reference contract <= 1e-10;
    # f32 data -> 1e-4 class here)
    Xs, Us = np.asarray(X[0]), np.asarray(U[0])
    A0, B0 = np.asarray(sqp.A[0]), np.asarray(sqp.B[0])
    for k in range(3):
        err = Xs[k + 1] - A0 @ Xs[k] - B0 @ Us[k]
        assert np.abs(err).max() < 1e-5
    # warm tick from the carried (scaled-space) tuple
    X2, U2, info2, _ = tick(sqp_b.x0 + 0.005, warm)
    assert U2.shape == U.shape
    # vs the f64 exact solution of lane 0 at the same state
    s64 = jax.tree_util.tree_map(
        lambda a: a[0].astype(jnp.float64) if jnp.issubdtype(
            a.dtype, jnp.floating) else a[0], sqp_b)
    s64 = dataclasses.replace(s64, x0=(sqp_b.x0[0] + 0.005).astype(
        jnp.float64))
    Dx, Du = stagewise_scales(s64)
    oo = ct.SolverOptions(max_iter=40000, early_exit=True,
                          eps_abs=1e-11, eps_rel=0.0)
    _, Ue, _ = solve_stagewise(scale_stagewise(s64, Dx, Du), oo)
    Ue = np.asarray(Ue) * np.asarray(Du)
    assert np.abs(np.asarray(U2[0]) - Ue).max() < 1e-3


def test_multistep_facade_scaling_consistent_rollout():
    """make_stagewise_multistep(scaling='auto'): the returned rollout is
    consistent in ORIGINAL units — states[k+1] == plant(states[k],
    U0s[k]) — and the chain converges."""
    sqp = _ill_scaled_sqp()
    sqp_b = jax.tree_util.tree_map(lambda a: jnp.stack([a, a]), sqp)
    opts = ct.SolverOptions(max_iter=60, early_exit=False)
    step_many = make_stagewise_multistep(
        sqp_b, opts, cold_options=opts.replace(max_iter=600),
        backend="xla", scaling="auto")
    states, u0s, statuses, info, warm = step_many(sqp_b.x0, 3)
    A0, B0 = np.asarray(sqp.A[0]), np.asarray(sqp.B[0])
    S, Us = np.asarray(states), np.asarray(u0s)
    assert S.shape[0] == Us.shape[0] + 1
    for k in range(Us.shape[0]):
        pred = S[k] @ A0.T + Us[k] @ B0.T
        np.testing.assert_allclose(S[k + 1], pred, atol=1e-5)
    assert np.all(np.asarray(statuses)[-1] == 0)
