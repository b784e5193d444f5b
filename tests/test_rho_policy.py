"""Measured rho policy for fixed-count serving (VERDICT r2 #4).

``auto_rho`` / ``auto_rho_stagewise`` replace the per-config hand-tuned
penalties: they probe the REAL serving step at gm-relative candidates
over a few sampled lanes and gate each against the exact f64 native
oracle.  These tests pin the policy on the two known stall modes:

* config-1 class (saturated tiny-n): the spectral suggestion
  (0.1x gm) stalls at err ~1e-2; the policy must land >= 1x gm.
* headline class at the binding +/-60 bound: anything >= 0.1x gm
  stalls at err >= 1e-2; the policy must land at 0.01x gm.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import copra_tpu as ct
from copra_tpu.autospan import span_matrix
from copra_tpu.plan import auto_rho, make_control_plan, suggest_rho
from copra_tpu.qp.riccati import auto_rho_stagewise, from_mpc

from fixtures import (A, B, D, M, N_MAT, SMALL_N, SMALL_X0, UD, U_LOWER,
                      U_UPPER, WU, WX, XD)


def test_auto_rho_saturated_tiny_n():
    """Config-1 class: tight control bounds, N=10, accurate path with
    3 rounds x 300 iters.  suggest_rho's 0.1x gm is a measured stall
    (err 1.5e-2 at this budget); the probe must climb out of it."""
    N, T = 10, 0.1
    A_ = np.array([[1.0, T], [0.0, 1.0]])
    B_ = np.array([[0.5 * T * T], [T]])
    rng = np.random.default_rng(1)
    x0s = np.array([1.0, 0.0])[None] + rng.normal(scale=[0.3, 0.2],
                                                  size=(16, 2))
    f32 = jnp.float32
    pos_row = np.asarray(span_matrix(np.array([[1.0, 0.0]]), N + 1))
    costs = (ct.TrajectoryCost(M=jnp.asarray(pos_row, f32),
                               p=jnp.zeros(N + 1, f32),
                               weights=jnp.full(N + 1, 10.0, f32)),
             ct.SimpleControlCost(p=jnp.zeros(N, f32),
                                  weights=jnp.full(N, 1e-3, f32)))
    system = ct.LTISystem.create(A_.astype(np.float32),
                                 B_.astype(np.float32),
                                 np.zeros(2, np.float32),
                                 x0s[0].astype(np.float32), N)
    cons = (ct.ControlBoundConstraint.create([-2.0], [2.0]),)
    plan = make_control_plan(system, costs, cons)
    opts = ct.SolverOptions(max_iter=300, early_exit=False, polish=False)
    rho, probe = auto_rho(plan, x0s, opts, seed_center=x0s.mean(0),
                          accurate=True, accurate_rounds=3,
                          probe_lanes=6,
                          candidates=(0.1, 1.0, 3.3), return_probe=True)
    # the spectral suggestion's multiple stalls; the policy escapes it
    assert probe[0.1] > 1e-3
    assert min(probe.values()) < 1e-4
    assert rho > suggest_rho(plan)    # picked ABOVE the spectral value


def test_auto_rho_headline_binding_bound():
    """Headline class at the binding +/-60 bound, 30-iter budget: only
    ~0.01x gm converges; the spectral value (0.1x gm) is a measured
    stall.  (bench.py's old hand constant reproduced by measurement.)"""
    batch, horizon = 12, 100
    T, mass = 0.005, 5.0
    A_ = np.array([[1.0, T], [0.0, 1.0]])
    B_ = np.array([[0.5 * T * T / mass], [T / mass]])
    d_ = np.array([-9.81 / 2.0 * T * T, -9.81 * T])
    rng = np.random.default_rng(0)
    As = np.repeat(np.repeat(A_[None], horizon, 0)[None], batch, 0)
    As += rng.normal(scale=1e-4, size=As.shape)
    Bs = np.repeat(np.repeat(B_[None], horizon, 0)[None], batch, 0)
    ds = np.repeat(np.repeat(d_[None], horizon, 0)[None], batch, 0)
    x0s = np.array([0.0, -1.5])[None] + rng.normal(scale=[0.02, 0.1],
                                                   size=(batch, 2))
    costs = (ct.TargetCost.create(np.eye(2), [0.0, -1.0],
                                  weights=[10.0, 1e4]),
             ct.ControlCost.create([[1.0]], [2.0], weights=[1e-4]))
    cons = (ct.ControlBoundConstraint.create([-60.0], [60.0]),)
    f32 = jnp.float32

    def plan_one(A2, B2, d2, x02):
        return make_control_plan(ct.LTVSystem(A=A2, B=B2, d=d2, x0=x02),
                                 costs, cons)

    plan = jax.jit(jax.vmap(plan_one))(
        jnp.asarray(As, f32), jnp.asarray(Bs, f32), jnp.asarray(ds, f32),
        jnp.asarray(x0s, f32))
    jax.block_until_ready(plan.Q)
    opts = ct.SolverOptions(max_iter=30, early_exit=False, polish=False)
    rho, probe = auto_rho(plan, x0s, opts, seed_center=x0s,
                          accurate=True, accurate_rounds=1, probe_lanes=6,
                          candidates=(0.01, 0.1, 1.0), return_probe=True)
    assert probe[0.1] > 1e-3 and probe[1.0] > 1e-2   # the stall band
    assert probe[0.01] < 1e-4                         # the knee
    assert rho == pytest.approx(0.01 * 10 * suggest_rho(plan), rel=1e-6)


def test_auto_rho_stagewise_picks_converging_penalty():
    """Stagewise serving probe on the fixture system with bounds: the
    chosen rho's gate error must be the probe minimum and solve to the
    1e-5 class at the serving budget."""
    system = ct.LTISystem.create(A, B, D, SMALL_X0, SMALL_N)
    costs = (ct.TargetCost.create(M, XD, weights=WX),
             ct.ControlCost.create(N_MAT, UD, weights=WU))
    cons = (ct.ControlBoundConstraint.create(U_LOWER, U_UPPER),)
    sqp = from_mpc(system, costs, cons)
    opts = ct.SolverOptions(max_iter=60, early_exit=False)
    rho, probe = auto_rho_stagewise(
        sqp, opts, cold_options=opts.replace(max_iter=600),
        candidates=(0.01, 0.1, 1.0), probe_steps=2, drift_scale=0.01,
        return_probe=True)
    assert probe[rho] == min(probe.values())
    assert probe[rho] < 1e-4


def test_auto_iters_stagewise_measured_budget():
    """Iteration-budget policy (VERDICT r3 #4): the probe measures the
    APPLIED-control error per candidate and returns the smallest budget
    meeting the target — monotone Pareto, honest fallback."""
    from copra_tpu.qp.riccati import auto_iters_stagewise

    system = ct.LTISystem.create(A, B, D, SMALL_X0, SMALL_N)
    costs = (ct.TargetCost.create(M, XD, weights=WX),
             ct.ControlCost.create(N_MAT, UD, weights=WU))
    cons = (ct.ControlBoundConstraint.create(U_LOWER, U_UPPER),)
    sqp = from_mpc(system, costs, cons)
    opts = ct.SolverOptions(max_iter=60, early_exit=False, rho=0.1)
    iters, probe = auto_iters_stagewise(
        sqp, opts, cold_options=opts.replace(max_iter=600),
        candidates=(5, 40, 160), probe_steps=2, drift_scale=0.01,
        target_applied_err=1e-5, return_probe=True)
    assert set(probe) == {5, 40, 160}
    for e in probe.values():
        assert e["applied_err"] <= e["tail_err"] + 1e-15
    # more iterations must not be (meaningfully) worse at the knee
    assert probe[160]["applied_err"] <= probe[5]["applied_err"] + 1e-9
    if probe[iters]["applied_err"] > 1e-5:
        # fallback: nothing met the target -> argmin applied_err
        assert probe[iters]["applied_err"] == min(
            e["applied_err"] for e in probe.values())
    else:
        smaller = [c for c in probe if c < iters]
        assert all(probe[c]["applied_err"] > 1e-5 for c in smaller)
