"""Control plans: the precompiled receding-horizon path must be EXACT vs
the per-tick rebuild (the affine extraction is algebra, not approximation).
"""

import jax
import jax.numpy as jnp
import numpy as np

import copra_tpu as ct
from copra_tpu.plan import (make_control_plan, make_plan_step, plan_qp,
                            plan_trajectory)

from fixtures import (A, B, D, GOLDEN_CONTROL, INEQ_E, INEQ_G, INEQ_H,
                      INEQ_P, M, N_MAT, SMALL_N, SMALL_X0, UD, U_LOWER,
                      U_UPPER, WU, WX, XD, X_LOWER, X_UPPER)


def full_setup():
    system = ct.LTISystem.create(A, B, D, SMALL_X0, SMALL_N)
    costs = (ct.TargetCost.create(M, XD, weights=WX),
             ct.ControlCost.create(N_MAT, UD, weights=WU))
    constraints = (ct.TrajectoryConstraint.create(INEQ_E, INEQ_P),
                   ct.ControlConstraint.create(INEQ_G, INEQ_H),
                   ct.TrajectoryBoundConstraint.create(X_LOWER, X_UPPER),
                   ct.ControlBoundConstraint.create(U_LOWER, U_UPPER))
    return system, costs, constraints


def test_plan_qp_matches_full_build_all_constraint_kinds():
    system, costs, constraints = full_setup()
    plan = make_control_plan(system, costs, constraints)
    preview = ct.condense(system)
    for x0 in (SMALL_X0, np.array([0.3, -2.0]), np.array([-1.0, 0.5])):
        x0 = jnp.asarray(x0)
        ref = ct.build_qp(preview, x0, costs, constraints)
        got = plan_qp(plan, x0)
        np.testing.assert_allclose(np.asarray(got.c), np.asarray(ref.c),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(got.bineq),
                                   np.asarray(ref.bineq), atol=1e-12)
        np.testing.assert_allclose(np.asarray(got.Q), np.asarray(ref.Q),
                                   atol=0)
        np.testing.assert_allclose(np.asarray(got.lb), np.asarray(ref.lb))


def test_plan_step_box_fast_path_golden():
    system = ct.LTISystem.create(A, B, D, SMALL_X0, SMALL_N)
    costs = (ct.TargetCost.create(M, XD, weights=WX),
             ct.ControlCost.create(N_MAT, UD, weights=WU))
    constraints = (ct.ControlBoundConstraint.create(U_LOWER, U_UPPER),)
    plan = make_control_plan(system, costs, constraints)
    step = make_plan_step(plan, ct.SolverOptions(max_iter=2000))
    U, sol, warm = step(jnp.asarray(SMALL_X0), None)
    ref = ct.solve_mpc(system, costs, constraints,
                       ct.SolverOptions(max_iter=20000))
    np.testing.assert_allclose(np.asarray(U), np.asarray(ref.control),
                               atol=5e-4)
    # a warm re-step converges further toward the golden optimum
    U2, _, _ = step(jnp.asarray(SMALL_X0), warm)
    e1 = np.abs(np.asarray(U) - GOLDEN_CONTROL).max()
    e2 = np.abs(np.asarray(U2) - GOLDEN_CONTROL).max()
    assert e2 <= e1 + 1e-9
    # fixed-iteration path without polish: first-order accuracy only (the
    # polished golden contract is covered by test_mpc_golden)
    assert e2 <= 5e-4


def test_plan_step_general_path_matches_solve_mpc():
    system, costs, constraints = full_setup()
    plan = make_control_plan(system, costs, constraints)
    step = make_plan_step(plan, ct.SolverOptions(max_iter=3000))
    U, sol, _ = step(jnp.asarray(SMALL_X0), None)
    ref = ct.solve_mpc(system, costs, constraints,
                       ct.SolverOptions(max_iter=3000))
    np.testing.assert_allclose(np.asarray(U), np.asarray(ref.control),
                               atol=1e-6)
    X = plan_trajectory(plan, jnp.asarray(SMALL_X0), U)
    assert float(ct.replay_dynamics(system, X, U)) <= 1e-10


def test_plan_step_batched_fleet():
    system = ct.LTISystem.create(A, B, D, SMALL_X0, SMALL_N)
    costs = (ct.TargetCost.create(M, XD, weights=WX),
             ct.ControlCost.create(N_MAT, UD, weights=WU))
    constraints = (ct.ControlBoundConstraint.create(U_LOWER, U_UPPER),)
    plan = make_control_plan(system, costs, constraints)
    step = make_plan_step(plan, ct.SolverOptions(max_iter=1500),
                          batched=True)
    batch = 8
    rng = np.random.default_rng(0)
    x0s = SMALL_X0[None] + rng.normal(scale=[0.02, 0.1], size=(batch, 2))
    U, sol, warm = step(plan, jnp.asarray(x0s), None)
    assert U.shape == (batch, SMALL_N)
    # lane solved individually matches
    U1, _, _ = make_plan_step(plan, ct.SolverOptions(max_iter=1500))(
        jnp.asarray(x0s[3]), None)
    np.testing.assert_allclose(np.asarray(U[3]), np.asarray(U1), atol=1e-7)


def test_plan_step_fused_matches_xla_step():
    """use_fused=True (Pallas, interpret on CPU) == the XLA fast path."""
    system = ct.LTISystem.create(A.astype(np.float32), B.astype(np.float32),
                                 D.astype(np.float32),
                                 SMALL_X0.astype(np.float32), SMALL_N)
    costs = (ct.TargetCost.create(M.astype(np.float32),
                                  XD.astype(np.float32),
                                  weights=WX.astype(np.float32)),
             ct.ControlCost.create(N_MAT.astype(np.float32),
                                   UD.astype(np.float32),
                                   weights=WU.astype(np.float32)))
    constraints = (ct.ControlBoundConstraint.create(
        U_LOWER.astype(np.float32), U_UPPER.astype(np.float32)),)
    batch = 4
    rng = np.random.default_rng(1)
    x0s = (SMALL_X0[None] + rng.normal(scale=[0.02, 0.1], size=(batch, 2))
           ).astype(np.float32)

    plan = jax.jit(jax.vmap(lambda x0: make_control_plan(
        system.with_x0(x0), costs, constraints)))(jnp.asarray(x0s))
    opts = ct.SolverOptions(max_iter=400)
    step_xla = make_plan_step(plan, opts, batched=True, use_fused=False)
    step_fus = make_plan_step(plan, opts, batched=True, use_fused=True)
    U1, _, _ = step_xla(plan, jnp.asarray(x0s), None)
    U2, _, _ = step_fus(plan, jnp.asarray(x0s), None)
    np.testing.assert_allclose(np.asarray(U1), np.asarray(U2),
                               rtol=2e-4, atol=2e-4)


def test_plan_step_fused_shared_plan_matches_xla_step():
    """SHARED plan + use_fused=True routes through the two-stream
    shared-operator kernel (rank-2 operators, no [B,n,n] broadcast) and
    matches the XLA fast path."""
    system = ct.LTISystem.create(A.astype(np.float32), B.astype(np.float32),
                                 D.astype(np.float32),
                                 SMALL_X0.astype(np.float32), SMALL_N)
    costs = (ct.TargetCost.create(M.astype(np.float32),
                                  XD.astype(np.float32),
                                  weights=WX.astype(np.float32)),
             ct.ControlCost.create(N_MAT.astype(np.float32),
                                   UD.astype(np.float32),
                                   weights=WU.astype(np.float32)))
    constraints = (ct.ControlBoundConstraint.create(
        U_LOWER.astype(np.float32), U_UPPER.astype(np.float32)),)
    batch = 5
    rng = np.random.default_rng(3)
    x0s = (SMALL_X0[None] + rng.normal(scale=[0.02, 0.1], size=(batch, 2))
           ).astype(np.float32)
    plan = make_control_plan(system, costs, constraints)   # ONE shared plan
    opts = ct.SolverOptions(max_iter=400)
    step_xla = make_plan_step(plan, opts, batched=True, use_fused=False)
    step_fus = make_plan_step(plan, opts, batched=True, use_fused=True)
    U1, sol1, _ = step_xla(plan, jnp.asarray(x0s), None)
    U2, sol2, _ = step_fus(plan, jnp.asarray(x0s), None)
    np.testing.assert_allclose(np.asarray(U1), np.asarray(U2),
                               rtol=2e-4, atol=2e-4)
    assert (np.asarray(sol2.status) == np.asarray(sol1.status)).all()


def test_f64_on_tpu_backend_warns():
    """The config-2 trap: an f64 serving plan on a TPU backend warns
    (f64 is emulated there; measured 8x on the general path)."""
    import warnings
    from copra_tpu.plan import warn_if_emulated_f64

    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        fired = warn_if_emulated_f64(jnp.float64, "test", backend="tpu")
        assert fired and rec and "emulated" in str(rec[-1].message)
        assert not warn_if_emulated_f64(jnp.float32, "test", backend="tpu")
        assert not warn_if_emulated_f64(jnp.float64, "test", backend="cpu")


def test_plan_step_general_shared_fused_matches_xla():
    """SHARED general plan + use_fused=True routes through the shared
    general Pallas kernel (Kinv/K/C/rho VMEM-resident, lane-blocked MXU
    GEMMs) and matches the vmapped XLA path lane for lane."""
    system, costs, constraints = full_setup()
    system = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32) if hasattr(a, "astype") else a,
        system)
    costs = tuple(jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32), c) for c in costs)
    constraints = tuple(jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32), c) for c in constraints)
    batch = 5
    rng = np.random.default_rng(4)
    x0s = (SMALL_X0[None] + rng.normal(scale=[0.02, 0.1], size=(batch, 2))
           ).astype(np.float32)
    plan = make_control_plan(system, costs, constraints)  # ONE shared plan
    opts = ct.SolverOptions(max_iter=300, polish=False)
    step_xla = make_plan_step(plan, opts, batched=True, use_fused=False,
                              seed_center=x0s.mean(0))
    step_fus = make_plan_step(plan, opts, batched=True, use_fused=True,
                              seed_center=x0s.mean(0))
    warm1 = warm2 = None
    for t in range(2):
        x0t = jnp.asarray(x0s + 0.01 * t)
        U1, sol1, warm1 = step_xla(plan, x0t, warm1)
        U2, sol2, warm2 = step_fus(plan, x0t, warm2)
    np.testing.assert_allclose(np.asarray(U2), np.asarray(U1),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(sol2.dual_residual),
                               np.asarray(sol1.dual_residual),
                               rtol=1e-2, atol=1e-5)
    assert (np.asarray(sol2.status) == np.asarray(sol1.status)).all()


def test_plan_step_general_batched():
    """Batched general-constraint plan step vs per-lane solve_qp."""
    system, costs, constraints = full_setup()
    batch = 4
    rng = np.random.default_rng(2)
    x0s = SMALL_X0[None] + rng.normal(scale=[0.02, 0.1], size=(batch, 2))
    plan = jax.jit(jax.vmap(lambda x0: make_control_plan(
        system.with_x0(x0), costs, constraints)))(jnp.asarray(x0s))
    step = make_plan_step(plan, ct.SolverOptions(max_iter=3000),
                          batched=True)
    U, sol, warm = step(plan, jnp.asarray(x0s), None)
    assert U.shape == (batch, SMALL_N)
    for b in (0, 3):
        ref = ct.solve_mpc(system.with_x0(jnp.asarray(x0s[b])), costs,
                           constraints, ct.SolverOptions(max_iter=6000))
        np.testing.assert_allclose(np.asarray(U[b]),
                                   np.asarray(ref.control), atol=2e-5)
    # warm (dual-carrying) re-step stays consistent
    U2, _, _ = step(plan, jnp.asarray(x0s), warm)
    np.testing.assert_allclose(np.asarray(U2), np.asarray(U), atol=1e-4)


def test_plan_step_bipedal_zmp_config():
    """The N=300 ZMP preview config (BASELINE config 5) through the
    general plan fast path: one-time prep, per-tick iterations only."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "examples"))
    from bipedal_walking import footstep_plan, lipm_system
    from copra_tpu.autospan import span_matrix

    horizon, T = 300, 0.005
    A, B, d, zmp_row = lipm_system(T, 0.8)
    ref, lo, hi = footstep_plan(4, horizon, T)
    Zfull = np.asarray(span_matrix(zmp_row, horizon + 1))
    system = ct.LTISystem.create(A, B, d, np.zeros(3), horizon)
    costs = (ct.TrajectoryCost(M=jnp.asarray(Zfull), p=jnp.asarray(ref[0]),
                               weights=jnp.full(horizon + 1, 1.0)),
             ct.SimpleControlCost(p=jnp.zeros(horizon),
                                  weights=jnp.full(horizon, 1e-6)))
    constraints = (ct.TrajectoryConstraint(E=jnp.asarray(Zfull),
                                           f=jnp.asarray(hi[0])),
                   ct.TrajectoryConstraint(E=jnp.asarray(-Zfull),
                                           f=jnp.asarray(-lo[0])))
    plan = make_control_plan(system, costs, constraints)
    # row normalization (qp.admm) makes 2000 iterations plenty here
    step = make_plan_step(plan, ct.SolverOptions(max_iter=2000))
    U, sol, _ = step(jnp.zeros(3), None)
    X = plan_trajectory(plan, jnp.zeros(3), U)
    zmp = np.asarray(Zfull @ X)
    assert (zmp <= hi[0] + 1e-5).all()
    assert (zmp >= lo[0] - 1e-5).all()
    assert float(ct.replay_dynamics(system, X, U)) <= 1e-8


def test_plan_step_general_polish_option():
    """options.polish on the general plan path recovers active-set
    accuracy after moderate iterations."""
    system, costs, constraints = full_setup()
    plan = make_control_plan(system, costs, constraints)
    step = make_plan_step(plan, ct.SolverOptions(max_iter=800, polish=True))
    U, sol, _ = step(jnp.asarray(SMALL_X0), None)
    ref = ct.solve_mpc(system, costs, constraints,
                       ct.SolverOptions(max_iter=20000))
    np.testing.assert_allclose(np.asarray(U), np.asarray(ref.control),
                               atol=2e-5)


def test_lmpc_as_plan():
    """LMPC.as_plan(): the facade's registry freezes into a serving plan
    that reproduces controller.solve()."""
    system, costs, constraints = full_setup()
    controller = ct.LMPC(system, options=ct.SolverOptions(max_iter=3000))
    for c in costs:
        controller.add_cost(c)
    for c in constraints:
        controller.add_constraint(c)
    assert controller.solve()
    plan, step = controller.as_plan()
    U, sol, _ = step(jnp.asarray(SMALL_X0), None)
    np.testing.assert_allclose(np.asarray(U),
                               np.asarray(controller.control()), atol=1e-5)


def test_plan_step_with_equality_rows():
    """Equality rows through the general plan fast path (rho_eq boost +
    affine beq): pins the position like the reference EqSystem."""
    from fixtures import EQ_E, EQ_P, EQ_X0
    system = ct.LTISystem.create(A, B, D, EQ_X0, 40)
    costs = (ct.TargetCost.create(M, np.zeros(2), weights=WX),
             ct.ControlCost.create(N_MAT, UD, weights=WU))
    constraints = (ct.TrajectoryConstraint.create(EQ_E, EQ_P,
                                                  is_inequality=False),)
    plan = make_control_plan(system, costs, constraints)
    step = make_plan_step(plan, ct.SolverOptions(max_iter=4000,
                                                 polish=True))
    U, sol, _ = step(jnp.asarray(EQ_X0), None)
    X = plan_trajectory(plan, jnp.asarray(EQ_X0), U)
    pos = np.asarray(X)[0::2]
    assert np.abs(pos).max() <= 1e-6
    # oracle: the exact native solution (a slightly-violating first-order
    # answer can differ wildly in U because the raw eq rows have ~1e-5
    # norms — the very pathology row normalization removes)
    from copra_tpu.qp.native import solve_qp_native
    exact = solve_qp_native(plan_qp(plan, jnp.asarray(EQ_X0)))
    np.testing.assert_allclose(np.asarray(U), np.asarray(exact.x),
                               atol=1e-4)


def _ltv_fleet(batch=4, horizon=40, seed=0):
    """Miniature of the headline bench workload (randomized LTV fleet)."""
    T, mass = 0.005, 5.0
    Ad = np.array([[1.0, T], [0.0, 1.0]])
    Bd = np.array([[0.5 * T * T / mass], [T / mass]])
    dd = np.array([-9.81 / 2 * T * T, -9.81 * T])
    rng = np.random.default_rng(seed)
    As = np.repeat(np.repeat(Ad[None], horizon, 0)[None], batch, 0)
    As += rng.normal(scale=1e-4, size=As.shape)
    Bs = np.repeat(np.repeat(Bd[None], horizon, 0)[None], batch, 0)
    ds = np.repeat(np.repeat(dd[None], horizon, 0)[None], batch, 0)
    x0s = np.array([0.0, -1.5])[None] + rng.normal(scale=[0.02, 0.1],
                                                   size=(batch, 2))
    costs = (ct.TargetCost.create(np.eye(2), [0.0, -1.0],
                                  weights=[10.0, 1e4]),
             ct.ControlCost.create([[1.0]], [2.0], weights=[1e-4]))
    return As, Bs, ds, x0s, costs


def _exact_box(plan, lane, x0_lane):
    """Exact f64 solution of the f32-data QP (native oracle, f64 c)."""
    from copra_tpu.qp.native import solve_qp_native
    n = plan.Q.shape[-1]
    Q64 = np.asarray(plan.Q[lane], np.float64)
    c64 = (np.asarray(plan.c0[lane], np.float64)
           + np.asarray(x0_lane, np.float64)
           @ np.asarray(plan.Cmap[lane], np.float64))
    sol = solve_qp_native(ct.DenseQP(
        Q=Q64, c=c64, Aeq=np.zeros((0, n)), beq=np.zeros((0,)),
        Aineq=np.zeros((0, n)), bineq=np.zeros((0,)),
        lb=np.asarray(plan.lb[lane], np.float64),
        ub=np.asarray(plan.ub[lane], np.float64)))
    return np.asarray(sol.x)


def test_accurate_step_f64_exact_unsaturated():
    """accurate=True: f64-exact ticks when no bound activates (~1e-9)."""
    from copra_tpu.qp.native import native_available
    from copra_tpu.plan import suggest_rho
    if not native_available():
        import pytest
        pytest.skip("native solver unavailable")
    As, Bs, ds, x0s, costs = _ltv_fleet()
    constraints = (ct.ControlBoundConstraint.create([-300.0], [300.0]),)
    f32 = jnp.float32
    plan = jax.jit(jax.vmap(lambda a, b, dd_, x0: make_control_plan(
        ct.LTVSystem(A=a, B=b, d=dd_, x0=x0), costs, constraints)))(
        jnp.asarray(As, f32), jnp.asarray(Bs, f32), jnp.asarray(ds, f32),
        jnp.asarray(x0s, f32))
    opts = ct.SolverOptions(max_iter=30, rho=suggest_rho(plan))
    step = make_plan_step(plan, opts, batched=True, seed_center=x0s,
                          accurate=True)
    warm = None
    x032 = jnp.asarray(x0s.astype(np.float32))
    for _ in range(2):
        U, sol, warm = step(plan, x032, warm)
    assert U.dtype == jnp.float64
    assert int((np.asarray(sol.status) == 0).sum()) == 4
    for lane in range(4):
        ex = _exact_box(plan, lane, np.asarray(x032)[lane])
        # 1e-8: far inside the 1e-5 baseline contract; an f32 pipeline
        # that rounds c sits at ~1e-2 on this problem class
        assert np.abs(np.asarray(U[lane]) - ex).max() < 1e-8


def test_accurate_step_saturated_refinement():
    """Saturated lanes reach <=1e-5 via composite-level refinement rounds;
    a starved budget honestly reports non-convergence."""
    from copra_tpu.qp.native import native_available
    from copra_tpu.plan import suggest_rho
    if not native_available():
        import pytest
        pytest.skip("native solver unavailable")
    As, Bs, ds, x0s, costs = _ltv_fleet(horizon=40)
    # tight box around the hover control: most coords saturate
    constraints = (ct.ControlBoundConstraint.create([45.0], [50.5]),)
    f32 = jnp.float32
    plan = jax.jit(jax.vmap(lambda a, b, dd_, x0: make_control_plan(
        ct.LTVSystem(A=a, B=b, d=dd_, x0=x0), costs, constraints)))(
        jnp.asarray(As, f32), jnp.asarray(Bs, f32), jnp.asarray(ds, f32),
        jnp.asarray(x0s, f32))
    rho = suggest_rho(plan)
    x032 = jnp.asarray(x0s.astype(np.float32))
    step = make_plan_step(plan,
                          ct.SolverOptions(max_iter=100, rho=rho),
                          batched=True, seed_center=x0s, accurate=True,
                          accurate_rounds=2)
    warm = None
    for _ in range(2):
        U, sol, warm = step(plan, x032, warm)
    n_sat = 0
    for lane in range(4):
        ex = _exact_box(plan, lane, np.asarray(x032)[lane])
        n_sat += int((ex >= 50.5 - 1e-9).sum() + (ex <= 45.0 + 1e-9).sum())
        assert np.abs(np.asarray(U[lane]) - ex).max() < 1e-5
    assert n_sat > 20   # the stress case genuinely saturates
    # starved budget: honest non-converged status, nonzero dual residual.
    # AT the per-lane seed center a 1-iteration budget already delivers
    # the exact solution (seed + snap; measured true err ~5e-11), and the
    # KKT-based status rightly reports converged — so the starvation
    # probe must move x0 AWAY from the center, where one iteration
    # genuinely cannot resolve the changed active set.
    step1 = make_plan_step(plan,
                           ct.SolverOptions(max_iter=1, rho=rho,
                                            eps_abs=1e-9, eps_rel=0.0),
                           batched=True, seed_center=x0s, accurate=True,
                           accurate_rounds=1)
    x0_far = x032 + jnp.asarray([0.5, 0.5], jnp.float32)
    U1, sol1, _ = step1(plan, x0_far, None)
    assert (np.asarray(sol1.status) != 0).any()
    assert np.asarray(sol1.dual_residual).max() > 0.0
    # and the flagged lanes are genuinely wrong, not criterion noise
    lane = int(sol1.failed_lanes(1)[0])
    ex = _exact_box(plan, lane, np.asarray(x0_far)[lane])
    assert np.abs(np.asarray(U1[lane]) - ex).max() > 1e-4


def test_plan_multistep_matches_per_tick_loop():
    """make_plan_multistep: T exogenous-stream ticks in ONE dispatch ==
    the per-tick accurate path, tick for tick (incl. warm threading)."""
    from copra_tpu.plan import make_plan_multistep

    system = ct.LTISystem.create(A.astype(np.float32), B.astype(np.float32),
                                 D.astype(np.float32),
                                 SMALL_X0.astype(np.float32), SMALL_N)
    costs = (ct.TargetCost.create(M.astype(np.float32),
                                  XD.astype(np.float32),
                                  weights=WX.astype(np.float32)),
             ct.ControlCost.create(N_MAT.astype(np.float32),
                                   UD.astype(np.float32),
                                   weights=WU.astype(np.float32)))
    constraints = (ct.ControlBoundConstraint.create(
        U_LOWER.astype(np.float32), U_UPPER.astype(np.float32)),)
    batch, T = 4, 3
    rng = np.random.default_rng(5)
    x0s = (SMALL_X0[None] + rng.normal(scale=[0.02, 0.1], size=(batch, 2))
           ).astype(np.float32)
    x0_seq = jnp.asarray(
        x0s[None] + rng.normal(scale=0.01, size=(T, batch, 2))
        .astype(np.float32).cumsum(0))
    plan = jax.vmap(lambda x0: make_control_plan(
        system.with_x0(x0), costs, constraints))(jnp.asarray(x0s))
    opts = ct.SolverOptions(max_iter=60)

    step_many = make_plan_multistep(plan, opts, seed_center=x0s,
                                    accurate_rounds=2)
    us, statuses, rds, warm = step_many(x0_seq)
    assert us.shape == (T, batch, SMALL_N)

    step = make_plan_step(plan, opts, batched=True, seed_center=x0s,
                          accurate=True, accurate_rounds=2)
    w = None
    for t in range(T):
        u_t, sol_t, w = step(plan, x0_seq[t], w)
        np.testing.assert_allclose(np.asarray(us[t]), np.asarray(u_t),
                                   atol=1e-12)
        assert (np.asarray(statuses[t])
                == np.asarray(sol_t.status)).all()
    for a, b in zip(jax.tree_util.tree_leaves(warm),
                    jax.tree_util.tree_leaves(w)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-12)
