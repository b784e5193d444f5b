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
