"""Serving through a MODEL SWAP (VERDICT r3 weak #6).

The reference's domain swaps models mid-flight routinely (footstep
replan, gait switch).  Serving plans precompute model-dependent
operators, so a swap costs one plan rebuild — these tests pin the
supported pattern: rebuild the facade with the SAME options (the
measured rho transfers across a small model change — no re-probe) and
carry the warm tuple through, so the first post-swap tick starts from
the old active set and still converges within the warm budget.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import copra_tpu as ct
from copra_tpu.autospan import span_matrix
from copra_tpu.qp.native import native_available, solve_qp_native
from copra_tpu.qp.riccati import from_mpc, make_stagewise_step

F32 = jnp.float32


def _zmp_fleet(ref_shift=0.0, N=50, T=0.02, h=0.8, lanes=2):
    """Small ZMP preview problem; ``ref_shift`` moves the footstep plan
    (the model swap: new reference AND new polygon rows)."""
    A = np.array([[1.0, T, T * T / 2], [0.0, 1.0, T], [0.0, 0.0, 1.0]])
    B = np.array([[T ** 3 / 6], [T * T / 2], [T]])
    zrow = np.array([[1.0, 0.0, -h / 9.81]])
    Z = np.asarray(span_matrix(zrow, N + 1))
    per = max(N // 3, 1)
    ref = np.array([0.15 * min(k // per, 2) + ref_shift
                    for k in range(N + 1)])
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
                                    f=jnp.asarray(ref + 0.06, F32)),
            ct.TrajectoryConstraint(E=jnp.asarray(-Z, F32),
                                    f=jnp.asarray(-(ref - 0.06), F32)))
    sqp = from_mpc(system, costs, cons)
    sqp_b = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (lanes,) + a.shape), sqp)
    return sqp_b, (system, costs, cons, ref)


def test_stagewise_warm_survives_footstep_replan():
    """Swap the footstep plan after two ticks; the first post-swap tick
    carries the old warm tuple and must converge within the warm
    budget and match the new model's exact oracle."""
    opts = ct.SolverOptions(max_iter=4000, eps_abs=1e-9, eps_rel=0.0,
                            early_exit=False, rho=1.0)
    sqp_a, _ = _zmp_fleet(0.0)
    tick_a = make_stagewise_step(sqp_a, opts, backend="xla")
    x0 = jnp.zeros((2, 3), F32)
    X, U, info, warm = tick_a(x0)
    X, U, info, warm = tick_a(X[:, 1], warm)
    assert (np.asarray(info.status) == ct.STATUS_SOLVED).all()

    # footstep replan: rebuild the facade, SAME options, carry warm
    sqp_b, (system_b, costs_b, cons_b, _) = _zmp_fleet(0.02)
    tick_b = make_stagewise_step(sqp_b, opts, backend="xla")
    x_swap = X[:, 1]
    Xb, Ub, info_b, warm_b = tick_b(x_swap, warm)
    assert (np.asarray(info_b.status) == ct.STATUS_SOLVED).all(), \
        f"post-swap tick did not converge: {np.asarray(info_b.status)}"

    if not native_available():                       # pragma: no cover
        return
    x_used = np.asarray(x_swap, np.float64)
    sysd = dataclasses.replace(system_b,
                               x0=jnp.asarray(x_used[0], F32))
    plan = ct.make_control_plan(sysd, costs_b, cons_b)
    exact = solve_qp_native(ct.plan_qp(plan, x_used[0]))
    assert int(exact.status) == ct.STATUS_SOLVED
    scale = max(1.0, np.abs(np.asarray(exact.x)).max())
    err = np.abs(np.asarray(Ub, np.float64)[0].ravel()
                 - np.asarray(exact.x)).max() / scale
    assert err <= 1e-5, f"post-swap vs oracle: {err:.2e}"


def test_stagewise_swap_matches_cold_rebuild():
    """The warm-carried post-swap solution equals a cold solve of the
    new model (same options) — the carry is a speedup, not a bias."""
    opts = ct.SolverOptions(max_iter=4000, eps_abs=1e-9, eps_rel=0.0,
                            early_exit=False, rho=1.0)
    sqp_a, _ = _zmp_fleet(0.0)
    tick_a = make_stagewise_step(sqp_a, opts, backend="xla")
    x0 = jnp.zeros((2, 3), F32)
    X, U, info, warm = tick_a(x0)

    sqp_b, _ = _zmp_fleet(0.03)
    tick_b = make_stagewise_step(sqp_b, opts, backend="xla")
    _, U_warm, _, _ = tick_b(X[:, 1], warm)
    _, U_cold, _, _ = tick_b(X[:, 1])
    # both converge to the SAME solution up to the f32 fixed-point
    # tolerance (scale-relative: the controls here are O(10) jerks)
    scale = max(1.0, float(np.abs(np.asarray(U_cold)).max()))
    diff = np.abs(np.asarray(U_warm, np.float64)
                  - np.asarray(U_cold, np.float64)).max() / scale
    assert diff <= 3e-5, f"warm-carried vs cold rebuild: {diff:.2e}"


def test_replan_reuses_compiled_tick_no_retrace():
    """``StagewiseTick.replan`` swaps problem DATA behind the SAME
    compiled tick programs: after the facade's three code paths (cold /
    warm / swap-budget) have each run once, a further replan plus ticks
    must not trace anything new (VERDICT r4 #1 no-re-trace contract)."""
    from copra_tpu.qp.riccati import TICK_TRACE_COUNTERS
    opts = ct.SolverOptions(max_iter=200, eps_abs=1e-9, eps_rel=0.0,
                            early_exit=False, rho=1.0)
    sqp_a, _ = _zmp_fleet(0.0)
    tick = make_stagewise_step(sqp_a, opts, backend="xla")
    x0 = jnp.zeros((2, 3), F32)
    X, U, info, warm = tick(x0)                      # cold path
    X, U, info, warm = tick(X[:, 1], warm)           # warm path
    sqp_p, _ = _zmp_fleet(0.01)
    tick.replan(sqp_p)
    X, U, info, warm = tick(X[:, 1], warm)           # swap-budget path
    n_traces = TICK_TRACE_COUNTERS["xla"]

    sqp_b, _ = _zmp_fleet(0.02)
    tick.replan(sqp_b)                               # same shapes
    X, U, info, warm = tick(X[:, 1], warm)           # swap-budget tick
    X, U, info, warm = tick(X[:, 1], warm)           # steady warm tick
    assert TICK_TRACE_COUNTERS["xla"] == n_traces, \
        "replan() re-traced the tick executor despite identical shapes"


def test_replan_swap_budget_converges_fused():
    """Fused backend: the first post-replan tick runs the swap budget
    (cold_options) with the carried warm tuple, so the fleet converges
    instead of shipping a half-solved tick; the second facade build and
    replan rebuild only plan data (same compiled kernel)."""
    from copra_tpu.qp.riccati import TICK_TRACE_COUNTERS
    opts = ct.SolverOptions(max_iter=30, eps_abs=1e-6, eps_rel=0.0,
                            early_exit=False, rho=1.0)
    copts = opts.replace(max_iter=2000)
    sqp_a, _ = _zmp_fleet(0.0, N=20)
    tick = make_stagewise_step(sqp_a, opts, cold_options=copts,
                               backend="fused")
    x0 = jnp.zeros((2, 3), F32)
    X, U, info, warm = tick(x0)
    assert (np.asarray(info.status) == ct.STATUS_SOLVED).all()
    X, U, info, warm = tick(X[:, 1], warm)

    # prewarm the swap-budget code path, then count traces
    sqp_p, _ = _zmp_fleet(0.005, N=20)
    tick.replan(sqp_p)
    X, U, info, warm = tick(X[:, 1], warm)
    assert (np.asarray(info.status) == ct.STATUS_SOLVED).all(), \
        "post-replan swap-budget tick did not converge"
    n_traces = TICK_TRACE_COUNTERS["fused"]

    sqp_b, _ = _zmp_fleet(0.02, N=20)
    tick.replan(sqp_b)
    Xb, Ub, info_b, warm = tick(X[:, 1], warm)
    assert (np.asarray(info_b.status) == ct.STATUS_SOLVED).all()
    assert TICK_TRACE_COUNTERS["fused"] == n_traces, \
        "fused replan() re-traced despite identical shapes"
    # the swap actually switched models: solution moved
    assert np.abs(np.asarray(Ub) - np.asarray(U)).max() > 1e-4


def test_replan_shape_mismatch_raises():
    from copra_tpu.errors import DimensionError
    opts = ct.SolverOptions(max_iter=50, early_exit=False, rho=1.0)
    sqp_a, _ = _zmp_fleet(0.0, N=20)
    tick = make_stagewise_step(sqp_a, opts, backend="xla")
    sqp_other, _ = _zmp_fleet(0.0, N=30)
    with pytest.raises(DimensionError):
        tick.replan(sqp_other)


def test_plan_step_swap_on_condensed_path():
    """The condensed serving path: rebuild make_control_plan after a
    cost/constraint swap, keep ticking; each fresh plan's step matches
    the exact oracle at the carried state."""
    if not native_available():                       # pragma: no cover
        pytest.skip("native oracle unavailable")
    N = 8
    A = np.array([[1.0, 0.1], [0.0, 1.0]])
    B = np.array([[0.005], [0.1]])

    def build(target):
        system = ct.LTISystem.create(A, B, np.zeros(2),
                                     np.array([1.0, 0.0]), N)
        pos = np.asarray(span_matrix(np.array([[1.0, 0.0]]), N + 1))
        costs = (ct.TrajectoryCost(M=jnp.asarray(pos),
                                   p=jnp.full(N + 1, target),
                                   weights=jnp.full(N + 1, 10.0)),
                 ct.SimpleControlCost(p=jnp.zeros(N),
                                      weights=jnp.full(N, 1e-2)))
        cons = (ct.ControlBoundConstraint.create([-3.0], [3.0]),)
        return ct.make_control_plan(system, costs, cons)

    opts = ct.SolverOptions(max_iter=20000, eps_abs=1e-9, eps_rel=0.0)
    plan = build(0.0)
    step = ct.make_plan_step(plan, opts)
    x0 = np.array([1.0, 0.0])
    U, sol, warm = step(x0, None)
    assert int(sol.status) == ct.STATUS_SOLVED

    # target swap mid-flight: rebuild plan+step, keep the plant state
    plan2 = build(0.5)
    step2 = ct.make_plan_step(plan2, opts)
    U2, sol2, _ = step2(x0, None)
    assert int(sol2.status) == ct.STATUS_SOLVED
    exact = solve_qp_native(ct.plan_qp(plan2, x0))
    scale = max(1.0, np.abs(np.asarray(exact.x)).max())
    err = np.abs(np.asarray(U2) - np.asarray(exact.x)).max() / scale
    assert err <= 1e-5, f"post-swap plan step vs oracle: {err:.2e}"
    # the two models genuinely differ
    assert np.abs(np.asarray(U2) - np.asarray(U)).max() > 1e-3
