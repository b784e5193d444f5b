"""Randomized serving-path cross-validation.

``test_fuzz_frontend`` fuzzes the one-shot pipeline; this suite fuzzes
the PRODUCTION serving paths on the same random-draw generator:

* ``make_control_plan`` + ``make_plan_step`` receding ticks (warm-
  started) must match a fresh ``solve_mpc`` of the identical problem at
  every tick, and the plan-instantiated QP must match the exact f64
  native oracle;
* ``make_stagewise_step`` warm ticks (per-stage-expressible draws) must
  match the same oracle;
* states evolve through the TRUE dynamics (closed loop), so each tick
  sees a genuinely new x0 and the warm caches are exercised for real.
"""

import numpy as np
import pytest

import copra_tpu as ct
from copra_tpu.qp.native import native_available, solve_qp_native

from test_fuzz_frontend import _draw_problem

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native solver did not build")

TICKS = 3


def _step_state(system, x0, U):
    """x_1 of the closed loop: apply the first control to the dynamics."""
    x, u = system.xdim, system.udim
    A = np.asarray(system.A)
    B = np.asarray(system.B)
    d = np.asarray(system.d)
    if A.ndim == 3:                       # LTV: use stage-0 matrices
        A, B, d = A[0], B[0], d[0]
    return A @ np.asarray(x0) + B @ np.asarray(U)[:u] + d


@pytest.mark.parametrize("seed", [0, 2, 4, 7, 11])
def test_plan_step_receding_matches_fresh_solves(seed):
    # eq_rows=False: equality right-hand sides are anchored at the
    # initial witness trajectory and can become infeasible once the
    # closed loop drifts the state (the front-end fuzz covers them)
    # NO hand-set solver options (VERDICT r4 #7): the serving facade's
    # defaults must carry the contract on arbitrary well-posed draws
    system, costs, constraints, _ = _draw_problem(seed, eq_rows=False)
    plan = ct.make_control_plan(system, costs, constraints)
    step = ct.make_plan_step(plan)

    import dataclasses
    x0 = np.asarray(system.x0)
    warm = None
    for t in range(TICKS):
        U, sol, warm = step(x0, warm)
        assert int(sol.status) == ct.STATUS_SOLVED, \
            f"seed {seed} tick {t}: {sol.inform()}"
        # oracle on the plan-instantiated QP
        qp = ct.plan_qp(plan, np.asarray(x0))
        ref = solve_qp_native(qp)
        assert int(ref.status) == ct.STATUS_SOLVED
        scale = max(1.0, np.abs(np.asarray(ref.x)).max())
        err_o = np.abs(np.asarray(U) - np.asarray(ref.x)).max() / scale
        assert err_o <= 1e-5, f"seed {seed} tick {t}: plan vs oracle {err_o:.2e}"
        # fresh full-pipeline NO-KNOBS solve at the same state
        sysd = dataclasses.replace(system, x0=np.asarray(x0))
        res = ct.solve(sysd, costs, constraints)
        err_f = np.abs(np.asarray(U) - np.asarray(res.control)).max() / scale
        assert err_f <= 2e-5, f"seed {seed} tick {t}: plan vs fresh {err_f:.2e}"
        x0 = _step_state(system, x0, U)


@pytest.mark.parametrize("seed", [1, 3, 6, 8])
def test_stagewise_step_receding_matches_oracle(seed):
    system, costs, constraints, stagewise_ok = _draw_problem(
        seed, eq_rows=False)
    if not stagewise_ok:
        pytest.skip("draw includes stage-coupling entries")
    import dataclasses
    import jax
    import jax.numpy as jnp
    from copra_tpu.qp.riccati import from_mpc

    B = 3  # small fleet: lanes share dynamics, distinct states
    sqp = from_mpc(system, costs, constraints)
    sqp_b = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape), sqp)
    rng = np.random.default_rng(100 + seed)
    x0s = np.asarray(system.x0)[None] + 0.1 * rng.normal(
        size=(B, system.xdim))
    sqp_b = dataclasses.replace(sqp_b, x0=jnp.asarray(x0s))

    # default options: the facade's no-knobs budget must carry the
    # 1e-4 oracle gate on arbitrary per-stage-expressible draws
    tick = ct.make_stagewise_step(sqp_b)

    plan = ct.make_control_plan(system, costs, constraints)
    warm = None
    xs = x0s
    for t in range(2):
        X, U, info, warm = tick(jnp.asarray(xs, sqp.x0.dtype), warm)
        for lane in range(B):
            qp = ct.plan_qp(plan, xs[lane])
            ref = solve_qp_native(qp)
            assert int(ref.status) == ct.STATUS_SOLVED
            scale = max(1.0, np.abs(np.asarray(ref.x)).max())
            err = (np.abs(np.asarray(U)[lane].reshape(-1)
                          - np.asarray(ref.x)).max() / scale)
            assert err <= 1e-4, \
                f"seed {seed} tick {t} lane {lane}: stagewise vs oracle {err:.2e}"
        xs = np.stack([_step_state(system, xs[lane],
                                   np.asarray(U)[lane].reshape(-1))
                       for lane in range(B)])


@pytest.mark.parametrize("seed", [0, 5, 12])
def test_fused_stagewise_matches_xla_on_random_draws(seed):
    """The fused Pallas tick kernel must reproduce the XLA scan path on
    front-end-lowered random problems (``from_mpc`` shapes: re-expressed
    trajectory rows, mixed rows, masked bounds), not just on the
    kernel-local ``_random_sqp`` fixtures."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from copra_tpu.qp.riccati import from_mpc, make_stagewise_step

    system, costs, constraints, stagewise_ok = _draw_problem(
        seed, eq_rows=False)
    if not stagewise_ok:
        pytest.skip("draw includes stage-coupling entries")
    sqp = from_mpc(system, costs, constraints)
    sqp = jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32), sqp)
    B = 2
    sqp_b = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape), sqp)
    rng = np.random.default_rng(200 + seed)
    x0s = np.asarray(system.x0, np.float32)[None] + np.float32(0.05) * \
        rng.normal(size=(B, system.xdim)).astype(np.float32)
    sqp_b = dataclasses.replace(sqp_b, x0=jnp.asarray(x0s))

    opts = ct.SolverOptions(max_iter=25, early_exit=False)
    tick_x = make_stagewise_step(sqp_b, opts, backend="xla")
    tick_f = make_stagewise_step(sqp_b, opts, backend="fused")
    warm_x = warm_f = None
    for k in range(3):
        x0k = jnp.asarray(x0s + np.float32(0.01 * k))
        Xx, Ux, ix, warm_x = tick_x(x0k, warm_x)
        Xf, Uf, if_, warm_f = tick_f(x0k, warm_f)
        np.testing.assert_allclose(np.asarray(Uf), np.asarray(Ux),
                                   atol=5e-5)
        np.testing.assert_allclose(np.asarray(Xf), np.asarray(Xx),
                                   atol=5e-5)
