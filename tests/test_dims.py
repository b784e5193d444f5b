"""Multi-dimensional coverage: every cost/constraint kind at x=3, u=2.

The golden fixtures are 2-state/1-input; the per-step block machinery
(kron placements, einsum alignments, Toeplitz layouts) has separate code
paths that only multi-input systems exercise.  Oracle: the exact native
active-set solver on the identically-assembled QP.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import copra_tpu as ct
from copra_tpu.qp.native import native_available, solve_qp_native

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native solver unavailable")

X, U, N = 3, 2, 12
rng = np.random.default_rng(0)
A3 = 0.9 * np.eye(X) + 0.05 * rng.normal(size=(X, X))
B3 = rng.normal(size=(X, U))
D3 = 0.01 * rng.normal(size=X)
X0 = rng.normal(size=X)


def solve_both(costs, constraints, opts=None):
    system = ct.LTISystem.create(A3, B3, D3, X0, N)
    opts = opts or ct.SolverOptions(max_iter=8000)
    res = ct.solve_mpc(system, costs, constraints, opts)
    preview = ct.condense(system)
    qp = ct.build_qp(preview, system.x0, tuple(costs), tuple(constraints))
    exact = solve_qp_native(qp)
    assert int(exact.status) == ct.STATUS_SOLVED
    np.testing.assert_allclose(np.asarray(res.control),
                               np.asarray(exact.x), atol=5e-6)
    assert float(ct.replay_dynamics(system, res.trajectory,
                                    res.control)) <= 1e-9
    return res


def test_multidim_trajectory_and_control_costs():
    Mm = rng.normal(size=(2, X))
    p = rng.normal(size=2)
    Nn = rng.normal(size=(3, U))
    q = rng.normal(size=3)
    solve_both([ct.TrajectoryCost.create(Mm, p, weights=[2.0, 1.0]),
                ct.ControlCost.create(Nn, q, weights=[0.1, 0.2, 0.3])],
               [ct.ControlBoundConstraint.create([-5.0] * U, [5.0] * U)])


def test_multidim_target_and_mixed_costs():
    Mm = np.eye(X)
    xd = rng.normal(size=X)
    Me = rng.normal(size=(2, X))
    Ne = rng.normal(size=(2, U))
    pe = rng.normal(size=2)
    solve_both([ct.TargetCost.create(Mm, xd, weights=[5.0] * X),
                ct.MixedCost.create(Me, Ne, pe, weights=[0.5, 0.5]),
                ct.SimpleControlCost.create(np.zeros(U),
                                            weights=[1e-2] * U)],
               [ct.ControlBoundConstraint.create([-8.0] * U, [8.0] * U)])


def test_multidim_all_constraint_kinds():
    costs = [ct.TargetCost.create(np.eye(X), np.zeros(X),
                                  weights=[10.0] * X),
             ct.SimpleControlCost.create(np.zeros(U), weights=[0.1] * U)]
    E = rng.normal(size=(1, X))
    f = np.array([4.0])
    G = rng.normal(size=(1, U))
    h = np.array([3.0])
    Em = rng.normal(size=(1, X))
    Gm = rng.normal(size=(1, U))
    fm = np.array([6.0])
    constraints = [
        ct.TrajectoryConstraint.create(E, f),
        ct.ControlConstraint.create(G, h),
        ct.MixedConstraint.create(Em, Gm, fm),
        ct.TrajectoryBoundConstraint.create(
            [-np.inf, -10.0, -np.inf], [10.0, np.inf, 12.0]),
        ct.ControlBoundConstraint.create([-6.0] * U, [6.0] * U),
    ]
    solve_both(costs, constraints)


def test_multidim_equality_rows():
    costs = [ct.SimpleTrajectoryCost.create(np.zeros(X), weights=[1.0] * X),
             ct.SimpleControlCost.create(np.zeros(U), weights=[1e-3] * U)]
    # pin a random state direction at every step
    E = rng.normal(size=(1, X))
    f = (E @ X0).reshape(1)
    res = solve_both(costs, [ct.TrajectoryConstraint.create(
        E, f, is_inequality=False)])
    Xb = np.asarray(res.trajectory).reshape(N + 1, X)
    np.testing.assert_allclose(Xb @ np.asarray(E[0]), f[0], atol=1e-5)


def test_multidim_stagewise_matches_condensed():
    from copra_tpu.qp.riccati import solve_mpc_stagewise
    costs = [ct.TargetCost.create(np.eye(X), np.zeros(X),
                                  weights=[5.0] * X),
             ct.ControlCost.create(np.eye(U), np.zeros(U),
                                   weights=[0.1] * U)]
    cons = [ct.ControlBoundConstraint.create([-2.0] * U, [2.0] * U)]
    system = ct.LTISystem.create(A3, B3, D3, X0, N)
    ref = ct.solve_mpc(system, costs, cons,
                       ct.SolverOptions(max_iter=8000, eps_abs=1e-7,
                                        eps_rel=0.0))
    _, Us, _ = solve_mpc_stagewise(system, costs, cons,
                                   ct.SolverOptions(max_iter=2000,
                                                    early_exit=False))
    np.testing.assert_allclose(np.asarray(Us).reshape(-1),
                               np.asarray(ref.control), atol=5e-5)


def test_multidim_plan_paths():
    from copra_tpu.plan import make_control_plan, make_plan_step
    costs = (ct.TargetCost.create(np.eye(X), np.zeros(X),
                                  weights=[5.0] * X),
             ct.SimpleControlCost.create(np.zeros(U), weights=[0.1] * U))
    cons_box = (ct.ControlBoundConstraint.create([-2.0] * U, [2.0] * U),)
    system = ct.LTISystem.create(A3, B3, D3, X0, N)
    plan = make_control_plan(system, costs, cons_box)
    step = make_plan_step(plan, ct.SolverOptions(max_iter=2000))
    Uv, sol, _ = step(jnp.asarray(X0), None)
    ref = ct.solve_mpc(system, costs, cons_box,
                       ct.SolverOptions(max_iter=8000))
    np.testing.assert_allclose(np.asarray(Uv), np.asarray(ref.control),
                               atol=1e-5)
