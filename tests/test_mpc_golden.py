"""Golden-value regression: the primary numerical contract.

Reproduces the reference's ``solveSmallSystem`` / ``solveSmallTimeVariant``
tests (``test/TestTimeInvariantSystems.cpp:1132-1197``,
``test/TestTimeVariantSystems.cpp:88-158``) with identical fixtures,
tolerances, and oracles: golden control/trajectory vectors, dynamics replay
to 1e-10, terminal condition, and constraint satisfaction.
"""

import jax
import jax.numpy as jnp
import numpy as np

import copra_tpu as ct

from fixtures import (A, B, D, GOLDEN_CONTROL, GOLDEN_LTV_CONTROL,
                      GOLDEN_LTV_TRAJECTORY, GOLDEN_TRAJECTORY, M, N_MAT,
                      SMALL_N, SMALL_X0, UD, U_LOWER, U_UPPER, WU, WX, XD,
                      X_LOWER, X_UPPER, ltv_matrices)


def small_costs_constraints():
    x_cost = ct.TargetCost.create(M, XD, weights=WX)
    u_cost = ct.ControlCost.create(N_MAT, UD, weights=WU)
    traj_bound = ct.TrajectoryBoundConstraint.create(X_LOWER, X_UPPER)
    ctrl_bound = ct.ControlBoundConstraint.create(U_LOWER, U_UPPER)
    return [x_cost, u_cost], [traj_bound, ctrl_bound]


def check_contract(system, X, U, golden_traj, golden_u):
    X, U = np.asarray(X), np.asarray(U)
    assert np.linalg.norm(X - golden_traj) <= 1e-4
    assert np.linalg.norm(U - golden_u) <= 2e-4
    # dynamics replay <= 1e-10 (TestTimeInvariantSystems.cpp:1172-1176)
    assert float(ct.replay_dynamics(system, jnp.asarray(X),
                                    jnp.asarray(U))) <= 1e-10
    pos, vel = X[0::2], X[1::2]
    # terminal condition (":1179")
    assert abs(XD[1] - vel[-1]) <= 1e-3
    # constraint satisfaction (":1182-1184")
    assert pos.max() <= SMALL_X0[0] + 1e-6
    assert vel.max() <= X_UPPER[1] + 1e-6
    assert U.max() <= U_UPPER[0] + 1e-6


def test_small_system_golden_lmpc_facade():
    system = ct.LTISystem.create(A, B, D, SMALL_X0, SMALL_N)
    controller = ct.LMPC(system)
    costs, constraints = small_costs_constraints()
    for c in costs:
        controller.add_cost(c)
    for c in constraints:
        controller.add_constraint(c)
    assert controller.solve()
    check_contract(system, controller.trajectory(), controller.control(),
                   GOLDEN_TRAJECTORY, GOLDEN_CONTROL)
    assert controller.solve_time() > 0
    assert controller.solve_and_build_time() >= controller.solve_time()
    assert controller.inform().startswith("solved")


def test_small_system_golden_functional():
    system = ct.LTISystem.create(A, B, D, SMALL_X0, SMALL_N)
    costs, constraints = small_costs_constraints()
    res = ct.solve_mpc(system, costs, constraints)
    check_contract(system, res.trajectory, res.control,
                   GOLDEN_TRAJECTORY, GOLDEN_CONTROL)


def test_small_system_golden_jitted():
    system = ct.LTISystem.create(A, B, D, SMALL_X0, SMALL_N)
    costs, constraints = small_costs_constraints()
    fn = jax.jit(lambda s: ct.solve_mpc(s, tuple(costs), tuple(constraints)))
    res = fn(system)
    check_contract(system, res.trajectory, res.control,
                   GOLDEN_TRAJECTORY, GOLDEN_CONTROL)


def test_small_time_variant_golden():
    As, Bs, Ds = ltv_matrices()
    system = ct.LTVSystem.create(As, Bs, Ds, SMALL_X0)
    costs, constraints = small_costs_constraints()
    res = ct.solve_mpc(system, costs, constraints)
    X, U = np.asarray(res.trajectory), np.asarray(res.control)
    assert np.linalg.norm(X - GOLDEN_LTV_TRAJECTORY) <= 1e-4
    assert np.linalg.norm(U - GOLDEN_LTV_CONTROL) <= 2e-4
    assert float(ct.replay_dynamics(system, res.trajectory,
                                    res.control)) <= 1e-10
    vel = X[1::2]
    assert vel.max() <= X_UPPER[1] + 1e-6
    assert U.max() <= U_UPPER[0] + 1e-6


def test_ltv_constant_equals_lti_solution():
    """Solve-level equivalence oracle
    (test/TestTimeVariantSystems.cpp:47-86, tolerance 1e-10)."""
    sys_lti = ct.LTISystem.create(A, B, D, SMALL_X0, SMALL_N)
    sys_ltv = ct.lti_as_ltv(sys_lti)
    costs, constraints = small_costs_constraints()
    r1 = ct.solve_mpc(sys_lti, costs, constraints)
    r2 = ct.solve_mpc(sys_ltv, costs, constraints)
    np.testing.assert_allclose(np.asarray(r1.control),
                               np.asarray(r2.control), atol=1e-9)
    np.testing.assert_allclose(np.asarray(r1.trajectory),
                               np.asarray(r2.trajectory), atol=1e-9)


def test_batched_golden_vmap():
    """The golden scenario solved under vmap for a batch of initial states —
    lane 0 must still match the golden vectors."""
    batch = 32
    rng = np.random.default_rng(0)
    x0s = np.concatenate([SMALL_X0[None],
                          SMALL_X0[None] + rng.normal(
                              scale=[0.05, 0.2], size=(batch - 1, 2))])
    x0s[:, 1] = np.minimum(x0s[:, 1], -0.1)  # keep velocity negative/feasible
    costs, constraints = small_costs_constraints()

    base = ct.LTISystem.create(A, B, D, SMALL_X0, SMALL_N)

    def solve_one(x0):
        return ct.solve_mpc(base.with_x0(x0), tuple(costs),
                            tuple(constraints))

    res = jax.jit(jax.vmap(solve_one))(jnp.asarray(x0s))
    assert res.control.shape == (batch, SMALL_N)
    assert np.linalg.norm(np.asarray(res.control[0]) - GOLDEN_CONTROL) <= 2e-4
    # every lane satisfies constraints & dynamics
    for i in range(batch):
        sys_i = base.with_x0(jnp.asarray(x0s[i]))
        assert float(ct.replay_dynamics(
            sys_i, res.trajectory[i], res.control[i])) <= 1e-9
        assert np.asarray(res.control[i]).max() <= U_UPPER[0] + 1e-6
        assert np.asarray(res.trajectory[i])[1::2].max() <= 1e-6
