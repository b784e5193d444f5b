"""Scenario-DP and mesh-sharding tests on the virtual 8-device CPU mesh.

The reference has no parallel machinery (SURVEY.md §2.3); these tests cover
the TPU-native layers we add instead: vmapped batch solving, GSPMD-sharded
solving over a `jax.sharding.Mesh`, and the explicit-collective
`shard_map` path with psum-reduced batch statistics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import copra_tpu as ct
from copra_tpu.parallel import (batch_axes, batch_size, make_mesh,
                                make_sharded_mpc_step, shard_batch,
                                solve_mpc_batch, sharded_solve_mpc,
                                stack_systems)

from fixtures import (A, B, D, GOLDEN_CONTROL, M, N_MAT, SMALL_N, SMALL_X0,
                      UD, U_LOWER, U_UPPER, WU, WX, XD, X_LOWER, X_UPPER,
                      ltv_matrices)


def small_costs_constraints():
    return ([ct.TargetCost.create(M, XD, weights=WX),
             ct.ControlCost.create(N_MAT, UD, weights=WU)],
            [ct.TrajectoryBoundConstraint.create(X_LOWER, X_UPPER),
             ct.ControlBoundConstraint.create(U_LOWER, U_UPPER)])


def batched_lti(batch):
    rng = np.random.default_rng(42)
    x0s = np.repeat(SMALL_X0[None], batch, axis=0)
    x0s[1:] += rng.normal(scale=[0.02, 0.1], size=(batch - 1, 2))
    x0s[:, 1] = np.minimum(x0s[:, 1], -0.1)
    base = ct.LTISystem.create(A, B, D, SMALL_X0, SMALL_N)
    return base.with_x0(jnp.asarray(x0s)), x0s


def test_batch_axes_detects_batched_leaves():
    system, _ = batched_lti(8)
    axes = batch_axes(system)
    assert axes.x0 == 0 and axes.A is None and axes.B is None
    assert batch_size(system) == 8


def test_stack_systems():
    sys_a = ct.LTISystem.create(A, B, D, SMALL_X0, SMALL_N)
    sys_b = sys_a.with_x0(jnp.asarray([0.0, -2.0]))
    stacked = stack_systems([sys_a, sys_b])
    assert stacked.x0.shape == (2, 2)
    assert batch_size(stacked) == 2


def test_solve_mpc_batch_matches_single():
    system, x0s = batched_lti(8)
    costs, constraints = small_costs_constraints()
    res = solve_mpc_batch(system, costs, constraints)
    assert res.control.shape == (8, SMALL_N)
    np.testing.assert_allclose(np.asarray(res.control[0]), GOLDEN_CONTROL,
                               atol=2e-4)
    # each lane equals its standalone solve
    single = ct.solve_mpc(
        ct.LTISystem.create(A, B, D, x0s[3], SMALL_N), costs, constraints)
    np.testing.assert_allclose(np.asarray(res.control[3]),
                               np.asarray(single.control), atol=1e-8)


def test_ltv_batch_over_dynamics():
    """Batch over the full dynamics stack, not just x0 (randomized LTV
    scenarios — BASELINE.md config 4)."""
    batch = 4
    As, Bs, Ds = ltv_matrices()
    rng = np.random.default_rng(7)
    As_b = np.repeat(As[None], batch, 0)
    As_b[1:] += rng.normal(scale=1e-3, size=(batch - 1,) + As.shape)
    sys_b = ct.LTVSystem(A=jnp.asarray(As_b),
                         B=jnp.asarray(np.repeat(Bs[None], batch, 0)),
                         d=jnp.asarray(np.repeat(Ds[None], batch, 0)),
                         x0=jnp.asarray(np.repeat(SMALL_X0[None], batch, 0)))
    assert batch_size(sys_b) == batch
    costs, constraints = small_costs_constraints()
    res = solve_mpc_batch(sys_b, costs, constraints)
    assert res.control.shape == (batch, SMALL_N)
    for i in range(batch):
        sys_i = ct.LTVSystem(A=sys_b.A[i], B=sys_b.B[i], d=sys_b.d[i],
                             x0=sys_b.x0[i])
        assert float(ct.replay_dynamics(
            sys_i, res.trajectory[i], res.control[i])) <= 1e-9


def test_mesh_and_shard_batch():
    mesh = make_mesh()
    assert mesh.devices.size == len(jax.devices())
    system, _ = batched_lti(16)
    sharded = shard_batch(system, mesh, reference=batch_axes(system))
    assert batch_size(sharded) == 16
    # x0 sharded over the batch axis; A replicated
    assert not sharded.x0.sharding.is_fully_replicated
    assert sharded.A.sharding.is_fully_replicated


def test_sharded_solve_matches_golden():
    mesh = make_mesh()
    system, x0s = batched_lti(16)
    system = shard_batch(system, mesh, reference=batch_axes(system))
    costs, constraints = small_costs_constraints()
    res = sharded_solve_mpc(system, costs, constraints, mesh=mesh)
    assert res.control.shape == (16, SMALL_N)
    np.testing.assert_allclose(np.asarray(res.control[0]), GOLDEN_CONTROL,
                               atol=2e-4)


def test_sharded_mpc_step_with_stats():
    mesh = make_mesh()
    batch = 16
    system, _ = batched_lti(batch)
    costs, constraints = small_costs_constraints()
    step = make_sharded_mpc_step(mesh, costs, constraints,
                                 ct.SolverOptions(max_iter=400))
    res, stats = step(system, None)
    assert res.control.shape == (batch, SMALL_N)
    assert int(stats["total"]) == batch
    assert int(stats["converged"]) >= 0
    assert float(stats["max_primal_residual"]) < 1e-3
    np.testing.assert_allclose(np.asarray(res.control[0]), GOLDEN_CONTROL,
                               atol=2e-3)
    # warm-started second step converges at least as tightly
    warm = ct.WarmStart(x=res.solution.x, y=res.solution.y, z=res.solution.z)
    res2, stats2 = step(system, warm)
    assert (float(stats2["max_primal_residual"])
            <= float(stats["max_primal_residual"]) + 1e-9)
