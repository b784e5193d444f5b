"""Model-parallel (row-sharded) QP solve vs the single-device oracle.

The TP-analog component from SURVEY.md §2.3: constraint rows sharded over a
"model" mesh axis with explicit psum reductions.  The single-device ADMM
with identical options is the correctness oracle.
"""

import jax
import pytest
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

import copra_tpu as ct
from copra_tpu.parallel.model import solve_qp_model_parallel

from fixtures import (A, B, D, M, N_MAT, SMALL_N, SMALL_X0, UD, U_LOWER,
                      U_UPPER, WU, WX, XD, X_LOWER, X_UPPER)


def golden_qp():
    system = ct.LTISystem.create(A, B, D, SMALL_X0, SMALL_N)
    costs = (ct.TargetCost.create(M, XD, weights=WX),
             ct.ControlCost.create(N_MAT, UD, weights=WU))
    constraints = (ct.TrajectoryBoundConstraint.create(X_LOWER, X_UPPER),
                   ct.ControlBoundConstraint.create(U_LOWER, U_UPPER))
    preview = ct.condense(system)
    return ct.build_qp(preview, system.x0, costs, constraints)


def test_model_parallel_matches_single_device():
    qp = golden_qp()
    # fixed-rho lockstep path: run both sides in the original row metric
    # (row normalization needs adaptive rho to pay off on this problem)
    opts = ct.SolverOptions(max_iter=1500, early_exit=False, polish=False,
                            row_normalize=False, scaling=0)
    ref = ct.solve_qp(qp, opts)
    mesh = Mesh(np.asarray(jax.devices()), ("model",))
    sol = solve_qp_model_parallel(qp, opts, mesh=mesh)
    np.testing.assert_allclose(np.asarray(sol.x), np.asarray(ref.x),
                               atol=1e-8)


def test_model_parallel_golden_control():
    from fixtures import GOLDEN_CONTROL
    qp = golden_qp()
    opts = ct.SolverOptions(max_iter=4000, early_exit=False, polish=False,
                            row_normalize=False, scaling=0)
    mesh = Mesh(np.asarray(jax.devices()), ("model",))
    sol = solve_qp_model_parallel(qp, opts, mesh=mesh)
    np.testing.assert_allclose(np.asarray(sol.x), GOLDEN_CONTROL, atol=2e-3)


def test_model_parallel_warm_start():
    qp = golden_qp()
    opts = ct.SolverOptions(max_iter=800, early_exit=False, polish=False,
                            row_normalize=False, scaling=0)
    mesh = Mesh(np.asarray(jax.devices()), ("model",))
    s1 = solve_qp_model_parallel(qp, opts, mesh=mesh)
    warm = ct.WarmStart(x=s1.x, y=s1.y, z=s1.z)
    s2 = solve_qp_model_parallel(qp, opts, warm_start=warm, mesh=mesh)
    # warm-started continuation converges further toward the optimum
    ref = ct.solve_qp(qp, ct.SolverOptions(max_iter=20000,
                                           early_exit=False, polish=True))
    e1 = np.abs(np.asarray(s1.x) - np.asarray(ref.x)).max()
    e2 = np.abs(np.asarray(s2.x) - np.asarray(ref.x)).max()
    assert e2 < e1


def test_horizon_sharded_lqr_matches_serial():
    """Horizon-sharded LQR over the 8-device mesh == serial Riccati.

    The multi-chip sequence-parallel path: local associative scans +
    one all_gather of per-shard interval elements (O(D x^2) traffic).
    """
    from copra_tpu.parallel.horizon import lqr_solve_sharded

    rng = np.random.default_rng(5)
    N, x, u = 32, 3, 2
    A_ = jnp.asarray(0.85 * np.stack([np.eye(x)] * N)
                     + 0.05 * rng.normal(size=(N, x, x)))
    B_ = jnp.asarray(rng.normal(size=(N, x, u)))
    d_ = jnp.asarray(0.1 * rng.normal(size=(N, x)))
    Qx = jnp.asarray(np.stack([np.eye(x) * w
                               for w in rng.uniform(0.5, 2.0, N + 1)]))
    qx = jnp.asarray(rng.normal(size=(N + 1, x)))
    Ru = jnp.asarray(np.stack([np.eye(u) * w
                               for w in rng.uniform(0.5, 2.0, N)]))
    ru = jnp.asarray(rng.normal(size=(N, u)))
    x0 = jnp.asarray(rng.normal(size=x))

    mesh = Mesh(np.asarray(jax.devices()), ("seq",))
    X1, U1 = ct.lqr_solve(A_, B_, d_, Qx, qx, Ru, ru, x0)
    X2, U2 = lqr_solve_sharded(A_, B_, d_, Qx, qx, Ru, ru, x0, mesh=mesh)
    np.testing.assert_allclose(np.asarray(U2), np.asarray(U1), atol=1e-8)
    np.testing.assert_allclose(np.asarray(X2), np.asarray(X1), atol=1e-8)


@pytest.mark.parametrize("shape", [(2, 4), (4, 2)])
def test_dp_tp_two_axis_mesh_matches_vmapped_single_device(shape):
    """DP x TP on a 2-D ("batch","model") mesh == vmapped single-device.

    The composition promised by parallel/model.py's module docstring
    (VERDICT round-1 weakness #7): scenarios sharded over "batch", each
    scenario's constraint rows over "model".
    """
    from copra_tpu.parallel.model import solve_qp_dp_tp

    system = ct.LTISystem.create(A, B, D, SMALL_X0, SMALL_N)
    costs = (ct.TargetCost.create(M, XD, weights=WX),
             ct.ControlCost.create(N_MAT, UD, weights=WU))
    constraints = (ct.TrajectoryBoundConstraint.create(X_LOWER, X_UPPER),
                   ct.ControlBoundConstraint.create(U_LOWER, U_UPPER))
    preview = ct.condense(system)
    rng = np.random.default_rng(11)
    x0s = jnp.asarray(SMALL_X0)[None] * (
        1.0 + 0.1 * rng.normal(size=(4, len(SMALL_X0))))
    qp_b = jax.vmap(
        lambda x0: ct.build_qp(preview, x0, costs, constraints))(x0s)

    opts = ct.SolverOptions(max_iter=1200, early_exit=False, polish=False,
                            row_normalize=False, scaling=0)
    ref = jax.vmap(lambda q: ct.solve_qp(q, opts))(qp_b)

    mesh = Mesh(np.asarray(jax.devices()).reshape(shape),
                ("batch", "model"))
    sol = solve_qp_dp_tp(qp_b, opts, mesh=mesh)
    np.testing.assert_allclose(np.asarray(sol.x), np.asarray(ref.x),
                               atol=1e-8)
    assert sol.x.shape == (4, qp_b.Q.shape[-1])


@pytest.mark.parametrize("shape", [(2, 4), (4, 2)])
def test_batch_seq_two_axis_lqr_matches_serial(shape):
    """Batch x seq LQR on a 2-D ("batch","seq") mesh == per-scenario serial
    Riccati (VERDICT round-1 weakness #7, seq-under-batch composition)."""
    from copra_tpu.parallel.horizon import lqr_solve_sharded_batch

    rng = np.random.default_rng(7)
    Bn, N, x, u = 4, 16, 3, 2
    A_ = jnp.asarray(0.85 * np.stack([[np.eye(x)] * N] * Bn)
                     + 0.05 * rng.normal(size=(Bn, N, x, x)))
    B_ = jnp.asarray(rng.normal(size=(Bn, N, x, u)))
    d_ = jnp.asarray(0.1 * rng.normal(size=(Bn, N, x)))
    Qx = jnp.asarray(np.stack(
        [[np.eye(x) * w for w in rng.uniform(0.5, 2.0, N + 1)]
         for _ in range(Bn)]))
    qx = jnp.asarray(rng.normal(size=(Bn, N + 1, x)))
    Ru = jnp.asarray(np.stack(
        [[np.eye(u) * w for w in rng.uniform(0.5, 2.0, N)]
         for _ in range(Bn)]))
    ru = jnp.asarray(rng.normal(size=(Bn, N, u)))
    x0 = jnp.asarray(rng.normal(size=(Bn, x)))

    mesh = Mesh(np.asarray(jax.devices()).reshape(shape), ("batch", "seq"))
    X2, U2 = lqr_solve_sharded_batch(A_, B_, d_, Qx, qx, Ru, ru, x0,
                                     mesh=mesh)
    for i in range(Bn):
        X1, U1 = ct.lqr_solve(A_[i], B_[i], d_[i], Qx[i], qx[i], Ru[i],
                              ru[i], x0[i])
        np.testing.assert_allclose(np.asarray(U2[i]), np.asarray(U1),
                                   atol=1e-8)
        np.testing.assert_allclose(np.asarray(X2[i]), np.asarray(X1),
                                   atol=1e-8)


def test_horizon_sharded_lqr_rejects_indivisible():
    from copra_tpu.parallel.horizon import lqr_solve_sharded
    mesh = Mesh(np.asarray(jax.devices()), ("seq",))
    N, x, u = 30, 2, 1   # 30 % 8 != 0
    Z = jnp.zeros
    with pytest.raises(ValueError):
        lqr_solve_sharded(Z((N, x, x)), Z((N, x, u)), Z((N, x)),
                          Z((N + 1, x, x)), Z((N + 1, x)),
                          Z((N, u, u)), Z((N, u)), Z((x,)), mesh=mesh)
