"""Model-parallel (row-sharded) QP solve vs the single-device oracle.

The TP-analog component from SURVEY.md §2.3: constraint rows sharded over a
"model" mesh axis with explicit psum reductions.  The single-device ADMM
with identical options is the correctness oracle.
"""

import jax
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
    opts = ct.SolverOptions(max_iter=1500, early_exit=False, polish=False)
    ref = ct.solve_qp(qp, opts)
    mesh = Mesh(np.asarray(jax.devices()), ("model",))
    sol = solve_qp_model_parallel(qp, opts, mesh=mesh)
    np.testing.assert_allclose(np.asarray(sol.x), np.asarray(ref.x),
                               atol=1e-8)


def test_model_parallel_golden_control():
    from fixtures import GOLDEN_CONTROL
    qp = golden_qp()
    opts = ct.SolverOptions(max_iter=4000, early_exit=False, polish=False)
    mesh = Mesh(np.asarray(jax.devices()), ("model",))
    sol = solve_qp_model_parallel(qp, opts, mesh=mesh)
    np.testing.assert_allclose(np.asarray(sol.x), GOLDEN_CONTROL, atol=2e-3)


def test_model_parallel_warm_start():
    qp = golden_qp()
    opts = ct.SolverOptions(max_iter=800, early_exit=False, polish=False)
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
