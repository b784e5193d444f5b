"""Model-parallel (TP-analog) QP solving: constraint rows sharded over a
mesh axis.

SURVEY.md §2.3: for very large horizons the dense constraint matrix
``C [m, n]`` (m = eq + ineq + box rows, n = N*u) dominates memory and
matvec time.  This module shards C **row-wise** over a ``"model"`` mesh
axis inside ``shard_map``: each device owns a row shard of (C, l, u, rho,
y, z), the x-update's ``C^T (rho z - y)`` reduction is an explicit
``psum`` over the model axis (riding ICI), and the n-sized primal state is
replicated.  Composes with the ``"batch"`` axis for scenario DP — a 2-D
``("batch", "model")`` mesh is the copra-tpu analog of DP×TP.

The iteration math is identical to ``copra_tpu.qp.admm.solve_qp`` with
``early_exit=False``; that path is the single-device oracle in tests.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..qp.types import (STATUS_MAX_ITER, STATUS_SOLVED, DenseQP, QPSolution,
                        SolverOptions, WarmStart)
from .._precision import highest_precision
from ..qp.admm import stack_constraints

Array = jax.Array

MODEL_AXIS = "model"


def _pad_rows(arr: Array, m_pad: int, fill: float) -> Array:
    pad = m_pad - arr.shape[0]
    if pad == 0:
        return arr
    width = [(0, pad)] + [(0, 0)] * (arr.ndim - 1)
    return jnp.pad(arr, width, constant_values=fill)


def shard_constraints(qp: DenseQP, options: SolverOptions, n_shards: int
                      ) -> Tuple[Array, Array, Array, Array, int]:
    """Stack to two-sided form and pad rows to a multiple of ``n_shards``.

    Padded rows are the trivially satisfied ``0 x <= 1`` (the same masking
    idiom the constraint layer uses for ±inf bounds).
    """
    C, l, u, rho = stack_constraints(qp, options)
    m = C.shape[0]
    m_pad = int(np.ceil(m / n_shards) * n_shards)
    C = _pad_rows(C, m_pad, 0.0)
    l = _pad_rows(l, m_pad, -jnp.inf)
    u = _pad_rows(u, m_pad, 1.0)
    rho = _pad_rows(rho, m_pad, options.rho)
    return C, l, u, rho, m


@highest_precision
def solve_qp_model_parallel(qp: DenseQP,
                            options: SolverOptions = SolverOptions(),
                            warm_start: Optional[WarmStart] = None,
                            mesh: Optional[Mesh] = None,
                            axis: str = MODEL_AXIS) -> QPSolution:
    """Solve ONE dense QP with its constraint rows sharded over ``axis``.

    The returned solution is in the unsharded layout (duals/slacks of the
    padded row count; slice ``[:m]`` for the original rows).  Fixed
    iteration count (no early exit) so all shards step in lockstep.
    """
    if mesh is None:
        mesh = Mesh(np.asarray(jax.devices()), (axis,))
    n_shards = mesh.shape[axis]
    n = qp.nr_vars
    dt = qp.Q.dtype
    C, l, u, rho, m_true = shard_constraints(qp, options, n_shards)
    m = C.shape[0]

    if options.row_normalize:
        # same exact row reparametrization as the single-device solver
        # (uniform dual pressure); duals are returned in the original
        # metric below
        rn = jnp.sqrt(jnp.sum(C * C, axis=-1))
        E = jnp.where(rn > 1e-12, 1.0 / rn, 1.0)
    else:
        E = jnp.ones((m,), dt)
    C = C * E[:, None]
    l = E * l
    u = E * u

    sigma = jnp.asarray(options.sigma, dt)
    alpha = jnp.asarray(options.alpha, dt)

    # K assembled via the same psum the iterations use: K = Q + sigma I +
    # sum_shards C_s^T rho_s C_s  (reduce over the model axis)
    def local_solve(C_s, l_s, u_s, rho_s, x0, y0_s, z0_s):
        CtpC = lax.psum((C_s.T * rho_s) @ C_s, axis)
        K = qp.Q + sigma * jnp.eye(n, dtype=dt) + CtpC
        S = 1.0 / jnp.sqrt(jnp.diagonal(K))
        Ks = K * S[:, None] * S[None, :]
        Ls = jnp.linalg.cholesky(Ks)
        eye = jnp.eye(n, dtype=dt)
        Lsi = lax.linalg.triangular_solve(Ls, eye, left_side=True,
                                          lower=True)
        Kinv = (Lsi.T @ Lsi) * S[:, None] * S[None, :]
        rho_inv_s = 1.0 / rho_s

        def body(_, carry):
            x, z_s, y_s = carry
            # C^T (rho z - y): local partial product, psum over shards
            ctw = lax.psum(C_s.T @ (rho_s * z_s - y_s), axis)
            rhs = sigma * x - qp.c + ctw
            x_t = Kinv @ rhs
            z_t_s = C_s @ x_t
            x_n = alpha * x_t + (1 - alpha) * x
            z_rel = alpha * z_t_s + (1 - alpha) * z_s
            z_n = jnp.clip(z_rel + rho_inv_s * y_s, l_s, u_s)
            y_n = y_s + rho_s * (z_rel - z_n)
            return x_n, z_n, y_n

        x, z_s, y_s = lax.fori_loop(0, options.max_iter, body,
                                    (x0, z0_s, y0_s))

        # residuals: local maxima reduced with pmax/psum
        r_prim = lax.pmax(jnp.max(jnp.abs(C_s @ x - z_s),
                                  initial=jnp.zeros((), dt)), axis)
        cty = lax.psum(C_s.T @ y_s, axis)
        r_dual = jnp.max(jnp.abs(qp.Q @ x + qp.c + cty))
        return x, z_s, y_s, r_prim, r_dual

    if warm_start is not None:
        x0 = warm_start.x
        y0 = _pad_rows(warm_start.y, m, 0.0) / E
        z0 = _pad_rows(warm_start.z, m, 0.0) * E
    else:
        x0 = jnp.zeros((n,), dt)
        y0 = jnp.zeros((m,), dt)
        z0 = jnp.zeros((m,), dt)

    mapped = jax.shard_map(
        local_solve, mesh=mesh,
        in_specs=(P(axis, None), P(axis), P(axis), P(axis),
                  P(), P(axis), P(axis)),
        out_specs=(P(), P(axis), P(axis), P(), P()),
        check_vma=False)
    x, z, y, r_prim, r_dual = jax.jit(mapped)(C, l, u, rho, x0, y0, z0)
    # back to the original row metric
    y = E * y
    z = z / E

    eps_floor = 25.0 * float(jnp.finfo(dt).eps)
    conv = ((r_prim <= max(options.eps_abs, eps_floor) * 10)
            & (r_dual <= max(options.eps_abs, eps_floor) * 10))
    status = jnp.where(conv, STATUS_SOLVED, STATUS_MAX_ITER).astype(jnp.int32)
    return QPSolution(x=x, y=y, z=z, status=status,
                      iterations=jnp.asarray(options.max_iter, jnp.int32),
                      primal_residual=r_prim, dual_residual=r_dual)


BATCH_AXIS = "batch"


@highest_precision
def solve_qp_dp_tp(qp: DenseQP,
                   options: SolverOptions = SolverOptions(),
                   warm_start: Optional[WarmStart] = None,
                   mesh: Optional[Mesh] = None,
                   batch_axis: str = BATCH_AXIS,
                   model_axis: str = MODEL_AXIS) -> QPSolution:
    """DP x TP: a BATCH of dense QPs over a 2-D ``(batch, model)`` mesh.

    Every leaf of ``qp`` carries a leading batch axis (``Q [B,n,n]``,
    ``c [B,n]``, ...).  Scenarios are sharded over ``batch_axis`` and each
    scenario's constraint rows over ``model_axis`` — the composition the
    module docstring promises.  Per-lane ``C^T(rho z - y)`` reductions psum
    over the model axis only; lanes never communicate.  ``B`` must divide
    by the batch-axis size and all lanes share one (padded) row count.

    Fixed iteration count (lockstep across shards); the vmapped
    single-device solver with identical options is the oracle in
    ``tests/test_model_parallel.py``.
    """
    if mesh is None:
        devs = np.asarray(jax.devices())
        mesh = Mesh(devs.reshape(2, -1), (batch_axis, model_axis))
    n_row_shards = mesh.shape[model_axis]
    n_batch_shards = mesh.shape[batch_axis]
    B = qp.Q.shape[0]
    if B % n_batch_shards:
        raise ValueError(
            f"batch {B} not divisible by {n_batch_shards} batch shards")
    n = qp.nr_vars
    dt = qp.Q.dtype

    def stack_one(q):
        C, l, u, rho = stack_constraints(q, options)
        m = C.shape[0]
        m_pad = int(np.ceil(m / n_row_shards) * n_row_shards)
        return (_pad_rows(C, m_pad, 0.0), _pad_rows(l, m_pad, -jnp.inf),
                _pad_rows(u, m_pad, 1.0), _pad_rows(rho, m_pad, options.rho))

    C, l, u, rho = jax.vmap(stack_one)(qp)
    m = C.shape[1]

    if options.row_normalize:
        rn = jnp.sqrt(jnp.sum(C * C, axis=-1))
        E = jnp.where(rn > 1e-12, 1.0 / rn, 1.0)
    else:
        E = jnp.ones((B, m), dt)
    C = C * E[..., None]
    l = E * l
    u = E * u

    sigma = jnp.asarray(options.sigma, dt)
    alpha = jnp.asarray(options.alpha, dt)

    def lane_solve(Q_l, c_l, C_s, l_s, u_s, rho_s, x0, y0_s, z0_s):
        # one scenario: local row shard + psum over the model axis — the
        # same math as solve_qp_model_parallel.local_solve
        CtpC = lax.psum((C_s.T * rho_s) @ C_s, model_axis)
        K = Q_l + sigma * jnp.eye(n, dtype=dt) + CtpC
        S = 1.0 / jnp.sqrt(jnp.diagonal(K))
        Ks = K * S[:, None] * S[None, :]
        Ls = jnp.linalg.cholesky(Ks)
        eye = jnp.eye(n, dtype=dt)
        Lsi = lax.linalg.triangular_solve(Ls, eye, left_side=True,
                                          lower=True)
        Kinv = (Lsi.T @ Lsi) * S[:, None] * S[None, :]
        rho_inv_s = 1.0 / rho_s

        def body(_, carry):
            x, z_s, y_s = carry
            ctw = lax.psum(C_s.T @ (rho_s * z_s - y_s), model_axis)
            rhs = sigma * x - c_l + ctw
            x_t = Kinv @ rhs
            z_t_s = C_s @ x_t
            x_n = alpha * x_t + (1 - alpha) * x
            z_rel = alpha * z_t_s + (1 - alpha) * z_s
            z_n = jnp.clip(z_rel + rho_inv_s * y_s, l_s, u_s)
            y_n = y_s + rho_s * (z_rel - z_n)
            return x_n, z_n, y_n

        x, z_s, y_s = lax.fori_loop(0, options.max_iter, body,
                                    (x0, z0_s, y0_s))
        r_prim = lax.pmax(jnp.max(jnp.abs(C_s @ x - z_s),
                                  initial=jnp.zeros((), dt)), model_axis)
        cty = lax.psum(C_s.T @ y_s, model_axis)
        r_dual = jnp.max(jnp.abs(Q_l @ x + c_l + cty))
        return x, z_s, y_s, r_prim, r_dual

    if warm_start is not None:
        x0 = warm_start.x
        y0 = jax.vmap(lambda w: _pad_rows(w, m, 0.0))(warm_start.y) / E
        z0 = jax.vmap(lambda w: _pad_rows(w, m, 0.0))(warm_start.z) * E
    else:
        x0 = jnp.zeros((B, n), dt)
        y0 = jnp.zeros((B, m), dt)
        z0 = jnp.zeros((B, m), dt)

    local = jax.vmap(lane_solve)   # over the LOCAL batch shard
    b, mx = batch_axis, model_axis
    mapped = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(b, None, None), P(b, None), P(b, mx, None), P(b, mx),
                  P(b, mx), P(b, mx), P(b, None), P(b, mx), P(b, mx)),
        out_specs=(P(b, None), P(b, mx), P(b, mx), P(b), P(b)),
        check_vma=False)
    x, z, y, r_prim, r_dual = jax.jit(mapped)(qp.Q, qp.c, C, l, u, rho,
                                              x0, y0, z0)
    y = E * y
    z = z / E

    eps_floor = 25.0 * float(jnp.finfo(dt).eps)
    conv = ((r_prim <= max(options.eps_abs, eps_floor) * 10)
            & (r_dual <= max(options.eps_abs, eps_floor) * 10))
    status = jnp.where(conv, STATUS_SOLVED, STATUS_MAX_ITER).astype(jnp.int32)
    return QPSolution(x=x, y=y, z=z, status=status,
                      iterations=jnp.full((B,), options.max_iter, jnp.int32),
                      primal_residual=r_prim, dual_residual=r_dual)
