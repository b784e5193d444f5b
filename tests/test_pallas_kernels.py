"""Fused ADMM Pallas kernels vs the XLA reference path.

Runs in interpreter mode on the CPU test mesh; the kernels' semantics must
match ``solve_qp`` with ``early_exit=False`` bit-for-bit in structure (same
update order), so agreement to f32-roundoff is the contract.  Real-chip
performance is covered by bench.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import copra_tpu as ct
from copra_tpu.ops import fused_admm_box, fused_admm_general
from copra_tpu.qp.admm import stack_constraints


def random_box_qps(batch, n, seed=0):
    rng = np.random.default_rng(seed)
    Ms = rng.normal(size=(batch, n, n))
    Q = np.einsum("bij,bkj->bik", Ms, Ms) + n * np.eye(n)
    c = rng.normal(size=(batch, n))
    lb = rng.uniform(-2.0, -0.5, size=(batch, n))
    ub = rng.uniform(0.5, 2.0, size=(batch, n))
    return ct.DenseQP(
        Q=jnp.asarray(Q), c=jnp.asarray(c),
        Aeq=jnp.zeros((0, n)), beq=jnp.zeros((0,)),
        Aineq=jnp.zeros((0, n)), bineq=jnp.zeros((0,)),
        lb=jnp.asarray(lb), ub=jnp.asarray(ub))


def test_fused_box_matches_xla_path():
    batch, n, iters = 8, 16, 50
    qp = random_box_qps(batch, n)
    opts = ct.SolverOptions(max_iter=iters, early_exit=False, polish=False)
    ref = ct.solve_qp_batched(qp, opts)

    sigma, rho, alpha = opts.sigma, opts.rho, opts.alpha
    K = qp.Q + (sigma + rho) * jnp.eye(n)[None]
    Kinv = jnp.linalg.inv(K)
    zeros = jnp.zeros((batch, n))
    x, y, z, g = fused_admm_box(
        Kinv.astype(jnp.float32), K.astype(jnp.float32),
        qp.c.astype(jnp.float32),
        qp.lb.astype(jnp.float32), qp.ub.astype(jnp.float32),
        zeros.astype(jnp.float32), zeros.astype(jnp.float32),
        zeros.astype(jnp.float32),
        n_iter=iters, sigma=sigma, alpha=alpha, rho=rho, interpret=True)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref.x),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(z), np.asarray(ref.z),
                               rtol=1e-4, atol=1e-4)
    # the in-kernel Q x output (for caller dual residuals) is consistent
    np.testing.assert_allclose(
        np.asarray(g), np.einsum("bij,bj->bi", np.asarray(qp.Q),
                                 np.asarray(x)), rtol=1e-3, atol=1e-3)


def test_fused_box_shared_matches_xla_twin():
    """Shared-operator kernel (one [n,n] pair, MXU-GEMM x-updates) ==
    xla_admm_box with the same shared operators, and both == the batched
    kernel with the operators broadcast."""
    from copra_tpu.ops.admm_kernel import fused_admm_box_shared, xla_admm_box

    batch, n, iters = 12, 16, 50
    rng = np.random.default_rng(3)
    M = rng.normal(size=(n, n))
    Q = jnp.asarray((M @ M.T + n * np.eye(n)).astype(np.float32))
    c = jnp.asarray(rng.normal(size=(batch, n)).astype(np.float32))
    lb = jnp.asarray(rng.uniform(-2.0, -0.5,
                                 size=(batch, n)).astype(np.float32))
    ub = jnp.asarray(rng.uniform(0.5, 2.0,
                                 size=(batch, n)).astype(np.float32))
    opts = ct.SolverOptions(max_iter=iters, early_exit=False)
    sigma, rho, alpha = opts.sigma, opts.rho, opts.alpha
    K = Q + jnp.float32(sigma + rho) * jnp.eye(n, dtype=jnp.float32)
    Kinv = jnp.linalg.inv(K.astype(jnp.float64)).astype(jnp.float32)
    zeros = jnp.zeros((batch, n), jnp.float32)
    args = (Kinv, K, c, lb, ub, zeros, zeros, zeros)
    kw = dict(n_iter=iters, sigma=sigma, alpha=alpha, rho=rho)
    xs, ys, zs, gs = fused_admm_box_shared(*args, interpret=True,
                                           lane_block=8, **kw)   # pads 12->16
    xr, yr, zr, gr = xla_admm_box(*args, **kw)
    for a, b in ((xs, xr), (ys, yr), (zs, zr), (gs, gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)
    # and the batched kernel with broadcast operators agrees too
    Kb = jnp.broadcast_to(Kinv, (batch, n, n))
    Kfb = jnp.broadcast_to(K, (batch, n, n))
    xb, yb, zb, gb = fused_admm_box(Kb, Kfb, c, lb, ub, zeros, zeros,
                                    zeros, interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(xs), np.asarray(xb),
                               rtol=2e-5, atol=2e-5)


def test_fused_box_shared_niter0_is_matvec():
    """n_iter=0 turns the kernel into g = Q x0 (the status matvec)."""
    from copra_tpu.ops.admm_kernel import fused_admm_box_shared

    batch, n = 4, 8
    rng = np.random.default_rng(4)
    M = rng.normal(size=(n, n))
    Q = jnp.asarray((M @ M.T + n * np.eye(n)).astype(np.float32))
    sigma, rho = 1e-6, 0.1
    K = Q + jnp.float32(sigma + rho) * jnp.eye(n, dtype=jnp.float32)
    Kinv = jnp.linalg.inv(K.astype(jnp.float64)).astype(jnp.float32)
    s = jnp.asarray(rng.normal(size=(batch, n)).astype(np.float32))
    zeros = jnp.zeros((batch, n), jnp.float32)
    x, y, z, g = fused_admm_box_shared(
        Kinv, K, zeros, zeros - 10, zeros + 10, s, zeros, zeros,
        n_iter=0, sigma=sigma, alpha=1.6, rho=rho, interpret=True)
    np.testing.assert_allclose(np.asarray(x), np.asarray(s))
    np.testing.assert_allclose(np.asarray(g), np.asarray(s) @ np.asarray(Q),
                               rtol=1e-5, atol=1e-5)


def test_fused_box_solution_quality():
    """Against the exact native oracle, not just the XLA twin."""
    from copra_tpu.qp.native import native_available, solve_qp_native
    if not native_available():
        pytest.skip("native solver unavailable")
    batch, n, iters = 4, 12, 2000
    qp = random_box_qps(batch, n, seed=3)
    opts = ct.SolverOptions(max_iter=iters, early_exit=False, polish=False)
    K = qp.Q + (opts.sigma + opts.rho) * jnp.eye(n)[None]
    Kinv = jnp.linalg.inv(K)
    zeros = jnp.zeros((batch, n), jnp.float32)
    x, _, _, _ = fused_admm_box(
        Kinv.astype(jnp.float32), K.astype(jnp.float32),
        qp.c.astype(jnp.float32),
        qp.lb.astype(jnp.float32), qp.ub.astype(jnp.float32),
        zeros, zeros, zeros,
        n_iter=iters, sigma=opts.sigma, alpha=opts.alpha, rho=opts.rho,
        interpret=True)
    for b in range(batch):
        one = ct.DenseQP.create(qp.Q[b], qp.c[b], lb=qp.lb[b], ub=qp.ub[b])
        ref = solve_qp_native(one)
        np.testing.assert_allclose(np.asarray(x[b]), np.asarray(ref.x),
                                   atol=5e-4)


def test_iter_outer_layout_matches_scenario_layout(monkeypatch):
    """The iteration-outer kernel (refine=0 default; 1.94x on-chip) must be
    bit-compatible with the scenario-outer layout — same math, same update
    order, only the loop nest is swapped."""
    batch, n, iters = 8, 16, 40
    qp = random_box_qps(batch, n, seed=9)
    opts = ct.SolverOptions(max_iter=iters, early_exit=False, polish=False)
    K = (qp.Q + (opts.sigma + opts.rho) * jnp.eye(n)[None]).astype(jnp.float32)
    Kinv = jnp.linalg.inv(K)
    zeros = jnp.zeros((batch, n), jnp.float32)
    args = (Kinv, K, qp.c.astype(jnp.float32), qp.lb.astype(jnp.float32),
            qp.ub.astype(jnp.float32), zeros, zeros, zeros)
    kw = dict(n_iter=iters, sigma=opts.sigma, alpha=opts.alpha,
              rho=opts.rho, refine=0, interpret=True)
    outs = {}
    for layout in ("scenario", "iter_outer"):
        monkeypatch.setenv("COPRA_KERNEL_LAYOUT", layout)
        # the layout is read at trace time: drop the jit cache between runs
        fused_admm_box.clear_cache()
        outs[layout] = fused_admm_box(*args, **kw)
    fused_admm_box.clear_cache()
    for a, b in zip(outs["scenario"], outs["iter_outer"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_fused_general_matches_xla_path():
    batch, n, iters = 4, 10, 60
    rng = np.random.default_rng(1)
    base = random_box_qps(batch, n, seed=2)
    mi = 6
    Aineq = rng.normal(size=(batch, mi, n))
    bineq = rng.uniform(0.5, 1.5, size=(batch, mi))
    qp = ct.DenseQP(Q=base.Q, c=base.c,
                    Aeq=jnp.zeros((batch, 0, n)), beq=jnp.zeros((batch, 0)),
                    Aineq=jnp.asarray(Aineq), bineq=jnp.asarray(bineq),
                    lb=base.lb, ub=base.ub)
    opts = ct.SolverOptions(max_iter=iters, early_exit=False, polish=False)
    ref = ct.solve_qp_batched(qp, opts)

    def prep(q):
        C, l, u, rho = stack_constraints(q, opts)
        K = (q.Q + opts.sigma * jnp.eye(n) + (C.T * rho) @ C)
        return C, l, u, rho, jnp.linalg.inv(K)

    C, l, u, rho, Kinv = jax.vmap(prep)(qp)
    m = C.shape[1]
    zn = jnp.zeros((batch, n), jnp.float32)
    zm = jnp.zeros((batch, m), jnp.float32)
    x, y, z = fused_admm_general(
        Kinv.astype(jnp.float32), C.astype(jnp.float32),
        qp.c.astype(jnp.float32), l.astype(jnp.float32),
        u.astype(jnp.float32), rho.astype(jnp.float32),
        zn, zm, zm,
        n_iter=iters, sigma=opts.sigma, alpha=opts.alpha, interpret=True)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref.x),
                               rtol=1e-4, atol=1e-4)


def test_solve_qp_batched_fused_matches_xla():
    """The batched fused entry point (bench fast path) vs solve_qp_batched."""
    from copra_tpu.ops.admm_kernel import solve_qp_batched_fused
    batch, n, iters = 8, 12, 200
    qp = random_box_qps(batch, n, seed=5)
    qp32 = ct.DenseQP(Q=qp.Q.astype(jnp.float32), c=qp.c.astype(jnp.float32),
                      Aeq=qp.Aeq, beq=qp.beq, Aineq=qp.Aineq,
                      bineq=qp.bineq, lb=qp.lb.astype(jnp.float32),
                      ub=qp.ub.astype(jnp.float32))
    opts = ct.SolverOptions(max_iter=iters, early_exit=False, polish=False)
    ref = ct.solve_qp_batched(qp, opts)
    sol = solve_qp_batched_fused(qp32, opts)
    np.testing.assert_allclose(np.asarray(sol.x), np.asarray(ref.x),
                               rtol=1e-3, atol=1e-4)
    assert sol.status.shape == (batch,)


def test_solve_qp_batched_fused_with_polish_and_warm():
    from copra_tpu.ops.admm_kernel import solve_qp_batched_fused
    batch, n = 4, 10
    qp = random_box_qps(batch, n, seed=6)
    qp32 = ct.DenseQP(Q=qp.Q.astype(jnp.float32), c=qp.c.astype(jnp.float32),
                      Aeq=qp.Aeq, beq=qp.beq, Aineq=qp.Aineq,
                      bineq=qp.bineq, lb=qp.lb.astype(jnp.float32),
                      ub=qp.ub.astype(jnp.float32))
    opts = ct.SolverOptions(max_iter=500, early_exit=False, polish=True)
    s1 = solve_qp_batched_fused(qp32, opts)
    warm = ct.WarmStart(x=s1.x, y=s1.y, z=s1.z)
    s2 = solve_qp_batched_fused(qp32, opts, warm)
    np.testing.assert_allclose(np.asarray(s2.x), np.asarray(s1.x), atol=1e-5)
    # against the exact oracle
    from copra_tpu.qp.native import native_available, solve_qp_native
    if native_available():
        for b in range(batch):
            one = ct.DenseQP.create(qp.Q[b], qp.c[b], lb=qp.lb[b],
                                    ub=qp.ub[b])
            exact = solve_qp_native(one)
            np.testing.assert_allclose(np.asarray(s1.x[b]),
                                       np.asarray(exact.x), atol=5e-4)


@pytest.mark.parametrize("assume_zero,refine", [(False, 0), (False, 1),
                                                (True, 0)])
def test_lanes_kernel_matches_xla_twin(assume_zero, refine):
    """Lane-major distinct-operator kernel (VERDICT r4 #2) vs the XLA
    twin: same update order, f32-roundoff agreement, incl. the
    identity-padded non-multiple-of-8 n, the padded lane tail, and the
    K-free zero-x0 fast path (g via the w-recurrence)."""
    from copra_tpu.ops.admm_kernel import (fused_admm_box_lanes,
                                           pack_lanes_operator,
                                           xla_admm_box)
    rng = np.random.default_rng(3)
    B, n, iters = 150, 13, 40          # B % 128 != 0, n % 8 != 0
    Ms = rng.normal(size=(B, n, n))
    Q = (np.einsum("bij,bkj->bik", Ms, Ms) + 0.5 * np.eye(n)) \
        .astype(np.float32)
    sigma, rho, alpha = 1e-6, 0.2, 1.6
    K = Q + np.float32(sigma + rho) * np.eye(n, dtype=np.float32)
    Kinv = np.linalg.inv(K).astype(np.float32)
    c = rng.normal(size=(B, n)).astype(np.float32)
    l = np.full((B, n), -0.5, np.float32)
    u = np.full((B, n), 0.5, np.float32)
    z = np.zeros((B, n), np.float32)
    args = dict(n_iter=iters, sigma=sigma, alpha=alpha, rho=rho,
                refine=refine)
    ref = xla_admm_box(jnp.asarray(Kinv), jnp.asarray(K), c, l, u,
                       z, z, z, **args)
    KL = pack_lanes_operator(jnp.asarray(Kinv))
    KfL = pack_lanes_operator(jnp.asarray(K))
    got = fused_admm_box_lanes(KL, KfL, c, l, u, z, z, z,
                               assume_x0_zero=assume_zero,
                               interpret=True, **args)
    for name, a, b in zip("xyzg", ref, got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=0, atol=2e-4,
                                   err_msg=f"lanes kernel {name}")


def test_lanes_kernel_niter0_is_matvec():
    """n_iter=0 returns g = Q x0 (the plan path's status matvec)."""
    from copra_tpu.ops.admm_kernel import (fused_admm_box_lanes,
                                           pack_lanes_operator)
    rng = np.random.default_rng(5)
    B, n = 40, 10
    Ms = rng.normal(size=(B, n, n))
    Q = (np.einsum("bij,bkj->bik", Ms, Ms) + np.eye(n)).astype(np.float32)
    sigma, rho = 1e-6, 0.3
    K = Q + np.float32(sigma + rho) * np.eye(n, dtype=np.float32)
    Kinv = np.linalg.inv(K).astype(np.float32)
    x0 = rng.normal(size=(B, n)).astype(np.float32)
    zeros = np.zeros((B, n), np.float32)
    big = np.full((B, n), 1e8, np.float32)
    g = fused_admm_box_lanes(
        pack_lanes_operator(jnp.asarray(Kinv)),
        pack_lanes_operator(jnp.asarray(K)),
        zeros, -big, big, x0, zeros, zeros,
        n_iter=0, sigma=sigma, alpha=1.6, rho=rho, interpret=True)[3]
    want = np.einsum("bij,bj->bi", Q, x0)
    np.testing.assert_allclose(np.asarray(g), want, rtol=0, atol=2e-4)
