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
        self.G = take(u * x)
        self.seq_rows = _pad8(off)
        off = self.seq_rows
        self.bvd = take(u)
        self.avd = take(x)
        self.qb = take(x)
        self.rb = take(u)
        self.rhox = take(x)
        self.rhou = take(u)
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


def _tick_kernel(n_iter: int, N: int, lo: _Layout, sigma: float,
                 alpha: float, plan_ref, x0_ref, warm_in_ref, warm_ref,
                 work_ref):
    """All ``n_iter`` ADMM iterations for one lane sub-batch, in VMEM.

    ``warm_ref`` aliases ``warm_in_ref`` (same buffer); ``work_ref``
    carries (X, U, shifted linear costs).  Bulk updates are full-array
    VPU ops over all stages at once; the two sweeps are lane-vectorized
    scalar recursions (the only sequential code on the chip).
    """
    x, u, r = lo.x, lo.u, lo.r
    oma = 1.0 - alpha
    tiny = 1e-30

    # bulk views of the iteration-invariant plan rows
    qb = plan_ref[:, lo.qb:lo.qb + x, :]             # [N+1, x, sb]
    rhox = plan_ref[:, lo.rhox:lo.rhox + x, :]
    xlb = plan_ref[:, lo.xlb:lo.xlb + x, :]
    xub = plan_ref[:, lo.xub:lo.xub + x, :]
    rb = plan_ref[:N, lo.rb:lo.rb + u, :]            # [N, u, sb]
    rhou = plan_ref[:N, lo.rhou:lo.rhou + u, :]
    ulb = plan_ref[:N, lo.ulb:lo.ulb + u, :]
    uub = plan_ref[:N, lo.uub:lo.uub + u, :]
    avd = plan_ref[:N, lo.avd:lo.avd + x, :]
    bvd = plan_ref[:N, lo.bvd:lo.bvd + u, :]
    if r:
        Cxb = plan_ref[:N, lo.Cx:lo.Cx + r * x, :]   # [N, r*x, sb]
        Cub = plan_ref[:N, lo.Cu:lo.Cu + r * u, :]
        slo = plan_ref[:N, lo.slo:lo.slo + r, :]
        shi = plan_ref[:N, lo.shi:lo.shi + r, :]
        rhos = plan_ref[:N, lo.rhos:lo.rhos + r, :]

    # proximal center (wX, wU) starts at (zX0, zU0), as in the XLA path
    work_ref[:, lo.X:lo.X + x, :] = warm_ref[:, lo.zX:lo.zX + x, :]
    work_ref[:N, lo.U:lo.U + u, :] = warm_ref[:N, lo.zU:lo.zU + u, :]

    def iteration(_, carry):
        zX = warm_ref[:, lo.zX:lo.zX + x, :]
        yX = warm_ref[:, lo.yX:lo.yX + x, :]
        zU = warm_ref[:N, lo.zU:lo.zU + u, :]
        yU = warm_ref[:N, lo.yU:lo.yU + u, :]
        wX = work_ref[:, lo.X:lo.X + x, :]
        wU = work_ref[:N, lo.U:lo.U + u, :]

        # ---- bulk: shifted linear costs (parallel over stages) ----
        qs = qb - (rhox * zX - yX) - sigma * wX
        qs = qs.at[:N].add(avd)
        rs = rb - (rhou * zU - yU) - sigma * wU + bvd
        if r:
            zS = warm_ref[:N, lo.zS:lo.zS + r, :]
            yS = warm_ref[:N, lo.yS:lo.yS + r, :]
            vS = rhos * zS - yS                      # [N, r, sb]
            for j in range(r):
                vSj = vS[:, j:j + 1, :]
                qs = qs.at[:N].add(
                    -Cxb[:, j * x:(j + 1) * x, :] * vSj)
                rs = rs - Cub[:, j * u:(j + 1) * u, :] * vSj
        work_ref[:, lo.qs:lo.qs + x, :] = qs
        work_ref[:N, lo.h:lo.h + u, :] = rs

        # ---- backward linear sweep: v_k, kk_k (sequential) ----
        v0 = tuple(work_ref[N, lo.qs + i, :] for i in range(x))

        def bwd(i, v):
            k = N - 1 - i
            ck = plan_ref[k, 0:lo.seq_rows, :]       # [seq_rows, sb]
            wk = work_ref[k, 0:lo.Kw, :]
            h = [wk[lo.h + a]
                 + sum(ck[lo.B + i2 * u + a] * v[i2] for i2 in range(x))
                 for a in range(u)]
            kk = [sum(ck[lo.nF + a * u + b] * h[b] for b in range(u))
                  for a in range(u)]
            for a in range(u):
                work_ref[k, lo.h + a, :] = kk[a]
            v_n = tuple(
                wk[lo.qs + i2]
                + sum(ck[lo.A + j * x + i2] * v[j] for j in range(x))
                + sum(ck[lo.G + a * x + i2] * kk[a] for a in range(u))
                for i2 in range(x))
            return v_n

        lax.fori_loop(0, N, bwd, v0)

        # ---- forward rollout: X, U (sequential) ----
        xs0 = tuple(x0_ref[i, :] for i in range(x))
        for i in range(x):
            work_ref[0, lo.X + i, :] = xs0[i]

        def fwd(k, xs):
            ck = plan_ref[k, 0:lo.seq_rows, :]
            uk = [work_ref[k, lo.h + a, :]
                  + sum(ck[lo.K + a * x + i2] * xs[i2] for i2 in range(x))
                  for a in range(u)]
            for a in range(u):
                work_ref[k, lo.U + a, :] = uk[a]
            x_n = tuple(
                ck[lo.d + i2]
                + sum(ck[lo.A + i2 * x + j] * xs[j] for j in range(x))
                + sum(ck[lo.B + i2 * u + a] * uk[a] for a in range(u))
                for i2 in range(x))
            for i2 in range(x):
                work_ref[k + 1, lo.X + i2, :] = x_n[i2]
            return x_n

        lax.fori_loop(0, N, fwd, xs0)

        # ---- bulk: relaxation + projections + dual ascent ----
        X = work_ref[:, lo.X:lo.X + x, :]
        U = work_ref[:N, lo.U:lo.U + u, :]
        Xr = alpha * X + oma * zX
        Ur = alpha * U + oma * zU
        zXn = jnp.where(rhox > 0,
                        jnp.clip(Xr + yX / jnp.maximum(rhox, tiny),
                                 xlb, xub), Xr)
        zXn = zXn.at[0].set(X[0])                    # x_0 is data
        zUn = jnp.where(rhou > 0,
                        jnp.clip(Ur + yU / jnp.maximum(rhou, tiny),
                                 ulb, uub), Ur)
        warm_ref[:, lo.zX:lo.zX + x, :] = zXn
        warm_ref[:, lo.yX:lo.yX + x, :] = yX + rhox * (Xr - zXn)
        warm_ref[:N, lo.zU:lo.zU + u, :] = zUn
        warm_ref[:N, lo.yU:lo.yU + u, :] = yU + rhou * (Ur - zUn)
        if r:
            rows = []
            for j in range(r):
                sj = sum(Cxb[:, j * x + i2:j * x + i2 + 1, :]
                         * X[:N, i2:i2 + 1, :] for i2 in range(x))
                sj = sj + sum(Cub[:, j * u + a:j * u + a + 1, :]
                              * U[:, a:a + 1, :] for a in range(u))
                rows.append(sj)
            s = jnp.concatenate(rows, axis=1)        # [N, r, sb]
            sr = alpha * s + oma * zS
            zSn = jnp.clip(sr + yS / rhos, slo, shi)
            warm_ref[:N, lo.zS:lo.zS + r, :] = zSn
            warm_ref[:N, lo.yS:lo.yS + r, :] = yS + rhos * (sr - zSn)
        return carry

    lax.fori_loop(jnp.int32(0), jnp.int32(n_iter), iteration,
                  jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("n_iter", "N", "x", "u", "r",
                                             "sigma", "alpha", "interpret"))
def fused_stagewise_tick(plan: Array, x0: Array, warm: Array, *,
                         n_iter: int, N: int, x: int, u: int, r: int,
                         sigma: float, alpha: float,
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
    kern = functools.partial(_tick_kernel, n_iter, N, lo, float(sigma),
                             float(alpha))
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)

    def one_chunk(args):
        p, x0c, w = args
        return pl.pallas_call(
            kern,
            in_specs=[vspec] * 3,
            out_specs=(vspec, vspec),
            out_shape=(jax.ShapeDtypeStruct(w.shape, w.dtype),
                       jax.ShapeDtypeStruct((N + 1, lo.Kw, LANES),
                                            w.dtype)),
            input_output_aliases={2: 0},
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
    lo = _Layout(x, u, r)
    rho = jnp.asarray(options.rho, dt)
    sigma = jnp.asarray(options.sigma, dt)

    rho_x = jnp.where(jnp.isfinite(sqp.xlb) | jnp.isfinite(sqp.xub),
                      rho, jnp.zeros((), dt))          # [B, N+1, x]
    rho_u = jnp.where(jnp.isfinite(sqp.ulb) | jnp.isfinite(sqp.uub),
                      rho, jnp.zeros((), dt))          # [B, N, u]

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
    parts = [None] * lo.C
    cols = jnp.zeros((B0, N + 1, lo.C), dt)

    def put(off, a):
        nonlocal cols
        cols = lax.dynamic_update_slice(cols, a, (0, 0, off))

    put(lo.A, stage_pad(sqp.A, x * x))
    put(lo.B, stage_pad(sqp.B, x * u))
    put(lo.d, stage_pad(sqp.d, x))
    put(lo.K, stage_pad(gains.K, u * x))
    put(lo.nF, stage_pad(gains.nF, u * u))
    put(lo.G, stage_pad(gains.G, u * x))
    put(lo.bvd, stage_pad(gains.bvd, u))
    put(lo.avd, stage_pad(gains.avd, x))
    put(lo.qb, sqp.qx)
    put(lo.rb, stage_pad(sqp.ru, u))
    put(lo.rhox, rho_x)
    put(lo.rhou, stage_pad(rho_u, u))
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
    from .. import qp as _qp
    from ..qp.types import STATUS_MAX_ITER, STATUS_SOLVED, QPSolution

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
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
        interpret=bool(interpret))

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
        r_dual = jax.vmap(stagewise_dual_residual)(sqp, X, U, yX, yU,
                                                   yS_orig)
    else:
        yS_orig = yS
        r_dual = jax.vmap(
            lambda s, a, b, c, dd: stagewise_dual_residual(s, a, b, c, dd)
        )(sqp, X, U, yX, yU)
    eps_floor = 25.0 * float(jnp.finfo(dt).eps)
    eps = max(options.eps_abs, eps_floor) * 10
    conv = (r_prim <= eps) & (r_dual <= eps * jax.vmap(_dual_scale)(sqp))
    status = jnp.where(conv, STATUS_SOLVED, STATUS_MAX_ITER
                       ).astype(jnp.int32)
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
