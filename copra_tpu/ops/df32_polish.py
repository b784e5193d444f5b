"""Compensated-f32 (df32) fixed-point polish for the stagewise engine.

The fused f32 tick kernel converges to an accuracy FLOOR of ~2e-5 on
1e4-curvature MPC problems (the config-1 class) — measured to be f32
rounding amplified through the Riccati sweeps, with gain quantization,
product rounding and carry rounding each independently above the 1e-5
golden contract (see :mod:`.df32` module docstring).  Running MORE f32
iterations cannot help; running the same iteration in df32 arithmetic
reaches ~1e-12.

Production recipe (validated on the config-1 workload): converge
cheaply in f32 (the fused kernel), then run a few dozen df32
iterations of the SAME ADMM update from the delivered warm state —
each polish iteration contracts the residual floor error at the
iteration's linear rate (measured: 9.5e-6 -> 3.2e-6 at 50 polish
iters, 1.4e-6 at 100; the polish fixed point itself sits at e-12).

The iteration mirrors ``solve_stagewise``/``_tick_compute``
update-for-update (assembly -> backward sweep -> forward rollout ->
relax/project/dual); constants are split hi+lo from an f64 Riccati
recursion on the HOST in numpy (the ``plan.make_seed_map`` precedent —
f64 on TPU is emulated and slow, and numpy keeps the build independent
of ``jax_enable_x64``), and every runtime op is a pure f32 VPU op
composed via :mod:`.df32`.  Reference accuracy bar: the golden control
tolerance 2e-4 (``/root/reference/test/TestTimeInvariantSystems.cpp``)
and BASELINE.md's 1e-5 target.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from .._precision import highest_precision
from .df32 import (df_add, df_clip, df_mul_f, df_mul_presplit, df_sub,
                   df_to_f32)

Array = jnp.ndarray

_F32 = jnp.float32


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Df32PolishPlan:
    """Per-problem df32 constants (batched leading lane axis).

    Constants that multiply iterate values are stored as Veltkamp
    pre-split triples ``(hh, hl, l)``: ``hh + hl`` is the (exactly
    split) f32 hi part, ``l`` the df32 lo part — the hot products skip
    the runtime split (:func:`.df32.df_mul_presplit`).
    """

    # dynamics (exact f32 data, multiplied via df_mul_f)
    A: Array                 # [B, N, x, x]
    Bm: Array                # [B, N, x, u]
    d: Array                 # [B, N, x]
    # gains (f64 -> presplit df32)
    K: Tuple[Array, Array, Array]    # [B, N, u, x] each
    nF: Tuple[Array, Array, Array]   # [B, N, u, u]
    qb: Tuple[Array, Array]  # [B, N+1, x]: qx + avd folded (f64)
    rb: Tuple[Array, Array]  # [B, N, u]:   ru + bvd folded (f64)
    # boxes
    rho_x: Array             # [B, N+1, x] (rho or 0, exact f32)
    rho_u: Array             # [B, N, u]
    irx: Tuple[Array, Array, Array]  # presplit 1/max(rho_x, tiny)
    iru: Tuple[Array, Array, Array]
    xlb: Array; xub: Array   # exact f32 data (may be +/-inf)
    ulb: Array; uub: Array
    # normalized rows (zero-width arrays when r == 0)
    Cx: Tuple[Array, Array, Array]   # [B, N, r, x] presplit
    Cu: Tuple[Array, Array, Array]   # [B, N, r, u]
    slo: Tuple[Array, Array]         # [B, N, r] df32 clip bounds
    shi: Tuple[Array, Array]
    rho_s: Array                     # [B, N, r] (exact f32 data)
    irs: Tuple[Array, Array, Array]


def _df(a64: np.ndarray) -> Tuple[Array, Array]:
    hi = a64.astype(np.float32)
    # +/-inf rows (unbounded sides) would mint NaN lo via inf - inf
    fin = np.isfinite(a64)
    lo = (np.where(fin, a64, 0.0)
          - np.where(fin, hi.astype(np.float64), 0.0)
          ).astype(np.float32)
    return jnp.asarray(hi), jnp.asarray(lo)


def _df_presplit(a64: np.ndarray) -> Tuple[Array, Array, Array]:
    hi = a64.astype(np.float32)
    lo = (a64 - hi.astype(np.float64)).astype(np.float32)
    c = np.float32(4097.0) * hi
    hh = c - (c - hi)
    return jnp.asarray(hh), jnp.asarray(hi - hh), jnp.asarray(lo)


def build_df32_polish_plan(sqp, options, Es: Optional[Array] = None,
                           rho_s: Optional[Array] = None
                           ) -> Df32PolishPlan:
    """Build the polish constants on the HOST in numpy f64.

    ``sqp`` is the batched StagewiseQP (f32 data); ``Es``/``rho_s`` are
    the f32 row normalization and per-row penalties ALREADY USED by the
    f32 phase (``FusedStagewisePlan.Es``/``.rho_s``) — the incoming
    warm tuple's ``zS``/``yS`` live in that scaled space, so the polish
    must reuse the exact same f32 values as data.

    The f64 Riccati gain recursion here mirrors
    :func:`.stagewise_kernel.precompute_lqr_gains` (which runs in the
    problem dtype); only the per-row ``rho`` masks and ``Es`` values
    are shared bit-for-bit with the f32 phase — rho/sigma enter the
    ADMM *operator*, not its fixed point, so f64 lifts are safe.
    """
    f64 = np.float64
    g = lambda a: np.asarray(jax.device_get(a), f64)

    if sqp.A.ndim == 3:
        sqp = jax.tree_util.tree_map(lambda a: a[None], sqp)
    B0 = sqp.A.shape[0]
    N, x, u, r = sqp.horizon, sqp.xdim, sqp.udim, sqp.nr_rows
    rho = f64(np.float32(options.rho))
    sigma = f64(np.float32(options.sigma))

    A = g(sqp.A); Bm = g(sqp.B); d = g(sqp.d)
    Qx = g(sqp.Qx); qx = g(sqp.qx); Ru = g(sqp.Ru); ru = g(sqp.ru)
    xlb = g(sqp.xlb); xub = g(sqp.xub)
    ulb = g(sqp.ulb); uub = g(sqp.uub)

    big = np.finfo(np.float32).max / 8.0
    rho_x = np.where((xlb > -big) | (xub < big), rho, 0.0)
    rho_u = np.where((ulb > -big) | (uub < big), rho, 0.0)

    eye_x = np.eye(x); eye_u = np.eye(u)
    Qx_r = Qx + sigma * eye_x + rho_x[..., None] * eye_x
    Ru_r = Ru + sigma * eye_u + rho_u[..., None] * eye_u

    if r > 0:
        if Es is None or rho_s is None:
            raise ValueError(
                "build_df32_polish_plan: row problems need the f32 "
                "phase's Es / rho_s (FusedStagewisePlan.Es / .rho_s)")
        Es64 = g(Es)
        rho_s64 = g(rho_s)
        Cxn = g(sqp.Cx) * Es64[..., None]
        Cun = g(sqp.Cu) * Es64[..., None]
        slo = g(sqp.clo) * Es64
        shi = g(sqp.chi) * Es64
        Qx_r[:, :N] += np.einsum("bkrx,bkr,bkry->bkxy", Cxn, rho_s64,
                                 Cxn)
        Ru_r += np.einsum("bkru,bkr,bkrv->bkuv", Cun, rho_s64, Cun)
        S = np.einsum("bkrx,bkr,bkru->bkxu", Cxn, rho_s64, Cun)
    else:
        Cxn = np.zeros((B0, N, 0, x)); Cun = np.zeros((B0, N, 0, u))
        slo = shi = rho_s64 = np.zeros((B0, N, 0))
        S = np.zeros((B0, N, x, u))

    # batched f64 Riccati gains (numpy mirror of precompute_lqr_gains)
    K = np.zeros((B0, N, u, x)); nF = np.zeros((B0, N, u, u))
    avd = np.zeros((B0, N, x)); bvd = np.zeros((B0, N, u))
    V = Qx_r[:, N]
    for k in range(N - 1, -1, -1):
        BtV = np.einsum("bxu,bxy->buy", Bm[:, k], V)
        F = Ru_r[:, k] + BtV @ Bm[:, k]
        G = S[:, k].transpose(0, 2, 1) + BtV @ A[:, k]
        Finv = np.linalg.inv(F)
        Kk = -Finv @ G
        AtV = np.einsum("bxy,bxz->byz", A[:, k], V)
        V = Qx_r[:, k] + AtV @ A[:, k] + G.transpose(0, 2, 1) @ Kk
        V = 0.5 * (V + V.transpose(0, 2, 1))
        K[:, k] = Kk
        nF[:, k] = -Finv
        bvd[:, k] = np.einsum("buy,by->bu", BtV, d[:, k])
        # contract V's column index: avd = (A'V) d, NOT (A'V)' d — the
        # wrong orientation is invisible on d=0 workloads and makes the
        # polish diverge from the true optimum on drifting systems
        avd[:, k] = np.einsum("byz,bz->by", AtV, d[:, k])

    qb = qx.copy()
    qb[:, :N] += avd
    rb = ru + bvd

    tiny = 1e-30
    fl = lambda a: jnp.asarray(a, _F32)
    return Df32PolishPlan(
        A=fl(A), Bm=fl(Bm), d=fl(d),
        K=_df_presplit(K), nF=_df_presplit(nF),
        qb=_df(qb), rb=_df(rb),
        rho_x=fl(rho_x), rho_u=fl(rho_u),
        irx=_df_presplit(1.0 / np.maximum(rho_x, tiny)),
        iru=_df_presplit(1.0 / np.maximum(rho_u, tiny)),
        xlb=fl(xlb), xub=fl(xub), ulb=fl(ulb), uub=fl(uub),
        Cx=_df_presplit(Cxn), Cu=_df_presplit(Cun),
        slo=_df(slo), shi=_df(shi), rho_s=fl(rho_s64),
        irs=_df_presplit(1.0 / np.maximum(rho_s64, tiny)))


def _mul_c(c, idx, xh, xl):
    """Presplit-constant x df32 product; ``idx`` indexes the constant
    triple's leaves (shared by all three parts)."""
    return df_mul_presplit(c[0][idx], c[1][idx], c[2][idx], xh, xl)


def _target_platform(a) -> str:
    """Platform the polish will actually run on: the input array's
    committed device when concrete (a CPU-pinned run inside a
    TPU-default process must get the CPU unroll — ADVICE r4), else the
    process default backend (tracers carry no device)."""
    try:
        devs = a.devices() if callable(getattr(a, "devices", None)) \
            else None
        if devs:
            return next(iter(devs)).platform
    except Exception:               # tracer / abstract value
        pass
    return jax.default_backend()


def _unroll(N: int, platform: str) -> int:
    """Stage-scan unroll factor: the per-stage bodies are dozens of
    tiny elementwise ops, so short horizons are scan-overhead-bound on
    TPU — unrolling them lets XLA fuse across stages (measured: 60
    polish iters 23 -> 9.3 ms device on the config-1 shape).  CPU keeps
    rolled scans: the same unroll inflates CPU x64 compile >10x for no
    runtime need."""
    if platform not in ("tpu", "axon"):
        return 1
    return N if N <= 16 else 4


def _polish_lane(pp: Df32PolishPlan, x0, X0, U0, warm, n_iter: int,
                 alpha: float, sigma: float, platform: str = None):
    """One lane's polish: all-df32 mirror of ``solve_stagewise``'s
    ``one_iter`` (assembly -> bwd sweep -> fwd rollout -> project).

    Shapes (lane-local): x0 [x]; X0 [N+1, x]; U0 [N, u]; warm leaves
    f32 in the f32 phase's (row-normalized) space.
    """
    N = pp.A.shape[0]
    x, u = pp.A.shape[-1], pp.Bm.shape[-1]
    r = pp.rho_s.shape[-1]
    al = jnp.asarray(np.float32(alpha), _F32)
    oma = jnp.asarray(np.float32(1.0) - np.float32(alpha), _F32)
    sg = jnp.asarray(np.float32(sigma), _F32)
    zero = jnp.zeros((), _F32)

    zX, zU, yX, yU, zS, yS = warm
    z0 = lambda a: jnp.zeros_like(a)
    carry0 = ((zX, z0(zX)), (zU, z0(zU)), (yX, z0(yX)), (yU, z0(yU)),
              (zS, z0(zS)), (yS, z0(yS)), (X0, z0(X0)), (U0, z0(U0)))

    box_x = pp.rho_x > 0
    box_u = pp.rho_u > 0
    idx_all = tuple()

    def iteration(carry, _):
        (zXh, zXl), (zUh, zUl), (yXh, yXl), (yUh, yUl), (zSh, zSl), \
            (ySh, ySl), (wXh, wXl), (wUh, wUl) = carry

        # ---- assembly: qs = qb - (rho_x zX - yX) - sigma wX ----
        th, tl = df_mul_f(zXh, zXl, pp.rho_x)
        th, tl = df_sub(th, tl, yXh, yXl)
        qsh, qsl = df_sub(pp.qb[0], pp.qb[1], th, tl)
        th, tl = df_mul_f(wXh, wXl, sg)
        qsh, qsl = df_sub(qsh, qsl, th, tl)
        th, tl = df_mul_f(zUh, zUl, pp.rho_u)
        th, tl = df_sub(th, tl, yUh, yUl)
        hh, hl = df_sub(pp.rb[0], pp.rb[1], th, tl)
        th, tl = df_mul_f(wUh, wUl, sg)
        hh, hl = df_sub(hh, hl, th, tl)
        if r:
            vSh, vSl = df_mul_f(zSh, zSl, pp.rho_s)
            vSh, vSl = df_sub(vSh, vSl, ySh, ySl)
            for j in range(r):
                for i in range(x):
                    ph, pl = _mul_c(pp.Cx, (slice(None), j, i),
                                    vSh[:, j], vSl[:, j])
                    gh, gl = df_sub(qsh[:N, i], qsl[:N, i], ph, pl)
                    qsh = qsh.at[:N, i].set(gh)
                    qsl = qsl.at[:N, i].set(gl)
                for a in range(u):
                    ph, pl = _mul_c(pp.Cu, (slice(None), j, a),
                                    vSh[:, j], vSl[:, j])
                    gh, gl = df_sub(hh[:, a], hl[:, a], ph, pl)
                    hh = hh.at[:, a].set(gh)
                    hl = hl.at[:, a].set(gl)

        # ---- backward sweep (scan over stages, comps unrolled) ----
        def bwd(v, inp):
            (A_k, B_k, Khh_k, Khl_k, Kl_k, nFhh_k, nFhl_k, nFl_k,
             qsh_k, qsl_k, hh_k, hl_k) = inp
            vh, vl = v
            hp = []
            for a in range(u):
                sh_, sl_ = hh_k[a], hl_k[a]
                for i in range(x):
                    ph, pl = df_mul_f(vh[i], vl[i], B_k[i, a])
                    sh_, sl_ = df_add(sh_, sl_, ph, pl)
                hp.append((sh_, sl_))
            kk = []
            for a in range(u):
                sh_, sl_ = zero, zero
                for b in range(u):
                    ph, pl = df_mul_presplit(
                        nFhh_k[a, b], nFhl_k[a, b], nFl_k[a, b],
                        hp[b][0], hp[b][1])
                    sh_, sl_ = df_add(sh_, sl_, ph, pl)
                kk.append((sh_, sl_))
            vn_h, vn_l = [], []
            for i in range(x):
                sh_, sl_ = qsh_k[i], qsl_k[i]
                for j in range(x):
                    ph, pl = df_mul_f(vh[j], vl[j], A_k[j, i])
                    sh_, sl_ = df_add(sh_, sl_, ph, pl)
                for a in range(u):                 # G'kk == K'h
                    ph, pl = df_mul_presplit(
                        Khh_k[a, i], Khl_k[a, i], Kl_k[a, i],
                        hp[a][0], hp[a][1])
                    sh_, sl_ = df_add(sh_, sl_, ph, pl)
                vn_h.append(sh_); vn_l.append(sl_)
            kkh = jnp.stack([q[0] for q in kk])
            kkl = jnp.stack([q[1] for q in kk])
            return (jnp.stack(vn_h), jnp.stack(vn_l)), (kkh, kkl)

        v0 = (qsh[N], qsl[N])
        _, (kkh, kkl) = lax.scan(
            bwd, v0,
            (pp.A, pp.Bm, pp.K[0], pp.K[1], pp.K[2], pp.nF[0],
             pp.nF[1], pp.nF[2], qsh[:N], qsl[:N], hh, hl),
            reverse=True,
            unroll=_unroll(N, platform or jax.default_backend()))

        # ---- forward rollout ----
        def fwd(xs, inp):
            A_k, B_k, d_k, Khh_k, Khl_k, Kl_k, kkh_k, kkl_k = inp
            xh, xl = xs
            uk = []
            for a in range(u):
                sh_, sl_ = kkh_k[a], kkl_k[a]
                for i in range(x):
                    ph, pl = df_mul_presplit(
                        Khh_k[a, i], Khl_k[a, i], Kl_k[a, i],
                        xh[i], xl[i])
                    sh_, sl_ = df_add(sh_, sl_, ph, pl)
                uk.append((sh_, sl_))
            xn_h, xn_l = [], []
            for i in range(x):
                sh_, sl_ = d_k[i], zero
                for j in range(x):
                    ph, pl = df_mul_f(xh[j], xl[j], A_k[i, j])
                    sh_, sl_ = df_add(sh_, sl_, ph, pl)
                for a in range(u):
                    ph, pl = df_mul_f(uk[a][0], uk[a][1], B_k[i, a])
                    sh_, sl_ = df_add(sh_, sl_, ph, pl)
                xn_h.append(sh_); xn_l.append(sl_)
            ukh = jnp.stack([q[0] for q in uk])
            ukl = jnp.stack([q[1] for q in uk])
            xn = (jnp.stack(xn_h), jnp.stack(xn_l))
            return xn, (ukh, ukl, xn[0], xn[1])

        xs0 = (x0, jnp.zeros_like(x0))
        _, (Uh, Ul, Xth, Xtl) = lax.scan(
            fwd, xs0,
            (pp.A, pp.Bm, pp.d, pp.K[0], pp.K[1], pp.K[2], kkh, kkl),
            unroll=_unroll(N, platform or jax.default_backend()))
        Xh = jnp.concatenate([x0[None], Xth], axis=0)
        Xl = jnp.concatenate([jnp.zeros((1, x), _F32), Xtl], axis=0)

        # ---- relax + project + dual ascent ----
        def relax(vh, vl, zh, zl):
            ah, al_ = df_mul_f(vh, vl, al)
            bh, bl = df_mul_f(zh, zl, oma)
            return df_add(ah, al_, bh, bl)

        Xrh, Xrl = relax(Xh, Xl, zXh, zXl)
        th, tl = _mul_c(pp.irx, idx_all, yXh, yXl)
        ch, cl = df_add(Xrh, Xrl, th, tl)
        ch, cl = df_clip(ch, cl, pp.xlb, z0(pp.xlb), pp.xub, z0(pp.xub))
        zXh_n = jnp.where(box_x, ch, Xrh)
        zXl_n = jnp.where(box_x, cl, Xrl)
        zXh_n = zXh_n.at[0].set(Xh[0])
        zXl_n = zXl_n.at[0].set(Xl[0])
        th, tl = df_sub(Xrh, Xrl, zXh_n, zXl_n)
        th, tl = df_mul_f(th, tl, pp.rho_x)
        yXh_n, yXl_n = df_add(yXh, yXl, th, tl)

        Urh, Url = relax(Uh, Ul, zUh, zUl)
        th, tl = _mul_c(pp.iru, idx_all, yUh, yUl)
        ch, cl = df_add(Urh, Url, th, tl)
        ch, cl = df_clip(ch, cl, pp.ulb, z0(pp.ulb), pp.uub, z0(pp.uub))
        zUh_n = jnp.where(box_u, ch, Urh)
        zUl_n = jnp.where(box_u, cl, Url)
        th, tl = df_sub(Urh, Url, zUh_n, zUl_n)
        th, tl = df_mul_f(th, tl, pp.rho_u)
        yUh_n, yUl_n = df_add(yUh, yUl, th, tl)

        if r:
            sRh = jnp.zeros((N, r), _F32)
            sRl = jnp.zeros((N, r), _F32)
            for j in range(r):
                ah_ = jnp.zeros((N,), _F32)
                al2 = jnp.zeros((N,), _F32)
                for i in range(x):
                    ph, pl = _mul_c(pp.Cx, (slice(None), j, i),
                                    Xh[:N, i], Xl[:N, i])
                    ah_, al2 = df_add(ah_, al2, ph, pl)
                for a in range(u):
                    ph, pl = _mul_c(pp.Cu, (slice(None), j, a),
                                    Uh[:, a], Ul[:, a])
                    ah_, al2 = df_add(ah_, al2, ph, pl)
                sRh = sRh.at[:, j].set(ah_)
                sRl = sRl.at[:, j].set(al2)
            srh, srl = relax(sRh, sRl, zSh, zSl)
            th, tl = _mul_c(pp.irs, idx_all, ySh, ySl)
            ch, cl = df_add(srh, srl, th, tl)
            zSh_n, zSl_n = df_clip(ch, cl, pp.slo[0], pp.slo[1],
                                   pp.shi[0], pp.shi[1])
            th, tl = df_sub(srh, srl, zSh_n, zSl_n)
            th, tl = df_mul_f(th, tl, pp.rho_s)
            ySh_n, ySl_n = df_add(ySh, ySl, th, tl)
        else:
            zSh_n, zSl_n = zSh, zSl
            ySh_n, ySl_n = ySh, ySl

        new = ((zXh_n, zXl_n), (zUh_n, zUl_n), (yXh_n, yXl_n),
               (yUh_n, yUl_n), (zSh_n, zSl_n), (ySh_n, ySl_n),
               (Xh, Xl), (Uh, Ul))
        return new, None

    out, _ = lax.scan(iteration, carry0, None, length=n_iter)
    (zXp, zUp, yXp, yUp, zSp, ySp, Xp, Up) = out
    c = df_to_f32
    return (c(*Xp), c(*Up),
            (c(*zXp), c(*zUp), c(*yXp), c(*yUp), c(*zSp), c(*ySp)))


@highest_precision
def df32_polish(pp: Df32PolishPlan, x0, X, U, warm, n_iter: int,
                options) -> Tuple[Array, Array, tuple]:
    """Polish a batch of delivered stagewise iterates.

    ``x0 [B, x]``; ``X [B, N+1, x]``; ``U [B, N, u]``; ``warm`` the
    6-tuple ``(zX, zU, yX, yU, zS, yS)`` in the f32 phase's (row-
    normalized) space (``zS``/``yS`` may be zero-width).  Returns f32
    ``(X', U', warm')`` — statuses/residuals are the caller's job
    (``solve_stagewise_fused`` recomputes them from the polished
    iterates).
    """
    platform = _target_platform(x0)
    run = jax.vmap(lambda p, x0_, X_, U_, w: _polish_lane(
        p, x0_, X_, U_, w, n_iter, float(options.alpha),
        float(options.sigma), platform))
    return run(pp, x0, X, U, warm)
