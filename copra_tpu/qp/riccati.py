"""Stagewise (uncondensed) MPC solver: Riccati-in-ADMM.

SURVEY.md §5 ("long-context" item): the condensed form is O(N^2) memory in
the horizon and its dense KKT factor is O((Nu)^3).  For long horizons the
TPU-native alternative keeps the QP **sparse and stagewise** — variables
``(X, U)``, dynamics as equality structure — and solves the ADMM x-update
with a Riccati (LQR) sweep: O(N) work per iteration, O(N) memory, scan-
friendly.  Box constraints on states and controls are handled by the ADMM
projection, exactly like the condensed solver's bound rows.

    min  Σ_k 1/2 x_k'Qx_k x_k + qx_k'x_k + 1/2 u_k'Ru_k u_k + ru_k'u_k
    s.t. x_{k+1} = A_k x_k + B_k u_k + d_k,   x_0 fixed,
         xlb <= x <= xub,  ulb <= u <= uub

The Riccati sweep is the classic backward value recursion; every iterate
satisfies the dynamics *exactly* (the reference's replay oracle holds at
1e-10 for every ADMM iterate, not just at convergence).

``from_mpc`` maps the per-step cost/constraint objects onto stagewise data,
so the same user-facing API drives either path; the condensed solver is the
cross-validation oracle in tests.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .._precision import highest_precision
from ..constraints import (Constraint, ControlBoundConstraint,
                           TrajectoryBoundConstraint)
from ..costs import (ControlCost, CostFunction, SimpleControlCost,
                     SimpleTrajectoryCost, TargetCost, TrajectoryCost)
from ..errors import DimensionError
from ..systems import LTISystem, System
from .types import (STATUS_MAX_ITER, STATUS_SOLVED, QPSolution,
                    SolverOptions)

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StagewiseQP:
    """Stagewise box-constrained LQ problem (pytree; vmap for batches)."""

    A: Array       # [N, x, x]
    B: Array       # [N, x, u]
    d: Array       # [N, x]
    Qx: Array      # [N+1, x, x]
    qx: Array      # [N+1, x]
    Ru: Array      # [N, u, u]
    ru: Array      # [N, u]
    x0: Array      # [x]
    xlb: Array     # [N+1, x]
    xub: Array     # [N+1, x]
    ulb: Array     # [N, u]
    uub: Array     # [N, u]

    @property
    def horizon(self) -> int:
        return self.A.shape[-3]

    @property
    def xdim(self) -> int:
        return self.A.shape[-1]

    @property
    def udim(self) -> int:
        return self.B.shape[-1]


def from_mpc(system: System,
             costs: Sequence[CostFunction],
             constraints: Sequence[Constraint]) -> StagewiseQP:
    """Map per-step costs/bound constraints onto stagewise data.

    Supported: TargetCost, per-step TrajectoryCost/SimpleTrajectoryCost,
    per-step ControlCost/SimpleControlCost, per-step
    TrajectoryBoundConstraint, ControlBoundConstraint.  Anything requiring
    cross-stage coupling (Mixed*, full-horizon entries, inequality rows)
    needs the condensed path — raise with that guidance.
    """
    N = system.horizon
    x, u = system.xdim, system.udim
    if isinstance(system, LTISystem):
        A = jnp.broadcast_to(system.A, (N, x, x))
        B = jnp.broadcast_to(system.B, (N, x, u))
        d = jnp.broadcast_to(system.d, (N, x))
    else:
        A, B, d = system.A, system.B, system.d
    dt = A.dtype

    from ..mpc import HESSIAN_RIDGE

    Qx = jnp.zeros((N + 1, x, x), dt)
    qx = jnp.zeros((N + 1, x), dt)
    # same PD ridge on U as the condensed assembly (src/LMPC.cpp:250-251
    # parity) so both paths optimize the identical objective
    Ru = jnp.broadcast_to(HESSIAN_RIDGE * jnp.eye(u, dtype=dt),
                          (N, u, u))
    ru = jnp.zeros((N, u), dt)

    for cost in costs:
        if isinstance(cost, TargetCost):
            M, p, w = cost.M, cost.p, cost.weights
            term_Q = jnp.einsum("rx,r,ry->xy", M, w, M)
            term_q = -jnp.einsum("r,r,rx->x", p, w, M)
            Qx = Qx.at[-1].add(term_Q)
            qx = qx.at[-1].add(term_q)
        elif isinstance(cost, TrajectoryCost) and cost.M.shape[1] == x:
            M, p, w = cost.M, cost.p, cost.weights
            Qs = jnp.einsum("rx,r,ry->xy", M, w, M)
            qs = -jnp.einsum("r,r,rx->x", p, w, M)
            Qx = Qx + Qs[None]
            qx = qx + qs[None]
        elif isinstance(cost, SimpleTrajectoryCost) and cost.p.shape[0] == x:
            w, p = cost.weights, cost.p
            Qx = Qx + jnp.diag(w)[None]
            qx = qx - (w * p)[None]
        elif isinstance(cost, ControlCost) and cost.N.shape[1] == u:
            Nm, p, w = cost.N, cost.p, cost.weights
            Rs = jnp.einsum("ru,r,rv->uv", Nm, w, Nm)
            rs = -jnp.einsum("r,r,ru->u", p, w, Nm)
            Ru = Ru + Rs[None]
            ru = ru + rs[None]
        elif isinstance(cost, SimpleControlCost):
            w, p = cost.weights, cost.p
            if p.shape[0] == u:
                Ru = Ru + jnp.diag(w)[None]
                ru = ru - (w * p)[None]
            else:
                Ru = Ru + jax.vmap(jnp.diag)(w.reshape(N, u))
                ru = ru - (w * p).reshape(N, u)
        else:
            raise DimensionError(
                f"{type(cost).__name__} (or its full-horizon mode) couples "
                f"stages; use the condensed path ('admm' solver) for it.")

    xlb = jnp.full((N + 1, x), -jnp.inf, dt)
    xub = jnp.full((N + 1, x), jnp.inf, dt)
    ulb = jnp.full((N, u), -jnp.inf, dt)
    uub = jnp.full((N, u), jnp.inf, dt)
    for constr in constraints:
        if isinstance(constr, TrajectoryBoundConstraint) \
                and constr.lower_bound.shape[0] == x:
            xlb = jnp.maximum(xlb, constr.lower_bound[None])
            xub = jnp.minimum(xub, constr.upper_bound[None])
        elif isinstance(constr, ControlBoundConstraint):
            lo, up = constr.lower_bound, constr.upper_bound
            if lo.shape[0] != u:
                lo, up = lo.reshape(N, u), up.reshape(N, u)
                ulb = jnp.maximum(ulb, lo)
                uub = jnp.minimum(uub, up)
            else:
                ulb = jnp.maximum(ulb, lo[None])
                uub = jnp.minimum(uub, up[None])
        else:
            raise DimensionError(
                f"{type(constr).__name__} adds general rows; use the "
                f"condensed path ('admm' solver) for it.")

    return StagewiseQP(A=A, B=B, d=d, Qx=Qx, qx=qx, Ru=Ru, ru=ru,
                       x0=system.x0, xlb=xlb, xub=xub, ulb=ulb, uub=uub)


@highest_precision
def lqr_solve(A: Array, B: Array, d: Array, Qx: Array, qx: Array,
              Ru: Array, ru: Array, x0: Array) -> Tuple[Array, Array]:
    """Equality-constrained stagewise LQ solve via one Riccati sweep.

    Backward value recursion (``lax.scan`` reversed) + forward rollout.
    Returns ``(X [N+1,x], U [N,u])``.
    """
    xdim = A.shape[-1]

    def backward(carry, inp):
        V, v = carry
        A_k, B_k, d_k, Q_k, q_k, R_k, r_k = inp
        BtV = B_k.T @ V
        F = R_k + BtV @ B_k
        G = BtV @ A_k
        h = r_k + B_k.T @ v + BtV @ d_k
        # solve the small [u,u] system for gains
        Fch = jnp.linalg.cholesky(F)
        Kk = -lax.linalg.triangular_solve(
            Fch, lax.linalg.triangular_solve(Fch, G, left_side=True,
                                             lower=True),
            left_side=True, lower=True, transpose_a=True)
        kk = -lax.linalg.triangular_solve(
            Fch, lax.linalg.triangular_solve(Fch, h[:, None], left_side=True,
                                             lower=True),
            left_side=True, lower=True, transpose_a=True)[:, 0]
        AtV = A_k.T @ V
        V_n = Q_k + AtV @ A_k + G.T @ Kk
        v_n = q_k + A_k.T @ v + AtV @ d_k + G.T @ kk
        V_n = 0.5 * (V_n + V_n.T)
        return (V_n, v_n), (Kk, kk)

    inputs = (A, B, d, Qx[:-1], qx[:-1], Ru, ru)
    (_, _), (Ks, ks) = lax.scan(backward, (Qx[-1], qx[-1]), inputs,
                                reverse=True)

    def forward(x, inp):
        A_k, B_k, d_k, K_k, k_k = inp
        u_k = K_k @ x + k_k
        x_n = A_k @ x + B_k @ u_k + d_k
        return x_n, (x_n, u_k)

    _, (Xs, Us) = lax.scan(forward, x0, (A, B, d, Ks, ks))
    X = jnp.concatenate([x0[None], Xs], axis=0)
    return X, Us


@highest_precision
def lqr_solve_assoc(A: Array, B: Array, d: Array, Qx: Array, qx: Array,
                    Ru: Array, ru: Array, x0: Array
                    ) -> Tuple[Array, Array]:
    """Log-depth LQ solve via ``lax.associative_scan`` — the genuine
    sequence-parallel Riccati (SURVEY.md §5 long-context item).

    Conditional value functions over stage intervals compose
    associatively.  An interval is the 5-tuple ``(A, b, C, J, eta)``:
    traveling ``x -> y`` costs ``1/2 x'Jx - eta'x`` plus minimum control
    effort ``1/2 s' C^+ s`` for the displacement ``s = y - Ax - b``
    (``C = B R^{-1} B'`` is the effort-weighted reachability Gramian).
    The combine (earlier ``i``, later ``j``) is

        M  = (I + C_i J_j)^{-1}
        A  = A_j M A_i
        b  = A_j M (b_i + C_i eta_j) + b_j
        C  = A_j M C_i A_j' + C_j
        eta= A_i' (I + J_j C_i)^{-1} (eta_j - J_j b_i) + eta_i
        J  = A_i' (I + J_j C_i)^{-1} J_j A_i + J_i

    — verified to machine precision against the serial Riccati recursion
    (``test_riccati.py``).  The backward pass is one reverse associative
    scan (O(log N) depth); gains are then elementwise; the closed-loop
    forward rollout is a second (affine) associative scan.  Same
    signature/result as :func:`lqr_solve`.
    """
    N, x = A.shape[0], A.shape[1]
    dt = A.dtype
    eye = jnp.eye(x, dtype=dt)

    # per-stage interval elements; linear control cost ru is absorbed by
    # the minimum-norm shift u -> u + R^{-1} ru
    Rinv_ru = jnp.linalg.solve(Ru, ru[..., None])[..., 0]
    BRB = jnp.einsum("kxu,kuv,kyv->kxy", B, jnp.linalg.inv(Ru), B)
    elems = (
        jnp.concatenate([A, eye[None]], axis=0),
        jnp.concatenate([d - jnp.einsum("kxu,ku->kx", B, Rinv_ru),
                         jnp.zeros((1, x), dt)], axis=0),
        jnp.concatenate([BRB, jnp.zeros((1, x, x), dt)], axis=0),
        jnp.concatenate([Qx[:-1], Qx[-1][None]], axis=0),
        jnp.concatenate([-qx[:-1], -qx[-1][None]], axis=0),
    )

    def combine(ei, ej):
        A1, b1, C1, J1, h1 = ei
        A2, b2, C2, J2, h2 = ej
        I = jnp.eye(A1.shape[-1], dtype=A1.dtype)

        def mv(Mat, vec):
            return jnp.einsum("...xy,...y->...x", Mat, vec)

        M1 = jnp.linalg.inv(I + C1 @ J2)
        M2 = jnp.linalg.inv(I + J2 @ C1)
        Ac = A2 @ M1 @ A1
        bc = mv(A2 @ M1, b1 + mv(C1, h2)) + b2
        Cc = A2 @ M1 @ C1 @ jnp.swapaxes(A2, -1, -2) + C2
        hc = (jnp.einsum("...yx,...y->...x", A1,
                         mv(M2, h2 - mv(J2, b1))) + h1)
        Jc = jnp.swapaxes(A1, -1, -2) @ M2 @ J2 @ A1 + J1
        return (Ac, bc, Cc, Jc, hc)

    # reverse scan feeds operands as (later-suffix, earlier); our combine
    # takes (earlier, later) — swap
    suffix = lax.associative_scan(lambda a, b: combine(b, a), elems,
                                  axis=0, reverse=True)
    V = suffix[3]            # [N+1, x, x]: V_k
    v = -suffix[4]           # [N+1, x]:    v_k

    # per-step gains from V_{k+1}, v_{k+1} — elementwise (parallel)
    Vn, vn = V[1:], v[1:]
    Rb = Ru + jnp.einsum("kux,kxy,kyv->kuv", jnp.swapaxes(B, -1, -2),
                         Vn, B)
    G = jnp.einsum("kux,kxy,kyz->kuz", jnp.swapaxes(B, -1, -2), Vn, A)
    h = ru + jnp.einsum("kux,kx->ku", jnp.swapaxes(B, -1, -2),
                        vn + jnp.einsum("kxy,ky->kx", Vn, d))
    Ks = -jnp.linalg.solve(Rb, G)
    ks = -jnp.linalg.solve(Rb, h[..., None])[..., 0]

    # closed-loop forward rollout as a second associative (affine) scan
    M_cl = A + jnp.einsum("kxu,kuy->kxy", B, Ks)
    c_cl = jnp.einsum("kxu,ku->kx", B, ks) + d

    def aff_combine(fi, fj):
        # fi earlier: x -> Mi x + ci, then fj
        Mi, ci = fi
        Mj, cj = fj
        return (Mj @ Mi, jnp.einsum("...xy,...y->...x", Mj, ci) + cj)

    Mp, cp = lax.associative_scan(aff_combine, (M_cl, c_cl), axis=0)
    Xs = jnp.einsum("kxy,y->kx", Mp, x0) + cp       # x_1..x_N
    X = jnp.concatenate([x0[None], Xs], axis=0)
    U = jnp.einsum("kux,kx->ku", Ks, X[:-1]) + ks
    return X, U


@highest_precision
def solve_stagewise(sqp: StagewiseQP,
                    options: SolverOptions = SolverOptions(),
                    warm_start=None,
                    parallel_scan: bool = False
                    ) -> Tuple[Array, Array, QPSolution]:
    """Box-constrained stagewise MPC by Riccati-in-ADMM.

    Split ``w = (X_1..N, U_0..N-1)`` vs its box projection ``z``; the
    w-update is one LQR sweep with ``(sigma+rho) I`` added to the stage
    costs, the z-update a clip, warm-startable like the condensed solver.
    Returns ``(X, U, info)``; ``info.x`` is the flattened ``U`` for drop-in
    compatibility with the condensed solution layout.
    """
    N, x, u = sqp.horizon, sqp.xdim, sqp.udim
    dt = sqp.A.dtype
    rho = jnp.asarray(options.rho, dt)
    sigma = jnp.asarray(options.sigma, dt)
    alpha = jnp.asarray(options.alpha, dt)
    reg = sigma + rho

    eyex = jnp.eye(x, dtype=dt)
    eyeu = jnp.eye(u, dtype=dt)
    Qx_r = sqp.Qx + reg * eyex[None]
    Ru_r = sqp.Ru + reg * eyeu[None]

    if warm_start is not None:
        zX0, zU0, yX0, yU0 = warm_start
    elif options.seed != "zero":
        # seed at the clipped unconstrained optimum (one extra sweep):
        # golden-tolerance convergence in ~500 iterations vs ~5e-3 error
        # at 2000 from zeros on the reference fixture
        sweep0 = lqr_solve_assoc if parallel_scan else lqr_solve
        Xu, Uu = sweep0(sqp.A, sqp.B, sqp.d, sqp.Qx, sqp.qx, sqp.Ru,
                        sqp.ru, sqp.x0)
        zX0 = jnp.clip(Xu, sqp.xlb, sqp.xub)
        zU0 = jnp.clip(Uu, sqp.ulb, sqp.uub)
        yX0 = jnp.zeros((N + 1, x), dt)
        yU0 = jnp.zeros((N, u), dt)
    else:
        zX0 = jnp.zeros((N + 1, x), dt)
        zU0 = jnp.zeros((N, u), dt)
        yX0 = jnp.zeros((N + 1, x), dt)
        yU0 = jnp.zeros((N, u), dt)

    def one_iter(carry, _):
        zX, zU, yX, yU, wX, wU = carry
        # w-update: LQR with linear terms shifted by the ADMM penalty,
        # using relaxation state (sigma*w_prev handled via reg split)
        qx_k = sqp.qx - (rho * zX - yX) - sigma * wX
        ru_k = sqp.ru - (rho * zU - yU) - sigma * wU
        sweep = lqr_solve_assoc if parallel_scan else lqr_solve
        X, U = sweep(sqp.A, sqp.B, sqp.d, Qx_r, qx_k, Ru_r, ru_k,
                     sqp.x0)
        Xr = alpha * X + (1 - alpha) * zX
        Ur = alpha * U + (1 - alpha) * zU
        zX_n = jnp.clip(Xr + yX / rho, sqp.xlb, sqp.xub)
        zU_n = jnp.clip(Ur + yU / rho, sqp.ulb, sqp.uub)
        # x_0 is data, not a variable — pin its copy
        zX_n = zX_n.at[0].set(X[0])
        yX_n = yX + rho * (Xr - zX_n)
        yU_n = yU + rho * (Ur - zU_n)
        return (zX_n, zU_n, yX_n, yU_n, X, U), None

    init = (zX0, zU0, yX0, yU0, zX0, zU0)
    (zX, zU, yX, yU, X, U), _ = lax.scan(one_iter, init, None,
                                         length=options.max_iter)

    r_prim = jnp.maximum(jnp.max(jnp.abs(X - zX)), jnp.max(jnp.abs(U - zU)))
    eps_floor = 25.0 * float(jnp.finfo(dt).eps)
    conv = r_prim <= max(options.eps_abs, eps_floor) * 10
    status = jnp.where(conv, STATUS_SOLVED, STATUS_MAX_ITER).astype(jnp.int32)
    info = QPSolution(
        x=U.reshape(-1), y=jnp.concatenate([yX.reshape(-1), yU.reshape(-1)]),
        z=jnp.concatenate([zX.reshape(-1), zU.reshape(-1)]),
        status=status, iterations=jnp.asarray(options.max_iter, jnp.int32),
        primal_residual=r_prim,
        dual_residual=jnp.asarray(0.0, dt))
    return X, U, info


def solve_mpc_stagewise(system: System,
                        costs: Sequence[CostFunction] = (),
                        constraints: Sequence[Constraint] = (),
                        options: SolverOptions = SolverOptions(),
                        warm_start=None,
                        parallel_scan: bool = False):
    """One-call stagewise solve mirroring :func:`copra_tpu.solve_mpc`.

    ``parallel_scan=True`` runs every Riccati sweep in O(log N) depth via
    ``lax.associative_scan`` (:func:`lqr_solve_assoc`).
    """
    sqp = from_mpc(system, costs, constraints)
    return solve_stagewise(sqp, options, warm_start, parallel_scan)
