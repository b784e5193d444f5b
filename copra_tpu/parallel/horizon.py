"""Horizon-sharded (sequence-parallel) LQR over a device mesh.

The multi-chip completion of the log-depth Riccati
(:func:`copra_tpu.qp.riccati.lqr_solve_assoc`): stages are sharded over a
``"seq"`` mesh axis; each shard runs a LOCAL associative suffix scan over
its interval elements, the per-shard TOTAL elements (one 5-tuple of x-by-x
matrices per shard) are exchanged with one ``all_gather`` over ICI, folded
into cross-shard suffixes, and spliced onto the local scans.  The
closed-loop rollout uses the same structure on affine maps.  Total
cross-device traffic: O(D · x^2) — independent of N.

This is where the associative formulation pays off: a serial Riccati sweep
cannot cross device boundaries without D round trips per solve, while this
path needs one collective each way.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from .._precision import highest_precision

Array = jax.Array

SEQ_AXIS = "seq"


def _combine(ei, ej):
    """Interval-element combine, (earlier, later) — see lqr_solve_assoc."""
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
    hc = jnp.einsum("...yx,...y->...x", A1, mv(M2, h2 - mv(J2, b1))) + h1
    Jc = jnp.swapaxes(A1, -1, -2) @ M2 @ J2 @ A1 + J1
    return (Ac, bc, Cc, Jc, hc)


def _identity_elem(x: int, dt) -> Tuple[Array, ...]:
    return (jnp.eye(x, dtype=dt), jnp.zeros((x,), dt),
            jnp.zeros((x, x), dt), jnp.zeros((x, x), dt),
            jnp.zeros((x,), dt))


@highest_precision
def lqr_solve_sharded(A: Array, B: Array, d: Array, Qx: Array, qx: Array,
                      Ru: Array, ru: Array, x0: Array,
                      mesh: Optional[Mesh] = None,
                      axis: str = SEQ_AXIS) -> Tuple[Array, Array]:
    """LQ solve with the horizon sharded over ``axis`` of ``mesh``.

    Same signature/result as :func:`copra_tpu.qp.riccati.lqr_solve`;
    requires ``N`` divisible by the axis size.  ``Qx/qx`` carry ``N+1``
    entries — the terminal pair is split off and folded in via the
    cross-shard suffix, so every shard holds exactly ``N/D`` stages.
    """
    if mesh is None:
        mesh = Mesh(np.asarray(jax.devices()), (axis,))
    D = mesh.shape[axis]
    N = A.shape[0]
    if N % D:
        raise ValueError(f"horizon {N} not divisible by {D} shards")

    eA, eb, eC, eJ, eh, term = _stage_elements(A, B, d, Qx, qx, Ru, ru)
    local = _make_local(axis, D)
    spec = P(axis)
    mapped = jax.shard_map(
        local, mesh=mesh,
        in_specs=(spec, spec, spec, spec, spec, P(), spec, spec, spec,
                  spec, P()),
        out_specs=(spec, spec, spec), check_vma=False)
    X_in, Xs, U = jax.jit(mapped)(eA, eb, eC, eJ, eh, term, B, d, Ru, ru,
                                  x0)
    X = jnp.concatenate([x0[None], Xs], axis=0)
    return X, U


def _stage_elements(A, B, d, Qx, qx, Ru, ru):
    """Interval elements + terminal element for the suffix scan.

    Linear control cost absorbed; see ``lqr_solve_assoc``.
    """
    x = A.shape[1]
    dt = A.dtype
    Rinv_ru = jnp.linalg.solve(Ru, ru[..., None])[..., 0]
    BRB = jnp.einsum("kxu,kuv,kyv->kxy", B, jnp.linalg.inv(Ru), B)
    eA = A
    eb = d - jnp.einsum("kxu,ku->kx", B, Rinv_ru)
    eC = BRB
    eJ = Qx[:-1]
    eh = -qx[:-1]
    term = (jnp.eye(x, dtype=dt), jnp.zeros((x,), dt),
            jnp.zeros((x, x), dt), Qx[-1], -qx[-1])
    return eA, eb, eC, eJ, eh, term


def _make_local(axis: str, D: int):
    """Per-shard LQR solve (suffix scan + collectives over ``axis``)."""

    def local(eA, eb, eC, eJ, eh, term, Bv, dv, Ruv, ruv, x0v):
        x = eA.shape[-1]
        dt = eA.dtype
        elems = (eA, eb, eC, eJ, eh)
        s = lax.axis_index(axis)

        # local suffix scan (within-shard, excludes later shards/terminal)
        loc = lax.associative_scan(lambda a, b: _combine(b, a), elems,
                                   axis=0, reverse=True)
        total = jax.tree_util.tree_map(lambda leaf: leaf[0], loc)

        # exchange per-shard totals (tiny) and build this shard's
        # right-suffix R_s = total_{s+1} (x) ... (x) total_{D-1} (x) term
        gathered = jax.tree_util.tree_map(
            lambda leaf: lax.all_gather(leaf, axis), total)
        R = jax.tree_util.tree_map(lambda leaf: leaf, term)
        ident = _identity_elem(x, dt)
        for k in range(D - 1, -1, -1):
            ek = jax.tree_util.tree_map(lambda leaf: leaf[k], gathered)
            use = k > s
            ek = jax.tree_util.tree_map(
                lambda leaf, idl: jnp.where(use, leaf, idl), ek, ident)
            R = _combine(ek, R)

        # splice: global suffix at local index i = loc[i] (x) R
        suff = _combine(loc, jax.tree_util.tree_map(
            lambda leaf: leaf[None], R))
        V_here = suff[3]           # [L, x, x]: V at each local stage index
        v_here = -suff[4]

        # V_{k+1} per local stage: shift left; boundary = J of R
        Vn = jnp.concatenate([V_here[1:], R[3][None]], axis=0)
        vn = jnp.concatenate([v_here[1:], -R[4][None]], axis=0)

        Bt = jnp.swapaxes(Bv, -1, -2)
        Rb = Ruv + jnp.einsum("kux,kxy,kyv->kuv", Bt, Vn, Bv)
        G = jnp.einsum("kux,kxy,kyz->kuz", Bt, Vn, eA)
        h = ruv + jnp.einsum("kux,kx->ku", Bt,
                             vn + jnp.einsum("kxy,ky->kx", Vn, dv))
        Ks = -jnp.linalg.solve(Rb, G)
        ks = -jnp.linalg.solve(Rb, h[..., None])[..., 0]

        # closed-loop rollout: prefix-compose affine maps across shards
        M_cl = eA + jnp.einsum("kxu,kuy->kxy", Bv, Ks)
        c_cl = jnp.einsum("kxu,ku->kx", Bv, ks) + dv

        def aff(fi, fj):
            Mi, ci = fi
            Mj, cj = fj
            return (Mj @ Mi,
                    jnp.einsum("...xy,...y->...x", Mj, ci) + cj)

        Mp, cp = lax.associative_scan(aff, (M_cl, c_cl), axis=0)
        tot_aff = (Mp[-1], cp[-1])
        gM = lax.all_gather(tot_aff[0], axis)
        gc = lax.all_gather(tot_aff[1], axis)
        # prefix of EARLIER shards: P_s = tot_{s-1} o ... o tot_0
        Pm, pc = (jnp.eye(x, dtype=dt), jnp.zeros((x,), dt))
        for k in range(D):
            use = k < s
            Mk = jnp.where(use, gM[k], jnp.eye(x, dtype=dt))
            ck = jnp.where(use, gc[k], jnp.zeros((x,), dt))
            Pm, pc = (Mk @ Pm, jnp.einsum("xy,y->x", Mk, pc) + ck)

        x_start = Pm @ x0v + pc          # state entering this shard
        Xs = (jnp.einsum("kxy,y->kx", Mp, x_start)
              + cp)                      # states AFTER each local stage
        X_in = jnp.concatenate([x_start[None], Xs[:-1]], axis=0)
        U = jnp.einsum("kux,kx->ku", Ks, X_in) + ks
        return X_in, Xs, U

    return local


BATCH_AXIS = "batch"


@highest_precision
def lqr_solve_sharded_batch(A: Array, B: Array, d: Array, Qx: Array,
                            qx: Array, Ru: Array, ru: Array, x0: Array,
                            mesh: Optional[Mesh] = None,
                            batch_axis: str = BATCH_AXIS,
                            axis: str = SEQ_AXIS) -> Tuple[Array, Array]:
    """Batch x seq LQR: scenarios sharded over ``batch_axis``, each
    scenario's horizon over ``axis``, on one 2-D mesh.

    Inputs carry a leading batch dim (``A [Bn,N,x,x]``, ``x0 [Bn,x]``,
    ...).  Per-scenario collectives (all_gather of shard totals) ride the
    seq axis only; scenarios never communicate.  ``Bn`` must divide by the
    batch-axis size and ``N`` by the seq-axis size.
    """
    if mesh is None:
        devs = np.asarray(jax.devices())
        mesh = Mesh(devs.reshape(2, -1), (batch_axis, axis))
    D = mesh.shape[axis]
    Bn, N = A.shape[0], A.shape[1]
    if N % D:
        raise ValueError(f"horizon {N} not divisible by {D} shards")
    if Bn % mesh.shape[batch_axis]:
        raise ValueError(f"batch {Bn} not divisible by "
                         f"{mesh.shape[batch_axis]} batch shards")

    eA, eb, eC, eJ, eh, term = jax.vmap(_stage_elements)(
        A, B, d, Qx, qx, Ru, ru)
    local = jax.vmap(_make_local(axis, D))   # over the LOCAL batch shard
    b = batch_axis
    spec = P(b, axis)
    mapped = jax.shard_map(
        local, mesh=mesh,
        in_specs=(spec, spec, spec, spec, spec, P(b), spec, spec, spec,
                  spec, P(b)),
        out_specs=(spec, spec, spec), check_vma=False)
    X_in, Xs, U = jax.jit(mapped)(eA, eb, eC, eJ, eh, term, B, d, Ru, ru,
                                  x0)
    X = jnp.concatenate([x0[:, None], Xs], axis=1)
    return X, U
