"""Batched small-matrix Cholesky kernel (Pallas TPU).

SURVEY.md §7.1-6 kernel item: MPC plan builds factorize THOUSANDS of
small KKT matrices at once (``K = Q + (sigma+rho) I`` per scenario,
n = N*u ~ 10..128 — e.g. BASELINE configs 1-3 at n=10, config 4 at
n=100).  XLA's batched ``jnp.linalg.cholesky`` lowers to a blocked
loop whose per-column work is latency-bound at these sizes; this kernel
runs the right-looking (outer-product) recursion with the BATCH riding
the 128-wide vector lane axis, so every column update is dense VPU work
across lanes:

    for j in 0..n-1:   c_j = K[:, j] * rsqrt(K[j, j]);  K -= c_j c_j'

The j-loop is unrolled at trace time (n is static); garbage above the
diagonal never feeds the valid trailing Schur complement (the rank-1
update only reads c entries at i >= j for surviving elements) and is
masked out of the output with one ``tril`` multiply at the end.

Numerics: pure f32 mul/add/rsqrt on the VPU — no MXU bf16 passes to
guard against (docs/PERFORMANCE.md lesson #1 applies to dots only).
The XLA path is the correctness oracle (``tests/test_cholesky_kernel``);
``chol_batched`` falls back to it off-TPU and for shapes the kernel
does not cover.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

LANES = 128


def _chol_kernel(n: int, k_ref, l_ref):
    """One lane sub-batch: ``k_ref/l_ref [n, n, sb]`` (batch on lanes)."""
    K = k_ref[...]
    cols = []
    for j in range(n):
        dinv = lax.rsqrt(K[j:j + 1, j:j + 1, :])     # (1, 1, sb)
        c = K[:, j:j + 1, :] * dinv                  # (n, 1, sb)
        cols.append(c)
        if j + 1 < n:
            K = K - c * jnp.transpose(c, (1, 0, 2))  # rank-1 downdate
    L = jnp.concatenate(cols, axis=1)                # (n, n, sb)
    tril = jnp.tril(jnp.ones((n, n), L.dtype))[:, :, None]
    l_ref[...] = L * tril


@functools.partial(jax.jit, static_argnames=("interpret",))
def _chol_lanes(K_lanes: Array, interpret: bool = False) -> Array:
    """``K_lanes [n, n, B]`` (B a multiple of LANES) -> ``L`` same shape."""
    n = K_lanes.shape[0]
    B = K_lanes.shape[-1]
    grid = (B // LANES,)
    _z = np.int32(0)
    spec = pl.BlockSpec((n, n, LANES), lambda i: (_z, _z, i),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_chol_kernel, n),
        grid=grid,
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(K_lanes.shape, K_lanes.dtype),
        interpret=interpret,
    )(K_lanes)


def chol_batched(K: Array, interpret: Optional[bool] = None) -> Array:
    """Cholesky of a batch of small SPD matrices ``K [B, n, n]``.

    Uses the lane-batched Pallas kernel on TPU when it pays (n <= 128
    and the [n, n, 128] working set fits VMEM); falls back to
    ``jnp.linalg.cholesky`` otherwise.  Bit-compatible semantics: lower
    triangular ``L`` with ``L L' = K``.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    B, n, _ = K.shape
    # kernel working set ~ 3 [n,n,128] f32 buffers; stay well under VMEM
    if n > 128 or (3 * n * n * LANES * 4) > 12e6:
        return jnp.linalg.cholesky(K)
    Bp = -(-B // LANES) * LANES
    Kl = jnp.moveaxis(K, 0, -1)                      # [n, n, B]
    if Bp != B:
        pad = jnp.broadcast_to(jnp.eye(n, dtype=K.dtype)[:, :, None],
                               (n, n, Bp - B))
        Kl = jnp.concatenate([Kl, pad], axis=-1)
    Ll = _chol_lanes(Kl, interpret=bool(interpret))
    return jnp.moveaxis(Ll[..., :B], -1, 0)
