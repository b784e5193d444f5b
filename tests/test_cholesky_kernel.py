"""Lane-batched Cholesky kernel vs jnp.linalg.cholesky (oracle)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from copra_tpu.ops.cholesky_kernel import chol_batched


def _spd_batch(key, B, n, cond=1e4):
    M = jax.random.normal(key, (B, n, n))
    K = jnp.einsum("bij,bkj->bik", M, M) + jnp.eye(n)[None] / cond * n
    return K


@pytest.mark.parametrize("B,n", [(3, 4), (130, 10), (64, 33)])
def test_chol_matches_xla(B, n):
    K = _spd_batch(jax.random.PRNGKey(n), B, n)
    L0 = jnp.linalg.cholesky(K)
    L1 = chol_batched(K, interpret=True)
    assert L1.shape == L0.shape
    np.testing.assert_allclose(np.asarray(L1), np.asarray(L0),
                               atol=1e-9, rtol=1e-9)


def test_chol_mpc_conditioning():
    """MPC-class spectra (rho/sigma-ridged condensed Hessians, spread
    ~1e-6..1e4 before the ridge): the kernel must reconstruct K."""
    B, n = 16, 24
    key = jax.random.PRNGKey(0)
    V = jnp.linalg.qr(jax.random.normal(key, (B, n, n)))[0]
    eigs = jnp.logspace(-6, 4, n)[None]
    Q = jnp.einsum("bij,bj,bkj->bik", V, eigs, V)
    K = Q + (1e-6 + 0.1) * jnp.eye(n)[None]     # sigma + rho ridge
    L = chol_batched(K, interpret=True)
    rec = jnp.einsum("bij,bkj->bik", L, L)
    err = float(jnp.max(jnp.abs(rec - K)) / jnp.max(jnp.abs(K)))
    assert err < 1e-12
    assert bool(jnp.all(jnp.isfinite(L)))


def test_chol_large_n_falls_back():
    K = _spd_batch(jax.random.PRNGKey(3), 2, 200)
    L = chol_batched(K, interpret=True)   # falls back to XLA
    np.testing.assert_allclose(np.asarray(L),
                               np.asarray(jnp.linalg.cholesky(K)),
                               atol=1e-9, rtol=1e-9)
