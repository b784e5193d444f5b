"""Condensing correctness: numpy oracle, invariants, LTI==LTV, jit/vmap."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import copra_tpu as ct

from fixtures import (A, B, D, SMALL_N, SMALL_X0, ltv_matrices,
                      numpy_condense_lti, numpy_condense_ltv)


def test_condense_lti_matches_numpy_oracle():
    prev = ct.condense_lti(A, B, D, SMALL_N)
    Phi, Psi, xi = numpy_condense_lti(A, B, D, SMALL_N)
    np.testing.assert_allclose(prev.Phi, Phi, atol=1e-12)
    np.testing.assert_allclose(prev.Psi, Psi, atol=1e-12)
    np.testing.assert_allclose(prev.xi, xi, atol=1e-12)


def test_condense_ltv_matches_numpy_oracle():
    As, Bs, Ds = ltv_matrices()
    prev = ct.condense_ltv(As, Bs, Ds)
    Phi, Psi, xi = numpy_condense_ltv(As, Bs, Ds)
    np.testing.assert_allclose(prev.Phi, Phi, atol=1e-12)
    np.testing.assert_allclose(prev.Psi, Psi, atol=1e-12)
    np.testing.assert_allclose(prev.xi, xi, atol=1e-12)


@pytest.mark.parametrize("u", [2, 3])
def test_condense_ltv_multi_input_matches_numpy_oracle(u):
    """Regression pin for udim >= 2: the Psi column selector used to be
    correct only for u == 1 (every golden fixture has u=1), misplacing
    B_k blocks — caught by tests/test_fuzz_frontend.py."""
    rng = np.random.default_rng(7 + u)
    N, x = 6, 3
    As = 0.6 * rng.normal(size=(N, x, x))
    Bs = rng.normal(size=(N, x, u))
    Ds = rng.normal(size=(N, x))
    for cond in (ct.condense_ltv, ct.condense_ltv_assoc):
        prev = cond(As, Bs, Ds)
        Phi, Psi, xi = numpy_condense_ltv(As, Bs, Ds)
        np.testing.assert_allclose(prev.Phi, Phi, atol=1e-12)
        np.testing.assert_allclose(prev.Psi, Psi, atol=1e-12)
        np.testing.assert_allclose(prev.xi, xi, atol=1e-12)
    # LTI condensers at the same u (Toeplitz gather path)
    Phi, Psi, xi = numpy_condense_lti(As[0], Bs[0], Ds[0], N)
    for cond in (ct.condense_lti, ct.condense_lti_assoc):
        prev = cond(As[0], Bs[0], Ds[0], N)
        np.testing.assert_allclose(prev.Phi, Phi, atol=1e-12)
        np.testing.assert_allclose(prev.Psi, Psi, atol=1e-12)
        np.testing.assert_allclose(prev.xi, xi, atol=1e-12)


def test_preview_invariant_reconstructs_rollout():
    """X = Phi x0 + Psi U + xi must equal a step-by-step rollout
    (reference invariant, src/systems/TimeInvariantSystem.cpp:34-36)."""
    rng = np.random.default_rng(0)
    N, x, u = 17, 3, 2
    Ar = rng.normal(size=(x, x)) * 0.5
    Br = rng.normal(size=(x, u))
    dr = rng.normal(size=(x,))
    x0 = rng.normal(size=(x,))
    U = rng.normal(size=(N * u,))

    prev = ct.condense_lti(Ar, Br, dr, N)
    X = prev.trajectory(jnp.asarray(x0), jnp.asarray(U))

    xs = [x0]
    for k in range(N):
        xs.append(Ar @ xs[-1] + Br @ U[k*u:(k+1)*u] + dr)
    np.testing.assert_allclose(X, np.concatenate(xs), atol=1e-9)


def test_lti_equals_ltv_with_constant_matrices():
    """LTV with constant matrices == LTI to 1e-10
    (reference oracle, test/TestTimeVariantSystems.cpp:47-86)."""
    sys_lti = ct.LTISystem.create(A, B, D, SMALL_X0, SMALL_N)
    sys_ltv = ct.lti_as_ltv(sys_lti)
    p1 = ct.condense(sys_lti)
    p2 = ct.condense(sys_ltv)
    np.testing.assert_allclose(p1.Phi, p2.Phi, atol=1e-10)
    np.testing.assert_allclose(p1.Psi, p2.Psi, atol=1e-10)
    np.testing.assert_allclose(p1.xi, p2.xi, atol=1e-10)


def test_condense_under_jit_and_vmap():
    batch = 8
    rng = np.random.default_rng(1)
    x0s = rng.normal(size=(batch, 2))
    systems = jax.vmap(
        lambda x0: ct.LTISystem(A=jnp.asarray(A), B=jnp.asarray(B),
                                d=jnp.asarray(D), x0=x0, horizon=SMALL_N)
    )(jnp.asarray(x0s))

    @jax.jit
    def free_resp(sys):
        prev = ct.condense(sys)
        return jax.vmap(prev.free_response)(sys.x0) if sys.x0.ndim > 1 \
            else prev.free_response(sys.x0)

    # vmap the whole condense over the batched system
    fr = jax.vmap(lambda s: ct.condense(s).free_response(s.x0))(systems)
    assert fr.shape == (batch, 2 * (SMALL_N + 1))
    single = ct.condense_lti(A, B, D, SMALL_N).free_response(
        jnp.asarray(x0s[3]))
    np.testing.assert_allclose(fr[3], single, atol=1e-12)


def test_from_step_fns_matches_stacked():
    As, Bs, Ds = ltv_matrices()
    sys1 = ct.LTVSystem.create(As, Bs, Ds, SMALL_X0)
    sys2 = ct.LTVSystem.from_step_fns(
        lambda k: As[k], lambda k: Bs[k], lambda k: Ds[k], SMALL_X0, SMALL_N)
    np.testing.assert_allclose(sys1.A, sys2.A)
    np.testing.assert_allclose(sys1.B, sys2.B)
    np.testing.assert_allclose(sys1.d, sys2.d)


def test_replay_dynamics_zero_on_consistent_rollout():
    sys = ct.LTISystem.create(A, B, D, SMALL_X0, SMALL_N)
    prev = ct.condense(sys)
    U = jnp.ones((SMALL_N,)) * 3.0
    X = prev.trajectory(sys.x0, U)
    assert float(ct.replay_dynamics(sys, X, U)) < 1e-10


def test_system_dimension_errors():
    with pytest.raises(ct.DimensionError):
        ct.LTISystem.create(np.ones((2, 3)), B, D, SMALL_X0, SMALL_N)
    with pytest.raises(ct.DimensionError):
        ct.LTISystem.create(A, np.ones((3, 1)), D, SMALL_X0, SMALL_N)
    with pytest.raises(ct.DimensionError):
        ct.LTISystem.create(A, B, np.ones(3), SMALL_X0, SMALL_N)
    with pytest.raises(ct.DimensionError):
        ct.LTISystem.create(A, B, D, np.ones(3), SMALL_N)
    As, Bs, Ds = ltv_matrices()
    with pytest.raises(ct.DimensionError):
        ct.LTVSystem.create(As[:5], Bs, Ds, SMALL_X0)
    with pytest.raises(ct.DimensionError):
        ct.LTVSystem.create(As, Bs, Ds[:, :1], SMALL_X0)


def test_condense_assoc_matches_scan():
    """The O(log N)-depth associative-scan path must agree with the serial
    scan (and hence the numpy oracle) for both system kinds, including
    non-power-of-two horizons."""
    for n in (1, 2, 7, 13):
        p1 = ct.condense_lti(A, B, D, n)
        p2 = ct.condense_lti_assoc(A, B, D, n)
        np.testing.assert_allclose(p1.Phi, p2.Phi, atol=1e-12)
        np.testing.assert_allclose(p1.Psi, p2.Psi, atol=1e-12)
        np.testing.assert_allclose(p1.xi, p2.xi, atol=1e-12)
        As, Bs, Ds = ltv_matrices(max(n, 2))
        As, Bs, Ds = As[:n], Bs[:n], Ds[:n]
        q1 = ct.condense_ltv(As, Bs, Ds)
        q2 = ct.condense_ltv_assoc(As, Bs, Ds)
        np.testing.assert_allclose(q1.Psi, q2.Psi, atol=1e-12)
        np.testing.assert_allclose(q1.Phi, q2.Phi, atol=1e-12)
        np.testing.assert_allclose(q1.xi, q2.xi, atol=1e-12)


def test_condense_method_dispatch():
    sys_ = ct.LTISystem.create(A, B, D, SMALL_X0, 7)
    p1 = ct.condense(sys_, method="scan")
    p2 = ct.condense(sys_, method="assoc")
    np.testing.assert_allclose(p1.Psi, p2.Psi, atol=1e-12)
