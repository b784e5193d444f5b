"""Differentiability: gradients through the full MPC solve.

No reference analog — a C++ active-set pipeline is not differentiable.
Because the whole condense → build → (fixed-iteration) ADMM → replay
pipeline is pure jittable JAX, `jax.grad`/`jax.jacfwd` flow through it:
the basis for learned cost tuning, sensitivity-aware control, and
closing design loops on-TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np

import copra_tpu as ct

from fixtures import (A, B, D, M, N_MAT, SMALL_N, SMALL_X0, UD, U_LOWER,
                      U_UPPER, WU, WX, XD)

OPTS = ct.SolverOptions(max_iter=300, early_exit=False, polish=False)


def solve_controls(wx_vel, x0):
    """Control sequence as a function of the velocity cost weight and x0."""
    system = ct.LTISystem.create(A, B, D, x0, SMALL_N)
    costs = (ct.TargetCost(M=jnp.asarray(M), p=jnp.asarray(XD),
                           weights=jnp.stack([jnp.asarray(WX[0]), wx_vel])),
             ct.ControlCost.create(N_MAT, UD, weights=WU))
    constraints = (ct.ControlBoundConstraint.create(U_LOWER, U_UPPER),)
    res = ct.solve_mpc(system, costs, constraints, OPTS)
    return res


def test_grad_through_solve_wrt_cost_weight():
    """d(loss)/d(weight) through the full solve — finite differences agree."""

    def loss(wx_vel):
        res = solve_controls(wx_vel, jnp.asarray(SMALL_X0))
        vel = res.trajectory[1::2]
        return jnp.sum((vel - XD[1]) ** 2)

    g = jax.grad(loss)(jnp.asarray(WX[1]))
    eps = 1e-3 * WX[1]
    fd = (loss(jnp.asarray(WX[1] + eps)) - loss(jnp.asarray(WX[1] - eps))
          ) / (2 * eps)
    assert np.isfinite(float(g))
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-3, atol=1e-12)


def test_jacobian_of_control_wrt_initial_state():
    """du/dx0 sensitivity — for an unconstrained active set this equals the
    affine feedback gain, so rows must be finite and x0-independent."""

    def u_of_x0(x0):
        return solve_controls(jnp.asarray(WX[1]), x0).control

    J1 = jax.jacfwd(u_of_x0)(jnp.asarray(SMALL_X0))
    J2 = jax.jacfwd(u_of_x0)(jnp.asarray(SMALL_X0) + jnp.asarray([0.0, 0.1]))
    assert J1.shape == (SMALL_N, 2)
    assert np.isfinite(np.asarray(J1)).all()
    # bounds inactive at both points -> same affine gain
    np.testing.assert_allclose(np.asarray(J1), np.asarray(J2), atol=1e-4)


def test_gradient_descent_tunes_tracking_weight():
    """Three steps of gradient descent on the weight reduce the loss —
    the end-to-end 'learned MPC tuning' loop."""

    def loss(log_w):
        res = solve_controls(jnp.exp(log_w), jnp.asarray(SMALL_X0))
        vel = res.trajectory[1::2]
        # track the target velocity quickly but penalize effort
        return (jnp.sum((vel - XD[1]) ** 2)
                + 1e-7 * jnp.sum(res.control ** 2))

    lw = jnp.log(jnp.asarray(10.0))     # start far from the golden weight
    grad_fn = jax.jit(jax.value_and_grad(loss))
    l0, _ = grad_fn(lw)
    for _ in range(3):
        val, g = grad_fn(lw)
        lw = lw - 0.5 * jnp.sign(g) * jnp.minimum(jnp.abs(g), 1.0)
    l1, _ = grad_fn(lw)
    assert float(l1) < float(l0)


def test_grad_through_stagewise_solve():
    """Gradients flow through the stagewise Riccati-in-ADMM path too:
    the fixed-gains sweeps and projections are pure jittable JAX, so
    d(control)/d(x0) and d/d(cost weight) are exact reverse-mode."""
    from copra_tpu.qp.riccati import from_mpc, solve_stagewise

    system = ct.LTISystem.create(A, B, D, SMALL_X0, SMALL_N)
    costs = (ct.TargetCost.create(M, XD, weights=WX),
             ct.ControlCost.create(N_MAT, UD, weights=WU))
    constraints = (ct.ControlBoundConstraint.create(U_LOWER, U_UPPER),)
    sqp = from_mpc(system, costs, constraints)
    opts = ct.SolverOptions(max_iter=150, early_exit=False)

    def first_control(x0):
        import dataclasses
        X, U, _ = solve_stagewise(dataclasses.replace(sqp, x0=x0), opts)
        return U[0, 0]

    g = jax.grad(first_control)(jnp.asarray(SMALL_X0))
    assert g.shape == (2,)
    assert bool(jnp.all(jnp.isfinite(g)))
    # finite-difference check on the x0 sensitivity
    eps = 1e-5
    e0 = jnp.array([eps, 0.0])
    fd = (first_control(jnp.asarray(SMALL_X0) + e0)
          - first_control(jnp.asarray(SMALL_X0) - e0)) / (2 * eps)
    np.testing.assert_allclose(float(g[0]), float(fd), rtol=1e-3,
                               atol=1e-6)
