"""Dispatch-free multi-tick stagewise serving (VERDICT r2 #5).

``make_stagewise_multistep`` chains n receding-horizon ticks in ONE
dispatch (lax.scan over the tick body, plant or exogenous state stream
inside the loop).  The contract: tick-for-tick identical results to the
per-tick Python loop through ``make_stagewise_step`` — same solver, same
warm-start threading, no drift.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import copra_tpu as ct
from copra_tpu.qp.riccati import (from_mpc, make_stagewise_multistep,
                                  make_stagewise_step)

from fixtures import (A, B, D, M, N_MAT, SMALL_N, SMALL_X0, UD, U_LOWER,
                      U_UPPER, WU, WX, XD)


def fleet(batch=3):
    system = ct.LTISystem.create(A, B, D, SMALL_X0, SMALL_N)
    costs = (ct.TargetCost.create(M, XD, weights=WX),
             ct.ControlCost.create(N_MAT, UD, weights=WU))
    cons = (ct.ControlBoundConstraint.create(U_LOWER, U_UPPER),)
    sqp = from_mpc(system, costs, cons)
    sqp_b = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (batch,) + a.shape), sqp)
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(SMALL_X0[None]
                      + rng.normal(scale=[0.05, 0.1], size=(batch, 2)))
    return dataclasses.replace(sqp_b, x0=x0s), x0s


@pytest.mark.parametrize("backend", ["xla"])
def test_multistep_matches_per_tick_loop_plant(backend):
    """Closed loop (default stage-0 plant): one-dispatch chain == the
    per-tick Python loop, tick for tick."""
    sqp_b, x0s = fleet()
    opts = ct.SolverOptions(max_iter=40, rho=0.1)
    copts = opts.replace(max_iter=400)
    T = 4

    step_many = make_stagewise_multistep(sqp_b, opts, cold_options=copts,
                                         backend=backend)
    states, u0s, statuses, info, warm = step_many(x0s, T)
    # plant mode + cold start: the cold tick's applied control is entry 0
    # (ADVICE r3 — states[k+1] == plant(states[k], u0s[k]) throughout)
    assert states.shape == (T + 2, 3, 2)
    assert u0s.shape == (T + 1, 3, 1)
    assert statuses.shape == (T + 1, 3)

    # reference: the per-tick loop with the identical plant applied
    tick = make_stagewise_step(sqp_b, opts, cold_options=copts,
                               backend=backend)
    A0, B0, d0 = sqp_b.A[:, 0], sqp_b.B[:, 0], sqp_b.d[:, 0]

    def plant(xk, U):
        return (jnp.einsum("bxy,by->bx", A0, xk)
                + jnp.einsum("bxu,bu->bx", B0, U[:, 0]) + d0)

    xk = x0s
    Xr, Ur, infor, warmr = tick(xk)          # leading cold tick
    np.testing.assert_allclose(np.asarray(u0s[0]),
                               np.asarray(Ur[:, 0]), atol=1e-12)
    assert (np.asarray(statuses[0]) == np.asarray(infor.status)).all()
    xk = plant(xk, Ur)
    np.testing.assert_allclose(np.asarray(states[0]), np.asarray(x0s))
    np.testing.assert_allclose(np.asarray(states[1]), np.asarray(xk),
                               atol=1e-12)
    for t in range(T):
        Xr, Ur, infor, warmr = tick(xk, warmr)
        np.testing.assert_allclose(np.asarray(u0s[t + 1]),
                                   np.asarray(Ur[:, 0]), atol=1e-12)
        xk = plant(xk, Ur)
        np.testing.assert_allclose(np.asarray(states[t + 2]),
                                   np.asarray(xk), atol=1e-12)
        assert (np.asarray(statuses[t + 1])
                == np.asarray(infor.status)).all()
    # final-tick full solution and warm tuple match too
    np.testing.assert_allclose(np.asarray(info.x), np.asarray(infor.x),
                               atol=1e-12)
    for a, b in zip(warm, warmr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-12)


def test_multistep_exogenous_stream_matches_per_tick():
    """x0_seq mode (estimator stream): tick k solves AT x0_seq[k]."""
    sqp_b, x0s = fleet()
    opts = ct.SolverOptions(max_iter=30, rho=0.1)
    T = 3
    rng = np.random.default_rng(1)
    x0_seq = jnp.asarray(np.asarray(x0s)[None]
                         + rng.normal(scale=0.01, size=(T, 3, 2)).cumsum(0))

    step_many = make_stagewise_multistep(sqp_b, opts, backend="xla")
    states, u0s, statuses, info, warm = step_many(x0s, T, x0_seq=x0_seq)

    tick = make_stagewise_step(sqp_b, opts, backend="xla")
    _, Ur, _, warmr = tick(x0_seq[0])
    for t in range(T):
        Xr, Ur, infor, warmr = tick(x0_seq[t], warmr)
        np.testing.assert_allclose(np.asarray(u0s[t]),
                                   np.asarray(Ur[:, 0]), atol=1e-12)
    np.testing.assert_allclose(np.asarray(info.x), np.asarray(infor.x),
                               atol=1e-12)


def test_multistep_unbatched_facade():
    system = ct.LTISystem.create(A, B, D, SMALL_X0, SMALL_N)
    costs = (ct.TargetCost.create(M, XD, weights=WX),
             ct.ControlCost.create(N_MAT, UD, weights=WU))
    cons = (ct.ControlBoundConstraint.create(U_LOWER, U_UPPER),)
    sqp = from_mpc(system, costs, cons)
    step_many = make_stagewise_multistep(
        sqp, ct.SolverOptions(max_iter=30, rho=0.1), backend="xla")
    T = 3
    states, u0s, statuses, info, warm = step_many(sqp.x0, T)
    assert states.shape == (T + 2, 2)        # cold tick included
    assert u0s.shape == (T + 1, 1)
    assert statuses.shape == (T + 1,)
    assert info.x.shape == (SMALL_N,)
    # a warm continuation has no leading cold tick: plain [T] shapes
    states2, u0s2, statuses2, _, _ = step_many(states[-1], T, warm=warm)
    assert states2.shape == (T + 1, 2)
    assert u0s2.shape == (T, 1)


def test_multistep_fused_interpret_matches_xla():
    """The fused kernel body chained under scan == the XLA body (CPU
    interpret mode; on TPU the same code runs the real kernel)."""
    sqp_b, x0s = fleet(batch=2)
    sqp32 = jax.tree_util.tree_map(lambda a: a.astype(jnp.float32), sqp_b)
    opts = ct.SolverOptions(max_iter=15, rho=0.1)
    T = 2
    sx = make_stagewise_multistep(sqp32, opts, backend="xla")
    sf = make_stagewise_multistep(sqp32, opts, backend="fused")
    st_x = sx(sqp32.x0, T)
    st_f = sf(sqp32.x0, T)
    # both are f32 paths with different accumulation orders: ~1e-5
    # relative agreement on O(100) controls is the expected class
    np.testing.assert_allclose(np.asarray(st_f[1]), np.asarray(st_x[1]),
                               rtol=5e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(st_f[0]), np.asarray(st_x[0]),
                               rtol=5e-5, atol=1e-4)


def test_multistep_fused_plus_parallel_scan_is_an_error():
    sqp_b, _ = fleet(batch=2)
    with pytest.raises(ValueError, match="contradictory"):
        make_stagewise_multistep(sqp_b, ct.SolverOptions(max_iter=5),
                                 backend="fused", parallel_scan=True)


def test_multistep_replan_swaps_model():
    """StagewiseMultistep.replan: same-shape data swap behind the
    compiled chain — post-swap chain ticks solve the NEW model and the
    leading facade's swap path converges."""
    import dataclasses

    sqp_b, x0s = fleet()
    opts = ct.SolverOptions(max_iter=40, early_exit=False, rho=1.0)
    step_many = ct.make_stagewise_multistep(
        sqp_b, opts, cold_options=opts.replace(max_iter=2000),
        backend="xla")
    B = sqp_b.A.shape[0]
    x0 = jnp.zeros((B, sqp_b.xdim), sqp_b.A.dtype)
    states, u0s, statuses, info, warm = step_many(x0, 2)
    assert (np.asarray(statuses) == ct.STATUS_SOLVED).all()

    # swap: shift the state reference costs (same shapes)
    sqp2 = dataclasses.replace(
        sqp_b, qx=sqp_b.qx + jnp.asarray(0.5, sqp_b.qx.dtype))
    step_many.replan(sqp2)
    states2, u0s2, statuses2, info2, warm = step_many(
        states[-1], 2, warm=warm)
    assert (np.asarray(statuses2) == ct.STATUS_SOLVED).all()
    # the model genuinely changed: controls moved
    assert np.abs(np.asarray(u0s2[-1]) - np.asarray(u0s[-1])).max() \
        > 1e-4

    # shape mismatch is a NEW facade, not a replan
    from copra_tpu.errors import DimensionError
    bad = jax.tree_util.tree_map(
        lambda a: jnp.concatenate([a, a], axis=0), sqp_b)
    with pytest.raises(DimensionError):
        step_many.replan(bad)
