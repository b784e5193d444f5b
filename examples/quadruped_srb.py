"""Quadruped single-rigid-body MPC: the reference's actual domain.

ANYbotics' copra drives quadrupeds (any ``(nrVar, nrConstr)`` through
qpOASES — ``/root/reference/src/solvers/qpOASESSolver.cpp:66-118``);
this example is that workload, TPU-native: x=12 states (rpy, position,
angular rate, velocity), u=12 ground-reaction forces (3-D per leg),
16 friction-cone rows per stage (all four pyramid faces), LTV dynamics
over the gait (footholds move with phase) — built entirely from the
PUBLIC front-end:

* ``LTVSystem`` with per-stage ``A_k/B_k/d_k`` (torque arm follows the
  gait phase);
* per-step ``TrajectoryCost`` tracking a stand-height + forward-velocity
  reference, ``SimpleControlCost`` force regularization;
* ``ControlConstraint`` friction pyramids (``|f_x|, |f_y| <= mu f_z``),
  ``ControlBoundConstraint`` force boxes (normal force >= 0),
  ``TrajectoryBoundConstraint`` attitude/height corridor (±inf masking
  exercises the bound-filtering quirk at robot scale);
* serving: ``make_stagewise_step(scaling='auto')`` — curvature
  equilibration (forces O(100 N) vs states O(0.1) stall raw first-order
  iterations; docs/PERFORMANCE.md), measured rho
  (``auto_rho_stagewise``), measured warm-iteration budget
  (``auto_iters_stagewise``).  On TPU the tick runs the STREAMED fused
  Pallas kernel (x=12 exceeds the resident envelope); on CPU the XLA
  scan path — same update order, same numbers.

Run:  PYTHONPATH=. python examples/quadruped_srb.py
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

import copra_tpu as ct

GRAVITY = 9.81


def srb_gait_system(N: int = 40, dt: float = 0.025, mass: float = 25.0,
                    height: float = 0.3):
    """LTV single-rigid-body dynamics over one gait cycle.

    State ``[rpy, p, omega, v]`` (12), control = stacked per-leg ground
    reaction forces (12).  The torque arm of each leg's force follows
    the gait phase, so ``B_k`` is time-varying.
    """
    Ibinv = np.linalg.inv(np.diag([0.35, 1.2, 1.3]))
    Ac = np.zeros((12, 12))
    Ac[0:3, 6:9] = np.eye(3)
    Ac[3:6, 9:12] = np.eye(3)
    Ad = np.eye(12) + Ac * dt
    feet0 = np.array([[0.22, 0.15, -height], [0.22, -0.15, -height],
                      [-0.22, 0.15, -height], [-0.22, -0.15, -height]])
    Bs = []
    for k in range(N):
        phase = 2 * np.pi * k / N
        Bk = np.zeros((12, 12))
        for leg in range(4):
            r_i = feet0[leg] + np.array(
                [0.04 * np.sin(phase + leg * np.pi / 2), 0.0, 0.0])
            rx = np.array([[0, -r_i[2], r_i[1]],
                           [r_i[2], 0, -r_i[0]],
                           [-r_i[1], r_i[0], 0]])
            Bk[6:9, 3 * leg:3 * leg + 3] = Ibinv @ rx * dt
            Bk[9:12, 3 * leg:3 * leg + 3] = np.eye(3) / mass * dt
        Bs.append(Bk)
    d = np.zeros(12)
    d[11] = -GRAVITY * dt
    # start standing at rest (the height corridor includes x_0 — a
    # grounded start would be reported primal-infeasible, honestly)
    x0 = np.zeros(12, np.float32)
    x0[5] = height
    f32 = np.float32
    return ct.LTVSystem.create(
        np.asarray([Ad] * N, f32), np.asarray(Bs, f32),
        np.repeat(d[None], N, 0).astype(f32), x0)


def build_problem(N: int = 40, dt: float = 0.025, mu: float = 0.6,
                  v_ref: float = 0.4, height: float = 0.3):
    """Public-front-end costs + constraints for the SRB workload."""
    f32 = jnp.float32
    system = srb_gait_system(N, dt, height=height)

    x_ref = np.zeros(12, np.float32)
    x_ref[5] = height
    x_ref[9] = v_ref
    w = np.array([50.0, 50, 10, 10, 10, 100, 1, 1, 1, 5, 5, 5],
                 np.float32)
    # per-step TrajectoryCost: M = I (12x12), reference x_ref; weights
    # enter the quadratic form linearly (sum_i w_i (M x - p)_i^2)
    costs = (
        ct.TrajectoryCost(M=jnp.eye(12, dtype=f32),
                          p=jnp.asarray(x_ref),
                          weights=jnp.asarray(w)),
        ct.SimpleControlCost(p=jnp.zeros(12, f32),
                             weights=jnp.full(12, 1e-5, f32)),
    )

    # friction pyramids, per step: all FOUR faces per leg
    # (+/-fx - mu fz <= 0, +/-fy - mu fz <= 0) — 16 rows
    G = np.zeros((16, 12), np.float32)
    for leg in range(4):
        r0, c0 = 4 * leg, 3 * leg
        G[r0 + 0, c0 + 0], G[r0 + 0, c0 + 2] = 1.0, -mu
        G[r0 + 1, c0 + 0], G[r0 + 1, c0 + 2] = -1.0, -mu
        G[r0 + 2, c0 + 1], G[r0 + 2, c0 + 2] = 1.0, -mu
        G[r0 + 3, c0 + 1], G[r0 + 3, c0 + 2] = -1.0, -mu
    xlb = np.full(12, -np.inf, np.float32)
    xub = np.full(12, np.inf, np.float32)
    xlb[0:3], xub[0:3] = -0.4, 0.4          # attitude envelope
    xlb[5], xub[5] = 0.2, 0.4               # height corridor
    constraints = (
        ct.ControlConstraint(G=jnp.asarray(G), f=jnp.zeros(16, f32)),
        ct.ControlBoundConstraint.create(
            [-150.0, -150.0, 0.0] * 4, [150.0, 150.0, 250.0] * 4),
        ct.TrajectoryBoundConstraint.create(xlb, xub),
    )
    return system, costs, constraints, x_ref


def serve(robots: int = 4, N: int = 40, ticks: int = 5,
          warm_iters=None, rho=None, verbose: bool = True):
    """Receding-horizon fleet serving, NO solver knobs.

    ``make_stagewise_server`` measures everything (equilibration, rho,
    warm budget) and arms the convergence top-up; ``rho``/``warm_iters``
    override the probes (tests pass both to skip the probe cost)."""
    from copra_tpu.qp.riccati import (from_mpc, make_stagewise_server,
                                      make_stagewise_step,
                                      stack_stagewise, stagewise_scales)

    system, costs, constraints, x_ref = build_problem(N)
    sqp = from_mpc(system, costs, constraints)
    fleet = stack_stagewise([sqp], repeats=robots)

    if rho is None or warm_iters is None:
        # no-knobs path: one call, all policies measured
        tick, policy = make_stagewise_server(fleet, return_policy=True)
        warm_iters = policy["warm_iters"]
    else:
        # explicit override path (tests: skip the probe cost)
        opts = ct.SolverOptions(max_iter=300, early_exit=False,
                                polish=False, eps_abs=1e-4,
                                rho=float(rho))
        tick = make_stagewise_step(
            fleet, opts.replace(max_iter=int(warm_iters)),
            cold_options=opts, scaling=stagewise_scales(sqp))

    x0 = jnp.asarray(np.broadcast_to(np.asarray(system.x0),
                                     (robots, 12)).copy())
    X, U, info, warm = tick(x0)                     # cold start
    for t in range(ticks):
        x0 = X[:, 1]                                 # plant step
        X, U, info, warm = tick(x0, warm)
        if verbose:
            st = np.asarray(info.status)
            print(f"tick {t}: statuses {st.tolist()}, "
                  f"height {float(X[0, 1, 5]):+.3f}, "
                  f"v_x {float(X[0, 1, 9]):+.3f}")
    return X, U, info, warm_iters


if __name__ == "__main__":
    X, U, info, wi = serve()
    forces = np.asarray(U)[0, 0].reshape(4, 3)
    print(f"warm iters (measured): {wi}")
    print("applied per-leg forces [N]:")
    for leg, f in enumerate(forces):
        print(f"  leg {leg}: fx {f[0]:+7.2f}  fy {f[1]:+7.2f} "
              f" fz {f[2]:+7.2f}")
    print("all lanes converged:",
          bool((np.asarray(info.status) == ct.STATUS_SOLVED).all()))
