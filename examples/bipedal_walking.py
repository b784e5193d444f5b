"""Bipedal walking: CoM preview control with ZMP constraints (LIPM).

The flagship long-horizon configuration (BASELINE.md config 5; the
reference README links the same use case as its motivating example).  A
linear inverted pendulum tracks a reference ZMP trajectory over an N=300
preview horizon while keeping the realized ZMP inside the moving support
polygon — the classic Wieber-style MPC formulation, built entirely from
copra-tpu primitives:

* state ``x = [c, cdot, cddot]`` (CoM position/velocity/acceleration per
  horizontal axis), control ``u = jerk``;
* triple-integrator dynamics ``A/B`` over sampling period ``T``;
* ZMP output row ``z = c - (h/g) cddot``;
* ZMP tracking as a full-size ``TrajectoryCost`` (time-varying reference),
  jerk smoothing as a ``SimpleControlCost``;
* support polygon as a full-size ``TrajectoryConstraint`` pair (time-varying
  upper/lower ZMP bounds) — exercising the full-horizon entry modes.

Both horizontal axes solve as one vmapped batch of two scenarios.

Run:  PYTHONPATH=. python examples/bipedal_walking.py
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

import copra_tpu as ct
from copra_tpu.autospan import span_matrix

GRAVITY = 9.81


def lipm_system(T: float, com_height: float):
    """Triple-integrator per-axis dynamics + ZMP output row."""
    A = np.array([[1.0, T, T * T / 2.0],
                  [0.0, 1.0, T],
                  [0.0, 0.0, 1.0]])
    B = np.array([[T ** 3 / 6.0], [T * T / 2.0], [T]])
    d = np.zeros(3)
    zmp_row = np.array([[1.0, 0.0, -com_height / GRAVITY]])
    return A, B, d, zmp_row


def footstep_plan(n_steps: int, horizon: int, T: float,
                  step_length: float = 0.2, step_width: float = 0.1,
                  step_duration: float = 0.8, margin: float = 0.05):
    """Reference ZMP per tick + support-polygon bounds for both axes.

    Returns ``(zmp_ref[2, H+1], zmp_min[2, H+1], zmp_max[2, H+1])`` for
    axes (x, y): the ZMP reference jumps to each new footstep location; the
    polygon is a box of ±margin around it.
    """
    ticks = horizon + 1
    per_step = int(round(step_duration / T))
    ref = np.zeros((2, ticks))
    for k in range(ticks):
        idx = min(k // per_step, n_steps - 1)
        ref[0, k] = idx * step_length
        ref[1, k] = (step_width if idx % 2 else -step_width) \
            if idx > 0 else 0.0
    lo = ref - margin
    hi = ref + margin
    return ref, lo, hi


def solve_preview(horizon: int = 300, T: float = 0.005,
                  com_height: float = 0.8,
                  options: ct.SolverOptions = ct.SolverOptions(max_iter=3000)):
    """One batched preview solve for both horizontal axes.

    Returns ``(X[2,(H+1)*3], U[2,H], zmp[2,H+1], (ref, lo, hi))``.
    """
    A, B, d, zmp_row = lipm_system(T, com_height)
    ref, lo, hi = footstep_plan(n_steps=4, horizon=horizon, T=T)
    Zfull = np.asarray(span_matrix(zmp_row, horizon + 1))
    jerk_w = np.full(horizon, 1e-6)
    zmp_w = np.full(horizon + 1, 1.0)

    base = ct.LTISystem(A=jnp.asarray(A), B=jnp.asarray(B),
                        d=jnp.asarray(d), x0=jnp.zeros(3), horizon=horizon)

    # the stagewise engine is the documented config-5 path: O(N) per
    # iteration with per-stage polygon rows (the condensed dense-row
    # path stalls on this workload in f32 — docs/PERFORMANCE.md)
    def axis_sqp(ref_ax, lo_ax, hi_ax):
        costs = (ct.TrajectoryCost(M=jnp.asarray(Zfull),
                                   p=jnp.asarray(ref_ax),
                                   weights=jnp.asarray(zmp_w)),
                 ct.SimpleControlCost(p=jnp.zeros(horizon),
                                      weights=jnp.asarray(jerk_w)))
        constraints = (
            ct.TrajectoryConstraint(E=jnp.asarray(Zfull),
                                    f=jnp.asarray(hi_ax)),
            ct.TrajectoryConstraint(E=-jnp.asarray(Zfull),
                                    f=jnp.asarray(-lo_ax)))
        from copra_tpu.qp.riccati import from_mpc
        return from_mpc(base, costs, constraints)

    sqp_b = jax.tree_util.tree_map(
        lambda *ls: jnp.stack(ls),
        axis_sqp(ref[0], lo[0], hi[0]), axis_sqp(ref[1], lo[1], hi[1]))
    X, U, sol = jax.jit(jax.vmap(
        lambda s: ct.solve_stagewise(s, options)))(sqp_b)
    X = X.reshape(2, -1)
    U = U.reshape(2, -1)
    # diagnostic on the HOST in f64: an on-device f32 einsum outside the
    # library's precision guard runs bf16 MXU passes and reports a
    # phantom ~4e-5 polygon violation (docs/PERFORMANCE.md lesson #1)
    zmp = np.asarray(Zfull, np.float64) @ np.asarray(X, np.float64).T
    return X, U, zmp.T, (ref, lo, hi), sol


def serve_fleet(robots: int = 4, horizon: int = 300, T: float = 0.005,
                com_height: float = 0.8, ticks: int = 3):
    """The production serving pattern: a fleet of robots, receding
    horizon, warm-started stagewise ticks.

    Uses ``make_stagewise_step`` — on TPU this runs the fused Pallas
    tick kernel (iteration-invariant Riccati gains, the whole
    fixed-count ADMM loop in VMEM): a 256-robot fleet ticks at
    ~0.04 ms/robot and a single robot inside the 5 ms sampling budget
    (docs/PERFORMANCE.md, config-5 table).
    """
    from copra_tpu.qp.riccati import from_mpc, make_stagewise_step
    import copra_tpu as ct_

    A, B, d, zmp_row = lipm_system(T, com_height)
    ref, lo, hi = footstep_plan(n_steps=4, horizon=horizon, T=T)
    Zfull = jnp.asarray(np.asarray(span_matrix(zmp_row, horizon + 1)),
                        jnp.float32)
    base = ct.LTISystem(A=jnp.asarray(A, jnp.float32),
                        B=jnp.asarray(B, jnp.float32),
                        d=jnp.asarray(d, jnp.float32),
                        x0=jnp.zeros(3, jnp.float32), horizon=horizon)

    def axis_sqp(ref_ax, lo_ax, hi_ax):
        costs = (ct.TrajectoryCost(M=Zfull, p=jnp.asarray(ref_ax,
                                                          jnp.float32),
                                   weights=jnp.ones(horizon + 1,
                                                    jnp.float32)),
                 ct.SimpleControlCost(p=jnp.zeros(horizon, jnp.float32),
                                      weights=jnp.full(horizon, 1e-6,
                                                       jnp.float32)))
        cons = (ct.TrajectoryConstraint(E=Zfull,
                                        f=jnp.asarray(hi_ax, jnp.float32)),
                ct.TrajectoryConstraint(E=-Zfull,
                                        f=jnp.asarray(-lo_ax,
                                                      jnp.float32)))
        return from_mpc(base, costs, cons)

    fleet = ct_.stack_stagewise([axis_sqp(ref[0], lo[0], hi[0]),
                                 axis_sqp(ref[1], lo[1], hi[1])],
                                repeats=robots)
    # no-knobs serving: rho / warm budget / equilibration all MEASURED
    tick = ct_.make_stagewise_server(fleet)
    lanes = 2 * robots
    x0 = jnp.zeros((lanes, 3), jnp.float32)
    X, U, info, warm = tick(x0)                      # cold start
    for k in range(ticks):                           # receding ticks
        x0 = X[:, 1]                                 # step the plant
        X, U, info, warm = tick(x0, warm)
    return X, U, info


if __name__ == "__main__":
    X, U, zmp, (ref, lo, hi), sol = solve_preview()
    zmp = np.asarray(zmp)
    print("status:", np.asarray(sol.status))
    print("zmp tracking err (x):", np.abs(zmp[0] - ref[0]).max())
    print("zmp in polygon:", bool((zmp <= hi + 1e-6).all()
                                  and (zmp >= lo - 1e-6).all()))
    print("final CoM x:", float(np.asarray(X)[0, -3]))
    Xf, Uf, info = serve_fleet()
    print("fleet receding ticks:", sol_info := np.asarray(info.status),
          "converged:", bool((sol_info == 0).all()))
