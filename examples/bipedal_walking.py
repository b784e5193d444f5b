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

    def solve_axis(x0, ref_ax, lo_ax, hi_ax):
        costs = (ct.TrajectoryCost(M=jnp.asarray(Zfull), p=ref_ax,
                                   weights=jnp.asarray(zmp_w)),
                 ct.SimpleControlCost(p=jnp.zeros(horizon),
                                      weights=jnp.asarray(jerk_w)))
        constraints = (
            ct.TrajectoryConstraint(E=jnp.asarray(Zfull), f=hi_ax),
            ct.TrajectoryConstraint(E=jnp.asarray(-Zfull), f=-lo_ax))
        res = ct.solve_mpc(base.with_x0(x0), costs, constraints, options)
        return res.trajectory, res.control, res.solution

    X, U, sol = jax.vmap(solve_axis)(
        jnp.zeros((2, 3)), jnp.asarray(ref), jnp.asarray(lo),
        jnp.asarray(hi))
    zmp = jnp.einsum("rS,aS->ar", jnp.asarray(Zfull), X)
    return X, U, zmp, (ref, lo, hi), sol


if __name__ == "__main__":
    X, U, zmp, (ref, lo, hi), sol = solve_preview()
    zmp = np.asarray(zmp)
    print("status:", np.asarray(sol.status))
    print("zmp tracking err (x):", np.abs(zmp[0] - ref[0]).max())
    print("zmp in polygon:", bool((zmp <= hi + 1e-6).all()
                                  and (zmp >= lo - 1e-6).all()))
    print("final CoM x:", float(np.asarray(X)[0, -3]))
