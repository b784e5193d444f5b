"""Production fleet serving: measured rho, one-dispatch tick chains,
honest statuses.

The round-3 serving recipe on a small double-integrator fleet:

1. build the stagewise problem once (`from_mpc`), stack it per lane;
2. let the MEASURED policy pick the ADMM penalty (`auto_rho_stagewise`
   probes the real serving step on sampled fleet lanes against the
   exact f64 oracle — no hand-tuned constants);
3. serve the whole control loop in ONE dispatch per horizon-of-ticks
   (`make_stagewise_multistep`: lax.scan over the fused tick with the
   plant inside the loop);
4. trust the statuses: they are per-tick, per-lane, and honest
   (KKT/certificate-backed — an infeasible or starved lane reports so).

Run:  PYTHONPATH=. python examples/fleet_serving.py        (CPU ok)
"""

import dataclasses

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

import copra_tpu as ct  # noqa: E402
from copra_tpu.qp.riccati import (auto_rho_stagewise, from_mpc,  # noqa: E402
                                  make_stagewise_multistep)


def main():
    # --- model: point mass under gravity, 5 ms tick -------------------
    T, mass, g = 0.005, 5.0, 9.81
    A = np.array([[1.0, T], [0.0, 1.0]], np.float32)
    B = np.array([[0.5 * T * T / mass], [T / mass]], np.float32)
    d = np.array([-g / 2.0 * T * T, -g * T], np.float32)
    N = 12

    system = ct.LTISystem.create(A, B, d, np.zeros(2, np.float32), N)
    costs = (ct.TargetCost.create(np.eye(2, dtype=np.float32),
                                  [0.0, -1.0], weights=[10.0, 1e4]),
             ct.ControlCost.create([[1.0]], [2.0], weights=[1e-4]))
    cons = (ct.ControlBoundConstraint.create([-150.0], [150.0]),)

    # --- fleet: one problem per robot, per-lane states ----------------
    robots = 16
    sqp = from_mpc(system, costs, cons)
    fleet = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (robots,) + a.shape), sqp)
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.normal(scale=[0.05, 0.5], size=(robots, 2))
                      .astype(np.float32) + np.float32([0.0, -1.5]))
    fleet = dataclasses.replace(fleet, x0=x0s)

    # --- measured serving penalty --------------------------------------
    opts = ct.SolverOptions(max_iter=120, early_exit=False)
    rho, probe = auto_rho_stagewise(fleet, opts, probe_lanes=4,
                                    return_probe=True)
    print("auto_rho_stagewise picked rho =", rho,
          "(probe gate errs:",
          {k: float(f"{v:.2g}") for k, v in probe.items()}, ")")
    opts = opts.replace(rho=rho)

    # --- one-dispatch closed loop --------------------------------------
    step_many = make_stagewise_multistep(fleet, opts)
    ticks = 50
    states, u0s, statuses, info, warm = step_many(x0s, ticks)
    print(f"{ticks} ticks x {robots} robots in one dispatch")
    print("final tick:", info.inform())
    conv = float((np.asarray(statuses) == ct.STATUS_SOLVED).mean())
    print(f"per-tick/per-lane converged fraction: {conv:.4f}")
    vel = np.asarray(states)[:, 0, 1]
    print("robot 0 velocity: start %.3f -> end %.3f (target -1.0)"
          % (vel[0], vel[-1]))

    # keep serving: thread the warm state into the next chain
    states2, u0s2, statuses2, info2, warm = step_many(
        states[-1], ticks, warm=warm)
    print("next chain final tick:", info2.inform())


if __name__ == "__main__":
    main()
