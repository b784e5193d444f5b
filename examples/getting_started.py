"""Getting started: the reference's point-mass-under-gravity problem.

The same system the reference's test suite is built around
(/root/reference/test/time_invariant_systems.h:46-105): a 1-D point mass
with a force input, driven to a target descent velocity under a force cap
and a no-upward-velocity bound.

Run:  PYTHONPATH=. python examples/getting_started.py
"""

import numpy as np

import copra_tpu as ct

T, mass = 0.005, 5.0
A = np.array([[1.0, T], [0.0, 1.0]])
B = np.array([[0.5 * T * T / mass], [T / mass]])
d = np.array([-9.81 / 2 * T * T, -9.81 * T])   # gravity drift
x0 = np.array([0.0, -5.0])                     # start falling at 5 m/s

system = ct.LTISystem.create(A, B, d, x0, horizon=300)
controller = ct.LMPC(system, options=ct.SolverOptions(
    max_iter=8000, eps_abs=1e-7, eps_rel=0.0))

# drive velocity to -1 m/s, prefer small force
controller.add_cost(ct.TargetCost.create(np.eye(2), [0.0, -1.0],
                                         weights=[10.0, 1e4]))
controller.add_cost(ct.ControlCost.create([[1.0]], [2.0], weights=[1e-4]))
# velocity may never be positive; force capped at 200 N
controller.add_constraint(ct.TrajectoryBoundConstraint.create(
    [-np.inf, -np.inf], [np.inf, 0.0]))
controller.add_constraint(ct.ControlBoundConstraint.create(
    [-np.inf], [200.0]))

assert controller.solve(), controller.inform()
X = np.asarray(controller.trajectory())
U = np.asarray(controller.control())

print(f"solved in {controller.solve_time() * 1e3:.1f} ms "
      f"({controller.inform()})")
print(f"terminal velocity: {X[-1]:+.4f} m/s (target -1)")
print(f"max force used:    {U.max():.1f} N (cap 200)")
print(f"max velocity:      {X[1::2].max():+.2e} m/s (must be <= 0)")
