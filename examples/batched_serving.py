"""Production serving: thousands of warm-started MPC scenarios per step.

The TPU-native capability the reference cannot express (it solves one QP
per `LMPC::solve()` on one core): a mesh-sharded, warm-started, fixed
-iteration batched solve with psum-reduced health metrics — the pattern
behind the bench.py headline number.

Run:  PYTHONPATH=. python examples/batched_serving.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

import copra_tpu as ct
from copra_tpu.parallel import (batch_axes, make_mesh,
                                make_sharded_mpc_step, shard_batch)

BATCH, HORIZON = 1024, 50

T, mass = 0.005, 5.0
A = np.array([[1.0, T], [0.0, 1.0]])
B = np.array([[0.5 * T * T / mass], [T / mass]])
d = np.array([-9.81 / 2 * T * T, -9.81 * T])

rng = np.random.default_rng(0)
As = np.repeat(np.repeat(A[None], HORIZON, 0)[None], BATCH, 0)
As += rng.normal(scale=1e-4, size=As.shape)          # per-robot model error
x0s = np.array([0.0, -1.5]) + rng.normal(scale=[0.02, 0.1], size=(BATCH, 2))

fleet = ct.LTVSystem(
    A=jnp.asarray(As, jnp.float32),
    B=jnp.asarray(np.repeat(np.repeat(B[None], HORIZON, 0)[None], BATCH, 0),
                  jnp.float32),
    d=jnp.asarray(np.repeat(np.repeat(d[None], HORIZON, 0)[None], BATCH, 0),
                  jnp.float32),
    x0=jnp.asarray(x0s, jnp.float32))

costs = (ct.TargetCost.create(np.eye(2), [0.0, -1.0], weights=[10.0, 1e4]),
         ct.ControlCost.create([[1.0]], [2.0], weights=[1e-4]))
constraints = (ct.ControlBoundConstraint.create([-300.0], [300.0]),)

mesh = make_mesh()
fleet = shard_batch(fleet, mesh, reference=batch_axes(fleet))
step = make_sharded_mpc_step(mesh, costs, constraints,
                             ct.SolverOptions(max_iter=60))

res, stats = step(fleet, None)               # cold start (compiles)
warm = ct.WarmStart(x=res.solution.x, y=res.solution.y, z=res.solution.z)
res, stats = step(fleet, warm)               # warm signature (compiles too:
jax.block_until_ready(res.control)           # None vs WarmStart = new trace)

K = 5                                        # steady state: median-free mean
t0 = time.perf_counter()
for _ in range(K):
    res, stats = step(fleet, warm)
    warm = ct.WarmStart(x=res.solution.x, y=res.solution.y,
                        z=res.solution.z)
jax.block_until_ready(res.control)
dt = (time.perf_counter() - t0) / K

print(f"devices: {len(jax.devices())}   batch: {BATCH}   N={HORIZON}")
print(f"warm step: {dt * 1e3:.1f} ms -> {BATCH / dt:,.0f} solves/s")
print(f"converged: {int(stats['converged'])}/{int(stats['total'])}"
      f"   max primal residual: {float(stats['max_primal_residual']):.2e}")
