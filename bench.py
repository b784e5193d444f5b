"""Headline benchmark: batched warm-started LTV MPC solves/s on one chip.

Config mirrors BASELINE.md config 4 (1k-4k batched randomized LTV scenarios,
warm-started QP) at the N=100 horizon of the baseline metric.  Baseline
target: 10,000 solves/s per chip (BASELINE.json; the C++ reference publishes
no numbers of its own).

Prints exactly one JSON line:
    {"metric": ..., "value": N, "unit": "solves/s", "vs_baseline": N}
"""

import json
import os
import time

import numpy as np

BASELINE_SOLVES_PER_S = 10_000.0


def main():
    import jax
    # persistent compile cache: repeated bench runs skip the 1-2 min
    # first-compile cost
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import copra_tpu as ct
    from copra_tpu.parallel import solve_mpc_batch

    batch = int(os.environ.get("BENCH_BATCH", 4096))
    horizon = int(os.environ.get("BENCH_HORIZON", 100))
    iters = int(os.environ.get("BENCH_ITERS", 30))
    steps = int(os.environ.get("BENCH_STEPS", 5))
    dtype = jnp.float32

    T, mass = 0.005, 5.0
    A = np.array([[1.0, T], [0.0, 1.0]])
    B = np.array([[0.5 * T * T / mass], [T / mass]])
    d = np.array([-9.81 / 2.0 * T * T, -9.81 * T])

    rng = np.random.default_rng(0)
    As = np.repeat(np.repeat(A[None], horizon, 0)[None], batch, 0)
    As += rng.normal(scale=1e-4, size=As.shape)
    Bs = np.repeat(np.repeat(B[None], horizon, 0)[None], batch, 0)
    ds = np.repeat(np.repeat(d[None], horizon, 0)[None], batch, 0)
    x0s = np.array([0.0, -1.5])[None] + rng.normal(
        scale=[0.02, 0.1], size=(batch, 2))

    system = ct.LTVSystem(A=jnp.asarray(As, dtype), B=jnp.asarray(Bs, dtype),
                          d=jnp.asarray(ds, dtype),
                          x0=jnp.asarray(x0s, dtype))
    costs = (ct.TargetCost.create(np.eye(2), [0.0, -1.0],
                                  weights=[10.0, 1e4]),
             ct.ControlCost.create([[1.0]], [2.0], weights=[1e-4]))
    constraints = (ct.ControlBoundConstraint.create([-300.0], [300.0]),)
    # rho=1 converges fastest from the unconstrained seed when bounds are
    # active (see test_plan/test_qp seeding coverage); refine=0 suffices at
    # HIGHEST matmul precision (docs/PERFORMANCE.md)
    opts = ct.SolverOptions(max_iter=iters, early_exit=False, polish=False,
                            rho=float(os.environ.get("BENCH_RHO", "1.0")),
                            kkt_refine=int(os.environ.get("BENCH_REFINE",
                                                          "0")))
    mode = os.environ.get("BENCH_MODE", "plan")

    if mode in ("plan", "plan_xla"):
        # production serving path: condense + QP assembly + KKT
        # factorization happen ONCE (make_control_plan / make_plan_step);
        # each timed tick is the x0-affine update + fixed ADMM iterations
        from copra_tpu.plan import make_control_plan, make_plan_step

        def plan_one(A_, B_, d_, x0_):
            return make_control_plan(ct.LTVSystem(A=A_, B=B_, d=d_, x0=x0_),
                                     costs, constraints)

        plan = jax.jit(jax.vmap(plan_one))(system.A, system.B, system.d,
                                           system.x0)
        jax.block_until_ready(plan.Q)
        plan_step = make_plan_step(plan, opts, batched=True,
                                   use_fused=None if mode == "plan"
                                   else False,
                                   seed_center=x0s)

        def step(sys_b, warm):
            u, sol, nxt = plan_step(plan, sys_b.x0, warm)
            return u, nxt
    elif mode == "plan_fused_legacy":
        # plan path + Pallas fused iteration kernel (operators VMEM-resident
        # across all iterations)
        from copra_tpu.ops.admm_kernel import fused_admm_box
        from copra_tpu.plan import _box_fast_state, make_control_plan

        def plan_one(A_, B_, d_, x0_):
            return make_control_plan(ct.LTVSystem(A=A_, B=B_, d=d_, x0=x0_),
                                     costs, constraints)

        plan = jax.jit(jax.vmap(plan_one))(system.A, system.B, system.d,
                                           system.x0)
        import dataclasses as _dc

        from copra_tpu.plan import make_seed_map

        def one_fast(q):
            return _box_fast_state(_dc.replace(plan, Q=q), opts)

        Kinv, Kmat = jax.jit(jax.vmap(one_fast))(plan.Q)
        Kinv = Kinv.astype(jnp.float32)
        Kmat = Kmat.astype(jnp.float32)
        seed = make_seed_map(plan)       # host f64, cast to f32
        jax.block_until_ready(Kinv)
        n = plan.Q.shape[-1]
        lb = jnp.broadcast_to(plan.lb, (batch, n)).astype(jnp.float32)
        ub = jnp.broadcast_to(plan.ub, (batch, n)).astype(jnp.float32)

        @jax.jit
        def fstep(Kinv_, K_, seed_, x0s_, warm):
            c = (plan.c0 + jnp.einsum("bx,bxn->bn", x0s_, plan.Cmap)
                 ).astype(jnp.float32)
            if warm is None:
                wx = (seed_.u0
                      + jnp.einsum("bx,bxn->bn", x0s_, seed_.Umap)
                      ).astype(jnp.float32)
                wz = jnp.clip(wx, lb, ub)
                wy = jnp.zeros((batch, n), jnp.float32)
            else:
                wx, wy, wz = warm.x, warm.y, warm.z
            x, y, z = fused_admm_box(
                Kinv_, K_, c, lb, ub, wx, wy, wz,
                n_iter=iters, sigma=opts.sigma, alpha=opts.alpha,
                rho=opts.rho,
                refine=int(os.environ.get("BENCH_REFINE", "1")),
                sub_batch=int(os.environ.get("BENCH_SUB_BATCH", "32")))
            return x, ct.WarmStart(x=x, y=y, z=z)

        def step(sys_b, warm):
            return fstep(Kinv, Kmat, seed, sys_b.x0, warm)
    elif mode == "fused":
        from copra_tpu.ops.admm_kernel import solve_qp_batched_fused
        from copra_tpu.systems import condense_ltv

        @jax.jit
        def step(sys_b, warm):
            prev = jax.vmap(condense_ltv)(sys_b.A, sys_b.B, sys_b.d)
            qp = jax.vmap(
                lambda p, x0: ct.build_qp(p, x0, costs, constraints))(
                    prev, sys_b.x0)
            sol = solve_qp_batched_fused(qp, opts, warm)
            return sol.x, ct.WarmStart(x=sol.x, y=sol.y, z=sol.z)
    else:
        @jax.jit
        def step(sys_b, warm):
            res = solve_mpc_batch(sys_b, costs, constraints, opts,
                                  warm_start=warm)
            sol = res.solution
            return res.control, ct.WarmStart(x=sol.x, y=sol.y, z=sol.z)

    # honest receding-horizon workload: x0 drifts every tick (velocity
    # changes ~2% of its range per step), so warm starts face genuinely
    # new QPs rather than re-solving the same one
    drift = np.zeros((steps + 2, batch, 2))
    drift[:, :, 1] = np.cumsum(
        rng.normal(scale=0.02, size=(steps + 2, batch)), axis=0)
    x0_seq = [jnp.asarray(x0s + drift[t], dtype) for t in range(steps + 2)]

    import dataclasses as _dcl

    def at_tick(t):
        return _dcl.replace(system, x0=x0_seq[t])

    # warmup: compile + settle the warm start
    u, warm = step(at_tick(0), None)
    u, warm = step(at_tick(1), warm)
    jax.block_until_ready(u)

    t0 = time.perf_counter()
    for t in range(steps):
        u, warm = step(at_tick(2 + t), warm)
    jax.block_until_ready(u)
    elapsed = time.perf_counter() - t0
    solves_per_s = batch * steps / elapsed
    x0s = np.asarray(x0_seq[steps + 1])   # accuracy gate: last tick's QP

    # honesty gate: several lanes of the timed result vs the exact (f64,
    # native active-set) solutions of the same QPs
    err = None
    try:
        from copra_tpu.plan import make_control_plan, plan_qp
        from copra_tpu.qp.native import solve_qp_native
        errs = []
        for lane in (0, 1, 17, batch - 1):
            sysl = ct.LTVSystem(A=jnp.asarray(As[lane]),
                                B=jnp.asarray(Bs[lane]),
                                d=jnp.asarray(ds[lane]),
                                x0=jnp.asarray(x0s[lane]))
            planl = make_control_plan(sysl, costs, constraints)
            qpl = plan_qp(planl, sysl.x0)
            n0 = qpl.Q.shape[-1]
            exact = solve_qp_native(ct.DenseQP(
                Q=np.asarray(qpl.Q, np.float64),
                c=np.asarray(qpl.c, np.float64),
                Aeq=np.zeros((0, n0)), beq=np.zeros((0,)),
                Aineq=np.zeros((0, n0)), bineq=np.zeros((0,)),
                lb=np.asarray(qpl.lb, np.float64),
                ub=np.asarray(qpl.ub, np.float64)))
            errs.append(float(np.abs(np.asarray(u[lane], np.float64)
                                     - np.asarray(exact.x)).max()))
        err = max(errs)
    except Exception:
        pass

    out = {
        "metric": f"batched warm-started LTV MPC solves/s "
                  f"(B={batch}, N={horizon}, {iters} ADMM iters)",
        "value": round(solves_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / BASELINE_SOLVES_PER_S, 3),
    }
    if err is not None:
        out["max_err_vs_exact_4lanes"] = round(err, 8)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
