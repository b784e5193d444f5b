"""All-config benchmark: one JSON line per BASELINE.md config.

BASELINE.json benchmark configs (the reference publishes no numbers of
its own — targets come from BASELINE.json):

1. LTI double integrator N=10, trajectory+control cost, control bounds.
2. LTI N=10 with the full constraint set (trajectory / control / mixed /
   trajectory-bound / control-bound).
3. LTV N=10 with TrajectoryCost + ControlCost (per-lane dynamics).
4. 1k-4k batched randomized LTV, warm-started — that is ``bench.py``
   (the headline; run it separately).
5. Bipedal CoM preview, N=300, ZMP polygon rows, real-time budget —
   fleet tick latency, median-of-K, single-robot and fleet points.
6. Quadruped SRB MPC (x=12, u=12, r=12 friction rows, N=40, LTV gait) —
   robot-scale per-stage dimensions through the STREAMED fused kernel,
   gated against the exact f64 condensed native active-set solve.

Configs 1 and 3 are box-only and run the f64-exact accurate serving path
(same as the headline); configs 1-2 also emit a FUSED-stagewise-kernel
line (per-stage form, conv-1.0 iteration budgets).  Config 2's first
line is the f32 general plan path; config 5 runs the stagewise engine
(XLA + fused points).  Every line carries an accuracy gate
(``max_err_vs_exact``) vs the exact f64 native active-set solution of the
same QPs — a throughput number without the gate is unverified
(docs/PERFORMANCE.md lesson 1).

Run:   PYTHONPATH=/root/repo:/root/.axon_site python bench_all.py
       python bench_all.py --config 5     # one config only
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

BUDGET_MS_CONFIG5 = 5.0    # T = 5 ms sampling period of the LIPM preview


def _setup_jax():
    import jax
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax


def _lane_plan(plan, lane):
    """Slice one lane out of a (possibly partially) batched plan."""
    import jax
    from copra_tpu.plan import ControlPlan
    base = ControlPlan(Q=2, c0=1, Cmap=2, Aeq=2, beq0=1, Beqmap=2,
                       Aineq=2, bineq0=1, Bineqmap=2, lb=1, ub=1,
                       Phi=2, Psi=2, xi=1, xdim=plan.xdim, udim=plan.udim,
                       horizon=plan.horizon)
    return jax.tree_util.tree_map(
        lambda leaf, nd: leaf[lane] if leaf.ndim > nd else leaf, plan, base)


def _gate(plan, x0_last, u, lanes):
    """Max |u - exact| over sampled lanes (exact = f64 native active-set
    of the same f32-data QP, the bench.py honesty gate)."""
    import copra_tpu as ct
    from copra_tpu.plan import plan_qp
    from copra_tpu.qp.native import solve_qp_native
    errs = []
    for lane in lanes:
        qp = plan_qp(_lane_plan(plan, lane),
                     np.asarray(x0_last[lane], np.float64))
        qp64 = ct.DenseQP(*[np.asarray(leaf, np.float64)
                            for leaf in (qp.Q, qp.c, qp.Aeq, qp.beq,
                                         qp.Aineq, qp.bineq, qp.lb, qp.ub)])
        exact = solve_qp_native(qp64)
        errs.append(float(np.abs(np.asarray(u[lane], np.float64)
                                 - np.asarray(exact.x)).max()))
    return max(errs)


def _time_ticks(step, plan, x0_seq, steps):
    """Warm up 2 ticks, then time ``steps`` ticks; returns per-tick secs."""
    import jax
    u, _, warm = step(plan, x0_seq[0], None)
    u, _, warm = step(plan, x0_seq[1], warm)
    jax.block_until_ready(u)
    times = []
    for t in range(steps):
        t0 = time.perf_counter()
        u, sol, warm = step(plan, x0_seq[2 + t], warm)
        jax.block_until_ready(u)
        times.append(time.perf_counter() - t0)
    return u, sol, times


def _profile_device_per_tick(jax_mod, run_once, n=4):
    """Measured device/dispatch decomposition (VERDICT r3 #2): run
    ``run_once`` n times under a jax.profiler trace and return the pure
    device-busy ms per tick ('XLA Ops' track, bench.py parser).  Wall
    medians through the dev tunnel include ~20 ms of dispatch; only the
    profiler device durations attribute the gap BY MEASUREMENT."""
    import tempfile

    from bench import _trace_device_time
    td = tempfile.mkdtemp(prefix="benchprof_")
    out = None
    with jax_mod.profiler.trace(td):
        for _ in range(n):
            out = run_once()
        jax_mod.block_until_ready(out)
    parsed = _trace_device_time(td)
    if not parsed:
        return None
    busy, top = parsed
    return {"measured_device_ms_per_tick": round(busy / n * 1e3, 3),
            "device_top_ops_ms": [[nm, round(s / n * 1e3, 3)]
                                  for nm, s in top[:5]]}


_EMITTED = []


def _emit(out):
    print(json.dumps(out), flush=True)
    _EMITTED.append(out)


def _write_artifact(ran_configs):
    """Persist the run as an in-repo machine artifact (VERDICT r2 #2):
    one JSON line per bench line, gates included.  Partial runs
    (``--config N``) merge into an existing artifact; full runs rewrite
    it.  Default path ``BENCHALL.json`` (override: ``BENCHALL_OUT``, the
    driver/round convention is ``BENCHALL_r0N.json``)."""
    path = os.environ.get("BENCHALL_OUT",
                          os.path.join(os.path.dirname(
                              os.path.abspath(__file__)), "BENCHALL.json"))
    kept = []
    if os.path.exists(path):
        with open(path) as f:
            kept = [json.loads(line) for line in f if line.strip()]
        kept = [l for l in kept if l.get("config") not in ran_configs]
    lines = sorted(kept + _EMITTED, key=lambda l: l.get("config", 0))
    with open(path, "w") as f:
        for line in lines:
            f.write(json.dumps(line) + "\n")
    print(f"# wrote {len(lines)} lines -> {path}", file=sys.stderr)


def _double_integrator(T=0.1):
    A = np.array([[1.0, T], [0.0, 1.0]])
    B = np.array([[0.5 * T * T], [T]])
    d = np.zeros(2)
    return A, B, d


def _stagewise_line(config, metric_prefix, system, costs, constraints,
                    plan, x0s, drift, batch, steps, switers=None,
                    rho=None, polish_default=60):
    """Shared FUSED-stagewise bench block for the N=10 configs: warm
    receding ticks (wall) + K chained ticks (marginal), gated vs the
    exact f64 oracle of the same QPs.  ``rho=None``/``switers=None`` run
    the MEASURED policies (auto_rho_stagewise / auto_iters_stagewise) —
    no hand-set serving constants (VERDICT r4 #4; CLAUDE.md doctrine:
    serving rho is measured, not tuned)."""
    import jax
    import jax.numpy as jnp
    import copra_tpu as ct
    from copra_tpu.qp.riccati import (auto_iters_stagewise,
                                      auto_rho_stagewise, from_mpc,
                                      make_stagewise_step)

    sqp = from_mpc(system, costs, constraints)
    sqp_b = dataclasses.replace(
        jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(a, (batch,) + a.shape), sqp),
        x0=jnp.asarray(x0s, jnp.float32))
    if rho is None:
        # probe REPRESENTATIVE FLEET lanes: a single-lane probe picks a
        # penalty tuned to one x0 that can fail fleet-wide (measured:
        # lane-0 probe picks 1.0 -> fleet err 0.8; 8-lane probe picks
        # 0.03 -> 7e-6 on this workload).  The candidate grid includes
        # the sub-0.03 decade the general-path auto_rho lands in
        # (config 2 measured 0.0067 there — a 2x iteration win).
        rho = (float(os.environ["BENCH_RHO"]) if "BENCH_RHO" in os.environ
               else auto_rho_stagewise(
                   sqp_b, ct.SolverOptions(max_iter=200,
                                           early_exit=False),
                   probe_lanes=8, drift_scale=0.02,
                   candidates=(0.003, 0.01, 0.03, 0.1, 0.3, 1.0, 3.0)))
    if switers is None:
        # measured warm budget: smallest candidate whose whole-horizon
        # tail error reaches the pre-polish f32 floor class (3e-5 —
        # the df32 polish below then retires the floor under 1e-5;
        # the exact-oracle gate verifies the delivered accuracy)
        switers, sw_probe = auto_iters_stagewise(
            sqp_b, ct.SolverOptions(early_exit=False, rho=rho),
            probe_lanes=8, drift_scale=0.02,
            candidates=(50, 100, 200, 300, 400, 600, 800),
            target_applied_err=3e-5, target_tail_err=3e-5,
            return_probe=True)
        _emit({"config": config,
               "metric": "measured fused-line policy (auto_rho + "
                         "auto_iters, pre-polish floor gate)",
               "chosen_iters": switers, "rho": float(f"{rho:.4g}"),
               "pareto": {str(k): {kk: float(f"{vv:.3g}")
                                   for kk, vv in v.items()}
                          for k, v in sw_probe.items()}})
    # df32 polish: the compensated-f32 pass after the f32 phase retires
    # the kernel's ~2e-5 accuracy floor (ops/df32_polish.py) — the fused
    # throughput lines must sit inside the 1e-5 contract.  The budget is
    # per-config MEASURED: config 2's polish converges by ~25 iters
    # (gate 5.2e-7 at 25 vs 6.2e-7 at 60 — flat, 15.6 ms saved), config
    # 1's needs the fuller 60 (gate 3.95e-6).
    polish = int(os.environ.get("BENCH_SW_POLISH", polish_default))
    sopts = ct.SolverOptions(max_iter=switers, early_exit=False, rho=rho,
                             polish_iters=polish,
                             topup_iters=2 * switers)
    tick = make_stagewise_step(sqp_b, sopts,
                               cold_options=sopts.replace(max_iter=2000),
                               backend="fused")
    x0_seq = [jnp.asarray((x0s + drift[min(t, steps + 1)]
                           + 0.001 * t).astype(np.float32))
              for t in range(steps + 9)]
    X, U, info, warm = tick(x0_seq[0])
    X, U, info, warm = tick(x0_seq[1], warm)
    jax.block_until_ready(U)
    times = []
    for t in range(steps):
        t0 = time.perf_counter()
        X, U, info, warm = tick(x0_seq[2 + t], warm)
        jax.block_until_ready(U)
        times.append(time.perf_counter() - t0)
    K = 6
    t0 = time.perf_counter()
    for t in range(K):
        X, U, info, warm = tick(x0_seq[2 + steps + t - 1], warm)
    jax.block_until_ready(U)
    marg = (time.perf_counter() - t0) / K
    # device-derived rate: tunnel walls of repeated near-identical calls
    # report fantasy rates (observed 19M "solves/s" on config 2 —
    # CLAUDE.md); the profiler device-busy time is the honest number
    w_fix, x_fix = warm, x0_seq[steps + K]
    prof = _profile_device_per_tick(jax, lambda: tick(x_fix, w_fix)[1])
    worst = info.failed_lanes(3)
    err = _gate(plan, np.asarray(x0_seq[steps + K]),
                U.reshape(batch, -1), tuple({0, 1, 17, batch - 1, *worst}))
    _emit({"config": config,
           "metric": f"{metric_prefix} (B={batch}, FUSED stagewise "
                     f"kernel, {switers} iters + {polish} df32 polish)",
           "value": (round(batch / (prof["measured_device_ms_per_tick"]
                                    * 1e-3), 1)
                     if prof else round(batch * steps / sum(times), 1)),
           "unit": "solves/s",
           "rate_basis": ("device-time" if prof else "wall"),
           "rho": float(f"{rho:.4g}"),
           "wall_solves_per_s": round(batch * steps / sum(times), 1),
           "chained_solves_per_s": round(batch / marg, 1),
           **({} if prof is None else prof),
           "max_err_vs_exact": float(f"{err:.3g}"),
           "iterations": switers,
           "polish_iters": polish,
           "converged_frac": float(np.mean(np.asarray(info.status)
                                           == 0))})


def config1():
    """LTI double integrator N=10, traj+control cost, control bounds."""
    jax = _setup_jax()
    import jax.numpy as jnp
    import copra_tpu as ct
    from copra_tpu.autospan import span_matrix
    from copra_tpu.plan import auto_rho, make_control_plan, make_plan_step

    batch = int(os.environ.get("BENCH_BATCH", 4096))
    steps = int(os.environ.get("BENCH_STEPS", 5))
    iters = int(os.environ.get("BENCH_ITERS", 300))
    rounds = int(os.environ.get("BENCH_ROUNDS", 3))
    N = 10
    A, B, d = _double_integrator()
    rng = np.random.default_rng(1)
    x0s = np.array([1.0, 0.0])[None] + rng.normal(scale=[0.3, 0.2],
                                                  size=(batch, 2))
    f32 = jnp.float32
    system = ct.LTISystem.create(A.astype(np.float32),
                                 B.astype(np.float32),
                                 d.astype(np.float32),
                                 x0s[0].astype(np.float32), N)
    # track position -> 0 over the horizon (full-size TrajectoryCost),
    # small control effort, tight accel bounds so lanes saturate
    pos_row = np.asarray(span_matrix(np.array([[1.0, 0.0]]), N + 1))
    costs = (ct.TrajectoryCost(M=jnp.asarray(pos_row, f32),
                               p=jnp.zeros(N + 1, f32),
                               weights=jnp.full(N + 1, 10.0, f32)),
             ct.SimpleControlCost(p=jnp.zeros(N, f32),
                                  weights=jnp.full(N, 1e-3, f32)))
    constraints = (ct.ControlBoundConstraint.create([-2.0], [2.0]),)
    plan = make_control_plan(system, costs, constraints)
    # measured rho policy (suggest_rho's geometric-mean heuristic stalls
    # when nearly every coordinate saturates: rho=0.003 -> err 4.0 at any
    # iters; the probe lands in the 3-10x gm band that converges)
    opts = ct.SolverOptions(max_iter=iters, early_exit=False, polish=False)
    opts = opts.replace(rho=float(os.environ["BENCH_RHO"])
                        if "BENCH_RHO" in os.environ
                        else auto_rho(plan, x0s, opts,
                                      seed_center=x0s.mean(0),
                                      accurate=True,
                                      accurate_rounds=rounds))
    step = make_plan_step(plan, opts, batched=True, seed_center=x0s.mean(0),
                          accurate=True, accurate_rounds=rounds)
    drift = rng.normal(scale=0.02, size=(steps + 2, batch, 2)).cumsum(0)
    x0_seq = [jnp.asarray((x0s + drift[t]).astype(np.float32))
              for t in range(steps + 2)]
    u, sol, times = _time_ticks(step, plan, x0_seq, steps)
    sps = batch * steps / sum(times)
    worst1 = sol.failed_lanes(3)
    err = _gate(plan, np.asarray(x0_seq[-1]), u,
                tuple({0, 1, 17, batch - 1, *worst1}))
    _emit({"config": 1,
           "metric": "LTI double-integrator N=10 solves/s "
                     f"(B={batch}, accurate path, {iters} iters)",
           "value": round(sps, 1), "unit": "solves/s",
           "rho": float(f"{opts.rho:.4g}"),
           "max_err_vs_exact": float(f"{err:.3g}"),
           "iterations": rounds * iters,
           "converged_frac": float(np.mean(np.asarray(sol.status) == 0))})

    # Same workload through the FUSED stagewise kernel (box-only form):
    # throughput point at the first-order accuracy class — the accurate
    # path above stays the 1e-12-class reference.  rho AND the warm
    # iteration budget are MEASURED (auto_rho/auto_iters_stagewise).
    _stagewise_line(1, "LTI double-integrator N=10 solves/s", system,
                    costs, constraints, plan, x0s, drift, batch, steps,
                    switers=(int(os.environ["BENCH_SW_ITERS"])
                             if "BENCH_SW_ITERS" in os.environ else None))


def config2():
    """LTI N=10 with trajectory/control/mixed/bound constraints."""
    jax = _setup_jax()
    import jax.numpy as jnp
    import copra_tpu as ct
    from copra_tpu.plan import auto_rho, make_control_plan, make_plan_step

    batch = int(os.environ.get("BENCH_BATCH", 4096))
    steps = int(os.environ.get("BENCH_STEPS", 5))
    iters = int(os.environ.get("BENCH_ITERS", 400))
    N = 10
    A, B, d = _double_integrator()
    rng = np.random.default_rng(2)
    x0s = np.array([1.0, 0.0])[None] + rng.normal(scale=[0.3, 0.2],
                                                  size=(batch, 2))
    system = ct.LTISystem.create(A.astype(np.float32),
                                 B.astype(np.float32),
                                 d.astype(np.float32),
                                 x0s[0].astype(np.float32), N)
    # pin EVERYTHING to f32 (under x64, bare numpy costs make the plan
    # f64 — which silently ran the whole line through TPU f64 EMULATION:
    # measured 17.2k solves/s vs 158k once the plan is genuinely f32)
    f32c = lambda a: np.asarray(a, np.float32)
    costs = (ct.TargetCost.create(f32c(np.eye(2)), f32c([0.0, 0.0]),
                                  weights=f32c([10.0, 1.0])),
             ct.ControlCost.create(f32c([[1.0]]), f32c([0.0]),
                                   weights=f32c([1e-3])))
    constraints = (
        ct.TrajectoryConstraint.create(f32c([[0.0, 1.0]]), f32c([1.5])),
        ct.ControlConstraint.create(f32c([[1.0]]), f32c([1.9])),
        ct.MixedConstraint.create(f32c([[1.0, 0.0]]), f32c([[0.1]]),
                                  f32c([3.0])),
        ct.TrajectoryBoundConstraint.create(f32c([-5.0, -2.0]),
                                            f32c([5.0, 2.0])),
        ct.ControlBoundConstraint.create(f32c([-2.0]), f32c([2.0])),
    )
    plan = make_control_plan(system, costs, constraints)
    opts = ct.SolverOptions(max_iter=iters, early_exit=False, polish=False)
    opts = opts.replace(rho=float(os.environ["BENCH_RHO"])
                        if "BENCH_RHO" in os.environ
                        else auto_rho(plan, x0s, opts,
                                      seed_center=x0s.mean(0)))
    step = make_plan_step(plan, opts, batched=True,
                          seed_center=x0s.mean(0))
    drift = rng.normal(scale=0.02, size=(steps + 2, batch, 2)).cumsum(0)
    x0_seq = [jnp.asarray((x0s + drift[t]).astype(np.float32))
              for t in range(steps + 2)]
    u, sol, times = _time_ticks(step, plan, x0_seq, steps)
    sps = batch * steps / sum(times)
    # gate the WORST non-converged lanes too (per-lane forensics): when
    # the status is conservative relative to delivered accuracy, the
    # line itself documents it — max_err_vs_exact covers the lanes the
    # status flags, so "conv < 1.0 at err 1e-6" is a measured statement
    # about those lanes, not an open question (VERDICT r2 task 2)
    worst = sol.failed_lanes(3)
    err = _gate(plan, np.asarray(x0_seq[-1]), u,
                tuple({0, 1, 17, batch - 1, *worst}))
    _emit({"config": 2,
           "metric": "LTI N=10 full-constraint-set solves/s "
                     f"(B={batch}, general plan path, {iters} iters)",
           "value": round(sps, 1), "unit": "solves/s",
           "rho": float(f"{opts.rho:.4g}"),
           "max_err_vs_exact": float(f"{err:.3g}"),
           "worst_failed_lanes_gated": [int(w) for w in worst],
           "iterations": iters,
           "converged_frac": float(np.mean(np.asarray(sol.status) == 0))})

    # Same workload through the FUSED stagewise kernel: every config-2
    # constraint kind is per-stage-expressible (from_mpc), so the
    # long-horizon engine also wins at N=10 (per-stage rows get native
    # z-step projections instead of dense C matvecs).  rho AND the warm
    # budget are MEASURED (auto_rho/auto_iters_stagewise).
    _stagewise_line(2, "LTI N=10 full-constraint-set solves/s", system,
                    costs, constraints, plan, x0s, drift, batch, steps,
                    switers=(int(os.environ["BENCH_SW_ITERS"])
                             if "BENCH_SW_ITERS" in os.environ else None),
                    polish_default=25)


def config3():
    """LTV N=10 with TrajectoryCost + ControlCost (per-lane dynamics)."""
    jax = _setup_jax()
    import jax.numpy as jnp
    import copra_tpu as ct
    from copra_tpu.autospan import span_matrix
    from copra_tpu.plan import auto_rho, make_control_plan, make_plan_step

    batch = int(os.environ.get("BENCH_BATCH", 4096))
    steps = int(os.environ.get("BENCH_STEPS", 5))
    iters = int(os.environ.get("BENCH_ITERS", 30))
    N = 10
    A, B, d = _double_integrator()
    rng = np.random.default_rng(3)
    As = np.repeat(np.repeat(A[None], N, 0)[None], batch, 0)
    As += rng.normal(scale=1e-3, size=As.shape)
    Bs = np.repeat(np.repeat(B[None], N, 0)[None], batch, 0)
    Bs += rng.normal(scale=1e-3, size=Bs.shape)
    ds = np.repeat(np.repeat(d[None], N, 0)[None], batch, 0)
    x0s = np.array([1.0, 0.0])[None] + rng.normal(scale=[0.3, 0.2],
                                                  size=(batch, 2))
    f32 = jnp.float32
    pos_row = np.asarray(span_matrix(np.array([[1.0, 0.0]]), N + 1))
    costs = (ct.TrajectoryCost(M=jnp.asarray(pos_row, f32),
                               p=jnp.zeros(N + 1, f32),
                               weights=jnp.full(N + 1, 10.0, f32)),
             ct.SimpleControlCost(p=jnp.zeros(N, f32),
                                  weights=jnp.full(N, 1e-3, f32)))

    def plan_one(A_, B_, d_, x0_):
        return make_control_plan(
            ct.LTVSystem(A=A_, B=B_, d=d_, x0=x0_), costs, ())

    plan = jax.jit(jax.vmap(plan_one))(
        jnp.asarray(As, jnp.float32), jnp.asarray(Bs, jnp.float32),
        jnp.asarray(ds, jnp.float32), jnp.asarray(x0s, jnp.float32))
    jax.block_until_ready(plan.Q)
    opts = ct.SolverOptions(max_iter=iters, early_exit=False, polish=False)
    opts = opts.replace(rho=float(os.environ["BENCH_RHO"])
                        if "BENCH_RHO" in os.environ
                        else auto_rho(plan, x0s, opts, seed_center=x0s,
                                      accurate=True, accurate_rounds=1))
    step = make_plan_step(plan, opts, batched=True, seed_center=x0s,
                          accurate=True, accurate_rounds=1)
    drift = rng.normal(scale=0.02, size=(steps + 2, batch, 2)).cumsum(0)
    x0_seq = [jnp.asarray((x0s + drift[t]).astype(np.float32))
              for t in range(steps + 2)]
    u, sol, times = _time_ticks(step, plan, x0_seq, steps)
    sps = batch * steps / sum(times)
    err = _gate(plan, np.asarray(x0_seq[-1]), u, (0, 1, 17, batch - 1))
    _emit({"config": 3,
           "metric": "LTV N=10 cost-only solves/s "
                     f"(B={batch}, accurate path, {iters} iters)",
           "value": round(sps, 1), "unit": "solves/s",
           "rho": float(f"{opts.rho:.4g}"),
           "max_err_vs_exact": float(f"{err:.3g}"),
           "iterations": iters,
           "converged_frac": float(np.mean(np.asarray(sol.status) == 0))})

    # DIRECT-LQR line: a cost-only problem has no inequality structure —
    # it is an equality-constrained LQ, EXACT in one Riccati sweep (the
    # ct.solve unconstrained fast path).  The backward pass is
    # x0-independent, so the per-tick work is the linear sweeps with
    # precomputed gains — no first-order iteration at all.
    from copra_tpu.qp.riccati import from_mpc
    from copra_tpu.ops.stagewise_kernel import (lqr_solve_fixed,
                                                precompute_lqr_gains)

    sqp0 = from_mpc(ct.LTVSystem(A=jnp.asarray(As[0], jnp.float32),
                                 B=jnp.asarray(Bs[0], jnp.float32),
                                 d=jnp.asarray(ds[0], jnp.float32),
                                 x0=jnp.asarray(x0s[0], jnp.float32)),
                    costs, ())
    A_b = jnp.asarray(As, jnp.float32)
    B_b = jnp.asarray(Bs, jnp.float32)
    d_b = jnp.asarray(ds, jnp.float32)
    bcast = lambda a: jnp.broadcast_to(a, (batch,) + a.shape)
    Qx_b, qx_b = bcast(sqp0.Qx), bcast(sqp0.qx)
    Ru_b, ru_b = bcast(sqp0.Ru), bcast(sqp0.ru)
    gains = jax.jit(jax.vmap(precompute_lqr_gains))(A_b, B_b, d_b,
                                                    Qx_b, Ru_b)
    jax.block_until_ready(gains.K)

    @jax.jit
    def lqr_tick(g, A_, B_, d_, qx_, ru_, x0_t):
        return jax.vmap(lqr_solve_fixed)(g, A_, B_, d_, qx_, ru_, x0_t)

    Xl, Ul = lqr_tick(gains, A_b, B_b, d_b, qx_b, ru_b, x0_seq[0])
    jax.block_until_ready(Ul)
    t0 = time.perf_counter()
    for t in range(steps):
        Xl, Ul = lqr_tick(gains, A_b, B_b, d_b, qx_b, ru_b,
                          x0_seq[1 + t])
    jax.block_until_ready(Ul)
    wall_sps = batch * steps / (time.perf_counter() - t0)
    prof = _profile_device_per_tick(
        jax, lambda: lqr_tick(gains, A_b, B_b, d_b, qx_b, ru_b,
                              x0_seq[steps])[1])
    err_l = _gate(plan, np.asarray(x0_seq[steps]),
                  np.asarray(Ul).reshape(batch, -1),
                  (0, 1, 17, batch - 1))
    u_sc = max(1.0, float(np.abs(np.asarray(Ul)).max()))
    _emit({"config": 3,
           "metric": f"LTV N=10 cost-only solves/s (B={batch}, "
                     f"DIRECT LQR one-sweep, f32 sweeps with "
                     f"precomputed gains — structurally exact, "
                     f"f32-rounding accuracy class)",
           "value": (round(batch / (prof["measured_device_ms_per_tick"]
                                    * 1e-3), 1)
                     if prof else round(wall_sps, 1)),
           "unit": "solves/s",
           "rate_basis": ("device-time" if prof else "wall"),
           "wall_solves_per_s": round(wall_sps, 1),
           **({} if prof is None else prof),
           "max_err_vs_exact": float(f"{err_l:.3g}"),
           "max_err_rel": float(f"{err_l / u_sc:.3g}"),
           "iterations": 1,
           "converged_frac": 1.0})


def _bipedal_workload():
    """Shared config-5 data: LIPM triple integrator + footstep plan."""
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "examples"))
    from bipedal_walking import footstep_plan, lipm_system
    from copra_tpu.autospan import span_matrix

    horizon, T = 300, 0.005
    A, B, d, zmp_row = lipm_system(T, 0.8)
    ref, lo, hi = footstep_plan(4, horizon, T)
    Zfull = np.asarray(span_matrix(zmp_row, horizon + 1))
    return horizon, T, A, B, d, zmp_row, Zfull, ref, lo, hi


def _zmp_exact(A, B, d, zmp_row, ref_ax, lo_ax, hi_ax, x0,
               zmp_w=1.0, jerk_w=1e-6, ridge=1e-6):
    """f64 condensed assembly + native active-set solve of one ZMP axis.

    The honesty oracle for config 5: same f32-origin data, condensed in
    f64 (Phi/Psi recursion), ZMP rows as inequality pairs, solved exactly.
    Returns ``(U_exact, X_exact)``.
    """
    import copra_tpu as ct
    from copra_tpu.qp.native import solve_qp_native

    N = len(ref_ax) - 1
    A = np.asarray(A, np.float64)
    B = np.asarray(B, np.float64)[:, 0]
    d = np.asarray(d, np.float64)
    x = A.shape[0]
    Phi = np.zeros((N + 1, x, x))
    Psi = np.zeros((N + 1, x, N))
    xi = np.zeros((N + 1, x))
    Phi[0] = np.eye(x)
    for k in range(1, N + 1):
        Phi[k] = A @ Phi[k - 1]
        Psi[k] = A @ Psi[k - 1]
        Psi[k][:, k - 1] += B
        xi[k] = A @ xi[k - 1] + d
    z_row = np.asarray(zmp_row, np.float64).ravel()
    Zphi = np.einsum("x,kxy->ky", z_row, Phi)       # [N+1, x]
    Zpsi = np.einsum("x,kxu->ku", z_row, Psi)       # [N+1, N]
    Zxi = xi @ z_row                                # [N+1]
    zoff = Zphi @ np.asarray(x0, np.float64) + Zxi
    Q = zmp_w * (Zpsi.T @ Zpsi) + (jerk_w + ridge) * np.eye(N)
    c = zmp_w * (Zpsi.T @ (zoff - np.asarray(ref_ax, np.float64)))
    Aineq = np.concatenate([Zpsi, -Zpsi], axis=0)
    bineq = np.concatenate([np.asarray(hi_ax, np.float64) - zoff,
                            zoff - np.asarray(lo_ax, np.float64)])
    sol = solve_qp_native(ct.DenseQP(
        Q=Q, c=c, Aeq=np.zeros((0, N)), beq=np.zeros(0),
        Aineq=Aineq, bineq=bineq,
        lb=np.full(N, -np.inf), ub=np.full(N, np.inf)))
    U = np.asarray(sol.x)
    X = Phi @ np.asarray(x0, np.float64) + Psi @ U + xi
    return U, X, (Zphi, Zpsi, Zxi)


def config5():
    """Bipedal ZMP preview fleet via the STAGEWISE path (O(N)/iteration
    Riccati-in-ADMM with per-stage ZMP rows — the long-horizon engine;
    the condensed plan path stalls on the x-axis at 2000 iterations,
    objective gap 0.08)."""
    jax = _setup_jax()
    import jax.numpy as jnp
    import copra_tpu as ct
    from copra_tpu.qp.riccati import (auto_iters_stagewise,
                                      auto_rho_stagewise, from_mpc,
                                      solve_stagewise)

    horizon, T, A, B, d, zmp_row, Zfull, ref, lo, hi = _bipedal_workload()
    f32 = jnp.float32
    iters = int(os.environ.get("BENCH_ITERS", 300))
    ticks = int(os.environ.get("BENCH_STEPS", 5))
    pscan = bool(int(os.environ.get("BENCH_PARALLEL_SCAN", "0")))
    system = ct.LTISystem.create(A.astype(np.float32),
                                 B.astype(np.float32),
                                 d.astype(np.float32),
                                 np.zeros(3, np.float32), horizon)

    def axis_sqp(ax):
        costs = (ct.TrajectoryCost(M=jnp.asarray(Zfull, f32),
                                   p=jnp.asarray(ref[ax], f32),
                                   weights=jnp.full(horizon + 1, 1.0, f32)),
                 ct.SimpleControlCost(p=jnp.zeros(horizon, f32),
                                      weights=jnp.full(horizon, 1e-6,
                                                       f32)))
        constraints = (ct.TrajectoryConstraint(E=jnp.asarray(Zfull, f32),
                                               f=jnp.asarray(hi[ax], f32)),
                       ct.TrajectoryConstraint(E=jnp.asarray(-Zfull, f32),
                                               f=jnp.asarray(-lo[ax], f32)))
        return from_mpc(system, costs, constraints)

    sq = [axis_sqp(0), axis_sqp(1)]
    # eps_abs: statuses gate at 1e-5 (10x eps_abs) — the measured
    # residual class of the 20-iter warm serving budget in the
    # normalized-row metric (config-6 convention: "converged" means "at
    # the serving budget's measured floor"); the real honesty bar stays
    # the exact-oracle gate + rel fields on every line
    opts = ct.SolverOptions(max_iter=iters, early_exit=False,
                            polish=False, eps_abs=1e-6)
    # measured rho policy over the two per-axis lanes (picks 1.0 on this
    # workload — the old hand constant, now derived instead of asserted)
    sq_stacked = jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *sq)
    opts = opts.replace(rho=float(os.environ["BENCH_RHO"])
                        if "BENCH_RHO" in os.environ
                        else auto_rho_stagewise(
                            sq_stacked,
                            opts.replace(
                                max_iter=int(os.environ.get(
                                    "BENCH_WARM_ITERS", 30))),
                            cold_options=opts))

    # measured warm-iteration budget (VERDICT r3 #4): probe the applied
    # (first) control's error per candidate against the f64 oracle and
    # take the smallest budget meeting 1e-5; BENCH_WARM_ITERS overrides
    if "BENCH_WARM_ITERS" in os.environ:
        witers = int(os.environ["BENCH_WARM_ITERS"])
        iters_probe = None
    else:
        witers, iters_probe = auto_iters_stagewise(
            sq_stacked, opts, cold_options=opts,
            candidates=(10, 20, 30, 50, 80),
            target_applied_err=1e-5, return_probe=True)
        _emit({"config": 5,
               "metric": "measured warm-iteration policy "
                         "(auto_iters_stagewise, applied-control gate)",
               "chosen_iters": witers,
               "target_applied_err": 1e-5,
               "pareto": {str(k): {kk: float(f"{vv:.3g}")
                                   for kk, vv in v.items()}
                          for k, v in iters_probe.items()}})

    @jax.jit
    def tick(sqp_b, x0_b):
        sqp_t = dataclasses.replace(sqp_b, x0=x0_b)
        return jax.vmap(
            lambda s: solve_stagewise(s, opts, parallel_scan=pscan))(sqp_t)

    for robots in (1, int(os.environ.get("BENCH_ROBOTS", 256))):
        lanes = 2 * robots
        sqp_b = jax.tree_util.tree_map(
            lambda *ls: jnp.tile(jnp.stack(ls), (robots,) + (1,) *
                                 ls[0].ndim), *sq)
        rng = np.random.default_rng(5)
        x0_seq = [jnp.asarray(rng.normal(scale=0.005, size=(lanes, 3))
                              .astype(np.float32))
                  for _ in range(ticks + 1)]
        X, U, info = tick(sqp_b, x0_seq[0])          # compile + warmup
        jax.block_until_ready(U)
        times = []
        for t in range(ticks):
            t0 = time.perf_counter()
            X, U, info = tick(sqp_b, x0_seq[1 + t])
            jax.block_until_ready(U)
            times.append(time.perf_counter() - t0)
        med = float(np.median(times))

        # honesty gates (lane 0 = x axis, lane 1 = y axis of robot 0)
        x0_last = np.asarray(x0_seq[ticks], np.float64)
        u_err = u0_err = zmp_err = viol = 0.0
        u_sc = 1e-30
        for lane, ax in ((0, 0), (1, 1)):
            Ue, Xe, (Zphi, Zpsi, Zxi) = _zmp_exact(
                system.A, system.B, system.d, zmp_row, ref[ax], lo[ax],
                hi[ax], x0_last[lane])
            U_l = np.asarray(U[lane], np.float64).ravel()
            u_err = max(u_err, np.abs(U_l - Ue).max())
            u_sc = max(u_sc, np.abs(Ue).max())
            u0_err = max(u0_err, abs(float(U_l[0]) - float(Ue[0])))
            zl = Zphi @ x0_last[lane] + Zpsi @ U_l + Zxi
            ze = Zphi @ x0_last[lane] + Zpsi @ Ue + Zxi
            zmp_err = max(zmp_err, np.abs(zl - ze).max())
            viol = max(viol, float(np.maximum(zl - hi[ax],
                                              lo[ax] - zl).max()))
        _emit({"config": 5,
               "metric": f"bipedal ZMP N=300 fleet tick, stagewise path "
                         f"(robots={robots}, lanes={lanes}, {iters} "
                         f"iters, median of {ticks})",
               "value": round(med * 1e3, 2), "unit": "ms/tick",
               "per_robot_ms": round(med * 1e3 / robots, 4),
               "rho": float(f"{opts.rho:.4g}"),
               "budget_ms": BUDGET_MS_CONFIG5,
               "within_budget_per_robot": med * 1e3 / robots
               <= BUDGET_MS_CONFIG5,
               "tick_times_ms": [round(t * 1e3, 2) for t in times],
               "max_err_vs_exact": float(f"{u_err:.3g}"),
               "max_err_rel": float(f"{u_err / u_sc:.3g}"),
               "applied_control_err": float(f"{u0_err:.3g}"),
               "applied_control_err_rel": float(f"{u0_err / u_sc:.3g}"),
               "control_scale": round(float(u_sc), 2),
               "zmp_err_vs_exact": float(f"{zmp_err:.3g}"),
               "polygon_violation": float(f"{viol:.3g}"),
               "iterations": iters,
               "converged_frac": float(np.mean(np.asarray(info.status)
                                               == 0))})

    # Receding-horizon points (the deployment pattern): duals and splits
    # carried across ticks, few iterations per tick — consecutive x0
    # differ by one sample so the previous active set is almost right.
    # Both a single robot (latency floor: the sequential LQR sweep) and
    # the amortized fleet (the production shape — "many robots per chip").
    # topup_iters (VERDICT r4 #5): when any fleet lane misses the KKT
    # tolerance after the fixed count, ONE bounded extra pass runs under
    # a batch-level lax.cond — converged ticks pay only the check.
    wopts = opts.replace(max_iter=witers, topup_iters=4 * witers)

    @jax.jit
    def cold(sqp_b, x0_b):
        sqp_t = dataclasses.replace(sqp_b, x0=x0_b)
        return jax.vmap(lambda s: solve_stagewise(
            s, opts, return_warm=True))(sqp_t)

    @jax.jit
    def wtick(sqp_b, x0_b, warm):
        sqp_t = dataclasses.replace(sqp_b, x0=x0_b)
        return jax.vmap(lambda s, w: solve_stagewise(
            s, wopts, warm_start=w, return_warm=True))(sqp_t, warm)

    for robots in (1, int(os.environ.get("BENCH_ROBOTS", 256))):
        lanes = 2 * robots
        sqp_b = jax.tree_util.tree_map(
            lambda *ls: jnp.tile(jnp.stack(ls), (robots,) + (1,) *
                                 ls[0].ndim), *sq)
        rng = np.random.default_rng(6)
        wticks = ticks + 2
        x0_seq = [jnp.asarray(np.cumsum(rng.normal(
            scale=0.002, size=(t + 1, lanes, 3)), axis=0)[-1]
            .astype(np.float32)) for t in range(wticks + 1)]
        X, U, info, warm = cold(sqp_b, x0_seq[0])
        X, U, info, warm = wtick(sqp_b, x0_seq[1], warm)  # compile wtick
        jax.block_until_ready(U)
        times = []
        for t in range(wticks - 1):
            t0 = time.perf_counter()
            X, U, info, warm = wtick(sqp_b, x0_seq[2 + t], warm)
            jax.block_until_ready(U)
            times.append(time.perf_counter() - t0)
        med = float(np.median(times))
        x0_last = np.asarray(x0_seq[wticks], np.float64)
        u_err = u0_err = zmp_err = viol = 0.0
        u_sc = 1e-30
        for lane, ax in ((0, 0), (1, 1)):
            Ue, Xe, (Zphi, Zpsi, Zxi) = _zmp_exact(
                system.A, system.B, system.d, zmp_row, ref[ax], lo[ax],
                hi[ax], x0_last[lane])
            U_l = np.asarray(U[lane], np.float64).ravel()
            u_err = max(u_err, np.abs(U_l - Ue).max())
            u_sc = max(u_sc, np.abs(Ue).max())
            u0_err = max(u0_err, abs(float(U_l[0]) - float(Ue[0])))
            zl = Zphi @ x0_last[lane] + Zpsi @ U_l + Zxi
            ze = Zphi @ x0_last[lane] + Zpsi @ Ue + Zxi
            zmp_err = max(zmp_err, np.abs(zl - ze).max())
            viol = max(viol, float(np.maximum(zl - hi[ax],
                                              lo[ax] - zl).max()))
        _emit({"config": 5,
               "metric": f"bipedal ZMP N=300 receding-horizon tick, "
                         f"stagewise warm-started ({witers} iters/tick, "
                         f"robots={robots}, median of {len(times)})",
               "value": round(med * 1e3, 2), "unit": "ms/tick",
               "per_robot_ms": round(med * 1e3 / robots, 4),
               "rho": float(f"{opts.rho:.4g}"),
               "budget_ms": BUDGET_MS_CONFIG5,
               "within_budget_per_robot": med * 1e3 / robots
               <= BUDGET_MS_CONFIG5,
               "tick_times_ms": [round(t * 1e3, 2) for t in times],
               "max_err_vs_exact": float(f"{u_err:.3g}"),
               "max_err_rel": float(f"{u_err / u_sc:.3g}"),
               "applied_control_err": float(f"{u0_err:.3g}"),
               "applied_control_err_rel": float(f"{u0_err / u_sc:.3g}"),
               "control_scale": round(float(u_sc), 2),
               "zmp_err_vs_exact": float(f"{zmp_err:.3g}"),
               "polygon_violation": float(f"{viol:.3g}"),
               "iterations": witers,
               "topup_iters": wopts.topup_iters,
               "converged_frac": float(np.mean(np.asarray(info.status)
                                               == 0))})

    # Fused Pallas tick kernel (ops/stagewise_kernel.py): the whole
    # fixed-count iteration loop in VMEM with iteration-invariant Riccati
    # gains.  Two honest numbers per fleet size: single-call wall latency
    # (includes the dev tunnel's ~20 ms big-program dispatch) and the
    # chained per-tick marginal (K back-to-back ticks, one host sync —
    # the streaming/device-time number; on production hardware without
    # the tunnel, dispatch is ~0.1 ms, so marginal is the deploy number).
    from copra_tpu.qp.riccati import make_stagewise_step
    for robots in (1, int(os.environ.get("BENCH_ROBOTS", 256))):
        lanes = 2 * robots
        sqp_b = jax.tree_util.tree_map(
            lambda *ls: jnp.tile(jnp.stack(ls), (robots,) + (1,) *
                                 ls[0].ndim), *sq)
        tick = make_stagewise_step(sqp_b, wopts, cold_options=opts,
                                   backend="fused")
        rng = np.random.default_rng(7)
        wticks = ticks + 2
        x0_seq = [jnp.asarray(np.cumsum(rng.normal(
            scale=0.002, size=(t + 1, lanes, 3)), axis=0)[-1]
            .astype(np.float32)) for t in range(wticks + 10)]
        X, U, info, warm = tick(x0_seq[0])
        X, U, info, warm = tick(x0_seq[1], warm)       # compile warm
        jax.block_until_ready(U)
        times = []
        for t in range(wticks - 1):
            t0 = time.perf_counter()
            X, U, info, warm = tick(x0_seq[2 + t], warm)
            jax.block_until_ready(U)
            times.append(time.perf_counter() - t0)
        med = float(np.median(times))
        # chained marginal: K ticks, one sync
        K = 8
        t0 = time.perf_counter()
        for t in range(K):
            X, U, info, warm = tick(x0_seq[wticks + 1 + t], warm)
        jax.block_until_ready(U)
        marg = (time.perf_counter() - t0) / K
        # measured device/dispatch split — the trustworthy per-tick
        # number: tunnel wall medians of repeated near-identical calls
        # report fantasy rates (CLAUDE.md; observed 0.18 ms "walls" for
        # a 4 ms-device 512-lane tick), so budget gates below use the
        # profiler's device-busy time
        w_fix, x_fix = warm, x0_seq[wticks + K]
        prof = _profile_device_per_tick(
            jax, lambda: tick(x_fix, w_fix)[1])
        x0_last = np.asarray(x0_seq[wticks + K], np.float64)
        u_err = u0_err = zmp_err = viol = 0.0
        u_sc = 1e-30
        for lane, ax in ((0, 0), (1, 1)):
            Ue, Xe, (Zphi, Zpsi, Zxi) = _zmp_exact(
                system.A, system.B, system.d, zmp_row, ref[ax], lo[ax],
                hi[ax], x0_last[lane])
            U_l = np.asarray(U[lane], np.float64).ravel()
            u_err = max(u_err, np.abs(U_l - Ue).max())
            u_sc = max(u_sc, np.abs(Ue).max())
            u0_err = max(u0_err, abs(float(U_l[0]) - float(Ue[0])))
            zl = Zphi @ x0_last[lane] + Zpsi @ U_l + Zxi
            ze = Zphi @ x0_last[lane] + Zpsi @ Ue + Zxi
            zmp_err = max(zmp_err, np.abs(zl - ze).max())
            viol = max(viol, float(np.maximum(zl - hi[ax],
                                              lo[ax] - zl).max()))
        _emit({"config": 5,
               "metric": f"bipedal ZMP N=300 receding tick, FUSED Pallas "
                         f"stagewise kernel ({witers} iters/tick, "
                         f"robots={robots}, median of {len(times)})",
               "value": round(med * 1e3, 2), "unit": "ms/tick",
               "per_robot_ms": round(med * 1e3 / robots, 4),
               "chained_marginal_ms_per_tick": round(marg * 1e3, 2),
               "chained_marginal_ms_per_robot": round(marg * 1e3
                                                      / robots, 4),
               "rho": float(f"{opts.rho:.4g}"),
               "budget_ms": BUDGET_MS_CONFIG5,
               "within_budget_per_robot": med * 1e3 / robots
               <= BUDGET_MS_CONFIG5,
               "within_budget_chained": marg * 1e3 / max(robots, 1)
               <= BUDGET_MS_CONFIG5,
               **({} if prof is None else {
                   **prof,
                   "measured_dispatch_ms_per_tick": round(
                       med * 1e3 - prof["measured_device_ms_per_tick"],
                       2),
                   "measured_device_ms_per_robot": round(
                       prof["measured_device_ms_per_tick"] / robots, 4),
                   "within_budget_device":
                       prof["measured_device_ms_per_tick"] / robots
                       <= BUDGET_MS_CONFIG5}),
               "tick_times_ms": [round(t * 1e3, 2) for t in times],
               "max_err_vs_exact": float(f"{u_err:.3g}"),
               "max_err_rel": float(f"{u_err / u_sc:.3g}"),
               "applied_control_err": float(f"{u0_err:.3g}"),
               "applied_control_err_rel": float(f"{u0_err / u_sc:.3g}"),
               "control_scale": round(float(u_sc), 2),
               "zmp_err_vs_exact": float(f"{zmp_err:.3g}"),
               "polygon_violation": float(f"{viol:.3g}"),
               "iterations": witers,
               "topup_iters": wopts.topup_iters,
               "converged_frac": float(np.mean(np.asarray(info.status)
                                               == 0))})

    # Dispatch-free multi-tick chain (make_stagewise_multistep): K
    # receding ticks in ONE dispatch — lax.scan over the fused tick with
    # the exogenous state stream in the loop.  The wall-clock per tick
    # IS the former chained marginal (VERDICT r2 #5); gated like every
    # other line.
    from copra_tpu.qp.riccati import make_stagewise_multistep
    for robots in (1, int(os.environ.get("BENCH_ROBOTS", 256))):
        lanes = 2 * robots
        sqp_b = jax.tree_util.tree_map(
            lambda *ls: jnp.tile(jnp.stack(ls), (robots,) + (1,) *
                                 ls[0].ndim), *sq)
        step_many = make_stagewise_multistep(sqp_b, wopts,
                                             cold_options=opts)
        K = int(os.environ.get("BENCH_CHAIN", 16))
        rng = np.random.default_rng(8)
        x0_seq = jnp.asarray(np.cumsum(rng.normal(
            scale=0.002, size=(2 * K + 1, lanes, 3)), axis=0)
            .astype(np.float32))
        # warmup chain (compiles cold tick + chain)
        _, _, _, _, warm = step_many(x0_seq[0], K, x0_seq=x0_seq[:K])
        t0 = time.perf_counter()
        states, u0s, statuses, info, warm = step_many(
            x0_seq[0], K, warm=warm, x0_seq=x0_seq[K:2 * K])
        jax.block_until_ready(u0s)
        per_tick = (time.perf_counter() - t0) / K
        # device-busy per tick from a profiled chain call (walls
        # through the tunnel can be fantasy — CLAUDE.md)
        w_fix = warm
        prof = _profile_device_per_tick(
            jax, lambda: step_many(x0_seq[0], K, warm=w_fix,
                                   x0_seq=x0_seq[K:2 * K])[1], n=2)
        if prof is not None:
            prof = {"measured_device_ms_per_tick": round(
                prof["measured_device_ms_per_tick"] / K, 4),
                "measured_device_ms_per_robot": round(
                prof["measured_device_ms_per_tick"] / K / robots, 5)}
        # gate the FINAL tick's full solution (solved at x0_seq[2K-1])
        x0_last = np.asarray(x0_seq[2 * K - 1], np.float64)
        U = np.asarray(info.x, np.float64).reshape(lanes, horizon, 1)
        u_err = u0_err = zmp_err = viol = 0.0
        u_sc = 1e-30
        for lane, ax in ((0, 0), (1, 1)):
            Ue, Xe, (Zphi, Zpsi, Zxi) = _zmp_exact(
                system.A, system.B, system.d, zmp_row, ref[ax], lo[ax],
                hi[ax], x0_last[lane])
            U_l = U[lane].ravel()
            u_err = max(u_err, np.abs(U_l - Ue).max())
            u_sc = max(u_sc, np.abs(Ue).max())
            u0_err = max(u0_err, abs(float(U_l[0]) - float(Ue[0])))
            zl = Zphi @ x0_last[lane] + Zpsi @ U_l + Zxi
            ze = Zphi @ x0_last[lane] + Zpsi @ Ue + Zxi
            zmp_err = max(zmp_err, np.abs(zl - ze).max())
            viol = max(viol, float(np.maximum(zl - hi[ax],
                                              lo[ax] - zl).max()))
        _emit({"config": 5,
               "metric": f"bipedal ZMP N=300 multi-tick chain, one "
                         f"dispatch (make_stagewise_multistep, "
                         f"{witers} iters/tick, robots={robots}, "
                         f"K={K} ticks)",
               "value": round(per_tick * 1e3, 2), "unit": "ms/tick",
               "per_robot_ms": round(per_tick * 1e3 / robots, 4),
               "rho": float(f"{opts.rho:.4g}"),
               "budget_ms": BUDGET_MS_CONFIG5,
               "within_budget_per_robot": per_tick * 1e3 / robots
               <= BUDGET_MS_CONFIG5,
               **({} if prof is None else {
                   **prof,
                   "within_budget_device":
                       prof["measured_device_ms_per_tick"] / max(robots, 1)
                       <= BUDGET_MS_CONFIG5}),
               "max_err_vs_exact": float(f"{u_err:.3g}"),
               "max_err_rel": float(f"{u_err / u_sc:.3g}"),
               "applied_control_err": float(f"{u0_err:.3g}"),
               "applied_control_err_rel": float(f"{u0_err / u_sc:.3g}"),
               "control_scale": round(float(u_sc), 2),
               "zmp_err_vs_exact": float(f"{zmp_err:.3g}"),
               "polygon_violation": float(f"{viol:.3g}"),
               "iterations": witers,
               "topup_iters": wopts.topup_iters,
               "converged_frac": float(np.mean(
                   np.asarray(statuses)[-1] == 0))})

    # Budget-filled single-robot point: the Pareto knee (auto_iters)
    # picks the SMALLEST budget meeting the applied-control target, but
    # the device budget has ~5x headroom at 20 iters (0.86 ms device) —
    # this line reports what filling it buys on the horizon tail.
    from copra_tpu.qp.riccati import make_stagewise_step as _mss
    fill_iters = int(os.environ.get("BENCH_FILL_ITERS", 100))
    sqp_1 = jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *sq)
    tick_f = _mss(sqp_1, opts.replace(max_iter=fill_iters),
                  cold_options=opts, backend="fused")
    rng = np.random.default_rng(9)
    x0_seq = [jnp.asarray(np.cumsum(rng.normal(
        scale=0.002, size=(t + 1, 2, 3)), axis=0)[-1].astype(np.float32))
        for t in range(8)]
    X, U, info, warm = tick_f(x0_seq[0])
    X, U, info, warm = tick_f(x0_seq[1], warm)
    jax.block_until_ready(U)
    for t in range(4):
        X, U, info, warm = tick_f(x0_seq[2 + t], warm)
    jax.block_until_ready(U)
    w_fix, x_fix = warm, x0_seq[6]
    prof = _profile_device_per_tick(jax,
                                    lambda: tick_f(x_fix, w_fix)[1])
    x0_last = np.asarray(x0_seq[5], np.float64)
    u_err = u0_err = 0.0
    u_sc = 1e-30
    for lane, ax in ((0, 0), (1, 1)):
        Ue, _, _ = _zmp_exact(system.A, system.B, system.d, zmp_row,
                              ref[ax], lo[ax], hi[ax], x0_last[lane])
        U_l = np.asarray(U[lane], np.float64).ravel()
        u_err = max(u_err, np.abs(U_l - Ue).max())
        u0_err = max(u0_err, abs(float(U_l[0]) - float(Ue[0])))
        u_sc = max(u_sc, np.abs(Ue).max())
    _emit({"config": 5,
           "metric": f"bipedal ZMP N=300 receding tick, FUSED kernel, "
                     f"BUDGET-FILLED ({fill_iters} iters/tick, "
                     f"robots=1)",
           "value": (prof or {}).get("measured_device_ms_per_tick"),
           "unit": "ms/tick (device)",
           "rho": float(f"{opts.rho:.4g}"),
           "budget_ms": BUDGET_MS_CONFIG5,
           **({} if prof is None else {
               **prof,
               "within_budget_device":
                   prof["measured_device_ms_per_tick"]
                   <= BUDGET_MS_CONFIG5}),
           "max_err_vs_exact": float(f"{u_err:.3g}"),
           "max_err_rel": float(f"{u_err / u_sc:.3g}"),
           "applied_control_err": float(f"{u0_err:.3g}"),
           "applied_control_err_rel": float(f"{u0_err / u_sc:.3g}"),
           "iterations": fill_iters,
           "converged_frac": float(np.mean(np.asarray(info.status)
                                           == 0))})

    # Model-swap / footstep-replan as a SERVING-GRADE operation
    # (VERDICT r4 #1): StagewiseTick.replan swaps the problem DATA
    # behind the SAME compiled tick programs — the measured rho, the
    # iteration policy and the compiled kernels are shape-keyed and
    # survive the swap; only the data-dependent plan tensors rebuild
    # (one jitted dispatch).  The first post-swap tick runs the COLD
    # budget with the carried warm tuple, so it converges instead of
    # shipping a half-solved fleet.
    def _replan_sqp(shift):
        from copra_tpu.qp.riccati import from_mpc as _fm
        sq_s = [None, None]
        for ax in range(2):
            costs_s = (ct.TrajectoryCost(M=jnp.asarray(Zfull, f32),
                                         p=jnp.asarray(ref[ax] + shift,
                                                       f32),
                                         weights=jnp.full(horizon + 1,
                                                          1.0, f32)),
                       ct.SimpleControlCost(p=jnp.zeros(horizon, f32),
                                            weights=jnp.full(horizon,
                                                             1e-6, f32)))
            cons_s = (ct.TrajectoryConstraint(
                          E=jnp.asarray(Zfull, f32),
                          f=jnp.asarray(hi[ax] + shift, f32)),
                      ct.TrajectoryConstraint(
                          E=jnp.asarray(-Zfull, f32),
                          f=jnp.asarray(-(lo[ax] + shift), f32)))
            sq_s[ax] = _fm(system, costs_s, cons_s)
        return jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *sq_s)

    tick_r = _mss(sqp_1, opts.replace(max_iter=witers),
                  cold_options=opts, backend="fused")
    rng = np.random.default_rng(10)
    x0_rs = [jnp.asarray(np.cumsum(rng.normal(
        scale=0.002, size=(t + 1, 2, 3)), axis=0)[-1].astype(np.float32))
        for t in range(10)]
    # warm every code path ONCE (cold tick, warm tick, plan rebuild,
    # swap-budget tick) — serving systems precompile; the timed numbers
    # below are the steady-state marginal cost of a swap
    X, U, info, warm = tick_r(x0_rs[0])
    X, U, info, warm = tick_r(x0_rs[1], warm)
    tick_r.replan(_replan_sqp(0.0))
    X, U, info, warm = tick_r(x0_rs[2], warm)
    X, U, info, warm = tick_r(x0_rs[3], warm)
    jax.block_until_ready(U)

    ref2 = ref + 0.02
    sqp_2 = _replan_sqp(0.02)           # built host-side (from_mpc)
    t0 = time.perf_counter()
    tick_r.replan(sqp_2)
    t_build = time.perf_counter() - t0
    t0 = time.perf_counter()
    X2, U2, info2, warm2 = tick_r(x0_rs[4], warm)  # old warm, new model
    jax.block_until_ready(U2)
    t_first = time.perf_counter() - t0
    # steady-state warm tick on the swapped model (back to witers)
    t0 = time.perf_counter()
    X3, U3, info3, _ = tick_r(x0_rs[5], warm2)
    jax.block_until_ready(U3)
    t_next = time.perf_counter() - t0
    x0_sw = np.asarray(x0_rs[4], np.float64)
    sw_err = sw0_err = 0.0
    sw_sc = 1e-30
    for lane, ax in ((0, 0), (1, 1)):
        Ue, _, _ = _zmp_exact(system.A, system.B, system.d, zmp_row,
                              ref2[ax], lo[ax] + 0.02, hi[ax] + 0.02,
                              x0_sw[lane])
        U_l = np.asarray(U2[lane], np.float64).ravel()
        sw_err = max(sw_err, np.abs(U_l - Ue).max())
        sw0_err = max(sw0_err, abs(float(U_l[0]) - float(Ue[0])))
        sw_sc = max(sw_sc, np.abs(Ue).max())
    # Single-tick WALL floor in THIS environment (VERDICT r4 #8).  The
    # K=16 multistep chain is the closable-loop artifact; this line
    # bounds what a K=1 tick STREAM can achieve through the dev tunnel
    # with a depth-1 pre-dispatch pipeline — enqueue tick k+1 (JAX
    # dispatch is async; the warm tuple is a device future) BEFORE
    # blocking on tick k's control, so dispatch overlaps device work.
    # The bare tunnel round-trip floor is measured beside it: no tick
    # can beat it from this host.
    t_id = jax.jit(lambda a: a + 1.0)
    xsmall = jnp.zeros((8,), jnp.float32)
    jax.block_until_ready(t_id(xsmall))
    floors = []
    for _ in range(10):
        t0 = time.perf_counter()
        jax.block_until_ready(t_id(xsmall))
        floors.append(time.perf_counter() - t0)
    tunnel_floor_ms = float(np.median(floors)) * 1e3
    Tn = 12
    rngf = np.random.default_rng(12)
    x0_fl = [jnp.asarray(np.cumsum(rngf.normal(
        scale=0.002, size=(t + 1, 2, 3)), axis=0)[-1].astype(np.float32))
        for t in range(Tn)]
    # naive blocking stream (block every tick)
    warm_n = warm2
    X_, U_, _, warm_n = tick_r(x0_fl[0], warm_n)
    jax.block_until_ready(U_)
    t0 = time.perf_counter()
    for t in range(1, Tn):
        X_, U_, _, warm_n = tick_r(x0_fl[t], warm_n)
        jax.block_until_ready(U_)
    naive_ms = (time.perf_counter() - t0) / (Tn - 1) * 1e3
    # depth-1 pre-dispatch pipeline
    warm_p = warm_n
    prev_u = None
    t0 = time.perf_counter()
    for t in range(Tn):
        X_, U_, _, warm_p = tick_r(x0_fl[t], warm_p)
        if prev_u is not None:
            jax.block_until_ready(prev_u)
        prev_u = U_
    jax.block_until_ready(prev_u)
    pipe_ms = (time.perf_counter() - t0) / Tn * 1e3
    _emit({"config": 5,
           "metric": "single-robot single-tick WALL floor (K=1 stream, "
                     "depth-1 pre-dispatch pipeline vs blocking ticks; "
                     "dev-tunnel environment)",
           "single_tick_wall_floor_ms": round(pipe_ms, 2),
           "technique": "enqueue tick k+1 (async dispatch, warm tuple "
                        "stays a device future) before blocking on "
                        "tick k's control",
           "blocking_tick_wall_ms": round(naive_ms, 2),
           "tunnel_roundtrip_floor_ms": round(tunnel_floor_ms, 2),
           "iterations": witers,
           "budget_ms": BUDGET_MS_CONFIG5,
           "note": "wall latencies here include the dev tunnel; the "
                   "measured device time per tick is the deploy number "
                   "(see the fused robots=1 line) and the bare tunnel "
                   "round-trip bounds any single-tick wall from this "
                   "host"})

    _emit({"config": 5,
           "metric": "bipedal footstep REPLAN: StagewiseTick.replan "
                     "(data-only plan rebuild, compiled tick/rho/policy "
                     "reused) + first warm-carried tick at the COLD "
                     "budget on the new model",
           "rebuild_s": round(t_build, 4),
           "rebuild_ms": round(t_build * 1e3, 2),
           "first_tick_ms": round(t_first * 1e3, 2),
           "next_tick_ms": round(t_next * 1e3, 2),
           "max_err_vs_exact": float(f"{sw_err:.3g}"),
           "max_err_rel": float(f"{sw_err / sw_sc:.3g}"),
           "applied_control_err": float(f"{sw0_err:.3g}"),
           "iterations": iters,
           "converged_frac": float(np.mean(np.asarray(info2.status)
                                           == 0))})


def _srb_quadruped(N=40, dt=0.025):
    """Single-rigid-body quadruped MPC (the reference's actual domain —
    ANYbotics quadrupeds; any (nrVar, nrConstr) through qpOASES,
    ``/root/reference/src/solvers/qpOASESSolver.cpp:66-118``): x=12
    (rpy, position, angular rate, velocity), u=12 (3-D ground-reaction
    force per leg), r=12 friction-cone/normal-force rows per stage,
    LTV over the gait (footholds move with phase).  Returns a
    single-robot f32 StagewiseQP."""
    import jax.numpy as jnp
    from copra_tpu.qp.riccati import StagewiseQP

    m, g, mu, h = 25.0, 9.81, 0.6, 0.3
    Ibinv = np.linalg.inv(np.diag([0.35, 1.2, 1.3]))
    Ac = np.zeros((12, 12))
    Ac[0:3, 6:9] = np.eye(3)      # d rpy = omega
    Ac[3:6, 9:12] = np.eye(3)     # d p = v
    Ad = np.eye(12) + Ac * dt
    feet0 = np.array([[0.22, 0.15, -h], [0.22, -0.15, -h],
                      [-0.22, 0.15, -h], [-0.22, -0.15, -h]])
    As, Bs = [], []
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
            Bk[9:12, 3 * leg:3 * leg + 3] = np.eye(3) / m * dt
        As.append(Ad)
        Bs.append(Bk)
    dk = np.zeros(12)
    dk[11] = -g * dt
    ds = np.repeat(dk[None], N, 0)

    x_ref = np.zeros(12)
    x_ref[5] = h                  # stand height
    x_ref[9] = 0.4                # forward velocity
    w = np.array([50.0, 50, 10, 10, 10, 100, 1, 1, 1, 5, 5, 5])
    Qx = np.repeat(np.diag(w)[None], N + 1, 0)
    Qx[-1] *= 10.0                # terminal emphasis
    qx = np.repeat((-w * x_ref)[None], N + 1, 0)
    qx[-1] *= 10.0
    Ru = np.repeat((1e-5 * np.eye(12))[None], N, 0)
    ru = np.zeros((N, 12))

    xlb = np.full((N + 1, 12), -np.inf)
    xub = np.full((N + 1, 12), np.inf)
    xlb[:, 0:3], xub[:, 0:3] = -0.4, 0.4          # attitude envelope
    xlb[:, 5], xub[:, 5] = 0.2, 0.4               # height corridor
    ulb = np.tile(np.array([-150.0, -150.0, 0.0]), (N, 4))
    uub = np.tile(np.array([150.0, 150.0, 250.0]), (N, 4))

    # per-leg rows: fx <= mu fz, -fx <= mu fz, fy <= mu fz  (r = 12)
    Cu1 = np.zeros((12, 12))
    for leg in range(4):
        c0 = 3 * leg
        Cu1[c0 + 0, c0 + 0], Cu1[c0 + 0, c0 + 2] = 1.0, -mu
        Cu1[c0 + 1, c0 + 0], Cu1[c0 + 1, c0 + 2] = -1.0, -mu
        Cu1[c0 + 2, c0 + 1], Cu1[c0 + 2, c0 + 2] = 1.0, -mu
    Cu = np.repeat(Cu1[None], N, 0)
    Cx = np.zeros((N, 12, 12))
    clo = np.full((N, 12), -np.inf)
    chi = np.zeros((N, 12))

    f32 = jnp.float32
    x0 = x_ref.copy()
    x0[9] = 0.0                   # starts at rest
    return StagewiseQP(
        A=jnp.asarray(np.asarray(As), f32), B=jnp.asarray(np.asarray(Bs), f32),
        d=jnp.asarray(ds, f32), Qx=jnp.asarray(Qx, f32),
        qx=jnp.asarray(qx, f32), Ru=jnp.asarray(Ru, f32),
        ru=jnp.asarray(ru, f32), x0=jnp.asarray(x0, f32),
        xlb=jnp.asarray(xlb, f32), xub=jnp.asarray(xub, f32),
        ulb=jnp.asarray(ulb, f32), uub=jnp.asarray(uub, f32),
        Cx=jnp.asarray(Cx, f32), Cu=jnp.asarray(Cu, f32),
        clo=jnp.asarray(clo, f32), chi=jnp.asarray(chi, f32))


def _stagewise_exact_native(s):
    """Exact f64 oracle for ONE StagewiseQP lane: condense to a dense QP
    (Phi/Psi recursion in f64) and solve with the native active-set
    solver — the independent-exactness gate for config 6 (validated to
    1.4e-9 against the f64 high-budget stagewise ADMM)."""
    import copra_tpu as ct
    from copra_tpu.qp.native import solve_qp_native

    A = np.asarray(s.A, np.float64)
    B = np.asarray(s.B, np.float64)
    d = np.asarray(s.d, np.float64)
    Qx = np.asarray(s.Qx, np.float64)
    qx = np.asarray(s.qx, np.float64)
    Ru = np.asarray(s.Ru, np.float64)
    ru = np.asarray(s.ru, np.float64)
    x0 = np.asarray(s.x0, np.float64)
    xlb = np.asarray(s.xlb, np.float64)
    xub = np.asarray(s.xub, np.float64)
    N, x, u = A.shape[0], A.shape[1], B.shape[2]
    nU = N * u
    Psi = np.zeros((N + 1, x, nU))
    xi = np.zeros((N + 1, x))
    PhiM = np.zeros((N + 1, x, x))
    PhiM[0] = np.eye(x)
    for k in range(N):
        PhiM[k + 1] = A[k] @ PhiM[k]
        Psi[k + 1] = A[k] @ Psi[k]
        Psi[k + 1][:, k * u:(k + 1) * u] += B[k]
        xi[k + 1] = A[k] @ xi[k] + d[k]
    xoff = PhiM @ x0 + xi
    Q = np.zeros((nU, nU))
    c = np.zeros(nU)
    for k in range(N + 1):
        Q += Psi[k].T @ Qx[k] @ Psi[k]
        c += Psi[k].T @ (Qx[k] @ xoff[k] + qx[k])
    for k in range(N):
        sl = slice(k * u, (k + 1) * u)
        Q[sl, sl] += Ru[k]
        c[sl] += ru[k]
    rows, lo_, hi_ = [], [], []
    for k in range(1, N + 1):
        for i in range(x):
            if np.isfinite(xub[k, i]) or np.isfinite(xlb[k, i]):
                rows.append(Psi[k][i])
                lo_.append(xlb[k, i] - xoff[k, i])
                hi_.append(xub[k, i] - xoff[k, i])
    if s.Cx is not None:
        Cx = np.asarray(s.Cx, np.float64)
        Cu = np.asarray(s.Cu, np.float64)
        clo = np.asarray(s.clo, np.float64)
        chi = np.asarray(s.chi, np.float64)
        for k in range(N):
            Crow = Cx[k] @ Psi[k]
            Crow[:, k * u:(k + 1) * u] += Cu[k]
            off = Cx[k] @ xoff[k]
            for j in range(Cx.shape[1]):
                rows.append(Crow[j])
                lo_.append(clo[k, j] - off[j])
                hi_.append(chi[k, j] - off[j])
    Arows = np.asarray(rows) if rows else np.zeros((0, nU))
    lo_, hi_ = np.asarray(lo_), np.asarray(hi_)
    fin_lo, fin_hi = np.isfinite(lo_), np.isfinite(hi_)
    qp = ct.DenseQP(Q=Q, c=c, Aeq=np.zeros((0, nU)), beq=np.zeros(0),
                    Aineq=np.concatenate([Arows[fin_hi], -Arows[fin_lo]]),
                    bineq=np.concatenate([hi_[fin_hi], -lo_[fin_lo]]),
                    lb=np.asarray(s.ulb, np.float64).ravel(),
                    ub=np.asarray(s.uub, np.float64).ravel())
    sol = solve_qp_native(qp)
    return np.asarray(sol.x).reshape(N, u)


def config6():
    """Quadruped-class stagewise fleet (VERDICT r3 #1): x=12, u=12, r=12
    friction rows, N=40 — served by the STREAMED fused kernel (plan
    DMA'd from HBM per Riccati step, sublane-tiled sweeps), gated per
    tick against the exact f64 condensed native active-set solve."""
    jax = _setup_jax()
    import jax.numpy as jnp
    import copra_tpu as ct
    from copra_tpu.ops.stagewise_kernel import fused_mode
    from copra_tpu.qp.riccati import (auto_iters_stagewise,
                                      auto_rho_stagewise,
                                      make_stagewise_step,
                                      scale_stagewise, stagewise_scales)

    N = int(os.environ.get("BENCH_QUAD_N", 40))
    budget_ms = 25.0              # 40 Hz re-plan (Cheetah-class MPC rate)
    ticks = int(os.environ.get("BENCH_STEPS", 5))
    sq1 = _srb_quadruped(N=N)
    assert fused_mode(N, 12, 12, 12, jnp.float32) == "streamed"
    # curvature equilibration (stagewise_scales): forces O(100 N) vs
    # states O(0.1) stall raw ADMM at 60k+ iterations; the scaled
    # problem converges in ~100 (tests/test_stagewise_scaling.py)
    scales = stagewise_scales(sq1)

    def fleet(robots, rng):
        sqp_b = jax.tree_util.tree_map(
            lambda a: jnp.tile(a[None], (robots,) + (1,) * a.ndim), sq1)
        scale = np.repeat([0.03, 0.01, 0.03, 0.05], 3)   # rpy p omega v
        pert = rng.normal(scale=scale, size=(robots, 12))
        x0s = np.asarray(sq1.x0, np.float64)[None] + pert
        return dataclasses.replace(
            sqp_b, x0=jnp.asarray(x0s.astype(np.float32)))

    # eps_abs: the measured f32 plateau of the equilibrated problem is
    # ~3e-5 (scaled residuals / tail error — the auto_iters Pareto
    # flattens there for every budget >= 50); statuses gate against
    # 1e-4 so "converged" means "at the measured f32 floor", while the
    # real honesty bar stays the exact-oracle gate on every line
    opts = ct.SolverOptions(max_iter=int(os.environ.get("BENCH_ITERS",
                                                        300)),
                            early_exit=False, polish=False,
                            eps_abs=1e-4)
    # probes run on the SCALED problem — the space the serving facade
    # iterates in (its measured rho/iters transfer 1:1) — with the
    # PHYSICAL serving drift (0.002 per tick) mapped into scaled space
    probe_fleet = scale_stagewise(fleet(4, np.random.default_rng(3)),
                                  *scales)
    probe_drift = 0.002 / np.asarray(scales[0], np.float64)
    opts = opts.replace(rho=float(os.environ["BENCH_RHO"])
                        if "BENCH_RHO" in os.environ
                        else auto_rho_stagewise(
                            probe_fleet,
                            opts.replace(max_iter=30), cold_options=opts,
                            drift_scale=probe_drift))
    if "BENCH_WARM_ITERS" in os.environ:
        witers = int(os.environ["BENCH_WARM_ITERS"])
    else:
        witers, iters_probe = auto_iters_stagewise(
            probe_fleet, opts, cold_options=opts,
            candidates=(10, 20, 30, 50, 80, 120),
            target_applied_err=1e-5, drift_scale=probe_drift,
            return_probe=True)
        _emit({"config": 6,
               "metric": "quadruped measured warm-iteration policy "
                         "(auto_iters_stagewise, applied-control gate)",
               "chosen_iters": witers, "target_applied_err": 1e-5,
               "pareto": {str(k): {kk: float(f"{vv:.3g}")
                                   for kk, vv in v.items()}
                          for k, v in iters_probe.items()}})
    # batch-level convergence top-up, as in config 5 (VERDICT r4 #5)
    wopts = opts.replace(max_iter=witers, topup_iters=4 * witers)

    for backend in ("fused", "xla"):
        for robots in ((1, int(os.environ.get("BENCH_ROBOTS", 128)))
                       if backend == "fused" else
                       (int(os.environ.get("BENCH_ROBOTS", 128)),)):
            rng = np.random.default_rng(11)
            sqp_b = fleet(robots, rng)
            tick = make_stagewise_step(sqp_b, wopts, cold_options=opts,
                                       backend=backend, scaling=scales)
            wticks = ticks + 2
            drift = np.cumsum(rng.normal(
                scale=0.002, size=(wticks + 10, robots, 12)), axis=0)
            x0_base = np.asarray(sqp_b.x0, np.float64)
            x0_seq = [jnp.asarray((x0_base + drift[t]).astype(np.float32))
                      for t in range(wticks + 10)]
            X, U, info, warm = tick(x0_seq[0])
            X, U, info, warm = tick(x0_seq[1], warm)
            jax.block_until_ready(U)
            times = []
            for t in range(wticks - 1):
                t0 = time.perf_counter()
                X, U, info, warm = tick(x0_seq[2 + t], warm)
                jax.block_until_ready(U)
                times.append(time.perf_counter() - t0)
            med = float(np.median(times))
            K = 8
            t0 = time.perf_counter()
            for t in range(K):
                X, U, info, warm = tick(x0_seq[wticks + 1 + t], warm)
            jax.block_until_ready(U)
            marg = (time.perf_counter() - t0) / K
            prof = None
            if backend == "fused":
                # measured device/dispatch split for EVERY fused line
                # (tunnel walls of repeated calls can report fantasy
                # rates — CLAUDE.md; budget gates use device time)
                w_fix, x_fix = warm, x0_seq[wticks + K]
                prof = _profile_device_per_tick(
                    jax, lambda: tick(x_fix, w_fix)[1])
            # exact gate on sampled lanes at the final tick state
            x0_last = np.asarray(x0_seq[wticks + K], np.float64)
            u_err = u0_err = u_scale = 0.0
            for lane in {0, robots - 1}:
                s_l = jax.tree_util.tree_map(lambda a: a[lane], sqp_b)
                s_l = dataclasses.replace(
                    s_l, x0=jnp.asarray(x0_last[lane], jnp.float64))
                Ue = _stagewise_exact_native(s_l)
                U_l = np.asarray(U[lane], np.float64)
                u_err = max(u_err, np.abs(U_l - Ue).max())
                u0_err = max(u0_err, np.abs(U_l[0] - Ue[0]).max())
                u_scale = max(u_scale, np.abs(Ue).max())
            _emit({"config": 6,
                   "metric": f"quadruped SRB MPC N={N} receding tick, "
                             f"x=12/u=12/r=12 "
                             f"({'STREAMED fused kernel' if backend == 'fused' else 'XLA stagewise path'}, "
                             f"{witers} iters/tick, robots={robots}, "
                             f"median of {len(times)})",
                   "value": round(med * 1e3, 2), "unit": "ms/tick",
                   "per_robot_ms": round(med * 1e3 / robots, 4),
                   "chained_marginal_ms_per_tick": round(marg * 1e3, 2),
                   "chained_marginal_ms_per_robot": round(
                       marg * 1e3 / robots, 4),
                   "rho": float(f"{opts.rho:.4g}"),
                   "budget_ms": budget_ms,
                   "within_budget_per_robot": med * 1e3 / robots
                   <= budget_ms,
                   "within_budget_chained": marg * 1e3 / max(robots, 1)
                   <= budget_ms,
                   **({} if prof is None else {
                       **prof,
                       "measured_dispatch_ms_per_tick": round(
                           med * 1e3
                           - prof["measured_device_ms_per_tick"], 2),
                       "measured_device_ms_per_robot": round(
                           prof["measured_device_ms_per_tick"]
                           / robots, 4),
                       "within_budget_device":
                           prof["measured_device_ms_per_tick"] / robots
                           <= budget_ms}),
                   "tick_times_ms": [round(t * 1e3, 2) for t in times],
                   "max_err_vs_exact": float(f"{u_err:.3g}"),
                   "max_err_rel": float(f"{u_err / u_scale:.3g}"),
                   "applied_control_err": float(f"{u0_err:.3g}"),
                   "applied_control_err_rel":
                       float(f"{u0_err / u_scale:.3g}"),
                   "control_scale_N": round(u_scale, 1),
                   "iterations": witers,
               "topup_iters": wopts.topup_iters,
                   "converged_frac": float(np.mean(
                       np.asarray(info.status) == 0))})


def config8():
    """Runtime deadline enforcement validated ON-CHIP (VERDICT r4 #6).

    ``max_wall_time_ms`` is the qpOASES ``maxCpuTime`` analog
    (``/root/reference/src/solvers/qpOASESSolver.cpp:108-111``): a
    traced deadline is impossible in a compiled XLA program, so the
    LMPC facade measures the problem's marginal cost per iteration and
    precomputes the iteration budget.  This config PROVES the budget is
    honored where it matters: the calibration's marginal now comes from
    PROFILER DEVICE TIME (tunnel walls of repeated near-identical calls
    report fantasy rates — CLAUDE.md doctrine), and for each budget the
    measured solve wall must sit within 1.2x of (budget + measured
    dispatch overhead); budgets below the measured per-dispatch
    overhead are reported honestly infeasible for THIS environment
    (the facade's ``budget_feasible`` flag) with the device-basis
    compliance beside them.
    """
    jax = _setup_jax()
    import copra_tpu as ct

    N = 100
    A, B, d = _double_integrator(T=0.005)
    system = ct.LTISystem.create(A.astype(np.float32),
                                 B.astype(np.float32),
                                 d.astype(np.float32),
                                 np.array([0.0, -1.5], np.float32), N)
    costs = (ct.TargetCost.create(np.eye(2, dtype=np.float32),
                                  np.array([0.0, -1.0], np.float32),
                                  weights=np.array([10.0, 1e4],
                                                   np.float32)),
             ct.ControlCost.create(np.array([[1.0]], np.float32),
                                   np.array([2.0], np.float32),
                                   weights=np.array([1e-4], np.float32)))
    rng = np.random.default_rng(8)

    for budget in (2.0, 5.0, 20.0, 50.0):
        ctrl = ct.LMPC(system)
        for c in costs:
            ctrl.add_cost(c)
        # move-semantics constraints: one instance per controller
        ctrl.add_constraint(
            ct.ControlBoundConstraint.create([-60.0], [60.0]))
        ctrl.options = ct.SolverOptions(
            max_iter=4000, early_exit=False, polish=False,
            max_wall_time_ms=budget)
        ok = ctrl.solve()                      # calibrates + solves
        info = ctrl.deadline_info()
        walls = []
        for _ in range(5):
            # VARY x0 between timed solves: tunnel walls of repeated
            # near-identical calls report fantasy rates (CLAUDE.md)
            ctrl.set_initial_state(
                np.asarray([0.0, -1.5], np.float32)
                + rng.normal(scale=0.02, size=2).astype(np.float32))
            t0 = time.perf_counter()
            ctrl.solve(warm_start=True)
            walls.append((time.perf_counter() - t0) * 1e3)
        wall_med = float(np.median(walls))
        dev_ms = info["marginal_ms_per_iter"] * info["budget_iters"]
        feasible = bool(info.get("budget_feasible", True))
        _emit({"config": 8,
               "metric": f"max_wall_time_ms deadline enforcement "
                         f"(budget {budget:g} ms, device-profiler "
                         f"calibration, N=100 LTI)",
               "budget_ms": budget,
               "budget_iters": info["budget_iters"],
               "marginal_ms_per_iter": round(
                   info["marginal_ms_per_iter"], 5),
               "overhead_ms": round(info["overhead_ms"], 2),
               "calibration_basis": info.get("calibration_basis"),
               "budget_feasible_in_env": feasible,
               "measured_wall_ms_median": round(wall_med, 2),
               "within_wall_budget":
                   wall_med <= 1.2 * (budget + info["overhead_ms"]),
               "device_ms_at_budget_iters": round(dev_ms, 3),
               "within_device_budget": dev_ms <= budget,
               "solved": bool(ok)})


CONFIGS = {1: config1, 2: config2, 3: config3, 5: config5, 6: config6,
           8: config8}


def main():
    which = None
    if "--config" in sys.argv:
        which = int(sys.argv[sys.argv.index("--config") + 1])
    ran = set()
    for n, fn in sorted(CONFIGS.items()):
        if which is None or n == which:
            fn()
            ran.add(n)
    _write_artifact(ran)


if __name__ == "__main__":
    main()
