"""Headline benchmark: batched warm-started LTV MPC solves/s on one chip.

Config mirrors BASELINE.md config 4 (1k-4k batched randomized LTV scenarios,
warm-started QP) at the N=100 horizon of the baseline metric.  Baseline
target: 10,000 solves/s per chip at 1e-5 control accuracy (BASELINE.json;
the C++ reference publishes no numbers of its own).

Two operating points, both printed in ONE JSON line:

- headline (``accurate`` serving path, the default): f64-exact ticks via
  the f64 seed map + f32 correction-space fused kernel
  (``make_plan_step(accurate=True)``) — matches the exact f64 native
  active-set solution of the same QPs to ~1e-9, i.e. the baseline's 1e-5
  accuracy clause is met with orders of margin AT the headline speed.
- ``fast_*`` keys (pure-f32 plan path, measured in a child process
  without x64): the round-1 operating point, for continuity.

The accuracy gate (``max_err_vs_exact``) compares several lanes of the
timed result against the exact f64 solution (native C++ active-set
oracle) of the same f32-data QPs; never quote the throughput without it.

The control bound is chosen so it BINDS (~27% of coordinates saturate,
every lane constrained) — round 2 discovered the original +/-300 bound
was never active, which made the gate trivially satisfiable by the f64
seed alone and the timed iterations dead weight.  ``BENCH_BOUND``
overrides (e.g. 300 reproduces the old non-binding workload).
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

BASELINE_SOLVES_PER_S = 10_000.0

# bf16 MXU peak / HBM BW per chip; HIGHEST-precision f32 dots are ~6
# bf16 passes, so the honest f32 ceiling is peak/6 (stated explicitly
# wherever a fraction is quoted).
PEAKS = {"TPU v5 lite": (197.0, 819.0), "TPU v4": (275.0, 1228.0),
         "TPU v5": (459.0, 1638.0), "TPU v6 lite": (918.0, 1640.0)}


def _peaks(jax):
    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "unknown")
    pk_tf, pk_gb = PEAKS.get(kind, (197.0, 819.0))
    pk_tf = float(os.environ.get("BENCH_PEAK_TFLOPS", pk_tf)) / 6.0
    pk_gb = float(os.environ.get("BENCH_PEAK_GBPS", pk_gb))
    return kind, pk_tf, pk_gb


def _trace_device_time(trace_dir, top_k=8):
    """Delegates to copra_tpu.profiling.trace_device_time (the library
    home of the parser; kept as an alias for bench_all/bench_scaling)."""
    from copra_tpu.profiling import trace_device_time
    return trace_device_time(trace_dir, top_k)


def _build_workload(batch, horizon, dtype_np=np.float32):
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
    return rng, As, Bs, ds, x0s


def run_roofline(jax):
    """One gated operating point AT a roofline ceiling (VERDICT r2 #1b).

    Shared-plan fleet (docs/PERFORMANCE.md moral 6): ONE LTI N=256 plan,
    B=4096 scenarios — the per-iteration x-update is a [B,n]x[n,n] GEMM
    (n=256, two full MXU tiles), so the tick is MXU-bound by design:
    Kinv/K stay HBM-resident across the fleet, per-lane vector traffic
    is ~12 KB vs 5.4 MFLOP of HIGHEST-precision f32 matmul work.  The
    ceiling quoted is the f32-HIGHEST MXU peak (bf16 peak / 6 passes).
    Gated like the headline: sampled lanes vs the exact f64 native
    active-set solution, binding bounds (75th percentile of |u_seed|,
    so ~25% of coordinates saturate).
    """
    import jax.numpy as jnp
    import copra_tpu as ct
    from copra_tpu.plan import (auto_rho, make_control_plan,
                                make_plan_step, make_seed_map)
    from copra_tpu.qp.native import solve_qp_native

    B = int(os.environ.get("BENCH_ROOFLINE_BATCH", 4096))
    N = int(os.environ.get("BENCH_ROOFLINE_HORIZON", 256))
    iters = int(os.environ.get("BENCH_ROOFLINE_ITERS", 30))
    steps = int(os.environ.get("BENCH_ROOFLINE_STEPS", 20))
    # two refinement rounds: n=256's conditioning puts the one-round f32
    # correction floor at ~1.4e-5 (measured, iteration-count-independent);
    # round 2 contracts it to ~7e-8 at 2x the GEMM work
    rounds = int(os.environ.get("BENCH_ROOFLINE_ROUNDS", 2))
    T, mass = 0.005, 5.0
    A = np.array([[1.0, T], [0.0, 1.0]])
    Bm = np.array([[0.5 * T * T / mass], [T / mass]])
    d = np.array([-9.81 / 2.0 * T * T, -9.81 * T])
    rng = np.random.default_rng(42)
    x0s = np.array([0.0, -1.5])[None] + rng.normal(
        scale=[0.02, 0.1], size=(B, 2))
    system = ct.LTISystem.create(A.astype(np.float32),
                                 Bm.astype(np.float32),
                                 d.astype(np.float32),
                                 x0s[0].astype(np.float32), N)
    costs = (ct.TargetCost.create(np.eye(2), [0.0, -1.0],
                                  weights=[10.0, 1e4]),
             ct.ControlCost.create([[1.0]], [2.0], weights=[1e-4]))
    # binding bound by construction: 75th percentile of the fleet's
    # unconstrained |u| -> ~25% of coordinates saturate
    plan_free = make_control_plan(system, costs, ())
    sm = make_seed_map(plan_free, center=None, keep_f64=True)
    useed = np.asarray(sm.u0, np.float64)[None] \
        + x0s @ np.asarray(sm.Umap, np.float64)
    bound = float(np.quantile(np.abs(useed), 0.75))
    constraints = (ct.ControlBoundConstraint.create([-bound], [bound]),)
    plan = make_control_plan(system, costs, constraints)
    opts = ct.SolverOptions(max_iter=iters, early_exit=False, polish=False)
    # kernel choice: "shared" (default) = the shared-operator Pallas
    # kernel (K/Kinv VMEM-resident per lane block, [lb,n]x[n,n] MXU GEMM
    # x-updates, lane vectors resident across ALL iterations — HBM
    # traffic is one pass over the vectors per tick); "xla" = the XLA
    # GEMM loop (re-streams the lane vectors every iteration).  The
    # per-lane Pallas kernel is NOT an option here: its matvec layout
    # measured 2.2% MFU on shared operators.
    which = os.environ.get("BENCH_ROOFLINE_KERNEL", "shared")
    uf = None if which == "shared" else False
    opts = opts.replace(rho=auto_rho(plan, x0s, opts,
                                     seed_center=x0s.mean(0),
                                     accurate=True,
                                     accurate_rounds=rounds,
                                     use_fused=uf))
    step = make_plan_step(plan, opts, batched=True,
                          seed_center=x0s.mean(0), accurate=True,
                          accurate_rounds=rounds, use_fused=uf)
    drift = np.zeros((steps + 2, B, 2))
    drift[:, :, 1] = np.cumsum(
        rng.normal(scale=0.02, size=(steps + 2, B)), axis=0)
    x0_seq = [jnp.asarray((x0s + drift[t]).astype(np.float32))
              for t in range(steps + 2)]
    u, _, warm = step(plan, x0_seq[0], None)
    u, _, warm = step(plan, x0_seq[1], warm)
    jax.block_until_ready(u)
    t0 = time.perf_counter()
    for t in range(steps):
        u, _, warm = step(plan, x0_seq[2 + t], warm)
    jax.block_until_ready(u)
    elapsed = time.perf_counter() - t0
    sps = B * steps / elapsed

    n = N
    flops_per_solve = rounds * ((iters + 1) * 2 * n * n + iters * 10 * n) \
        + (rounds - 1) * 2 * n * n + 8 * n
    kind, pk_tf, pk_gb = _peaks(jax)
    mfu_wall = sps * flops_per_solve / (pk_tf * 1e12)
    res = {
        "metric": f"shared-plan fleet roofline point (B={B}, N={n}, "
                  f"{rounds}x{iters} iters, accurate path, "
                  f"{which} kernel)",
        "solves_per_s": round(sps, 1),
        "bound": round(bound, 2),
        "rho": float(f"{opts.rho:.4g}"),
        "flops_per_solve": flops_per_solve,
        "roofline": "f32-HIGHEST MXU peak (bf16 peak / 6 passes)",
        "peak_tflops_f32_highest": round(pk_tf, 1),
        "mfu_wall": round(mfu_wall, 4),
    }

    # measured device time for the same ticks (the honest utilization)
    if os.environ.get("BENCH_PROFILE", "1") != "0" \
            and jax.default_backend() != "cpu":
        import tempfile
        tdir = tempfile.mkdtemp(prefix="jaxprof_roofline_")
        K = 4
        try:
            with jax.profiler.trace(tdir):
                for t in range(K):
                    # u2, not u: the gate below compares u against the
                    # exact solution AT x0_seq[steps+1] — overwriting it
                    # with re-ticked earlier states broke the gate (a
                    # 2.53 'error' that was really a state mismatch)
                    u2, _, warm = step(plan, x0_seq[2 + (t % steps)],
                                       warm)
                jax.block_until_ready(u2)
            parsed = _trace_device_time(tdir)
        except Exception as exc:                  # noqa: BLE001
            parsed = None
            res["measured_profile"] = f"FAILED: {type(exc).__name__}"
        if parsed:
            busy, top = parsed
            dev_s = busy / K
            res["measured_device_ms_per_tick"] = round(dev_s * 1e3, 3)
            res["measured_mfu"] = round(
                B * flops_per_solve / dev_s / (pk_tf * 1e12), 4)
            # kernel-level utilization: the ADMM kernel's own device
            # time vs its GEMM flops (rounds x (iters+1) x 2Bn^2) — the
            # per-tick seed/combine/status work dilutes the tick-level
            # number, the KERNEL is the speed-of-light claim
            kern_s = sum(s for nm, s in top
                         if "fused_admm_box" in nm or "xla_admm_box" in nm
                         ) / K
            if kern_s > 0:
                kflops = rounds * (iters + 1) * 2 * B * n * n
                res["measured_kernel_mfu"] = round(
                    kflops / kern_s / (pk_tf * 1e12), 4)
                res["measured_kernel_ms_per_tick"] = round(kern_s * 1e3, 3)
            res["device_top_ops_ms"] = [[nm[:60], round(s / K * 1e3, 3)]
                                        for nm, s in top]

    # accuracy gate: sampled lanes vs exact f64 native active-set
    errs = []
    x0_last = np.asarray(x0_seq[steps + 1], np.float64)
    Q64 = np.asarray(plan.Q, np.float64)
    c064 = np.asarray(plan.c0, np.float64)
    Cmap64 = np.asarray(plan.Cmap, np.float64)
    for lane in (0, 1, 17, B - 1):
        c64 = c064 + x0_last[lane] @ Cmap64
        exact = solve_qp_native(ct.DenseQP(
            Q=Q64, c=c64, Aeq=np.zeros((0, n)), beq=np.zeros(0),
            Aineq=np.zeros((0, n)), bineq=np.zeros(0),
            lb=np.asarray(plan.lb, np.float64),
            ub=np.asarray(plan.ub, np.float64)))
        errs.append(float(np.abs(np.asarray(u[lane], np.float64)
                                 - np.asarray(exact.x)).max()))
    res["max_err_vs_exact"] = float(f"{max(errs):.3g}")
    return res


def main():
    mode = os.environ.get("BENCH_MODE", "accurate")
    import jax
    if mode == "accurate":
        # the accurate serving path applies the f64 seed map on device
        jax.config.update("jax_enable_x64", True)
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
    # 20-tick window: receding-horizon serving is a continuous stream;
    # a 5-tick window under-measures by ~30% (pipeline fill + first-tick
    # transients amortize: 335k @ 5 ticks vs 485k @ 20, same gate)
    steps = int(os.environ.get("BENCH_STEPS", 20))
    dtype = jnp.float32

    rng, As, Bs, ds, x0s = _build_workload(batch, horizon)

    system = ct.LTVSystem(A=jnp.asarray(As, dtype), B=jnp.asarray(Bs, dtype),
                          d=jnp.asarray(ds, dtype),
                          x0=jnp.asarray(x0s, dtype))
    costs = (ct.TargetCost.create(np.eye(2), [0.0, -1.0],
                                  weights=[10.0, 1e4]),
             ct.ControlCost.create([[1.0]], [2.0], weights=[1e-4]))
    # The bound must BIND or the bench is a lie: at the original +/-300
    # no lane ever touched it (the f64 seed alone was the exact solution
    # and the iterations were dead weight).  At +/-60, ~27% of control
    # coordinates saturate and EVERY lane carries an active constraint
    # (unconstrained |u| spans ~41..73 across the fleet), so the timed
    # iterations are doing the actual projection work the gate verifies.
    bound = float(os.environ.get("BENCH_BOUND", "60.0"))
    constraints = (ct.ControlBoundConstraint.create([-bound], [bound]),)
    opts = ct.SolverOptions(max_iter=iters, early_exit=False, polish=False,
                            rho=float(os.environ.get("BENCH_RHO", "1.0")),
                            kkt_refine=int(os.environ.get("BENCH_REFINE",
                                                          "0")))

    if mode == "accurate":
        from copra_tpu.plan import auto_rho, make_control_plan, make_plan_step

        def plan_one(A_, B_, d_, x0_):
            return make_control_plan(ct.LTVSystem(A=A_, B=B_, d=d_, x0=x0_),
                                     costs, constraints)

        plan = jax.jit(jax.vmap(plan_one))(system.A, system.B, system.d,
                                           system.x0)
        jax.block_until_ready(plan.Q)
        rounds = int(os.environ.get("BENCH_ROUNDS", "1"))
        if "BENCH_RHO" not in os.environ:
            # measured policy (no hand-tuned constants): probe the real
            # serving step at gm-relative candidates on sampled lanes,
            # gate vs the exact f64 native oracle, take the winner
            opts = opts.replace(rho=auto_rho(
                plan, x0s, opts, seed_center=x0s, accurate=True,
                accurate_rounds=rounds))
        plan_step = make_plan_step(
            plan, opts, batched=True, seed_center=x0s, accurate=True,
            accurate_rounds=rounds)

        def step(sys_b, warm):
            u, sol, nxt = plan_step(plan, sys_b.x0, warm)
            return u, nxt
    elif mode in ("plan", "plan_xla"):
        # pure-f32 serving path: condense + QP assembly + KKT factorization
        # happen ONCE (make_control_plan / make_plan_step); each timed tick
        # is the x0-affine update + fixed ADMM iterations
        from copra_tpu.plan import auto_rho, make_control_plan, make_plan_step

        def plan_one(A_, B_, d_, x0_):
            return make_control_plan(ct.LTVSystem(A=A_, B=B_, d=d_, x0=x0_),
                                     costs, constraints)

        plan = jax.jit(jax.vmap(plan_one))(system.A, system.B, system.d,
                                           system.x0)
        jax.block_until_ready(plan.Q)
        if "BENCH_RHO" not in os.environ:
            # same measured policy as the accurate path (saturated lanes
            # stall at rho=1 — docs/PERFORMANCE.md moral 8)
            opts = opts.replace(rho=auto_rho(plan, x0s, opts,
                                             seed_center=x0s))
        plan_step = make_plan_step(plan, opts, batched=True,
                                   use_fused=None if mode == "plan"
                                   else False,
                                   seed_center=x0s)

        def step(sys_b, warm):
            u, sol, nxt = plan_step(plan, sys_b.x0, warm)
            return u, nxt
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
    x0_seq = [jnp.asarray((x0s + drift[t]).astype(np.float32))
              for t in range(steps + 2)]

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
    x0_last = np.asarray(x0_seq[steps + 1])   # accuracy gate: last tick

    # honesty gate: several lanes of the timed result vs the exact (f64,
    # native active-set) solutions of the same QPs.  The QP's linear term
    # is built in f64 from the widened f32 plan data — the plan data IS
    # the problem; rounding c to f32 perturbs the solution by ~1e-2
    # through the Hessian's 1e-4 eigenvalues (docs/PERFORMANCE.md).
    gate_err = None
    gate_fail = None
    try:
        from copra_tpu.plan import make_control_plan as _mcp
        from copra_tpu.qp.native import solve_qp_native
        if mode in ("accurate", "plan", "plan_xla"):
            plan_np = plan
        else:
            plan_np = jax.jit(jax.vmap(lambda a, b, dd, x0: _mcp(
                ct.LTVSystem(A=a, B=b, d=dd, x0=x0), costs, constraints)))(
                system.A, system.B, system.d, system.x0)
        errs = []
        for lane in (0, 1, 17, batch - 1):
            Q64 = np.asarray(plan_np.Q[lane], np.float64)
            c64 = (np.asarray(plan_np.c0[lane], np.float64)
                   + x0_last[lane].astype(np.float64)
                   @ np.asarray(plan_np.Cmap[lane], np.float64))
            n0 = Q64.shape[-1]
            exact = solve_qp_native(ct.DenseQP(
                Q=Q64, c=c64,
                Aeq=np.zeros((0, n0)), beq=np.zeros((0,)),
                Aineq=np.zeros((0, n0)), bineq=np.zeros((0,)),
                lb=np.asarray(plan_np.lb[lane], np.float64),
                ub=np.asarray(plan_np.ub[lane], np.float64)))
            errs.append(float(np.abs(np.asarray(u[lane], np.float64)
                                     - np.asarray(exact.x)).max()))
        gate_err = max(errs)
    except Exception as exc:                      # noqa: BLE001
        # an ungated throughput number is unverified — say so explicitly
        # rather than silently dropping the key
        gate_fail = f"FAILED: {type(exc).__name__}: {exc}"

    out = {
        "metric": f"batched warm-started LTV MPC solves/s, {mode} path "
                  f"(B={batch}, N={horizon}, {iters} ADMM iters)",
        "value": round(solves_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / BASELINE_SOLVES_PER_S, 3),
    }

    # --- roofline accounting (north star: "speed-of-light per chip") ---
    # FLOPs per solve, analytic (the Pallas kernel is opaque to XLA's
    # cost analysis): per ADMM iteration one [1,n]x[n,n] K^-1 matvec
    # (2n^2) + ~10n vector ops; per round one final g = K x matvec; the
    # seed/affine maps are O(x*n).  n = N*udim = horizon here.
    n_qp = horizon
    rounds = int(os.environ.get("BENCH_ROUNDS", "1")) \
        if mode == "accurate" else 1
    flops_per_solve = rounds * ((iters + 1) * 2 * n_qp * n_qp
                                + iters * 10 * n_qp) \
        + (rounds - 1) * 2 * n_qp * n_qp + 8 * n_qp
    # HBM bytes per solve: Kinv + K stream once per tick per lane (f32),
    # plus ~10 length-n vectors (seed/bounds/state/warm).
    bytes_per_solve = 2 * n_qp * n_qp * 4 + 10 * n_qp * 4
    kind, pk_tf, pk_gb = _peaks(jax)
    gflops = solves_per_s * flops_per_solve / 1e9
    gbps = solves_per_s * bytes_per_solve / 1e9
    out["mfu"] = round(gflops / (pk_tf * 1e3), 5)
    out["hbm_util"] = round(gbps / pk_gb, 5)
    out["gflops_per_s"] = round(gflops, 1)
    out["device_kind"] = kind
    if gate_err is not None:
        out["max_err_vs_exact"] = float(f"{gate_err:.3g}")
    if gate_fail is not None:
        out["accuracy_gate"] = gate_fail

    # --- MEASURED utilization (VERDICT r2 #1a): trace a few extra ticks
    # after the timed loop, parse the device-op timeline — mfu/hbm from
    # measured device busy time instead of the analytic wall-clock model,
    # plus the dispatch share (wall time the device sits idle).
    if os.environ.get("BENCH_PROFILE", "1") != "0" \
            and jax.default_backend() != "cpu":
        import tempfile
        tdir = tempfile.mkdtemp(prefix="jaxprof_bench_")
        K = 4
        try:
            with jax.profiler.trace(tdir):
                for t in range(K):
                    u2, warm = step(at_tick(2 + (t % steps)), warm)
                jax.block_until_ready(u2)
            parsed = _trace_device_time(tdir)
        except Exception as exc:                  # noqa: BLE001
            parsed = None
            out["measured_profile"] = f"FAILED: {type(exc).__name__}"
        if parsed:
            busy, top = parsed
            dev_s = busy / K
            wall_s = elapsed / steps
            out["measured_device_ms_per_tick"] = round(dev_s * 1e3, 3)
            out["measured_mfu"] = round(
                batch * flops_per_solve / dev_s / (pk_tf * 1e12), 5)
            out["measured_hbm_util"] = round(
                batch * bytes_per_solve / dev_s / (pk_gb * 1e9), 5)
            out["measured_dispatch_share"] = round(
                max(0.0, 1.0 - dev_s / wall_s), 4)
            out["device_top_ops_ms"] = [[n[:60], round(s / K * 1e3, 3)]
                                        for n, s in top]
            # KERNEL-level utilization: the iteration kernel's own time
            # vs its matvec flops.  The tick-level mfu is diluted by the
            # n_iter=0 status-gradient pass, which is HBM-BOUND by
            # construction (it streams K once — see measured_hbm_util);
            # the iteration kernel is the compute claim.  Note the
            # distinct-operator op admits NO shared-operand MXU GEMM, so
            # its ceiling is the VPU/VMEM roofline, not the MXU peak the
            # mfu denominator uses.
            kern_ts = sorted((s for nm, s in top
                              if "admm_box" in nm), reverse=True)
            if kern_ts:
                kern_s = kern_ts[0] / K
                kflops = rounds * (iters + 1) * 2 * batch * n_qp * n_qp
                out["measured_kernel_mfu"] = round(
                    kflops / kern_s / (pk_tf * 1e12), 4)
                out["measured_kernel_ms_per_tick"] = round(
                    kern_s * 1e3, 3)

    if mode == "accurate" and not os.environ.get("BENCH_CHILD") \
            and os.environ.get("BENCH_CHAINED", "1") != "0":
        # dispatch-free chained serving (make_plan_multistep): the same
        # T-tick exogenous stream in ONE dispatch — wall/tick equals the
        # device time; gate the final chained tick like the headline
        try:
            from copra_tpu.plan import make_plan_multistep

            step_many = make_plan_multistep(
                plan, opts, seed_center=x0s,
                accurate_rounds=int(os.environ.get("BENCH_ROUNDS", "1")))
            x0_chain = jnp.stack([x0_seq[2 + t] for t in range(steps)])
            usc, stc, rdc, warmc = step_many(x0_chain)
            jax.block_until_ready(usc)
            # second warmup WITH a warm tuple: the first warm-carrying
            # call still pays one-time operand layout/transfer costs
            # (measured: 1.6 s vs 47 ms steady-state for 20 ticks)
            usc, stc, rdc, warmc = step_many(x0_chain, warmc)
            jax.block_until_ready(usc)
            t0 = time.perf_counter()
            usc, stc, rdc, warmc = step_many(x0_chain, warmc)
            jax.block_until_ready(usc)
            chained = batch * steps / (time.perf_counter() - t0)
            out["chained_solves_per_s"] = round(chained, 1)
            out["chained_converged_frac"] = float(
                np.mean(np.asarray(stc) == 0))
            errs_c = []
            x0c_last = np.asarray(x0_chain[-1], np.float64)
            for lane in (0, 1, 17, batch - 1):
                Q64 = np.asarray(plan.Q[lane], np.float64)
                c64 = (np.asarray(plan.c0[lane], np.float64)
                       + x0c_last[lane]
                       @ np.asarray(plan.Cmap[lane], np.float64))
                n0 = Q64.shape[-1]
                from copra_tpu.qp.native import solve_qp_native
                exact = solve_qp_native(ct.DenseQP(
                    Q=Q64, c=c64,
                    Aeq=np.zeros((0, n0)), beq=np.zeros((0,)),
                    Aineq=np.zeros((0, n0)), bineq=np.zeros((0,)),
                    lb=np.asarray(plan.lb[lane], np.float64),
                    ub=np.asarray(plan.ub[lane], np.float64)))
                errs_c.append(float(np.abs(
                    np.asarray(usc[-1][lane], np.float64)
                    - np.asarray(exact.x)).max()))
            out["chained_max_err_vs_exact"] = float(f"{max(errs_c):.3g}")
        except Exception as exc:                  # noqa: BLE001
            out["chained_point"] = f"FAILED: {type(exc).__name__}: {exc}"

    if mode == "accurate" and not os.environ.get("BENCH_CHILD") \
            and os.environ.get("BENCH_ROOFLINE", "1") != "0":
        # the gated roofline operating point rides the same JSON line
        try:
            out["roofline_point"] = run_roofline(jax)
        except Exception as exc:                  # noqa: BLE001
            out["roofline_point"] = f"FAILED: {type(exc).__name__}: {exc}"

    if mode == "accurate" and not os.environ.get("BENCH_CHILD"):
        # fast-mode (pure f32, no x64) point from a child process
        try:
            env = dict(os.environ, BENCH_MODE="plan", BENCH_CHILD="1")
            child = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True, timeout=1200)
            line = [ln for ln in child.stdout.splitlines()
                    if ln.startswith("{")][-1]
            fast = json.loads(line)
            out["fast_solves_per_s"] = fast.get("value")
            out["fast_max_err"] = fast.get("max_err_vs_exact")
        except Exception as exc:                  # noqa: BLE001
            out["fast_point"] = f"FAILED: {type(exc).__name__}"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
