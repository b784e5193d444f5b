"""Scaling-efficiency harness: weak scaling of the sharded MPC step.

BASELINE.md asks for >85% multi-host scaling efficiency measured at 1 chip,
1 host, and >=2 hosts.  This harness measures weak-scaling efficiency over
however many devices are visible (real chips on hardware;
``--xla_force_host_platform_device_count=K`` for a virtual mesh), keeping
the per-device scenario count fixed and reporting throughput per device vs
the 1-device run.  On multi-host pods, run one process per host after
``copra_tpu.parallel.distributed_init()`` — the same code path, same mesh
construction.

NOTE: on a VIRTUAL CPU mesh the "devices" share the same host cores, so
the efficiency figures are only a functional smoke test — scenario DP has
no cross-device communication in the solve, so on real chips the expected
efficiency is near 1.0 (the only traffic is the replicated cost broadcast
and the psum of a handful of scalars per step).

Contention control (VERDICT r3 #6): raw per-device efficiency on a
virtual mesh conflates communication with host-core contention.  For each
mesh size K this harness ALSO runs K independent single-device processes
concurrently on the same host (``--worker`` mode, start-synchronized over
stdin) solving the same per-device workload with zero communication by
construction; their aggregate throughput is the pure core-contention
ceiling, and ``efficiency_vs_contention_ceiling`` is the mesh throughput
normalized by THAT curve.  ~1.0 means the mesh path adds nothing on top
of contention; well below 1.0 would falsify the contention explanation.

Prints one JSON line per mesh size plus a final efficiency summary.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np


def _setup_jax(force_single_cpu: bool = False):
    import jax
    if force_single_cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 1)
    elif os.environ.get("BENCH_FORCE_CPU") or \
            "--xla_force_host_platform_device_count" in \
            os.environ.get("XLA_FLAGS", ""):
        # a VIRTUAL CPU mesh was requested: the axon plugin overrides the
        # JAX_PLATFORMS env var, so force CPU through the config (the
        # CLAUDE.md invariant) or the harness silently sees 1 real chip
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.devices()
    except RuntimeError:
        # requested platform plugin not importable (e.g. JAX_PLATFORMS left
        # pointing at a tunnel backend) — fall back to CPU
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax


def _workload():
    """(costs, constraints, fleet) — shared by the mesh run and the
    contention-control workers so both solve the identical per-device
    problem."""
    import jax.numpy as jnp
    import copra_tpu as ct

    horizon = int(os.environ.get("BENCH_HORIZON", 50))

    T, mass = 0.005, 5.0
    A = np.array([[1.0, T], [0.0, 1.0]])
    B = np.array([[0.5 * T * T / mass], [T / mass]])
    d = np.array([-9.81 / 2.0 * T * T, -9.81 * T])
    costs = (ct.TargetCost.create(np.eye(2), [0.0, -1.0],
                                  weights=[10.0, 1e4]),
             ct.ControlCost.create([[1.0]], [2.0], weights=[1e-4]))
    constraints = (ct.ControlBoundConstraint.create([-300.0], [300.0]),)

    def fleet(batch):
        rng = np.random.default_rng(0)
        As = np.repeat(np.repeat(A[None], horizon, 0)[None], batch, 0)
        As += rng.normal(scale=1e-4, size=As.shape)
        return ct.LTVSystem(
            A=jnp.asarray(As, jnp.float32),
            B=jnp.asarray(np.repeat(np.repeat(B[None], horizon, 0)[None],
                                    batch, 0), jnp.float32),
            d=jnp.asarray(np.repeat(np.repeat(d[None], horizon, 0)[None],
                                    batch, 0), jnp.float32),
            x0=jnp.asarray(np.array([0.0, -1.5]) + rng.normal(
                scale=[0.02, 0.1], size=(batch, 2)), jnp.float32))

    return costs, constraints, fleet


def worker_main():
    """Contention-control worker: ONE cpu device, the per-device workload,
    zero communication.  Prints READY after compile+warmup, waits for GO
    on stdin (so all K workers measure the same concurrent window), then
    prints one JSON line with its throughput."""
    jax = _setup_jax(force_single_cpu=True)
    import copra_tpu as ct
    from copra_tpu.parallel import (batch_axes, make_mesh,
                                    make_sharded_mpc_step, shard_batch)

    per_device = int(os.environ.get("BENCH_PER_DEVICE", 512))
    iters = int(os.environ.get("BENCH_ITERS", 60))
    steps = int(os.environ.get("BENCH_STEPS", 3)) * 2

    costs, constraints, fleet = _workload()
    mesh = make_mesh(devices=jax.devices()[:1])
    system = fleet(per_device)
    system = shard_batch(system, mesh, reference=batch_axes(system))
    step = make_sharded_mpc_step(mesh, costs, constraints,
                                 ct.SolverOptions(max_iter=iters))
    res, _ = step(system, None)
    jax.block_until_ready(res.control)
    warm = ct.WarmStart(x=res.solution.x, y=res.solution.y,
                        z=res.solution.z)
    res, _ = step(system, warm)
    jax.block_until_ready(res.control)

    print("READY", flush=True)
    line = sys.stdin.readline()
    assert line.strip() == "GO", line
    rates = []
    for _ in range(3):                  # median of 3 windows
        t0 = time.perf_counter()
        for _ in range(steps):
            res, _ = step(system, warm)
        jax.block_until_ready(res.control)
        rates.append(per_device * steps / (time.perf_counter() - t0))
    print(json.dumps({"solves_per_s": float(np.median(rates))}),
          flush=True)


def contention_ceiling(sizes):
    """Aggregate throughput of K start-synchronized independent
    single-device processes, per K — the pure core-contention ceiling
    (no mesh, no collectives, separate address spaces)."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)          # workers pin 1 device via config
    env.pop("JAX_PLATFORMS", None)
    ceilings = {}
    for nd in sizes:
        procs = [subprocess.Popen(
            [sys.executable, "-u", os.path.abspath(__file__), "--worker"],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True,
            env=env, cwd=os.path.dirname(os.path.abspath(__file__)))
            for _ in range(nd)]
        try:
            for p in procs:
                assert p.stdout.readline().strip() == "READY"
            for p in procs:                 # near-simultaneous release
                p.stdin.write("GO\n")
                p.stdin.flush()
            rates = [json.loads(p.stdout.readline())["solves_per_s"]
                     for p in procs]
            thr = float(sum(rates))
            for p in procs:
                p.wait(timeout=60)
        finally:
            for p in procs:
                if p.poll() is None:
                    p.kill()
        ceilings[nd] = (thr, rates)
        print(json.dumps({"contention_control_processes": nd,
                          "aggregate_solves_per_s": round(thr, 1),
                          "per_process": round(thr / nd, 1),
                          # straggler spread: an SPMD LOCKSTEP program
                          # is gated by the SLOWEST rank every step
                          # (max-of-K), while independent processes sum
                          # — min/mean is the measured lockstep penalty
                          # host jitter imposes before any comm cost
                          "min_process": round(min(rates), 1),
                          "straggler_ratio": round(
                              min(rates) * nd / thr, 3)}))
    return ceilings


def dist_worker_main():
    """One process of a K-process ``jax.distributed`` gloo cluster
    (VERDICT r4 #3): 1 CPU device per process, a GLOBAL mesh spanning
    all processes, the production sharded step over the same per-device
    workload as the contention-control workers.  This bypasses the
    single-process GSPMD-runtime confound entirely: K separate address
    spaces, real inter-process collectives.  Protocol: READY ->
    stdin GO -> one JSON line."""
    pid = int(sys.argv[sys.argv.index("--dist-worker") + 1])
    nproc = int(sys.argv[sys.argv.index("--dist-worker") + 2])
    port = sys.argv[sys.argv.index("--dist-worker") + 3]

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 1)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    from copra_tpu.parallel import distributed_init
    distributed_init(coordinator_address=f"127.0.0.1:{port}",
                     num_processes=nproc, process_id=pid)
    import jax.numpy as jnp  # noqa: F401
    import copra_tpu as ct
    from jax.sharding import NamedSharding, PartitionSpec as P
    from copra_tpu.parallel import (batch_axes, make_mesh,
                                    make_sharded_mpc_step)

    per_device = int(os.environ.get("BENCH_PER_DEVICE", 512))
    iters = int(os.environ.get("BENCH_ITERS", 60))
    steps = int(os.environ.get("BENCH_STEPS", 3)) * 2
    costs, constraints, fleet = _workload()
    batch = per_device * nproc

    mesh = make_mesh()                   # global 1-D mesh, K processes
    shard = NamedSharding(mesh, P("batch"))
    repl = NamedSharding(mesh, P())
    full = fleet(batch)                  # deterministic: same on all ranks
    axes = batch_axes(full)

    def to_global(leaf, ax):
        a = np.asarray(leaf)
        if ax == 0:
            local = a.reshape((nproc, batch // nproc) + a.shape[1:])[pid]
            return jax.make_array_from_process_local_data(
                shard, local, a.shape)
        return jax.make_array_from_process_local_data(repl, a, a.shape)

    system = jax.tree_util.tree_map(to_global, full, axes,
                                    is_leaf=lambda x: x is None)
    step = make_sharded_mpc_step(mesh, costs, constraints,
                                 ct.SolverOptions(max_iter=iters))
    res, _ = step(system, None)
    jax.block_until_ready(res.control)
    warm = ct.WarmStart(x=res.solution.x, y=res.solution.y,
                        z=res.solution.z)
    res, _ = step(system, warm)
    jax.block_until_ready(res.control)

    print("READY", flush=True)
    line = sys.stdin.readline()
    assert line.strip() == "GO", line
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            res, _ = step(system, warm)
        jax.block_until_ready(res.control)
        rates.append(batch * steps / (time.perf_counter() - t0))
    print(json.dumps({"process_id": pid,
                      "solves_per_s": float(np.median(rates))}),
          flush=True)


def multiprocess_cluster(sizes):
    """Throughput of the REAL K-process gloo cluster per K (the
    single-process-runtime-confound-free datapoint)."""
    import socket
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    out = {}
    for nd in sizes:
        if nd < 2:
            continue
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        procs = [subprocess.Popen(
            [sys.executable, "-u", os.path.abspath(__file__),
             "--dist-worker", str(i), str(nd), str(port)],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True,
            env=env, cwd=os.path.dirname(os.path.abspath(__file__)))
            for i in range(nd)]
        def read_until(p, pred, what):
            # gloo prints connection banners on stdout before READY —
            # skip anything that isn't the protocol line
            for _ in range(50):
                line = p.stdout.readline()
                if not line:
                    break
                if pred(line.strip()):
                    return line.strip()
            raise AssertionError(f"worker never sent {what}")

        try:
            for p in procs:
                read_until(p, lambda s: s == "READY", "READY")
            for p in procs:
                p.stdin.write("GO\n")
                p.stdin.flush()
            thrs = [json.loads(read_until(
                p, lambda s: s.startswith("{"), "JSON"))["solves_per_s"]
                    for p in procs]
            for p in procs:
                p.wait(timeout=120)
        finally:
            for p in procs:
                if p.poll() is None:
                    p.kill()
        # SPMD lockstep: every rank reports the GLOBAL batch over its
        # own wall — the cluster throughput is their median, not sum
        out[nd] = float(np.median(thrs))
        print(json.dumps({"multiprocess_cluster_processes": nd,
                          "solves_per_s": round(out[nd], 1)}))
    return out


def independent_devices_control(jax, sizes, all_devices):
    """K INDEPENDENT single-device jitted solves in ONE process — no
    mesh, no collectives, no sharding; just the single-process runtime
    driving K devices.  Decomposes the virtual-mesh loss (VERDICT r4
    #3): (this / K-process ceiling) prices the single-process runtime
    (host dispatch serialization + shared threadpool); (mesh / this)
    prices the GSPMD/sharded-solve increment on top."""
    import copra_tpu as ct
    from copra_tpu.parallel import (batch_axes, make_mesh,
                                    make_sharded_mpc_step, shard_batch)

    per_device = int(os.environ.get("BENCH_PER_DEVICE", 512))
    iters = int(os.environ.get("BENCH_ITERS", 60))
    steps = int(os.environ.get("BENCH_STEPS", 3))
    costs, constraints, fleet = _workload()
    out = {}
    for nd in sizes:
        lanes = []
        for d in all_devices[:nd]:
            mesh_d = make_mesh(devices=[d])
            system_d = fleet(per_device)
            system_d = shard_batch(system_d, mesh_d,
                                   reference=batch_axes(system_d))
            step_d = make_sharded_mpc_step(
                mesh_d, costs, constraints,
                ct.SolverOptions(max_iter=iters))
            res, _ = step_d(system_d, None)
            jax.block_until_ready(res.control)
            warm = ct.WarmStart(x=res.solution.x, y=res.solution.y,
                                z=res.solution.z)
            res, _ = step_d(system_d, warm)
            lanes.append((step_d, system_d, warm, res.control))
        jax.block_until_ready([l[3] for l in lanes])
        t0 = time.perf_counter()
        outs = []
        for _ in range(steps):
            outs = [step_d(system_d, warm)[0].control
                    for step_d, system_d, warm, _ in lanes]
        jax.block_until_ready(outs)
        dt = time.perf_counter() - t0
        out[nd] = per_device * nd * steps / dt
        print(json.dumps({
            "independent_devices_in_one_process": nd,
            "solves_per_s": round(out[nd], 1)}))
    return out


def main():
    jax = _setup_jax()
    import copra_tpu as ct
    from copra_tpu.parallel import (batch_axes, make_mesh,
                                    make_sharded_mpc_step, shard_batch)

    per_device = int(os.environ.get("BENCH_PER_DEVICE", 512))
    iters = int(os.environ.get("BENCH_ITERS", 60))
    steps = int(os.environ.get("BENCH_STEPS", 3))
    costs, constraints, fleet = _workload()

    all_devices = jax.devices()
    sizes = [s for s in (1, 2, 4, 8, 16, 32) if s <= len(all_devices)]
    results = {}
    for nd in sizes:
        mesh = make_mesh(devices=all_devices[:nd])
        batch = per_device * nd
        system = fleet(batch)
        system = shard_batch(system, mesh, reference=batch_axes(system))
        step = make_sharded_mpc_step(
            mesh, costs, constraints,
            ct.SolverOptions(max_iter=iters))
        res, _ = step(system, None)
        jax.block_until_ready(res.control)
        warm = ct.WarmStart(x=res.solution.x, y=res.solution.y,
                            z=res.solution.z)
        res, _ = step(system, warm)
        jax.block_until_ready(res.control)
        t0 = time.perf_counter()
        for _ in range(steps):
            res, _ = step(system, warm)
        jax.block_until_ready(res.control)
        dt = (time.perf_counter() - t0) / steps
        thr = batch / dt
        results[nd] = thr
        print(json.dumps({"devices": nd, "batch": batch,
                          "solves_per_s": round(thr, 1),
                          "per_device": round(thr / nd, 1)}))

    base = results[sizes[0]] / sizes[0]
    eff = {nd: results[nd] / (nd * base) for nd in sizes}
    print(json.dumps({
        "metric": "weak-scaling efficiency (per-device throughput vs "
                  "1-device)",
        "efficiency": {str(k): round(v, 3) for k, v in eff.items()},
        "min_efficiency": round(min(eff.values()), 3),
    }))

    if all_devices[0].platform == "cpu" and \
            not os.environ.get("BENCH_SKIP_CONTENTION"):
        # virtual mesh on shared host cores: normalize by the measured
        # pure-contention ceiling (K independent processes, no mesh)
        ceilings_full = contention_ceiling(sizes)
        ceilings = {nd: v[0] for nd, v in ceilings_full.items()}
        eff_vs = {nd: results[nd] / ceilings[nd] for nd in sizes}
        # decomposition control: K independent per-device solves in ONE
        # process (no mesh/collectives) — prices the single-process
        # runtime separately from the sharded-solve increment
        indep = independent_devices_control(jax, sizes, all_devices)
        print(json.dumps({
            "metric": "virtual-mesh loss decomposition: single-process "
                      "runtime vs sharded-solve increment",
            "single_process_runtime_efficiency":
                {str(k): round(indep[k] / ceilings[k], 3)
                 for k in sizes},
            "mesh_vs_independent_devices":
                {str(k): round(results[k] / indep[k], 3)
                 for k in sizes},
        }))
        print(json.dumps({
            "metric": "virtual-mesh efficiency vs measured core-"
                      "contention ceiling (K independent 1-device "
                      "processes, same workload)",
            "efficiency_vs_contention_ceiling":
                {str(k): round(v, 3) for k, v in eff_vs.items()},
            "min_efficiency_vs_contention_ceiling":
                round(min(eff_vs.values()), 3),
        }))

        # REAL K-process jax.distributed gloo cluster (VERDICT r4 #3):
        # one device per process, separate address spaces, inter-process
        # collectives — no single-process GSPMD-runtime confound.
        # Efficiency vs the independent-process ceiling is the honest
        # multi-host-analog scaling number this host can produce.
        if not os.environ.get("BENCH_SKIP_MULTIPROCESS"):
            mp_sizes = [s for s in sizes if 2 <= s <= 8]
            cluster = multiprocess_cluster(mp_sizes)
            mp_eff = {nd: cluster[nd] / ceilings[nd] for nd in cluster}
            # the INDEPENDENT-process ceiling sums K free-running rates;
            # a lockstep SPMD cluster is gated by the slowest rank each
            # step, so its honest ceiling on a jittery shared host is
            # K * min(process rate) — the straggler-adjusted ceiling.
            # Efficiency vs THAT isolates the communication/runtime
            # cost from host-jitter-induced lockstep loss.
            lockstep = {nd: len(ceilings_full[nd][1])
                        * min(ceilings_full[nd][1])
                        for nd in cluster}
            ls_eff = {nd: cluster[nd] / lockstep[nd] for nd in cluster}
            summary = {
                "metric": "K-process jax.distributed gloo cluster "
                          "efficiency vs the K-independent-process "
                          "contention ceiling (same workload, same "
                          "host)",
                "cluster_solves_per_s":
                    {str(k): round(v, 1) for k, v in cluster.items()},
                "ceiling_solves_per_s":
                    {str(k): round(ceilings[k], 1) for k in cluster},
                "multiprocess_efficiency":
                    {str(k): round(v, 3) for k, v in mp_eff.items()},
                "min_multiprocess_efficiency":
                    round(min(mp_eff.values()), 3),
                "lockstep_straggler_ceiling_solves_per_s":
                    {str(k): round(v, 1) for k, v in lockstep.items()},
                "efficiency_vs_lockstep_ceiling":
                    {str(k): round(v, 3) for k, v in ls_eff.items()},
                "min_efficiency_vs_lockstep_ceiling":
                    round(min(ls_eff.values()), 3),
            }
            print(json.dumps(summary))
            out_path = os.environ.get("SCALING_OUT")
            if out_path:
                with open(out_path, "w") as f:
                    json.dump({
                        "raw_mesh": {str(k): v
                                     for k, v in results.items()},
                        "weak_scaling_efficiency":
                            {str(k): round(v, 3) for k, v in eff.items()},
                        "contention_ceiling":
                            {str(k): round(v, 1)
                             for k, v in ceilings.items()},
                        "efficiency_vs_contention_ceiling":
                            {str(k): round(v, 3)
                             for k, v in eff_vs.items()},
                        "independent_devices_one_process":
                            {str(k): round(v, 1)
                             for k, v in indep.items()},
                        "single_process_runtime_efficiency":
                            {str(k): round(indep[k] / ceilings[k], 3)
                             for k in sizes},
                        "mesh_vs_independent_devices":
                            {str(k): round(results[k] / indep[k], 3)
                             for k in sizes},
                        **summary}, f, indent=1)


if __name__ == "__main__":
    if "--worker" in sys.argv:
        worker_main()
    elif "--dist-worker" in sys.argv:
        dist_worker_main()
    else:
        main()
