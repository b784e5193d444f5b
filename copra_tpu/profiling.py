"""Tracing, metrics, and logging.

The reference's observability is two ``std::chrono`` spans
(``/root/reference/src/LMPC.cpp:114-127``) and stderr prints.  The
TPU-native equivalents here:

* ``trace_span`` — ``jax.profiler.TraceAnnotation`` context manager so
  build/solve phases show up in TPU profiler traces (SURVEY.md §5);
* ``timed`` — host wall-clock span with ``block_until_ready`` semantics
  (the honest device-time measurement the reference's accessors approximate);
* ``solve_metrics`` — structured metrics dict from a batched
  ``QPSolution`` (convergence counts, residual extrema, iterations), the
  batched analog of ``SI_inform()``;
* module logger (stdlib ``logging``) replacing the reference's raw stderr.
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Dict, Optional

import jax
import numpy as np

logger = logging.getLogger("copra_tpu")


@contextlib.contextmanager
def trace_span(name: str):
    """Annotate a region for the JAX/TPU profiler (shows in xprof traces)."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def timed(result_box: Optional[Dict] = None, key: str = "seconds",
          block_on=None):
    """Wall-clock a block; if ``block_on`` is given, ``block_until_ready``
    it before stopping the clock (device-honest timing)."""
    t0 = time.perf_counter()
    yield
    if block_on is not None:
        jax.block_until_ready(block_on)
    dt = time.perf_counter() - t0
    if result_box is not None:
        result_box[key] = dt


def solve_metrics(solution, elapsed_s: Optional[float] = None) -> Dict:
    """Structured metrics for one (possibly batched) QPSolution."""
    status = np.atleast_1d(np.asarray(solution.status))
    rp = np.atleast_1d(np.asarray(solution.primal_residual))
    rd = np.atleast_1d(np.asarray(solution.dual_residual))
    iters = np.atleast_1d(np.asarray(solution.iterations))
    n = status.shape[0]
    out = {
        "batch": int(n),
        "converged": int((status == 0).sum()),
        "convergence_rate": float((status == 0).mean()),
        "max_primal_residual": float(rp.max()),
        "max_dual_residual": float(rd.max()),
        "mean_iterations": float(iters.mean()),
        "max_iterations": int(iters.max()),
    }
    if elapsed_s is not None:
        out["seconds"] = float(elapsed_s)
        out["solves_per_s"] = float(n / elapsed_s) if elapsed_s > 0 else 0.0
    return out


def log_metrics(metrics: Dict, prefix: str = "solve") -> None:
    logger.info("%s: %s", prefix,
                " ".join(f"{k}={v}" for k, v in metrics.items()))


def trace_device_time(trace_dir, top_k=8):
    """Parse a ``jax.profiler`` trace directory: total device busy time
    (s) and the top-k device ops by time.  Returns ``(busy_s, [(name,
    s), ...])`` or ``None`` when no device track is found (CPU runs).

    The parser restricts to the "XLA Ops" thread — device traces nest
    "XLA Modules" OVER "XLA Ops" and summing both double-counts
    (measured; bench.py's device/dispatch decomposition and the LMPC
    deadline calibration both ride on this).
    """
    import glob
    import gzip
    import json
    import os

    cands = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not cands:
        return None
    path = max(cands, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    evs = data.get("traceEvents", [])
    pid_names, tid_names = {}, {}
    for e in evs:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name":
            pid_names[e.get("pid")] = e.get("args", {}).get("name", "")
        elif e.get("name") == "thread_name":
            tid_names[(e.get("pid"), e.get("tid"))] = \
                e.get("args", {}).get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if any(k in n for k in ("TPU", "/device:", "Device"))
                and "Host" not in n}
    op_tracks = {(p, t) for (p, t), n in tid_names.items()
                 if p in dev_pids and "XLA Ops" in n}
    per_op = {}
    intervals = {}
    for e in evs:
        if e.get("ph") != "X":
            continue
        key = (e.get("pid"), e.get("tid"))
        if op_tracks and key not in op_tracks:
            continue
        if not op_tracks and e.get("pid") not in dev_pids:
            continue
        ts = float(e.get("ts", 0.0)) * 1e-6
        dur = float(e.get("dur", 0.0)) * 1e-6
        name = e.get("name", "?")
        per_op[name] = per_op.get(name, 0.0) + dur
        intervals.setdefault(key, []).append((ts, ts + dur))
    if not per_op:
        return None
    # busy = INTERVAL UNION per track, not sum of durations: control-flow
    # ops (`while.N`) appear as ENCLOSING events with their body's
    # custom calls nested inside — a plain sum double-counts the body
    # (measured: a 20-tick multistep chain summed to 32.9 ms of which
    # 16.4 ms was the while envelope over the same 16.5 ms of real work;
    # per-tick device time looked 2x the truth)
    busy = 0.0
    for key, iv in intervals.items():
        iv.sort()
        cur_s, cur_e = iv[0]
        for s, e_ in iv[1:]:
            if s > cur_e:
                busy += cur_e - cur_s
                cur_s, cur_e = s, e_
            else:
                cur_e = max(cur_e, e_)
        busy += cur_e - cur_s
    if busy == 0.0:
        return None
    top = sorted(per_op.items(), key=lambda kv: -kv[1])[:top_k]
    return busy, top
