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
