"""Matmul-precision control.

On TPU, f32 matmuls default to lower-precision MXU passes (~bf16 inputs),
which injects ~1e-2 relative error per matvec — fatal for a QP solver
iterating against 1e4-conditioned operators.  Every numerical entry point
of the library runs under ``jax.default_matmul_precision("highest")`` via
this decorator (the setting is baked in at trace time, so it never leaks
into user code).
"""

from __future__ import annotations

import functools
import os

import jax

# "highest" = full f32 (6 bf16 MXU passes), "high" = 3 passes (~1e-6
# relative per dot).  Overridable for speed/accuracy experiments.
MATMUL_PRECISION = os.environ.get("COPRA_MATMUL_PRECISION", "highest")


def highest_precision(fn):
    """Trace ``fn`` with full-f32 matmul precision."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision(MATMUL_PRECISION):
            return fn(*args, **kwargs)

    return wrapped
