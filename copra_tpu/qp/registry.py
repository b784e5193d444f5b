"""Solver registry.

Reference analog: ``SolverFlag`` + ``solverFactory``
(``/root/reference/include/copra/solvers/utils.h:40-66``,
``src/solvers/utils.cpp:10-41``).  The compile-time-gated C++ enum becomes a
string-keyed registry of jittable solve functions; the default is the
on-device batched ADMM (the reference's DEFAULT is qpOASES,
``src/solvers/utils.cpp:35-37``).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

from ..errors import SolverError
from .admm import solve_qp
from .types import DenseQP, QPSolution, SolverOptions, WarmStart

SolveFn = Callable[..., QPSolution]

_REGISTRY: Dict[str, SolveFn] = {}

DEFAULT_SOLVER = "admm"


def register_solver(name: str, fn: SolveFn) -> None:
    """Register a solver callable ``(qp, options, warm_start) -> QPSolution``
    (reference analog: ``LMPC::useSolver`` injection, ``src/LMPC.cpp:98-101``).
    """
    _REGISTRY[name] = fn


def get_solver(name: Optional[str] = None) -> SolveFn:
    key = name or DEFAULT_SOLVER
    if key not in _REGISTRY:
        raise SolverError(
            f"unknown QP solver '{key}'; available: {sorted(_REGISTRY)}")
    return _REGISTRY[key]


def available_solvers():
    return sorted(_REGISTRY)


def _active_set(qp: DenseQP, options: SolverOptions = SolverOptions(),
                warm_start: Optional[WarmStart] = None) -> QPSolution:
    """Exact native (C++ Goldfarb-Idnani) oracle — host-only, f64,
    cold-start; see ``copra_tpu.qp.native``."""
    from .native import solve_qp_native
    return solve_qp_native(qp, options, warm_start)


# host_only: the LMPC facade must not jit this path (ctypes callback)
_active_set.host_only = True  # type: ignore[attr-defined]

register_solver("admm", solve_qp)
register_solver("default", solve_qp)
register_solver("active_set", _active_set)
