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


register_solver("admm", solve_qp)
register_solver("default", solve_qp)
