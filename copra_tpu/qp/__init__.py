"""Batched on-device dense QP solving (see ``admm.py``)."""

from .admm import solve_qp, solve_qp_batched, stack_constraints
from .registry import available_solvers, get_solver, register_solver
from .types import (DenseQP, QPSolution, SolverOptions, WarmStart,
                    STATUS_MAX_ITER, STATUS_PRIMAL_INFEASIBLE,
                    STATUS_DUAL_INFEASIBLE, STATUS_SOLVED)

__all__ = [
    "solve_qp", "solve_qp_batched", "stack_constraints",
    "register_solver", "get_solver", "available_solvers",
    "DenseQP", "QPSolution", "SolverOptions", "WarmStart",
    "STATUS_SOLVED", "STATUS_MAX_ITER", "STATUS_PRIMAL_INFEASIBLE",
    "STATUS_DUAL_INFEASIBLE",
]
