"""copra-tpu: a TPU-native linear-MPC engine.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
ANYbotics/copra (C++ Eigen + qpOASES, mounted read-only at
``/root/reference``): condensed preview matrices, composable costs and
constraints lowered into one dense QP, and a batched on-device ADMM solver
with warm starts and active-set polish — jittable, vmappable, and sharded
over device meshes.  See ``SURVEY.md`` for the structural analysis of the
reference and the parity contract.
"""

from .autospan import span_matrix, span_vector
from .constraints import (Constraint, ConstraintKind, ControlBoundConstraint,
                          ControlConstraint, MixedConstraint,
                          TrajectoryBoundConstraint, TrajectoryConstraint)
from .costs import (ControlCost, CostFunction, MixedCost, SimpleControlCost,
                    SimpleTrajectoryCost, TargetCost, TrajectoryCost)
from .errors import (CopraError, DimensionError, InitializationError,
                     SolverError)
from .mpc import HESSIAN_RIDGE, LMPC, MPCResult, build_qp, solve_mpc
from .plan import (ControlPlan, make_control_plan, make_plan_step, plan_qp,
                   plan_trajectory)
from .qp.admm import solve_qp, solve_qp_batched
from .qp.riccati import (StagewiseQP, lqr_solve, lqr_solve_assoc,
                         solve_mpc_stagewise, solve_stagewise)
from .qp.registry import (available_solvers, get_solver, register_solver)
from .qp.types import (DenseQP, QPSolution, SolverOptions, WarmStart,
                       STATUS_MAX_ITER, STATUS_SOLVED)
from .systems import (LTISystem, LTVSystem, Preview, condense, condense_lti,
                      condense_lti_assoc, condense_ltv, condense_ltv_assoc,
                      lti_as_ltv, replay_dynamics)

__version__ = "0.1.0"

__all__ = [
    "LMPC", "MPCResult", "build_qp", "solve_mpc", "HESSIAN_RIDGE",
    "ControlPlan", "make_control_plan", "make_plan_step", "plan_qp",
    "plan_trajectory",
    "LTISystem", "LTVSystem", "Preview", "condense", "condense_lti",
    "condense_lti_assoc", "condense_ltv", "condense_ltv_assoc",
    "lti_as_ltv", "replay_dynamics",
    "CostFunction", "TrajectoryCost", "SimpleTrajectoryCost", "TargetCost",
    "ControlCost", "SimpleControlCost", "MixedCost",
    "Constraint", "ConstraintKind", "TrajectoryConstraint",
    "ControlConstraint", "MixedConstraint", "TrajectoryBoundConstraint",
    "ControlBoundConstraint",
    "DenseQP", "QPSolution", "SolverOptions", "WarmStart",
    "STATUS_SOLVED", "STATUS_MAX_ITER",
    "solve_qp", "solve_qp_batched", "register_solver", "get_solver",
    "available_solvers",
    "StagewiseQP", "lqr_solve", "lqr_solve_assoc", "solve_stagewise",
    "solve_mpc_stagewise",
    "span_matrix", "span_vector",
    "CopraError", "DimensionError", "InitializationError", "SolverError",
]
