"""copra-tpu: a TPU-native linear-MPC engine.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
ANYbotics/copra (C++ Eigen + qpOASES, mounted read-only at
``/root/reference``):

* condensed preview matrices (scan or log-depth associative scan),
  composable costs/constraints lowered into one dense QP;
* a batched on-device ADMM solver (full-precision matmuls, row
  normalization, adaptive rho, unconstrained seeding, active-set polish,
  infeasibility certificates) cross-validated against an in-repo C++
  exact active-set oracle (``native/``);
* a stagewise Riccati solver with serial, associative (O(log N)) and
  horizon-sharded sweeps;
* precompiled control plans for receding-horizon serving (x0-affine QP
  extraction, factorize-once ticks, host-f64 seed maps);
* scenario-DP / model-TP / horizon-SP parallel layers over device meshes;
* Pallas fused-iteration kernels; end-to-end differentiability.

See ``SURVEY.md`` for the structural analysis of the reference,
``PARITY.md`` for the component map, and ``docs/PERFORMANCE.md`` for the
measured numbers and the f32-numerics ground rules.
"""

from .autospan import span_matrix, span_vector
from .constraints import (Constraint, ConstraintKind, ControlBoundConstraint,
                          ControlConstraint, MixedConstraint,
                          TrajectoryBoundConstraint, TrajectoryConstraint)
from .costs import (ControlCost, CostFunction, MixedCost, SimpleControlCost,
                    SimpleTrajectoryCost, TargetCost, TrajectoryCost)
from .errors import (CopraError, DimensionError, InfeasibleProblemError,
                     InitializationError, SolverError)
from .mpc import HESSIAN_RIDGE, LMPC, MPCResult, build_qp, solve_mpc
from .solve import solve
from .plan import (ControlPlan, make_control_plan, make_plan_multistep,
                   make_plan_step, plan_qp, plan_trajectory)
from .qp.admm import solve_qp, solve_qp_batched
from .qp.riccati import (StagewiseQP, auto_iters_stagewise,
                         auto_rho_stagewise, lqr_solve, lqr_solve_assoc,
                         make_stagewise_multistep, make_stagewise_server,
                         make_stagewise_step,
                         scale_stagewise, solve_mpc_stagewise,
                         solve_stagewise, stack_stagewise,
                         stagewise_scales)
from .qp.registry import (available_solvers, get_solver, register_solver)
from .qp.types import (DenseQP, QPSolution, SolverOptions, WarmStart,
                       STATUS_MAX_ITER, STATUS_PRIMAL_INFEASIBLE,
                       STATUS_DUAL_INFEASIBLE, STATUS_SOLVED)
from .systems import (LTISystem, LTVSystem, Preview, condense, condense_lti,
                      condense_lti_assoc, condense_ltv, condense_ltv_assoc,
                      lti_as_ltv, replay_dynamics)

__version__ = "0.1.0"

__all__ = [
    "LMPC", "MPCResult", "build_qp", "solve_mpc", "solve", "HESSIAN_RIDGE",
    "ControlPlan", "make_control_plan", "make_plan_step",
    "make_plan_multistep", "plan_qp",
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
    "STATUS_SOLVED", "STATUS_MAX_ITER", "STATUS_PRIMAL_INFEASIBLE",
    "STATUS_DUAL_INFEASIBLE",
    "solve_qp", "solve_qp_batched", "register_solver", "get_solver",
    "available_solvers",
    "StagewiseQP", "lqr_solve", "lqr_solve_assoc", "solve_stagewise",
    "solve_mpc_stagewise", "make_stagewise_step", "make_stagewise_server",
    "make_stagewise_multistep", "stack_stagewise",
    "auto_rho_stagewise", "auto_iters_stagewise",
    "stagewise_scales", "scale_stagewise",
    "span_matrix", "span_vector",
    "CopraError", "DimensionError", "InitializationError", "SolverError",
    "InfeasibleProblemError",
]
