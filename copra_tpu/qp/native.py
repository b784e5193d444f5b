"""ctypes binding to the native exact QP oracle (Goldfarb-Idnani).

The reference's exact solutions come from native active-set libraries
(qpOASES by default, ``/root/reference/src/solvers/utils.cpp:35-37``); this
module provides the same capability as an in-repo C++ library
(``native/activeset.cpp``) bound through ctypes — no pybind11 dependency.
Host-only and f64: used by tests to cross-validate the on-device ADMM
solver (the role of ``test/TestSolvers.cpp``'s cross-checks) and available
through the solver registry as ``"active_set"``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..errors import SolverError
from .types import (STATUS_MAX_ITER, STATUS_PRIMAL_INFEASIBLE, STATUS_SOLVED,
                    DenseQP, QPSolution, SolverOptions, WarmStart)

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libcopra_native.so")

_lib = None


def _load() -> ctypes.CDLL:
    """Load (building on first use) the native library."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        except (OSError, subprocess.CalledProcessError) as e:
            raise SolverError(
                f"could not build the native active-set solver: {e}")
    lib = ctypes.CDLL(_LIB_PATH)
    d = ctypes.POINTER(ctypes.c_double)
    lib.copra_active_set_solve.restype = ctypes.c_int
    lib.copra_active_set_solve.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        d, d, d, d, d, d, d, d,
        ctypes.c_int, ctypes.c_double,
        d, d, ctypes.POINTER(ctypes.c_int)]
    _lib = lib
    return lib


def native_available() -> bool:
    try:
        _load()
        return True
    except SolverError:
        return False


def _ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def solve_qp_native(qp: DenseQP, options: SolverOptions = SolverOptions(),
                    warm_start: Optional[WarmStart] = None) -> QPSolution:
    """Solve one QP exactly on host (f64).  ``warm_start`` is ignored —
    active-set solvers here always cold-start, like the reference's default
    qpOASES path (``src/solvers/qpOASESSolver.cpp:114-118``)."""
    del warm_start
    Q = np.ascontiguousarray(np.asarray(qp.Q, np.float64))
    c = np.ascontiguousarray(np.asarray(qp.c, np.float64))
    if Q.ndim != 2:
        raise SolverError("native solver is single-QP; vmap is not "
                          "supported — loop on host or use 'admm'.")
    n_check = Q.shape[0]
    for name, v in (("c", qp.c), ("lb", qp.lb), ("ub", qp.ub)):
        if np.asarray(v).shape != (n_check,):
            raise SolverError(
                f"native solver needs 1-D '{name}' of length {n_check}, got "
                f"shape {np.asarray(v).shape} (batched QPs: index one lane).")
    Aeq = np.ascontiguousarray(np.asarray(qp.Aeq, np.float64))
    beq = np.ascontiguousarray(np.asarray(qp.beq, np.float64))
    Aineq = np.ascontiguousarray(np.asarray(qp.Aineq, np.float64))
    bineq = np.ascontiguousarray(np.asarray(qp.bineq, np.float64))
    lb = np.ascontiguousarray(np.asarray(qp.lb, np.float64))
    ub = np.ascontiguousarray(np.asarray(qp.ub, np.float64))

    n = Q.shape[0]
    me, mi = Aeq.shape[0], Aineq.shape[0]
    x = np.zeros(n)
    obj = ctypes.c_double()
    n_active = ctypes.c_int()
    lib = _load()
    code = lib.copra_active_set_solve(
        n, me, mi, _ptr(Q), _ptr(c),
        _ptr(Aeq) if me else None, _ptr(beq) if me else None,
        _ptr(Aineq) if mi else None, _ptr(bineq) if mi else None,
        _ptr(lb), _ptr(ub),
        int(options.max_iter), float(max(options.eps_abs, 1e-12)),
        _ptr(x), ctypes.byref(obj), ctypes.byref(n_active))

    status = {0: STATUS_SOLVED, 1: STATUS_MAX_ITER,
              2: STATUS_PRIMAL_INFEASIBLE}.get(code, STATUS_MAX_ITER)
    m = me + mi + n
    xr = jnp.asarray(x)
    zeros = jnp.zeros((m,), xr.dtype)
    # KKT residuals for reporting
    viol = np.concatenate([
        np.abs(Aeq @ x - beq) if me else np.zeros(0),
        np.maximum(Aineq @ x - bineq, 0.0) if mi else np.zeros(0),
        np.maximum(x - ub, 0.0) + np.maximum(lb - x, 0.0)])
    rp = float(viol.max()) if viol.size else 0.0
    return QPSolution(x=xr, y=zeros, z=zeros,
                      status=jnp.asarray(status, jnp.int32),
                      iterations=jnp.asarray(int(n_active.value), jnp.int32),
                      primal_residual=jnp.asarray(rp, xr.dtype),
                      dual_residual=jnp.asarray(0.0, xr.dtype))
