"""Dimension-diagnostic exceptions.

TPU-native re-design of the reference's error machinery
(``/root/reference/include/copra/debugUtils.h:26-36`` ``fancy_throw`` and the
message helpers in ``/root/reference/src/debugUtils.cpp:12-113``): the C++
library throws ``std::domain_error`` / ``std::runtime_error`` with file/line
context and a precise description of which operand had which shape.  Here the
same diagnostics are plain Python exceptions; traceback context replaces the
file/line prefix.
"""

from __future__ import annotations


class CopraError(Exception):
    """Base class for all copra-tpu errors."""


class DimensionError(CopraError, ValueError):
    """Shape mismatch between user inputs and the system dimensions.

    Mirrors the reference's ``std::domain_error`` usages
    (``/root/reference/src/debugUtils.cpp:12-113``).
    """


class InitializationError(CopraError, RuntimeError):
    """Object used before/after its valid lifecycle point.

    Mirrors the reference's ``std::runtime_error`` on double initialization of
    move-semantics constraints (``/root/reference/src/constraints.cpp:103-104``)
    and on double ``System.update()`` (``src/systems/TimeInvariantSystem.cpp:38-40``).
    """


class SolverError(CopraError, RuntimeError):
    """QP backend failure (unknown solver name, invalid options...)."""


class InfeasibleProblemError(CopraError, ValueError):
    """Problem data is provably infeasible at build time.

    Raised where a contradiction is visible before any solve runs — e.g.
    a trajectory-constraint row on the FIXED initial state ``x_0`` that
    the given ``x_0`` violates (the reference constrains ``x_0`` too,
    ``/root/reference/src/constraints.cpp:68-79``, and its QP correctly
    reports infeasible; our stagewise builder validates instead of
    silently dropping the row).
    """


def _shape(arr) -> tuple:
    return tuple(getattr(arr, "shape", ()))


def rows_mismatch(name1: str, name2: str, arr1, arr2) -> str:
    """Two operands that must have the same leading dimension do not.

    Reference analog: ``throwMsgOnRowsAskAutoSpan`` (``src/debugUtils.cpp``).
    """
    return (
        f"'{name1}' and '{name2}' must have the same number of rows, got "
        f"{_shape(arr1)} and {_shape(arr2)}. If one is a per-step quantity and "
        f"the other a full-horizon quantity, call auto_span() first."
    )


def bad_trailing_dim(name: str, arr, expected_step: int, expected_full: int,
                     what: str) -> str:
    """An operand's trailing dim matches neither the per-step nor full size.

    Reference analog: ``throwMsgOnColsOnPSXDim`` / ``...UDim`` / ``...XUDim``.
    """
    return (
        f"'{name}' has shape {_shape(arr)}; its trailing dimension must be "
        f"either the per-step {what} dimension ({expected_step}) or the "
        f"full-horizon {what} dimension ({expected_full})."
    )


def bad_dim(name: str, arr, expected: int) -> str:
    """An operand's leading dimension does not match ``expected``.

    Reference analog: ``throwMsgOnRowsOnDim``.
    """
    return (
        f"'{name}' has shape {_shape(arr)}; expected leading dimension "
        f"{expected}."
    )
