"""Constraints lowering to dense-QP blocks.

TPU-native re-design of the reference constraint layer
(``/root/reference/include/copra/constraints.h:32-461``,
``src/constraints.cpp``).  Each constraint is an immutable pytree lowering
against the preview matrices into one of:

* equality rows ``A U = b``
* inequality rows ``A U <= b``
* box bounds ``lb <= U <= ub``

mirroring the reference's ``ConstraintFlag`` partition
(``constraints.h:32-37``).  Per-step modes are einsums over block views
instead of the reference's per-row loops.

Static-shape policy (TPU): the reference's data-dependent row filtering for
±inf trajectory bounds (``constraints.h:350-358``) becomes compile-time row
masking — masked rows lower to the trivially-satisfied ``0*U <= 1`` so every
shape stays static under jit/vmap.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .autospan import span_matrix, span_vector
from .errors import DimensionError, bad_trailing_dim, rows_mismatch
from .systems import Preview

Array = jax.Array


class ConstraintKind(enum.Enum):
    """Reference ``ConstraintFlag`` (``constraints.h:32-37``)."""

    EQUALITY = "eq"
    INEQUALITY = "ineq"
    BOUND = "bound"


class Constraint:
    """Common constraint API (reference ``copra::Constraint``,
    ``constraints.h:47-103``)."""

    name: str = "constraint"

    def kind(self) -> ConstraintKind:
        raise NotImplementedError

    def nr_constr(self, preview: Preview) -> int:
        """Number of (active) constraint rows — API parity with the
        reference's ``nrConstr()``."""
        raise NotImplementedError

    def auto_span(self) -> "Constraint":
        return self

    def validate(self, preview: Preview) -> None:
        """Shape validation (reference ``initializeConstraint``)."""

    def lower(self, preview: Preview, x0: Array):
        """Lower to ``(A, b)`` rows or ``(lb, ub)`` bounds."""
        raise NotImplementedError


def _kind_eq_ineq(is_inequality: bool) -> ConstraintKind:
    return (ConstraintKind.INEQUALITY if is_inequality
            else ConstraintKind.EQUALITY)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TrajectoryConstraint(Constraint):
    """``E X <= f`` (or ``= f``) over the stacked trajectory.

    Reference: ``copra::TrajectoryConstraint`` (``src/constraints.cpp:42-88``).
    Per-step mode constrains **every** block row of X including x_0 — the
    row count ``rows(E) * (N+1)`` is observable reference behavior.
    """

    E: Array
    f: Array
    is_inequality: bool = dataclasses.field(
        default=True, metadata=dict(static=True))
    name = "TrajectoryConstraint"

    @classmethod
    def create(cls, E, f, is_inequality: bool = True):
        return cls(E=jnp.atleast_2d(jnp.asarray(E)),
                   f=jnp.atleast_1d(jnp.asarray(f)),
                   is_inequality=bool(is_inequality))

    def kind(self) -> ConstraintKind:
        return _kind_eq_ineq(self.is_inequality)

    def auto_span(self) -> "TrajectoryConstraint":
        max_dim = max(self.E.shape[0], self.f.shape[0])
        return dataclasses.replace(self, E=span_matrix(self.E, max_dim),
                                   f=span_vector(self.f, max_dim))

    def validate(self, preview: Preview) -> None:
        if self.E.shape[0] != self.f.shape[0]:
            raise DimensionError(rows_mismatch("E", "f", self.E, self.f))
        if self.E.shape[1] not in (preview.xdim, preview.full_xdim):
            raise DimensionError(bad_trailing_dim(
                "E", self.E, preview.xdim, preview.full_xdim, "state"))

    def nr_constr(self, preview: Preview) -> int:
        if self.E.shape[1] == preview.xdim:
            return self.E.shape[0] * preview.nr_x_step
        return self.E.shape[0]

    def lower(self, preview: Preview, x0: Array) -> Tuple[Array, Array]:
        fr = preview.free_response(x0)
        if self.E.shape[1] == preview.xdim:  # per-step, x_0 included
            A = jnp.einsum("rx,kxU->krU", self.E, preview.psi_blocks())
            fr_blocks = fr.reshape(preview.nr_x_step, preview.xdim)
            b = self.f - jnp.einsum("rx,kx->kr", self.E, fr_blocks)
            m = self.E.shape[0] * preview.nr_x_step
            return A.reshape(m, preview.full_udim), b.reshape(m)
        return self.E @ preview.Psi, self.f - self.E @ fr


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ControlConstraint(Constraint):
    """``G U <= f`` (or ``= f``) on the control sequence.

    Reference: ``copra::ControlConstraint`` (``src/constraints.cpp:94-143``).
    No Phi/Psi dependence — constant across solves.
    """

    G: Array
    f: Array
    is_inequality: bool = dataclasses.field(
        default=True, metadata=dict(static=True))
    name = "ControlConstraint"

    @classmethod
    def create(cls, G, f, is_inequality: bool = True):
        return cls(G=jnp.atleast_2d(jnp.asarray(G)),
                   f=jnp.atleast_1d(jnp.asarray(f)),
                   is_inequality=bool(is_inequality))

    def kind(self) -> ConstraintKind:
        return _kind_eq_ineq(self.is_inequality)

    def auto_span(self) -> "ControlConstraint":
        max_dim = max(self.G.shape[0], self.f.shape[0])
        return dataclasses.replace(self, G=span_matrix(self.G, max_dim),
                                   f=span_vector(self.f, max_dim))

    def validate(self, preview: Preview) -> None:
        if self.G.shape[0] != self.f.shape[0]:
            raise DimensionError(rows_mismatch("G", "f", self.G, self.f))
        if self.G.shape[1] not in (preview.udim, preview.full_udim):
            raise DimensionError(bad_trailing_dim(
                "G", self.G, preview.udim, preview.full_udim, "input"))

    def nr_constr(self, preview: Preview) -> int:
        if self.G.shape[1] == preview.udim:
            return self.G.shape[0] * preview.nr_u_step
        return self.G.shape[0]

    def lower(self, preview: Preview, x0: Array) -> Tuple[Array, Array]:
        if self.G.shape[1] == preview.udim:  # block-diagonal placement
            eye = jnp.eye(preview.nr_u_step, dtype=self.G.dtype)
            A = jnp.kron(eye, self.G)
            b = jnp.tile(self.f, preview.nr_u_step)
            return A, b
        return self.G, self.f


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MixedConstraint(Constraint):
    """``E x_k + G u_k <= f`` (or ``= f``) jointly on state and input.

    Reference: ``copra::MixedConstraint`` (``src/constraints.cpp:149-205``).

    Parity/design note: the reference builds per-step rows by copying the
    shifted previous row block (``:191-192``), a Toeplitz shortcut that is
    only exact for LTI systems.  Here rows are assembled from the actual
    ``Psi`` blocks — identical for LTI, and *correct* (rather than silently
    wrong) for LTV systems.  Row k pairs state block k with input block k,
    k = 0..N-1 (terminal state excluded), matching the reference row count.
    """

    E: Array
    G: Array
    f: Array
    is_inequality: bool = dataclasses.field(
        default=True, metadata=dict(static=True))
    name = "MixedConstraint"

    @classmethod
    def create(cls, E, G, f, is_inequality: bool = True):
        return cls(E=jnp.atleast_2d(jnp.asarray(E)),
                   G=jnp.atleast_2d(jnp.asarray(G)),
                   f=jnp.atleast_1d(jnp.asarray(f)),
                   is_inequality=bool(is_inequality))

    def kind(self) -> ConstraintKind:
        return _kind_eq_ineq(self.is_inequality)

    def auto_span(self) -> "MixedConstraint":
        max_dim = max(self.E.shape[0], self.G.shape[0], self.f.shape[0])
        return dataclasses.replace(
            self, E=span_matrix(self.E, max_dim, add_cols=1),
            G=span_matrix(self.G, max_dim),
            f=span_vector(self.f, max_dim))

    def validate(self, preview: Preview) -> None:
        if self.E.shape[0] != self.f.shape[0]:
            raise DimensionError(rows_mismatch("E", "f", self.E, self.f))
        if self.G.shape[0] != self.f.shape[0]:
            raise DimensionError(rows_mismatch("G", "f", self.G, self.f))
        per_step = (self.E.shape[1] == preview.xdim
                    and self.G.shape[1] == preview.udim)
        full = (self.E.shape[1] == preview.full_xdim
                and self.G.shape[1] == preview.full_udim)
        if not (per_step or full):
            raise DimensionError(
                f"'E' {self.E.shape} / 'G' {self.G.shape} must be jointly "
                f"per-step ({preview.xdim}/{preview.udim}) or full-horizon "
                f"({preview.full_xdim}/{preview.full_udim}).")

    def nr_constr(self, preview: Preview) -> int:
        if self.E.shape[1] == preview.xdim:
            return self.E.shape[0] * preview.nr_u_step
        return self.E.shape[0]

    def lower(self, preview: Preview, x0: Array) -> Tuple[Array, Array]:
        fr = preview.free_response(x0)
        if self.E.shape[1] == preview.xdim:  # per-step
            psi = preview.psi_blocks()[:-1]          # row blocks 0..N-1
            A = jnp.einsum("rx,kxU->krU", self.E, psi)
            eye = jnp.eye(preview.nr_u_step, dtype=A.dtype)
            A = A + jnp.kron(eye, self.G).reshape(
                preview.nr_u_step, self.G.shape[0], preview.full_udim)
            fr_blocks = fr.reshape(preview.nr_x_step, preview.xdim)[:-1]
            b = self.f - jnp.einsum("rx,kx->kr", self.E, fr_blocks)
            m = self.E.shape[0] * preview.nr_u_step
            return A.reshape(m, preview.full_udim), b.reshape(m)
        return self.E @ preview.Psi + self.G, self.f - self.E @ fr


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TrajectoryBoundConstraint(Constraint):
    """``xl <= X <= xu`` lowered to inequality rows on U.

    Reference: ``copra::TrajectoryBoundConstraint``
    (``constraints.h:322-390``, ``src/constraints.cpp:211-278``).  The
    reference filters ±inf rows into a data-dependent row count at
    construction (``constraints.h:350-358``); on TPU the shape must be
    static, so every row is kept and infinite bounds are masked to the
    trivially-satisfied row ``0 * U <= 1``.  ``nr_constr`` still reports the
    finite count for API parity.

    Parity note: for *lower* bounds the reference assembles
    ``Psi_row U <= lower - delta`` (``src/constraints.cpp:255-258``), which
    encodes ``x <= lower`` — a latent sign bug never exercised by its tests
    (all in-tree lower bounds are -inf).  This implementation uses the
    mathematically correct ``-Psi_row U <= delta - lower``.
    """

    lower_bound: Array
    upper_bound: Array
    # Finiteness pattern as *static* metadata (hashable bool tuples) so the
    # lowering stays traceable under jit/vmap: the reference's equivalent is
    # the lowerLines_/upperLines_ index lists computed at construction
    # (constraints.h:350-358).
    finite_lower: tuple = dataclasses.field(
        default=(), metadata=dict(static=True))
    finite_upper: tuple = dataclasses.field(
        default=(), metadata=dict(static=True))
    name = "TrajectoryBoundConstraint"

    @classmethod
    def create(cls, lower, upper):
        lo = jnp.atleast_1d(jnp.asarray(lower))
        up = jnp.atleast_1d(jnp.asarray(upper))
        return cls(lower_bound=lo, upper_bound=up,
                   finite_lower=tuple(np.isfinite(np.asarray(lo)).tolist()),
                   finite_upper=tuple(np.isfinite(np.asarray(up)).tolist()))

    def kind(self) -> ConstraintKind:
        return ConstraintKind.INEQUALITY

    def auto_span(self) -> "TrajectoryBoundConstraint":
        max_dim = max(self.lower_bound.shape[0], self.upper_bound.shape[0])
        lo = span_vector(self.lower_bound, max_dim)
        up = span_vector(self.upper_bound, max_dim)
        n_lo = max_dim // self.lower_bound.shape[0]
        n_up = max_dim // self.upper_bound.shape[0]
        return dataclasses.replace(
            self, lower_bound=lo, upper_bound=up,
            finite_lower=self.finite_lower * n_lo,
            finite_upper=self.finite_upper * n_up)

    def validate(self, preview: Preview) -> None:
        if self.lower_bound.shape[0] != self.upper_bound.shape[0]:
            raise DimensionError(rows_mismatch(
                "lower", "upper", self.lower_bound, self.upper_bound))
        if self.lower_bound.shape[0] not in (preview.xdim,
                                             preview.full_xdim):
            raise DimensionError(bad_trailing_dim(
                "lower", self.lower_bound, preview.xdim, preview.full_xdim,
                "state"))

    def _masks(self) -> Tuple[np.ndarray, np.ndarray]:
        return (np.asarray(self.finite_lower, dtype=bool),
                np.asarray(self.finite_upper, dtype=bool))

    def nr_constr(self, preview: Preview) -> int:
        lo_m, up_m = self._masks()
        n = int(lo_m.sum() + up_m.sum())
        if self.lower_bound.shape[0] == preview.xdim:
            return n * preview.nr_x_step
        return n

    def lower(self, preview: Preview, x0: Array) -> Tuple[Array, Array]:
        fr = preview.free_response(x0)
        lo_mask, up_mask = self._masks()
        if self.lower_bound.shape[0] == preview.xdim:  # per-step
            psi = preview.Psi.reshape(preview.nr_x_step, preview.xdim,
                                      preview.full_udim)
            frb = fr.reshape(preview.nr_x_step, preview.xdim)
            lo = jnp.where(jnp.asarray(lo_mask), self.lower_bound, 0.0)
            up = jnp.where(jnp.asarray(up_mask), self.upper_bound, 0.0)
            # lower rows: -Psi_row U <= delta - lower   (masked -> 0 <= 1)
            A_lo = jnp.where(lo_mask[None, :, None], -psi, 0.0)
            b_lo = jnp.where(lo_mask[None, :], frb - lo, 1.0)
            # upper rows:  Psi_row U <= upper - delta
            A_up = jnp.where(up_mask[None, :, None], psi, 0.0)
            b_up = jnp.where(up_mask[None, :], up - frb, 1.0)
            m = preview.nr_x_step * preview.xdim
            A = jnp.concatenate([A_lo.reshape(m, preview.full_udim),
                                 A_up.reshape(m, preview.full_udim)])
            b = jnp.concatenate([b_lo.reshape(m), b_up.reshape(m)])
            return A, b
        # full-size: one row per finite entry of each side
        lo = jnp.where(jnp.asarray(lo_mask), self.lower_bound, 0.0)
        up = jnp.where(jnp.asarray(up_mask), self.upper_bound, 0.0)
        A_lo = jnp.where(lo_mask[:, None], -preview.Psi, 0.0)
        b_lo = jnp.where(lo_mask, fr - lo, 1.0)
        A_up = jnp.where(up_mask[:, None], preview.Psi, 0.0)
        b_up = jnp.where(up_mask, up - fr, 1.0)
        return (jnp.concatenate([A_lo, A_up]),
                jnp.concatenate([b_lo, b_up]))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ControlBoundConstraint(Constraint):
    """``ul <= U <= uu`` kept as true box bounds for the QP.

    Reference: ``copra::ControlBoundConstraint``
    (``src/constraints.cpp:284-328``): type ``BoundConstraint``, consumed
    directly by the solver's box projection — the ADMM-friendly form.
    """

    lower_bound: Array
    upper_bound: Array
    name = "ControlBoundConstraint"

    @classmethod
    def create(cls, lower, upper):
        return cls(lower_bound=jnp.atleast_1d(jnp.asarray(lower)),
                   upper_bound=jnp.atleast_1d(jnp.asarray(upper)))

    def kind(self) -> ConstraintKind:
        return ConstraintKind.BOUND

    def auto_span(self) -> "ControlBoundConstraint":
        max_dim = max(self.lower_bound.shape[0], self.upper_bound.shape[0])
        return dataclasses.replace(
            self, lower_bound=span_vector(self.lower_bound, max_dim),
            upper_bound=span_vector(self.upper_bound, max_dim))

    def validate(self, preview: Preview) -> None:
        if self.lower_bound.shape[0] != self.upper_bound.shape[0]:
            raise DimensionError(rows_mismatch(
                "lower", "upper", self.lower_bound, self.upper_bound))
        if self.lower_bound.shape[0] not in (preview.udim,
                                             preview.full_udim):
            raise DimensionError(bad_trailing_dim(
                "lower", self.lower_bound, preview.udim, preview.full_udim,
                "input"))

    def nr_constr(self, preview: Preview) -> int:
        return preview.full_udim

    def lower(self, preview: Preview, x0: Array) -> Tuple[Array, Array]:
        if self.lower_bound.shape[0] == preview.udim:  # per-step replicate
            return (jnp.tile(self.lower_bound, preview.nr_u_step),
                    jnp.tile(self.upper_bound, preview.nr_u_step))
        return self.lower_bound, self.upper_bound
