"""Cost functions lowering to dense-QP (Q, c) terms.

TPU-native re-design of the reference cost layer
(``/root/reference/include/copra/costFunctions.h:20-301``,
``src/costFunctions.cpp``).  Each cost is an immutable pytree; ``lower()`` is
a pure function ``(preview, x0) -> (Q, c)`` whose per-step modes are single
einsums over the ``[N(+1), x, ...]`` block views instead of the reference's
O(N) accumulation loops (``src/costFunctions.cpp:66-70,251-256``).

Cost convention (reference ``costFunctions.h:92-103``): every cost contributes
``Q`` and ``c`` such that the solver minimizes ``1/2 U^T Q U + c^T U``; the
assembled ``Q = (M Psi)^T W (M Psi)`` etc. makes this globally half the
weighted squared norm — argmin-invariant, reproduced exactly for parity.

Both entry modes of every reference cost are supported and selected by static
shape, per-step checked first (matches the reference's if-order, relevant when
``N == 1`` makes the sizes coincide, e.g. ``src/costFunctions.cpp:152-157``).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from .autospan import span_matrix, span_vector
from .errors import DimensionError, bad_trailing_dim, rows_mismatch
from .systems import Preview

Array = jax.Array


def _ones_like_rows(p) -> Array:
    return jnp.ones((jnp.asarray(p).shape[0],), jnp.asarray(p).dtype)


def _fit_weights(weights, target_len: int) -> Array:
    """Reference weight setter semantics (``costFunctions.h:59-72``): accept a
    same-length vector, or tile a divisor-length vector."""
    w = jnp.atleast_1d(jnp.asarray(weights))
    if w.shape[0] == target_len:
        return w
    if target_len % w.shape[0] == 0:
        return jnp.tile(w, target_len // w.shape[0])
    raise DimensionError(
        f"weights of length {w.shape[0]} cannot be fit to {target_len}.")


class CostFunction:
    """Common cost API (reference ``copra::CostFunction``,
    ``costFunctions.h:20-110``)."""

    name: str = "cost"
    weights: Array
    p: Array

    def with_weights(self, weights) -> "CostFunction":
        """Set a weight vector (tiling divisor lengths like the reference's
        ``weights()`` setter)."""
        return dataclasses.replace(
            self, weights=_fit_weights(weights, self.p.shape[0]))

    def with_weight(self, weight: float) -> "CostFunction":
        """Set a constant scalar weight (reference ``weight()`` setter)."""
        return dataclasses.replace(
            self, weights=jnp.full((self.p.shape[0],), weight,
                                   self.weights.dtype))

    def auto_span(self) -> "CostFunction":
        """Tile per-step members so all have matching full-horizon rows
        (reference ``autoSpan()``)."""
        return self

    def validate(self, preview: Preview) -> None:
        """Shape validation (reference ``initializeCost`` throws,
        ``src/costFunctions.cpp:43-57`` etc.)."""

    def lower(self, preview: Preview, x0: Array) -> Tuple[Array, Array]:
        """Lower against the preview matrices into ``(Q, c)``."""
        raise NotImplementedError


def _wq(tmp: Array, w: Array) -> Array:
    """``sum_k tmp_k^T diag(w) tmp_k`` for stacked ``tmp [K?, r, U]``."""
    if tmp.ndim == 2:
        return jnp.einsum("rU,r,rV->UV", tmp, w, tmp)
    return jnp.einsum("krU,r,krV->UV", tmp, w, tmp)


def _wc(resid: Array, w: Array, tmp: Array) -> Array:
    if tmp.ndim == 2:
        return jnp.einsum("r,r,rU->U", resid, w, tmp)
    return jnp.einsum("kr,r,krU->U", resid, w, tmp)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TrajectoryCost(CostFunction):
    """``(M X - p)^T W (M X - p)`` over the whole stacked trajectory.

    Reference: ``copra::TrajectoryCost`` (``costFunctions.h:117-142``,
    ``src/costFunctions.cpp:35-72``).  Per-step mode applies ``M`` to every
    block row of X (x_0 included).
    """

    M: Array
    p: Array
    weights: Array
    name = "TrajectoryCost"

    @classmethod
    def create(cls, M, p, weights=None) -> "TrajectoryCost":
        M = jnp.atleast_2d(jnp.asarray(M))
        p = jnp.atleast_1d(jnp.asarray(p))
        w = _ones_like_rows(p) if weights is None else _fit_weights(
            weights, p.shape[0])
        return cls(M=M, p=p, weights=w)

    def auto_span(self) -> "TrajectoryCost":
        max_dim = max(self.M.shape[0], self.p.shape[0], self.weights.shape[0])
        return dataclasses.replace(
            self, M=span_matrix(self.M, max_dim),
            p=span_vector(self.p, max_dim),
            weights=span_vector(self.weights, max_dim))

    def validate(self, preview: Preview) -> None:
        if self.M.shape[0] != self.p.shape[0]:
            raise DimensionError(rows_mismatch("M", "p", self.M, self.p))
        if self.M.shape[1] not in (preview.xdim, preview.full_xdim):
            raise DimensionError(bad_trailing_dim(
                "M", self.M, preview.xdim, preview.full_xdim, "state"))

    def lower(self, preview: Preview, x0: Array) -> Tuple[Array, Array]:
        fr = preview.free_response(x0)
        if self.M.shape[1] == preview.xdim:  # per-step
            tmp = jnp.einsum("rx,kxU->krU", self.M, preview.psi_blocks())
            fr_blocks = fr.reshape(preview.nr_x_step, preview.xdim)
            resid = jnp.einsum("rx,kx->kr", self.M, fr_blocks) - self.p
            return _wq(tmp, self.weights), _wc(resid, self.weights, tmp)
        tmp = self.M @ preview.Psi
        resid = self.M @ fr - self.p
        return _wq(tmp, self.weights), _wc(resid, self.weights, tmp)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SimpleTrajectoryCost(CostFunction):
    """TrajectoryCost with ``M = I`` — skips the M matmul.

    Reference: ``copra::SimpleTrajectoryCost`` (ANYbotics addition,
    ``src/costFunctions.cpp:78-111``).
    """

    p: Array
    weights: Array
    name = "SimpleTrajectoryCost"

    @classmethod
    def create(cls, p, weights=None) -> "SimpleTrajectoryCost":
        p = jnp.atleast_1d(jnp.asarray(p))
        w = _ones_like_rows(p) if weights is None else _fit_weights(
            weights, p.shape[0])
        return cls(p=p, weights=w)

    def auto_span(self) -> "SimpleTrajectoryCost":
        max_dim = max(self.p.shape[0], self.weights.shape[0])
        return dataclasses.replace(
            self, p=span_vector(self.p, max_dim),
            weights=span_vector(self.weights, max_dim))

    def validate(self, preview: Preview) -> None:
        if self.p.shape[0] not in (preview.xdim, preview.full_xdim):
            raise DimensionError(bad_trailing_dim(
                "p", self.p, preview.xdim, preview.full_xdim, "state"))

    def lower(self, preview: Preview, x0: Array) -> Tuple[Array, Array]:
        fr = preview.free_response(x0)
        if self.p.shape[0] == preview.xdim:  # per-step
            tmp = preview.psi_blocks()
            resid = fr.reshape(preview.nr_x_step, preview.xdim) - self.p
            return _wq(tmp, self.weights), _wc(resid, self.weights, tmp)
        w = self.weights
        Q = jnp.einsum("RU,R,RV->UV", preview.Psi, w, preview.Psi)
        c = ((fr - self.p) * w) @ preview.Psi
        return Q, c


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TargetCost(CostFunction):
    """Terminal cost ``(M x_N - p)^T W (M x_N - p)`` — bottom block row only.

    Reference: ``copra::TargetCost`` (``src/costFunctions.cpp:117-132``).
    ``M`` must be per-step sized; there is no full-size mode or autoSpan.
    """

    M: Array
    p: Array
    weights: Array
    name = "TargetCost"

    @classmethod
    def create(cls, M, p, weights=None) -> "TargetCost":
        M = jnp.atleast_2d(jnp.asarray(M))
        p = jnp.atleast_1d(jnp.asarray(p))
        w = _ones_like_rows(p) if weights is None else _fit_weights(
            weights, p.shape[0])
        return cls(M=M, p=p, weights=w)

    def validate(self, preview: Preview) -> None:
        if self.M.shape[0] != self.p.shape[0]:
            raise DimensionError(rows_mismatch("M", "p", self.M, self.p))
        if self.M.shape[1] != preview.xdim:
            raise DimensionError(
                f"'M' has shape {self.M.shape}; TargetCost applies to the "
                f"terminal state only, so its trailing dimension must equal "
                f"the per-step state dimension ({preview.xdim}).")

    def lower(self, preview: Preview, x0: Array) -> Tuple[Array, Array]:
        x = preview.xdim
        tmp = self.M @ preview.Psi[-x:]
        resid = self.M @ (preview.Phi[-x:] @ x0 + preview.xi[-x:]) - self.p
        return _wq(tmp, self.weights), _wc(resid, self.weights, tmp)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ControlCost(CostFunction):
    """``(N U - p)^T W (N U - p)`` on the control sequence.

    Reference: ``copra::ControlCost`` (``src/costFunctions.cpp:138-173``).
    Per-step mode is a block-diagonal Hessian built once from the small
    ``N^T W N`` (no Phi/Psi dependence).
    """

    N: Array
    p: Array
    weights: Array
    name = "ControlCost"

    @classmethod
    def create(cls, N, p, weights=None) -> "ControlCost":
        N = jnp.atleast_2d(jnp.asarray(N))
        p = jnp.atleast_1d(jnp.asarray(p))
        w = _ones_like_rows(p) if weights is None else _fit_weights(
            weights, p.shape[0])
        return cls(N=N, p=p, weights=w)

    def auto_span(self) -> "ControlCost":
        max_dim = max(self.N.shape[0], self.p.shape[0], self.weights.shape[0])
        return dataclasses.replace(
            self, N=span_matrix(self.N, max_dim),
            p=span_vector(self.p, max_dim),
            weights=span_vector(self.weights, max_dim))

    def validate(self, preview: Preview) -> None:
        if self.N.shape[0] != self.p.shape[0]:
            raise DimensionError(rows_mismatch("N", "p", self.N, self.p))
        if self.N.shape[1] not in (preview.udim, preview.full_udim):
            raise DimensionError(bad_trailing_dim(
                "N", self.N, preview.udim, preview.full_udim, "input"))

    def lower(self, preview: Preview, x0: Array) -> Tuple[Array, Array]:
        w = self.weights
        if self.N.shape[1] == preview.udim:  # per-step block diagonal
            small_q = jnp.einsum("ru,r,rv->uv", self.N, w, self.N)
            small_c = -jnp.einsum("r,r,ru->u", self.p, w, self.N)
            eye = jnp.eye(preview.nr_u_step, dtype=small_q.dtype)
            Q = jnp.kron(eye, small_q)
            c = jnp.tile(small_c, preview.nr_u_step)
            return Q, c
        Q = jnp.einsum("RU,R,RV->UV", self.N, w, self.N)
        c = -jnp.einsum("R,R,RU->U", self.p, w, self.N)
        return Q, c


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SimpleControlCost(CostFunction):
    """ControlCost with ``N = I`` — a purely diagonal term.

    Reference: ``copra::SimpleControlCost`` (ANYbotics addition,
    ``src/costFunctions.cpp:179-211``).
    """

    p: Array
    weights: Array
    name = "SimpleControlCost"

    @classmethod
    def create(cls, p, weights=None) -> "SimpleControlCost":
        p = jnp.atleast_1d(jnp.asarray(p))
        w = _ones_like_rows(p) if weights is None else _fit_weights(
            weights, p.shape[0])
        return cls(p=p, weights=w)

    def auto_span(self) -> "SimpleControlCost":
        max_dim = max(self.p.shape[0], self.weights.shape[0])
        return dataclasses.replace(
            self, p=span_vector(self.p, max_dim),
            weights=span_vector(self.weights, max_dim))

    def validate(self, preview: Preview) -> None:
        if self.p.shape[0] not in (preview.udim, preview.full_udim):
            raise DimensionError(bad_trailing_dim(
                "p", self.p, preview.udim, preview.full_udim, "input"))

    def lower(self, preview: Preview, x0: Array) -> Tuple[Array, Array]:
        if self.p.shape[0] == preview.udim:  # per-step
            w = jnp.tile(self.weights, preview.nr_u_step)
            p = jnp.tile(self.p, preview.nr_u_step)
        else:
            w, p = self.weights, self.p
        return jnp.diag(w), -(p * w)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MixedCost(CostFunction):
    """``(M X + N U - p)^T W (M X + N U - p)``.

    Reference: ``copra::MixedCost`` (``src/costFunctions.cpp:217-258``).
    Parity notes reproduced exactly:

    * per-step mode iterates the **N control steps**, pairing state block k
      with input block k — the terminal state ``x_N`` is *not* penalized
      (``src/costFunctions.cpp:251``, acknowledged by the reference tests at
      ``test/TestTimeInvariantSystems.cpp:195``);
    * ``auto_span`` pads ``M`` with one extra zero column-block because the X
      stack has one more block than U (``src/costFunctions.cpp:220``).
    """

    M: Array
    N: Array
    p: Array
    weights: Array
    name = "MixedCost"

    @classmethod
    def create(cls, M, N, p, weights=None) -> "MixedCost":
        M = jnp.atleast_2d(jnp.asarray(M))
        N = jnp.atleast_2d(jnp.asarray(N))
        p = jnp.atleast_1d(jnp.asarray(p))
        w = _ones_like_rows(p) if weights is None else _fit_weights(
            weights, p.shape[0])
        return cls(M=M, N=N, p=p, weights=w)

    def auto_span(self) -> "MixedCost":
        max_dim = max(self.M.shape[0], self.N.shape[0], self.p.shape[0],
                      self.weights.shape[0])
        return dataclasses.replace(
            self,
            M=span_matrix(self.M, max_dim, add_cols=1),
            N=span_matrix(self.N, max_dim),
            p=span_vector(self.p, max_dim),
            weights=span_vector(self.weights, max_dim))

    def validate(self, preview: Preview) -> None:
        if self.M.shape[0] != self.p.shape[0]:
            raise DimensionError(rows_mismatch("M", "p", self.M, self.p))
        if self.N.shape[0] != self.p.shape[0]:
            raise DimensionError(rows_mismatch("N", "p", self.N, self.p))
        per_step = (self.M.shape[1] == preview.xdim
                    and self.N.shape[1] == preview.udim)
        full = (self.M.shape[1] == preview.full_xdim
                and self.N.shape[1] == preview.full_udim)
        if not (per_step or full):
            raise DimensionError(
                f"'M' {self.M.shape} / 'N' {self.N.shape} must be jointly "
                f"per-step ({preview.xdim}/{preview.udim}) or full-horizon "
                f"({preview.full_xdim}/{preview.full_udim}).")

    def lower(self, preview: Preview, x0: Array) -> Tuple[Array, Array]:
        fr = preview.free_response(x0)
        w = self.weights
        if self.M.shape[1] == preview.xdim:  # per-step over N control steps
            Nn, u = preview.nr_u_step, preview.udim
            psi = preview.psi_blocks()[:-1]          # row blocks 0..N-1
            tmp = jnp.einsum("rx,kxU->krU", self.M, psi)
            # deposit N at column block k of row k via block-row selectors
            # sel_k = [0 ... I_u ... 0] (rows k*u..k*u+u-1 of I_{N*u}; the
            # earlier kron(..).reshape(Nn, Nn*u, u) form was only correct
            # for u == 1 — same bug class as condense_ltv, see
            # tests/test_autospan_errors.py::test_mixed_cost_multi_input)
            sel = jnp.eye(Nn * u, dtype=tmp.dtype).reshape(Nn, u, Nn * u)
            tmp = tmp + jnp.einsum("ru,kuU->krU", self.N, sel)
            fr_blocks = fr.reshape(preview.nr_x_step, preview.xdim)[:-1]
            resid = jnp.einsum("rx,kx->kr", self.M, fr_blocks) - self.p
            return _wq(tmp, w), _wc(resid, w, tmp)
        tmp = self.M @ preview.Psi + self.N
        resid = self.M @ fr - self.p
        return _wq(tmp, w), _wc(resid, w, tmp)
