"""System specifications and preview-matrix condensing.

TPU-native re-design of the reference's system/preview layer
(``/root/reference/include/copra/systems/System.h:29-102``,
``TimeInvariantSystem.h``, ``TimeVariantSystem.h``).  The reference holds
mutable Eigen matrices ``Phi/Psi/xi`` on a class and fills them with an O(N)
sequential loop of small matmuls plus O(N^2) block copies
(``src/systems/TimeInvariantSystem.cpp:54-68``,
``src/systems/TimeVariantSystem.cpp:17-56``).  Here a system is an immutable
pytree and condensing is a pure, jittable, vmappable function:

* ``Phi`` (state-transition stack) and ``xi`` (drift stack) come from a
  ``lax.scan`` over the horizon;
* the LTI ``Psi`` exploits its block-Toeplitz structure: one scan builds the
  impulse-response stack ``[B, AB, A^2 B, ...]`` and a single gather
  materializes all N*(N+1) blocks — no sequential block copies;
* the LTV ``Psi`` is a ``lax.scan`` carrying the growing row-block, the scan
  form of the reference recursion at
  ``src/systems/TimeVariantSystem.cpp:49-52``.

The algebraic contract is the reference's invariant
(``src/systems/TimeInvariantSystem.cpp:34-36``):

    X = Phi @ x0 + Psi @ U + xi,   with X = [x_0; x_1; ...; x_N]

so ``Phi`` is ``[(N+1)*x, x]`` with identity top block, ``Psi`` is
``[(N+1)*x, N*u]`` with a zero top block-row, and ``xi`` is ``[(N+1)*x]``
with a zero top block (``src/systems/System.cpp:11-34``).
"""

from __future__ import annotations

import dataclasses
from typing import Union

import jax
import jax.numpy as jnp
from jax import lax

from ._precision import highest_precision
from .errors import DimensionError, bad_dim

Array = jax.Array


def _as_array(x, dtype=None):
    return jnp.asarray(x, dtype=dtype)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LTISystem:
    """Linear time-invariant system ``x_{k+1} = A x_k + B u_k + d``.

    Reference analog: ``copra::TimeInvariantSystem``
    (``include/copra/systems/TimeInvariantSystem.h:29-98``).

    Attributes:
      A:  state matrix, ``[x, x]`` (leading batch dims allowed under vmap).
      B:  input matrix, ``[x, u]``.
      d:  drift vector, ``[x]``.
      x0: initial state, ``[x]``.
      horizon: number of control steps N (static).
    """

    A: Array
    B: Array
    d: Array
    x0: Array
    horizon: int = dataclasses.field(metadata=dict(static=True))

    @classmethod
    def create(cls, A, B, d, x0, horizon: int) -> "LTISystem":
        """Validating constructor (reference ctor checks at
        ``src/systems/TimeInvariantSystem.cpp:14-22``)."""
        A, B, d, x0 = map(_as_array, (A, B, d, x0))
        if A.ndim != 2 or A.shape[0] != A.shape[1]:
            raise DimensionError(f"'A' must be square, got shape {A.shape}.")
        x = A.shape[0]
        if B.ndim != 2 or B.shape[0] != x:
            raise DimensionError(
                f"'B' must have shape ({x}, u), got {B.shape}.")
        if d.shape != (x,):
            raise DimensionError(bad_dim("d", d, x))
        if x0.shape != (x,):
            raise DimensionError(bad_dim("x0", x0, x))
        if horizon < 1:
            raise DimensionError(f"'horizon' must be >= 1, got {horizon}.")
        return cls(A=A, B=B, d=d, x0=x0, horizon=int(horizon))

    # -- static dimension bookkeeping (reference System.h:93-101) --
    @property
    def xdim(self) -> int:
        return self.A.shape[-1]

    @property
    def udim(self) -> int:
        return self.B.shape[-1]

    @property
    def nr_u_step(self) -> int:
        return self.horizon

    @property
    def nr_x_step(self) -> int:
        return self.horizon + 1

    @property
    def full_xdim(self) -> int:
        return self.xdim * (self.horizon + 1)

    @property
    def full_udim(self) -> int:
        return self.udim * self.horizon

    def with_x0(self, x0) -> "LTISystem":
        """Functional analog of ``System::xInit`` (``System.h:62-68``)."""
        return dataclasses.replace(self, x0=jnp.asarray(x0))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LTVSystem:
    """Linear time-variant system ``x_{k+1} = A_k x_k + B_k u_k + d_k``.

    Reference analog: ``copra::TimeVariantSystem``
    (``include/copra/systems/TimeVariantSystem.h:29-109``).  Where the
    reference takes per-step ``std::function`` callbacks, the TPU design takes
    stacked arrays — the natural layout for batched device execution.

    Attributes:
      A:  stacked state matrices, ``[N, x, x]``.
      B:  stacked input matrices, ``[N, x, u]``.
      d:  stacked drift vectors, ``[N, x]``.
      x0: initial state, ``[x]``.
    """

    A: Array
    B: Array
    d: Array
    x0: Array

    @classmethod
    def create(cls, A, B, d, x0) -> "LTVSystem":
        A, B, d, x0 = map(_as_array, (A, B, d, x0))
        if A.ndim != 3 or A.shape[1] != A.shape[2]:
            raise DimensionError(
                f"'A' must have shape (N, x, x), got {A.shape}.")
        N, x = A.shape[0], A.shape[1]
        if B.ndim != 3 or B.shape[0] != N or B.shape[1] != x:
            raise DimensionError(
                f"'B' must have shape ({N}, {x}, u), got {B.shape}.")
        if d.shape != (N, x):
            raise DimensionError(
                f"'d' must have shape ({N}, {x}), got {d.shape}.")
        if x0.shape != (x,):
            raise DimensionError(bad_dim("x0", x0, x))
        return cls(A=A, B=B, d=d, x0=x0)

    @classmethod
    def from_step_fns(cls, state_fn, input_fn, drift_fn, x0, horizon: int
                      ) -> "LTVSystem":
        """Build the stacked arrays from per-step callables.

        API-parity helper for the reference's callback setters
        (``TimeVariantSystem.h:72-98``); evaluation happens once, on host.
        """
        A = jnp.stack([_as_array(state_fn(k)) for k in range(horizon)])
        B = jnp.stack([_as_array(input_fn(k)) for k in range(horizon)])
        d = jnp.stack([_as_array(drift_fn(k)) for k in range(horizon)])
        return cls.create(A, B, d, x0)

    @property
    def horizon(self) -> int:
        return self.A.shape[-3]

    @property
    def xdim(self) -> int:
        return self.A.shape[-1]

    @property
    def udim(self) -> int:
        return self.B.shape[-1]

    @property
    def nr_u_step(self) -> int:
        return self.horizon

    @property
    def nr_x_step(self) -> int:
        return self.horizon + 1

    @property
    def full_xdim(self) -> int:
        return self.xdim * (self.horizon + 1)

    @property
    def full_udim(self) -> int:
        return self.udim * self.horizon

    def with_x0(self, x0) -> "LTVSystem":
        return dataclasses.replace(self, x0=jnp.asarray(x0))


System = Union[LTISystem, LTVSystem]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Preview:
    """Condensed preview matrices: ``X = Phi @ x0 + Psi @ U + xi``.

    Reference analog: the ``Phi/Psi/xi`` members of ``copra::System``
    (``include/copra/systems/System.h:93-99``).

    Attributes:
      Phi: ``[(N+1)*x, x]`` state-transition stack (top block identity).
      Psi: ``[(N+1)*x, N*u]`` input-response stack (top block-row zero).
      xi:  ``[(N+1)*x]`` drift stack (top block zero).
      xdim/udim/horizon: static dims.
    """

    Phi: Array
    Psi: Array
    xi: Array
    xdim: int = dataclasses.field(metadata=dict(static=True))
    udim: int = dataclasses.field(metadata=dict(static=True))
    horizon: int = dataclasses.field(metadata=dict(static=True))

    @property
    def nr_x_step(self) -> int:
        return self.horizon + 1

    @property
    def nr_u_step(self) -> int:
        return self.horizon

    @property
    def full_xdim(self) -> int:
        return self.xdim * (self.horizon + 1)

    @property
    def full_udim(self) -> int:
        return self.udim * self.horizon

    # Block accessors used by the cost/constraint lowering.
    def phi_blocks(self) -> Array:
        """``[(N+1), x, x]`` view of Phi."""
        return self.Phi.reshape(self.nr_x_step, self.xdim, self.xdim)

    def psi_blocks(self) -> Array:
        """``[(N+1), x, N*u]`` view of Psi (row blocks)."""
        return self.Psi.reshape(self.nr_x_step, self.xdim, self.full_udim)

    def xi_blocks(self) -> Array:
        """``[(N+1), x]`` view of xi."""
        return self.xi.reshape(self.nr_x_step, self.xdim)

    def free_response(self, x0: Array) -> Array:
        """``Phi @ x0 + xi`` — the input-free trajectory, ``[(N+1)*x]``."""
        return self.Phi @ x0 + self.xi

    def trajectory(self, x0: Array, U: Array) -> Array:
        """Reconstruct ``X`` from a control sequence
        (reference ``LMPC::trajectory``, ``src/LMPC.cpp:140-143``)."""
        return self.Phi @ x0 + self.Psi @ U + self.xi


@highest_precision
def condense_lti(A: Array, B: Array, d: Array, horizon: int) -> Preview:
    """Condense an LTI system over ``horizon`` steps.

    Replaces the reference's sequential build at
    ``src/systems/TimeInvariantSystem.cpp:32-71``:

    * ``Phi``/``xi``/impulse stack via one ``lax.scan`` (O(N) depth, three
      small matmuls per step);
    * ``Psi`` via a single Toeplitz gather of the impulse stack — the
      vectorized form of the reference's block-copy loop (``:63-66``).
    """
    A = jnp.asarray(A)
    B = jnp.asarray(B)
    d = jnp.asarray(d)
    N = int(horizon)
    x, u = A.shape[0], B.shape[1]
    dtype = jnp.result_type(A, B, d)

    def step(carry, _):
        phi_k, xi_k, imp_k = carry
        phi_n = A @ phi_k           # A^{k+1}
        xi_n = A @ xi_k + d         # drift accumulation
        imp_n = A @ imp_k           # A^{k+1} B
        return (phi_n, xi_n, imp_n), (phi_n, xi_n, imp_k)

    init = (jnp.eye(x, dtype=dtype), jnp.zeros((x,), dtype), B.astype(dtype))
    _, (phis, xis, imps) = lax.scan(step, init, None, length=N)
    # phis: [N, x, x] = A^1..A^N ; xis: [N, x] ; imps: [N, x, u] = B..A^{N-1}B

    Phi = jnp.concatenate([jnp.eye(x, dtype=dtype)[None], phis], axis=0)
    xi = jnp.concatenate([jnp.zeros((1, x), dtype), xis], axis=0)

    # Toeplitz gather: Psi block (i, j) = imps[i-1-j] for 0 <= i-1-j < N.
    imps_pad = jnp.concatenate([imps, jnp.zeros((1, x, u), dtype)], axis=0)
    i_idx = jnp.arange(N + 1)[:, None]
    j_idx = jnp.arange(N)[None, :]
    k = i_idx - 1 - j_idx                      # [(N+1), N]
    k = jnp.where((k >= 0) & (k < N), k, N)    # out-of-band -> zero block
    blocks = imps_pad[k]                       # [(N+1), N, x, u]
    Psi = blocks.transpose(0, 2, 1, 3).reshape((N + 1) * x, N * u)

    return Preview(Phi=Phi.reshape((N + 1) * x, x), Psi=Psi,
                   xi=xi.reshape((N + 1) * x), xdim=x, udim=u, horizon=N)


@highest_precision
def condense_ltv(A: Array, B: Array, d: Array) -> Preview:
    """Condense an LTV system from stacked ``A:[N,x,x] B:[N,x,u] d:[N,x]``.

    Scan form of the reference recursion at
    ``src/systems/TimeVariantSystem.cpp:17-56``: the carry holds
    ``(Phi_k, Psi-row-block_k, xi_k)`` and each step applies ``A_k`` to the
    whole row block then deposits ``B_k`` into column block ``k``.
    """
    A = jnp.asarray(A)
    B = jnp.asarray(B)
    d = jnp.asarray(d)
    N, x = A.shape[0], A.shape[1]
    u = B.shape[2]
    dtype = jnp.result_type(A, B, d)

    # block-row selectors, [N, u, N*u]: sel_k = [0 ... I_u ... 0] deposits
    # B_k at block column k.  (I.reshape(N, u, N*u)[k] IS rows k*u..k*u+u-1
    # of I_{N*u}; the earlier kron(..).reshape(N, N*u, u) form was only
    # correct for u == 1 — caught by tests/test_fuzz_frontend.py.)
    sel = jnp.eye(N * u, dtype=dtype).reshape(N, u, N * u)

    def step(carry, inp):
        phi_k, psi_k, xi_k = carry
        A_k, B_k, d_k, sel_k = inp
        phi_n = A_k @ phi_k
        psi_n = A_k @ psi_k + B_k @ sel_k
        xi_n = A_k @ xi_k + d_k
        return (phi_n, psi_n, xi_n), (phi_n, psi_n, xi_n)

    init = (jnp.eye(x, dtype=dtype), jnp.zeros((x, N * u), dtype),
            jnp.zeros((x,), dtype))
    _, (phis, psis, xis) = lax.scan(step, init, (A.astype(dtype),
                                                 B.astype(dtype),
                                                 d.astype(dtype), sel))

    Phi = jnp.concatenate([jnp.eye(x, dtype=dtype)[None], phis], axis=0)
    Psi = jnp.concatenate([jnp.zeros((1, x, N * u), dtype), psis], axis=0)
    xi = jnp.concatenate([jnp.zeros((1, x), dtype), xis], axis=0)
    return Preview(Phi=Phi.reshape((N + 1) * x, x),
                   Psi=Psi.reshape((N + 1) * x, N * u),
                   xi=xi.reshape((N + 1) * x), xdim=x, udim=u, horizon=N)


@highest_precision
def condense_lti_assoc(A: Array, B: Array, d: Array, horizon: int) -> Preview:
    """O(log N)-depth LTI condensing via ``lax.associative_scan``.

    The horizon-parallel (sequence-parallel) variant of
    :func:`condense_lti`: the affine recursion ``x_{k+1} = A x_k + d``
    composes associatively as ``(A2, b2) ∘ (A1, b1) = (A2 A1, A2 b1 + b2)``,
    so Φ/ξ and the impulse stack build in log-depth instead of the
    reference's N sequential steps (``src/systems/TimeInvariantSystem.cpp:
    54-68``).  Same Toeplitz gather for Ψ.
    """
    A = jnp.asarray(A)
    B = jnp.asarray(B)
    d = jnp.asarray(d)
    N = int(horizon)
    x, u = A.shape[0], B.shape[1]
    dtype = jnp.result_type(A, B, d)

    def combine(left, right):
        A1, b1 = left
        A2, b2 = right
        return A2 @ A1, jnp.einsum("...ij,...j->...i", A2, b1) + b2

    As = jnp.broadcast_to(A.astype(dtype), (N, x, x))
    ds = jnp.broadcast_to(d.astype(dtype), (N, x))
    phis, xis = lax.associative_scan(combine, (As, ds), axis=0)
    # phis[k] = A^{k+1}, xis[k] = sum_{i<=k} A^i d
    imps = jnp.concatenate([B.astype(dtype)[None],
                            jnp.einsum("kij,ju->kiu", phis[:-1],
                                       B.astype(dtype))], axis=0)

    Phi = jnp.concatenate([jnp.eye(x, dtype=dtype)[None], phis], axis=0)
    xi = jnp.concatenate([jnp.zeros((1, x), dtype), xis], axis=0)

    imps_pad = jnp.concatenate([imps, jnp.zeros((1, x, u), dtype)], axis=0)
    i_idx = jnp.arange(N + 1)[:, None]
    j_idx = jnp.arange(N)[None, :]
    k = i_idx - 1 - j_idx
    k = jnp.where((k >= 0) & (k < N), k, N)
    Psi = imps_pad[k].transpose(0, 2, 1, 3).reshape((N + 1) * x, N * u)
    return Preview(Phi=Phi.reshape((N + 1) * x, x), Psi=Psi,
                   xi=xi.reshape((N + 1) * x), xdim=x, udim=u, horizon=N)


@highest_precision
def condense_ltv_assoc(A: Array, B: Array, d: Array) -> Preview:
    """O(log N)-depth LTV condensing via ``lax.associative_scan``.

    The full recursion carried by :func:`condense_ltv` — including the
    growing Ψ row-block — is an associative composition of pairs
    ``(A_k, U_k)`` acting as ``psi -> A_k psi + U_k`` with
    ``U_k = B_k e_k^T``: log-depth, large MXU-friendly matmuls per level
    (O(log N) more flops than the serial scan, fully parallel — the right
    trade on TPU for long horizons; SURVEY.md §5 long-context item).
    """
    A = jnp.asarray(A)
    B = jnp.asarray(B)
    d = jnp.asarray(d)
    N, x = A.shape[0], A.shape[1]
    u = B.shape[2]
    dtype = jnp.result_type(A, B, d)

    # inhomogeneous terms: [xi_k | Psi-row_k] stacked as one [x, 1+N*u] block
    # (same block-row selector as condense_ltv: correct for every u)
    sel = jnp.eye(N * u, dtype=dtype).reshape(N, u, N * u)
    U = jnp.einsum("kxu,kuU->kxU", B.astype(dtype), sel)   # [N, x, N*u]
    rhs = jnp.concatenate([d.astype(dtype)[:, :, None], U], axis=2)

    def combine(left, right):
        A1, U1 = left
        A2, U2 = right
        return A2 @ A1, A2 @ U1 + U2

    phis, outs = lax.associative_scan(combine, (A.astype(dtype), rhs), axis=0)
    xis = outs[:, :, 0]
    psis = outs[:, :, 1:]

    Phi = jnp.concatenate([jnp.eye(x, dtype=dtype)[None], phis], axis=0)
    Psi = jnp.concatenate([jnp.zeros((1, x, N * u), dtype), psis], axis=0)
    xi = jnp.concatenate([jnp.zeros((1, x), dtype), xis], axis=0)
    return Preview(Phi=Phi.reshape((N + 1) * x, x),
                   Psi=Psi.reshape((N + 1) * x, N * u),
                   xi=xi.reshape((N + 1) * x), xdim=x, udim=u, horizon=N)


def condense(system: System, method: str = "scan") -> Preview:
    """Condense either system kind (reference ``System::update()``,
    ``System.h:57``). Pure function — no dirty flag needed.

    ``method``: ``"scan"`` (serial O(N) depth, minimal flops) or
    ``"assoc"`` (``lax.associative_scan``, O(log N) depth — the
    horizon-parallel path for long horizons).
    """
    if isinstance(system, LTISystem):
        fn = condense_lti if method == "scan" else condense_lti_assoc
        return fn(system.A, system.B, system.d, system.horizon)
    if isinstance(system, LTVSystem):
        fn = condense_ltv if method == "scan" else condense_ltv_assoc
        return fn(system.A, system.B, system.d)
    raise TypeError(f"unknown system type: {type(system)!r}")


def lti_as_ltv(system: LTISystem) -> LTVSystem:
    """Broadcast an LTI system into the stacked LTV layout (the reference's
    LTV-with-constant-matrices equivalence oracle,
    ``test/TestTimeVariantSystems.cpp:47-86``)."""
    N = system.horizon
    return LTVSystem(
        A=jnp.broadcast_to(system.A, (N,) + system.A.shape),
        B=jnp.broadcast_to(system.B, (N,) + system.B.shape),
        d=jnp.broadcast_to(system.d, (N,) + system.d.shape),
        x0=system.x0,
    )


def replay_dynamics(system: System, X: Array, U: Array) -> Array:
    """Max dynamics-consistency residual ``max_k |x_{k+1} - A_k x_k - B_k u_k - d_k|``.

    The reference tests use this as their strongest oracle
    (``test/TestTimeInvariantSystems.cpp:1172-1176``, tolerance 1e-10).
    """
    x = system.xdim
    u = system.udim
    N = system.horizon
    Xb = X.reshape(N + 1, x)
    Ub = U.reshape(N, u)
    if isinstance(system, LTISystem):
        pred = Xb[:-1] @ system.A.T + Ub @ system.B.T + system.d
    else:
        pred = (jnp.einsum("kij,kj->ki", system.A, Xb[:-1])
                + jnp.einsum("kij,kj->ki", system.B, Ub) + system.d)
    return jnp.max(jnp.abs(Xb[1:] - pred))
