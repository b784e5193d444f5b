"""Per-step → full-horizon tiling helpers.

Reference analog: ``copra::AutoSpan``
(``/root/reference/include/copra/AutoSpan.h:34-43``,
``src/AutoSpan.cpp:10-41``): tile a one-step matrix block-diagonally (with
optional extra zero column-blocks for the X-vs-U one-block misalignment) or
repeat a one-step vector until a requested full dimension is reached.

On TPU most spanning is replaced by broadcasting over a leading ``[N]`` axis
inside the lowering einsums, but the explicit utility is kept for API parity
and for the full-size entry modes.
"""

from __future__ import annotations

import jax.numpy as jnp
import jax.scipy.linalg as jsl

from .errors import DimensionError


def span_matrix(mat, new_dim: int, add_cols: int = 0):
    """Tile ``mat`` block-diagonally until its row count reaches ``new_dim``.

    ``add_cols`` appends that many extra zero column-blocks — used when a
    state-side matrix must align against the one-block-longer X stack
    (reference ``src/AutoSpan.cpp:10-27`` and the MixedCost usage at
    ``src/costFunctions.cpp:220``).
    """
    mat = jnp.asarray(mat)
    rows = mat.shape[0]
    if new_dim == rows:
        return mat
    if new_dim % rows != 0:
        raise DimensionError(
            f"cannot span matrix with {rows} rows to {new_dim} rows: "
            f"{new_dim} is not a multiple of {rows}.")
    n = new_dim // rows
    out = jsl.block_diag(*([mat] * n))
    if add_cols:
        pad = jnp.zeros((out.shape[0], add_cols * mat.shape[1]), out.dtype)
        out = jnp.concatenate([out, pad], axis=1)
    return out


def span_vector(vec, new_dim: int):
    """Repeat ``vec`` until its length reaches ``new_dim``
    (reference ``src/AutoSpan.cpp:29-41``)."""
    vec = jnp.asarray(vec)
    rows = vec.shape[0]
    if new_dim == rows:
        return vec
    if new_dim % rows != 0:
        raise DimensionError(
            f"cannot span vector of length {rows} to {new_dim}: "
            f"{new_dim} is not a multiple of {rows}.")
    return jnp.tile(vec, new_dim // rows)
