"""Double-f32 ("df32") compensated arithmetic for TPU-native refinement.

A value is carried as an unevaluated sum ``hi + lo`` of two f32 arrays
(|lo| <= ulp(hi)/2), giving ~48 effective mantissa bits from pure f32
VPU ops — no emulated f64 (which XLA lowers to ~0.25 ms per elementwise
pass on TPU, docs/PERFORMANCE.md) and no MXU bf16 passes.

Used by the stagewise df32 polish (:mod:`.df32_polish`): the fused f32
tick kernel's accuracy floor is ~2e-5 for 1e4-curvature MPC problems —
measured to be rounding-driven three ways at once (gain quantization
6.7e-6, product rounding 6.1e-6, carry rounding 3.6e-6 on the config-1
workload), each independently above the 1e-5 contract.  The same
iteration in df32 reaches 1.3e-12.

Algorithms: Knuth TwoSum, Veltkamp split + Dekker TwoProd (no FMA on
the VPU), and the usual double-double add/mul compositions (Hida-Li-
Bailey style, sloppy variant — adequate here because every polish
value is O(problem scale), never catastrophically cancelled).

All functions are shape-polymorphic elementwise jnp ops: safe inside
jit/vmap/scan on any backend.  XLA does not reassociate f32 adds, so
TwoSum's error recovery survives compilation (verified against exact
f64 in tests/test_df32_polish.py, CPU and interpreter).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

Array = jnp.ndarray

# Veltkamp split constant for f32: 2^12 + 1 (24-bit mantissa -> 12+12)
_SPLIT = 4097.0


def _c(v, ref):
    """dtype-pinned scalar (repo-wide kernel gotcha: bare Python floats
    promote to f64 under jax_enable_x64)."""
    return jnp.asarray(v, ref.dtype)


def two_sum(a: Array, b: Array) -> Tuple[Array, Array]:
    """Error-free sum: a + b == s + e exactly (Knuth, 6 flops)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a: Array, b: Array) -> Tuple[Array, Array]:
    """Error-free sum assuming |a| >= |b| (Dekker, 3 flops)."""
    s = a + b
    e = b - (s - a)
    return s, e


def split(a: Array) -> Tuple[Array, Array]:
    """Veltkamp split: a == hi + lo with 12-bit-mantissa halves."""
    c = _c(_SPLIT, a) * a
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a: Array, b: Array) -> Tuple[Array, Array]:
    """Error-free product: a * b == p + e exactly (Dekker, no FMA)."""
    p = a * b
    ah, al = split(a)
    bh, bl = split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def two_prod_presplit(ah: Array, al: Array, b: Array
                      ) -> Tuple[Array, Array]:
    """``two_prod(a, b)`` with ``a``'s Veltkamp split precomputed
    (plan constants: 4 flops saved per product)."""
    a = ah + al
    p = a * b
    bh, bl = split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


# ---- df32 = (hi, lo) compositions -----------------------------------

def df_add(xh, xl, yh, yl) -> Tuple[Array, Array]:
    """df32 + df32 (sloppy double-double add: 11 flops)."""
    s, e = two_sum(xh, yh)
    e = e + (xl + yl)
    return fast_two_sum(s, e)


def df_sub(xh, xl, yh, yl) -> Tuple[Array, Array]:
    return df_add(xh, xl, -yh, -yl)


def df_mul_f(xh, xl, y) -> Tuple[Array, Array]:
    """df32 * exact-f32 (y_lo == 0)."""
    p, e = two_prod(xh, y)
    e = e + xl * y
    return fast_two_sum(p, e)


def df_mul_presplit(chh, chl, cl, xh, xl) -> Tuple[Array, Array]:
    """(c_hi + c_lo) * (xh + xl) with c_hi's split (chh, chl)
    precomputed — the plan-constant x iterate product (the polish's
    hot op)."""
    ch = chh + chl
    p, e = two_prod_presplit(chh, chl, xh)
    e = e + (ch * xl + cl * xh)
    return fast_two_sum(p, e)


def df_to_f32(xh, xl) -> Array:
    return xh + xl


def df_where(c, xh, xl, yh, yl) -> Tuple[Array, Array]:
    return jnp.where(c, xh, yh), jnp.where(c, xl, yl)


def df_gt(xh, xl, yh, yl) -> Array:
    """x > y for normalized df32 pairs (|lo| <= ulp(hi)/2)."""
    dh, dl = df_sub(xh, xl, yh, yl)
    return (dh > 0) | ((dh == 0) & (dl > 0))


def df_clip(xh, xl, lbh, lbl, ubh, ubl) -> Tuple[Array, Array]:
    """clip(x, lb, ub) in df32: where x crosses a bound the result is
    EXACTLY the bound pair (projection semantics)."""
    above = df_gt(xh, xl, ubh, ubl)
    below = df_gt(lbh, lbl, xh, xl)
    h, l = df_where(above, ubh, ubl, xh, xl)
    return df_where(below, lbh, lbl, h, l)
