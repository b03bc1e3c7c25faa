"""Double-f32 ("df32") arithmetic: error-free transforms on f32 pairs.

TPU v5e has no hardware f64 -- XLA emulates it at ~20-75x f32 cost, which
is why the framework's bulk pipeline runs f32 (`pallas_newton`) and the
reference-parity f64 path is opt-in and slow.  This module provides the
middle road: unevaluated (hi, lo) f32 pair arithmetic built on
error-free transforms (Knuth two-sum, Dekker split/product), giving
~2^-48 relative accuracy at a handful of f32 VPU flops per op.  It is
the numerical core of the fast accuracy polish (`search.pallas_df32`)
that replaces the emulated-f64 polish of reference parity
(reference multi_mesh keeps everything f64 on the host,
multi_mesh/utils.py:212).

All functions are shape-polymorphic jnp expressions on f32 arrays, usable
inside Pallas kernel bodies and plain jitted XLA alike.  Correctness
requires round-to-nearest f32 ops with NO fma contraction of a*b+c.

Backend caveat (measured on this image, round 3): XLA:TPU and Mosaic
honor that contract -- the df32 kernels are bit-identical to an eager
reference on a real v5e.  **XLA:CPU does not**: inside a fused jitted
kernel LLVM contracts ``p + e`` with ``p = a*b`` into ``fma(a, b, e)``
(verified: ``jit(lambda a,b,c: a*b + c)`` is single-rounded on CPU, and
neither ``lax.optimization_barrier`` nor ``--xla_allow_excess_precision=
false`` suppresses it), which silently degrades pair renormalization to
~f32 accuracy.  Eager / ``jax.disable_jit()`` execution is exact on CPU
(single-op kernels cannot contract).  Production df32 paths therefore
target the TPU backends; CPU tests assert strict accuracy under
``disable_jit`` and plumbing-grade accuracy under jit.

A df32 value is an (hi, lo) tuple with hi = f32-rounding of the value and
|lo| <= 0.5 ulp(hi); functions ending in `_f` take a plain f32 operand.
"""
from __future__ import annotations

import numpy as np

# Dekker splitter for f32: 2^12 + 1 (24-bit mantissa -> 12+12 halves)
_SPLIT = np.float32(4097.0)


def two_sum(a, b):
    """Exact sum: a + b = s + e with s = fl(a + b).  6 flops."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a, b):
    """Exact sum assuming |a| >= |b| (Dekker).  3 flops."""
    s = a + b
    e = b - (s - a)
    return s, e


def split(a):
    """Dekker split: a = hi + lo with hi, lo 12-bit-mantissa f32."""
    c = _SPLIT * a
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a, b):
    """Exact product: a * b = p + e with p = fl(a * b).  17 flops."""
    p = a * b
    ah, al = split(a)
    bh, bl = split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


# ---------------------------------------------------------------------------
# df32 pair arithmetic (hi, lo) -- relative accuracy ~2^-48
# ---------------------------------------------------------------------------
def add_ff(a, b):
    """df32 from two plain f32 values."""
    return two_sum(a, b)


def add_df(x, a):
    """(hi, lo) + f32 -> (hi, lo)."""
    xh, xl = x
    s, e = two_sum(xh, a)
    return fast_two_sum(s, e + xl)


def add_dd(x, y):
    """(hi, lo) + (hi, lo) -> (hi, lo)."""
    xh, xl = x
    yh, yl = y
    s, e = two_sum(xh, yh)
    return fast_two_sum(s, e + (xl + yl))


def neg(x):
    xh, xl = x
    return -xh, -xl


def sub_dd(x, y):
    return add_dd(x, neg(y))


def mul_ff(a, b):
    """f32 * f32 -> exact df32."""
    return two_prod(a, b)


def mul_df(x, a):
    """(hi, lo) * f32 -> (hi, lo)."""
    xh, xl = x
    p, e = two_prod(xh, a)
    return fast_two_sum(p, e + xl * a)


def mul_dd(x, y):
    """(hi, lo) * (hi, lo) -> (hi, lo)."""
    xh, xl = x
    yh, yl = y
    p, e = two_prod(xh, yh)
    return fast_two_sum(p, e + (xh * yl + xl * yh))


def to_f32(x):
    """Collapse a df32 pair to its f32 rounding."""
    xh, xl = x
    return xh + xl


def from_f64(v, dtype=None):
    """Split a (possibly f64) array into a df32 pair at trace time."""
    import jax.numpy as jnp

    hi = v.astype(jnp.float32)
    lo = (v - hi.astype(v.dtype)).astype(jnp.float32)
    return hi, lo


def const_pair(v: float) -> tuple[np.float32, np.float32]:
    """Split a python float into (hi, lo) f32 scalars at trace time."""
    hi = np.float32(v)
    lo = np.float32(v - float(hi))
    return hi, lo
