"""df32 (double-f32) arithmetic: error-free-transform exactness and pair
accuracy vs native f64.

The polish kernel's accuracy claim rests on these transforms being EXACT
under the compiler in use (no fma contraction, round-to-nearest): the
suite checks them under jit on this host's XLA backend; the TPU/Mosaic
backends were probed equally exact (round 3).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimesh_tpu.core import df32


@pytest.fixture
def pairs(rng):
    a = rng.uniform(-1e3, 1e3, 4096).astype(np.float32)
    b = rng.uniform(-1e3, 1e3, 4096).astype(np.float32)
    return jnp.asarray(a), jnp.asarray(b)


def test_two_sum_exact(pairs):
    a, b = pairs
    s, e = jax.jit(df32.two_sum)(a, b)
    exact = np.asarray(a, np.float64) + np.asarray(b, np.float64)
    got = np.asarray(s, np.float64) + np.asarray(e, np.float64)
    assert np.array_equal(got, exact)


def test_two_prod_exact(pairs):
    a, b = pairs
    p, e = jax.jit(df32.two_prod)(a, b)
    exact = np.asarray(a, np.float64) * np.asarray(b, np.float64)
    got = np.asarray(p, np.float64) + np.asarray(e, np.float64)
    assert np.array_equal(got, exact)


def _to64(x):
    return np.asarray(x[0], np.float64) + np.asarray(x[1], np.float64)


def test_pair_chain_accuracy(rng):
    """A product/sum chain (the shape of a basis evaluation) stays at
    ~2^-48 relative accuracy."""
    n = 2048
    xs = rng.uniform(-2, 2, (6, n))
    x32 = [jnp.asarray(x.astype(np.float32)) for x in xs]
    # exact inputs in both precisions (f32 values, f64 arithmetic)
    x64 = [np.asarray(x, np.float64) for x in x32]

    @jax.jit
    def chain(xs):
        acc = df32.mul_ff(xs[0], xs[1])
        for x in xs[2:]:
            acc = df32.mul_df(acc, x)
        tot = acc
        for x in xs:
            tot = df32.add_df(tot, x)
        return tot

    got = _to64(chain(x32))
    want = np.prod(x64, axis=0)
    for x in x64:
        want = want + x
    # error scale: the magnitudes flowing through the chain (the result
    # itself can cancel to ~0, where relative error is meaningless)
    scale = np.abs(np.prod(x64, axis=0)) + np.sum(np.abs(x64), axis=0)
    assert np.max(np.abs(got - want) / scale) < 1e-12


def test_add_mul_dd(rng):
    a = rng.uniform(-1, 1, 1024)
    b = rng.uniform(-1, 1, 1024)
    pa = df32.from_f64(jnp.asarray(a))
    pb = df32.from_f64(jnp.asarray(b))
    s = _to64(jax.jit(df32.add_dd)(pa, pb))
    p = _to64(jax.jit(df32.mul_dd)(pa, pb))
    # from_f64 pairs represent the f64 inputs to ~2^-48 already
    assert np.max(np.abs(s - (a + b)) / np.maximum(np.abs(a + b), 1e-30)) \
        < 1e-12
    assert np.max(np.abs(p - a * b) / np.maximum(np.abs(a * b), 1e-30)) \
        < 1e-12


def test_const_pair_roundtrip():
    v = 0.12345678901234567
    hi, lo = df32.const_pair(v)
    assert abs((float(hi) + float(lo)) - v) < 1e-14
    assert isinstance(hi, np.float32)
