"""Gauss-Lobatto-Legendre (GLL) reference-element machinery.

This replaces the closed-source ``salvus.fem`` basis kernels the reference
binds at import time (reference multi_mesh/components/interpolator.py:22-57,
``GetInterpolationCoefficients*`` for orders 1/2/4 in 3D and order 4 in 2D).
Everything here is built from scratch:

* GLL node/quadrature-weight generation for arbitrary polynomial order
  (closed forms for the orders the reference supports, Newton iteration on
  the derivative of the Legendre polynomial in general),
* stable Lagrange cardinal-polynomial evaluation in "modified barycentric"
  product form (exact 0/1 values when evaluated at the nodes themselves),
* tensor-product basis evaluation and gradients for d = 2, 3, vectorized
  over arbitrary leading batch dimensions and jittable.

Canonical node ordering
-----------------------
Flat node ``n`` of a (p+1)^d tensor lattice corresponds to multi-index
``(i_0, ..., i_{d-1})`` in C row-major order (last dimension fastest):
``n = ((i_0 * (p+1)) + i_1) * (p+1) + i_2`` for d = 3.  All element node
arrays in this framework follow this convention.
"""
from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def gll_nodes(order: int) -> tuple[np.ndarray, np.ndarray]:
    """Return (nodes, quadrature weights) of the GLL rule of given order.

    ``order`` is the polynomial order p; there are p+1 nodes in [-1, 1],
    the roots of (1 - x^2) P'_p(x).  float64 numpy arrays.
    """
    if order < 1:
        raise ValueError(f"GLL order must be >= 1, got {order}")
    p = order
    n = p + 1
    if p == 1:
        x = np.array([-1.0, 1.0])
    elif p == 2:
        x = np.array([-1.0, 0.0, 1.0])
    elif p == 3:
        s = np.sqrt(1.0 / 5.0)
        x = np.array([-1.0, -s, s, 1.0])
    elif p == 4:
        s = np.sqrt(3.0 / 7.0)
        x = np.array([-1.0, -s, 0.0, s, 1.0])
    else:
        # Chebyshev-Gauss-Lobatto initial guess, Newton on (1-x^2) P'_p(x).
        x = -np.cos(np.pi * np.arange(n) / p)
        for _ in range(100):
            # Legendre recurrence for P_p and P'_p at x.
            p0 = np.ones_like(x)
            p1 = x.copy()
            for k in range(2, p + 1):
                p0, p1 = p1, ((2 * k - 1) * x * p1 - (k - 1) * p0) / k
            interior = slice(1, -1)
            xi = x[interior]
            # f = (1-x^2) P'_p = p (P_{p-1} - x P_p); f' = -p(p+1) P_p
            f = p * (p0[interior] - xi * p1[interior])
            df = -p * (p + 1) * p1[interior]
            step = f / df
            x[interior] = xi - step
            if np.max(np.abs(step)) < 1e-15:
                break
    # Quadrature weights: w_i = 2 / (p (p+1) P_p(x_i)^2).
    p0 = np.ones_like(x)
    p1 = x.copy()
    for k in range(2, p + 1):
        p0, p1 = p1, ((2 * k - 1) * x * p1 - (k - 1) * p0) / k
    w = 2.0 / (p * (p + 1) * p1**2)  # p >= 1 is enforced, so P_p = p1
    return x, w


@functools.lru_cache(maxsize=None)
def barycentric_weights(order: int) -> np.ndarray:
    """w_i = 1 / prod_{j != i} (x_i - x_j) for the GLL nodes (float64)."""
    x, _ = gll_nodes(order)
    diff = x[:, None] - x[None, :]
    np.fill_diagonal(diff, 1.0)
    return 1.0 / np.prod(diff, axis=1)


def lagrange_eval(order: int, x, dtype=None):
    """Values of all p+1 Lagrange cardinal polynomials at ``x``.

    ``x``: any shape [...]; returns [..., p+1].  Uses the product form
    ``l_i(x) = w_i * prod_{j != i} (x - x_j)`` which is branchless, exact at
    the nodes, and unrolls to a handful of fused multiplies for the small
    orders used in spectral-element meshes.
    """
    nodes, _ = gll_nodes(order)
    bw = barycentric_weights(order)
    x = jnp.asarray(x, dtype=dtype)
    dt = x.dtype
    n = order + 1
    diffs = x[..., None] - jnp.asarray(nodes, dtype=dt)  # [..., n]
    cols = []
    for i in range(n):
        prod = jnp.ones_like(x)
        for j in range(n):
            if j != i:
                prod = prod * diffs[..., j]
        cols.append(dt.type(bw[i]) * prod)
    return jnp.stack(cols, axis=-1)


def lagrange_deriv(order: int, x, dtype=None):
    """d/dx of all p+1 Lagrange cardinal polynomials at ``x`` -> [..., p+1]."""
    nodes, _ = gll_nodes(order)
    bw = barycentric_weights(order)
    x = jnp.asarray(x, dtype=dtype)
    dt = x.dtype
    n = order + 1
    diffs = x[..., None] - jnp.asarray(nodes, dtype=dt)
    cols = []
    for i in range(n):
        total = jnp.zeros_like(x)
        for k in range(n):
            if k == i:
                continue
            prod = jnp.ones_like(x)
            for j in range(n):
                if j != i and j != k:
                    prod = prod * diffs[..., j]
            total = total + prod
        cols.append(dt.type(bw[i]) * total)
    return jnp.stack(cols, axis=-1)


def tensor_basis(order: int, ref, dtype=None):
    """Tensor-product GLL basis values at reference coordinates.

    ``ref``: [..., d] with d in {2, 3}; returns [..., (p+1)^d] in canonical
    row-major node ordering.  This is the TPU-native replacement for the
    reference's ``GetInterpolationCoefficients`` (orders 1/2/4 3D, order 4
    2D; reference interpolator.py:1337-1347).
    """
    ref = jnp.asarray(ref, dtype=dtype)
    d = ref.shape[-1]
    n = order + 1
    ls = [lagrange_eval(order, ref[..., a], dtype=ref.dtype) for a in range(d)]
    if d == 3:
        out = (
            ls[0][..., :, None, None]
            * ls[1][..., None, :, None]
            * ls[2][..., None, None, :]
        )
        return out.reshape(*ref.shape[:-1], n**3)
    elif d == 2:
        out = ls[0][..., :, None] * ls[1][..., None, :]
        return out.reshape(*ref.shape[:-1], n**2)
    raise ValueError(f"dimension must be 2 or 3, got {d}")


def tensor_basis_grad(order: int, ref, dtype=None):
    """Gradient of the tensor basis: [..., (p+1)^d, d]."""
    ref = jnp.asarray(ref, dtype=dtype)
    d = ref.shape[-1]
    n = order + 1
    ls = [lagrange_eval(order, ref[..., a], dtype=ref.dtype) for a in range(d)]
    ds = [lagrange_deriv(order, ref[..., a], dtype=ref.dtype) for a in range(d)]
    grads = []
    if d == 3:
        for axis in range(3):
            f0 = ds[0] if axis == 0 else ls[0]
            f1 = ds[1] if axis == 1 else ls[1]
            f2 = ds[2] if axis == 2 else ls[2]
            g = (
                f0[..., :, None, None]
                * f1[..., None, :, None]
                * f2[..., None, None, :]
            )
            grads.append(g.reshape(*ref.shape[:-1], n**3))
    elif d == 2:
        for axis in range(2):
            f0 = ds[0] if axis == 0 else ls[0]
            f1 = ds[1] if axis == 1 else ls[1]
            g = f0[..., :, None] * f1[..., None, :]
            grads.append(g.reshape(*ref.shape[:-1], n**2))
    else:
        raise ValueError(f"dimension must be 2 or 3, got {d}")
    return jnp.stack(grads, axis=-1)


@functools.lru_cache(maxsize=None)
def lattice_coords(order: int, dim: int) -> np.ndarray:
    """Reference coordinates of every lattice node: [(p+1)^dim, dim], f64."""
    x, _ = gll_nodes(order)
    axes = np.meshgrid(*([x] * dim), indexing="ij")
    return np.stack([a.ravel() for a in axes], axis=-1)


@functools.lru_cache(maxsize=None)
def corner_indices(order: int, dim: int) -> np.ndarray:
    """Flat canonical indices of the 2^dim corner nodes of the lattice.

    Corner ordering is itself canonical (order-1 lattice ordering), so the
    extracted corners form a valid order-1 element node array.
    """
    p = order
    n = p + 1
    idx = []
    rng = (0, p)
    if dim == 3:
        for i in rng:
            for j in rng:
                for k in rng:
                    idx.append((i * n + j) * n + k)
    elif dim == 2:
        for i in rng:
            for j in rng:
                idx.append(i * n + j)
    else:
        raise ValueError(f"dimension must be 2 or 3, got {dim}")
    return np.asarray(idx, dtype=np.int32)


def infer_order(n_nodes: int, dim: int) -> int:
    """Polynomial order from node count, as the reference infers it
    (reference interpolator.py:667: round(ndata**(1/dim)) - 1)."""
    return int(round(n_nodes ** (1.0 / dim))) - 1
