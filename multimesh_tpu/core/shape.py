"""Element shape mappings and the batched Newton inverse map.

Replaces the reference's native point-inversion kernels:

* ``salvus.fem InverseCoordinateTransformWrapper`` (orders 1/2/4 x dims 2/3,
  bound at reference multi_mesh/components/interpolator.py:42-55),
* the hand-written C Newton solver for 8-node hexes
  (reference multi_mesh/src/trilinearinterpolator.c:260-305: max 50
  iterations, tol = 1e-8 * element scale, zero initial guess).

Design (TPU-first): instead of per-point early-exit loops we run a fixed,
branchless iteration schedule batched over [points (x candidates)].
Coordinates are centered and scaled per element before iterating, which
keeps float32 fully conditioned even for Earth-sized coordinates (~6.4e6 m)
-- the bulk iterations then run on the VPU in f32, with a configurable
number of higher-precision polish iterations on top (``LocateConfig``).

Convergence/validity is reported as a mask instead of the reference's NaN
sentinel; callers turn non-converged candidates into skips exactly like the
reference skips NaN ref coords (reference interpolator.py:1200-1202).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import LocateConfig, DEFAULT_LOCATE
from . import gll


def forward_map(order: int, elem_nodes, ref):
    """Map reference coords to physical coords: x(ref) = sum_n N_n(ref) x_n.

    elem_nodes: [..., n_nodes, d]; ref: [..., d] -> [..., d].
    """
    basis = gll.tensor_basis(order, ref, dtype=elem_nodes.dtype)
    return jnp.einsum("...n,...nd->...d", basis, elem_nodes)


def shape_jacobian(order: int, elem_nodes, ref):
    """J[a][b] = d x_a / d ref_b, shape [..., d, d]."""
    grad = gll.tensor_basis_grad(order, ref, dtype=elem_nodes.dtype)
    # grad: [..., n, d_ref]; nodes: [..., n, d_x] -> J: [..., d_x, d_ref]
    return jnp.einsum("...nb,...na->...ab", grad, elem_nodes)


def _solve_small(A, b):
    """Solve A x = b for batched 2x2 / 3x3 via adjugate; returns (x, det)."""
    d = A.shape[-1]
    if d == 3:
        a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
        a10, a11, a12 = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
        a20, a21, a22 = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
        c00 = a11 * a22 - a12 * a21
        c01 = a02 * a21 - a01 * a22
        c02 = a01 * a12 - a02 * a11
        c10 = a12 * a20 - a10 * a22
        c11 = a00 * a22 - a02 * a20
        c12 = a02 * a10 - a00 * a12
        c20 = a10 * a21 - a11 * a20
        c21 = a01 * a20 - a00 * a21
        c22 = a00 * a11 - a01 * a10
        det = a00 * c00 + a01 * c10 + a02 * c20
        inv_det = jnp.where(det == 0, 0.0, 1.0 / jnp.where(det == 0, 1.0, det))
        b0, b1, b2 = b[..., 0], b[..., 1], b[..., 2]
        x0 = (c00 * b0 + c01 * b1 + c02 * b2) * inv_det
        x1 = (c10 * b0 + c11 * b1 + c12 * b2) * inv_det
        x2 = (c20 * b0 + c21 * b1 + c22 * b2) * inv_det
        return jnp.stack([x0, x1, x2], axis=-1), det
    elif d == 2:
        a00, a01 = A[..., 0, 0], A[..., 0, 1]
        a10, a11 = A[..., 1, 0], A[..., 1, 1]
        det = a00 * a11 - a01 * a10
        inv_det = jnp.where(det == 0, 0.0, 1.0 / jnp.where(det == 0, 1.0, det))
        b0, b1 = b[..., 0], b[..., 1]
        x0 = (a11 * b0 - a01 * b1) * inv_det
        x1 = (a00 * b1 - a10 * b0) * inv_det
        return jnp.stack([x0, x1], axis=-1), det
    raise ValueError(f"dimension must be 2 or 3, got {d}")


def element_center_scale(elem_nodes):
    """Per-element centering shift and isotropic scale from the node AABB.

    elem_nodes [..., n, d] -> (center [..., d], scale [..., 1]).  ``scale``
    is half the largest AABB extent, floored to avoid division by zero for
    degenerate elements.
    """
    lo = jnp.min(elem_nodes, axis=-2)
    hi = jnp.max(elem_nodes, axis=-2)
    center = 0.5 * (lo + hi)
    scale = 0.5 * jnp.max(hi - lo, axis=-1, keepdims=True)
    scale = jnp.maximum(scale, jnp.finfo(elem_nodes.dtype).tiny * 1e10)
    return center, scale


def _newton_iterations(order, nodes_c, point_c, ref0, n_iters, clamp):
    """Run ``n_iters`` Newton steps on centered/scaled coordinates.

    nodes_c: [..., n, d] (centered, unit-scale), point_c: [..., d],
    ref0: [..., d] initial guess.  Returns (ref, residual_inf_norm at
    the final iterate).  Fixed-trip-count fori_loop, branchless and
    XLA-friendly: no tolerance enters the loop -- convergence is judged
    ONLY by the caller, from the returned residual (inverse_map applies
    cfg.newton_rtol there).
    """
    def body(_, ref):
        x = forward_map(order, nodes_c, ref)
        r = point_c - x
        jac = shape_jacobian(order, nodes_c, ref)
        step, det = _solve_small(jac, r)
        # If the Jacobian is singular (det == 0 -> step zeroed by solver)
        # the iterate simply stops moving; the residual check below then
        # reports non-convergence, mirroring the reference's failure path.
        # Non-finite steps (degenerate geometry, f32 overflow on absurdly
        # distant candidates) are likewise zeroed instead of poisoning the
        # batch with NaNs.
        step = jnp.where(jnp.isfinite(step), step, 0.0)
        return jnp.clip(ref + step, -clamp, clamp)

    ref = jax.lax.fori_loop(0, n_iters, body, ref0)
    # One residual evaluation at the final iterate.
    x = forward_map(order, nodes_c, ref)
    res = jnp.max(jnp.abs(point_c - x), axis=-1)
    return ref, res


@functools.partial(
    jax.jit, static_argnames=("order", "cfg", "dtype")
)
def inverse_map(
    elem_nodes,
    point,
    order: int,
    cfg: LocateConfig = DEFAULT_LOCATE,
    dtype=None,
    ref0=None,
):
    """Batched inverse of the shape map: find ref with x(ref) = point.

    elem_nodes: [..., n_nodes, d] physical node coords (canonical lattice
    ordering), point: [..., d].  Returns (ref [..., d], converged [...]).

    Matches the semantics of the reference Newton solvers (zero initial
    guess, tol = newton_rtol * element scale) but runs a fixed schedule:
    ``cfg.newton_iters`` bulk iterations at ``dtype`` (or the input dtype)
    on centered coordinates, then ``cfg.polish_iters`` at the input dtype.

    ``ref0`` [..., d] warm-starts the iteration (e.g. f32 ladder output
    fed into a short f64 polish): Newton converges quadratically from a
    nearby guess, so 1-2 iterations recover full f64 accuracy.
    """
    d = point.shape[-1]
    n_nodes = elem_nodes.shape[-2]
    if gll.lattice_coords(order, d).shape[0] != n_nodes:
        raise ValueError(
            f"element has {n_nodes} nodes, expected {(order + 1) ** d} "
            f"for order {order} in {d}D"
        )
    acc_dt = elem_nodes.dtype
    bulk_dt = jnp.dtype(dtype) if dtype is not None else acc_dt

    center, scale = element_center_scale(elem_nodes)
    nodes_c = (elem_nodes - center[..., None, :]) / scale[..., None, :]
    point_c = (point - center) / scale

    if ref0 is None:
        ref0 = jnp.zeros_like(point_c)
    else:
        ref0 = jnp.asarray(ref0, point_c.dtype)
    ref, _ = _newton_iterations(
        order,
        nodes_c.astype(bulk_dt),
        point_c.astype(bulk_dt),
        ref0.astype(bulk_dt),
        cfg.newton_iters,
        cfg.newton_clamp,
    )
    ref = ref.astype(acc_dt)
    if cfg.polish_iters > 0:
        ref, res = _newton_iterations(
            order, nodes_c, point_c, ref, cfg.polish_iters,
            cfg.newton_clamp,
        )
    else:
        x = forward_map(order, nodes_c, ref)
        res = jnp.max(jnp.abs(point_c - x), axis=-1)
    # Coordinates were scaled to unit element size, so the reference's
    # tol = rtol * scale becomes simply rtol here (with a small safety
    # factor for the f32 bulk phase round-off).
    tol = jnp.asarray(max(cfg.newton_rtol, float(jnp.finfo(acc_dt).eps) * 64),
                      acc_dt)
    converged = res < tol
    return ref, converged


def trilinear_inverse_map(
    elem_nodes, point, cfg: LocateConfig = DEFAULT_LOCATE, dtype=None
):
    """Inverse map for 2^d-corner (order-1) elements; thin wrapper."""
    return inverse_map(elem_nodes, point, order=1, cfg=cfg, dtype=dtype)
