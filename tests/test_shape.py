"""Tests for forward/inverse shape mappings (batched Newton).

Mirrors the reference semantics of salvus.fem InverseCoordinateTransform /
trilinearinterpolator.c's Newton (zero init, tol 1e-8 * scale) on
analytically deformed hexes (SURVEY.md section 4).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from multimesh_tpu.core import gll, shape
from multimesh_tpu.config import LocateConfig, Precision


def make_element(order, dim, kind="affine", seed=0, scale=1.0, offset=None):
    """Build one element's node coords by deforming the reference lattice."""
    rng = np.random.default_rng(seed)
    lat = gll.lattice_coords(order, dim)  # [n, dim]
    if offset is None:
        offset = rng.uniform(-5, 5, size=dim)
    if kind == "affine":
        A = np.eye(dim) * scale + rng.uniform(-0.1, 0.1, size=(dim, dim)) * scale
        nodes = lat @ A.T + offset
    elif kind == "curved":
        A = np.eye(dim) * scale
        nodes = lat @ A.T
        # mild smooth bending, keeps the map invertible
        nodes[:, 0] += 0.1 * scale * np.sin(lat[:, 1]) * np.cos(lat[:, dim - 1])
        nodes[:, 1] += 0.08 * scale * lat[:, 0] ** 2
        nodes = nodes + offset
    elif kind == "shell":
        # spherical-shell-like element at earth scale: radius in
        # [5.8e6, 6.4e6] m, small angular extent
        assert dim == 3
        r = 5.8e6 + (lat[:, 0] + 1) * 0.5 * 0.6e6
        theta = 0.7 + (lat[:, 1] + 1) * 0.5 * 0.05
        phi = 1.3 + (lat[:, 2] + 1) * 0.5 * 0.05
        nodes = np.stack(
            [
                r * np.sin(theta) * np.cos(phi),
                r * np.sin(theta) * np.sin(phi),
                r * np.cos(theta),
            ],
            axis=-1,
        )
    else:
        raise ValueError(kind)
    return nodes


@pytest.mark.parametrize("order,dim", [(1, 3), (2, 3), (4, 3), (4, 2)])
@pytest.mark.parametrize("kind", ["affine", "curved"])
def test_forward_inverse_roundtrip(order, dim, kind, rng):
    nodes = make_element(order, dim, kind=kind)
    refs = rng.uniform(-0.98, 0.98, size=(64, dim))
    nodes_b = jnp.broadcast_to(jnp.asarray(nodes), (64, *nodes.shape))
    x = shape.forward_map(order, nodes_b, jnp.asarray(refs))
    ref_rec, conv = shape.inverse_map(nodes_b, x, order=order)
    assert bool(jnp.all(conv)), "all interior points must converge"
    np.testing.assert_allclose(np.asarray(ref_rec), refs, atol=1e-8)


def test_inverse_earth_scale_shell():
    """Earth-sized curved shell element: mixed f32 bulk + f64 polish must
    still recover ref coords to ~1e-8 thanks to per-element centering."""
    order = 4
    nodes = make_element(order, 3, kind="shell")
    rng = np.random.default_rng(3)
    refs = rng.uniform(-0.95, 0.95, size=(32, 3))
    nodes_b = jnp.broadcast_to(jnp.asarray(nodes), (32, *nodes.shape))
    x = shape.forward_map(order, nodes_b, jnp.asarray(refs))
    cfg = LocateConfig(precision=Precision.MIXED)
    ref_rec, conv = shape.inverse_map(
        nodes_b, x, order=order, cfg=cfg, dtype=jnp.float32
    )
    assert bool(jnp.all(conv))
    np.testing.assert_allclose(np.asarray(ref_rec), refs, atol=1e-7)


def test_inverse_outside_points_report_ref_gt_one(rng):
    """Points outside the element converge to |ref| > 1 (the acceptance
    test the reference applies, interpolator.py:1208)."""
    order = 2
    nodes = make_element(order, 3, kind="affine", seed=5)
    refs = rng.uniform(1.3, 2.0, size=(16, 3)) * rng.choice(
        [-1, 1], size=(16, 3)
    )
    nodes_b = jnp.broadcast_to(jnp.asarray(nodes), (16, *nodes.shape))
    x = shape.forward_map(order, nodes_b, jnp.asarray(refs))
    ref_rec, conv = shape.inverse_map(nodes_b, x, order=order)
    got = np.asarray(ref_rec)
    assert np.all(np.max(np.abs(got), axis=-1) > 1.05)
    # affine map: even exterior points converge and are recovered exactly
    # (conv.all() keeps the recovery check from passing vacuously)
    assert np.asarray(conv).all()
    np.testing.assert_allclose(got, refs, atol=1e-7)


def test_trilinear_matches_reference_formulas(rng):
    """Order-1 tensor basis at the 8 canonical corners reproduces the
    analytic trilinear shape functions (the math of reference
    trilinearinterpolator.c:174-197, modulo node ordering)."""
    pts = rng.uniform(-1, 1, size=(40, 3))
    vals = np.asarray(gll.tensor_basis(1, jnp.asarray(pts)))
    lat = gll.lattice_coords(1, 3)
    r, s, t = pts[:, 0:1], pts[:, 1:2], pts[:, 2:3]
    R, S, T = lat[:, 0], lat[:, 1], lat[:, 2]
    expect = 0.125 * (1 + r * R) * (1 + s * S) * (1 + t * T)
    np.testing.assert_allclose(vals, expect, atol=1e-14)


def test_degenerate_element_no_nan():
    """A collapsed element must not produce NaNs, just non-convergence."""
    order = 1
    nodes = np.zeros((8, 3))  # fully degenerate
    pt = jnp.asarray(np.array([[1.0, 2.0, 3.0]]))
    nodes_b = jnp.asarray(nodes)[None]
    ref, conv = shape.inverse_map(nodes_b, pt, order=order)
    assert not bool(jnp.any(jnp.isnan(ref)))
    assert not bool(jnp.any(conv))
