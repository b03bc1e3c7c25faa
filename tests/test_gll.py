"""Unit tests for GLL nodes/weights and Lagrange tensor bases.

Validates against closed forms and classic properties (SURVEY.md section 4:
nodes vs closed-form for orders 1/2/4, partition of unity, exactness on
polynomials up to order p).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from multimesh_tpu.core import gll


def test_gll_nodes_closed_forms():
    x1, w1 = gll.gll_nodes(1)
    np.testing.assert_allclose(x1, [-1, 1])
    np.testing.assert_allclose(w1, [1, 1])

    x2, w2 = gll.gll_nodes(2)
    np.testing.assert_allclose(x2, [-1, 0, 1])
    np.testing.assert_allclose(w2, [1 / 3, 4 / 3, 1 / 3])

    x4, w4 = gll.gll_nodes(4)
    s = np.sqrt(3 / 7)
    np.testing.assert_allclose(x4, [-1, -s, 0, s, 1])
    np.testing.assert_allclose(
        w4, [1 / 10, 49 / 90, 32 / 45, 49 / 90, 1 / 10], rtol=1e-14
    )


@pytest.mark.parametrize("order", [1, 2, 3, 4, 5, 7])
def test_gll_quadrature_exactness(order):
    """GLL quadrature integrates polynomials up to degree 2p-1 exactly."""
    x, w = gll.gll_nodes(order)
    for deg in range(2 * order):
        exact = (1 - (-1) ** (deg + 1)) / (deg + 1)
        np.testing.assert_allclose(np.sum(w * x**deg), exact, atol=1e-13)


@pytest.mark.parametrize("order", [1, 2, 4, 6])
def test_lagrange_cardinal_property(order):
    x, _ = gll.gll_nodes(order)
    vals = np.asarray(gll.lagrange_eval(order, jnp.asarray(x)))
    np.testing.assert_allclose(vals, np.eye(order + 1), atol=1e-14)


@pytest.mark.parametrize("order", [1, 2, 4])
def test_lagrange_partition_of_unity(order, rng):
    pts = rng.uniform(-1.2, 1.2, size=(257,))
    vals = np.asarray(gll.lagrange_eval(order, jnp.asarray(pts)))
    np.testing.assert_allclose(vals.sum(axis=-1), 1.0, atol=1e-12)


@pytest.mark.parametrize("order", [2, 4])
def test_lagrange_reproduces_polynomials(order, rng):
    """Interpolating samples of a degree-p polynomial is exact."""
    x, _ = gll.gll_nodes(order)
    coefs = rng.normal(size=order + 1)
    poly = np.polynomial.Polynomial(coefs)
    pts = rng.uniform(-1, 1, size=(100,))
    vals = np.asarray(gll.lagrange_eval(order, jnp.asarray(pts)))
    np.testing.assert_allclose(vals @ poly(x), poly(pts), atol=1e-12)


@pytest.mark.parametrize("order", [1, 2, 4])
def test_lagrange_deriv_fd(order, rng):
    pts = rng.uniform(-0.95, 0.95, size=(50,))
    h = 1e-6
    d = np.asarray(gll.lagrange_deriv(order, jnp.asarray(pts)))
    fd = (
        np.asarray(gll.lagrange_eval(order, jnp.asarray(pts + h)))
        - np.asarray(gll.lagrange_eval(order, jnp.asarray(pts - h)))
    ) / (2 * h)
    np.testing.assert_allclose(d, fd, atol=1e-7)


@pytest.mark.parametrize("order,dim", [(1, 3), (2, 3), (4, 3), (4, 2)])
def test_tensor_basis_cardinal_and_unity(order, dim, rng):
    lat = gll.lattice_coords(order, dim)
    vals = np.asarray(gll.tensor_basis(order, jnp.asarray(lat)))
    np.testing.assert_allclose(vals, np.eye(lat.shape[0]), atol=1e-13)
    pts = rng.uniform(-1, 1, size=(64, dim))
    vals = np.asarray(gll.tensor_basis(order, jnp.asarray(pts)))
    np.testing.assert_allclose(vals.sum(axis=-1), 1.0, atol=1e-12)


def test_tensor_basis_ordering_3d():
    """Canonical ordering is row-major: last ref dim varies fastest."""
    order = 2
    lat = gll.lattice_coords(order, 3)
    # node (i,j,k) = (0,0,1) should be the second flat node
    np.testing.assert_allclose(lat[1], [-1, -1, 0])
    # node (1,0,0) -> flat 9
    np.testing.assert_allclose(lat[9], [0, -1, -1])


@pytest.mark.parametrize("order,dim", [(2, 3), (4, 3), (4, 2)])
def test_tensor_basis_grad_fd(order, dim, rng):
    pts = rng.uniform(-0.9, 0.9, size=(20, dim))
    g = np.asarray(gll.tensor_basis_grad(order, jnp.asarray(pts)))
    h = 1e-6
    for a in range(dim):
        dp = pts.copy()
        dm = pts.copy()
        dp[:, a] += h
        dm[:, a] -= h
        fd = (
            np.asarray(gll.tensor_basis(order, jnp.asarray(dp)))
            - np.asarray(gll.tensor_basis(order, jnp.asarray(dm)))
        ) / (2 * h)
        np.testing.assert_allclose(g[..., a], fd, atol=1e-6)


def test_corner_indices():
    ci = gll.corner_indices(4, 3)
    lat = gll.lattice_coords(4, 3)
    corners = lat[ci]
    expect = gll.lattice_coords(1, 3)
    np.testing.assert_allclose(corners, expect)


def test_infer_order():
    assert gll.infer_order(125, 3) == 4
    assert gll.infer_order(27, 3) == 2
    assert gll.infer_order(8, 3) == 1
    assert gll.infer_order(25, 2) == 4
