"""Native C++ host runtime vs the JAX core (cross-validation oracle)."""
import numpy as np
import jax.numpy as jnp
import pytest

from multimesh_tpu import native
from multimesh_tpu import testing as mmt
from multimesh_tpu.core import gll, shape

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def test_native_centroids(rng):
    mesh = mmt.box_mesh(shape=(3, 3, 3), order=1)
    got = native.centroids(mesh.connectivity, mesh.vertices)
    expect = mesh.vertices[mesh.connectivity].mean(axis=1)
    np.testing.assert_allclose(got, expect, rtol=1e-14)


@pytest.mark.parametrize("order,dim", [(1, 3), (2, 3), (4, 3), (4, 2), (6, 3)])
def test_native_gll_basis_matches_jax(order, dim, rng):
    ref = rng.uniform(-1.1, 1.1, size=(64, dim))
    got = native.gll_basis(order, ref)
    expect = np.asarray(gll.tensor_basis(order, jnp.asarray(ref)))
    np.testing.assert_allclose(got, expect, atol=1e-13)


@pytest.mark.parametrize("order", [1, 2, 4])
def test_native_inverse_map_matches_jax(order, rng):
    from test_shape import make_element

    nodes = make_element(order, 3, kind="curved", seed=2)
    refs_true = rng.uniform(-0.95, 0.95, size=(50, 3))
    nodes_b = np.broadcast_to(nodes, (50, *nodes.shape))
    pts = np.asarray(
        shape.forward_map(order, jnp.asarray(nodes_b.copy()),
                          jnp.asarray(refs_true))
    )
    refs, conv = native.inverse_map(nodes_b.copy(), pts, order)
    assert conv.all()
    np.testing.assert_allclose(refs, refs_true, atol=1e-9)


def test_native_locate_matches_device_engine(rng):
    from multimesh_tpu.search import locate as jlocate
    from multimesh_tpu.config import LocateConfig

    mesh = mmt.box_mesh(shape=(3, 3, 3), order=2, warp=0.08)
    field = mmt.element_nodal_field(mesh, "smooth")
    pts = rng.uniform(0.05, 0.95, size=(200, 3))

    cents = mesh.centroids()
    d2 = ((pts[:, None] - cents[None]) ** 2).sum(-1)
    cand = np.argsort(d2, axis=1)[:, :10]

    elements, refs, weights, failed = native.locate(
        pts, cand, mesh.points, order=2, accept_tol=1.05,
        fallback="sentinel",
    )
    assert failed == 0

    res = jlocate(pts, mesh.points, order=2,
                  cfg=LocateConfig(nelem_to_search=10),
                  candidates=cand, fallback="sentinel")
    vals_native = np.einsum("pn,pn->p", weights, field[elements])
    vals_jax = np.einsum("pn,pn->p", res.weights, field[res.elements])
    np.testing.assert_allclose(vals_native, vals_jax, rtol=1e-9)


def test_native_locate_fallbacks(rng):
    mesh = mmt.box_mesh(shape=(2, 2, 2), order=1)
    pts = rng.uniform(1.5, 1.8, size=(20, 3))  # outside
    cents = mesh.centroids()
    d2 = ((pts[:, None] - cents[None]) ** 2).sum(-1)
    cand = np.argsort(d2, axis=1)[:, :8]

    el, refs, w, failed = native.locate(pts, cand, mesh.points, order=1,
                                        fallback="sentinel")
    assert failed == 20 and (el == -1).all() and (w == 0).all()

    el, refs, w, failed = native.locate(pts, cand, mesh.points, order=1,
                                        fallback="snap")
    assert failed == 0 and (el >= 0).all()
    assert np.max(np.abs(refs)) <= 1.02 + 1e-12
    # element choice follows the best-|ref| semantics, not candidate 0
    from oracle import locate_np

    o_el, o_refs, _ = locate_np(pts, mesh.points, order=1, snap=True)
    np.testing.assert_array_equal(el, o_el)
    np.testing.assert_allclose(refs, o_refs, atol=1e-9)


def test_native_order_validation():
    """Orders beyond the C runtime's fixed stack storage are rejected
    loudly in the bindings, never reaching the kernels."""
    import pytest

    from multimesh_tpu.native import bindings

    if not bindings.available():
        pytest.skip("native runtime not built")
    with pytest.raises(ValueError, match="order"):
        bindings.gll_basis(9, np.zeros((4, 3)))
    with pytest.raises(ValueError, match="order"):
        bindings.inverse_map(np.zeros((1, 8, 3)), np.zeros((1, 3)), 0)


def test_native_locate_rejects_bad_candidates():
    """Out-of-range candidate ids raise instead of reading OOB."""
    import pytest

    from multimesh_tpu.native import bindings
    from multimesh_tpu import testing as mmt

    if not bindings.available():
        pytest.skip("native runtime not built")
    mesh = mmt.box_mesh(shape=(2, 2, 2), order=1)
    pts = np.full((3, 3), 0.5)
    cand = np.array([[0], [1], [99]])  # 99 >= nelem
    with pytest.raises(ValueError, match="candidate ids"):
        bindings.locate(pts, cand, mesh.points, order=1)
