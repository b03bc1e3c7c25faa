"""Tests for reference-parity wrappers and dataset export."""
import numpy as np
import pytest

from multimesh_tpu import testing as mmt
from multimesh_tpu.engine import (
    get_element_weights, get_element_weights_layered,
)
from multimesh_tpu.io import SalvusMesh
from multimesh_tpu.ops import mesh_layer_masks, unique_points_per_layer
from multimesh_tpu.search.knn import knn
from multimesh_tpu.utils import create_dataset


def test_get_element_weights_contract(rng):
    mesh = mmt.box_mesh(shape=(3, 3, 3), order=2, warp=0.05)
    field = mmt.element_nodal_field(mesh, "smooth")
    inside = rng.uniform(0.1, 0.9, size=(100, 3))
    outside = rng.uniform(1.5, 1.8, size=(20, 3))
    pts = np.concatenate([inside, outside])

    elems, coeffs = get_element_weights(
        mesh.points, 2, mesh.centroids(), pts, snap_to_nearest=False
    )
    assert elems.shape == (120,)
    assert coeffs.shape == (120, 27)
    assert (elems[:100] >= 0).all()
    assert (elems[100:] == -1).all()
    assert np.all(coeffs[100:] == 0.0)
    vals = np.einsum("pn,pn->p", coeffs[:100], field[elems[:100]])
    truth = mmt.smooth_field(inside)
    # order-2 discretization accuracy on a warped 3x3x3 mesh
    np.testing.assert_allclose(vals, truth, atol=2e-2)

    elems2, coeffs2 = get_element_weights(
        mesh.points, 2, mesh.centroids(), pts, snap_to_nearest=True
    )
    assert (elems2 >= 0).all()


def test_get_element_weights_layered_contract(tmp_path, rng):
    mesh = mmt.shell_mesh(n_lat=3, n_lon=4, n_rad=4, order=2, n_layers=2)
    path = tmp_path / "m.h5"
    mmt.write_salvus_fixture(path, mesh, parameters=("VP",))
    sm = SalvusMesh(path, fast_mode=False)
    masks, ids = mesh_layer_masks(sm, "all")
    uniq = unique_points_per_layer(sm.points, masks)
    nearest = {}
    for layer, m in masks.items():
        cents = sm.points[m].mean(axis=1)
        _, idx = knn(cents, uniq[layer][0], min(8, len(cents)))
        nearest[layer] = np.asarray(idx)
    elems, coeffs = get_element_weights_layered(
        uniq, nearest, sm, masks, from_gll_order=2
    )
    field = sm.get_element_nodal_fields()["VP"]
    for layer in masks:
        assert elems[layer].shape[0] == uniq[layer][0].shape[0]
        assert coeffs[layer].shape[1] == 27
        assert (elems[layer] >= 0).all()
        # the weights must actually interpolate the field, not merely
        # have the right shape (elems index into the LAYER's elements)
        vals = np.einsum(
            "pn,pn->p", coeffs[layer], field[masks[layer]][elems[layer]]
        )
        truth = mmt.smooth_field(uniq[layer][0])
        np.testing.assert_allclose(vals, truth, atol=2e-2)


def test_create_dataset(tmp_path):
    mesh = mmt.shell_mesh(n_lat=3, n_lon=3, n_rad=4, order=2, n_layers=2)
    path = tmp_path / "m.h5"
    mmt.write_salvus_fixture(path, mesh, parameters=("VP", "VS"))

    ds = create_dataset(str(path), layers="all", coords="cartesian")
    assert set(ds.data) == {"VP", "VS"}  # z_node_1D excluded
    assert ds.gll_order == 2
    assert ds["VP"].shape == (mesh.nelem, 27)
    np.testing.assert_allclose(ds.coords["x"], mesh.points[..., 0])

    # masked to one layer
    ds1 = create_dataset(str(path), layers=[2], coords="spherical")
    n_layer2 = int((mesh.layer_id == 2).sum())
    assert ds1["VP"].shape == (n_layer2, 27)
    assert set(ds1.coords) == {"radius", "colatitude", "longitude"}
    with pytest.raises(ValueError):
        create_dataset(str(path), coords="cylindrical")


def test_create_dataset_fast_mode_mesh_and_layer_membership(tmp_path):
    """A fast_mode SalvusMesh object (lazy, empty raw field dict) must
    still yield a populated dataset; an in-range layer id that is absent
    from the mesh must be rejected by membership, not range."""
    from multimesh_tpu.io import SalvusMesh
    from multimesh_tpu.ops.layers import resolve_layers

    mesh = mmt.shell_mesh(n_lat=3, n_lon=3, n_rad=4, order=2, n_layers=2)
    path = tmp_path / "m.h5"
    mmt.write_salvus_fixture(path, mesh, parameters=("VP",))

    m = SalvusMesh(path)  # fast_mode=True by default
    ds = create_dataset(m, layers="all", coords="cartesian")
    assert set(ds.data) == {"VP"}
    assert ds["VP"].shape == (mesh.nelem, 27)
    assert ds.gll_order == 2

    # non-contiguous layer ids: 4 is inside [min, max] but not present
    layer_field = np.array([7, 5, 3, 3, 5, 7])
    ids, _ = resolve_layers(layer_field, [5])
    assert ids.tolist() == [5]
    with pytest.raises(ValueError, match="not all in mesh"):
        resolve_layers(layer_field, [4])
