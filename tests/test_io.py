"""Round-trip tests for Salvus HDF5 and Exodus NetCDF I/O."""
import numpy as np
import pytest

from multimesh_tpu import testing as mmt
from multimesh_tpu.io import (
    SalvusMesh, write_salvus_mesh, load_hdf5_params, Exodus, write_exodus,
    format_dim_label, parse_dim_label,
)


def test_dim_label_roundtrip():
    params = ["VPV", "VPH", "RHO", "QKAPPA"]
    assert format_dim_label(params) == "[ VPV | VPH | RHO | QKAPPA ]"
    assert parse_dim_label(format_dim_label(params)) == params
    assert parse_dim_label(format_dim_label(params).encode()) == params


def test_salvus_roundtrip(tmp_path):
    mesh = mmt.shell_mesh(n_lat=3, n_lon=3, n_rad=2, order=2, n_layers=2)
    path = tmp_path / "mesh.h5"
    nodal = mmt.write_salvus_fixture(
        path, mesh, parameters=("VP", "VS"),
        global_strings={"moho_idx": "1"},
    )

    sm = SalvusMesh(path, fast_mode=False)
    assert sm.nelem == mesh.nelem
    assert sm.n_gll_points == 27
    assert sm.shape_order == 2
    assert sm.dimensions == 3
    np.testing.assert_allclose(sm.points, mesh.points)
    assert sm.nodal_parameter_indices == ["VP", "VS", "z_node_1D"]
    assert sm.elemental_parameter_indices == ["fluid", "layer"]
    np.testing.assert_allclose(sm.element_nodal_fields["VS"], nodal["VS"])
    np.testing.assert_allclose(sm.elemental_fields["layer"], mesh.layer_id)
    assert sm.global_strings["moho_idx"] in (b"1", np.bytes_(b"1"))
    np.testing.assert_allclose(
        sm.get_element_centroids(), mesh.points.mean(axis=1)
    )

    # write-back of an existing field
    new_vs = nodal["VS"] * 2.0
    sm.attach_field("VS", new_vs)
    sm2 = SalvusMesh(path, fast_mode=False)
    np.testing.assert_allclose(sm2.element_nodal_fields["VS"], new_vs)

    # attach of unknown or mis-shaped field fails loudly
    with pytest.raises(ValueError):
        sm.attach_field("NOPE", new_vs)
    with pytest.raises(ValueError):
        sm.attach_field("VS", new_vs[:, :2])

    # global string update
    sm.set_global_string("moho_idx", "2")
    assert SalvusMesh(path).global_strings["moho_idx"] in (
        b"2", np.bytes_(b"2"), b"2"
    )


def test_load_hdf5_params_strips_grad(tmp_path):
    mesh = mmt.box_mesh(shape=(2, 2, 2), order=1)
    path = tmp_path / "m.h5"
    write_salvus_mesh(
        path, mesh.points,
        {"gradVP": mmt.element_nodal_field(mesh)},
    )
    pts, data, params = load_hdf5_params(path)
    assert params == ["VP"]
    assert data.shape == (mesh.nelem, 1, 8)


def test_exodus_roundtrip(tmp_path):
    mesh = mmt.box_mesh(shape=(3, 2, 2), order=1)
    path = tmp_path / "mesh.e"
    nodal = mmt.write_exodus_fixture(path, mesh, parameters=("VP", "RHO"))

    e = Exodus(path)
    assert e.nelem == mesh.nelem
    assert e.nodes_per_element == 8
    assert e.ndim == 3
    np.testing.assert_allclose(e.points, mesh.vertices)
    assert e.nodal_parameters == ["VP", "RHO"]
    assert e.elem_var_names == ["something_elemental"]
    np.testing.assert_allclose(e.get_nodal_field("RHO"), nodal["RHO"])
    np.testing.assert_allclose(
        e.get_element_field("something_elemental"),
        np.arange(mesh.nelem, dtype=float),
    )
    # canonical corner nodes must match the fixture's element corners
    from multimesh_tpu.core import gll

    ci = gll.corner_indices(mesh.order, 3)
    np.testing.assert_allclose(
        e.canonical_corner_nodes(), mesh.points[:, ci, :]
    )
    # centroids from corner mean
    np.testing.assert_allclose(
        e.get_element_centroid(), mesh.vertices[mesh.connectivity].mean(1)
    )

    # write-back
    with pytest.raises(PermissionError):
        e.attach_field("VP", nodal["VP"] * 2)
    ea = Exodus(path, mode="a")
    ea.attach_field("VP", nodal["VP"] * 2)
    np.testing.assert_allclose(
        Exodus(path).get_nodal_field("VP"), nodal["VP"] * 2
    )


def test_exodus_2d(tmp_path):
    mesh = mmt.box_mesh(shape=(3, 3), order=1)
    path = tmp_path / "mesh2d.e"
    mmt.write_exodus_fixture(path, mesh, parameters=("V",))
    e = Exodus(path)
    assert e.ndim == 2
    assert e.nodes_per_element == 4
    np.testing.assert_allclose(e.points, mesh.vertices)
    from multimesh_tpu.core import gll

    ci = gll.corner_indices(mesh.order, 2)
    np.testing.assert_allclose(
        e.canonical_corner_nodes(), mesh.points[:, ci, :]
    )


def test_exodus_attach_new_variable(tmp_path):
    """Attaching an undeclared variable declares it on the fly (the
    reference's pyexodus creates variables on put -- gradients are
    attached to viz meshes that never had them)."""
    mesh = mmt.box_mesh(shape=(3, 3, 3), order=1)
    path = tmp_path / "mesh.e"
    mmt.write_exodus_fixture(path, mesh, parameters=("VP",))
    ea = Exodus(path, mode="a")
    old_vp = ea.get_nodal_field("VP")

    grad = np.linspace(0.0, 1.0, ea.npoint)
    ea.attach_field("GRAD_VS", grad)  # new nodal variable
    fluid = np.arange(ea.nelem, dtype=np.float64)
    ea.attach_field("fluid", fluid)  # new elemental variable

    e2 = Exodus(path)
    assert "GRAD_VS" in e2.nodal_parameters
    assert "fluid" in e2.elem_var_names
    np.testing.assert_allclose(e2.get_nodal_field("GRAD_VS"), grad)
    np.testing.assert_allclose(e2.get_element_field("fluid"), fluid)
    # pre-existing data survives the header rewrite
    np.testing.assert_allclose(e2.get_nodal_field("VP"), old_vp)
    np.testing.assert_allclose(e2.points, mesh.vertices)
    np.testing.assert_allclose(e2.connectivity, ea.connectivity)


def test_exodus_declare_refuses_unmodeled_files(tmp_path):
    """A file holding structures the minimal writer does not model (side
    sets etc.) must refuse attach-field auto-declare instead of silently
    rewriting them away."""
    from scipy.io import netcdf_file

    mesh = mmt.box_mesh(shape=(3, 3, 3), order=1)
    path = tmp_path / "mesh.e"
    mmt.write_exodus_fixture(path, mesh, parameters=("VP",))
    with netcdf_file(str(path), "a", mmap=False) as f:
        f.createDimension("num_side_sets", 1)
        v = f.createVariable("elem_ss1", "i", ("num_side_sets",))
        v[:] = np.array([1], np.int32)
    ea = Exodus(path, mode="a")
    # in-place write of an EXISTING variable still works
    ea.attach_field("VP", ea.get_nodal_field("VP") * 2)
    with pytest.raises(KeyError, match="does not model"):
        ea.attach_field("NEW_VAR", np.zeros(ea.npoint))
