"""Tests for geometry/misc utils."""
import numpy as np
import pytest

from multimesh_tpu import utils
from multimesh_tpu.config import R_EARTH_M


def test_pick_parameters():
    assert utils.pick_parameters("TTI") == [
        "VPV", "VPH", "VSV", "VSH", "RHO", "ETA", "QKAPPA", "QMU",
    ]
    assert utils.pick_parameters("ISO") == [
        "QKAPPA", "QMU", "RHO", "VP", "VS",
    ]
    assert utils.pick_parameters(["A", "B"]) == ["A", "B"]
    assert utils.pick_parameters("WEIRD") == ["WEIRD"]


def test_sph_cart_roundtrip(rng):
    col = rng.uniform(0.01, np.pi - 0.01, 100)
    lon = rng.uniform(-np.pi, np.pi, 100)
    rad = rng.uniform(1e5, 7e6, 100)
    x, y, z = utils.sph2cart(col, lon, rad)
    c2, l2, r2 = utils.cart2sph(x, y, z)
    np.testing.assert_allclose(c2, col, atol=1e-12)
    np.testing.assert_allclose(l2, lon, atol=1e-12)
    np.testing.assert_allclose(r2, rad, rtol=1e-12)
    with pytest.raises(ValueError):
        utils.sph2cart(np.array([-0.1]), np.array([0.0]), np.array([1.0]))


def test_cart2sph_origin_safe():
    c, l, r = utils.cart2sph(0.0, 0.0, 0.0)
    assert np.isfinite(c) and np.isfinite(l) and r == 0


def test_latlondepth_to_xyz():
    # north pole at zero depth
    xyz = utils.latlondepth_to_xyz(np.array([[90.0, 0.0, 0.0]]))
    np.testing.assert_allclose(xyz, [[0, 0, R_EARTH_M]], atol=1e-6)
    # equator, lon 90, 1000 km depth
    xyz = utils.latlondepth_to_xyz(np.array([[0.0, 90.0, 1e6]]))
    np.testing.assert_allclose(xyz, [[0, R_EARTH_M - 1e6, 0]], atol=1e-6)


def test_rot_matrix_properties(rng):
    m = utils.get_rot_matrix(0.7, 1.0, 2.0, -0.5)
    np.testing.assert_allclose(m @ m.T, np.eye(3), atol=1e-12)
    np.testing.assert_allclose(np.linalg.det(m), 1.0, atol=1e-12)
    # rotation about z by 90 deg maps x->y
    mz = utils.get_rot_matrix(np.pi / 2, 0, 0, 1.0)
    np.testing.assert_allclose(mz @ [1, 0, 0], [0, 1, 0], atol=1e-12)


def test_rotate_mesh_roundtrip(tmp_path):
    from multimesh_tpu import testing as mmt
    from multimesh_tpu.io import Exodus
    from multimesh_tpu.io.exodus import write_exodus

    mesh = mmt.box_mesh(shape=(2, 2, 2), order=1)
    p = tmp_path / "rot.e"
    write_exodus(p, mesh.vertices, mesh.connectivity, {"V": np.zeros(27)})
    orig = Exodus(p).points.copy()
    event = (0.3, 1.1)  # radians, as in the reference
    utils.rotate_mesh(p, event)
    rotated = Exodus(p).points.copy()
    assert not np.allclose(rotated, orig)
    # norms preserved
    np.testing.assert_allclose(
        np.linalg.norm(rotated, axis=1), np.linalg.norm(orig, axis=1),
        atol=1e-12,
    )
    utils.rotate_mesh(p, event, backwards=True)
    np.testing.assert_allclose(Exodus(p).points, orig, atol=1e-12)


def test_greatcircle_points():
    pts = utils.greatcircle_points(0.0, 0.0, 0.0, 90.0, npts=10)
    assert pts.shape == (10, 2)
    # along the equator: lats stay ~0, lons increase toward (excl.) 90
    np.testing.assert_allclose(pts[:, 0], 0.0, atol=1e-9)
    np.testing.assert_allclose(pts[:, 1], np.arange(10) * 9.0, atol=1e-9)
    with pytest.raises(ValueError):
        utils.greatcircle_points(0, 0, 1, 1, npts=2)


def test_regular_grid_dataset_roundtrip(tmp_path):
    lat = np.linspace(-10, 10, 5)
    lon = np.linspace(0, 30, 7)
    depth = np.linspace(0, 1e5, 3)
    ds = utils.create_dataset_grid(lat, lon, depth)
    ds.data["VP"] = np.arange(3 * 5 * 7, dtype=float).reshape(3, 5, 7)
    p = tmp_path / "grid.nc"
    ds.to_netcdf(p)
    back = utils.RegularGridData.from_netcdf(p)
    np.testing.assert_allclose(back["VP"], ds["VP"])
    np.testing.assert_allclose(back.lat, lat)
    np.testing.assert_allclose(back.depth, depth)


def test_regular_grid_netcdf4_hdf5_layout(tmp_path):
    """The default NETCDF4 flavor (matching the reference's xarray
    to_netcdf output, reference api.py:639-642) must be an HDF5 file
    using the netCDF4 dimension-scale convention, and round-trip."""
    import h5py

    lat = np.linspace(-10, 10, 5)
    lon = np.linspace(0, 30, 7)
    depth = np.linspace(0, 1e5, 3)
    ds = utils.create_dataset_grid(lat, lon, depth)
    ds.data["VP"] = np.arange(3 * 5 * 7, dtype=float).reshape(3, 5, 7)
    p = tmp_path / "grid4.nc"
    ds.to_netcdf(p, format="NETCDF4")

    with open(p, "rb") as fh:
        assert fh.read(8) == b"\x89HDF\r\n\x1a\n"
    with h5py.File(p, "r") as f:
        # coordinate variables are HDF5 dimension scales...
        assert f["latitude"].attrs["CLASS"] == b"DIMENSION_SCALE"
        # ...and the data variable's axes are attached to them
        assert f["VP"].dims[0][0] == f["depth"]
        assert f["VP"].dims[1][0] == f["latitude"]
        assert f["VP"].dims[2][0] == f["longitude"]
        assert f["latitude"].attrs["units"] == "deg"
    back = utils.RegularGridData.from_netcdf(p)
    np.testing.assert_allclose(back["VP"], ds["VP"])
    np.testing.assert_allclose(back.lon, lon)

    # the classic flavor still round-trips through the same reader
    p3 = tmp_path / "grid3.nc"
    ds.to_netcdf(p3, format="NETCDF3_64BIT")
    back3 = utils.RegularGridData.from_netcdf(p3)
    np.testing.assert_allclose(back3["VP"], ds["VP"])


def test_to_xarray_with_stub(monkeypatch, tmp_path):
    """xarray is absent in this image; a stub records what to_xarray would
    hand a real xarray.Dataset (dims/coords/attrs layout, reference
    utils.py:619-646)."""
    import sys
    import types

    class _StubVar:
        def __init__(self):
            self.attrs = {}

    class _StubDataset:
        def __init__(self, data_vars, coords=None, attrs=None):
            self.data_vars = dict(data_vars)
            self.coords = dict(coords or {})
            self.attrs = dict(attrs or {})
            for name in list(self.data_vars) + list(self.coords):
                setattr(self, name, _StubVar())

    xr = types.ModuleType("xarray")
    xr.Dataset = _StubDataset
    monkeypatch.setitem(sys.modules, "xarray", xr)

    lat = np.linspace(-10, 10, 5)
    lon = np.linspace(20, 40, 7)
    depth = np.linspace(0, 1e5, 3)
    vp = np.arange(3 * 5 * 7, dtype=float).reshape(3, 5, 7)
    ds = utils.RegularGridData(lat=lat, lon=lon, depth=depth,
                               data={"VP": vp})
    x = ds.to_xarray()
    dims, arr = x.data_vars["VP"]
    assert dims == ["depth", "latitude", "longitude"]
    np.testing.assert_allclose(arr, vp)
    assert set(x.coords) == {"depth", "latitude", "longitude"}
    assert x.attrs["radius_in_meters"] == R_EARTH_M
    assert x.depth.attrs["units"] == "m"
    assert x.latitude.attrs["units"] == "deg"

    md = utils.MeshDataset(
        data={"VSV": vp.reshape(15, 7)},
        coords={"x": vp.reshape(15, 7)},
        gll_order=4, coord_type="cartesian",
    )
    mx = md.to_xarray()
    assert mx.data_vars["VSV"][0] == ["element", "point"]
    assert mx.attrs["gll_order"] == 4
