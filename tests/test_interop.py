"""External-tooling interop: golden structural checks + real-consumer
round-trips (VERDICT r3 item 9 / PARITY "known gaps").

The written NETCDF4 / NETCDF3 / Salvus-HDF5 files are validated two
ways: (a) STRUCTURAL golden assertions against the raw on-disk layout
(h5py dimension-scale conventions, scipy netcdf3 records, Salvus
DIMENSION_LABELS) which always run, and (b) read-back through the real
consumers (xarray, netCDF4-python, h5netcdf) which run when those
packages are importable and skip otherwise -- this CI image carries
none of them, a user environment typically does."""
import numpy as np
import pytest

from multimesh_tpu.utils import RegularGridData


@pytest.fixture
def grid():
    rng = np.random.default_rng(3)
    lat = np.linspace(-30.0, 30.0, 7)
    lon = np.linspace(10.0, 80.0, 9)
    depth = np.array([0.0, 50e3, 200e3])
    data = {
        "VP": rng.normal(8000.0, 100.0, (3, 7, 9)),
        "VS": rng.normal(4500.0, 80.0, (3, 7, 9)),
    }
    return RegularGridData(lat=lat, lon=lon, depth=depth, data=data)


def test_netcdf4_dimension_scale_golden_layout(grid, tmp_path):
    """The NETCDF4 writer must emit the exact HDF5 dimension-scale
    conventions netCDF4-python/h5netcdf/xarray key on: coordinate
    datasets are DIMENSION_SCALEs, data variables carry DIMENSION_LIST
    references resolving to them (reference produces this layout via
    xarray.Dataset.to_netcdf, reference api.py:639-642)."""
    import h5py

    path = tmp_path / "g.nc"
    grid.to_netcdf(path, format="NETCDF4")
    with h5py.File(path, "r") as f:
        for name in ("depth", "latitude", "longitude"):
            ds = f[name]
            assert ds.attrs["CLASS"] == b"DIMENSION_SCALE"
            # the scale's NAME is the netCDF dimension name
            assert bytes(ds.attrs["NAME"]).startswith(name.encode())
            assert "units" in ds.attrs
        for var in ("VP", "VS"):
            v = f[var]
            assert v.shape == (3, 7, 9)
            assert "DIMENSION_LIST" in v.attrs
            # each axis's attached scale resolves to the right coord
            for ax, dim in enumerate(("depth", "latitude", "longitude")):
                scales = [s for s in v.dims[ax].values()]
                assert len(scales) == 1
                assert scales[0].name == f"/{dim}"
        assert float(f.attrs["radius_in_meters"]) > 6e6


def test_netcdf3_classic_golden_layout(grid, tmp_path):
    """The classic-NetCDF writer emits real v2 records scipy can read
    raw (dims, doubles, units attributes, global attr)."""
    from scipy.io import netcdf_file

    path = tmp_path / "g3.nc"
    grid.to_netcdf(path, format="NETCDF3_64BIT")
    with open(path, "rb") as fh:
        assert fh.read(4) in (b"CDF\x01", b"CDF\x02")
    with netcdf_file(str(path), "r", mmap=False) as f:
        assert set(f.dimensions) == {"depth", "latitude", "longitude"}
        assert f.dimensions["latitude"] == 7
        v = f.variables["VP"]
        assert v.data.shape == (3, 7, 9)
        assert f.variables["latitude"].units == b"deg"
        np.testing.assert_allclose(f.variables["VP"][:], grid["VP"])
        assert float(f.radius_in_meters) > 6e6


@pytest.mark.parametrize("fmt", ["NETCDF4", "NETCDF3_64BIT"])
def test_xarray_reads_written_netcdf(grid, tmp_path, fmt):
    """Round-trip through the real xarray (skips where not installed)."""
    xr = pytest.importorskip("xarray")

    path = tmp_path / "g.nc"
    grid.to_netcdf(path, format=fmt)
    ds = xr.open_dataset(path)
    np.testing.assert_allclose(ds["latitude"].values, grid.lat)
    np.testing.assert_allclose(ds["longitude"].values, grid.lon)
    np.testing.assert_allclose(ds["depth"].values, grid.depth)
    np.testing.assert_allclose(ds["VP"].values, grid["VP"])
    assert tuple(ds["VP"].dims) == ("depth", "latitude", "longitude")
    assert ds["latitude"].attrs.get("units") == "deg"
    ds.close()


def test_netcdf4_python_reads_written_netcdf(grid, tmp_path):
    """Round-trip through netCDF4-python (skips where not installed)."""
    nc = pytest.importorskip("netCDF4")

    path = tmp_path / "g.nc"
    grid.to_netcdf(path, format="NETCDF4")
    ds = nc.Dataset(str(path))
    assert set(ds.dimensions) >= {"depth", "latitude", "longitude"}
    np.testing.assert_allclose(ds["VP"][:], grid["VP"])
    assert ds["latitude"].units == "deg"
    ds.close()


def test_to_xarray_dataset(grid):
    """Direct conversion to a real xarray.Dataset (reference
    extract_regular_grid returns one, interpolator.py:1638-1646)."""
    xr = pytest.importorskip("xarray")

    ds = grid.to_xarray()
    assert isinstance(ds, xr.Dataset)
    np.testing.assert_allclose(ds["VS"].values, grid["VS"])
    assert ds.attrs["radius_in_meters"] > 6e6


def test_salvus_mesh_golden_layout(tmp_path):
    """A written Salvus mesh must carry the exact HDF5 surface the
    Salvus reader keys on: MODEL/coordinates + MODEL/data with the
    '[ A | B ]' DIMENSION_LABELS convention (reference utils.py:165),
    element/point dim labels, and bytes-typed global string attrs."""
    import h5py

    from multimesh_tpu import testing as mmt
    from multimesh_tpu.io import salvus as sio

    mesh = mmt.box_mesh(shape=(2, 2, 2), order=2)
    field = mmt.element_nodal_field(mesh, "smooth")
    path = tmp_path / "m.h5"
    sio.write_salvus_mesh(
        path, mesh.points, {"VP": field, "RHO": 2.0 * field},
        elemental_fields={"fluid": np.zeros(mesh.nelem)},
        global_strings={"attribution": "mmt"},
    )
    with h5py.File(path, "r") as f:
        pts = f["MODEL/coordinates"]
        data = f["MODEL/data"]
        assert pts.shape == (mesh.nelem, 27, 3)
        assert pts.dtype == np.float64
        assert data.shape == (mesh.nelem, 2, 27)
        labels = data.attrs["DIMENSION_LABELS"]
        lab1 = labels[1]
        lab1 = lab1.decode() if isinstance(lab1, bytes) else lab1
        assert lab1 == "[ VP | RHO ]"
        ed = f["MODEL/element_data"]
        elab = ed.attrs["DIMENSION_LABELS"][1]
        elab = elab.decode() if isinstance(elab, bytes) else elab
        assert "fluid" in elab
        attribution = f["MODEL"].attrs["attribution"]
        assert isinstance(attribution, bytes)
    # and the package's own reader round-trips it
    m = sio.SalvusMesh(path)
    np.testing.assert_allclose(
        m.get_element_nodal_fields()["RHO"], 2.0 * field
    )
