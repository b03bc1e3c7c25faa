"""Plotting tests (headless Agg; cartopy-free fallback paths)."""
import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

from multimesh_tpu import api
from multimesh_tpu import testing as mmt
from multimesh_tpu.viz import (
    get_colormap, roma, elliptic_to_geocentric_latitude, locations2degrees,
)


@pytest.fixture(scope="module")
def global_mesh(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("viz")
    mesh = mmt.shell_mesh(n_lat=8, n_lon=16, n_rad=2, order=2,
                          r_inner=3.0e6, r_outer=6.371e6,
                          lat_extent=(0.05, 3.09),
                          lon_extent=(-3.14, 3.14))
    path = tmp / "m.h5"
    mmt.write_salvus_fixture(path, mesh, parameters=("VSV", "VSH"))
    return str(path)


def test_get_colormap():
    cm = get_colormap("roma")
    assert cm(0.0) != cm(1.0)
    cm_r = get_colormap("roma", reverse=True)
    np.testing.assert_allclose(cm(0.0), cm_r(1.0), atol=1e-6)
    assert get_colormap("viridis").name == "viridis"
    # unknown cmasher-style names fall back gracefully
    assert get_colormap("chroma") is not None
    assert get_colormap(roma) is roma


def test_latitude_correction():
    assert elliptic_to_geocentric_latitude(0.0) == 0.0
    assert abs(elliptic_to_geocentric_latitude(90.0) - 90.0) < 1e-9
    # at 45 deg the correction is ~ -0.19 deg
    assert -0.22 < elliptic_to_geocentric_latitude(45.0) - 45.0 < -0.15


def test_locations2degrees():
    assert abs(locations2degrees(0, 0, 0, 90) - 90.0) < 1e-9
    assert abs(locations2degrees(90, 0, -90, 0) - 180.0) < 1e-9


def test_plot_depth_slice(global_mesh, tmp_path):
    fig = api.plot_depth_slice(
        mesh=global_mesh,
        depth_in_km=500.0,
        num=12,
        parameter_to_plot="VSV",
        savefig=True,
        figname=str(tmp_path / "slice.png"),
    )
    assert (tmp_path / "slice.png").stat().st_size > 1000


def test_plot_depth_slice_diff_percentage(global_mesh, tmp_path):
    api.plot_depth_slice(
        mesh=global_mesh,
        depth_in_km=500.0,
        num=10,
        plot_diff_percentage=True,
        parameter_to_plot="VSH",
        savefig=True,
        figname=str(tmp_path / "dev.png"),
        title="deviations",
    )
    assert (tmp_path / "dev.png").exists()


def test_plot_cross_section(global_mesh, tmp_path):
    api.plot_cross_section(
        mesh=global_mesh,
        point_1_lat=-20, point_1_lng=30,
        point_2_lat=20, point_2_lng=60,
        max_depth_in_km=2500, nrads=20, npoints=30,
        filename=str(tmp_path / "xsec.png"),
        param_to_interp="VSV",
    )
    assert (tmp_path / "xsec.png").stat().st_size > 1000


def test_find_good_projection_without_cartopy():
    # cartopy absent in this image: must return None, not crash
    proj = api.find_good_projection(lat_extent=(-90, 90),
                                    lon_extent=(-180, 180))
    try:
        import cartopy  # noqa: F401

        assert proj is not None
    except ImportError:
        assert proj is None


# ---------------------------------------------------------------------------
# Stub-cartopy coverage: the real package is absent in this image, so the
# cartopy code path (projection table, GeoAxes plotting with transform=,
# coastlines/borders/stock_img) never executes otherwise.  A minimal stand-in
# implementing matplotlib's `_as_mpl_axes` projection protocol exercises it.
# ---------------------------------------------------------------------------

class _StubGeoAxes(matplotlib.axes.Axes):
    name = "mmt_stub_geo"
    last_calls: list = []

    def __init__(self, *args, map_projection=None, **kw):
        self.projection = map_projection
        super().__init__(*args, **kw)

    def stock_img(self):
        _StubGeoAxes.last_calls.append("stock_img")

    def coastlines(self, *a, **k):
        _StubGeoAxes.last_calls.append("coastlines")

    def add_feature(self, feature, *a, **k):
        _StubGeoAxes.last_calls.append(("add_feature", feature))

    def pcolormesh(self, *a, transform=None, **k):
        _StubGeoAxes.last_calls.append(
            ("pcolormesh", type(transform).__name__))
        k.setdefault("shading", "auto")
        return super().pcolormesh(*a, **k)


class _StubCRS:
    def __init__(self, central_longitude=0.0, central_latitude=0.0, **kw):
        self.central_longitude = central_longitude
        self.central_latitude = central_latitude
        self.kwargs = kw

    def _as_mpl_axes(self):
        return _StubGeoAxes, {"map_projection": self}


@pytest.fixture()
def stub_cartopy(monkeypatch):
    import sys
    import types

    crs = types.ModuleType("cartopy.crs")
    for name in ("PlateCarree", "Mollweide", "Robinson", "Orthographic",
                 "Mercator", "NorthPolarStereo", "NearsidePerspective"):
        setattr(crs, name, type(name, (_StubCRS,), {}))
    feature = types.ModuleType("cartopy.feature")
    feature.BORDERS = object()
    pkg = types.ModuleType("cartopy")
    pkg.crs = crs
    pkg.feature = feature
    monkeypatch.setitem(sys.modules, "cartopy", pkg)
    monkeypatch.setitem(sys.modules, "cartopy.crs", crs)
    monkeypatch.setitem(sys.modules, "cartopy.feature", feature)
    _StubGeoAxes.last_calls = []
    return crs


def test_create_projection_table(stub_cartopy):
    from multimesh_tpu.viz.plotter import create_projection

    # explicit names
    p = create_projection("Mollweide", central_longitude=40.0)
    assert type(p).__name__ == "Mollweide" and p.central_longitude == 40.0
    p = create_projection("NearsidePerspective", central_latitude=10.0,
                          satellite_height=2e7)
    assert p.kwargs["satellite_height"] == 2e7
    # extent-based default choice (reference plotter.py:212-306 semantics)
    assert type(create_projection(
        "default", lat_extent=(-90, 90), lon_extent=(-180, 180),
    )).__name__ == "Robinson"
    assert type(create_projection(
        "default", lat_extent=(-60, 60), lon_extent=(-20, 20),
    )).__name__ == "Orthographic"
    assert type(create_projection(
        "default", lat_extent=(-20, 20), lon_extent=(-30, 30),
    )).__name__ == "Mercator"
    with pytest.raises(ValueError, match="Cartopy"):
        create_projection("hammer")


def test_plot_depth_slice_cartopy_branch(global_mesh, tmp_path,
                                         stub_cartopy):
    fig = api.plot_depth_slice(
        mesh=global_mesh,
        depth_in_km=500.0,
        num=10,
        parameter_to_plot="VSV",
        projection="Robinson",
        coastlines=True,
        borders=True,
        stock_img=True,
        savefig=True,
        figname=str(tmp_path / "geo.png"),
    )
    assert (tmp_path / "geo.png").stat().st_size > 1000
    calls = _StubGeoAxes.last_calls
    assert "stock_img" in calls and "coastlines" in calls
    assert any(c[0] == "add_feature" for c in calls if isinstance(c, tuple))
    # data went through ax.pcolormesh with a PlateCarree transform
    assert ("pcolormesh", "PlateCarree") in calls
    assert type(fig.axes[0]).__name__ == "_StubGeoAxes"


def test_plot_depth_slice_projection_object(global_mesh, tmp_path,
                                            stub_cartopy):
    # a ready CRS object (not a name) must be used verbatim, not replaced
    # by the extent-derived default
    proj = stub_cartopy.Mollweide(central_longitude=120.0)
    fig = api.plot_depth_slice(
        mesh=global_mesh,
        depth_in_km=500.0,
        num=8,
        parameter_to_plot="VSV",
        projection=proj,
        savefig=True,
        figname=str(tmp_path / "obj.png"),
    )
    assert fig.axes[0].projection is proj


def test_get_colormap_reverse_objects_and_reversed_names():
    """reverse=True applies to ready Colormap objects and un-stacks an
    already-reversed name instead of building 'roma_r_r'."""
    from multimesh_tpu.viz.colormaps import roma, roma_r

    rev = get_colormap(roma, reverse=True)
    np.testing.assert_allclose(rev(0.0), roma(1.0), atol=1e-6)
    assert get_colormap("roma_r", reverse=True) is roma
    assert get_colormap("roma_r") is roma_r
