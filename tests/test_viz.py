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
