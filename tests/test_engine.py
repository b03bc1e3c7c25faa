"""End-to-end transfer pipeline tests: file -> engine -> file, vs oracle.

This is the integration layer of the test strategy (SURVEY.md section 4):
synthetic Salvus-format HDF5 and Exodus fixtures driving the full
pipelines, validated against the independent NumPy/SciPy oracle and
analytic truths.
"""
import numpy as np
import pytest

from multimesh_tpu import api
from multimesh_tpu import engine
from multimesh_tpu import testing as mmt
from multimesh_tpu.io import SalvusMesh, Exodus

from oracle import interpolate_np


@pytest.fixture
def shell_pair(tmp_path):
    """Source (finer) and target (coarser, strictly interior) shell meshes
    written as Salvus HDF5 files."""
    src = mmt.shell_mesh(n_lat=5, n_lon=5, n_rad=3, order=4,
                         lat_extent=(0.5, 1.2), lon_extent=(0.3, 1.4))
    tgt = mmt.shell_mesh(n_lat=3, n_lon=3, n_rad=2, order=4,
                         r_inner=3.6e6, r_outer=6.3e6,
                         lat_extent=(0.55, 1.15), lon_extent=(0.35, 1.35))
    src_path = tmp_path / "src.h5"
    tgt_path = tmp_path / "tgt.h5"
    src_fields = mmt.write_salvus_fixture(src_path, src,
                                          parameters=("VP", "VS", "RHO"))
    mmt.write_salvus_fixture(tgt_path, tgt, parameters=("VP", "VS", "RHO"))
    return src, tgt, src_path, tgt_path, src_fields


def test_gll_2_gll_end_to_end(shell_pair, tmp_path):
    src, tgt, src_path, tgt_path, src_fields = shell_pair
    cache = tmp_path / "stored"

    api.gll_2_gll(from_gll=str(src_path), to_gll=str(tgt_path),
                  stored_array=str(cache))

    out = SalvusMesh(tgt_path, fast_mode=False)
    assert out.nodal_parameter_indices == ["VP", "VS", "RHO", "z_node_1D"]

    # accuracy vs the independent oracle on a sample of target nodes
    sample = np.random.default_rng(0).choice(
        tgt.nelem * tgt.n_gll, size=400, replace=False
    )
    pts = tgt.points.reshape(-1, 3)[sample]
    oracle_vals, _ = interpolate_np(
        pts, src.points, src_fields["VS"], order=4
    )
    mine = out.element_nodal_fields["VS"].reshape(-1)[sample]
    rel = np.max(np.abs(mine - oracle_vals) / np.abs(oracle_vals))
    assert rel < 1e-6, f"max rel err vs oracle {rel:.3e}"

    # cached operator reproduces the result bit-for-bit
    mmt.write_salvus_fixture(tgt_path, tgt, parameters=("VP", "VS", "RHO"))
    api.gll_2_gll(from_gll=str(src_path), to_gll=str(tgt_path),
                  stored_array=str(cache))
    out2 = SalvusMesh(tgt_path, fast_mode=False)
    np.testing.assert_array_equal(
        out2.element_nodal_fields["VS"].reshape(-1)[sample], mine
    )

    # prove the cache is actually READ on a hit (a deterministic rebuild
    # would also be bit-identical): swap the compact cache for a dense
    # one with doubled coefficients and check the doubled values flow
    # through to the output
    from multimesh_tpu.ops import TransferOperator

    cached_op = TransferOperator.load(cache)
    np.save(cache / "coeffs.npy", 2.0 * np.asarray(cached_op.weights))
    (cache / "refs.npy").unlink()
    (cache / "found.npy").unlink()
    mmt.write_salvus_fixture(tgt_path, tgt, parameters=("VP", "VS", "RHO"))
    api.gll_2_gll(from_gll=str(src_path), to_gll=str(tgt_path),
                  stored_array=str(cache))
    out3 = SalvusMesh(tgt_path, fast_mode=False)
    np.testing.assert_allclose(
        out3.element_nodal_fields["VS"].reshape(-1)[sample], 2.0 * mine,
        rtol=1e-12,
    )


def test_gll_2_gll_fluid_repair(tmp_path):
    """Fluid target elements keep their original values."""
    src = mmt.shell_mesh(n_lat=4, n_lon=4, n_rad=2, order=2)
    tgt = mmt.shell_mesh(n_lat=3, n_lon=3, n_rad=2, order=2,
                         r_inner=3.6e6, r_outer=6.3e6,
                         lat_extent=(0.55, 1.15), lon_extent=(0.35, 1.35))
    fluid = np.zeros(tgt.nelem)
    fluid[:5] = 1.0
    src_path, tgt_path = tmp_path / "s.h5", tmp_path / "t.h5"
    mmt.write_salvus_fixture(src_path, src, parameters=("VP", "VS", "RHO"))
    tgt_fields = mmt.write_salvus_fixture(
        tgt_path, tgt, parameters=("VP", "VS", "RHO"), fluid=fluid
    )
    api.gll_2_gll(from_gll=str(src_path), to_gll=str(tgt_path))
    out = SalvusMesh(tgt_path, fast_mode=False)
    np.testing.assert_allclose(
        out.element_nodal_fields["VS"][:5], tgt_fields["VS"][:5]
    )
    # solid elements got correctly transferred values (the source field
    # is the same analytic function, so the transfer must approximate
    # it -- a garbage write would fail this, not just differ)
    truth = mmt.smooth_field(tgt.points[5:]) * 1.1  # VS scale
    np.testing.assert_allclose(
        out.element_nodal_fields["VS"][5:], truth, atol=2e-2
    )


def test_gll_2_gll_layered_and_multi(tmp_path):
    src = mmt.shell_mesh(n_lat=4, n_lon=4, n_rad=4, order=2, n_layers=2)
    tgt = mmt.shell_mesh(n_lat=3, n_lon=3, n_rad=4, order=2, n_layers=2,
                         lat_extent=(0.55, 1.15), lon_extent=(0.35, 1.35))
    src_path, tgt_path = tmp_path / "s.h5", tmp_path / "t.h5"
    src_fields = mmt.write_salvus_fixture(src_path, src,
                                          parameters=("VP", "VS"))
    mmt.write_salvus_fixture(tgt_path, tgt, parameters=("VP", "VS"))

    cache = tmp_path / "layer_cache"
    api.gll_2_gll_layered(
        from_gll=str(src_path), to_gll=str(tgt_path), layers="all",
        parameters=["VP", "VS"], stored_array=str(cache),
    )
    out = SalvusMesh(tgt_path, fast_mode=False)
    got = out.element_nodal_fields["VP"]

    # values approximate the analytic field (both meshes sample it)
    truth = mmt.smooth_field(tgt.points)
    assert np.max(np.abs(got - truth)) < 2e-2

    assert (cache / "interp_info.h5").exists()

    # multi variant with cache hits gives identical values -- and the
    # hit is proven real by poisoning the stored per-layer coefficients
    # (identical semantics, so the cache must be served, not rebuilt)
    import h5py

    with h5py.File(cache / "interp_info.h5", "r+") as f:
        for layer in list(f["coeffs"]):
            f[f"coeffs/{layer}"][...] = 2.0 * f[f"coeffs/{layer}"][()]
    mmt.write_salvus_fixture(tgt_path, tgt, parameters=("VP", "VS"))
    api.gll_2_gll_layered_multi(
        from_gll=str(src_path), to_gll=str(tgt_path), layers="all",
        parameters=["VP", "VS"], stored_array=str(cache), threads=4,
    )
    out2 = SalvusMesh(tgt_path, fast_mode=False)
    np.testing.assert_allclose(
        out2.element_nodal_fields["VP"], 2.0 * got, rtol=1e-12
    )

    # multi_two (snap engine) also lands near the analytic field
    mmt.write_salvus_fixture(tgt_path, tgt, parameters=("VP", "VS"))
    api.gll_2_gll_layered_multi_two(
        from_gll=str(src_path), to_gll=str(tgt_path), layers="all",
        parameters=["VP", "VS"],
    )
    out3 = SalvusMesh(tgt_path, fast_mode=False)
    assert np.max(np.abs(out3.element_nodal_fields["VP"] - truth)) < 2e-2


def test_exodus_2_gll_and_back(tmp_path):
    """Exodus -> GLL with a linear field is exact (trilinear reproduces
    linears); then GLL -> Exodus round-trips it."""
    exo_mesh = mmt.box_mesh(shape=(4, 4, 4), order=1)
    gll_mesh = mmt.box_mesh(shape=(3, 3, 3), order=2,
                            extent=[(0.05, 0.95)] * 3)
    exo_path = tmp_path / "m.e"
    gll_path = tmp_path / "m.h5"

    base = mmt.smooth_field(exo_mesh.vertices, "linear")
    from multimesh_tpu.io.exodus import write_exodus
    params = ["VP", "VS", "RHO"]
    nodal = {p: base * (1 + 0.1 * i) for i, p in enumerate(params)}
    write_exodus(exo_path, exo_mesh.vertices, exo_mesh.connectivity, nodal)
    mmt.write_salvus_fixture(gll_path, gll_mesh, parameters=tuple(params))

    api.exodus_2_gll(mesh=str(exo_path), gll_model=str(gll_path),
                     parameters=params)
    out = SalvusMesh(gll_path, fast_mode=False)
    truth = mmt.smooth_field(gll_mesh.points, "linear")
    for i, p in enumerate(params):
        np.testing.assert_allclose(
            out.element_nodal_fields[p], truth * (1 + 0.1 * i), atol=1e-10
        )

    # back: GLL -> exodus nodes
    exo2_path = tmp_path / "back.e"
    exo2_mesh = mmt.box_mesh(shape=(3, 3, 3), order=1,
                             extent=[(0.1, 0.9)] * 3)
    nodal2 = {p: np.zeros(len(exo2_mesh.vertices)) for p in params}
    write_exodus(exo2_path, exo2_mesh.vertices, exo2_mesh.connectivity,
                 nodal2)
    api.gll_2_exodus(gll_model=str(gll_path), exodus_model=str(exo2_path))
    exo2 = Exodus(exo2_path)
    truth2 = mmt.smooth_field(exo2_mesh.vertices, "linear")
    for i, p in enumerate(params):
        np.testing.assert_allclose(
            exo2.get_nodal_field(p), truth2 * (1 + 0.1 * i), atol=1e-9
        )


def test_query_model_and_interpolate_to_points(tmp_path):
    """query_model on a global-ish shell + geocentric interpolate."""
    mesh = mmt.shell_mesh(n_lat=6, n_lon=12, n_rad=3, order=2,
                          r_inner=5.0e6, r_outer=6.371e6,
                          lat_extent=(0.2, 2.9), lon_extent=(-3.1, 3.1))
    path = tmp_path / "m.h5"
    mmt.write_salvus_fixture(path, mesh, parameters=("VP", "VS"))

    rng = np.random.default_rng(0)
    lat = rng.uniform(-70, 70, 50)
    lon = rng.uniform(-170, 170, 50)
    depth = rng.uniform(1e5, 1.2e6, 50)
    lld = np.stack([lat, lon, depth], -1)

    vals = api.query_model(coordinates=lld, model=str(path))
    assert vals.shape == (50, 3)  # VP, VS, z_node_1D
    from multimesh_tpu.utils import latlondepth_to_xyz

    truth = mmt.smooth_field(latlondepth_to_xyz(lld))
    np.testing.assert_allclose(vals[:, 0], truth, atol=5e-2)

    vals2 = api.interpolate_to_points(
        mesh=str(path), points=lld, params_to_interp=["VS"],
        geocentric=True,
    )
    np.testing.assert_allclose(vals2[:, 0], truth * 1.1, atol=6e-2)


def test_interpolate_to_mesh(tmp_path):
    src = mmt.shell_mesh(n_lat=4, n_lon=4, n_rad=2, order=2)
    tgt = mmt.shell_mesh(n_lat=3, n_lon=3, n_rad=2, order=2,
                         r_inner=3.6e6, r_outer=6.3e6,
                         lat_extent=(0.55, 1.15), lon_extent=(0.35, 1.35))
    sp, tp = tmp_path / "s.h5", tmp_path / "t.h5"
    mmt.write_salvus_fixture(sp, src, parameters=("VP", "VS"))
    mmt.write_salvus_fixture(tp, tgt, parameters=("VP", "VS"))
    api.interpolate_to_mesh(str(sp), str(tp), params_to_interp=["VP"])
    out = SalvusMesh(tp, fast_mode=False)
    truth = mmt.smooth_field(tgt.points)
    assert np.max(np.abs(out.element_nodal_fields["VP"] - truth)) < 2e-2


def test_extract_regular_grid(tmp_path):
    mesh = mmt.shell_mesh(n_lat=6, n_lon=12, n_rad=2, order=2,
                          r_inner=5.5e6, r_outer=6.371e6,
                          lat_extent=(0.2, 2.9), lon_extent=(-3.1, 3.1))
    path = tmp_path / "m.h5"
    mmt.write_salvus_fixture(path, mesh, parameters=("VP",))

    ds = api.extract_regular_grid(
        mesh=str(path),
        parameters=["VP"],
        lat_extent=(-60, 60, 7),
        lon_extent=(-150, 150, 9),
        depth_extent=(1.0e5, 5e5, 3),
    )
    assert ds["VP"].shape == (3, 7, 9)
    assert np.isfinite(ds["VP"]).all()
    # the sampled values must be the analytic field at the grid's
    # lat/lon/depth coordinates, not merely finite
    from multimesh_tpu.utils import latlondepth_to_xyz

    dep_g, lat_g, lon_g = np.meshgrid(ds.depth, ds.lat, ds.lon,
                                      indexing="ij")
    lld = np.stack([lat_g.ravel(), lon_g.ravel(), dep_g.ravel()], -1)
    xyz = latlondepth_to_xyz(lld)
    truth = mmt.smooth_field(xyz).reshape(ds["VP"].shape)
    np.testing.assert_allclose(ds["VP"], truth, rtol=2e-2)

    nc = tmp_path / "grid.nc"
    api.extract_regular_grid(
        mesh=str(path), parameters=["VP"],
        lat_extent=(-60, 60, 7), lon_extent=(-150, 150, 9),
        depth_extent=(1.0e5, 5e5, 3),
        save_to_netcdf=True, netcdf_path=str(nc),
    )
    from multimesh_tpu.utils import RegularGridData

    back = RegularGridData.from_netcdf(nc)
    np.testing.assert_allclose(back["VP"], ds["VP"])


def test_interpolate_to_points_2d(tmp_path, rng):
    """2D end-to-end through the file-based engine path (the reference
    supports 2D via the API only, reference README.md:8)."""
    src = mmt.box_mesh(shape=(6, 6), order=4, warp=0.05)
    path = tmp_path / "src2d.h5"
    fields = mmt.write_salvus_fixture(path, src, parameters=("VP",))
    pts = rng.uniform(0.05, 0.95, size=(300, 2))
    vals = engine.interpolate_to_points(str(path), pts, ["VP"])
    oracle_vals, _ = interpolate_np(pts, src.points, fields["VP"], order=4)
    np.testing.assert_allclose(
        np.asarray(vals)[:, 0], oracle_vals, rtol=1e-8
    )


def test_exodus_2_exodus_2d(tmp_path, rng):
    """QUAD4 -> QUAD4 nodal transfer (2D trilinear locate end to end)."""
    src = mmt.box_mesh(shape=(12, 12), order=1)
    tgt = mmt.box_mesh(shape=(9, 9), order=1,
                       extent=[(0.05, 0.95), (0.05, 0.95)])
    f_a = tmp_path / "a2d.e"
    f_b = tmp_path / "b2d.e"
    mmt.write_exodus_fixture(f_a, src, parameters=("VP",))
    mmt.write_exodus_fixture(f_b, tgt, parameters=("VP",),
                             field_kind="linear")
    engine.exodus_2_exodus(str(f_a), str(f_b), parameters=["VP"])
    from multimesh_tpu.io import exodus as eio

    got = eio.Exodus(str(f_b)).get_nodal_field("VP")
    oracle_vals, _ = interpolate_np(
        tgt.vertices, src.points, mmt.element_nodal_field(src, "smooth"),
        order=1,
    )
    np.testing.assert_allclose(got, oracle_vals, rtol=1e-9)


def test_layered_cache_rejects_different_semantics(tmp_path):
    """interp_info.h5 built by gll_2_gll_layered (1.04/fixed_ref/AABB)
    must NOT be served to gll_2_gll_layered_multi_two (tolerance/snap):
    the cache key includes the locate semantics, not just geometry."""
    import h5py

    src = mmt.shell_mesh(n_lat=3, n_lon=3, n_rad=3, order=2, n_layers=2)
    tgt = mmt.shell_mesh(n_lat=3, n_lon=3, n_rad=3, order=2, n_layers=2,
                         lat_extent=(0.55, 1.15), lon_extent=(0.35, 1.35))
    sp, tp = tmp_path / "s.h5", tmp_path / "t.h5"
    mmt.write_salvus_fixture(sp, src, parameters=("VP",))
    mmt.write_salvus_fixture(tp, tgt, parameters=("VP",))
    cache = tmp_path / "cache"

    api.gll_2_gll_layered(
        from_gll=str(sp), to_gll=str(tp), layers="all",
        parameters=["VP"], stored_array=str(cache),
    )
    with h5py.File(cache / "interp_info.h5", "r") as f:
        sem1 = f.attrs["semantics"]
    assert "fixed_ref" in str(sem1)

    mmt.write_salvus_fixture(tp, tgt, parameters=("VP",))
    api.gll_2_gll_layered_multi_two(
        from_gll=str(sp), to_gll=str(tp), layers="all",
        parameters=["VP"], stored_array=str(cache),
    )
    # rebuilt under the snap semantics, not silently reused
    with h5py.File(cache / "interp_info.h5", "r") as f:
        sem2 = f.attrs["semantics"]
    assert "snap" in str(sem2) and str(sem2) != str(sem1)

    out = SalvusMesh(tp, fast_mode=False)
    truth = mmt.smooth_field(tgt.points)
    assert np.max(np.abs(out.element_nodal_fields["VP"] - truth)) < 2e-2


def test_layered_parameters_all_with_fast_mode_mesh(tmp_path):
    """A user-constructed SalvusMesh keeps its default fast_mode=True
    (fields lazy); parameters='all' must still expand to the real field
    list instead of silently transferring nothing."""
    src = mmt.shell_mesh(n_lat=3, n_lon=3, n_rad=3, order=2, n_layers=2)
    tgt = mmt.shell_mesh(n_lat=3, n_lon=3, n_rad=3, order=2, n_layers=2,
                         lat_extent=(0.55, 1.15), lon_extent=(0.35, 1.35))
    sp, tp = tmp_path / "s.h5", tmp_path / "t.h5"
    mmt.write_salvus_fixture(sp, src, parameters=("VP", "VS"))
    mmt.write_salvus_fixture(tp, tgt, parameters=("VP", "VS"),
                             field_kind="linear")
    m = SalvusMesh(sp)  # fast_mode=True: element_nodal_fields starts {}
    api.gll_2_gll_layered(
        from_gll=m, to_gll=str(tp), layers="all", parameters="all",
    )
    out = SalvusMesh(tp, fast_mode=False)
    truth = mmt.smooth_field(tgt.points)
    assert np.max(np.abs(out.element_nodal_fields["VP"] - truth)) < 2e-2


def test_interpolate_to_mesh_duck_objects(tmp_path):
    """Live mesh objects (element-nodal points + fields dict, no file)
    work through interpolate_to_mesh: geometry attrs, field access and
    attach_field all run on the duck-typed wrapper."""
    from multimesh_tpu.config import R_EARTH_M

    src = mmt.shell_mesh(n_lat=4, n_lon=4, n_rad=2, order=2)
    tgt = mmt.shell_mesh(n_lat=3, n_lon=3, n_rad=2, order=2,
                         r_inner=3.6e6, r_outer=6.3e6,
                         lat_extent=(0.55, 1.15), lon_extent=(0.35, 1.35))

    class Duck:
        def __init__(self, mesh):
            self.points = mesh.points.copy()
            self.element_nodal_fields = {
                "VP": mmt.element_nodal_field(mesh, "smooth"),
                "z_node_1D": np.linalg.norm(self.points, axis=-1)
                / R_EARTH_M,
            }

    old, new = Duck(src), Duck(tgt)
    new.element_nodal_fields["VP"] = np.zeros(
        (tgt.nelem, tgt.points.shape[1])
    )
    api.interpolate_to_mesh(old, new, params_to_interp=["VP"])
    truth = mmt.smooth_field(tgt.points)
    got = new.element_nodal_fields["VP"]
    assert np.max(np.abs(got - truth)) < 2e-2


def test_exodus_2_exodus_3d(tmp_path):
    """HEX8 -> HEX8 nodal transfer on curved Earth-scale shells: the 3D
    file path of the reference CLI's interpolate_mesh_a_to_b
    (reference cli.py:35-104 + src/trilinearinterpolator.c)."""
    src = mmt.shell_mesh(n_lat=10, n_lon=10, n_rad=8, order=1)
    tgt = mmt.shell_mesh(n_lat=7, n_lon=7, n_rad=6, order=1,
                         r_inner=3.7e6, r_outer=6.2e6,
                         lat_extent=(0.55, 1.15), lon_extent=(0.35, 1.35))
    f_a = tmp_path / "a3d.e"
    f_b = tmp_path / "b3d.e"
    mmt.write_exodus_fixture(f_a, src, parameters=("VP", "VS"))
    mmt.write_exodus_fixture(f_b, tgt, parameters=("VP", "VS"),
                             field_kind="linear")
    engine.exodus_2_exodus(str(f_a), str(f_b), parameters=["VP", "VS"])

    got = Exodus(str(f_b)).get_nodal_field("VS")
    oracle_vals, oracle_elems = interpolate_np(
        tgt.vertices, src.points,
        mmt.element_nodal_field(src, "smooth") * 1.1, order=1,
        tol=1.025,
    )
    inside = oracle_elems >= 0
    assert inside.mean() > 0.99  # target is interior: locate must work
    np.testing.assert_allclose(got[inside], oracle_vals[inside],
                               rtol=1e-6)
    # against the analytic truth: trilinear discretization error only
    truth = mmt.smooth_field(tgt.vertices) * 1.1
    assert np.max(np.abs(got - truth) / np.abs(truth)) < 5e-3


def test_interpolate_to_points_layered(tmp_path):
    """Layered point interpolation writes onto the target mesh with
    sentinel semantics: located nodes take source values, unlocatable
    nodes get zero (reference interpolator.py:855-928)."""
    src = mmt.shell_mesh(n_lat=5, n_lon=5, n_rad=4, order=2, n_layers=2)
    # radial extent EXTENDS BEYOND the source both ways (those nodes
    # cannot locate), while the layer BOUNDARY radius matches the
    # source's (layered transfers restrict candidates to the same-id
    # source layer, so mismatched boundaries would fail by design)
    src_mid = 0.5 * (3.48e6 + 6.371e6)
    r_outer = 6.9e6
    tgt = mmt.shell_mesh(n_lat=4, n_lon=4, n_rad=4, order=2, n_layers=2,
                         r_inner=2 * src_mid - r_outer, r_outer=r_outer,
                         lat_extent=(0.55, 1.15), lon_extent=(0.35, 1.35))
    src_path, tgt_path = tmp_path / "s.h5", tmp_path / "t.h5"
    mmt.write_salvus_fixture(src_path, src, parameters=("VP", "VS"))
    mmt.write_salvus_fixture(tgt_path, tgt, parameters=("VP", "VS"))

    engine.interpolate_to_points_layered(
        str(src_path), str(tgt_path), parameters=["VP"], layers="all",
    )
    out = SalvusMesh(tgt_path, fast_mode=False)
    got = out.element_nodal_fields["VP"]

    r = np.linalg.norm(tgt.points, axis=-1)
    outside = (r > 6.371e6 * 1.02) | (r < 3.48e6 * 0.98)
    interior = (r < 6.371e6 * 0.98) & (r > 3.48e6 * 1.02)
    assert outside.any() and interior.any()
    # sentinel semantics: unlocatable nodes zero-filled
    np.testing.assert_array_equal(got[outside], 0.0)
    # interior nodes carry the transferred analytic field
    truth = mmt.smooth_field(tgt.points)
    err = np.abs(got[interior] - truth[interior])
    assert np.max(err) < 2e-2


def test_extract_regular_grid_return_type(tmp_path, monkeypatch):
    """api.extract_regular_grid returns an xarray.Dataset when xarray is
    importable (reference return-type parity, interpolator.py:1638-1646)
    and the structurally equivalent RegularGridData when it is not."""
    import sys

    mesh = mmt.shell_mesh(n_lat=4, n_lon=6, n_rad=2, order=2,
                          r_inner=5.5e6, r_outer=6.371e6,
                          lat_extent=(0.2, 2.9), lon_extent=(-3.1, 3.1))
    path = tmp_path / "m.h5"
    mmt.write_salvus_fixture(path, mesh, parameters=("VP",))
    kwargs = dict(
        mesh=str(path), parameters=["VP"], lat_extent=(-50, 50, 3),
        lon_extent=(-120, 120, 4), depth_extent=(1.0e5, 4e5, 2),
    )

    from multimesh_tpu.utils import RegularGridData

    # this image has no xarray -> RegularGridData path
    assert "xarray" not in sys.modules
    ds = api.extract_regular_grid(**kwargs)
    assert isinstance(ds, RegularGridData)

    # simulate an installed xarray: the auto-convert branch must call
    # to_xarray() and return its result
    sentinel = object()
    monkeypatch.setitem(sys.modules, "xarray", type(sys)("xarray"))
    monkeypatch.setattr(RegularGridData, "to_xarray",
                        lambda self: sentinel)
    assert api.extract_regular_grid(**kwargs) is sentinel
