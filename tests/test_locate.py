"""Fused locate engine vs the NumPy/SciPy oracle and analytic truths."""
import numpy as np
import jax.numpy as jnp
import pytest

from multimesh_tpu import testing as mmt
from multimesh_tpu.config import LocateConfig
from multimesh_tpu.search import locate

from oracle import interpolate_np, locate_np


def _interp(res, field):
    vals = np.einsum("pn,pn->p", res.weights, field[res.elements])
    vals[res.elements < 0] = 0.0
    return vals


@pytest.mark.parametrize("order,warp", [(1, 0.0), (2, 0.1), (4, 0.15)])
def test_locate_box_vs_oracle(order, warp, rng):
    mesh = mmt.box_mesh(shape=(3, 3, 3), order=order, warp=warp)
    field = mmt.element_nodal_field(mesh, "smooth")
    pts = rng.uniform(0.05, 0.95, size=(500, 3))

    res = locate(pts, mesh.points, order=order, fallback="sentinel")
    assert res.found.all(), "interior points must all be found"
    mine = _interp(res, field)
    oracle_vals, oracle_elems = interpolate_np(pts, mesh.points, field, order)
    assert (oracle_elems >= 0).all()
    np.testing.assert_allclose(mine, oracle_vals, rtol=1e-9, atol=1e-12)


def test_locate_shell_earth_scale(rng):
    """Curved earth-scale shell, mixed precision: values must match the
    float64 oracle to < 1e-6 relative (BASELINE.md accuracy target)."""
    mesh = mmt.shell_mesh(n_lat=4, n_lon=5, n_rad=3, order=4)
    field = mmt.element_nodal_field(mesh, "smooth")
    # sample points strictly inside the shell chunk
    r = rng.uniform(3.6e6, 6.2e6, size=400)
    th = rng.uniform(0.55, 1.15, size=400)
    ph = rng.uniform(0.35, 1.35, size=400)
    pts = np.stack(
        [r * np.sin(th) * np.cos(ph), r * np.sin(th) * np.sin(ph),
         r * np.cos(th)], -1)

    res = locate(pts, mesh.points, order=4, fallback="sentinel")
    assert res.found.all()
    mine = _interp(res, field)
    oracle_vals, _ = interpolate_np(pts, mesh.points, field, order=4)
    rel = np.max(np.abs(mine - oracle_vals) / np.abs(oracle_vals))
    assert rel < 1e-6, f"max rel err {rel:.3e}"


def test_locate_prefilter_matches_full_scan(rng):
    """Trilinear candidate prefilter must not change results on curved
    elements (same acceptance tolerances, fewer full Newtons)."""
    mesh = mmt.shell_mesh(n_lat=4, n_lon=4, n_rad=2, order=4)
    field = mmt.element_nodal_field(mesh, "smooth")
    r = rng.uniform(3.6e6, 6.2e6, size=300)
    th = rng.uniform(0.55, 1.15, size=300)
    ph = rng.uniform(0.35, 1.35, size=300)
    pts = np.stack(
        [r * np.sin(th) * np.cos(ph), r * np.sin(th) * np.sin(ph),
         r * np.cos(th)], -1)

    full = locate(pts, mesh.points, order=4, fallback="sentinel")
    fast = locate(pts, mesh.points, order=4, fallback="sentinel",
                  prefilter_m=4)
    assert fast.found.all()
    np.testing.assert_allclose(
        _interp(fast, field), _interp(full, field), rtol=1e-8
    )


@pytest.mark.slow
def test_locate_pallas_engine_matches_xla(rng):
    """The fused pallas kernel (interpret mode on CPU) must agree with the
    XLA reference engine to f32 ref-coordinate accuracy."""
    mesh = mmt.shell_mesh(n_lat=3, n_lon=4, n_rad=2, order=4)
    field = mmt.element_nodal_field(mesh, "smooth")
    r = rng.uniform(3.6e6, 6.2e6, 150)
    th = rng.uniform(0.55, 1.15, 150)
    ph = rng.uniform(0.35, 1.35, 150)
    pts = np.stack(
        [r * np.sin(th) * np.cos(ph), r * np.sin(th) * np.sin(ph),
         r * np.cos(th)], -1)
    rx = locate(pts, mesh.points, order=4, fallback="snap", engine="xla")
    rp = locate(pts, mesh.points, order=4, fallback="snap",
                engine="pallas")
    assert rp.found.all()
    np.testing.assert_allclose(
        _interp(rp, field), _interp(rx, field), rtol=1e-6
    )


def test_locate_exterior_sentinel_and_snap(rng):
    mesh = mmt.box_mesh(shape=(2, 2, 2), order=2)
    field = mmt.element_nodal_field(mesh, "linear")
    outside = rng.uniform(1.5, 2.0, size=(50, 3))  # well outside [0,1]^3

    res = locate(outside, mesh.points, order=2, fallback="sentinel")
    assert (~res.found).all()
    assert (res.elements == -1).all()
    assert np.all(res.weights == 0.0)

    snap = locate(outside, mesh.points, order=2, fallback="snap")
    assert snap.found.all()
    assert (snap.elements >= 0).all()
    # snapped refs are clipped to +/- snap_clip
    assert np.max(np.abs(snap.refs)) <= 1.02 + 1e-12
    # element choice and values match the oracle's best-so-far snap
    # semantics (oracle.locate_np with snap=True implements the
    # reference's snap_to_nearest, interpolator.py:1217-1230)
    o_elems, o_refs, o_weights = locate_np(
        outside, mesh.points, order=2, snap=True
    )
    assert (o_elems >= 0).all()
    vals = _interp(snap, field)
    o_vals = np.einsum("pn,pn->p", o_weights, field[o_elems])
    np.testing.assert_allclose(vals, o_vals, rtol=1e-5)


def test_locate_fixed_ref_always_assigns(rng):
    """fixed_ref mode (reference _check_if_inside_element) must assign an
    element to every point, interior or not."""
    mesh = mmt.box_mesh(shape=(2, 2, 2), order=2)
    pts = np.concatenate(
        [rng.uniform(0.1, 0.9, size=(30, 3)),
         rng.uniform(1.2, 1.5, size=(10, 3))]
    )
    cfg = LocateConfig(accept_tol=1.04)
    res = locate(pts, mesh.points, order=2, cfg=cfg, fallback="fixed_ref",
                 use_aabb=True)
    assert res.found.all()
    assert (res.elements >= 0).all()
    # interior points are genuinely inside
    assert np.max(np.abs(res.refs[:30])) < 1.0 + 1e-9
    # exterior points carry the fixed interior fallback ref coord
    np.testing.assert_allclose(
        res.refs[30:], np.tile([0.645, -0.5, 0.22], (10, 1)), atol=1e-12
    )


def test_locate_on_shared_face_consistent(rng):
    """Points exactly on element faces: either neighbor must give the same
    interpolated value (continuity of the nodal field)."""
    mesh = mmt.box_mesh(shape=(2, 2, 2), order=2)
    field = mmt.element_nodal_field(mesh, "smooth")
    pts = np.stack(
        [np.full(20, 0.5), rng.uniform(0.1, 0.9, 20),
         rng.uniform(0.1, 0.9, 20)], -1)
    res = locate(pts, mesh.points, order=2)
    assert res.found.all()
    mine = _interp(res, field)
    oracle_vals, _ = interpolate_np(pts, mesh.points, field, order=2)
    np.testing.assert_allclose(mine, oracle_vals, rtol=1e-9)


def test_locate_2d(rng):
    mesh = mmt.box_mesh(shape=(3, 3), order=4, warp=0.05)
    field = mmt.element_nodal_field(mesh, "smooth")
    pts = rng.uniform(0.05, 0.95, size=(200, 2))
    res = locate(pts, mesh.points, order=4)
    assert res.found.all()
    mine = _interp(res, field)
    oracle_vals, _ = interpolate_np(pts, mesh.points, field, order=4)
    np.testing.assert_allclose(mine, oracle_vals, rtol=1e-9)
    truth = mmt.smooth_field(pts)
    # order-4 interpolation of a smooth field on a warped 3x3 mesh:
    # discretization-level agreement only
    np.testing.assert_allclose(mine, truth, atol=5e-3)


@pytest.mark.parametrize("fallback", ["sentinel", "snap", "best"])
def test_locate_ladder_matches_scan(fallback, rng):
    """The escalation ladder (TPU fast path; interpret mode here) must
    reproduce the sequential scan's accept set and values, including
    exterior points exercising the rescue rounds and fallback modes."""
    mesh = mmt.shell_mesh(n_lat=3, n_lon=4, n_rad=2, order=2)
    field = mmt.element_nodal_field(mesh, "smooth")
    n = 160
    r = rng.uniform(3.6e6, 6.2e6, n)
    th = rng.uniform(0.55, 1.15, n)
    ph = rng.uniform(0.35, 1.35, n)
    pts = np.stack(
        [r * np.sin(th) * np.cos(ph), r * np.sin(th) * np.sin(ph),
         r * np.cos(th)], -1)
    pts[: n // 6] *= 1.5  # exterior points exercise rescue + fallback
    scan = locate(pts, mesh.points, order=2, fallback=fallback,
                  engine="pallas", strategy="scan")
    lad = locate(pts, mesh.points, order=2, fallback=fallback,
                 engine="pallas", strategy="ladder")
    np.testing.assert_array_equal(
        np.asarray(scan.found), np.asarray(lad.found)
    )
    # interpolated values agree wherever both found the point (element
    # choices may differ on shared faces -- both are valid accepts)
    both = np.asarray(scan.found)
    vs = _interp(scan, field)[both]
    vl = _interp(lad, field)[both]
    np.testing.assert_allclose(vl, vs, rtol=5e-5)
    same = np.asarray(scan.elements) == np.asarray(lad.elements)
    assert np.mean(same[both]) > 0.95


@pytest.mark.parametrize("fallback", [
    "sentinel",
    pytest.param("snap", marks=pytest.mark.slow),  # ~19 s/case on 1 CPU
    pytest.param("best", marks=pytest.mark.slow),
])
def test_locate_ladder_near1_matches_scan(fallback, rng):
    """The nearest-centroid-only candidate path (use_near1/bucket_knn:
    round 1 on the single nearest centroid, rescue rounds computing
    their own in-jit top-12) must reproduce the scan's accept set and
    values.  Production-gated to real TPUs, so forced on here."""
    import importlib

    # NB: ``from multimesh_tpu.search import locate`` yields the
    # re-exported FUNCTION, not the module -- setting _FORCE_NEAR1 on
    # it would be a silent no-op and the ladder would keep its k=20
    # exact candidates (this test then passes without testing anything)
    locate_mod = importlib.import_module("multimesh_tpu.search.locate")

    mesh = mmt.shell_mesh(n_lat=5, n_lon=5, n_rad=3, order=2)  # E=75>64
    field = mmt.element_nodal_field(mesh, "smooth")
    n = 160
    r = rng.uniform(3.6e6, 6.2e6, n)
    th = rng.uniform(0.55, 1.15, n)
    ph = rng.uniform(0.35, 1.35, n)
    pts = np.stack(
        [r * np.sin(th) * np.cos(ph), r * np.sin(th) * np.sin(ph),
         r * np.cos(th)], -1)
    pts[: n // 6] *= 1.5  # exterior points exercise rescue + fallback
    scan = locate(pts, mesh.points, order=2, fallback=fallback,
                  engine="pallas", strategy="scan")
    locate_mod._FORCE_NEAR1 = True
    try:
        lad = locate(pts, mesh.points, order=2, fallback=fallback,
                     engine="pallas", strategy="ladder")
    finally:
        locate_mod._FORCE_NEAR1 = False
    np.testing.assert_array_equal(
        np.asarray(scan.found), np.asarray(lad.found)
    )
    both = np.asarray(scan.found)
    if fallback == "snap":
        # snapped exterior points may snap to a different equally-near
        # boundary element (extrapolated values then differ); interior
        # accepts must agree
        both = both & (np.asarray(scan.elements)
                       == np.asarray(lad.elements))
        assert both.sum() > 0.8 * n
    vs = _interp(scan, field)[both]
    vl = _interp(lad, field)[both]
    np.testing.assert_allclose(vl, vs, rtol=5e-5)


@pytest.mark.parametrize("fallback", [
    "sentinel",
    pytest.param("snap", marks=pytest.mark.slow),  # ~20 s/case on 1 CPU
    pytest.param("best", marks=pytest.mark.slow),
])
def test_locate_ladder_near1_grid_matches_scan(fallback, rng, monkeypatch):
    """The grid-path nearest-member candidate mode (use_near1_grid:
    round 1 on the single nearest bin member, rescue rounds probing the
    balanced-bin index in-jit) must reproduce the scan's accept set and
    values.  Production-gated to real TPUs and large sources, so forced
    on here with a lowered grid threshold (multi-bin: E=256 -> 2 bins)."""
    import importlib

    locate_mod = importlib.import_module("multimesh_tpu.search.locate")
    grid_mod = importlib.import_module("multimesh_tpu.search.grid")

    mesh = mmt.shell_mesh(n_lat=8, n_lon=8, n_rad=4, order=2)  # E=256
    field = mmt.element_nodal_field(mesh, "smooth")
    n = 160
    r = rng.uniform(3.6e6, 6.2e6, n)
    th = rng.uniform(0.55, 1.15, n)
    ph = rng.uniform(0.35, 1.35, n)
    pts = np.stack(
        [r * np.sin(th) * np.cos(ph), r * np.sin(th) * np.sin(ph),
         r * np.cos(th)], -1)
    pts[: n // 6] *= 1.5  # exterior points exercise rescue + fallback
    scan = locate(pts, mesh.points, order=2, fallback=fallback,
                  engine="pallas", strategy="scan")
    monkeypatch.setattr(grid_mod, "APPROX_GRID_MIN_SOURCES", 64)
    monkeypatch.setattr(locate_mod, "_FORCE_NEAR1", True)
    lad = locate(pts, mesh.points, order=2, fallback=fallback,
                 engine="pallas", strategy="ladder")
    np.testing.assert_array_equal(
        np.asarray(scan.found), np.asarray(lad.found)
    )
    both = np.asarray(scan.found)
    if fallback == "snap":
        # Snapped far-exterior points are best-so-far over the EVALUATED
        # candidate set, and the ladder evaluates a superset of the
        # scan's k list (its rescue rounds probe extra bin members): a
        # point all 20 scan candidates diverge on can still find a
        # converged best in the ladder -- a strictly more informative
        # snap.  Compare interior points (which must accept identically)
        # and element agreement only.
        interior = np.ones(n, bool)
        interior[: n // 6] = False
        both = both & interior & (np.asarray(scan.elements)
                                  == np.asarray(lad.elements))
        assert both.sum() > 0.8 * interior.sum()
    vs = _interp(scan, field)[both]
    vl = _interp(lad, field)[both]
    np.testing.assert_allclose(vl, vs, rtol=5e-5)


def test_locate_ladder_strategy_validation():
    mesh = mmt.box_mesh(shape=(2, 2, 2), order=1)
    pts = np.full((8, 3), 0.5)
    with pytest.raises(ValueError):
        locate(pts, mesh.points, order=1, fallback="nope",
               engine="xla", strategy="ladder")


@pytest.mark.parametrize("fallback", ["sentinel", "snap", "fixed_ref"])
def test_locate_ladder_xla_engine_matches_scan(rng, fallback):
    """The ladder's xla rows backend (strategy='ladder', engine='xla'):
    same escalation-ladder structure as the pallas path, inverse_map
    einsums instead of the Mosaic kernel -- the sharded programs run it
    on CPU/virtual meshes.  Values must match the xla scan."""
    mesh = mmt.shell_mesh(n_lat=3, n_lon=4, n_rad=2, order=2)
    field = mmt.element_nodal_field(mesh, "smooth")
    n = 300
    r = rng.uniform(3.6e6, 6.2e6, n)
    th = rng.uniform(0.55, 1.15, n)
    ph = rng.uniform(0.35, 1.35, n)
    pts = np.stack(
        [r * np.sin(th) * np.cos(ph), r * np.sin(th) * np.sin(ph),
         r * np.cos(th)], -1)
    pts[: n // 10] *= 1.5  # exterior rows exercise fallback paths
    cfg = LocateConfig(accept_tol=1.04)
    kw = dict(order=2, cfg=cfg, fallback=fallback,
              use_aabb=fallback == "fixed_ref", engine="xla")
    scan = locate(pts, mesh.points, strategy="scan", **kw)
    lad = locate(pts, mesh.points, strategy="ladder", **kw)
    np.testing.assert_array_equal(
        np.asarray(scan.found), np.asarray(lad.found)
    )
    both = np.asarray(scan.found)
    vs = _interp(scan, field)[both]
    vl = _interp(lad, field)[both]
    np.testing.assert_allclose(vl, vs, rtol=5e-5)
    same = np.asarray(scan.elements) == np.asarray(lad.elements)
    assert same[both].mean() > 0.9


def test_locate_ladder_fixed_ref_matches_scan(rng):
    """fixed_ref through the ladder: accepted rows get ladder speed,
    every unaccepted row is delegated to the exhaustive scan (which
    carries the reference's AABB-containment / nearest-center fallback
    state, interpolator.py:1448-1473) -- results must match the pure
    scan, including exterior points taking the fixed interior ref."""
    mesh = mmt.shell_mesh(n_lat=3, n_lon=4, n_rad=2, order=2)
    field = mmt.element_nodal_field(mesh, "smooth")
    n = 160
    r = rng.uniform(3.6e6, 6.2e6, n)
    th = rng.uniform(0.55, 1.15, n)
    ph = rng.uniform(0.35, 1.35, n)
    pts = np.stack(
        [r * np.sin(th) * np.cos(ph), r * np.sin(th) * np.sin(ph),
         r * np.cos(th)], -1)
    pts[: n // 6] *= 1.5  # exterior points exercise the delegation
    cfg = LocateConfig(accept_tol=1.04)
    scan = locate(pts, mesh.points, order=2, cfg=cfg,
                  fallback="fixed_ref", use_aabb=True,
                  engine="pallas", strategy="scan")
    lad = locate(pts, mesh.points, order=2, cfg=cfg,
                 fallback="fixed_ref", use_aabb=True,
                 engine="pallas", strategy="ladder")
    assert np.asarray(lad.found).all()
    # unaccepted rows come from the same exhaustive scan: elements and
    # refs must agree exactly there; accepted rows may differ at
    # shared-face tie-break level, so compare values
    np.testing.assert_allclose(
        _interp(lad, field), _interp(scan, field), rtol=5e-5
    )
    same = np.asarray(scan.elements) == np.asarray(lad.elements)
    assert same.mean() > 0.95
    # exterior rows carry the fixed interior ref coordinate in both
    ext_fixed = np.all(
        np.abs(np.asarray(lad.refs)[: n // 6]
               - np.asarray([0.645, -0.5, 0.22])) < 1e-6, axis=1)
    ext_fixed_scan = np.all(
        np.abs(np.asarray(scan.refs)[: n // 6]
               - np.asarray([0.645, -0.5, 0.22])) < 1e-6, axis=1)
    np.testing.assert_array_equal(ext_fixed, ext_fixed_scan)


@pytest.mark.slow
def test_locate_f64_polish_refs(rng):
    """cfg.f64_polish: 2 warm-started f64 Newton iterations push the
    accepted ref coords from the f32 plateau (~1e-7) below 1e-10 and
    return f64 refs/weights (VERDICT round-1 item 7)."""
    from multimesh_tpu.config import Precision

    mesh = mmt.shell_mesh(n_lat=3, n_lon=4, n_rad=2, order=4)
    n = 150
    r = rng.uniform(3.6e6, 6.2e6, n)
    th = rng.uniform(0.55, 1.15, n)
    ph = rng.uniform(0.35, 1.35, n)
    pts = np.stack(
        [r * np.sin(th) * np.cos(ph), r * np.sin(th) * np.sin(ph),
         r * np.cos(th)], -1)
    lad = locate(pts, mesh.points, order=4,
                 cfg=LocateConfig(f64_polish=True),
                 fallback="sentinel", engine="pallas", strategy="ladder")
    truth = locate(pts, mesh.points, order=4,
                   cfg=LocateConfig(precision=Precision.F64),
                   fallback="sentinel", engine="xla")
    assert np.asarray(lad.refs).dtype == np.float64
    same = (
        np.asarray(lad.found) & np.asarray(truth.found)
        & (np.asarray(lad.elements) == np.asarray(truth.elements))
    )
    assert same.mean() > 0.9
    dref = np.max(np.abs(
        np.asarray(lad.refs)[same] - np.asarray(truth.refs)[same]
    ))
    assert dref < 1e-10, dref


def test_locate_ladder_mass_failure_rescued(rng):
    """When far more points fail round 1 than the rescue buckets hold
    (adversarial candidate lists: the true element hidden in the LAST
    column), every interior point must still be located -- the ladder
    reports crowded-out rows and locate re-runs them through the
    exhaustive scan (ADVICE round-2 medium: locate.py rescue capacity)."""
    mesh = mmt.box_mesh(shape=(4, 4, 4), order=1)
    field = mmt.element_nodal_field(mesh, "smooth")
    pts = rng.uniform(0.05, 0.95, size=(600, 3))
    truth = locate(pts, mesh.points, order=1, fallback="sentinel",
                   engine="xla")
    true_el = np.asarray(truth.elements)
    assert (true_el >= 0).all()
    # column 0 deliberately wrong for (almost) every point: >90% of the
    # chunk fails round 1, far beyond the C/4 + C/8 + C/32 bucket budget
    cand = np.stack([np.zeros_like(true_el), true_el], axis=1)
    lad = locate(pts, mesh.points, order=1, fallback="sentinel",
                 engine="pallas", strategy="ladder", candidates=cand)
    assert np.asarray(lad.found).all()
    mine = _interp(lad, field)
    expected = _interp(truth, field)
    np.testing.assert_allclose(mine, expected, rtol=5e-5)


def test_locate_f32_points_xla_promoted(rng):
    """f32 query points through the xla/scan engine: callers upload f32
    to halve tunnel time (engine.exodus_2_gll); locate must promote them
    to the f64 lattice dtype so the scan carry does not truncate."""
    mesh = mmt.box_mesh(shape=(3, 3, 3), order=1)
    field = mmt.element_nodal_field(mesh, "smooth")
    pts64 = rng.uniform(0.05, 0.95, size=(300, 3))
    pts32 = pts64.astype(np.float32)

    r64 = locate(pts64.astype(np.float64), mesh.points, order=1,
                 fallback="sentinel", engine="xla")
    r32 = locate(jnp.asarray(pts32), mesh.points, order=1,
                 fallback="sentinel", engine="xla")
    assert np.asarray(r32.found).all()
    # same coordinates up to f32 rounding -> same elements, close values
    v64 = _interp(r64, field)
    v32 = _interp(r32, field)
    np.testing.assert_allclose(v32, v64, rtol=1e-5)


def test_locate_ladder_exterior_heavy_sentinel(rng):
    """Exterior-heavy sentinel workload: far-exterior points (outside
    the global source AABB) are provably un-locatable and skip the scan
    retry; results must still match the exhaustive scan exactly."""
    mesh = mmt.box_mesh(shape=(3, 3, 3), order=1)
    field = mmt.element_nodal_field(mesh, "smooth")
    interior = rng.uniform(0.05, 0.95, size=(150, 3))
    exterior = rng.uniform(2.0, 5.0, size=(450, 3))  # far outside [0,1]^3
    pts = np.concatenate([interior, exterior])

    scan = locate(pts, mesh.points, order=1, fallback="sentinel",
                  engine="pallas", strategy="scan")
    lad = locate(pts, mesh.points, order=1, fallback="sentinel",
                 engine="pallas", strategy="ladder")
    np.testing.assert_array_equal(
        np.asarray(lad.found), np.asarray(scan.found)
    )
    assert np.asarray(lad.found)[:150].all()
    assert not np.asarray(lad.found)[150:].any()
    np.testing.assert_allclose(
        _interp(lad, field), _interp(scan, field), rtol=5e-5
    )


def test_locate_zero_points():
    """Empty query sets return an empty LocateResult, not IndexError
    (a layer with no target points is a legitimate input)."""
    mesh = mmt.box_mesh(shape=(2, 2, 2), order=1)
    res = locate(np.zeros((0, 3)), mesh.points, order=1)
    assert res.elements.shape == (0,)
    assert res.refs.shape == (0, 3)
    assert res.weights.shape == (0, 8)
    assert res.found.shape == (0,)


def test_box_mesh_warp_covers_nominal_extent(rng):
    """The warp displacement vanishes on every boundary face, so points
    anywhere in the nominal box are locatable (no spurious exterior
    band near the low faces)."""
    mesh = mmt.box_mesh(shape=(5, 5, 5), order=2, warp=0.15)
    pts = rng.uniform(0.002, 0.998, size=(600, 3))
    # include points hugging each face center, the old worst case
    extra = np.full((6, 3), 0.5)
    for d in range(3):
        extra[2 * d, d] = 0.002
        extra[2 * d + 1, d] = 0.998
    pts = np.concatenate([pts, extra])
    res = locate(pts, mesh.points, order=2, fallback="sentinel")
    assert np.asarray(res.found).all()
