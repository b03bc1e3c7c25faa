"""Multi-chip sharding tests on the 8-device virtual CPU mesh
(SURVEY.md section 4: sharded result must match single-device)."""
import numpy as np
import jax
import pytest

from multimesh_tpu import testing as mmt
from multimesh_tpu.dist import make_mesh, sharded_transfer
from multimesh_tpu.ops import TransferOperator
from multimesh_tpu.config import LocateConfig


def test_virtual_mesh_has_8_devices():
    assert len(jax.devices()) == 8


@pytest.mark.slow
def test_sharded_matches_single_device(rng):
    mesh = mmt.box_mesh(shape=(3, 3, 3), order=2, warp=0.1)
    field = mmt.element_nodal_field(mesh, "smooth")
    pts = rng.uniform(0.05, 0.95, size=(403, 3))  # odd count: padding path

    cfg = LocateConfig(nelem_to_search=10)
    dev_mesh = make_mesh()
    op = TransferOperator.build(mesh.points, pts, order=2, cfg=cfg,
                                fallback="sentinel")
    expected = op.apply(field)

    # scan strategy: identical accept order -> bit-level agreement
    vals_scan = sharded_transfer(
        pts, mesh.points, field[None], order=2, cfg=cfg,
        fallback="sentinel", mesh=dev_mesh, strategy="scan",
    )
    np.testing.assert_allclose(vals_scan[:, 0], expected, rtol=1e-9,
                               atol=1e-12)

    # default (production ladder): tie-break-level element choices can
    # differ on shared faces, so values agree to interpolation
    # continuity
    vals = sharded_transfer(
        pts, mesh.points, field[None], order=2, cfg=cfg,
        fallback="sentinel", mesh=dev_mesh,
    )
    np.testing.assert_allclose(vals[:, 0], expected, rtol=1e-5, atol=1e-9)


@pytest.mark.slow
def test_sharded_pallas_engine(rng):
    """The fused kernel runs per shard (interpret mode on the CPU mesh)
    and matches the xla shard path."""
    mesh = mmt.box_mesh(shape=(3, 3, 3), order=2, warp=0.1)
    field = mmt.element_nodal_field(mesh, "smooth")
    pts = rng.uniform(0.05, 0.95, size=(200, 3))
    cfg = LocateConfig(nelem_to_search=6, newton_iters=8, polish_iters=1)
    dev_mesh = make_mesh()
    v_xla = sharded_transfer(pts, mesh.points, field[None], order=2,
                             cfg=cfg, mesh=dev_mesh, engine="xla")
    v_pl = sharded_transfer(pts, mesh.points, field[None], order=2,
                            cfg=cfg, mesh=dev_mesh, engine="pallas")
    np.testing.assert_allclose(v_pl, v_xla, rtol=1e-5, atol=1e-7)


@pytest.mark.slow
def test_sharded_multi_field_snap(rng):
    mesh = mmt.shell_mesh(n_lat=3, n_lon=4, n_rad=2, order=2)
    f1 = mmt.element_nodal_field(mesh, "smooth")
    fields = np.stack([f1, 2.5 * f1])
    r = rng.uniform(3.6e6, 6.3e6, 100)
    th = rng.uniform(0.55, 1.15, 100)
    ph = rng.uniform(0.35, 1.35, 100)
    pts = np.stack(
        [r * np.sin(th) * np.cos(ph), r * np.sin(th) * np.sin(ph),
         r * np.cos(th)], -1)

    cfg = LocateConfig(nelem_to_search=8)
    vals = sharded_transfer(
        pts, mesh.points, fields, order=2, cfg=cfg, fallback="snap",
        mesh=make_mesh(),
    )
    op = TransferOperator.build(mesh.points, pts, order=2, cfg=cfg,
                                fallback="snap")
    expected = op.apply(fields)
    # the sharded path ranks candidates in f32; near-tied candidates can
    # resolve to a different (equally valid) accepted element, so values
    # agree to interpolation continuity rather than bit-exactly
    np.testing.assert_allclose(vals, expected, rtol=1e-5)


@pytest.mark.slow
def test_source_sharded_matches_replicated(rng):
    """Source elements sharded 8 ways (spatial bin runs) + two-pass
    local-try / all_gather retry must match the replicated-source run
    to interpolation tolerance (VERDICT round-1 item 4)."""
    from multimesh_tpu.dist import source_sharded_transfer

    mesh = mmt.box_mesh(shape=(6, 6, 6), order=2, warp=0.08)
    field = mmt.element_nodal_field(mesh, "smooth")
    fields = np.stack([field, 3.0 * field])
    pts = rng.uniform(0.02, 0.98, size=(700, 3))

    cfg = LocateConfig(nelem_to_search=8)
    vals = source_sharded_transfer(
        pts, mesh.points, fields, order=2, cfg=cfg, mesh=make_mesh(),
    )
    op = TransferOperator.build(mesh.points, pts, order=2, cfg=cfg,
                                fallback="sentinel")
    expected = np.asarray(op.apply(fields))
    found = expected[:, 0] != 0
    assert found.mean() > 0.99
    # boundary-crossing points are resolved by the all_gather retry;
    # accepted elements can differ on shared faces, so values agree to
    # interpolation continuity rather than bit-exactly
    np.testing.assert_allclose(vals[found], expected[found], rtol=1e-5)


def test_partition_source_balanced():
    from multimesh_tpu.dist import partition_source

    mesh = mmt.box_mesh(shape=(8, 8, 8), order=1)
    ids, reps, center, bin_shard = partition_source(mesh.points, 8)
    sizes = np.array([len(i) for i in ids])
    assert sizes.sum() == mesh.nelem
    assert np.concatenate(ids).size == np.unique(np.concatenate(ids)).size
    assert sizes.max() <= sizes.min() + 40  # one bin of slack


@pytest.mark.slow
def test_source_sharded_pallas_small_mesh(rng):
    """Pass 2 of the source-sharded path runs the pallas kernel on the
    n_dev*B all_gathered rows; with few devices that total must be
    rounded up to the kernel BLOCK or tracing crashes (ADVICE round-2
    medium: dist/sharding.py DB % BLOCK)."""
    from multimesh_tpu.dist import source_sharded_transfer

    mesh = mmt.box_mesh(shape=(4, 4, 4), order=1)
    field = mmt.element_nodal_field(mesh, "smooth")
    pts = rng.uniform(0.05, 0.95, size=(200, 3))
    cfg = LocateConfig(nelem_to_search=4)
    vals = source_sharded_transfer(
        pts, mesh.points, field[None], order=1, cfg=cfg,
        mesh=make_mesh(2), engine="pallas",
    )
    op = TransferOperator.build(mesh.points, pts, order=1, cfg=cfg,
                                fallback="sentinel")
    expected = np.asarray(op.apply(field[None]))
    found = expected[:, 0] != 0
    assert found.mean() > 0.99
    np.testing.assert_allclose(vals[found], expected[found], rtol=1e-5)


@pytest.mark.parametrize("fallback", [
    "snap",
    pytest.param("best", marks=pytest.mark.slow),  # ~70 s/case on 1 CPU
])
def test_source_sharded_fallback_modes(fallback, rng):
    """Cross-chip snap/best combine (PARITY known gap, round 2): exterior
    points must resolve to the best-scoring candidate across ALL source
    shards, matching the single-chip fallback semantics."""
    from multimesh_tpu.dist import source_sharded_transfer

    mesh = mmt.box_mesh(shape=(6, 6, 6), order=2, warp=0.05)
    field = mmt.element_nodal_field(mesh, "smooth")
    pts = rng.uniform(0.05, 0.95, size=(300, 3))
    pts[:40] = rng.uniform(1.0, 1.02, size=(40, 3))  # just outside

    cfg = LocateConfig(nelem_to_search=8)
    vals = source_sharded_transfer(
        pts, mesh.points, field[None], order=2, cfg=cfg,
        mesh=make_mesh(), fallback=fallback,
    )
    op = TransferOperator.build(mesh.points, pts, order=2, cfg=cfg,
                                fallback=fallback)
    expected = np.asarray(op.apply(field[None]))
    # every point (interior AND just-outside) must be assigned
    assert (vals[:, 0] != 0).all()
    # interior points: interpolation-continuity agreement; snapped
    # exterior points may pick a different boundary element across the
    # shard split, so compare those to the smooth field loosely
    np.testing.assert_allclose(vals[40:], expected[40:], rtol=1e-4)
    np.testing.assert_allclose(
        vals[:40, 0], mmt.smooth_field(np.clip(pts[:40], 0, 1)),
        atol=0.05,
    )


@pytest.mark.slow
def test_sharded_2d_both_schemes(rng):
    """Both sharded schemes are dimension-generic: 2D quad meshes run
    through the same programs and match the single-device result."""
    from multimesh_tpu.dist import source_sharded_transfer
    from multimesh_tpu.search import locate

    src = mmt.box_mesh(shape=(6, 6), order=2, warp=0.05)
    field = mmt.element_nodal_field(src, "smooth")
    pts = rng.uniform(0.03, 0.97, (300, 2))
    cfg = LocateConfig(nelem_to_search=8, newton_iters=10,
                       polish_iters=2)

    res = locate(pts, src.points, order=2, fallback="snap", cfg=cfg)
    v1 = np.einsum("pn,pn->p", np.asarray(res.weights),
                   field[np.asarray(res.elements)])
    v8 = np.asarray(sharded_transfer(
        pts, src.points, field[None], order=2, cfg=cfg, fallback="snap",
        mesh=make_mesh(),
    ))[:, 0]
    np.testing.assert_allclose(v8, v1, rtol=1e-5)
    v8s = np.asarray(source_sharded_transfer(
        pts, src.points, field[None], order=2, cfg=cfg,
        mesh=make_mesh(),
    ))[:, 0]
    np.testing.assert_allclose(v8s, v1, rtol=1e-9)


def _shell_points(rng, n, scale_exterior=0):
    r = rng.uniform(3.6e6, 6.2e6, n)
    th = rng.uniform(0.55, 1.15, n)
    ph = rng.uniform(0.35, 1.35, n)
    pts = np.stack(
        [r * np.sin(th) * np.cos(ph), r * np.sin(th) * np.sin(ph),
         r * np.cos(th)], -1)
    if scale_exterior:
        pts[:scale_exterior] *= 1.5
    return pts


@pytest.mark.parametrize("fallback", ["sentinel", "snap", "fixed_ref"])
def test_sharded_ladder_fallback_modes(rng, fallback):
    """The production (ladder) sharded program carries every single-chip
    fallback semantics, including fixed_ref (whose unaccepted rows are
    delegated to the host-side exhaustive-scan retry)."""
    from multimesh_tpu.search import locate

    mesh = mmt.shell_mesh(n_lat=4, n_lon=5, n_rad=3, order=2)
    field = mmt.element_nodal_field(mesh, "smooth")
    pts = _shell_points(rng, 1500, scale_exterior=150)
    cfg = LocateConfig()
    vals = sharded_transfer(
        pts, mesh.points, field[None], order=2, cfg=cfg,
        fallback=fallback, use_aabb=fallback == "fixed_ref",
        mesh=make_mesh(), chunk=512,  # several host-level blocks
    )
    res = locate(pts, mesh.points, order=2, cfg=cfg, fallback=fallback,
                 use_aabb=fallback == "fixed_ref", engine="xla",
                 strategy="scan")
    w = np.asarray(res.weights)
    el = np.asarray(res.elements)
    f = np.asarray(res.found)
    expected = np.einsum(
        "fnk,nk->nf", field[None][:, np.maximum(el, 0), :], w
    )
    expected[~(f & (el >= 0))] = 0.0
    ok = f & (el >= 0)
    if fallback == "sentinel":
        assert 0.85 < ok.mean() < 1.0  # exterior rows stay sentinel
    else:
        assert ok.all()
    np.testing.assert_allclose(vals[ok], expected[ok], rtol=1e-5,
                               atol=1e-9 * np.abs(expected).max())


def test_sharded_device_in_out(rng):
    """Device-resident query points are consumed in place and
    device_out=True returns device values identical to the host path
    (the mode HBM-resident pipelines and the bench use)."""
    import jax.numpy as jnp

    mesh = mmt.shell_mesh(n_lat=3, n_lon=4, n_rad=2, order=2)
    field = mmt.element_nodal_field(mesh, "smooth")
    pts = _shell_points(rng, 700, scale_exterior=70)
    cfg = LocateConfig()
    kw = dict(order=2, cfg=cfg, fallback="sentinel", mesh=make_mesh(),
              chunk=256)
    v_host = sharded_transfer(pts, mesh.points, field[None], **kw)
    v_dev = sharded_transfer(jnp.asarray(pts), mesh.points, field[None],
                             device_out=True, **kw)
    assert isinstance(v_dev, jnp.ndarray)
    np.testing.assert_allclose(np.asarray(v_dev), v_host, rtol=1e-6,
                               atol=1e-12)


@pytest.mark.slow
def test_sharded_ladder_grid_mode(rng):
    """Sources beyond APPROX_GRID_MIN_SOURCES route the sharded ladder
    through the balanced-bin index (round-1 nearest member + in-jit grid
    re-probe rescue): the replicated scheme is no longer quadratic in E
    (VERDICT round-3 weak item 4)."""
    from multimesh_tpu.search import locate
    from multimesh_tpu.search.grid import APPROX_GRID_MIN_SOURCES

    mesh = mmt.shell_mesh(n_lat=24, n_lon=48, n_rad=16, order=1)
    assert mesh.points.shape[0] > APPROX_GRID_MIN_SOURCES
    field = mmt.element_nodal_field(mesh, "smooth")
    pts = _shell_points(rng, 4096)
    cfg = LocateConfig()
    vals = sharded_transfer(
        pts, mesh.points, field[None], order=1, cfg=cfg,
        fallback="sentinel", mesh=make_mesh(), chunk=512,
    )
    res = locate(pts, mesh.points, order=1, cfg=cfg, fallback="sentinel",
                 engine="xla", strategy="scan")
    w = np.asarray(res.weights)
    el = np.asarray(res.elements)
    f = np.asarray(res.found)
    expected = np.einsum(
        "fnk,nk->nf", field[None][:, np.maximum(el, 0), :], w
    )
    expected[~f] = 0.0
    assert f.mean() > 0.99
    np.testing.assert_allclose(vals[f], expected[f], rtol=2e-5,
                               atol=1e-9 * np.abs(expected).max())
