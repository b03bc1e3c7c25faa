"""On-hardware regression tests (VERDICT r3 item 6).

The CPU suite runs the Pallas kernels in *interpret* mode only, whose
semantics differ from compiled Mosaic in EFT-critical ways (see
search/pallas_df32.py docstring).  This module asserts the real-chip
behavior; it is skipped unless MMT_TPU_TESTS=1 (see conftest), in which
mode ONLY this subset runs and the platform is left on the TPU:

    MMT_TPU_TESTS=1 python -m pytest tests/ -m tpu -q
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimesh_tpu import testing as mmt
from multimesh_tpu.config import LocateConfig
from multimesh_tpu.search.locate import locate

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module")
def shell_problem():
    mesh = mmt.shell_mesh(n_lat=6, n_lon=8, n_rad=4, order=4)
    field = mmt.element_nodal_field(mesh, "smooth")
    rng = np.random.default_rng(99)
    n = 8192
    r = rng.uniform(3.65e6, 6.25e6, n)
    th = rng.uniform(0.56, 1.14, n)
    ph = rng.uniform(0.36, 1.34, n)
    pts = np.stack(
        [r * np.sin(th) * np.cos(ph), r * np.sin(th) * np.sin(ph),
         r * np.cos(th)], -1)
    return mesh, field, pts


def _interp(res, field):
    w = np.asarray(res.weights)
    el = np.asarray(res.elements)
    f = np.asarray(res.found)
    v = np.einsum("nk,nk->n", field[np.maximum(el, 0)], w)
    v[~(f & (el >= 0))] = 0.0
    return v, f, el


def test_tpu_platform():
    assert jax.devices()[0].platform not in ("cpu", "gpu")


@pytest.mark.parametrize("fallback", ["sentinel", "fixed_ref"])
def test_tpu_ladder_scan_oracle(shell_problem, fallback):
    """Compiled Mosaic ladder == XLA scan == analytic oracle on the real
    chip (the CPU suite only ever checks the interpret-mode kernel)."""
    mesh, field, pts = shell_problem
    cfg = LocateConfig(accept_tol=1.04)
    kw = dict(order=4, cfg=cfg, fallback=fallback,
              use_aabb=fallback == "fixed_ref")
    lad = locate(pts, mesh.points, strategy="ladder", engine="pallas",
                 **kw)
    scan = locate(pts, mesh.points, strategy="scan", engine="xla", **kw)
    vl, fl, el = _interp(lad, field)
    vs, fs, es = _interp(scan, field)
    both = fl & fs
    assert both.mean() > 0.98
    rel = np.abs(vl[both] - vs[both]).max() / np.abs(vs[both]).max()
    assert rel < 5e-5, rel
    assert (el[both] == es[both]).mean() > 0.95
    # absolute accuracy against the analytic field
    truth = mmt.smooth_field(pts)
    rel_o = np.abs(vl[fl] - truth[fl]).max() / np.abs(truth[fl]).max()
    assert rel_o < 1e-4, rel_o


def test_tpu_df32_polish_matches_ref(rng):
    """The compiled Mosaic df32 polish kernel must reproduce the pure-XLA
    EFT reference (interpret mode is documented to differ; hardware must
    not)."""
    from multimesh_tpu.search import pallas_df32 as pd32
    from test_pallas_df32 import _polish_setup

    order, dim = 4, 3
    args, refs_true, _ = _polish_setup(order, dim, E=6, M=1024, rng=rng)
    hi_k, lo_k, ok_k = pd32.polish_pairs(
        *args, order=order, dim=dim, iters=1, interpret=False
    )
    hi_r, lo_r, ok_r = pd32.polish_pairs_ref(
        *args, order=order, dim=dim, iters=1
    )
    got = np.asarray(hi_k, np.float64) + np.asarray(lo_k, np.float64)
    ref = np.asarray(hi_r, np.float64) + np.asarray(lo_r, np.float64)
    assert bool(jnp.all(ok_k)) and bool(jnp.all(ok_r))
    # both must sit at the df32 pair floor vs the true refs
    assert np.abs(got - refs_true).max() < 1e-10
    # and agree with each other to pair-floor tolerance (bit-identity is
    # the goal; a few ulps of slack keeps XLA scheduling freedom from
    # flaking the suite)
    assert np.abs(got - ref).max() < 1e-12


def test_tpu_sharded_program(shell_problem):
    """The production sharded program (1-device mesh on the real chip,
    pallas ladder branch) matches single-chip locate."""
    from multimesh_tpu.dist import make_mesh
    from multimesh_tpu.dist.sharding import sharded_transfer

    mesh, field, pts = shell_problem
    cfg = LocateConfig(accept_tol=1.04)
    vals = sharded_transfer(
        pts, mesh.points, field[None], order=4, cfg=cfg,
        fallback="sentinel", mesh=make_mesh(1), chunk=8192,
    )
    res = locate(pts, mesh.points, order=4, cfg=cfg, fallback="sentinel",
                 engine="pallas", strategy="scan")
    vs, fs, _ = _interp(res, field)
    rel = np.abs(vals[fs, 0] - vs[fs]).max() / np.abs(vs[fs]).max()
    assert rel < 5e-5, rel


@pytest.fixture(scope="module")
def big_shell():
    """A source mesh large enough that candidates come from the
    balanced-bin grid index (E > grid.APPROX_GRID_MIN_SOURCES) -- the
    CPU suite exercises this path in interpret/xla mode only."""
    mesh = mmt.shell_mesh(n_lat=32, n_lon=32, n_rad=18, order=1)
    field = mmt.element_nodal_field(mesh, "smooth")
    return mesh, field


def test_tpu_grid_path_locate(big_shell):
    """Grid-mode ladder (nearest-member round 1, bin re-probe rescue) on
    compiled Mosaic vs the exhaustive scan and the analytic field."""
    from multimesh_tpu.search.grid import APPROX_GRID_MIN_SOURCES

    mesh, field = big_shell
    assert mesh.nelem > APPROX_GRID_MIN_SOURCES
    rng = np.random.default_rng(7)
    n = 65536
    r = rng.uniform(3.65e6, 6.25e6, n)
    th = rng.uniform(0.56, 1.14, n)
    ph = rng.uniform(0.36, 1.34, n)
    pts = np.stack(
        [r * np.sin(th) * np.cos(ph), r * np.sin(th) * np.sin(ph),
         r * np.cos(th)], -1)
    mesh.points.setflags(write=False)
    cfg = LocateConfig(accept_tol=1.05)
    lad = locate(pts, mesh.points, order=1, cfg=cfg, fallback="snap",
                 strategy="ladder", engine="pallas")
    vl, fl, el = _interp(lad, field)
    truth = mmt.smooth_field(pts)
    # trilinear source: discretization-limited accuracy
    rel = np.abs(vl - truth).max() / np.abs(truth).max()
    assert rel < 5e-3, rel
    scan = locate(pts[:4096], mesh.points, order=1, cfg=cfg,
                  fallback="snap", strategy="scan", engine="xla")
    vs, _, _ = _interp(scan, field)
    rel_s = np.abs(vl[:4096] - vs).max() / np.abs(vs).max()
    assert rel_s < 5e-5, rel_s


def test_tpu_df32_apply_end_to_end(shell_problem):
    """df32 pair polish + compensated apply on compiled Mosaic: a linear
    field must come back at f64 grade (~1e-9), far beyond the f32
    plateau (~1e-6)."""
    from multimesh_tpu.ops import TransferOperator

    mesh, _, pts = shell_problem
    field = mmt.smooth_field(mesh.points, "linear")
    cfg = LocateConfig(accept_tol=1.04, df32_polish=True)
    op = TransferOperator.build(mesh.points, pts, order=4, cfg=cfg,
                                fallback="sentinel")
    assert op.refs_lo is not None
    vals = np.asarray(op.apply(field))
    found = np.asarray(op.elements) >= 0
    assert found.mean() > 0.98
    truth = mmt.smooth_field(pts, "linear")
    rel = np.abs(vals[found] - truth[found]).max() / np.abs(
        truth[found]).max()
    assert rel < 1e-8, rel


def test_tpu_gll_2_gll_file_path(tmp_path):
    """The flagship FILE path (read -> fingerprint/dedup -> fixed_ref
    ladder -> streamed pull/write) end to end on the real chip."""
    from multimesh_tpu import api
    from multimesh_tpu.io import SalvusMesh

    src = mmt.shell_mesh(n_lat=5, n_lon=5, n_rad=3, order=4)
    tgt = mmt.shell_mesh(n_lat=4, n_lon=4, n_rad=3, order=4,
                         r_inner=3.6e6, r_outer=6.3e6,
                         lat_extent=(0.55, 1.15), lon_extent=(0.35, 1.35))
    src_path, tgt_path = tmp_path / "s.h5", tmp_path / "t.h5"
    mmt.write_salvus_fixture(src_path, src, parameters=("VP", "VS"))
    mmt.write_salvus_fixture(tgt_path, tgt, parameters=("VP", "VS"))
    api.gll_2_gll(from_gll=str(src_path), to_gll=str(tgt_path))
    out = SalvusMesh(tgt_path, fast_mode=False)
    truth = mmt.smooth_field(tgt.points)
    rel = np.abs(out.element_nodal_fields["VP"] - truth).max() / np.abs(
        truth).max()
    assert rel < 1e-4, rel


def test_tpu_exodus_2_gll_file_path(tmp_path):
    """Exodus -> GLL file path (C-kernel acceptance semantics, f32
    device relayout before the pull) on the real chip."""
    from multimesh_tpu import api
    import h5py

    src = mmt.shell_mesh(n_lat=16, n_lon=16, n_rad=12, order=1)
    tgt = mmt.shell_mesh(n_lat=4, n_lon=4, n_rad=3, order=4,
                         r_inner=3.6e6, r_outer=6.3e6,
                         lat_extent=(0.55, 1.15), lon_extent=(0.35, 1.35))
    f_exo = tmp_path / "src.e"
    f_gll = tmp_path / "tgt.h5"
    mmt.write_exodus_fixture(f_exo, src, parameters=("VP", "VS", "RHO"))
    mmt.write_salvus_fixture(f_gll, tgt, parameters=("VP", "VS", "RHO"),
                             field_kind="linear")
    api.exodus_2_gll(str(f_exo), str(f_gll),
                     parameters=["VP", "VS", "RHO"])
    with h5py.File(f_gll, "r") as h5:
        got = np.asarray(h5["MODEL/data"][:, 0, :])
    truth = mmt.smooth_field(tgt.points.reshape(-1, 3)).reshape(
        tgt.nelem, tgt.n_gll)
    rel = np.abs(got - truth).max() / np.abs(truth).max()
    assert rel < 5e-3, rel  # trilinear source discretization


def test_tpu_source_sharded_program(shell_problem):
    """The source-sharded scheme (two-pass local-try -> all_gather
    retry) on a 1-device mesh on the real chip."""
    from multimesh_tpu.dist import make_mesh, source_sharded_transfer
    from multimesh_tpu.ops import TransferOperator

    mesh, field, pts = shell_problem
    cfg = LocateConfig(accept_tol=1.05, nelem_to_search=8)
    vals = source_sharded_transfer(
        pts, mesh.points, field[None], order=4, cfg=cfg,
        mesh=make_mesh(1),
    )
    op = TransferOperator.build(mesh.points, pts, order=4, cfg=cfg,
                                fallback="sentinel")
    expected = np.asarray(op.apply(field[None]))
    found = expected[:, 0] != 0
    assert found.mean() > 0.98
    rel = np.abs(vals[found, 0] - expected[found, 0]).max() / np.abs(
        expected[found, 0]).max()
    assert rel < 5e-5, rel


def test_tpu_pallas_nearest_matches_xla(shell_problem):
    """Compiled Mosaic fused nearest-centroid == XLA matmul+argmax on
    the real chip (the production round-1 candidate pass at E<=16384)."""
    from multimesh_tpu.search.knn import _nearest_jit
    from multimesh_tpu.search.pallas_argmin import _nearest_pallas_jit

    mesh, _, pts = shell_problem
    cents = jnp.asarray(mesh.points.mean(axis=1))
    q = jnp.asarray(pts)
    a = np.asarray(_nearest_jit(q, cents))
    b = np.asarray(_nearest_pallas_jit(q, cents))
    c = np.asarray(cents)
    da = np.sum((pts - c[a]) ** 2, axis=-1)
    db = np.sum((pts - c[b]) ** 2, axis=-1)
    # same candidate-grade ranking (bf16 dot both sides): any
    # disagreement must be a near-tie
    assert (a == b).mean() > 0.999
    np.testing.assert_allclose(db, da, rtol=1e-2, atol=1.0)
