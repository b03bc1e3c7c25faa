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
