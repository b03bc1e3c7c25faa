"""Tests for the ops layer: transfer operator, dedup, layers, sphere
mapping, fluid repair."""
import numpy as np
import pytest

from multimesh_tpu import testing as mmt
from multimesh_tpu.ops import (
    TransferOperator, unique_points, unique_points_per_layer,
    resolve_layers, layer_masks, map_to_sphere, repair_fluid_solid,
)


def test_unique_points_contract(rng):
    mesh = mmt.box_mesh(shape=(3, 3, 3), order=2)
    uniq, recon = unique_points(mesh.points)
    flat = mesh.points.reshape(-1, 3)
    np.testing.assert_allclose(uniq[recon], flat)
    # shared faces mean real dedup happened
    assert len(uniq) < len(flat)
    # matches numpy's reference result
    uref, rref = np.unique(flat, return_inverse=True, axis=0)
    assert len(uniq) == len(uref)
    np.testing.assert_allclose(uniq[recon], uref[rref.ravel()])


def test_transfer_operator_roundtrip(tmp_path, rng):
    src = mmt.box_mesh(shape=(3, 3, 3), order=4, warp=0.1)
    field = mmt.element_nodal_field(src, "smooth")
    pts = rng.uniform(0.1, 0.9, size=(300, 3))

    op = TransferOperator.build(src.points, pts, order=4)
    assert op.num_missing == 0
    vals = op.apply(field)

    # multi-field stack
    stack = np.stack([field, 2 * field])
    out = op.apply(stack)
    np.testing.assert_allclose(out[:, 0], vals)
    np.testing.assert_allclose(out[:, 1], 2 * vals)

    # save / load (default compact refs format: no dense coeffs on disk)
    op.save(tmp_path / "cache")
    assert (tmp_path / "cache" / "refs.npy").exists()
    assert not (tmp_path / "cache" / "coeffs.npy").exists()
    op2 = TransferOperator.load(tmp_path / "cache")
    assert op2.order == 4
    np.testing.assert_allclose(op2.apply(field), vals)
    assert TransferOperator.exists(tmp_path / "cache")
    assert not TransferOperator.exists(tmp_path / "nope")

    # dense export (reference stored_array compatibility)
    op.save(tmp_path / "dense", dense=True)
    assert (tmp_path / "dense" / "coeffs.npy").exists()
    op3 = TransferOperator.load(tmp_path / "dense")
    np.testing.assert_allclose(op3.apply(field), vals)
    # the compact form is ~(p+1)^d/d smaller than the dense export
    compact_bytes = (tmp_path / "cache" / "refs.npy").stat().st_size
    dense_bytes = (tmp_path / "dense" / "coeffs.npy").stat().st_size
    assert compact_bytes * 10 < dense_bytes


def test_transfer_operator_fingerprint(tmp_path, rng):
    """A cache saved for one mesh must be refused for a same-size other
    mesh (the reference's name-only .npy caches silently reuse it)."""
    from multimesh_tpu.ops import content_fingerprint

    src_a = mmt.box_mesh(shape=(2, 2, 2), order=2, warp=0.05)
    src_b = mmt.box_mesh(shape=(2, 2, 2), order=2, warp=0.11)
    pts = rng.uniform(0.2, 0.8, size=(40, 3))

    fp_a = content_fingerprint(src_a.points, pts)
    fp_b = content_fingerprint(src_b.points, pts)
    assert fp_a != fp_b

    op = TransferOperator.build(src_a.points, pts, order=2)
    op.save(tmp_path / "cache", fingerprint=fp_a)
    # matching fingerprint loads fine
    TransferOperator.load(tmp_path / "cache", fingerprint=fp_a)
    # different geometry with identical shapes is refused
    with pytest.raises(ValueError, match="different geometry"):
        TransferOperator.load(tmp_path / "cache", fingerprint=fp_b)
    # a cache saved without a fingerprint is refused when one is expected
    op.save(tmp_path / "nofp")
    with pytest.raises(ValueError, match="different geometry"):
        TransferOperator.load(tmp_path / "nofp", fingerprint=fp_a)
    # loading without expectations still works (back-compat)
    TransferOperator.load(tmp_path / "nofp")


def test_gll_2_gll_rejects_stale_cache(tmp_path):
    """End-to-end: gll_2_gll with stored_array rebuilds when the cache
    came from different geometry of equal size (proved by poisoning the
    cached coefficients -- a silently reused cache would emit garbage)."""
    import h5py
    from multimesh_tpu import engine

    src = mmt.shell_mesh(n_lat=3, n_lon=3, n_rad=2, order=2)
    tgt = mmt.shell_mesh(n_lat=4, n_lon=3, n_rad=2, order=2)

    a = tmp_path / "a.h5"
    b1 = tmp_path / "b1.h5"
    mmt.write_salvus_fixture(a, src, parameters=("VP", "VS"))
    mmt.write_salvus_fixture(b1, tgt, parameters=("VP", "VS"))
    cache = tmp_path / "op_cache"
    engine.gll_2_gll(a, b1, stored_array=cache)

    # poison the cached refs; only a rebuild can now give sane values
    refs = np.load(cache / "refs.npy")
    np.save(cache / "refs.npy", np.full_like(refs, 0.999))

    # same-shape source, perturbed geometry: fingerprint must mismatch
    src2 = mmt.shell_mesh(n_lat=3, n_lon=3, n_rad=2, order=2)
    src2.points *= 1.0001
    a2 = tmp_path / "a2.h5"
    b2 = tmp_path / "b2.h5"
    mmt.write_salvus_fixture(a2, src2, parameters=("VP", "VS"))
    mmt.write_salvus_fixture(b2, tgt, parameters=("VP", "VS"))
    engine.gll_2_gll(a2, b2, stored_array=cache)
    with h5py.File(b2, "r") as f:
        out = np.asarray(f["MODEL/data"][()])
    truth = mmt.element_nodal_field(tgt, "smooth")
    # interpolated VP tracks the analytic field => operator was rebuilt
    rel = np.abs(out[:, 0, :] - truth) / np.abs(truth)
    assert np.median(rel) < 1e-2


def test_transfer_operator_nan_cache_rejected(tmp_path):
    src = mmt.box_mesh(shape=(2, 2, 2), order=1)
    pts = np.full((5, 3), 0.5)
    op = TransferOperator.build(src.points, pts, order=1)
    op.weights = np.array(op.weights)  # device array is immutable
    op.weights[0, 0] = np.nan
    op.save(tmp_path / "bad")  # explicit weights force the dense format
    with pytest.raises(ValueError, match="NaN"):
        TransferOperator.load(tmp_path / "bad")

    # compact format: non-finite stored refs are refused the same way
    op2 = TransferOperator.build(src.points, pts, order=1)
    op2.save(tmp_path / "bad_refs")
    refs = np.load(tmp_path / "bad_refs" / "refs.npy")
    refs[0, 0] = np.inf
    np.save(tmp_path / "bad_refs" / "refs.npy", refs)
    with pytest.raises(ValueError, match="non-finite"):
        TransferOperator.load(tmp_path / "bad_refs")


@pytest.mark.slow
def test_transfer_operator_compact_preserves_df32_pairs(tmp_path, rng):
    """A df32-polished operator round-trips its (hi, lo) ref pairs, so a
    reloaded cache keeps the full pair precision (weights materialized
    from hi+lo in f64)."""
    from multimesh_tpu.config import LocateConfig

    src = mmt.box_mesh(shape=(3, 3, 3), order=2, warp=0.05)
    field = mmt.element_nodal_field(src, "smooth")
    pts = rng.uniform(0.1, 0.9, size=(200, 3))
    cfg = LocateConfig(df32_polish=True)
    op = TransferOperator.build(src.points, pts, order=2, cfg=cfg,
                                engine="pallas")
    if op.refs_lo is None:
        pytest.skip("df32 polish inactive on this platform")
    vals = np.asarray(op.apply(field))
    op.save(tmp_path / "df32")
    assert (tmp_path / "df32" / "refs_lo.npy").exists()
    op2 = TransferOperator.load(tmp_path / "df32")
    assert op2.refs_lo is not None
    np.testing.assert_allclose(np.asarray(op2.apply(field)), vals,
                               rtol=1e-12, atol=1e-14)


def test_transfer_operator_dedup_recon(rng):
    """Building on unique points + recon reproduces the full-point result
    (the reference's unique-point pipeline, interpolator.py:744)."""
    src = mmt.box_mesh(shape=(3, 3, 3), order=2, warp=0.05)
    tgt = mmt.box_mesh(shape=(4, 4, 4), order=2)
    field = mmt.element_nodal_field(src, "smooth")

    flat = tgt.points.reshape(-1, 3)
    uniq, recon = unique_points(tgt.points)

    full_op = TransferOperator.build(src.points, flat, order=2,
                                     fallback="snap")
    uniq_op = TransferOperator.build(src.points, uniq, order=2,
                                     fallback="snap", recon=recon)
    np.testing.assert_allclose(
        uniq_op.apply(field), full_op.apply(field), rtol=1e-10
    )


def test_resolve_layers_semantics():
    # descending ids: 5 4 = crust (moho_idx=2), 3 2 = mantle, 1 = fluid core
    layer_field = np.repeat([5, 4, 3, 2, 1], 4)
    fluid = (layer_field == 1).astype(float)

    ids, mask = resolve_layers(layer_field, "all")
    np.testing.assert_array_equal(ids, [5, 4, 3, 2, 1])
    assert not mask

    ids, _ = resolve_layers(layer_field, "crust", moho_idx=2, fluid_field=fluid)
    np.testing.assert_array_equal(ids, [5, 4])
    ids, _ = resolve_layers(layer_field, "mantle", moho_idx=2,
                            fluid_field=fluid)
    np.testing.assert_array_equal(ids, [3, 2])
    ids, _ = resolve_layers(layer_field, "core", fluid_field=fluid)
    np.testing.assert_array_equal(ids, [1])
    ids, _ = resolve_layers(layer_field, "nocore", fluid_field=fluid)
    np.testing.assert_array_equal(ids, [5, 4, 3, 2])

    ids, _ = resolve_layers(layer_field, [3, 2])
    np.testing.assert_array_equal(ids, [3, 2])
    with pytest.raises(ValueError):
        resolve_layers(layer_field, [9])
    with pytest.raises(ValueError):
        resolve_layers(layer_field, "bogus")

    masks = layer_masks(layer_field, np.asarray([5, 1]))
    assert masks["5"].sum() == 4 and masks["1"].sum() == 4


def test_unique_points_per_layer():
    mesh = mmt.shell_mesh(n_lat=3, n_lon=3, n_rad=2, order=2, n_layers=2)
    masks = layer_masks(mesh.layer_id, np.asarray([2, 1]))
    per = unique_points_per_layer(mesh.points, masks)
    for layer, m in masks.items():
        uniq, recon = per[layer]
        np.testing.assert_allclose(
            uniq[recon], mesh.points[m].reshape(-1, 3)
        )


def test_map_to_sphere():
    mesh = mmt.shell_mesh(n_lat=3, n_lon=3, n_rad=2, order=2)

    class M:
        points = mesh.points.copy() * 1.01  # slightly inflated "ellipse"
        element_nodal_fields = {
            "z_node_1D": np.linalg.norm(mesh.points, axis=-1) / 6.371e6
        }

    m = M()
    before = m.points.copy()
    map_to_sphere(m)
    r_after = np.linalg.norm(m.points, axis=-1)
    np.testing.assert_allclose(
        r_after, np.linalg.norm(mesh.points, axis=-1), rtol=1e-12
    )
    # radial rescale only: directions unchanged
    np.testing.assert_allclose(
        m.points / r_after[..., None],
        before / np.linalg.norm(before, axis=-1)[..., None],
        rtol=1e-12,
    )


def test_repair_fluid_solid():
    nelem, nparams, ngll = 6, 3, 8
    params = ["VP", "VS", "RHO"]
    old = np.full((nelem, nparams, ngll), 7.0)
    new = np.full((nelem, nparams, ngll), 1.0)
    solid = np.array([True, True, True, True, False, False])
    # solid element 1 received fake-fluid zero VS
    new[1, 1, 3] = 0.0
    # fluid element 4 received solid values (anything non-original)
    out = repair_fluid_solid(new, old, solid, params)
    np.testing.assert_allclose(out[4], old[4])  # fluid keeps old
    np.testing.assert_allclose(out[5], old[5])
    np.testing.assert_allclose(out[1], old[1])  # fake-fluid solid reverted
    np.testing.assert_allclose(out[0], new[0])  # untouched solid keeps new
    # VSV naming also recognized
    out2 = repair_fluid_solid(new, old, solid, ["VPV", "VSV", "RHO"])
    np.testing.assert_allclose(out2[1], old[1])


def test_map_to_sphere_flat_vertex_mesh():
    """The reference maps UnstructuredMesh-like meshes too (flat vertex
    list + connectivity, element-nodal z_node_1D folded per vertex)."""
    from multimesh_tpu.config import R_EARTH_M
    from multimesh_tpu.ops import map_to_sphere
    from multimesh_tpu import testing as mmt

    mesh = mmt.shell_mesh(n_lat=3, n_lon=3, n_rad=2, order=1)

    class Flat:
        pass

    flat = Flat()
    flat.points = mesh.vertices.copy()
    flat.connectivity = mesh.connectivity
    r_elem = np.linalg.norm(mesh.points, axis=-1)
    # a z_node_1D that differs from the current radii: scale by 0.9
    flat.element_nodal_fields = {
        "z_node_1D": 0.9 * r_elem / R_EARTH_M
    }
    before = flat.points.copy()
    map_to_sphere(flat)
    got_r = np.linalg.norm(flat.points, axis=-1)
    want_r = 0.9 * np.linalg.norm(mesh.vertices, axis=-1)
    np.testing.assert_allclose(got_r, want_r, rtol=1e-12)
    np.testing.assert_allclose(  # directions unchanged
        flat.points / got_r[..., None],
        before / np.linalg.norm(before, axis=-1)[..., None],
        rtol=1e-12,
    )


class _EllipseMesh:
    """Minimal duck mesh for map_to_ellipse: element-nodal points,
    shape_order, z_node_1D."""

    def __init__(self, points, order, z1d):
        self.points = points
        self.shape_order = order
        self.element_nodal_fields = {"z_node_1D": z1d}


def test_map_to_ellipse_transfers_ellipticity():
    """A base mesh flattened by r -> r*(1 - e*cos^2(theta)) must stretch a
    spherical target by the interpolated same factor, and the base mesh's
    geometry must be restored afterwards
    (reference interpolator.py:1085-1122)."""
    from multimesh_tpu.config import R_EARTH_M
    from multimesh_tpu.ops import map_to_ellipse

    base_sph = mmt.shell_mesh(n_lat=5, n_lon=5, n_rad=3, order=2,
                              lat_extent=(0.5, 1.2), lon_extent=(0.3, 1.4))
    tgt_sph = mmt.shell_mesh(n_lat=3, n_lon=3, n_rad=2, order=2,
                             r_inner=3.7e6, r_outer=6.2e6,
                             lat_extent=(0.55, 1.15),
                             lon_extent=(0.35, 1.35))

    e = 0.003  # synthetic ellipticity (flattening) amplitude
    r_base = np.linalg.norm(base_sph.points, axis=-1)
    cos_th = base_sph.points[..., 2] / r_base
    factor = 1.0 - e * cos_th**2
    base_pts = base_sph.points * factor[..., None]
    base = _EllipseMesh(base_pts.copy(), 2, r_base / R_EARTH_M)

    tgt_r = np.linalg.norm(tgt_sph.points, axis=-1)
    tgt = _EllipseMesh(tgt_sph.points.copy(), 2, tgt_r / R_EARTH_M)

    map_to_ellipse(base, tgt)

    # base geometry restored bit-exactly
    np.testing.assert_array_equal(base.points, base_pts)
    # target stretched by the (smooth, interpolable) factor
    cos_tt = tgt_sph.points[..., 2] / tgt_r
    want = tgt_sph.points * (1.0 - e * cos_tt**2)[..., None]
    np.testing.assert_allclose(tgt.points, want, rtol=1e-5)


def test_map_to_ellipse_restores_on_failure():
    """If the transfer fails mid-way, BOTH meshes keep their original
    geometry (exception-safe restore)."""
    from multimesh_tpu.config import R_EARTH_M
    from multimesh_tpu.ops import map_to_ellipse

    base_sph = mmt.shell_mesh(n_lat=3, n_lon=3, n_rad=2, order=2)
    r_base = np.linalg.norm(base_sph.points, axis=-1)
    base = _EllipseMesh(base_sph.points.copy(), 2, r_base / R_EARTH_M)
    base_before = base.points.copy()

    tgt_sph = mmt.shell_mesh(n_lat=3, n_lon=3, n_rad=2, order=2)
    # target LACKS z_node_1D -> map_to_sphere(mesh) raises KeyError
    tgt = _EllipseMesh(
        tgt_sph.points.copy(), 2,
        np.linalg.norm(tgt_sph.points, axis=-1) / R_EARTH_M,
    )
    tgt.element_nodal_fields = {}
    tgt_before = tgt.points.copy()

    with pytest.raises(KeyError):
        map_to_ellipse(base, tgt)
    np.testing.assert_array_equal(base.points, base_before)
    np.testing.assert_array_equal(tgt.points, tgt_before)


def test_unique_points_first_appearance_order(rng):
    """order_by='first' keeps the dedup contract and makes prefix maxima
    of recon monotone (what the engine's streaming write-back relies
    on)."""
    mesh = mmt.box_mesh(shape=(3, 3, 3), order=2)
    flat = mesh.points.reshape(-1, 3)
    uniq, recon = unique_points(mesh.points, order_by="first")
    np.testing.assert_allclose(uniq[recon], flat)
    uref = np.unique(flat, axis=0)
    assert len(uniq) == len(uref)
    # first-appearance labeling: ids are assigned in scan order
    seen = np.maximum.accumulate(recon)
    first_hits = np.nonzero(np.r_[True, np.diff(seen) > 0])[0]
    np.testing.assert_array_equal(recon[first_hits],
                                  np.arange(len(uniq)))
