"""Grid-binned two-level candidate search vs exact kNN."""
import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial import cKDTree

from multimesh_tpu import testing as mmt
from multimesh_tpu.search import build_grid, grid_knn, knn_any


def test_grid_matches_exact_uniform(rng):
    src = rng.uniform(-1, 1, size=(20000, 3))
    q = rng.uniform(-0.9, 0.9, size=(500, 3))
    idx_exact = cKDTree(src).query(q, k=10)[1]
    index = build_grid(src)
    d2, idx = grid_knn(index, q, 10)
    d_mine = np.linalg.norm(src[np.asarray(idx)] - q[:, None], axis=-1)
    d_ref = np.linalg.norm(src[idx_exact] - q[:, None], axis=-1)
    np.testing.assert_allclose(d_mine, d_ref, rtol=1e-5, atol=1e-9)


def test_grid_on_shell_centroids(rng):
    mesh = mmt.shell_mesh(n_lat=12, n_lon=16, n_rad=6, order=1)
    cents = mesh.centroids()
    r = rng.uniform(3.6e6, 6.3e6, 300)
    th = rng.uniform(0.55, 1.15, 300)
    ph = rng.uniform(0.35, 1.35, 300)
    q = np.stack([r * np.sin(th) * np.cos(ph),
                  r * np.sin(th) * np.sin(ph), r * np.cos(th)], -1)
    index = build_grid(cents, target_per_cell=16)
    d2, idx = grid_knn(index, q, 8, n_probe=16)
    d_ref = cKDTree(cents).query(q, k=8)[0]
    d_mine = np.linalg.norm(cents[np.asarray(idx)] - q[:, None], axis=-1)
    np.testing.assert_allclose(d_mine, d_ref, rtol=1e-5, atol=1.0)


def test_knn_any_dispatch(rng):
    src = rng.uniform(0, 1, size=(500, 3))
    q = rng.uniform(0, 1, size=(100, 3))
    # exact mode matches cKDTree
    d2, idx = knn_any(src, q, 5, exact=True)
    d_ref = cKDTree(src).query(q, k=5)[0]
    np.testing.assert_allclose(
        np.sqrt(np.maximum(np.asarray(d2), 0)), d_ref, rtol=1e-6
    )
    # relaxed candidate mode: ascending, and the true nearest neighbor is
    # always covered (that is the locate engine's actual requirement)
    d2, idx = knn_any(src, q, 5)
    assert np.all(np.diff(np.asarray(d2), axis=1) >= -1e-12)
    nn_ref = cKDTree(src).query(q, k=1)[1]
    assert np.all(np.asarray(idx)[:, 0] == nn_ref)

    big = rng.uniform(0, 1, size=(200000, 3))  # above grid threshold
    d2, idx = knn_any(big, q, 5)
    d_ref = cKDTree(big).query(q, k=5)[0]
    d_mine = np.sqrt(np.maximum(np.asarray(d2), 0))
    np.testing.assert_allclose(d_mine, d_ref, rtol=1e-5, atol=1e-9)


def test_knn_any_under_jit(rng):
    """knn_any must be traceable: under jax.jit the sources are tracers,
    so the content-fingerprint caches and host-built grid index are
    unavailable -- the dispatcher has to fall back to tracer-safe routes
    (regression: round 3 found approx=True crashing at trace time)."""
    import jax

    q = rng.uniform(0.1, 0.9, size=(64, 3))
    for n_src, kw, strict in [
        (200, dict(approx=True), True),      # tiny: exact route
        (2000, dict(approx=True), False),    # permuted approx route
        (20000, dict(approx=True, n_probe=4), False),  # grid-sized, degraded
        (2000, dict(exact=True), True),      # exact route
        (2000, dict(exact=False), True),     # relaxed route -> exact
    ]:
        src = rng.uniform(0, 1, size=(n_src, 3))
        f = jax.jit(lambda s, p, kw=kw: knn_any(s, p, 5, **kw))
        d2, idx = f(src, q)
        nn_ref = cKDTree(src).query(q, k=1)[1]
        covered = (np.asarray(idx) == nn_ref[:, None]).any(axis=1)
        if strict:
            # exact routes must cover the true nearest neighbor
            assert np.all(covered), kw
        else:
            # approx routes (TPU approx_max_k) trade recall for speed;
            # the locate ladder's rescue rounds absorb the misses.  Just
            # require the route to be usefully accurate.
            assert covered.mean() >= 0.8, (kw, covered.mean())


def test_locate_on_large_mesh_grid_path(rng):
    """End-to-end locate through the grid candidate path (E > threshold)."""
    from multimesh_tpu.search import locate
    from multimesh_tpu.search import grid as grid_mod

    old = grid_mod.EXACT_KNN_MAX_SOURCES
    grid_mod.EXACT_KNN_MAX_SOURCES = 100  # force the grid path
    try:
        mesh = mmt.box_mesh(shape=(8, 8, 8), order=1, warp=0.05)
        field = mmt.element_nodal_field(mesh, "smooth")
        pts = rng.uniform(0.05, 0.95, size=(400, 3))
        res = locate(pts, mesh.points, order=1, fallback="sentinel")
        assert np.asarray(res.found).all()
        vals = np.einsum(
            "pn,pn->p", np.asarray(res.weights),
            field[np.asarray(res.elements)],
        )
        truth = mmt.smooth_field(pts)
        # order-1 (trilinear) discretization accuracy on an 8^3 mesh
        np.testing.assert_allclose(vals, truth, atol=3e-2)
    finally:
        grid_mod.EXACT_KNN_MAX_SOURCES = old


def test_fingerprint_frozen_identity_cache(rng):
    """Read-only host arrays are content-hashed once and then served
    from the identity cache; distinct content still gets distinct fps."""
    from multimesh_tpu.search.grid import _fingerprint, _FP_HOST_CACHE

    arr = rng.random((512, 4))
    fp_writable = _fingerprint(arr)
    assert id(arr) not in _FP_HOST_CACHE  # writable arrays are not cached
    arr.setflags(write=False)
    fp_frozen = _fingerprint(arr)
    assert fp_frozen == fp_writable
    assert _FP_HOST_CACHE[id(arr)][0]() is arr  # held via weakref
    assert _fingerprint(arr) == fp_frozen  # served from the cache

    other = arr.copy()
    other[3, 1] += 1.0
    other.setflags(write=False)
    assert _fingerprint(other) != fp_frozen

    # unfreeze-mutate-refreeze: same id, same object -- the guard digest
    # must force a rehash instead of serving the stale fingerprint
    arr.setflags(write=True)
    arr[7, 2] += 3.0
    arr.setflags(write=False)
    assert _fingerprint(arr) != fp_frozen

    # the identity cache must not pin GB-scale meshes alive: entries
    # hold weakrefs, so dropping the caller's last reference frees it
    import gc

    key = id(arr)
    del arr
    gc.collect()
    assert _FP_HOST_CACHE[key][0]() is None
