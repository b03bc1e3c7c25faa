"""kNN kernel vs scipy.spatial.cKDTree (SURVEY.md section 4)."""
import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial import cKDTree

from multimesh_tpu.search import knn


@pytest.mark.parametrize(
    "n_src,n_query,k,src_chunk",
    [
        (1000, 500, 20, 8192),     # single source chunk
        (5000, 300, 25, 512),      # streaming merge across source chunks
        (300, 100, 20, 128),       # k comparable to chunk
        (10, 50, 20, 128),         # fewer sources than k
    ],
)
def test_knn_matches_ckdtree(rng, n_src, n_query, k, src_chunk):
    src = rng.uniform(-1, 1, size=(n_src, 3))
    q = rng.uniform(-1.1, 1.1, size=(n_query, 3))
    d2, idx = knn(src, q, k, source_chunk=src_chunk, dtype=jnp.float64)
    d2 = np.asarray(d2)
    idx = np.asarray(idx)

    tree = cKDTree(src)
    k_eff = min(k, n_src)
    dist, ref_idx = tree.query(q, k=k_eff)
    np.testing.assert_allclose(
        np.sqrt(np.maximum(d2[:, :k_eff], 0)), dist, atol=1e-9
    )
    # indices may differ under exact distance ties; compare distances of
    # the returned indices instead of the indices themselves
    d_mine = np.linalg.norm(src[idx[:, :k_eff]] - q[:, None], axis=-1)
    np.testing.assert_allclose(d_mine, dist, atol=1e-9)


def test_knn_earth_scale_f32_ranking(rng):
    """f32 ranking at earth-scale coordinates: centering must keep the
    candidate sets usable (top-k sets agree with f64 tree on the first
    few neighbors up to distance ties)."""
    src = rng.uniform(-6.4e6, 6.4e6, size=(4000, 3))
    q = src[:200] + rng.normal(scale=1e3, size=(200, 3))
    d2, idx = knn(src, q, 10)
    tree = cKDTree(src)
    dist, ref_idx = tree.query(q, k=10)
    d_mine = np.linalg.norm(src[np.asarray(idx)] - q[:, None], axis=-1)
    np.testing.assert_allclose(d_mine, dist, rtol=1e-5, atol=1.0)


def test_knn_query_chunking(rng):
    src = rng.uniform(0, 1, size=(512, 3))
    q = rng.uniform(0, 1, size=(1000, 3))
    d2a, idxa = knn(src, q, 5, query_chunk=333)
    d2b, idxb = knn(src, q, 5)
    np.testing.assert_allclose(np.asarray(d2a), np.asarray(d2b), rtol=1e-6)
    # index reassembly too, not just distances (random f64 coords make
    # exact ties across chunk boundaries impossible)
    np.testing.assert_array_equal(np.asarray(idxa), np.asarray(idxb))


def test_knn_zero_queries(rng):
    """Empty query sets return empty [0, k] arrays, not IndexError."""
    from multimesh_tpu.search.knn import knn, approx_knn

    src = rng.random((64, 3))
    d2, idx = knn(src, np.zeros((0, 3)), k=8)
    assert d2.shape == (0, 8) and idx.shape == (0, 8)
    perm = rng.permutation(64)
    d2, idx = approx_knn(src[perm], perm, np.zeros((0, 3)), k=8)
    assert d2.shape == (0, 8) and idx.shape == (0, 8)


@pytest.mark.parametrize("d", [2, 3])
def test_pallas_nearest_interpret_matches_xla(rng, d):
    """The fused Pallas nearest-centroid kernel (interpret mode on CPU;
    scores never leave VMEM on hardware -- see search/pallas_argmin)
    must pick sources at the same distance as the XLA matmul+argmax."""
    from multimesh_tpu.search.knn import _nearest_jit
    from multimesh_tpu.search.pallas_argmin import _nearest_pallas_jit

    E, C = 300, 700  # off the lane/block grid: exercises all padding
    src = jnp.asarray(rng.uniform(-6.4e6, 6.4e6, size=(E, d)))
    q = jnp.asarray(rng.uniform(-6.0e6, 6.0e6, size=(C, d)))
    a = np.asarray(_nearest_jit(q, src))
    b = np.asarray(_nearest_pallas_jit(q, src, interpret=True))
    assert b.min() >= 0 and b.max() < E
    # picks must be distance-equivalent (rank noise between the two
    # matmul formulations only ever swaps near-ties)
    sa = np.asarray(src)[a]
    sb = np.asarray(src)[b]
    qa = np.asarray(q)
    da = np.sum((qa - sa) ** 2, axis=-1)
    db = np.sum((qa - sb) ** 2, axis=-1)
    np.testing.assert_allclose(db, da, rtol=1e-3, atol=1.0)
    assert (a == b).mean() > 0.99
