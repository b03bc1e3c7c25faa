"""Cell-binned two-level candidate search for large source meshes.

The exact matmul kNN (search.knn) computes all N x E distances; beyond
~50k source elements that quadratic term dominates the whole transfer.
This module provides the scalable path (the "cell-binned kNN" of
SURVEY.md section 7 / BASELINE.json): element centroids are partitioned
into *balanced* bins, queries rank the bins by representative distance
with one much smaller matmul, and the candidate top-k is recovered from
the members of the ``n_probe`` nearest bins with exact (split-f32)
distances.

Binning is a median-split tree (recursively halve the widest-extent axis
until bins hold <= target members) rather than a uniform grid: seismic
meshes have element sizes varying by orders of magnitude between crust
and core (SURVEY.md "hard parts" item 2), which makes uniform-grid bin
occupancy unbounded, while median splits guarantee bin size by
construction.

Recall: with ``n_probe`` bins per point the true nearest elements of
well-shaped meshes are covered; the locate engine's acceptance ladder adds
a second safety net (a missed non-enclosing candidate is irrelevant, and
points whose candidates all fail acceptance go through the rescue /
fallback paths).  For guaranteed-exact search use search.knn; ``knn_any``
dispatches on source count.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from .knn import knn as _exact_knn, approx_knn as _approx_knn
from .knn import _top_groups, _GROUP

# Sources below this count use the exact matmul kNN.  Measured on v5e
# (2M queries): exact wins up to ~100k sources (its O(N*E) matmul is
# MXU-cheap and it needs no index build); the grid path's per-point cost
# is independent of E, so it takes over where the quadratic term and the
# [chunk, E] distance buffer start to dominate.
EXACT_KNN_MAX_SOURCES = 131_072


@dataclasses.dataclass
class GridIndex:
    """Balanced bin->element lists.

    bin_reps   [n_bins, d]  representative point per bin (member mean)
    bin_elems  [n_bins, m]  member element ids (padded with repeats)
    bin_valid  [n_bins, m]  member mask
    sources    [E, d]       the binned points (element centroids)
    """

    bin_reps: jnp.ndarray
    bin_elems: jnp.ndarray
    bin_valid: jnp.ndarray
    sources: jnp.ndarray

    @property
    def n_bins(self) -> int:
        return self.bin_reps.shape[0]

    @property
    def members_per_bin(self) -> int:
        return self.bin_elems.shape[1]


def build_grid(centroids, target_per_cell: int = 32) -> GridIndex:
    """Median-split balanced binning (host-side, one-time, O(E log E))."""
    cents = np.asarray(centroids, np.float64)
    E, d = cents.shape
    bins: list[np.ndarray] = []

    stack = [np.arange(E)]
    while stack:
        idx = stack.pop()
        if len(idx) <= target_per_cell:
            bins.append(idx)
            continue
        pts = cents[idx]
        axis = int(np.argmax(pts.max(axis=0) - pts.min(axis=0)))
        half = len(idx) // 2
        part = np.argpartition(pts[:, axis], half)  # O(n) median split
        stack.append(idx[part[:half]])
        stack.append(idx[part[half:]])

    n_bins = len(bins)
    m = max(len(b) for b in bins)
    elems = np.zeros((n_bins, m), np.int32)
    valid = np.zeros((n_bins, m), bool)
    reps = np.zeros((n_bins, d))
    for i, b in enumerate(bins):
        c = len(b)
        elems[i, :c] = b
        valid[i, :c] = True
        elems[i, c:] = b[0]
        reps[i] = cents[b].mean(axis=0)
    return GridIndex(
        bin_reps=jnp.asarray(reps),
        bin_elems=jnp.asarray(elems),
        bin_valid=jnp.asarray(valid),
        sources=jnp.asarray(cents),
    )


@functools.partial(jax.jit, static_argnames=("k", "n_probe"))
def _grid_query(bin_reps, bin_elems, bin_valid, sources, queries,
                k: int, n_probe: int):
    center = jnp.mean(bin_reps, axis=0)
    reps32 = (bin_reps - center).astype(jnp.float32)
    q64 = queries - center
    q32 = q64.astype(jnp.float32)
    q_lo = (q64 - q32.astype(q64.dtype)).astype(jnp.float32)
    src64 = sources - center
    src32 = src64.astype(jnp.float32)
    src_lo = (src64 - src32.astype(src64.dtype)).astype(jnp.float32)

    # stage 1: rank bins -- small matmul, then the same grouped two-stage
    # selection as the exact kNN (top_k over the full bin axis is the
    # dominant cost otherwise)
    n_bins = bin_reps.shape[0]
    pad_bins = int(np.ceil(n_bins / _GROUP) * _GROUP)
    reps_p = jnp.pad(reps32, ((0, pad_bins - n_bins), (0, 0)),
                     constant_values=1e15)
    d2c = (
        jnp.sum(q32 * q32, axis=-1, keepdims=True)
        - 2.0 * (q32 @ reps_p.T)
        + jnp.sum(reps_p * reps_p, axis=-1)[None, :]
    )
    p = min(n_probe, n_bins)
    if pad_bins // _GROUP <= p:
        _, probe_bins = jax.lax.top_k(-d2c[:, :n_bins], p)
    else:
        _, bin_groups = _top_groups(-d2c, p)  # [N, p] groups of bins
        # rescore the p*G member bins from the already-computed d2c
        # columns, keep the best p
        member_bins = (
            bin_groups[:, :, None] * _GROUP
            + jnp.arange(_GROUP, dtype=jnp.int32)[None, None, :]
        ).reshape(queries.shape[0], -1)
        member_bins = jnp.minimum(member_bins, pad_bins - 1)
        d2b = jnp.take_along_axis(d2c, member_bins, axis=1)
        d2b = jnp.where(member_bins < n_bins, d2b, jnp.inf)
        _, sel = jax.lax.top_k(-d2b, p)
        probe_bins = jnp.take_along_axis(member_bins, sel, axis=1)

    # stage 2: stream the probed bins, carrying a running exact top-k --
    # memory stays [N, m] per step regardless of n_probe
    N = queries.shape[0]
    m = bin_elems.shape[1]

    def step(carry, j):
        best_neg, best_idx = carry
        b = probe_bins[:, j]
        cand = bin_elems[b]  # [N, m]
        mask = bin_valid[b]
        diff = (src32[cand] - q32[:, None, :]) + (
            src_lo[cand] - q_lo[:, None, :]
        )
        d2 = jnp.sum(diff * diff, axis=-1)
        neg = jnp.where(mask, -d2, -jnp.inf)
        merged_v = jnp.concatenate([best_neg, neg], axis=1)
        merged_i = jnp.concatenate([best_idx, cand], axis=1)
        new_v, sel = jax.lax.top_k(merged_v, k)
        new_i = jnp.take_along_axis(merged_i, sel, axis=1)
        return (new_v, new_i), None

    init = (
        jnp.full((N, k), -jnp.inf, jnp.float32),
        jnp.zeros((N, k), jnp.int32),
    )
    (neg, idx), _ = jax.lax.scan(
        step, init, jnp.arange(p, dtype=jnp.int32)
    )
    return (-neg).astype(queries.dtype), idx.astype(jnp.int32)


def grid_knn(
    index: GridIndex,
    queries,
    k: int,
    *,
    n_probe: int = 16,
    query_chunk: int = 262_144,
):
    """k nearest binned sources per query via the two-level search."""
    queries = jnp.asarray(queries)
    N = queries.shape[0]
    k_eff = min(k, index.sources.shape[0])
    out_d, out_i = [], []
    for start in range(0, N, query_chunk):
        q = queries[start : start + query_chunk]
        n = q.shape[0]
        bucket = 1 << max(0, (n - 1)).bit_length()
        if bucket != n:
            q = jnp.concatenate(
                [q, jnp.repeat(q[:1], bucket - n, axis=0)]
            )
        d2, idx = _grid_query(
            index.bin_reps, index.bin_elems, index.bin_valid,
            index.sources, q, k_eff, n_probe,
        )
        out_d.append(d2[:n])
        out_i.append(idx[:n])
    d2 = jnp.concatenate(out_d) if len(out_d) > 1 else out_d[0]
    idx = jnp.concatenate(out_i) if len(out_i) > 1 else out_i[0]
    return d2, idx


_INDEX_CACHE: dict = {}


@jax.jit
def _checksum_jit(x):
    """Order-sensitive 32-bit content hashes over every element of x,
    computed on device (pulling whole coordinate buffers through the
    slow host tunnel just to hash them would dwarf the index build).
    f64 inputs hash the f32 cast plus the cast residual (bitcasting f64
    directly is unsupported by the TPU x64 rewriter)."""
    x32 = x.astype(jnp.float32)
    parts = [x32.ravel()]
    if x.dtype == jnp.float64:
        # low residual restores the bits the f32 cast drops
        parts.append((x - x32.astype(x.dtype)).astype(jnp.float32).ravel())
    hs = []
    for v in parts:
        b = jax.lax.bitcast_convert_type(v, jnp.uint32)
        i = jnp.arange(b.shape[0], dtype=jnp.uint32)
        hs.append(jnp.sum((b ^ (i * jnp.uint32(2654435761)))
                          * jnp.uint32(2246822519)))
        hs.append(jnp.sum((b + i * jnp.uint32(40503))
                          * jnp.uint32(3266489917)))
    return jnp.stack(hs)


def _fingerprint(sources) -> tuple:
    """Full-content key: shape/dtype + device-side checksum of every
    coordinate (a sampled key could silently reuse a stale index for a
    mesh modified in place)."""
    sums = tuple(int(v) for v in np.asarray(_checksum_jit(sources)))
    return (sources.shape, str(sources.dtype), sums)


def spatial_order(sources) -> np.ndarray:
    """Permutation placing spatially adjacent sources at adjacent indices
    (concatenated members of the median-split bins, whose DFS order walks
    the domain like a space-filling curve)."""
    index = build_grid(sources, target_per_cell=32)
    elems = np.asarray(index.bin_elems)
    valid = np.asarray(index.bin_valid)
    return elems[valid].astype(np.int64)


def _cached_random_perm(sources):
    """(perm, sources[perm]) under a random permutation, cached by the
    content fingerprint (built once per mesh; the permutation
    decorrelates approx_max_k bin conflicts from spatial adjacency)."""
    key = ("rperm",) + _fingerprint(sources)
    entry = _INDEX_CACHE.get(key)
    if entry is None:
        if len(_INDEX_CACHE) > 16:
            _INDEX_CACHE.clear()
        E = sources.shape[0]
        perm = np.random.default_rng(0xC0FFEE).permutation(E)
        entry = (
            jnp.asarray(perm.astype(np.int32)),
            jnp.asarray(np.asarray(sources)[perm]),
        )
        _INDEX_CACHE[key] = entry
    return entry


def knn_any(sources, queries, k: int, exact: bool = True,
            approx: bool = False, **kw):
    """Candidate search dispatcher: exact matmul kNN for small source
    sets, balanced-bin two-level search beyond EXACT_KNN_MAX_SOURCES.
    Grid indices are cached by a content fingerprint so repeated
    transfers against the same mesh skip the host build.

    ``approx=True`` routes small sources through ``approx_max_k``
    (~4x faster on TPU, ~0.03% candidate-set misses on randomly-permuted
    sources) -- ONLY sound for callers with a rescue path, i.e. the
    locate ladder, which re-runs exact kNN for points whose candidates
    all fail acceptance.

    ``exact=False`` re-orders sources along the median-split curve first
    (cached permutation) and uses search.knn's relaxed group selection.
    Measured on shell meshes this still loses enough candidate recall to
    push transfer errors to ~1e-3, so the locate engine uses exact mode;
    the relaxed path remains for workloads that tolerate approximate
    neighbor sets.
    """
    sources = jnp.asarray(sources)
    E = sources.shape[0]
    if E <= EXACT_KNN_MAX_SOURCES:
        if approx and E > 256:
            perm, src_perm = _cached_random_perm(sources)
            return _approx_knn(src_perm, perm, queries, k, **kw)
        if exact:
            return _exact_knn(sources, queries, k, exact=True)
        key = ("perm",) + _fingerprint(sources)
        entry = _INDEX_CACHE.get(key)
        if entry is None:
            if len(_INDEX_CACHE) > 16:
                _INDEX_CACHE.clear()
            perm = spatial_order(sources)
            entry = (jnp.asarray(perm, jnp.int32),
                     jnp.asarray(np.asarray(sources)[perm]))
            _INDEX_CACHE[key] = entry
        perm_j, src_perm = entry
        d2, idx_p = _exact_knn(src_perm, queries, k, exact=False)
        return d2, perm_j[idx_p]
    key = _fingerprint(sources)
    index = _INDEX_CACHE.get(key)
    if index is None:
        if len(_INDEX_CACHE) > 16:
            _INDEX_CACHE.clear()
        index = build_grid(sources)
        _INDEX_CACHE[key] = index
    return grid_knn(index, queries, k, **kw)
