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

TPU layout notes (the stage-2 design):

* member coordinates are stored PER BIN, planar, split-f32:
  ``bin_coords6 [n_bins, 6, m]`` (xyz hi + xyz lo along dim 1, member
  slot on the minor axis).  Probing then gathers p whole-bin rows per
  query -- ~1.5 KB contiguous rows, the same shape of gather the locate
  engine already drives at full speed -- instead of per-element rows of
  3 floats, whose minor-dim-3 layout lane-pads 42x on TPU (the round-1
  "[X, 3] OOM").
* all probed members are scored in ONE shot ([C, p*m] distances) and
  selected with a single top-k (``approx_max_k`` on TPU), replacing the
  round-1 design's p sequential top_k merges that made the grid path
  2.3x slower than exact kNN at E=41k.

Recall: with ``n_probe`` bins per point the true nearest elements of
well-shaped meshes are covered; the locate engine's acceptance ladder adds
a second safety net (its rescue rounds re-probe with 4x the bins for any
point whose candidates all fail acceptance).  For guaranteed-exact search
use search.knn; ``knn_any`` dispatches on source count.
"""
from __future__ import annotations

import dataclasses
import functools
import os

import weakref

import jax
import jax.numpy as jnp
import numpy as np

from .knn import knn as _exact_knn, approx_knn as _approx_knn

# Sources below this count use the exact matmul kNN on the exact route.
# Measured on v5e (2M queries): exact wins up to ~100k sources (its
# O(N*E) matmul is MXU-cheap and it needs no index build).
EXACT_KNN_MAX_SOURCES = 131_072

# On the approximate route (locate ladder) the grid path takes over much
# earlier: approx_max_k still sweeps the full [chunk, E] distance matrix,
# while the grid's per-point cost is independent of E.
APPROX_GRID_MIN_SOURCES = 16_384


@dataclasses.dataclass
class GridIndex:
    """Balanced bin->element lists with TPU-friendly member storage.

    bin_reps32  [n_bins, d]    centered f32 representative per bin
    center      [d]            the centering offset (full precision)
    bin_elems   [n_bins, m]    member element ids (padding repeats slot 0)
    bin_coords6 [n_bins, 2d, m] centered split-f32 member coords, planar
                               (d hi rows then d lo rows; padding slots
                               hold 1e15 so they never rank)
    bin_counts  [n_bins]       true member count per bin
    sources     [E, d]         the binned points (element centroids)
    """

    bin_reps32: jnp.ndarray
    center: jnp.ndarray
    bin_elems: jnp.ndarray
    bin_coords6: jnp.ndarray
    bin_counts: np.ndarray
    sources: jnp.ndarray

    @property
    def n_bins(self) -> int:
        return self.bin_reps32.shape[0]

    @property
    def members_per_bin(self) -> int:
        return self.bin_elems.shape[1]


def build_grid(centroids, target_per_cell: int = 128) -> GridIndex:
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
    m = target_per_cell
    center = cents.mean(axis=0)
    cents_c = cents - center
    hi = cents_c.astype(np.float32)
    lo = (cents_c - hi.astype(np.float64)).astype(np.float32)

    elems = np.zeros((n_bins, m), np.int32)
    coords6 = np.empty((n_bins, 2 * d, m), np.float32)
    coords6[:, :d, :] = 1e15  # padding slots rank last
    coords6[:, d:, :] = 0.0
    counts = np.zeros(n_bins, np.int32)
    reps = np.zeros((n_bins, d), np.float32)
    for i, b in enumerate(bins):
        c = len(b)
        elems[i, :c] = b
        elems[i, c:] = b[0] if c else 0
        counts[i] = c
        coords6[i, :d, :c] = hi[b].T
        coords6[i, d:, :c] = lo[b].T
        reps[i] = hi[b].mean(axis=0)
    return GridIndex(
        bin_reps32=jnp.asarray(reps),
        center=jnp.asarray(center),
        bin_elems=jnp.asarray(elems),
        bin_coords6=jnp.asarray(coords6),
        bin_counts=counts,
        sources=jnp.asarray(cents),
    )


def _center_queries(queries, center):
    q64 = queries - center
    q32 = q64.astype(jnp.float32)
    q_lo = (q64 - q32.astype(q64.dtype)).astype(jnp.float32)
    return q32, q_lo


def _grid_query_core(bin_reps32, bin_elems, bin_coords6, q32, q_lo,
                     k: int, n_probe: int, approx: bool):
    """Two-level search on centered split-f32 queries (traceable; shared
    by grid_knn and the locate ladder's re-probe rescue)."""
    C = q32.shape[0]
    n_bins, two_d, m = bin_coords6.shape
    d = two_d // 2
    p = min(n_probe, n_bins)

    # stage 1: rank bins by representative distance (one small matmul)
    neg = (
        2.0 * (q32 @ bin_reps32.T)
        - jnp.sum(bin_reps32 * bin_reps32, axis=-1)[None, :]
    )
    if approx and n_bins >= 128 and p * 8 <= n_bins:
        _, probe = jax.lax.approx_max_k(neg, p)
    else:
        _, probe = jax.lax.top_k(neg, p)

    # stage 2: score ALL probed members in one shot.  Whole-bin planar
    # rows keep every gather contiguous and every minor axis lane-wide.
    mem_ids = bin_elems[probe]  # [C, p, m]
    coords = bin_coords6[probe]  # [C, p, 2d, m]
    d2 = None
    for a in range(d):
        diff = (coords[:, :, a, :] - q32[:, a, None, None]) + (
            coords[:, :, d + a, :] - q_lo[:, a, None, None]
        )
        d2 = diff * diff if d2 is None else d2 + diff * diff
    d2 = d2.reshape(C, p * m)
    k_eff = min(k, p * m)
    if approx and p * m >= 128 and k_eff * 8 <= p * m:
        nv, pos = jax.lax.approx_max_k(-d2, k_eff)
    else:
        nv, pos = jax.lax.top_k(-d2, k_eff)
    idx = jnp.take_along_axis(mem_ids.reshape(C, p * m), pos, axis=1)
    if k_eff < k:
        reps_ = k - k_eff
        nv = jnp.concatenate([nv, jnp.repeat(nv[:, -1:], reps_, 1)], 1)
        idx = jnp.concatenate([idx, jnp.repeat(idx[:, -1:], reps_, 1)], 1)
    return -nv, idx.astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("k", "n_probe", "approx")
)
def _grid_query(bin_reps32, bin_elems, bin_coords6, center, queries,
                k: int, n_probe: int, approx: bool):
    q32, q_lo = _center_queries(queries, center)
    d2, idx = _grid_query_core(
        bin_reps32, bin_elems, bin_coords6, q32, q_lo, k, n_probe, approx
    )
    return d2.astype(queries.dtype), idx


@functools.partial(jax.jit, static_argnames=("n_probe", "score_bf16"))
def _nearest_member_jit(bin_reps32, bin_elems, bin_coords6, center,
                        queries, n_probe: int = 4,
                        score_bf16: bool = False):
    """Nearest binned source per query, one fused pass with no top-k on
    the member axis: ``approx_max_k`` picks the ``n_probe`` nearest bins
    (a plain ``lax.top_k`` over [C, n_bins] costs more than the whole
    rest of this kernel -- measured 114 ms vs 50 ms at C=262k/4096 bins)
    and a single argmin over their members yields the candidate.
    Pair with a 128-member-bin index (locate._round1_m): stage 1's
    [C, n_bins] score buffer is the dominant traffic, so halving the
    bin count beats shrinking the member gather (round-5 re-measure:
    52 ms at p=4/m=128 vs 55 at p=4/m=64 per 262k chunk, and +21%
    end-to-end; round 4's "m=128 gather cliff" no longer reproduces).
    Probing fewer bins instead (p<=2 at any m) loses adjacent-bin
    recall that the rescue ladder cannot fully recover for snap
    semantics -- end-to-end err ~1e-3, re-confirmed round 5.  Member
    ranking reads only the hi half of the split-f32 coords: selection
    needs element-size resolution (km), not the survey-grade lo residual
    (sub-meter), and halving the gather bytes is most of stage 2's cost.

    This is the grid-path analogue of knn.nearest_centroid: the locate
    ladder's round 1 only ever evaluates the nearest candidate (measured
    99.1% acceptance at n_probe=4 on a 500k-element shell, identical to
    the probed top-8's first column), and its rescue rounds re-probe
    with a full top-k for the points where this single candidate fails."""
    q32, _ = _center_queries(queries, center)
    n_bins, two_d, m = bin_coords6.shape
    d = two_d // 2
    p = min(n_probe, n_bins)
    if score_bf16:
        # bf16 bin scores halve the dominant [C, n_bins] buffer
        # traffic; bin RANKING only needs bin-spacing resolution and
        # the p probed bins absorb rank noise (experimental knob)
        neg = (
            2.0 * jax.lax.dot(
                q32, bin_reps32.T,
                preferred_element_type=jnp.bfloat16,
            )
            - jnp.sum(bin_reps32 * bin_reps32, axis=-1)[None, :].astype(
                jnp.bfloat16
            )
        )
    else:
        neg = (
            2.0 * (q32 @ bin_reps32.T)
            - jnp.sum(bin_reps32 * bin_reps32, axis=-1)[None, :]
        )
    if n_bins >= 128 and p * 8 <= n_bins:
        _, probe = jax.lax.approx_max_k(neg, p)
    else:
        _, probe = jax.lax.top_k(neg, p)
    coords = bin_coords6[probe, :d, :]  # [C, p, d, m] hi rows only
    mem_ids = bin_elems[probe]  # [C, p, m]
    C = q32.shape[0]
    d2 = None
    for a in range(d):
        diff = coords[:, :, a, :] - q32[:, a, None, None]
        d2 = diff * diff if d2 is None else d2 + diff * diff
    pos = jnp.argmin(d2.reshape(C, p * m), axis=1)
    return jnp.take_along_axis(
        mem_ids.reshape(C, p * m), pos[:, None], 1
    )[:, 0]


def nearest_member(index: GridIndex, queries, *, n_probe: int = 4,
                   query_chunk: int = 262_144):
    """Index of the (approximately) nearest binned source per query
    ([N] int32): exact within the ``n_probe`` rep-nearest bins; a point
    whose true nearest member lives outside them gets those bins' best
    instead (callers pair this with a rescue path, exactly as for
    knn.nearest_centroid's production use in the locate ladder)."""
    queries = jnp.asarray(queries)
    N = queries.shape[0]
    if N == 0:
        return jnp.zeros((0,), jnp.int32)
    out = []
    for start in range(0, N, query_chunk):
        q = queries[start : start + query_chunk]
        n = q.shape[0]
        bucket = 1 << max(0, (n - 1)).bit_length()
        if bucket != n:
            q = jnp.concatenate(
                [q, jnp.repeat(q[:1], bucket - n, axis=0)]
            )
        out.append(_nearest_member_jit(
            index.bin_reps32, index.bin_elems, index.bin_coords6,
            index.center, q, n_probe,
            score_bf16=os.environ.get("MMT_R1_BF16") == "1",
        )[:n])
    return jnp.concatenate(out) if len(out) > 1 else out[0]


def grid_knn(
    index: GridIndex,
    queries,
    k: int,
    *,
    n_probe: int = 8,
    approx: bool = False,
    query_chunk: int = 262_144,
):
    """k nearest binned sources per query via the two-level search."""
    queries = jnp.asarray(queries)
    N = queries.shape[0]
    if N == 0:  # match knn()/approx_knn(): empty in, empty out
        return (jnp.zeros((0, k), jnp.float32),
                jnp.zeros((0, k), jnp.int32))
    # bound the stage-2 member gather ([chunk, p, 2d, m] f32) to ~1 GB:
    # at p=8 probes of 128-member bins a 262k chunk would gather 6.4 GB,
    # which OOMs when it lands on top of a transfer's resident weights.
    # Floor to a power of two -- chunks are padded UP to one, so a
    # non-power cap would quietly double the gather it tries to bound.
    p_ = min(n_probe, index.n_bins)
    row_bytes = 4 * p_ * index.bin_coords6.shape[1] * index.members_per_bin
    cap = max(8_192, (1 << 30) // row_bytes)
    query_chunk = min(query_chunk, 1 << (cap.bit_length() - 1))
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
            index.bin_reps32, index.bin_elems, index.bin_coords6,
            index.center, q, k, n_probe, approx,
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
    # flatten trailing dims first, behind an optimization barrier: any
    # cast/bitcast of a rank-3 [E, 125, 3] value gets a T(8,128) layout
    # on the LAST TWO dims -- a 42x padded 32 GB copy for a 500k-element
    # mesh -- while [E, 375] pads only 375 -> 384.  Without the barrier
    # XLA hoists the f32 cast above the reshape and pads anyway.
    if x.ndim != 2:
        x = x.reshape(x.shape[0] if x.ndim > 1 else 1, -1)
    x = jax.lax.optimization_barrier(x)
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

_FP_CACHE: dict = {}
_FP_HOST_CACHE: dict = {}  # id -> (weakref, guard digest, fp)

from ..hashing import content_hash as _host_content_hash  # noqa: E402


def _guard_digest(a: np.ndarray) -> bytes:
    """Cheap strided sample digest (~64K bytes read regardless of size);
    recomputed on every identity-cache hit as a tripwire for the
    unfreeze-mutate-refreeze pattern that id+frozen checks cannot see.
    It is a SAMPLE: bulk rewrites always trip it, but a sparse edit of
    an array much larger than 64 KB can land between sample points, so
    it is a best-effort guard, not a guarantee -- freezing an array is
    the caller's promise that the buffer will not change."""
    import hashlib

    b8 = a.reshape(-1).view(np.uint8)
    step = max(1, b8.size // 65536)
    return hashlib.blake2b(np.ascontiguousarray(b8[::step]).tobytes(),
                           digest_size=16).digest()


def _fingerprint(sources) -> tuple:
    """Full-content key: shape/dtype + checksum of every coordinate (a
    sampled key could silently reuse a stale index for a mesh modified
    in place).

    Host numpy arrays hash with blake2b (CPU-fast, and numpy inputs ARE
    mutable so no identity caching is safe -- the layered engine paths
    rescale geometry in place).  Device arrays are immutable, so their
    device-side checksum is cached by object identity (guarded by a
    weakref: a dead id can be reused by a new array)."""
    if isinstance(sources, np.ndarray):
        from ..utils_profile import stage_timer

        # Read-only host arrays opt in to identity caching: freezing
        # with arr.setflags(write=False) promises the buffer will not
        # change, so the (GB-scale) content hash is paid once per mesh
        # instead of once per locate/build.  The cache holds a WEAKREF
        # (so GB-scale meshes are freed with their last caller, and a
        # reused id of a dead array can never match); every hit
        # re-checks a cheap strided guard digest as a best-effort
        # tripwire for unfreeze-mutate-refreeze (see _guard_digest for
        # its sampling limits -- the freeze is the caller's promise).
        frozen = not sources.flags.writeable
        guard = _guard_digest(sources) if frozen else None
        if frozen:
            ent = _FP_HOST_CACHE.get(id(sources))
            if ent is not None and ent[0]() is sources and ent[1] == guard:
                return ent[2]
        with stage_timer("fingerprint.host"):
            fp = (sources.shape, str(sources.dtype),
                  _host_content_hash(sources))
        if frozen:
            dead = [k for k, e in _FP_HOST_CACHE.items() if e[0]() is None]
            for k in dead:
                del _FP_HOST_CACHE[k]
            if len(_FP_HOST_CACHE) > 8:
                _FP_HOST_CACHE.clear()
            _FP_HOST_CACHE[id(sources)] = (weakref.ref(sources), guard, fp)
        return fp
    key_id = id(sources)
    ent = _FP_CACHE.get(key_id)
    if ent is not None and ent[0]() is sources:
        return ent[2]
    sums = tuple(int(v) for v in np.asarray(_checksum_jit(sources)))
    fp = (sources.shape, str(sources.dtype), sums)
    if len(_FP_CACHE) > 64:
        _FP_CACHE.clear()
    try:
        _FP_CACHE[key_id] = (weakref.ref(sources), None, fp)
    except TypeError:
        pass
    return fp


def get_grid_index(sources, target_per_cell: int = 128) -> GridIndex:
    """The (cached) balanced-bin index for a source point set.

    ``target_per_cell`` sizes the bins and is part of the cache key: the
    locate ladder's round-1 nearest-member pass uses
    ``locate._round1_m()`` bins (128 since round 5 -- halving the bin
    count halves stage 1's dominant [C, n_bins] score traffic; see
    _nearest_member_jit), and the exact/approx top-k routes keep the
    same default 128 (their recall scales with p*m coverage)."""
    key = (_fingerprint(sources), target_per_cell)
    index = _INDEX_CACHE.get(key)
    if index is None:
        if len(_INDEX_CACHE) > 16:
            _INDEX_CACHE.clear()
        index = build_grid(sources, target_per_cell=target_per_cell)
        _INDEX_CACHE[key] = index
    return index


def spatial_order(sources) -> np.ndarray:
    """Permutation placing spatially adjacent sources at adjacent indices
    (concatenated members of the median-split bins, whose DFS order walks
    the domain like a space-filling curve)."""
    index = build_grid(sources, target_per_cell=32)
    elems = np.asarray(index.bin_elems)
    mask = (
        np.arange(elems.shape[1])[None, :]
        < np.asarray(index.bin_counts)[:, None]
    )
    return elems[mask].astype(np.int64)


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
    """Candidate search dispatcher.

    ``approx=True`` is the locate-ladder route (callers MUST have a
    rescue path): approx_max_k over randomly permuted sources for small
    meshes, the balanced-bin two-level search (with approx selection)
    beyond APPROX_GRID_MIN_SOURCES.

    Otherwise: exact matmul kNN up to EXACT_KNN_MAX_SOURCES, balanced-bin
    search (exact selection over the probed members) beyond.  Grid
    indices and permutations are cached by content fingerprint so
    repeated transfers against the same mesh skip the host build.

    ``exact=False`` re-orders sources along the median-split curve first
    (cached permutation) and uses search.knn's relaxed group selection.
    Measured on shell meshes this still loses enough candidate recall to
    push transfer errors to ~1e-3, so the locate engine uses exact mode;
    the relaxed path remains for workloads that tolerate approximate
    neighbor sets.
    """
    E = sources.shape[0]
    # Under jax.jit `sources` is a tracer: no concrete bytes exist, so
    # the content-fingerprint caches and the host-built grid index are
    # unavailable.  Dispatch to tracer-safe routes instead (the random
    # permutation only needs the STATIC length E, so the approx path
    # stays available; the grid path degrades to full-width approx_max_k,
    # correct but O(N*E) -- callers wanting the scalable path should call
    # outside jit, where the index is cached by content anyway).
    tracing = isinstance(sources, jax.core.Tracer)
    if approx:
        if E > APPROX_GRID_MIN_SOURCES and not tracing:
            return grid_knn(get_grid_index(sources), queries, k,
                            approx=True, **kw)
        kw.pop("n_probe", None)  # grid-path knob, meaningless below
        if E > 256:
            if tracing:
                perm_np = np.random.default_rng(0xC0FFEE).permutation(E)
                perm = jnp.asarray(perm_np.astype(np.int32))
                return _approx_knn(jnp.asarray(sources)[perm], perm,
                                   queries, k, **kw)
            perm, src_perm = _cached_random_perm(sources)
            return _approx_knn(src_perm, perm, queries, k, **kw)
        return _exact_knn(sources, queries, k, exact=True)
    if tracing:
        # Exact matmul kNN is the only tracer-safe exact route (the
        # spatial reorder and the grid index need host data).
        return _exact_knn(sources, queries, k, exact=True)
    if E <= EXACT_KNN_MAX_SOURCES:
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
    return grid_knn(get_grid_index(sources), queries, k, **kw)
