"""Fused point-location engine: candidates -> Newton -> accept -> weights.

This is the hot path of the whole framework, the TPU-native replacement for
the reference's three per-point Python/C scan loops:

* ``get_element_weights``'s candidate scan with first-accept / best-so-far /
  snap-to-nearest semantics (reference
  multi_mesh/components/interpolator.py:1147-1255),
* ``_check_if_inside_element``'s AABB-prefiltered scan with nearest-element
  fallback and the fixed interior ref coordinate
  (reference interpolator.py:1409-1473),
* the C kernel's early-exit hull scan
  (reference multi_mesh/src/trilinearinterpolator.c:61-148).

Design: instead of early-exit per point, a ``lax.scan`` walks the K
candidates *in distance order* for a whole chunk of points at once,
carrying "first accepted" and "best so far" state per point -- acceptance
is a masked update, so the first candidate to satisfy the tolerance wins
exactly as in the reference, but every lane stays busy.  An optional
trilinear prefilter ranks candidates with a cheap 8-corner Newton first and
runs the full-order Newton only on the few best -- same acceptance
tolerances, a fraction of the gather traffic and FLOPs.

Two interchangeable Newton backends:

* ``engine="xla"``   -- core.shape.inverse_map einsums (f64-capable; the
  accuracy-reference path, default on CPU hosts);
* ``engine="pallas"``-- the fused VMEM-resident f32 kernel
  (search.pallas_newton), fed with nodes pre-centered per element in f64;
  ~40x faster on TPU and the default there.
"""
from __future__ import annotations

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import LocateConfig, DEFAULT_LOCATE, FALLBACK_REF_COORD
from ..core import gll, shape
from .grid import knn_any as _knn
from . import pallas_newton as pn

# residual threshold (unit-element frame) separating converged f32 Newton
# solves (~1e-6 plateau) from diverged/exterior junk
_F32_CONV_TOL = 1e-4

# Test hook: the nearest-centroid-only candidate path (use_near1 /
# bucket_knn in ``locate``) is production-gated to real-TPU runs
# (use_approx); setting this True lets the CPU/interpret suite exercise
# it (tests/test_locate.py::test_locate_ladder_near1_matches_scan).
_FORCE_NEAR1 = False


def _round1_m() -> int:
    """Members per bin of the grid round-1 nearest-member index
    (MMT_R1_M overrides for experiments).

    128 re-measured best in round 5: 2.23 vs 1.84 M pts/s end-to-end at
    m=64 on the 500k-element shell (2M points, identical 7.7e-7 error).
    Round 4's "m=128 member-gather cliff" (384.6 ms/chunk) does NOT
    reproduce on the current toolchain -- stage-2 at p=4/m=128 now
    measures 46 ms -- while halving the bin count halves stage 1's
    [C, n_bins] score traffic, which is what the cliff note missed.
    Probing FEWER bins instead (p=2/p=1 at any m) collapses end-to-end
    accuracy to ~1e-3: adjacent-bin recall is load-bearing and the
    rescue ladder does not fully recover it for snap semantics."""
    return int(os.environ.get("MMT_R1_M", "128"))


def _round1_p() -> int:
    """Bins probed by the grid round-1 nearest-member pass
    (MMT_R1_P overrides for experiments)."""
    return int(os.environ.get("MMT_R1_P", "4"))

@dataclasses.dataclass
class LocateResult:
    """elements [N] (int32, -1 = not found), refs [N, d], weights [N, n],
    found [N] bool (True also for snapped / fallback assignments).

    Fields are DEVICE arrays (jax) -- the weights matrix is large
    (N x (p+1)^d) and staying on device keeps the subsequent gather+apply
    free of host round-trips.  np.asarray(...) any field to pull it to the
    host."""

    elements: jnp.ndarray
    refs: jnp.ndarray
    weights: jnp.ndarray
    found: jnp.ndarray
    # df32 polish residuals: refs + refs_lo is the (hi, lo) pair-precision
    # reference coordinate (LocateConfig.df32_polish; zeros on rows the
    # polish skipped).  None unless the polish ran.
    refs_lo: jnp.ndarray | None = None


_PREP_CACHE: dict = {}


@functools.partial(
    jax.jit, static_argnames=("order", "d", "pallas", "want_lo")
)
def _mesh_prep_jit(elem_nodes, order, d, pallas, want_lo=False):
    corners = elem_nodes[:, np.asarray(gll.corner_indices(order, d))]
    lo = jnp.min(elem_nodes, axis=1)
    hi = jnp.max(elem_nodes, axis=1)
    out = {
        "corners": corners,
        "lo": lo,
        "hi": hi,
        "centroids": jnp.mean(elem_nodes, axis=1),
    }
    if pallas:
        # per-element centering/scale in full precision, stored once;
        # the kernel consumes exact-to-f32 unit-frame geometry, and the
        # per-candidate point centering uses a split-f32 representation
        # of the centers (see _make_pallas_invert / _pallas_invert_rows)
        centers = 0.5 * (lo + hi)
        scales = jnp.maximum(0.5 * jnp.max(hi - lo, axis=-1), 1e-30)
        nodes_c = (
            elem_nodes - centers[:, None, :]
        ) / scales[:, None, None]
        nodes_c32 = nodes_c.astype(jnp.float32)
        corners_c32 = (
            (corners - centers[:, None, :]) / scales[:, None, None]
        ).astype(jnp.float32)
        ctr_hi = centers.astype(jnp.float32)
        ctr_lo = (centers - ctr_hi.astype(centers.dtype)).astype(
            jnp.float32
        )
        inv_scale = (1.0 / scales).astype(jnp.float32)
        out["centering"] = (ctr_hi, ctr_lo, inv_scale)
        out["nodes_c32"] = nodes_c32
        # lane-padded row-major copy of the lattice: a plain row gather
        # from this feeds pn.newton_refs_rows with no HBM transpose
        E, n_nodes, _ = nodes_c32.shape
        Fp = pn._rows_feature_pad(order, d)
        out["nodes_flat32"] = jnp.concatenate(
            [nodes_c32.reshape(E, n_nodes * d),
             jnp.zeros((E, Fp - n_nodes * d), jnp.float32)], axis=1,
        )
        out["corners_c32"] = corners_c32
        if want_lo:
            # split-f32 residuals: hi + lo reconstructs the f64 geometry
            # (and the f64 inverse scale -- points and nodes must be
            # scaled CONSISTENTLY or the polish stalls at f32 accuracy)
            nodes_lo = (
                nodes_c - nodes_c32.astype(nodes_c.dtype)
            ).astype(jnp.float32)
            out["nodes_lo_c32"] = nodes_lo
            out["inv_scale_lo"] = (
                1.0 / scales - inv_scale.astype(scales.dtype)
            ).astype(jnp.float32)
            # lane-padded flat twin of nodes_flat32 for the df32 polish
            # kernel's row gather
            out["nodes_lo_flat32"] = jnp.concatenate(
                [nodes_lo.reshape(E, n_nodes * d),
                 jnp.zeros((E, Fp - n_nodes * d), jnp.float32)], axis=1,
            )
    else:
        z = jnp.zeros((1,), jnp.float32)
        out["centering"] = (z, z, z)
        out["nodes_c32"] = z
        out["nodes_flat32"] = z
        out["corners_c32"] = z
    return out


def _mesh_prep_host(elem_nodes: np.ndarray, order, d, pallas,
                    want_lo=False):
    """Numpy twin of _mesh_prep_jit for host-array inputs: f64 is fast
    on the host CPU and emulated on TPU, and only the f32 artifacts need
    to cross the (slow) host->device link -- for a 500k-element order-4
    mesh this moves ~800 MB instead of the 1.5 GB raw f64 lattice."""
    corners = elem_nodes[:, np.asarray(gll.corner_indices(order, d))]
    lo = elem_nodes.min(axis=1)
    hi = elem_nodes.max(axis=1)
    out = {
        "corners": jnp.asarray(corners),
        "lo": jnp.asarray(lo),
        "hi": jnp.asarray(hi),
        "centroids": jnp.asarray(elem_nodes.mean(axis=1)),
    }
    if pallas:
        centers = 0.5 * (lo + hi)
        scales = np.maximum(0.5 * (hi - lo).max(axis=-1), 1e-30)
        nodes_c = (elem_nodes - centers[:, None, :]) / scales[:, None, None]
        nodes_c32 = nodes_c.astype(np.float32)
        out["nodes_c32"] = jnp.asarray(nodes_c32)
        E, n_nodes, _ = nodes_c32.shape
        Fp = pn._rows_feature_pad(order, d)
        flat = np.zeros((E, Fp), np.float32)
        flat[:, : n_nodes * d] = nodes_c32.reshape(E, n_nodes * d)
        out["nodes_flat32"] = jnp.asarray(flat)
        out["corners_c32"] = jnp.asarray((
            (corners - centers[:, None, :]) / scales[:, None, None]
        ).astype(np.float32))
        if want_lo:
            nodes_lo = (
                nodes_c - nodes_c32.astype(np.float64)
            ).astype(np.float32)
            out["nodes_lo_c32"] = jnp.asarray(nodes_lo)
            inv_scale32 = (1.0 / scales).astype(np.float32)
            out["inv_scale_lo"] = jnp.asarray(
                (1.0 / scales - inv_scale32.astype(np.float64)
                 ).astype(np.float32)
            )
            flat_lo = np.zeros((E, Fp), np.float32)
            flat_lo[:, : n_nodes * d] = nodes_lo.reshape(E, n_nodes * d)
            out["nodes_lo_flat32"] = jnp.asarray(flat_lo)
        ctr_hi = centers.astype(np.float32)
        ctr_lo = (centers - ctr_hi.astype(np.float64)).astype(np.float32)
        out["centering"] = (
            jnp.asarray(ctr_hi), jnp.asarray(ctr_lo),
            jnp.asarray((1.0 / scales).astype(np.float32)),
        )
    else:
        z = jnp.zeros((1,), jnp.float32)
        out["centering"] = (z, z, z)
        out["nodes_c32"] = z
        out["nodes_flat32"] = z
        out["corners_c32"] = z
    return out


def _mesh_prep(elem_nodes, order: int, d: int, engine: str,
               want_lo: bool = False) -> dict:
    """Derived per-mesh geometry (corners, AABBs, centroids, f32
    unit-frame node lattices), cached by content fingerprint: the f64
    centering arithmetic is emulated (slow) on TPU and identical across
    the many locate() calls a transfer or layered run makes against one
    mesh."""
    from .grid import _fingerprint

    key = (_fingerprint(elem_nodes), order, engine == "pallas", want_lo)
    prep = _PREP_CACHE.get(key)
    if prep is None:
        if len(_PREP_CACHE) > 8:
            _PREP_CACHE.clear()
        if isinstance(elem_nodes, np.ndarray):
            prep = _mesh_prep_host(elem_nodes, order, d,
                                   engine == "pallas", want_lo)
        else:
            prep = _mesh_prep_jit(elem_nodes, order, d,
                                  engine == "pallas", want_lo)
        _PREP_CACHE[key] = prep
    return prep


def default_engine() -> str:
    """pallas on TPU-family platforms, xla on CPU hosts and GPUs (the
    Mosaic kernel uses TPU-only VMEM block specs and cannot lower on a
    CUDA/ROCm backend)."""
    try:
        platform = jax.devices()[0].platform
    except Exception:
        platform = "cpu"
    return "xla" if platform in ("cpu", "gpu", "cuda", "rocm") else "pallas"


# ---------------------------------------------------------------------------
# Newton backends: invert(ids) -> (ref [C, d], conv [C], maxabs [C])
# ---------------------------------------------------------------------------
def _make_xla_invert(points, elem_nodes, order, cfg, dtype):
    def invert(ids):
        nodes = elem_nodes[ids]
        ref, conv = shape.inverse_map(nodes, points, order=order, cfg=cfg,
                                      dtype=dtype)
        maxabs = jnp.max(jnp.abs(ref), axis=-1)
        return ref, conv, maxabs

    return invert


def _make_pallas_invert(points, nodes_c32, centering, order, cfg,
                        interpret):
    """points [C, d] (C a multiple of pallas BLOCK); nodes_c32 [E, n, d]
    f32 pre-centered; centering = (ctr_hi, ctr_lo, inv_scale) f32.

    Point centering uses split-f32 (hi + lo residual) arithmetic: the
    hi-hi subtraction of nearby values is exactly rounded, and the lo
    terms restore the bits lost when casting Earth-scale f64 coordinates
    to f32 -- giving f64-quality centered coordinates with zero emulated
    f64 work in the per-candidate loop."""
    C, d = points.shape
    R = C // pn._LANES
    ctr_hi, ctr_lo, inv_scale = centering
    p_hi = points.astype(jnp.float32)
    p_lo = (points - p_hi.astype(points.dtype)).astype(jnp.float32)

    def invert(ids):
        diff = (p_hi - ctr_hi[ids]) + (p_lo - ctr_lo[ids])
        p_c = diff * inv_scale[ids][:, None]
        p_t = jnp.transpose(p_c, (1, 0)).reshape(d, R, pn._LANES)
        nk = nodes_c32[ids]  # [C, n, d] f32 gather
        n_t = jnp.transpose(nk, (1, 2, 0)).reshape(
            nk.shape[1], d, R, pn._LANES
        )
        refs_t, res_t = pn.newton_refs(
            n_t, p_t, order, d, iters=cfg.newton_iters + cfg.polish_iters,
            clamp=cfg.newton_clamp, interpret=interpret,
        )
        ref = jnp.transpose(refs_t.reshape(d, C), (1, 0))
        res = res_t.reshape(C)
        conv = res < _F32_CONV_TOL
        maxabs = jnp.max(jnp.abs(ref), axis=-1)
        # refs stay f32: the scan state carries the engine's native
        # precision (f64 state would make every per-candidate where()
        # update emulated on TPU)
        return ref, conv, maxabs

    return invert


# ---------------------------------------------------------------------------
# Batched-rows pallas invert + the rescue-ladder locate (TPU fast path)
# ---------------------------------------------------------------------------
def _pallas_invert_rows(p_hi, p_lo, ids, nodes_flat32, centering, order,
                        dim, iters, clamp, interpret):
    """One fused gather+Newton over arbitrary (point, element) row pairs:
    p_hi/p_lo [M, d] split-f32 point coords, ids [M] int32 ->
    (ref [M, d] f32, conv [M] bool, maxabs [M] f32).

    This is the ladder's workhorse: candidates are batched into the ROW
    axis instead of scanned sequentially, so the fixed cost of a
    gather+kernel-launch step is amortized over all candidates of a round
    instead of paid K times.  Node geometry arrives as the lane-padded
    row-major table ``nodes_flat32`` [E, Fp] (see _mesh_prep): the row
    gather it feeds is layout-clean (no [M, n, d] -> [n, d, M] HBM
    transpose -- measured 2x the Newton kernel itself at 262k rows on
    v5e), and the kernel transposes each block in VMEM instead
    (pn.newton_refs_rows).  M is padded to the pallas BLOCK internally.
    Points arrive as the split-f32 pair (computed once per chunk) so no
    f64 arithmetic -- emulated and slow on TPU -- appears in any
    per-round op.
    """
    M = p_hi.shape[0]
    Mp = int(np.ceil(M / pn.BLOCK) * pn.BLOCK)
    if Mp != M:
        p_hi = jnp.concatenate(
            [p_hi, jnp.repeat(p_hi[:1], Mp - M, axis=0)]
        )
        p_lo = jnp.concatenate(
            [p_lo, jnp.repeat(p_lo[:1], Mp - M, axis=0)]
        )
        ids = jnp.concatenate(
            [ids, jnp.zeros((Mp - M,), ids.dtype)]
        )
    ctr_hi, ctr_lo, inv_scale = centering
    diff = (p_hi - ctr_hi[ids]) + (p_lo - ctr_lo[ids])
    p_c = diff * inv_scale[ids][:, None]
    R = Mp // pn._LANES
    p_t = jnp.transpose(p_c, (1, 0)).reshape(dim, R, pn._LANES)
    nrows = nodes_flat32[ids]  # [Mp, Fp] coalesced row gather
    refs_t, res_t = pn.newton_refs_rows(
        nrows, p_t, order, dim, iters=iters, clamp=clamp,
        interpret=interpret,
    )
    ref = jnp.transpose(refs_t.reshape(dim, Mp), (1, 0))[:M]
    res = res_t.reshape(Mp)[:M]
    return ref, res < _F32_CONV_TOL, jnp.max(jnp.abs(ref), axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=("order", "cfg", "fallback", "use_aabb", "interpret",
                     "want_weights", "rescue_mode", "bucket_knn",
                     "n_valid", "engine", "dtype"),
)
def _ladder_chunk(points, cand, centroids, nodes_c32, nodes_flat32,
                  centering, aabb, grid_data, nodes_lo, bucket_search,
                  elem_nodes,
                  order, cfg, fallback, use_aabb, interpret, want_weights,
                  rescue_mode, bucket_knn=False, n_valid=None,
                  engine="pallas", dtype=jnp.float32):
    """Escalation-ladder point location (device-only, one jit).

    Round 1 runs the full-order Newton on every point's NEAREST candidate
    only; points it fails to accept are compacted (jnp.nonzero, no host
    sync) into shrinking static buckets and retried with the next
    candidate columns; a final bucket re-runs an EXACT kNN (recovering
    any candidates an approximate search dropped) and scans all K
    columns.  First-accept-in-distance-order semantics are identical to
    the sequential scan for every rescued point; points beyond the
    rescue capacity are reported in the ``needs_retry`` output and
    re-run by ``locate`` through the exhaustive scan, so no interior
    point ever silently degrades to a sentinel/snap fallback.

    ``engine`` selects the row-batched Newton backend: "pallas" (the
    fused Mosaic kernel over split-f32 centered geometry; TPU) or "xla"
    (shape.inverse_map einsums over the raw lattice, full precision;
    the CPU/virtual-mesh twin -- same ladder structure, so the sharded
    programs run one code path everywhere).  On "xla" the carried point
    rows are (points, zeros) rather than a split-f32 pair.
    """
    C, d = points.shape
    K = cand.shape[1]
    iters = cfg.newton_iters + cfg.polish_iters
    if engine == "pallas":
        # split-f32 point coordinates, computed once: every per-round op
        # below is pure f32 (f64 is emulated on TPU)
        pts_hi = points.astype(jnp.float32)
        pts_lo = (points - pts_hi.astype(points.dtype)).astype(
            jnp.float32
        )
    else:
        pts_hi = points
        pts_lo = jnp.zeros_like(points)

    def eval_rows(hi_rows, lo_rows, ids):
        if engine == "pallas":
            ref, conv, maxabs = _pallas_invert_rows(
                hi_rows, lo_rows, ids, nodes_flat32, centering, order, d,
                iters, cfg.newton_clamp, interpret,
            )
        else:
            nodes = elem_nodes[ids]
            ref, conv = shape.inverse_map(
                nodes, hi_rows, order=order, cfg=cfg, dtype=dtype
            )
            maxabs = jnp.max(jnp.abs(ref), axis=-1)
        valid = conv
        if use_aabb:
            blo, bhi = aabb
            if engine == "pallas":
                blo32 = blo.astype(jnp.float32)[ids]
                bhi32 = bhi.astype(jnp.float32)[ids]
                # f32-appropriate slack: span-relative alone is NOT
                # enough for Earth-scale coordinates (a 6.4e6 m
                # coordinate rounds by ~0.4 m in f32, but 1e-6 of a 1 km
                # element span is only 1 mm), so add a few ulps of the
                # coordinate magnitude -- face points must never be
                # excluded by rounding (accept_tol has far more slack
                # than this anyway)
                eps = (
                    1e-6 * (bhi32 - blo32)
                    + 4e-7 * jnp.maximum(jnp.abs(blo32), jnp.abs(bhi32))
                )
                inside = jnp.all(
                    (hi_rows >= blo32 - eps) & (hi_rows <= bhi32 + eps),
                    axis=-1,
                )
            else:
                span = bhi[ids] - blo[ids]
                eps = 1e-9 * span
                inside = jnp.all(
                    (hi_rows >= blo[ids] - eps)
                    & (hi_rows <= bhi[ids] + eps),
                    axis=-1,
                )
            accepted = valid & inside & (maxabs < cfg.accept_tol)
        else:
            accepted = valid & (maxabs < cfg.accept_tol)
        score = jnp.where(conv, maxabs, jnp.inf)
        return ref, accepted, score

    # ---- round 1: nearest candidate, all points -----------------------
    ids0 = cand[:, 0]
    ref0, acc0, score0 = eval_rows(pts_hi, pts_lo, ids0)
    elem, ref, acc = ids0, ref0, acc0
    best_max, best_ref, best_elem = score0, ref0, ids0

    def rescue(state, cand_cols, idx):
        """Retry still-unaccepted points (rows ``idx``, priority order)
        on candidate columns ``cand_cols`` [B, r], with
        first-accept-in-column-order semantics.  Rows already accepted
        (priority padding) are left untouched."""
        elem, ref, acc, best_max, best_ref, best_elem = state
        B_, r = cand_cols.shape
        flat_hi = jnp.tile(pts_hi[idx], (r, 1))
        flat_lo = jnp.tile(pts_lo[idx], (r, 1))
        flat_ids = cand_cols.T.reshape(r * B_)
        refs_f, acc_f, score_f = eval_rows(flat_hi, flat_lo, flat_ids)
        refs_r = refs_f.reshape(r, B_, d)
        acc_r = acc_f.reshape(r, B_)
        score_r = score_f.reshape(r, B_)
        ids_r = cand_cols.T  # [r, B]

        was = acc[idx]  # rows that were already accepted: no updates
        fi = jnp.argmax(acc_r, axis=0)  # first accepting column
        any_acc = jnp.any(acc_r, axis=0) & ~was
        sel_ref = jnp.take_along_axis(refs_r, fi[None, :, None], 0)[0]
        sel_elem = jnp.take_along_axis(ids_r, fi[None, :], 0)[0]

        bi = jnp.argmin(score_r, axis=0)
        b_score = jnp.take_along_axis(score_r, bi[None, :], 0)[0]
        b_ref = jnp.take_along_axis(refs_r, bi[None, :, None], 0)[0]
        b_elem = jnp.take_along_axis(ids_r, bi[None, :], 0)[0]

        elem = elem.at[idx].set(jnp.where(any_acc, sel_elem, elem[idx]))
        ref = ref.at[idx].set(
            jnp.where(any_acc[:, None], sel_ref, ref[idx])
        )
        acc = acc.at[idx].set(any_acc | was)
        cur_bmax = best_max[idx]
        better = (b_score < cur_bmax) & ~was
        best_max = best_max.at[idx].set(
            jnp.where(better, b_score, cur_bmax)
        )
        best_ref = best_ref.at[idx].set(
            jnp.where(better[:, None], b_ref, best_ref[idx])
        )
        best_elem = best_elem.at[idx].set(
            jnp.where(better, b_elem, best_elem[idx])
        )
        return elem, ref, acc, best_max, best_ref, best_elem

    def failure_order(state):
        """All point indices, hardest-to-dismiss failures first:
        unaccepted points ordered by their best max |ref| so far
        (near-boundary interior stragglers sort before far-exterior
        points and cannot be crowded out of the rescue buckets), diverged
        points in between, accepted points and bucket-padding rows
        last."""
        acc_, bmax = state[2], state[3]
        key = jnp.where(
            acc_, jnp.inf, jnp.where(jnp.isfinite(bmax), bmax, 1.5)
        )
        if n_valid is not None and n_valid < C:
            rows = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)[:, 0]
            key = jnp.where(rows >= n_valid, jnp.inf, key)
        return jnp.argsort(key)

    state = (elem, ref, acc, best_max, best_ref, best_elem)

    # In-jit candidate search for the rescue buckets (bucket_knn mode):
    # when round 1 ran on nearest-centroid-only candidates (K == 1, the
    # cheap fused argmax path -- a full per-point top-k would cost ~6x
    # more and is wasted on the ~85% of points that accept immediately),
    # the rescue rounds compute an approximate top-12 for just their
    # bucket rows here.  bucket_search = (sp_c32 [E, d] centered
    # permuted source coords, perm [E] int32, g_center [d]).
    sp_c32, bs_perm, bs_center = bucket_search
    if bucket_knn and rescue_mode == "grid":
        # grid-path near1 mode: rescue buckets probe the balanced-bin
        # index in-jit (a full [B, E] sweep would scale with mesh size).
        # 2 probed bins recover the adjacent-bin neighbors the round-1
        # single-bin argmin missed; round 4 re-probes 16 bins for the
        # few points still failing, so recall degrades to the full
        # re-search, never silently.
        from .grid import _center_queries as _cq, \
            _grid_query_core as _gq_core

        gb_reps32, gb_center, gb_elems, gb_coords6 = grid_data
        kk = min(12, gb_elems.shape[0] * gb_elems.shape[1])
        # probe counts scale inversely with bin size so the MEMBER
        # coverage (probes x m) stays fixed: accuracy is set by how many
        # nearby members a rescue round considers, not by the bin
        # partitioning (measured: halving m without rescaling probes
        # degraded end-to-end err 7.6e-7 -> 2.6e-4, round 4)
        p_bkt = max(2, 256 // gb_elems.shape[1])

        def bucket_cands(idx):
            q32, q_lo = _cq(points[idx], gb_center)
            _, cand = _gq_core(
                gb_reps32, gb_elems, gb_coords6, q32, q_lo, kk,
                n_probe=p_bkt, approx=True,
            )
            return cand
    elif bucket_knn:
        sp_norm = jnp.sum(sp_c32 * sp_c32, axis=-1)
        # top-8 (not 12): measured per-column acceptance on the order-4
        # shell at E=4096 is monotone-flat past column 7 (fail 0.073% at
        # col 7 vs 0.072% at col 11) -- columns 8..11 never accept a
        # point that round 4's full-budget exact re-search would not,
        # and k is a third of this approx_max_k's cost.
        kk = min(8, sp_c32.shape[0])

        def bucket_cands(idx):
            q32 = (points[idx] - bs_center).astype(jnp.float32)
            neg = 2.0 * (q32 @ sp_c32.T) - sp_norm[None, :]
            _, loc = jax.lax.approx_max_k(neg, kk, recall_target=0.95)
            return bs_perm[loc]
    # full_op marks rows that received a FULL location opportunity: the
    # round-4 re-search (exact/grid: fresh full-budget candidate list) or,
    # for caller-provided candidate lists, having scanned every column.
    # Unaccepted rows without it may simply have been crowded out of the
    # finite rescue buckets -- the caller (locate) re-runs exactly those
    # rows through the exhaustive scan path, so interior points can never
    # silently fall through to sentinel/snap when >~40% of a chunk fails
    # round 1 (thin-element layered meshes).
    full_op = jnp.zeros((C,), bool)
    # Rescue bucket sizes, matched to measured failure tails (capacity
    # far beyond the failure rate only burns Newton evals: rounds 2+3
    # at the old C/4+C/8 cost 46 ms of the 73 ms ladder at C=262k).
    # Small-E nearest-centroid round 1 fails ~15% (C/6.7, order-4 shell
    # at E=4096) -> round 2 keeps C/4; after columns 1..3 only 0.35%
    # (C/283) remain -> round 3 shrinks C/8 -> C/32 (8.8x margin).  The
    # grid near1 mode fails ~1% round 1 (500k-element shell) and keeps
    # C/32 everywhere.  Meshes that fail in bulk spill to needs_retry
    # and the exhaustive scan -- slower, never silent.
    div2, div3 = (32, 32) if rescue_mode == "grid" else (4, 32)
    # ---- round 2: next 3 candidates for the most-promising failures ----
    if K > 1:
        B = max(C // 4, min(C, 256))
        idx = failure_order(state)[:B]
        state = rescue(state, cand[idx][:, 1:min(4, K)], idx)
    elif bucket_knn and kk > 1:
        B = max(C // div2, min(C, 256))
        idx = failure_order(state)[:B]
        cand12 = bucket_cands(idx)
        # park the bucket's top-12 for round 3: rows that enter the
        # round-3 bucket later (crowded out here) read zeros -> they
        # evaluate element 0 harmlessly (accept only if truly inside)
        # and keep their full-recall shot in round 4 / the scan retry
        cand12_buf = jnp.zeros((C, kk), jnp.int32).at[idx].set(cand12)
        state = rescue(state, cand12[:, 1:min(4, kk)], idx)
    # ---- round 3: candidates 4..kk-1 for the most-promising failures.
    # A row crowded out of round 2 can enter here after other rows accept
    # and will then skip columns 1..3: if its element IS among those
    # columns it stays unaccepted and reaches round 4 / the scan retry
    # (full recall, all columns in order), so the only deviation from the
    # sequential scan is a tie-break-level element choice for such rows
    # -- values agree to interpolation continuity.  (Scanning 1..11 here
    # instead costs ~37% more row-evals in this round for an
    # ordering-only effect; measured 7% off the 10M headline bench.)
    if K > 4:
        B = max(C // 8, min(C, 256))
        idx = failure_order(state)[:B]
        state = rescue(state, cand[idx][:, 4:min(12, K)], idx)
    elif bucket_knn and kk > 4:
        B = max(C // div3, min(C, 256))
        idx = failure_order(state)[:B]
        state = rescue(state, cand12_buf[idx][:, 4:kk], idx)
    # ---- round 4: re-search for the hardest failures -------------------
    # "exact" re-runs a full exact kNN (restores full recall when the
    # candidate list came from the approximate search); "grid" re-probes
    # the balanced-bin index with 4x the bins (large meshes, where a
    # [B, E] distance sweep would not fit).  locate always selects one
    # of the two whenever the ladder runs (even for caller-provided
    # candidate lists: the caller restricts the searchable ELEMENT SET,
    # e.g. per-layer masks, not the candidate columns).  Exact mode sizes
    # the bucket C/128: measured fail after rounds 1-3 is 0.07% (C/1394,
    # E=4096 shell) and each row here costs a top-k row plus k_full
    # Newton evals; overflow goes to needs_retry, never silent.
    if rescue_mode == "exact":
        from .knn import _knn_jit

        B = max(C // 128, min(C, 128))
        idx = failure_order(state)[:B]
        k_full = min(int(cfg.nelem_to_search), centroids.shape[0])
        _, cand4 = _knn_jit(points[idx], centroids, k_full, 4096,
                            jnp.float32, True)
        state = rescue(state, cand4, idx)
        full_op = full_op.at[idx].set(True)
    elif rescue_mode == "grid":
        from .grid import _center_queries, _grid_query_core

        bin_reps32, g_center, bin_elems, bin_coords6 = grid_data
        B = max(C // 32, min(C, 128))
        idx = failure_order(state)[:B]
        q32, q_lo = _center_queries(points[idx], g_center)
        k_full = int(cfg.nelem_to_search)
        # fixed member coverage: 16 probes of 128-member bins == 32 of
        # 64-member bins (see bucket_cands note above)
        _, cand4 = _grid_query_core(
            bin_reps32, bin_elems, bin_coords6, q32, q_lo, k_full,
            n_probe=max(16, 2048 // bin_elems.shape[1]), approx=False,
        )
        state = rescue(state, cand4, idx)
        full_op = full_op.at[idx].set(True)

    elem, ref, acc, best_max, best_ref, best_elem = state
    needs_retry = ~acc & ~full_op
    if n_valid is not None and n_valid < C:
        rows = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)[:, 0]
        needs_retry = needs_retry & (rows < n_valid)

    # ---- optional f64 polish of accepted pairs ------------------------
    # 2 Newton iterations at f64 on the split-f32-reconstructed geometry,
    # warm-started from the f32 ladder refs: quadratic convergence takes
    # ~1e-7 straight below 1e-12.  Refs/weights then stay f64.
    # (pallas only: the xla backend already carries full precision.)
    w_dt = jnp.float32 if engine == "pallas" else ref.dtype
    if cfg.f64_polish and engine == "pallas":
        from ..core.shape import _newton_iterations

        w_dt = jnp.float64
        nodes_lo_c32, inv_scale_lo = nodes_lo
        el_s = jnp.maximum(elem, 0)
        ctr_hi, ctr_lo, inv_scale = centering
        inv64 = (
            inv_scale[el_s].astype(jnp.float64)
            + inv_scale_lo[el_s].astype(jnp.float64)
        )
        p_c64 = (
            (pts_hi.astype(jnp.float64) - ctr_hi[el_s].astype(jnp.float64))
            + (pts_lo.astype(jnp.float64)
               - ctr_lo[el_s].astype(jnp.float64))
        ) * inv64[:, None]
        nodes64 = (
            nodes_c32[el_s].astype(jnp.float64)
            + nodes_lo_c32[el_s].astype(jnp.float64)
        )
        ref64, res64 = _newton_iterations(
            order, nodes64, p_c64, ref.astype(jnp.float64), 2,
            cfg.newton_clamp,
        )
        # Defense against XLA:TPU emulated-f64 mis-evaluation (observed
        # on large-batch f64 programs): a genuine polish of an accepted
        # f32 ref converges to ~1e-12 residual, so any row whose polish
        # residual is not even at the f32 plateau keeps its f32 ref
        # instead of silently taking a corrupted f64 one.
        good = (res64 < _F32_CONV_TOL)[:, None]
        ref = jnp.where(acc[:, None] & good, ref64,
                        ref.astype(jnp.float64))
        best_ref = best_ref.astype(jnp.float64)

    # ---- fallback assembly (same semantics as the sequential scan) ----
    def make_weights(refs, mask=None):
        if not want_weights:
            return None
        w = gll.tensor_basis(order, refs.astype(w_dt))
        if mask is not None:
            w = jnp.where(mask[:, None], w, 0.0)
        return w

    if fallback == "sentinel":
        elements = jnp.where(acc, elem, -1)
        refs = jnp.where(acc[:, None], ref, jnp.zeros((C, d), ref.dtype))
        found = acc
        weights = make_weights(refs, acc)
    elif fallback == "snap":
        snapped = jnp.clip(best_ref, -cfg.snap_clip, cfg.snap_clip)
        elements = jnp.where(acc, elem, best_elem)
        refs = jnp.where(acc[:, None], ref, snapped)
        found = jnp.ones((C,), bool)
        weights = make_weights(refs)
    elif fallback == "best":
        ok = best_max < cfg.fallback_max
        elements = jnp.where(acc, elem, jnp.where(ok, best_elem, -1))
        refs = jnp.where(acc[:, None], ref,
                         jnp.where(ok[:, None], best_ref, 0.0))
        found = acc | ok
        weights = make_weights(refs, found)
    elif fallback == "fixed_ref":
        # Reference _check_if_inside_element semantics
        # (interpolator.py:1448-1473) need per-candidate AABB/center
        # state the ladder does not carry; the ladder serves ACCEPTED
        # rows only and reports every unaccepted row in needs_retry --
        # locate() re-runs exactly those through the exhaustive scan
        # (which tracks the in-AABB / nearest-center fallback state), so
        # these placeholder values never survive to the caller.
        fixed = jnp.asarray(FALLBACK_REF_COORD[:d], ref.dtype)
        elements = jnp.where(acc, elem, best_elem)
        refs = jnp.where(acc[:, None], ref, fixed[None, :])
        found = jnp.ones((C,), bool)
        weights = make_weights(refs)
    else:
        raise ValueError(
            f"ladder does not support fallback mode {fallback!r}"
        )
    if fallback == "fixed_ref":
        # every unaccepted row needs the scan's fallback-state tracking,
        # full location opportunity or not
        needs_retry = ~acc
        if n_valid is not None and n_valid < C:
            rows = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)[:, 0]
            needs_retry = needs_retry & (rows < n_valid)
    if weights is None:
        weights = jnp.zeros((C, 0), w_dt)
    return (elements.astype(jnp.int32), refs.astype(w_dt),
            weights, found, acc, needs_retry)


# ---------------------------------------------------------------------------
# Candidate scan with first-accept / best-so-far / AABB / nearest state
# ---------------------------------------------------------------------------
def _scan_candidates(points, cand, invert, aabb, cfg, use_aabb: bool,
                     ref_dt=None):
    """Scan K candidates in distance order, carrying per-point state.

    points [C, d]; cand [C, K] int; invert: ids -> (ref, conv, maxabs);
    aabb (lo [E, d], hi [E, d]); ref_dt = dtype of the carried ref-coord
    state (the invert backend's output dtype).
    """
    C, d = points.shape
    K = cand.shape[1]
    if ref_dt is None:
        ref_dt = points.dtype

    def body(carry, k):
        (acc_found, acc_ref, acc_elem,
         best_max, best_ref, best_elem,
         in_found, in_ref, in_elem, in_conv,
         near_d, near_ref, near_elem, near_conv) = carry

        ids = cand[:, k]
        ref, conv, maxabs = invert(ids)
        valid = conv
        if use_aabb:
            lo, hi = aabb
            # small relative slack: face points must not be excluded by
            # floating-point rounding of the AABB test
            span = hi[ids] - lo[ids]
            eps = 1e-9 * span
            inside = jnp.all(
                (points >= lo[ids] - eps) & (points <= hi[ids] + eps),
                axis=-1,
            )
        else:
            inside = jnp.ones((C,), bool)

        # -- first accepted candidate in distance order --------------------
        accepted = valid & inside & (maxabs < cfg.accept_tol)
        newly = accepted & ~acc_found
        acc_ref = jnp.where(newly[:, None], ref, acc_ref)
        acc_elem = jnp.where(newly, ids, acc_elem)
        acc_found = acc_found | accepted

        # -- best-so-far by max |ref| among converged candidates ----------
        score = jnp.where(valid, maxabs, jnp.inf)
        better = score < best_max
        best_max = jnp.where(better, score, best_max)
        best_ref = jnp.where(better[:, None], ref, best_ref)
        best_elem = jnp.where(better, ids, best_elem)

        # -- first candidate whose AABB contains the point ----------------
        newly_in = inside & ~in_found
        in_ref = jnp.where(newly_in[:, None], ref, in_ref)
        in_elem = jnp.where(newly_in, ids, in_elem)
        in_conv = jnp.where(newly_in, conv, in_conv)
        in_found = in_found | inside

        # -- nearest candidate by distance to element center --------------
        if use_aabb:
            lo, hi = aabb
            center = 0.5 * (lo[ids] + hi[ids])
            dist = jnp.sum((points - center) ** 2, axis=-1).astype(ref_dt)
            nearer = dist < near_d
            near_d = jnp.where(nearer, dist, near_d)
            near_ref = jnp.where(nearer[:, None], ref, near_ref)
            near_elem = jnp.where(nearer, ids, near_elem)
            near_conv = jnp.where(nearer, conv, near_conv)

        return (acc_found, acc_ref, acc_elem,
                best_max, best_ref, best_elem,
                in_found, in_ref, in_elem, in_conv,
                near_d, near_ref, near_elem, near_conv), None

    zeros_ref = jnp.zeros((C, d), ref_dt)
    first = cand[:, 0]
    init = (
        jnp.zeros((C,), bool), zeros_ref, first,
        jnp.full((C,), jnp.inf, ref_dt), zeros_ref, first,
        jnp.zeros((C,), bool), zeros_ref, first, jnp.zeros((C,), bool),
        jnp.full((C,), jnp.inf, ref_dt), zeros_ref, first,
        jnp.zeros((C,), bool),
    )
    carry, _ = jax.lax.scan(body, init, jnp.arange(K))
    keys = ("acc_found", "acc_ref", "acc_elem", "best_max", "best_ref",
            "best_elem", "in_found", "in_ref", "in_elem", "in_conv",
            "near_d", "near_ref", "near_elem", "near_conv")
    return dict(zip(keys, carry))


def _prefilter_rank(cand, invert1, m: int, K: int):
    """Rank candidates by trilinear (8-corner) Newton max |ref|; return the
    best ``m`` candidate columns per point, re-sorted into distance order
    so downstream first-accept semantics are preserved."""

    def body(_, k):
        ref, conv, maxabs = invert1(cand[:, k])
        return None, jnp.where(conv, maxabs, jnp.inf)

    _, scores = jax.lax.scan(body, None, jnp.arange(K))  # [K, C]
    _, pos = jax.lax.top_k(-scores.T, m)
    pos = jnp.sort(pos, axis=1)  # restore distance order
    return jnp.take_along_axis(cand, pos, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("order", "cfg", "dtype", "use_aabb", "fallback",
                     "prefilter_m", "engine", "interpret", "want_weights"),
)
def _locate_chunk(points, cand, elem_nodes, elem_corners, aabb,
                  centering, nodes_c32, corners_c32,
                  order, cfg, dtype, use_aabb, fallback, prefilter_m,
                  engine, interpret, want_weights=True):
    C, d = points.shape
    ref_dt = points.dtype

    cfg1 = dataclasses.replace(
        cfg, newton_iters=cfg.prefilter_iters, polish_iters=0
    )
    if engine == "pallas":
        invert = _make_pallas_invert(points, nodes_c32, centering,
                                     order, cfg, interpret)
        invert1 = (
            invert
            if order == 1
            else _make_pallas_invert(points, corners_c32, centering,
                                     1, cfg1, interpret)
        )
    else:
        invert = _make_xla_invert(points, elem_nodes, order, cfg, dtype)
        invert1 = (
            invert
            if order == 1
            else _make_xla_invert(points, elem_corners, 1, cfg1, dtype)
        )

    if prefilter_m and prefilter_m < cand.shape[1] and order > 1:
        # only the nearest prefilter_pool candidates enter the trilinear
        # ranking; the rescue pass re-scans the full list for any point
        # this pool fails to accept
        pool = min(max(cfg.prefilter_pool, prefilter_m), cand.shape[1])
        cand = _prefilter_rank(cand[:, :pool], invert1, prefilter_m, pool)

    st = _scan_candidates(
        points, cand, invert, aabb, cfg, use_aabb,
        ref_dt=jnp.float32 if engine == "pallas" else points.dtype,
    )

    # weights/refs at the engine's own accuracy: the pallas engine's refs
    # carry f32 precision, so f32 storage loses nothing and halves the
    # bandwidth of every downstream gather/apply
    w_dt = jnp.float32 if engine == "pallas" else ref_dt

    def make_weights(refs, mask=None):
        if not want_weights:
            return None
        w = gll.tensor_basis(order, refs.astype(w_dt))
        if mask is not None:
            w = jnp.where(mask[:, None], w, 0.0)
        return w

    acc = st["acc_found"]
    if fallback == "sentinel":
        # Reference get_element_weights with snap_to_nearest=False
        # (interpolator.py:1231-1233): -1 and zero weights.
        elements = jnp.where(acc, st["acc_elem"], -1)
        refs = jnp.where(acc[:, None], st["acc_ref"],
                         jnp.zeros((C, d), ref_dt))
        found = acc
        weights = make_weights(refs, acc)
    elif fallback == "snap":
        # snap_to_nearest=True (interpolator.py:1217-1230): clip the best
        # candidate's ref coords to +/- snap_clip.
        snapped = jnp.clip(st["best_ref"], -cfg.snap_clip, cfg.snap_clip)
        elements = jnp.where(acc, st["acc_elem"], st["best_elem"])
        refs = jnp.where(acc[:, None], st["acc_ref"], snapped)
        found = jnp.ones((C,), bool)
        weights = make_weights(refs)
    elif fallback == "best":
        # C trilinear kernel semantics (trilinearinterpolator.c:113-137):
        # take the best-so-far candidate *unclipped* if its max |ref| is
        # below fallback_max, else report failure.
        ok = st["best_max"] < cfg.fallback_max
        elements = jnp.where(acc, st["acc_elem"],
                             jnp.where(ok, st["best_elem"], -1))
        refs = jnp.where(acc[:, None], st["acc_ref"],
                         jnp.where(ok[:, None], st["best_ref"], 0.0))
        found = acc | ok
        weights = make_weights(refs, found)
    elif fallback == "fixed_ref":
        # Reference _check_if_inside_element (interpolator.py:1448-1473):
        # fallback element = first candidate whose AABB contains the point,
        # else nearest candidate by center distance; if its Newton failed or
        # lies outside tolerance, use the fixed interior ref coordinate.
        fb_elem = jnp.where(st["in_found"], st["in_elem"], st["near_elem"])
        fb_ref = jnp.where(st["in_found"][:, None], st["in_ref"],
                           st["near_ref"])
        fb_conv = jnp.where(st["in_found"], st["in_conv"], st["near_conv"])
        fb_bad = (~fb_conv) | (
            jnp.max(jnp.abs(fb_ref), axis=-1) >= cfg.accept_tol
        )
        fixed = jnp.asarray(FALLBACK_REF_COORD[:d], ref_dt)
        fb_ref = jnp.where(fb_bad[:, None], fixed[None, :], fb_ref)
        elements = jnp.where(acc, st["acc_elem"], fb_elem)
        refs = jnp.where(acc[:, None], st["acc_ref"], fb_ref)
        found = jnp.ones((C,), bool)
        weights = make_weights(refs)
    else:
        raise ValueError(f"unknown fallback mode {fallback!r}")
    if weights is None:
        weights = jnp.zeros((C, 0), w_dt)  # placeholder keeps pytree static
    return elements.astype(jnp.int32), refs.astype(w_dt), weights, found, acc


def locate(
    points,
    elem_nodes,
    order: int,
    cfg: LocateConfig = DEFAULT_LOCATE,
    *,
    fallback: str = "sentinel",
    use_aabb: bool = False,
    centroids=None,
    candidates=None,
    prefilter_m: int = 0,
    chunk: int = 262_144,
    dtype=None,
    engine: str = "auto",
    want_weights: bool = True,
    strategy: str = "auto",
) -> LocateResult:
    """Locate each query point in the source mesh and compute GLL weights.

    points [N, d]; elem_nodes [E, (p+1)^d, d] device array (canonical
    lattice order).  ``fallback`` in {"sentinel", "snap", "best",
    "fixed_ref"} selects which reference failure semantics apply (see
    module docstring).  ``prefilter_m`` > 0 enables the trilinear
    candidate prefilter keeping the m best candidates (with a full-scan
    rescue pass for points it fails to accept).  ``candidates`` [N, K] may
    be passed to skip the internal kNN (e.g. layered paths with per-layer
    trees).  ``engine``: "auto" | "xla" | "pallas".

    ``strategy``: "auto" | "ladder" | "scan".  The ladder (see
    _ladder_chunk) is the TPU fast path -- one batched Newton on the
    nearest candidate plus compacted rescue rounds, ~4x faster than the
    sequential candidate scan with identical accept semantics for every
    rescued point.  "auto" selects it whenever the pallas engine is
    active.  In "fixed_ref" mode the ladder serves accepted rows and
    delegates every unaccepted row to the exhaustive-scan retry (which
    tracks the per-candidate AABB/nearest-center state the reference's
    fallback choice needs, interpolator.py:1448-1473), so the flagship
    fixed_ref entry points get ladder speed on their interior bulk with
    scan-exact fallback semantics.
    """
    if "MMT_LOCATE_CHUNK" in os.environ:  # experiment knob
        chunk = int(os.environ["MMT_LOCATE_CHUNK"])
    points = jnp.asarray(points)
    # elem_nodes stays in its caller-provided form (numpy or device):
    # _mesh_prep hashes + preps host arrays host-side, and the ladder
    # path never needs the raw f64 lattice on device at all
    N, d = points.shape
    if N == 0:
        # empty query sets happen (a layer with no target points); match
        # the kNN entry points and return empty results, not IndexError
        n_w = (order + 1) ** d if want_weights else 0
        return LocateResult(
            elements=jnp.zeros((0,), jnp.int32),
            refs=jnp.zeros((0, d), jnp.float32),
            weights=jnp.zeros((0, n_w), jnp.float32),
            found=jnp.zeros((0,), bool),
        )
    if engine == "auto":
        engine = default_engine()
    interpret = False
    if engine == "pallas":
        try:
            platform = jax.devices()[0].platform
        except Exception:
            platform = "cpu"
        interpret = platform == "cpu"
    else:
        # xla/scan engine: the carry dtype follows the promotion of
        # points with the f64 element lattice, so promote f32 query
        # points on device up front (callers upload f32 to halve
        # host->device tunnel time; see engine.exodus_2_gll)
        carry_dt = jnp.promote_types(points.dtype, elem_nodes.dtype)
        if points.dtype != carry_dt:
            points = points.astype(carry_dt)
    if dtype is None:
        from ..config import Precision

        dtype = (
            jnp.float32
            if cfg.precision in (Precision.MIXED, Precision.F32)
            else elem_nodes.dtype
        )

    # the ladder is the default on the pallas (TPU) engine; on xla it is
    # opt-in via strategy="ladder" (same ladder structure, inverse_map
    # rows backend -- the sharded programs use it so virtual-CPU meshes
    # execute the production code path)
    use_ladder = (
        fallback in ("sentinel", "snap", "best", "fixed_ref")
        and ((strategy == "auto" and engine == "pallas")
             or strategy == "ladder")
    )
    if strategy == "ladder" and not use_ladder:
        raise ValueError(
            f"strategy='ladder' does not support fallback {fallback!r}"
        )

    from ..utils_profile import stage_timer as _stage_timer

    use_df32_polish = (
        cfg.df32_polish and use_ladder and engine == "pallas"
        and not cfg.f64_polish
    )
    if cfg.df32_polish and not use_df32_polish and not cfg.f64_polish:
        import warnings

        warnings.warn(
            "df32_polish was requested but the pallas ladder engine is "
            f"not active (engine={engine!r}, strategy={strategy!r}, "
            f"fallback={fallback!r}); the pair-precision polish only "
            "runs on the TPU ladder path. On the xla/CPU engine use "
            "LocateConfig(f64_polish=True) or Precision.F64 instead.",
            stacklevel=2,
        )
    with _stage_timer("locate.prep"):
        prep = _mesh_prep(
            elem_nodes, order, d, engine,
            want_lo=use_ladder and (cfg.f64_polish or cfg.df32_polish),
        )
    if centroids is None:
        centroids = prep["centroids"]
    knn_per_chunk = candidates is None
    use_near1 = use_near1_grid = False
    if knn_per_chunk:
        k = min(cfg.nelem_to_search, elem_nodes.shape[0])
        # the ladder's rescue rounds restore any candidates the
        # approximate search drops AND re-search with the full
        # nelem_to_search budget, so the fast path runs approximate with
        # a small k (candidates beyond ~8 almost never accept first).
        # Candidates are computed PER CHUNK inside the loop: a global
        # [N, k] int32 array gets a tiled device layout that pads
        # k -> 128 lanes (51 GB at 100M points).
        use_approx = use_ladder and not interpret
        if use_approx:
            k = min(k, 8)
        # nearest-centroid-only candidates (fused matmul+argmax, ~6x
        # cheaper than even approximate top-8): round 1 only ever
        # evaluates the nearest candidate, and in bucket_knn mode the
        # ladder's rescue rounds compute their own top-12 for just the
        # bucket rows in-jit.  Small meshes only (the [C, E] product
        # must be affordable); the grid path keeps its probed top-k.
        from .grid import APPROX_GRID_MIN_SOURCES as _GRID_MIN

        near1_ok = (use_approx or (_FORCE_NEAR1 and use_ladder))
        use_near1 = near1_ok and 64 < elem_nodes.shape[0] <= _GRID_MIN
        # grid-path analogue: round-1 candidate = nearest member of the
        # rep-nearest bin (one fused argmax + single-bin argmin, ~3x
        # cheaper than the probed top-8 -- the candidate search was ~90%
        # of build time at E=500k); the ladder's rescue rounds re-probe
        # the bin index in-jit for the points where it fails.  Needs the
        # host-built index, so concrete (non-tracer) sources only.
        use_near1_grid = (
            near1_ok
            and elem_nodes.shape[0] > _GRID_MIN
            and not isinstance(centroids, jax.core.Tracer)
            and not isinstance(points, jax.core.Tracer)
        )
        # NOTE on a measured dead end: a precomputed per-voxel candidate
        # table (16 nearest elements per uniform-grid voxel, one packed
        # 512 B row gather per query) was prototyped here and is NOT a
        # win on v5e -- the random row gather is HBM-latency-bound at
        # ~36 ms per 262k chunk, the same as nearest_member(n_probe=1),
        # while cubic voxels sized to the MEDIAN centroid spacing hit
        # only ~53% nearest agreement on anisotropic shells (E=500k),
        # tripling ladder rescue work (601 ms vs 174 ms per chunk).

        def chunk_candidates(pts_c):
            with _stage_timer("locate.knn") as t:
                if use_near1:
                    from .knn import nearest_centroid

                    cand_c = nearest_centroid(centroids, pts_c)[:, None]
                elif use_near1_grid:
                    from .grid import get_grid_index, nearest_member

                    cand_c = nearest_member(
                        get_grid_index(centroids, _round1_m()), pts_c,
                        n_probe=_round1_p(),
                    )[:, None]
                elif use_approx:
                    # 4 probed bins (vs the public default 8) is plenty
                    # for CANDIDATE generation: the ladder re-probes 16
                    # bins for any point these candidates fail to accept
                    _, cand_c = _knn(centroids, pts_c, k, approx=True,
                                     n_probe=4)
                else:
                    _, cand_c = _knn(centroids, pts_c, k)
                return t.sync(jnp.asarray(cand_c))
    else:
        candidates = jnp.asarray(candidates)

    corners = prep["corners"]
    lo, hi = prep["lo"], prep["hi"]
    centering = prep["centering"]
    nodes_c32 = prep["nodes_c32"]
    nodes_flat32 = prep["nodes_flat32"]
    corners_c32 = prep["corners_c32"]
    _z1 = jnp.zeros((1,), jnp.float32)
    nodes_lo = (prep.get("nodes_lo_c32", _z1),
                prep.get("inv_scale_lo", _z1))
    min_bucket = pn.BLOCK if engine == "pallas" else 1

    rescue_mode = "none"
    grid_data = (jnp.zeros((1,), jnp.float32),) * 4
    bucket_knn = use_near1 or use_near1_grid
    if use_near1:
        # rescue-bucket candidate search runs inside the ladder jit:
        # randomly permuted (approx_max_k bins drop spatial neighbors
        # otherwise), jointly centered f32 source coords
        E_ = elem_nodes.shape[0]
        perm_j = jnp.asarray(
            np.random.default_rng(0xC0FFEE).permutation(E_).astype(
                np.int32)
        )
        c_all = jnp.asarray(centroids)
        bs_center = jnp.mean(c_all, axis=0)
        bucket_search = (
            (c_all[perm_j] - bs_center).astype(jnp.float32),
            perm_j,
            bs_center,
        )
    else:
        _zb = jnp.zeros((1,), jnp.float32)
        bucket_search = (jnp.zeros((1, d), jnp.float32),
                         jnp.zeros((1,), jnp.int32), _zb)
    if use_ladder:
        from .grid import APPROX_GRID_MIN_SOURCES, get_grid_index

        E = elem_nodes.shape[0]
        if E <= APPROX_GRID_MIN_SOURCES:
            # a [B, E] exact re-sweep is cheap at this size
            rescue_mode = "exact"
        else:
            # re-probe the balanced-bin index with 4x the bins instead
            # (an exact sweep would scale with E)
            rescue_mode = "grid"
            gi = get_grid_index(
                centroids, _round1_m() if use_near1_grid else 128
            )
            grid_data = (gi.bin_reps32, gi.center, gi.bin_elems,
                         gi.bin_coords6)

    # the scan path gathers from the raw lattice only on the XLA engine:
    # convert once here, not per chunk -- a numpy input would otherwise
    # re-upload the full f64 lattice on every chunk (and again on
    # retries).  The pallas engine (ladder OR scan -- e.g. the layered
    # fixed_ref paths force the scan strategy) inverts from the centered
    # split-f32 lattice and never reads elem_nodes on device, so it gets
    # a tiny placeholder instead of a GB-scale dead upload.
    if engine == "pallas":
        elem_nodes_dev = jnp.zeros((1, 1, d), jnp.float32)
    else:
        elem_nodes_dev = jnp.asarray(elem_nodes)

    # XLA:TPU mis-evaluates large-batch emulated-f64 programs: the same
    # rows that solve exactly in a 32768-row batch come back with wrong
    # reference coordinates once the compiled batch reaches 65536 rows
    # (measured v5e, [n, 125, 3] f64 gather + Newton; pure-f32 programs
    # are bit-stable across shapes).  The scan engine feeds the raw f64
    # lattice through exactly such a program, so cap its batch size on
    # TPU backends -- this also bounds the (128,128)-padded f64 gather
    # temps to ~4 GB.  The pallas engine consumes pre-centered f32 (and
    # split-f32 for the polish) and is unaffected.
    scan_row_cap = (
        32_768
        if engine == "xla" and default_engine() == "pallas"
        else None
    )
    if scan_row_cap is not None and use_ladder:
        # the xla-backend ladder feeds the same raw-f64 gather+Newton
        # program, so its chunks obey the same cap
        chunk = min(chunk, scan_row_cap)

    def run_scan_chunk(pts_c, cand_c, pm):
        n = pts_c.shape[0]
        if scan_row_cap is not None and n > scan_row_cap:
            parts = [
                run_scan_chunk(
                    pts_c[s : s + scan_row_cap],
                    cand_c[s : s + scan_row_cap], pm,
                )
                for s in range(0, n, scan_row_cap)
            ]
            return tuple(
                jnp.concatenate(cols) for cols in zip(*parts)
            )
        bucket = max(min_bucket, 1 << max(0, (n - 1)).bit_length())
        if bucket != n:
            reps = bucket - n
            pts_c = jnp.concatenate(
                [pts_c, jnp.repeat(pts_c[:1], reps, axis=0)]
            )
            cand_c = jnp.concatenate(
                [cand_c, jnp.repeat(cand_c[:1], reps, axis=0)]
            )
        out = _locate_chunk(
            pts_c, cand_c, elem_nodes_dev, corners, (lo, hi),
            centering, nodes_c32, corners_c32,
            order, cfg, dtype, use_aabb, fallback, pm, engine,
            interpret, want_weights,
        )
        return tuple(o[:n] for o in out)

    def run_chunk(pts_c, cand_c, pm):
        # Pad every chunk to a power-of-two row count so XLA compiles one
        # kernel per bucket instead of one per distinct batch size (and to
        # the pallas BLOCK granularity when that engine is active).
        n = pts_c.shape[0]
        if use_ladder:
            bucket = max(min_bucket, 1 << max(0, (n - 1)).bit_length())
            if bucket != n:
                reps = bucket - n
                pts_c = jnp.concatenate(
                    [pts_c, jnp.repeat(pts_c[:1], reps, axis=0)]
                )
                cand_c = jnp.concatenate(
                    [cand_c, jnp.repeat(cand_c[:1], reps, axis=0)]
                )
            out = _ladder_chunk(
                pts_c, cand_c, centroids, nodes_c32, nodes_flat32,
                centering, (lo, hi), grid_data, nodes_lo, bucket_search,
                elem_nodes_dev,
                order, cfg, fallback, use_aabb, interpret, want_weights,
                rescue_mode, bucket_knn=bucket_knn, n_valid=n,
                engine=engine, dtype=dtype,
            )
            return tuple(o[:n] for o in out)
        out = run_scan_chunk(pts_c, cand_c, pm)
        # scan evaluates every candidate column for every point: nothing
        # can be crowded out, so no row ever needs a retry
        return out + (jnp.zeros((n,), bool),)

    # NOTE on a measured dead end: spatially PRE-SORTING the queries
    # (quantized lexicographic cell key, outputs un-permuted at the
    # end) makes every downstream gather coherent and wins 1.28x in a
    # steady-state microbench -- but LOSES end to end (7.4 s vs 5.1 s
    # at 10M points, and rel err 7.6e-7 -> 1.5e-3 on the 500k-element
    # shell): sorting CLUSTERS the hard near-boundary points into the
    # same chunks, so the fixed-size rescue buckets (sized to the
    # dilute random-order failure tail) overflow exactly where the work
    # is hardest, and the sort itself costs more than the coherence
    # returns.  Random arrival order is load-balancing for the ladder.
    from ..progress import progress as _progress

    outs = []
    n_chunks = -(-N // chunk)
    with _stage_timer("locate.chunks") as t, _progress(
        N, "locate", n_steps=n_chunks
    ) as pbar:
        for start in range(0, N, chunk):
            sl = slice(start, min(start + chunk, N))
            pts_c = points[sl]
            cand_c = (
                chunk_candidates(pts_c)
                if knn_per_chunk
                else candidates[sl]
            )
            outs.append(run_chunk(pts_c, cand_c, prefilter_m))
            pbar.step(sl.stop - sl.start, device_value=outs[-1][0])
        t.sync(outs[-1][0])
    if len(outs) == 1:
        elements, refs, weights, found, accepted, needs_retry = outs[0]
    else:
        elements = jnp.concatenate([o[0] for o in outs])
        refs = jnp.concatenate([o[1] for o in outs])
        weights = jnp.concatenate([o[2] for o in outs])
        found = jnp.concatenate([o[3] for o in outs])
        accepted = jnp.concatenate([o[4] for o in outs])
        needs_retry = jnp.concatenate([o[5] for o in outs])

    n_retry = int(jnp.sum(needs_retry)) if use_ladder else 0
    if n_retry > 0 and fallback == "sentinel":
        # Exterior-heavy workloads (whole-globe depth slices, regular
        # grids overhanging the mesh) would otherwise pay the full scan
        # retry for every exterior point on every call: exterior points
        # never accept, and only ~C/32 rows per chunk get the ladder's
        # full-recall round.  A point outside the GLOBAL source AABB
        # (with slack) can never be inside any element, so its sentinel
        # result is already exact -- drop it from the retry.  (Snap/best
        # fallbacks still retry everything: their result depends on the
        # best-so-far over all candidates, which needs the scan.)
        glo = prep["lo"].min(axis=0)
        ghi = prep["hi"].max(axis=0)
        # accept_tol admits points up to ~(accept_tol-1)/2 of an element
        # extent beyond the hull, so the exclusion halo must cover that
        # band or near-boundary exterior points crowded out of the
        # rescue buckets would silently skip the scan retry that could
        # still accept them.  Use the largest element extent per axis
        # with a 2x safety factor (curvature/shear) plus fp slack.
        elem_ext = (prep["hi"] - prep["lo"]).max(axis=0)
        eps = (cfg.accept_tol - 1.0) * elem_ext + 1e-5 * (ghi - glo)
        inside_global = jnp.all(
            (points >= glo - eps) & (points <= ghi + eps), axis=-1
        )
        needs_retry = needs_retry & inside_global
        n_retry = int(jnp.sum(needs_retry))
    if n_retry > 0:
        # Crowded-out rows: unaccepted points that never reached the
        # ladder's full-recall round (possible when more than ~40% of a
        # chunk fails round 1, e.g. thin-element layered meshes).  Re-run
        # exactly those rows through the exhaustive scan with fresh
        # exact candidates, so the ladder's accept semantics degrade to
        # the scan's -- never to a silent sentinel/snap on an interior
        # point.  (Scalar count first: pulling the whole bool mask to
        # host on every call would cost ~N bytes over the tunnel.)
        retry = np.where(np.asarray(needs_retry))[0]
        k_full = min(cfg.nelem_to_search, elem_nodes.shape[0])
        with _stage_timer("locate.ladder_retry"), _progress(
            retry.size, "locate retry", n_steps=-(-retry.size // chunk)
        ) as rbar:
            # chunked like the main loop: a mass failure (bad round-1
            # candidates, pathological meshes) must degrade to a slow
            # scan, never to an OOM -- an unchunked retry at 8M rows
            # compiles a 16 GB [n, n_nodes, d] gather
            for rs in range(0, retry.size, chunk):
                retry_j = jnp.asarray(retry[rs:rs + chunk])
                pts_r = points[retry_j]
                if knn_per_chunk:
                    _, cand_r = _knn(centroids, pts_r, k_full)
                    cand_r = jnp.asarray(cand_r)
                else:
                    cand_r = candidates[retry_j]
                # scan-retried rows carry the engine's native (f32) ref
                # precision -- the f64 polish only covers ladder-accepted
                # rows
                r_el, r_ref, r_w, r_f, _acc = run_scan_chunk(
                    pts_r, cand_r, 0
                )
                elements = elements.at[retry_j].set(r_el)
                refs = refs.at[retry_j].set(r_ref.astype(refs.dtype))
                if want_weights:
                    weights = weights.at[retry_j].set(
                        r_w.astype(weights.dtype)
                    )
                found = found.at[retry_j].set(r_f)
                accepted = accepted.at[retry_j].set(_acc)
                rbar.step(retry_j.shape[0], device_value=r_el)

    k_avail = k if knn_per_chunk else candidates.shape[1]
    if prefilter_m and prefilter_m < k_avail and not use_ladder:
        # Rescue pass: the trilinear prefilter can mis-rank candidates on
        # strongly curved elements (the linear geometry is a poor proxy
        # there), so any point whose prefiltered candidates were never
        # *accepted* is retried with the full candidate scan.  The subset
        # is typically tiny, so this keeps the fast path fast and the
        # result as reliable as the exhaustive scan.
        retry = np.where(~np.asarray(accepted))[0]
        if retry.size:
            retry_j = jnp.asarray(retry)
            pts_r = points[retry_j]
            cand_r = (
                chunk_candidates(pts_r)
                if knn_per_chunk
                else candidates[retry_j]
            )
            r_el, r_ref, r_w, r_f, _, _ = run_chunk(pts_r, cand_r, 0)
            elements = elements.at[retry_j].set(r_el)
            refs = refs.at[retry_j].set(r_ref)
            weights = weights.at[retry_j].set(r_w)
            found = found.at[retry_j].set(r_f)

    refs_lo = None
    if use_df32_polish:
        # Pair-precision refinement of the ACCEPTED rows (snapped/best/
        # sentinel rows keep their scan semantics untouched): one fused
        # df32 Newton pass, ~1e-10 ref accuracy at near-f32 cost.  Any
        # weights returned above stay f32-grade -- the refined (hi, lo)
        # refs are what TransferOperator.apply consumes.
        from . import pallas_df32 as pd32

        with _stage_timer("locate.df32_polish") as t:
            ctr_hi_a, ctr_lo_a, inv_scale_a = centering
            inv_scale_lo_a = prep["inv_scale_lo"]
            nodes_lo_flat = prep["nodes_lo_flat32"]
            p32 = points.astype(jnp.float32)
            p32_lo = (points - p32.astype(points.dtype)).astype(
                jnp.float32
            )
            refs = refs.astype(jnp.float32)
            out_hi, out_lo = [], []
            for start in range(0, N, chunk):
                sl = slice(start, min(start + chunk, N))
                n = sl.stop - sl.start
                # power-of-two row bucket: one compile shape per bucket
                bucket = max(min_bucket, 1 << max(0, (n - 1)).bit_length())
                el = elements[sl]
                keep = accepted[sl] & (el >= 0)

                def pad(x):
                    if bucket == n:
                        return x
                    return jnp.concatenate(
                        [x, jnp.repeat(x[:1], bucket - n, axis=0)]
                    )

                rh, rl, okp = pd32.polish_pairs(
                    pad(p32[sl]), pad(p32_lo[sl]),
                    pad(jnp.maximum(el, 0)), pad(refs[sl]),
                    nodes_flat32, nodes_lo_flat,
                    ctr_hi_a, ctr_lo_a, inv_scale_a, inv_scale_lo_a,
                    order=order, dim=d,
                    iters=cfg.df32_polish_iters, interpret=interpret,
                )
                sel = (keep & okp[:n])[:, None]
                out_hi.append(jnp.where(sel, rh[:n], refs[sl]))
                out_lo.append(jnp.where(sel, rl[:n], 0.0))
            refs = (
                out_hi[0] if len(out_hi) == 1 else jnp.concatenate(out_hi)
            )
            refs_lo = (
                out_lo[0] if len(out_lo) == 1 else jnp.concatenate(out_lo)
            )
            t.sync(refs_lo)

    return LocateResult(elements, refs, weights, found, refs_lo=refs_lo)
