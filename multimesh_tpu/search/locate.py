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


def default_engine() -> str:
    """pallas on real accelerators, xla on CPU hosts."""
    try:
        platform = jax.devices()[0].platform
    except Exception:
        platform = "cpu"
    return "xla" if platform == "cpu" else "pallas"


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
    """
    points = jnp.asarray(points)
    elem_nodes = jnp.asarray(elem_nodes)
    N, d = points.shape
    if engine == "auto":
        engine = default_engine()
    interpret = False
    if engine == "pallas":
        try:
            platform = jax.devices()[0].platform
        except Exception:
            platform = "cpu"
        interpret = platform == "cpu"
    if dtype is None:
        from ..config import Precision

        dtype = (
            jnp.float32
            if cfg.precision in (Precision.MIXED, Precision.F32)
            else elem_nodes.dtype
        )

    if candidates is None:
        if centroids is None:
            centroids = jnp.mean(elem_nodes, axis=1)
        k = min(cfg.nelem_to_search, elem_nodes.shape[0])
        _, candidates = _knn(centroids, points, k)
    candidates = jnp.asarray(candidates)

    corners = elem_nodes[:, np.asarray(gll.corner_indices(order, d))]
    lo = jnp.min(elem_nodes, axis=1)
    hi = jnp.max(elem_nodes, axis=1)

    if engine == "pallas":
        # per-element centering/scale in full precision, stored once;
        # the kernel consumes exact-to-f32 unit-frame geometry, and the
        # per-candidate point centering uses a split-f32 representation
        # of the centers (see _make_pallas_invert)
        centers = 0.5 * (lo + hi)
        scales = jnp.maximum(
            0.5 * jnp.max(hi - lo, axis=-1), 1e-30
        )
        nodes_c32 = (
            (elem_nodes - centers[:, None, :]) / scales[:, None, None]
        ).astype(jnp.float32)
        corners_c32 = (
            (corners - centers[:, None, :]) / scales[:, None, None]
        ).astype(jnp.float32)
        ctr_hi = centers.astype(jnp.float32)
        ctr_lo = (centers - ctr_hi.astype(centers.dtype)).astype(
            jnp.float32
        )
        inv_scale = (1.0 / scales).astype(jnp.float32)
        centering = (ctr_hi, ctr_lo, inv_scale)
        min_bucket = pn.BLOCK
    else:
        z = jnp.zeros((1,), jnp.float32)
        centering = (z, z, z)
        nodes_c32 = corners_c32 = z
        min_bucket = 1

    def run_chunk(pts_c, cand_c, pm):
        # Pad every chunk to a power-of-two row count so XLA compiles one
        # kernel per bucket instead of one per distinct batch size (and to
        # the pallas BLOCK granularity when that engine is active).
        n = pts_c.shape[0]
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
            pts_c, cand_c, elem_nodes, corners, (lo, hi),
            centering, nodes_c32, corners_c32,
            order, cfg, dtype, use_aabb, fallback, pm, engine, interpret,
            want_weights,
        )
        return tuple(o[:n] for o in out)

    outs = []
    for start in range(0, N, chunk):
        sl = slice(start, min(start + chunk, N))
        outs.append(run_chunk(points[sl], candidates[sl], prefilter_m))
    if len(outs) == 1:
        elements, refs, weights, found, accepted = outs[0]
    else:
        elements = jnp.concatenate([o[0] for o in outs])
        refs = jnp.concatenate([o[1] for o in outs])
        weights = jnp.concatenate([o[2] for o in outs])
        found = jnp.concatenate([o[3] for o in outs])
        accepted = jnp.concatenate([o[4] for o in outs])

    if prefilter_m and prefilter_m < candidates.shape[1]:
        # Rescue pass: the trilinear prefilter can mis-rank candidates on
        # strongly curved elements (the linear geometry is a poor proxy
        # there), so any point whose prefiltered candidates were never
        # *accepted* is retried with the full candidate scan.  The subset
        # is typically tiny, so this keeps the fast path fast and the
        # result as reliable as the exhaustive scan.
        retry = np.where(~np.asarray(accepted))[0]
        if retry.size:
            retry_j = jnp.asarray(retry)
            r_el, r_ref, r_w, r_f, _ = run_chunk(
                points[retry_j], candidates[retry_j], 0
            )
            elements = elements.at[retry_j].set(r_el)
            refs = refs.at[retry_j].set(r_ref)
            weights = weights.at[retry_j].set(r_w)
            found = found.at[retry_j].set(r_f)

    return LocateResult(elements, refs, weights, found)
