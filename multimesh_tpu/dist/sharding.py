"""Multi-chip execution: query points sharded over a device mesh.

The reference's only parallelism is single-host process pools chunking the
point loop (reference multi_mesh/components/interpolator.py:1239-1254).
Two TPU-native schemes, both ``shard_map`` over a 1-D
``jax.sharding.Mesh``:

* ``sharded_transfer`` -- query points sharded, source geometry and
  fields REPLICATED per chip (a 1M-element order-4 source is ~1.5 GB in
  f32, comfortably resident): the entire pipeline (kNN -> Newton locate
  -> gather+einsum apply) runs independently per shard with zero
  collectives in steady state.

* ``source_sharded_transfer`` -- for sources that exceed a chip's HBM:
  source elements are split into spatially compact shards (contiguous
  runs of the median-split bin curve, balanced by element count), each
  query point is routed to the shard owning its nearest bin, and
  location runs in two passes: a local try against the shard's own
  elements resolves the vast majority; the residual misses (points whose
  enclosing element lives across a shard boundary) are compacted,
  ``all_gather``-ed over ICI, retried by EVERY chip against its local
  elements, and combined by best max|ref| -- the conservative version of
  the cell-bin halo exchange in SURVEY.md section 7.5.
"""
from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..config import LocateConfig, DEFAULT_LOCATE
from ..core import gll
from ..search.locate import _locate_chunk


def make_mesh(n_devices: int | None = None, axis: str = "points") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devices)} jax devices are available "
                f"({[d.platform for d in devices]})"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def _engine_prep(engine: str, nodes, corners, lo, hi):
    """Per-element centering for the pallas engine (split-f32 centers +
    normalized f32 lattices), shared by the replicated and source-sharded
    paths so the numerics cannot drift apart.  Non-pallas engines get
    tiny placeholders (never read).  Returns (centering, nodes_c32,
    corners_c32)."""
    if engine != "pallas":
        z = jnp.zeros((1,), jnp.float32)
        return (z, z, z), z, z
    centers = 0.5 * (lo + hi)
    scales = jnp.maximum(0.5 * jnp.max(hi - lo, axis=-1), 1e-30)
    nodes_c32 = (
        (nodes - centers[:, None, :]) / scales[:, None, None]
    ).astype(jnp.float32)
    corners_c32 = (
        (corners - centers[:, None, :]) / scales[:, None, None]
    ).astype(jnp.float32)
    ctr_hi = centers.astype(jnp.float32)
    ctr_lo = (centers - ctr_hi.astype(centers.dtype)).astype(jnp.float32)
    inv_scale = (1.0 / scales).astype(jnp.float32)
    return (ctr_hi, ctr_lo, inv_scale), nodes_c32, corners_c32


def _device_knn(points, centroids, k: int):
    """Per-shard exact kNN: |q|^2 - 2qc + |c|^2 matmul (MXU) + top_k.
    Inputs are already centered by the caller.

    Ranking is pure f32 (no split-f32 re-rank as in search.knn), so
    near-tied candidates can order differently than the single-chip
    path: first-accept tie-breaks on shared element faces may pick the
    other (equally valid) neighbor, giving values that agree to
    interpolation continuity rather than bit-exactly."""
    q32 = points.astype(jnp.float32)
    c32 = centroids.astype(jnp.float32)
    d2 = (
        jnp.sum(q32 * q32, axis=-1, keepdims=True)
        - 2.0 * (q32 @ c32.T)
        + jnp.sum(c32 * c32, axis=-1)[None, :]
    )
    _, idx = jax.lax.top_k(-d2, k)
    return idx.astype(jnp.int32)


def sharded_transfer(
    points,
    elem_nodes,
    fields,
    order: int,
    cfg: LocateConfig = DEFAULT_LOCATE,
    *,
    fallback: str = "sentinel",
    use_aabb: bool = False,
    mesh: Mesh | None = None,
    axis: str = "points",
    engine: str = "auto",
    strategy: str = "auto",
    chunk: int = 262_144,
    device_out: bool = False,
):
    """Locate + interpolate with query points sharded across the mesh.

    points [N, d]; elem_nodes [E, (p+1)^d, d]; fields [F, E, (p+1)^d].
    Returns values [N, F] (gathered back to host order).  Semantics match
    search.locate with the same cfg/fallback.

    ``strategy`` mirrors ``search.locate``: "auto"/"ladder" runs the
    PRODUCTION escalation-ladder engine inside every shard -- the same
    round-1 nearest-candidate + compacted-rescue + grid-index program the
    single-chip path runs (nearest-centroid or balanced-bin candidates,
    host-level chunking so per-shard temporaries stay bounded at any N,
    and the exhaustive-scan retry for rows the ladder cannot serve) --
    with the Newton backend picked by ``engine`` exactly as in
    search.locate ("pallas" = the fused Mosaic kernel per chip, "xla" =
    the inverse_map rows twin, which is what a virtual CPU mesh runs).
    "scan" keeps the sequential candidate-scan shard program (one
    unchunked pass; comparison/debug path).

    ``points`` may be a device array (consumed in place -- blocks are
    sliced and resharded on device with no host bounce).
    ``device_out=True`` returns the values as a device array instead of
    pulling them to the host -- the right mode for device-resident
    pipelines (and for benchmarking the compute path rather than the
    host link).
    """
    from ..search.locate import default_engine

    use_ladder = strategy in ("auto", "ladder")
    if strategy not in ("auto", "ladder", "scan"):
        raise ValueError(f"unknown strategy {strategy!r}")
    if use_ladder:
        return _sharded_transfer_ladder(
            points, elem_nodes, fields, order, cfg,
            fallback=fallback, use_aabb=use_aabb, mesh=mesh, axis=axis,
            engine=engine, chunk=chunk, device_out=device_out,
        )
    if device_out:
        raise ValueError("device_out requires the ladder strategy")

    from ..search import pallas_newton as pn

    if mesh is None:
        mesh = make_mesh(axis=axis)
    n_dev = mesh.devices.size
    if engine == "auto":
        engine = default_engine()
    interpret = False
    if engine == "pallas":
        try:
            interpret = jax.devices()[0].platform == "cpu"
        except Exception:
            interpret = True

    points = np.asarray(points)
    N, d = points.shape
    k = min(cfg.nelem_to_search, elem_nodes.shape[0])

    # each shard's point count must be a multiple of the pallas BLOCK
    quantum = n_dev * (pn.BLOCK if engine == "pallas" else 1)
    pad = (-N) % quantum
    if pad:
        points = np.concatenate([points, np.tile(points[:1], (pad, 1))])

    elem_nodes = jnp.asarray(elem_nodes)
    fields = jnp.asarray(fields)
    corners = elem_nodes[:, np.asarray(gll.corner_indices(order, d))]
    centroids = jnp.mean(elem_nodes, axis=1)
    center = jnp.mean(centroids, axis=0)
    lo = jnp.min(elem_nodes, axis=1)
    hi = jnp.max(elem_nodes, axis=1)

    centering, nodes_c32, corners_c32 = _engine_prep(
        engine, elem_nodes, corners, lo, hi
    )

    pts_sharding = NamedSharding(mesh, P(axis))
    pts_dev = jax.device_put(jnp.asarray(points), pts_sharding)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(), P(), P(), P(), P(), P(), P(),
                  (P(), P(), P()), P(), P()),
        out_specs=P(axis),
        check_vma=False,
    )
    def _shard_fn(pts, nodes, crn, lo_, hi_, cen, ctr, flds,
                  centering_, nodes_c32_, corners_c32_):
        cand = _device_knn(pts - ctr, cen - ctr, k)
        elements, refs, weights, found, _acc = _locate_chunk(
            pts, cand, nodes, crn, (lo_, hi_),
            centering_, nodes_c32_, corners_c32_,
            order, cfg, jnp.float32, use_aabb, fallback, 0, engine,
            interpret,
        )
        safe = jnp.maximum(elements, 0)
        gathered = flds[:, safe, :].astype(weights.dtype)
        vals = jnp.einsum("fnk,nk->nf", gathered, weights)
        return jnp.where((elements >= 0)[:, None], vals, 0.0)

    vals = _shard_fn(
        pts_dev, elem_nodes, corners, lo, hi, centroids, center, fields,
        centering, nodes_c32, corners_c32,
    )
    vals = np.asarray(vals)
    return vals[:N] if pad else vals


@functools.lru_cache(maxsize=8)
def _ladder_step(mesh, axis, cand_mode, rescue_mode, bucket_knn, k, C,
                 apply_chunk, order, cfg, fallback, use_aabb, interpret,
                 engine, dtype):
    """The jitted shard_map step of the ladder sharded program, cached by
    its static configuration: repeated transfers against the same mesh
    topology reuse one compiled executable instead of re-tracing a fresh
    closure per call."""
    from ..search.locate import _ladder_chunk
    from ..search.grid import _nearest_member_jit

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh, in_specs=(P(axis),) + (P(),) * 21,
        out_specs=(P(axis), P(axis), P(axis)), check_vma=False,
    )
    def _step(pts, nflat, c0, c1, c2, nc32, nlo0, nlo1, elem_nodes_x,
              cents_x, cc32, bs_ctr, lo_, hi_, g0, g1, g2, g3,
              b0, b1, b2, flds):
        if cand_mode == "grid":
            cand = _nearest_member_jit(g0, g2, g3, g1, pts, 4)[
                :, None
            ].astype(jnp.int32)
        else:
            q32 = (pts - bs_ctr).astype(jnp.float32)
            neg = (
                2.0 * (q32 @ cc32.T)
                - jnp.sum(cc32 * cc32, axis=-1)[None, :]
            )
            if cand_mode == "near1":
                cand = jnp.argmax(neg, axis=1)[:, None].astype(jnp.int32)
            else:
                _, cand = jax.lax.top_k(neg, k)
                cand = cand.astype(jnp.int32)
        el, refs, _w, found, _acc, needs_retry = _ladder_chunk(
            pts, cand, cents_x, nc32, nflat, (c0, c1, c2),
            (lo_, hi_), (g0, g1, g2, g3), (nlo0, nlo1), (b0, b1, b2),
            elem_nodes_x,
            order, cfg, fallback, use_aabb, interpret, False,
            rescue_mode, bucket_knn=bucket_knn, n_valid=None,
            engine=engine, dtype=dtype,
        )
        safe = jnp.maximum(el, 0)
        vals = []
        for s in range(0, C, apply_chunk):
            w = gll.tensor_basis(order, refs[s : s + apply_chunk])
            g = flds[:, safe[s : s + apply_chunk], :].astype(w.dtype)
            vals.append(jnp.einsum("fnk,nk->nf", g, w))
        vals = jnp.concatenate(vals) if len(vals) > 1 else vals[0]
        vals = jnp.where((found & (el >= 0))[:, None], vals, 0.0)
        # per-shard retry COUNT alongside the mask: the host pulls the
        # 4-byte count first and the [C]-bool mask only when nonzero
        # (the mask pull costs ~C bytes over a MB/s-slow host link)
        return vals, needs_retry, jnp.sum(needs_retry)[None]

    return _step


def _sharded_transfer_ladder(
    points, elem_nodes, fields, order, cfg, *,
    fallback, use_aabb, mesh, axis, engine, chunk,
    device_out: bool = False,
):
    """The production sharded program: every shard runs the SAME
    escalation-ladder engine as single-chip ``search.locate`` (round-1
    nearest candidate from the nearest-centroid argmax / balanced-bin
    index, compacted rescue rounds, in-jit re-probe), the apply is
    chunked so the [F, c, n] field gather stays bounded at any N, and
    rows the ladder cannot serve (crowded out of the rescue buckets, or
    fixed_ref rows needing the scan's AABB/nearest-center state) are
    re-run through the exhaustive scan on the host side -- identical
    degradation semantics to the single-chip path.

    Host-level chunking: each dispatch covers ``n_dev * chunk`` points
    (one ``chunk``-row ladder program per shard), so per-shard HBM holds
    the replicated source (nodes + fields) plus one bounded chunk of
    temporaries -- the north-star 12.5M-points-per-shard workload runs
    as ~48 pipelined dispatches instead of one 19 GB gather."""
    import warnings

    from ..config import Precision
    from ..search.locate import (
        _ladder_chunk, _mesh_prep, default_engine, locate,
    )
    from ..search.grid import APPROX_GRID_MIN_SOURCES, get_grid_index, \
        _nearest_member_jit
    from ..search import pallas_newton as pn

    if mesh is None:
        mesh = make_mesh(axis=axis)
    else:
        axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    if engine == "auto":
        engine = default_engine()
    interpret = False
    if engine == "pallas":
        try:
            interpret = jax.devices()[0].platform == "cpu"
        except Exception:
            interpret = True
    if cfg.df32_polish:
        warnings.warn(
            "df32_polish is not applied by sharded_transfer (the sharded "
            "apply consumes f32 refs); use f64_polish or the single-chip "
            "TransferOperator path for pair-precision values",
            stacklevel=3,
        )

    # device-resident query points are consumed in place (blocks are
    # sliced and resharded on device -- no device->host->device bounce);
    # host arrays are uploaded block by block, overlapping compute
    is_dev = isinstance(points, jax.Array) and not isinstance(
        points, np.ndarray
    )
    pts_src = points if is_dev else np.asarray(points)
    N, d = pts_src.shape
    host_nodes = np.asarray(elem_nodes)
    E = host_nodes.shape[0]
    host_fields = np.asarray(fields)
    F = host_fields.shape[0]
    if N == 0:
        out = np.zeros((0, F))
        return jnp.asarray(out) if device_out else out

    if engine == "xla" and default_engine() == "pallas":
        chunk = min(chunk, 32_768)  # XLA:TPU f64 batch cap (see locate)
    if engine == "pallas":
        chunk = int(np.ceil(chunk / pn.BLOCK) * pn.BLOCK)
    C = chunk
    apply_chunk = min(C, 65_536)

    want_lo = engine == "pallas" and cfg.f64_polish
    prep = _mesh_prep(host_nodes, order, d, engine, want_lo=want_lo)

    repl = NamedSharding(mesh, P())
    pts_sharding = NamedSharding(mesh, P(axis))

    def put(x):
        return jax.device_put(jnp.asarray(x), repl)

    z1 = put(jnp.zeros((1,), jnp.float32))
    zb = (put(jnp.zeros((1, d), jnp.float32)),
          put(jnp.zeros((1,), jnp.int32)), z1)
    cents_np = np.asarray(prep["centroids"])

    k = min(cfg.nelem_to_search, E)
    if E > APPROX_GRID_MIN_SOURCES:
        # balanced-bin round-1 candidate + in-jit grid re-probe rescue
        cand_mode, rescue_mode, bucket_knn = "grid", "grid", True
        from ..search.locate import _round1_m

        gi = get_grid_index(cents_np, _round1_m())
        grid_data = (put(gi.bin_reps32), put(gi.center),
                     put(gi.bin_elems), put(gi.bin_coords6))
        bucket_search = zb
        cents_c32 = z1
        cents_dev = z1  # rescue "grid" never reads raw centroids
    elif E > 64:
        # nearest-centroid round 1 + in-jit approx top-8 bucket rescue
        cand_mode, rescue_mode, bucket_knn = "near1", "exact", True
        bs_center_np = cents_np.mean(axis=0)
        perm = np.random.default_rng(0xC0FFEE).permutation(E).astype(
            np.int32
        )
        bucket_search = (
            put((cents_np[perm] - bs_center_np).astype(np.float32)),
            put(perm),
            put(bs_center_np),
        )
        cents_c32 = put((cents_np - bs_center_np).astype(np.float32))
        grid_data = (z1, z1, z1, z1)
        cents_dev = put(cents_np)
    else:
        # tiny sources: full in-shard top-k candidates
        cand_mode, rescue_mode, bucket_knn = "topk", "exact", False
        bs_center_np = cents_np.mean(axis=0)
        bucket_search = zb
        cents_c32 = put((cents_np - bs_center_np).astype(np.float32))
        grid_data = (z1, z1, z1, z1)
        cents_dev = put(cents_np)
    bs_center = put(
        bs_center_np if cand_mode in ("near1", "topk")
        else np.zeros((d,))
    )

    if engine == "pallas":
        nodes_flat32 = put(prep["nodes_flat32"])
        centering = tuple(put(c) for c in prep["centering"])
        elem_x = put(jnp.zeros((1, 1, d), jnp.float32))
        nodes_c32_r = put(prep["nodes_c32"]) if want_lo else z1
        nodes_lo = (
            (put(prep["nodes_lo_c32"]), put(prep["inv_scale_lo"]))
            if want_lo else (z1, z1)
        )
    else:
        nodes_flat32 = z1
        centering = (z1, z1, z1)
        elem_x = put(host_nodes)
        nodes_c32_r = z1
        nodes_lo = (z1, z1)
    lo_dev, hi_dev = put(prep["lo"]), put(prep["hi"])
    flds_dev = put(host_fields.astype(np.float32))
    dtype = (
        jnp.float32
        if cfg.precision in (Precision.MIXED, Precision.F32)
        else jnp.float64
    )

    _step = _ladder_step(
        mesh, axis, cand_mode, rescue_mode, bucket_knn, k, C,
        apply_chunk, order, cfg, fallback, use_aabb, interpret, engine,
        dtype,
    )

    repl_args = (nodes_flat32, *centering, nodes_c32_r, *nodes_lo,
                 elem_x, cents_dev, cents_c32, bs_center,
                 lo_dev, hi_dev, *grid_data, *bucket_search, flds_dev)

    G = n_dev * C
    retry_mask = np.zeros((N,), bool)
    pend = []
    for start in range(0, N, G):
        blk = pts_src[start : start + G]
        nb = blk.shape[0]
        if nb < G:
            if is_dev:
                blk = jnp.concatenate(
                    [blk, jnp.tile(blk[:1], (G - nb, 1))]
                )
            else:
                blk = np.concatenate(
                    [blk, np.tile(blk[:1], (G - nb, 1))]
                )
        if is_dev and n_dev == 1:
            # already resident on the right (only) device: an explicit
            # device_put here round-trips the slow host tunnel on this
            # rig (measured 18x on the 10M bench); jit adapts layouts
            blk_dev = blk
        else:
            blk_dev = jax.device_put(jnp.asarray(blk), pts_sharding)
        # dispatch is async: all blocks enter the pipeline before any
        # result is pulled, so device compute overlaps the host loop
        pend.append((start, nb) + tuple(_step(blk_dev, *repl_args)))
    if device_out:
        vals_dev = jnp.concatenate(
            [v if nb == G else v[:nb] for _, nb, v, r, c in pend]
        )
    else:
        out_vals = np.zeros((N, F))
    from ..progress import progress as _progress

    # the drain loop forces completion block by block, so it is where
    # progress is honest (dispatch above is async and races ahead)
    with _progress(N, "sharded transfer", n_steps=len(pend)) as pbar:
        for start, nb, v, r, c in pend:
            if not device_out:
                out_vals[start : start + nb] = np.asarray(v)[:nb]
            if int(np.asarray(c).sum()):
                retry_mask[start : start + nb] = np.asarray(r)[:nb]
            pbar.step(nb)

    rows = np.where(retry_mask)[0]
    pts_r = np.asarray(pts_src[rows]) if rows.size else None
    if rows.size and fallback == "sentinel":
        # exterior points can never accept: their sentinel result is
        # already exact, so exclude them from the scan retry (same halo
        # arithmetic as locate's sentinel fast path; global bounds come
        # from tiny device reductions, not a host sweep of the lattice)
        glo = np.asarray(jnp.min(prep["lo"], axis=0))
        ghi = np.asarray(jnp.max(prep["hi"], axis=0))
        elem_ext = np.asarray(jnp.max(prep["hi"] - prep["lo"], axis=0))
        eps = (cfg.accept_tol - 1.0) * elem_ext + 1e-5 * (ghi - glo)
        inside = np.all(
            (pts_r >= glo - eps) & (pts_r <= ghi + eps), axis=1
        )
        rows, pts_r = rows[inside], pts_r[inside]
    if rows.size:
        res = locate(
            pts_r, host_nodes, order, cfg, fallback=fallback,
            use_aabb=use_aabb, engine=engine, strategy="scan",
        )
        r_el = np.asarray(res.elements)
        r_f = np.asarray(res.found)
        keep = jnp.asarray(r_f & (r_el >= 0))
        if device_out:
            g = flds_dev[:, jnp.maximum(res.elements, 0), :].astype(
                res.weights.dtype
            )
            v_d = jnp.einsum("fnk,nk->nf", g, res.weights)
            v_d = jnp.where(keep[:, None], v_d, 0.0)
            vals_dev = vals_dev.at[jnp.asarray(rows)].set(
                v_d.astype(vals_dev.dtype)
            )
        else:
            r_w = np.asarray(res.weights)
            g = host_fields[:, np.maximum(r_el, 0), :].astype(r_w.dtype)
            v = np.einsum("fnk,nk->nf", g, r_w)
            v[~np.asarray(keep)] = 0.0
            out_vals[rows] = v
    return vals_dev if device_out else out_vals


# ---------------------------------------------------------------------------
# Source-sharded transfer (two-pass local-try -> all_gather global-retry)
# ---------------------------------------------------------------------------
def partition_source(elem_nodes, n_shards: int):
    """Split source elements into spatially compact, size-balanced shards.

    Contiguous runs of the median-split bin curve (search.grid) are
    assigned to shards by cumulative element count, so each shard is a
    compact region of the domain and shard sizes differ by at most one
    bin.  Returns (shard_elem_ids: list of [E_s] int arrays in global
    ids, bin_reps [n_bins, d] f32 centered, rep_center [d], bin_shard
    [n_bins] int32) -- the bin data doubles as the query-routing table.
    """
    from ..search.grid import build_grid

    cents = np.asarray(jnp.mean(jnp.asarray(elem_nodes), axis=1))
    index = build_grid(cents, target_per_cell=32)
    elems = np.asarray(index.bin_elems)
    counts = np.asarray(index.bin_counts)
    csum = np.cumsum(counts) - counts
    per = max(1.0, counts.sum() / n_shards)
    bin_shard = np.minimum((csum / per).astype(np.int64),
                           n_shards - 1).astype(np.int32)
    shard_elem_ids = []
    for s in range(n_shards):
        sel = np.where(bin_shard == s)[0]
        ids = np.concatenate(
            [elems[i, : counts[i]] for i in sel]
        ) if sel.size else np.zeros((0,), np.int32)
        shard_elem_ids.append(ids.astype(np.int64))
    return shard_elem_ids, index.bin_reps32, index.center, bin_shard


@functools.partial(jax.jit, static_argnames=())
def _route_points_jit(points, bin_reps32, center, bin_shard):
    q32 = (points - center).astype(jnp.float32)
    d2 = (
        jnp.sum(q32 * q32, axis=-1, keepdims=True)
        - 2.0 * (q32 @ bin_reps32.T)
        + jnp.sum(bin_reps32 * bin_reps32, axis=-1)[None, :]
    )
    return bin_shard[jnp.argmin(d2, axis=1)]


def source_sharded_transfer(
    points,
    elem_nodes,
    fields,
    order: int,
    cfg: LocateConfig = DEFAULT_LOCATE,
    *,
    mesh: Mesh | None = None,
    axis: str = "shards",
    engine: str = "auto",
    retry_frac: int = 4,
    fallback: str = "sentinel",
    chunk: int = 262_144,
    strategy: str = "auto",
):
    """Locate + interpolate with SOURCE ELEMENTS sharded across the mesh
    (for sources too large to replicate per chip).

    points [N, d]; elem_nodes [E, (p+1)^d, d]; fields [F, E, (p+1)^d].
    Returns values [N, F] in input order.  ``fallback`` selects the
    cross-chip failure semantics, mirroring the single-chip modes
    (search.locate / reference interpolator.py:1217-1233):

    * ``"sentinel"`` -- zero where no chip accepted the point;
    * ``"best"``     -- the best-scoring candidate across ALL chips is
      used unclipped if its max |ref| < cfg.fallback_max (the C kernel's
      semantics, trilinearinterpolator.c:113-137), else zero;
    * ``"snap"``     -- the best-scoring candidate across all chips with
      ref coords clipped to +/- cfg.snap_clip (always assigns whenever
      any candidate's Newton converged anywhere).

    Pass 1: each query point runs on the chip owning its nearest source
    bin; the local kNN + Newton scan resolves everything whose enclosing
    element is shard-local.  Pass 2: each chip compacts its first
    P/``retry_frac`` unresolved points, ``all_gather``s them over ICI,
    relocates ALL chips' misses against its local elements, and the
    per-point winner (min max|ref| across chips, computed on UNCLIPPED
    refs so scores are comparable) is selected identically on every chip
    from the all_gathered scores.

    ``strategy`` "auto"/"ladder" runs the PRODUCTION escalation ladder
    inside each shard's local locate (nearest-centroid round 1,
    compacted rescue rounds, in-jit exhaustive-scan retry bucket), with
    per-shard points processed in bounded ``chunk``-row blocks
    (``lax.map``) so a north-star-sized shard cannot OOM; "scan" keeps
    the sequential candidate-scan (comparison/debug path).
    """
    import dataclasses

    from ..search.locate import _ladder_chunk, default_engine

    if fallback not in ("sentinel", "best", "snap"):
        raise ValueError(
            f"source_sharded_transfer: unknown fallback {fallback!r}"
        )
    # snap must keep every converged candidate comparable across chips,
    # so the internal locate runs in "best" mode with no score ceiling
    # and the clipping happens at value-assembly time
    loc_cfg = (
        dataclasses.replace(cfg, fallback_max=float("inf"))
        if fallback == "snap"
        else cfg
    )

    if mesh is None:
        mesh = make_mesh(axis=axis)
    else:
        axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    if engine == "auto":
        engine = default_engine()
    interpret = False
    if engine == "pallas":
        try:
            interpret = jax.devices()[0].platform == "cpu"
        except Exception:
            interpret = True

    points = np.asarray(points)
    elem_nodes = jnp.asarray(elem_nodes)
    fields = jnp.asarray(fields)
    N, d = points.shape
    F = fields.shape[0]
    n_nodes = elem_nodes.shape[1]
    k = min(cfg.nelem_to_search, elem_nodes.shape[0])

    # ---- host-side partition + routing --------------------------------
    shard_ids, bin_reps32, rep_center, bin_shard = partition_source(
        elem_nodes, n_dev
    )
    owner = np.asarray(_route_points_jit(
        jnp.asarray(points), bin_reps32, rep_center,
        jnp.asarray(bin_shard),
    ))
    perm_p = np.argsort(owner, kind="stable")
    counts_p = np.bincount(owner, minlength=n_dev)

    from ..search import pallas_newton as pn

    quantum = pn.BLOCK if engine == "pallas" else 8
    Pp = int(np.ceil(max(counts_p.max(), 1) / quantum) * quantum)
    if engine == "xla" and default_engine() == "pallas":
        chunk = min(chunk, 32_768)  # XLA:TPU f64 batch cap (see locate)
    # per-shard points are processed in fixed C_blk-row blocks
    # (lax.map): per-shard temporaries stay bounded at any point count,
    # so a north-star-sized shard cannot OOM on one monolithic pass
    C_blk = int(np.ceil(min(chunk, Pp) / quantum) * quantum)
    Pp = int(np.ceil(Pp / C_blk) * C_blk)
    B = max(Pp // retry_frac, min(Pp, 64))

    pts_sh = np.zeros((n_dev, Pp, d))
    pts_sh[:] = points[perm_p[0]]  # pad rows: any valid coordinate
    starts = np.concatenate([[0], np.cumsum(counts_p)])
    for s in range(n_dev):
        rows = perm_p[starts[s] : starts[s + 1]]
        pts_sh[s, : counts_p[s]] = points[rows]

    Ep = int(max(max(len(ids) for ids in shard_ids), k))
    nodes_sh = np.full((n_dev, Ep, n_nodes, d), 1e14)
    gmap = np.full((n_dev, Ep), -1, np.int32)
    fields_sh = np.zeros((n_dev, F, Ep, n_nodes), np.asarray(fields).dtype)
    host_nodes = np.asarray(elem_nodes)
    host_fields = np.asarray(fields)
    for s in range(n_dev):
        ids = shard_ids[s]
        nodes_sh[s, : len(ids)] = host_nodes[ids]
        gmap[s, : len(ids)] = ids
        fields_sh[s, :, : len(ids)] = host_fields[:, ids]

    corner_idx = np.asarray(gll.corner_indices(order, d))
    Fp_pad = pn._rows_feature_pad(order, d) if engine == "pallas" else 1
    perm_e = jnp.asarray(
        np.random.default_rng(0xC0FFEE).permutation(Ep).astype(np.int32)
    )
    apply_chunk = min(C_blk, 65_536)
    use_ladder = strategy in ("auto", "ladder")
    if strategy not in ("auto", "ladder", "scan"):
        raise ValueError(f"unknown strategy {strategy!r}")
    # the ladder path owns its own polish knobs; pair/f64 polish state is
    # a single-chip TransferOperator concern
    ladder_cfg = dataclasses.replace(
        loc_cfg, f64_polish=False, df32_polish=False
    )

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=(P(axis), P(axis), P(axis)),
        check_vma=False,
    )
    def _shard_fn(pts_s, nodes_s, gmap_s, fields_s, counts_s, perm_es):
        pts = pts_s[0]          # [P, d]
        nodes = nodes_s[0]      # [Ep, n, d]
        gm = gmap_s[0]          # [Ep]
        flds = fields_s[0]      # [F, Ep, n]
        nv = counts_s[0]        # scalar: valid (unpadded) rows
        me = jax.lax.axis_index(axis)

        corners = nodes[:, corner_idx]
        lo = jnp.min(nodes, axis=1)
        hi = jnp.max(nodes, axis=1)
        cents = jnp.mean(nodes, axis=1)
        ctr = jnp.sum(
            jnp.where((gm >= 0)[:, None], cents, 0.0), axis=0
        ) / jnp.maximum(jnp.sum(gm >= 0), 1)

        centering, nodes_c32, corners_c32 = _engine_prep(
            engine, nodes, corners, lo, hi
        )
        if engine == "pallas":
            nd = nodes_c32.shape[1] * nodes_c32.shape[2]
            nflat = jnp.concatenate(
                [nodes_c32.reshape(Ep, nd),
                 jnp.zeros((Ep, Fp_pad - nd), jnp.float32)], axis=1,
            )
        else:
            nflat = jnp.zeros((1,), jnp.float32)
        cc32 = (cents - ctr).astype(jnp.float32)
        cp32 = cc32[perm_es]
        z1 = jnp.zeros((1,), jnp.float32)
        grid_z = (z1, z1, z1, z1)

        def values_for(refs, el, found):
            safe = jnp.maximum(el, 0)
            if fallback == "snap":
                # value assembly clips the chosen refs (reference
                # snap_to_nearest, interpolator.py:1217-1230); accepted
                # refs lie within +/-1 so clipping is a no-op for them
                refs = jnp.clip(refs, -cfg.snap_clip, cfg.snap_clip)
            outs = []
            for s in range(0, refs.shape[0], apply_chunk):
                w = gll.tensor_basis(order, refs[s : s + apply_chunk])
                w = jnp.where(found[s : s + apply_chunk, None], w, 0.0)
                g = flds[:, safe[s : s + apply_chunk], :].astype(w.dtype)
                outs.append(jnp.einsum("fnk,nk->nf", g, w))
            return outs[0] if len(outs) == 1 else jnp.concatenate(outs)

        def locate_rows(rows):
            """One bounded block of the per-shard local locate."""
            if use_ladder:
                q32 = (rows - ctr).astype(jnp.float32)
                neg = (
                    2.0 * (q32 @ cc32.T)
                    - jnp.sum(cc32 * cc32, axis=-1)[None, :]
                )
                cand = jnp.argmax(neg, axis=1)[:, None].astype(jnp.int32)
                elements, refs, _w, found, _a, needs_retry = (
                    _ladder_chunk(
                        rows, cand, cents, z1, nflat, centering,
                        (lo, hi), grid_z, (z1, z1),
                        (cp32, perm_es, ctr), nodes,
                        order, ladder_cfg, "best", False, interpret,
                        False, "exact", bucket_knn=True, n_valid=None,
                        engine=engine, dtype=jnp.float32,
                    )
                )
                # in-jit exhaustive-scan retry of rows the ladder could
                # not serve (static bucket: retry rows are compacted to
                # the front; overflow keeps the ladder's best, exactly
                # the score the cross-chip combine then ranks)
                from ..search.knn import _knn_jit

                n_rows = rows.shape[0]
                B2 = max(n_rows // 8, min(n_rows, 128))
                if engine == "pallas":
                    # the scan kernel consumes whole BLOCK-row tiles
                    B2 = min(
                        int(np.ceil(B2 / pn.BLOCK) * pn.BLOCK), n_rows
                    )
                idx_r = jnp.argsort(~needs_retry)[:B2]
                k_full = min(int(ladder_cfg.nelem_to_search), Ep)
                _, cand2 = _knn_jit(rows[idx_r], cents, k_full, 4096,
                                    jnp.float32, True)
                el2, refs2, _w2, found2, _a2 = _locate_chunk(
                    rows[idx_r], cand2, nodes, corners, (lo, hi),
                    centering, nodes_c32, corners_c32,
                    order, ladder_cfg, jnp.float32, False, "best", 0,
                    engine, interpret, want_weights=False,
                )
                upd = needs_retry[idx_r]
                elements = elements.at[idx_r].set(
                    jnp.where(upd, el2, elements[idx_r])
                )
                refs = refs.at[idx_r].set(
                    jnp.where(upd[:, None], refs2.astype(refs.dtype),
                              refs[idx_r])
                )
                found = found.at[idx_r].set(
                    jnp.where(upd, found2, found[idx_r])
                )
            else:
                cand = _device_knn(rows - ctr, cents - ctr, k)
                elements, refs, _w, found, _a = _locate_chunk(
                    rows, cand, nodes, corners, (lo, hi),
                    centering, nodes_c32, corners_c32,
                    order, loc_cfg, jnp.float32, False, "best", 0,
                    engine, interpret, want_weights=False,
                )
            # max|ref| of the chosen candidate, UNCLIPPED: comparable
            # across chips in every fallback mode
            score = jnp.max(jnp.abs(refs), axis=-1)
            score = jnp.where(found, score, jnp.inf)
            # padding elements can never really accept, but guard anyway
            score = jnp.where(gm[jnp.maximum(elements, 0)] >= 0,
                              score, jnp.inf)
            vals = values_for(refs, elements, found)
            acc = score < cfg.accept_tol
            return acc, score, gm[jnp.maximum(elements, 0)], vals

        def locate_blocked(rows):
            """locate_rows over fixed C_blk blocks (lax.map bounds the
            per-shard temporaries at any row count)."""
            n_rows = rows.shape[0]
            n_blk = n_rows // C_blk
            if n_blk <= 1:
                return locate_rows(rows)
            outs = jax.lax.map(
                locate_rows, rows.reshape(n_blk, C_blk, d)
            )
            return (outs[0].reshape(n_rows), outs[1].reshape(n_rows),
                    outs[2].reshape(n_rows),
                    outs[3].reshape(n_rows, -1))

        # the score ceiling for a point to count as assigned at all
        limit = {
            "sentinel": cfg.accept_tol,
            "best": cfg.fallback_max,
            "snap": jnp.inf,
        }[fallback]

        # ---- pass 1: local try ---------------------------------------
        acc1, score1, gel1, vals1 = locate_blocked(pts)

        # ---- pass 2: all_gather the compacted misses ------------------
        order_p = jnp.argsort(acc1)  # False (misses) first, stable
        idx = order_p[:B]
        was = acc1[idx]
        all_miss = jax.lax.all_gather(pts[idx], axis)  # [D, B, d]
        DB = all_miss.shape[0] * B
        flat = all_miss.reshape(DB, d)
        # pad to the kernel quantum (and to whole C_blk blocks beyond
        # one block) so every locate_rows call sees tile-aligned rows
        DBp = int(np.ceil(DB / quantum) * quantum)
        if DBp > C_blk:
            DBp = int(np.ceil(DBp / C_blk) * C_blk)
        if DBp != DB:
            flat = jnp.concatenate(
                [flat, jnp.tile(flat[:1], (DBp - DB, 1))]
            )
        acc2, score2, gel2, vals2 = locate_blocked(flat)
        acc2, score2 = acc2[:DB], score2[:DB]
        gel2, vals2 = gel2[:DB], vals2[:DB]
        g_score = jax.lax.all_gather(score2, axis)  # [D, DB]
        g_vals = jax.lax.all_gather(vals2, axis)    # [D, DB, F]
        winner = jnp.argmin(g_score, axis=0)        # [DB]
        w_score = jnp.take_along_axis(g_score, winner[None, :], 0)[0]
        w_vals = jnp.take_along_axis(
            g_vals, winner[None, :, None], 0
        )[0]
        mine = jax.lax.dynamic_slice_in_dim(w_vals, me * B, B, 0)
        mine_score = jax.lax.dynamic_slice_in_dim(w_score, me * B, B, 0)
        # the global winner replaces the local result only where the
        # local chip did not already accept (local accepts stay -- the
        # owning chip holds the nearest candidates, matching the
        # single-chip first-accept-in-distance-order semantics)
        upd = (mine_score < score1[idx]) & ~was
        score_f = score1.at[idx].set(
            jnp.where(upd, mine_score, score1[idx])
        )
        vals_f = vals1.at[idx].set(
            jnp.where(upd[:, None], mine, vals1[idx])
        )
        found = score_f < limit
        vals = jnp.where(found[:, None], vals_f, 0.0)
        # real (unpadded) local misses beyond the cross-chip retry
        # window kept their local best without the all_gather retry --
        # report the count so the caller is never silently short-changed
        # (pad rows sort after real misses, so real misses always fill
        # the window first)
        valid = jnp.arange(pts.shape[0]) < nv
        miss1 = jnp.sum(jnp.logical_and(~acc1, valid))
        overflow = jnp.maximum(miss1 - B, 0)
        return vals[None], found[None], overflow[None]

    # device_put with the mesh sharding splits each [n_dev, ...] host
    # array straight onto its owning chip; a plain jnp.asarray would
    # materialize the FULL padded source on one device first -- exactly
    # the HBM blow-up this source-sharded mode exists to avoid
    shard0 = NamedSharding(mesh, P(axis))
    vals_sh, found_sh, overflow_sh = _shard_fn(
        jax.device_put(pts_sh, shard0),
        jax.device_put(nodes_sh, shard0),
        jax.device_put(gmap, shard0),
        jax.device_put(fields_sh, shard0),
        jax.device_put(counts_p.astype(np.int32), shard0),
        jax.device_put(perm_e, NamedSharding(mesh, P())),
    )
    vals_sh = np.asarray(vals_sh)
    found_np = np.asarray(found_sh)
    n_overflow = int(np.asarray(overflow_sh).sum())
    if n_overflow:
        print(
            f"{n_overflow} points missed locally but did not fit the "
            f"cross-chip retry window (B={B} per chip) and kept their "
            "local result; lower retry_frac to widen the window"
        )
    out = np.zeros((N, F))
    unfound = 0
    for s in range(n_dev):
        rows = perm_p[starts[s] : starts[s + 1]]
        out[rows] = vals_sh[s, : counts_p[s]]
        unfound += int((~found_np[s, : counts_p[s]]).sum())
    if unfound:
        print(
            f"{unfound} points could not find an enclosing element "
            "across any source shard. These points will be set to zero."
        )
    return out
