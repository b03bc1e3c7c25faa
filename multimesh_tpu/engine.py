"""Mesh-to-mesh transfer pipelines (the engine).

TPU-native counterpart of the reference's interpolator component
(reference multi_mesh/components/interpolator.py, 1646 LoC of per-point
Python loops): every pipeline here is

    host I/O  ->  dedup  ->  device kNN  ->  device fused locate
              ->  device gather+einsum apply  ->  host write-back

with the (elements, weights) pair materialized as an ops.TransferOperator
that can be cached to disk and reused (the reference's ``stored_array``
feature).  Layered variants run each geological layer through the same
device pipeline with per-layer masks; there is no multiprocessing -- the
chunked device kernels replace the reference's process pools
(interpolator.py:1239-1254, :570-580).
"""
from __future__ import annotations

import os
import pathlib
from typing import Dict, List, Tuple, Union

import h5py
import numpy as np

from . import utils
from .config import LocateConfig, DEFAULT_LOCATE, Precision, PREFILTER_M
from .io import exodus as eio
from .io import salvus as sio
from .hashing import combine_fingerprints
from .ops import (
    TransferOperator,
    content_fingerprint,
    map_to_sphere,
    mesh_layer_masks,
    repair_fluid_solid,
    unique_points_per_layer,
)

PathLike = Union[str, pathlib.Path]


def _df32_default() -> bool:
    """MMT_DF32_POLISH=1 flips every engine transfer to the df32
    pair-precision polish + compensated apply (f64-grade values,
    search/pallas_df32.py) at ~20% throughput cost on TPU.  Off by
    default: the f32 pipeline already meets the <1e-6 target."""
    return os.environ.get("MMT_DF32_POLISH", "") == "1"


def _locate_cfg(nelem_to_search: int, accept_tol: float) -> LocateConfig:
    return LocateConfig(
        nelem_to_search=nelem_to_search, accept_tol=accept_tol,
        df32_polish=_df32_default(),
    )


def _as_salvus(mesh, fast_mode=False) -> sio.SalvusMesh:
    """Accept a path, our own SalvusMesh, or any live salvus-like mesh
    object.  The reference's interpolate_to_points takes a
    salvus.mesh.UnstructuredMesh directly (reference
    multi_mesh/components/interpolator.py:945-954, element nodes via
    ``points[connectivity]``); objects exposing points/connectivity (or
    an element-nodal ``points``) duck-type through the same engine."""
    if isinstance(mesh, (str, pathlib.Path)):
        return sio.SalvusMesh(mesh, fast_mode=fast_mode)
    if isinstance(mesh, sio.SalvusMesh):
        return mesh
    pts = getattr(mesh, "points", None)
    conn = getattr(mesh, "connectivity", None)
    if pts is not None and getattr(pts, "ndim", 0) == 2 and conn is not None:
        # salvus.mesh.UnstructuredMesh shape: flat vertex list + conn
        return _DuckMesh(np.asarray(pts)[np.asarray(conn)], mesh)
    if pts is not None and getattr(pts, "ndim", 0) == 3:
        return _DuckMesh(np.asarray(pts), mesh)
    return mesh


class _DuckMesh:
    """SalvusMesh-compatible view over a live mesh object: the derived
    geometry attributes the engine reads (``dimensions``, ``nelem``,
    ``n_gll_points``) plus field access and write-back delegated to the
    wrapped object, so duck-typed inputs work on every engine path
    (interpolate_to_mesh, the layered transfers), not just
    interpolate_to_points."""

    def __init__(self, elem_points: np.ndarray, source):
        self.points = elem_points
        self._source = source
        dim = elem_points.shape[2]
        self.shape_order = int(
            round(elem_points.shape[1] ** (1.0 / dim))
        ) - 1

    @property
    def dimensions(self) -> int:
        return self.points.shape[2]

    @property
    def nelem(self) -> int:
        return self.points.shape[0]

    @property
    def n_gll_points(self) -> int:
        return self.points.shape[1]

    @property
    def global_strings(self):
        return getattr(self._source, "global_strings", {})

    @property
    def element_nodal_fields(self):
        enf = getattr(self._source, "element_nodal_fields", None)
        if enf is None:
            raise AttributeError(
                "mesh object has no element_nodal_fields; pass a file "
                "path or a SalvusMesh for field access"
            )
        return enf

    def get_element_nodal_fields(self):
        get = getattr(self._source, "get_element_nodal_fields", None)
        if get is not None:
            return get()
        return self.element_nodal_fields

    def get_elemental_fields(self):
        get = getattr(self._source, "get_elemental_fields", None)
        if get is not None:
            return get()
        ef = getattr(self._source, "elemental_fields", None)
        if ef is None:
            raise AttributeError(
                "mesh object has no elemental fields; the layered paths "
                "need a SalvusMesh or file path"
            )
        return ef

    def attach_field(self, name, data):
        att = getattr(self._source, "attach_field", None)
        if att is not None:
            return att(name, data)
        self.element_nodal_fields[name] = np.asarray(data)


def _nodal_fields(mesh) -> dict:
    """Element-nodal fields of any mesh-like input.  Prefers the lazy
    accessor: a user-constructed ``SalvusMesh`` defaults to
    ``fast_mode=True``, where the raw ``element_nodal_fields`` dict is
    empty until first access -- reading it directly would silently turn
    ``parameters="all"`` into a no-op transfer."""
    get = getattr(mesh, "get_element_nodal_fields", None)
    return get() if get is not None else mesh.element_nodal_fields


# -------------------------------------------------------------------------
# GLL -> GLL (whole mesh)
# -------------------------------------------------------------------------
def gll_2_gll(
    from_gll: PathLike,
    to_gll: PathLike,
    nelem_to_search: int = 20,
    parameters="ISO",
    from_model_path: str = "MODEL/data",
    to_model_path: str = "MODEL/data",
    from_coordinates_path: str = "MODEL/coordinates",
    to_coordinates_path: str = "MODEL/coordinates",
    gradient: bool = False,
    stored_array: PathLike | None = None,
):
    """Transfer every parameter of ``from_gll`` onto ``to_gll``.

    Mirrors the reference flagship path (interpolator.py:621-852): all
    source parameters are transferred (the ``parameters`` argument is kept
    for API compatibility; the reference overrides it with the source's
    parameter list at :668), unique target points are deduplicated, the
    transfer operator is optionally cached under ``stored_array``
    (elements.npy / coeffs.npy), and fluid/solid contamination is repaired
    unless ``gradient``.
    """
    from .utils_profile import stage_timer

    with stage_timer("g2g.read_source"):
        src_points, src_data, src_params = sio.load_hdf5_params(
            from_gll, from_model_path, from_coordinates_path
        )
    dim = src_points.shape[2]
    order = int(round(src_data.shape[2] ** (1.0 / dim))) - 1
    parameters = src_params  # reference behavior: transfer all source params

    with h5py.File(str(to_gll), "r+") as new:
        with stage_timer("g2g.read_target"):
            new_points = np.asarray(
                new[to_coordinates_path][()], np.float64
            )
            gll_points = new_points.shape[1]
            elem_params = sio.read_dim_labels(new["MODEL/element_data"])
            fluid_idx = elem_params.index("fluid")
            fluid = new["MODEL/element_data"][:, fluid_idx].astype(bool)
            solid = ~fluid
            old_values = np.asarray(new[to_model_path][()])

        # Content fingerprints (memory-speed, ~0.25 s at 10M slots):
        # source and target hashed SEPARATELY so the target's fingerprint
        # also keys the dedup cache, and their combination guards the
        # on-disk operator cache.  Keying the operator on the raw target
        # coordinates (not the deduplicated uniq, as earlier rounds did)
        # is what lets a cache hit skip the ~8 s host dedup lexsort
        # entirely: the operator is saved WITH its reconstruction
        # indices (recon.npy).
        with stage_timer("g2g.fingerprint"):
            fp_tgt = content_fingerprint(new_points)
            fp = combine_fingerprints(
                content_fingerprint(src_points), fp_tgt
            )

        op = None
        if stored_array and TransferOperator.exists(stored_array):
            try:
                op = TransferOperator.load(stored_array, fingerprint=fp)
            except ValueError as exc:
                print(f"Ignoring stored operator: {exc}")
                op = None
        if op is not None and op.recon is not None:
            recon = np.asarray(op.recon)
        else:
            with stage_timer("g2g.dedup"):
                # first-appearance unique ordering: prefixes of the slot
                # array then reference prefixes of the unique values,
                # which is what lets _stream_expand_write overlap the
                # result pull with the HDF5 write.  The device copy is
                # cached too -- its ~120 MB upload otherwise costs more
                # than the locate compute on this rig's tunnel.
                from .ops.dedup import unique_points_device

                uniq, recon = unique_points_device(
                    new_points, fp_tgt, order_by="first"
                )
        if op is None:
            op = TransferOperator.build(
                src_points,
                uniq,
                order=order,
                cfg=_locate_cfg(nelem_to_search, accept_tol=1.04),
                fallback="fixed_ref",
                use_aabb=True,
                prefilter_m=PREFILTER_M,
                recon=recon,
            )
            if stored_array:
                op.save(stored_array, fingerprint=fp)

        fields = np.moveaxis(src_data, 1, 0)  # [P, E, n]
        # f32 field upload when the operator carries f32-grade refs (the
        # pallas/TPU path): apply casts fields to the weight dtype on
        # device anyway, so uploading f64 over the ~80 MB/s host tunnel
        # is pure waste.  The f64-accurate paths (xla/CPU refs, df32
        # pair polish, dense f64 caches) keep the f64 upload.
        op_weights_f32 = op.refs_lo is None and (
            (op._weights is not None
             and np.dtype(op._weights.dtype) == np.float32)
            or (op._weights is None and op.refs is not None
                and np.dtype(op.refs.dtype) == np.float32)
        )
        if op_weights_f32:
            fields = np.ascontiguousarray(fields, dtype=np.float32)
        with stage_timer("g2g.apply") as t:
            # UNIQUE values only, as a list of device chunks:
            # reconstruction to the ~2x larger slot array happens on the
            # host, streamed chunk by chunk below
            chunks, CH = op.apply(fields, out_chunks=True)
            t.sync(chunks[0])
        # NaN audit as a device-side reduce (np.isnan on the host would
        # need the values first; expansion cannot introduce NaNs, so
        # auditing the unique values covers the full result)
        import jax.numpy as jnp

        if bool(jnp.any(jnp.stack(
            [jnp.isnan(c).any() for c in chunks]
        ))):
            raise FloatingPointError(
                "interpolation produced NaNs; check source mesh/fields"
            )

        with stage_timer("g2g.stream_write"):
            values = _stream_expand_write(
                new, chunks, CH, recon, parameters, gll_points,
                old_values, solid, gradient,
                to_model_path, to_coordinates_path,
            )
    return values


def _stream_pull_write(dset, out_dev, block_bytes: int = 1 << 25):
    """Pipelined device->host pull + HDF5 write for DIRECT-ordered
    results (no dedup/reconstruction): a worker thread pulls row block
    j+1 (jax releases the GIL during transfers) while the main thread
    writes block j.  Row counts are fixed per block (one compile shape
    plus the remainder) and the HDF5 handle is only ever touched by one
    thread at a time."""
    import concurrent.futures

    from .progress import progress as _progress

    n = out_dev.shape[0]
    row_bytes = int(
        np.prod(out_dev.shape[1:]) * out_dev.dtype.itemsize
    )
    blk = max(1, block_bytes // max(1, row_bytes))
    starts = list(range(0, n, blk))
    blocks: dict = {}

    def pull(j):
        s = starts[j]
        blocks[j] = np.asarray(out_dev[s : s + blk])

    pbar = _progress(n, "write-back", unit="rows", n_steps=len(starts))
    with concurrent.futures.ThreadPoolExecutor(1) as ex:
        fut = ex.submit(pull, 0)
        for j, s in enumerate(starts):
            fut.result()
            if j + 1 < len(starts):
                fut = ex.submit(pull, j + 1)
            b = blocks.pop(j)
            dset[s : s + b.shape[0]] = b
            pbar.step(b.shape[0])
    pbar.close()


def _stream_expand_write(
    new, chunks, CH, recon, parameters, gll_points, old_values, solid,
    gradient, to_model_path, to_coordinates_path,
):
    """Pipelined device->host pull + host expansion + HDF5 write-back.

    The device->host tunnel on this rig runs ~20 MB/s and the host
    expansion (recon gather + [E, n, P] -> [E, P, n] relayout + fluid
    repair + HDF5 write) costs a comparable wall, so running them
    back-to-back doubles the tail of every file transfer.  Instead a
    single worker thread pulls value chunk j+1 (jax releases the GIL
    during transfers) while the main thread expands and writes every
    element whose unique values are fully resident.

    Streaming needs ``max(recon[:m])`` monotone in ``m`` -- guaranteed
    when the dedup used order_by="first" (ops.dedup).  Any other recon
    (e.g. an externally built stored_array) degrades gracefully: the
    element boundaries collapse toward the final chunk and the write
    simply happens after the full pull, bit-identically.
    """
    import concurrent.futures

    from .progress import progress as _progress

    n_elem = old_values.shape[0]
    n_par = len(parameters)
    U = sum(int(c.shape[0]) for c in chunks)
    vals_host = np.empty((U, n_par), chunks[0].dtype)

    # last element writable after chunk j: cumulative max unique id per
    # element prefix vs pulled-row watermark (j+1)*CH
    elem_max = np.maximum.accumulate(
        recon.reshape(n_elem, gll_points).max(axis=1)
    )
    limits = [min((j + 1) * CH, U) for j in range(len(chunks))]
    e_bounds = np.searchsorted(elem_max, limits, side="left")
    e_bounds[-1] = n_elem

    sio.recreate_dataset(
        new, parameters, to_model_path, to_coordinates_path
    )
    dset = new[to_model_path]
    values = np.empty((n_elem, n_par, gll_points), np.float64)
    blk = max(1, (1 << 25) // max(1, n_par * gll_points * 8))

    def pull(j):
        lo = j * CH
        arr = np.asarray(chunks[j])
        vals_host[lo : lo + arr.shape[0]] = arr

    pbar = _progress(n_elem, "write-back", unit="elems",
                     n_steps=-(-n_elem // blk))
    with concurrent.futures.ThreadPoolExecutor(1) as ex:
        fut = ex.submit(pull, 0)
        prev_e = 0
        for j in range(len(chunks)):
            fut.result()
            if j + 1 < len(chunks):
                fut = ex.submit(pull, j + 1)
            # expand/repair/write all elements newly covered by chunk j.
            # The expansion converts to f64 in the same pass -- fluid /
            # reverted-solid elements then keep their original values
            # BIT-exactly, and the dataset is f64 anyway.
            for s in range(prev_e, int(e_bounds[j]), blk):
                e = min(s + blk, int(e_bounds[j]))
                rb = recon[s * gll_points : e * gll_points]
                block = np.asarray(
                    vals_host[rb]
                    .reshape(e - s, gll_points, n_par)
                    .transpose(0, 2, 1),
                    dtype=np.float64, order="C",
                )  # [blk, P, n]
                if not gradient:
                    block = repair_fluid_solid(
                        block, old_values[s:e], solid[s:e], parameters
                    )
                values[s:e] = block
                dset[s:e] = block
                pbar.step(e - s)
            prev_e = int(e_bounds[j])
    pbar.close()
    return values


# -------------------------------------------------------------------------
# GLL -> GLL (layered)
# -------------------------------------------------------------------------
def _layered_operators(
    original_mesh: sio.SalvusMesh,
    new_mesh: sio.SalvusMesh,
    layers,
    nelem_to_search: int,
    stored_array: PathLike | None,
    accept_tol: float,
    fallback: str,
    use_aabb: bool,
) -> Tuple[Dict[str, TransferOperator], Dict[str, np.ndarray],
           Dict[str, np.ndarray]]:
    """Shared core of the layered transfers: per-layer (operator,
    source-mask, target-mask), with interp_info.h5 caching."""
    src_masks, layer_ids = mesh_layer_masks(original_mesh, layers)
    tgt_masks, _ = mesh_layer_masks(new_mesh, list(layer_ids))
    uniq = unique_points_per_layer(new_mesh.points, tgt_masks)

    cache_path = (
        os.path.join(str(stored_array), "interp_info.h5")
        if stored_array is not None
        else None
    )
    ops: Dict[str, TransferOperator] = {}
    # geometry fingerprint + locate semantics form the cache key: the
    # three layered entry points share the same file name but differ in
    # accept tolerance and fallback mode, and a layer selection not in
    # the cached set must rebuild, not KeyError.  Without stored_array
    # there is no cache to guard, so the (GB-scale on big meshes) host
    # hash is skipped entirely.
    sem = f"{accept_tol}/{fallback}/{int(use_aabb)}/{nelem_to_search}"
    fp = (
        content_fingerprint(original_mesh.points, new_mesh.points)
        if cache_path
        else None
    )
    if cache_path and os.path.exists(cache_path):
        with h5py.File(cache_path, "r") as f:
            cached_sem = f.attrs.get("semantics", "")
            if isinstance(cached_sem, bytes):
                cached_sem = cached_sem.decode()
            if int(f.attrs.get("fingerprint", 0)) != fp:
                print(
                    f"Ignoring stored interp_info at {cache_path}: built "
                    "from different geometry"
                )
            elif cached_sem != sem:
                print(
                    f"Ignoring stored interp_info at {cache_path}: built "
                    f"with different locate semantics ({cached_sem!r} != "
                    f"{sem!r})"
                )
            elif not all(f"elements/{l}" in f for l in uniq):
                print(
                    f"Ignoring stored interp_info at {cache_path}: does "
                    "not cover the requested layers"
                )
            else:
                for layer in uniq:
                    op = TransferOperator(
                        elements=f[f"elements/{layer}"][()].astype(np.int32),
                        order=original_mesh.shape_order,
                        recon=uniq[layer][1],
                    )
                    op.weights = f[f"coeffs/{layer}"][()]
                    ops[layer] = op
                return ops, src_masks, tgt_masks

    order = original_mesh.shape_order
    for layer in uniq:
        pts_u, recon = uniq[layer]
        ops[layer] = TransferOperator.build(
            original_mesh.points[src_masks[layer]],
            pts_u,
            order=order,
            cfg=_locate_cfg(nelem_to_search, accept_tol),
            fallback=fallback,
            use_aabb=use_aabb,
            prefilter_m=PREFILTER_M,
            recon=recon,
        )
    if cache_path:
        os.makedirs(str(stored_array), exist_ok=True)
        with h5py.File(cache_path, "w") as f:
            f.attrs["fingerprint"] = np.uint64(fp)
            f.attrs["semantics"] = sem
            for layer, op in ops.items():
                f.create_dataset(f"coeffs/{layer}", data=op.weights)
                f.create_dataset(f"elements/{layer}", data=op.elements)
    return ops, src_masks, tgt_masks


def _layered_apply_and_write(
    original_mesh: sio.SalvusMesh,
    new_mesh: sio.SalvusMesh,
    ops: Dict[str, TransferOperator],
    src_masks: Dict[str, np.ndarray],
    tgt_masks: Dict[str, np.ndarray],
    parameters: List[str],
):
    # all parameters in one device pass per layer, one host pull each
    # (per-(param, layer) applies cost a device->host transfer per call)
    new_fields = {
        p: np.array(_nodal_fields(new_mesh)[p], copy=True)
        for p in parameters
    }
    for layer, op in ops.items():
        src = np.stack(
            [
                _nodal_fields(original_mesh)[p][src_masks[layer]]
                for p in parameters
            ]
        )  # [P, E_layer, n]
        vals = np.asarray(op.apply(src))  # [N_layer, P]
        for i, p in enumerate(parameters):
            tgt = new_fields[p]
            tgt[tgt_masks[layer]] = vals[:, i].reshape(
                tgt[tgt_masks[layer]].shape
            )
    for p in parameters:
        new_mesh.attach_field(name=p, data=new_fields[p])


def gll_2_gll_layered(
    from_gll: PathLike,
    to_gll: PathLike,
    layers,
    nelem_to_search: int = 20,
    parameters="ISO",
    stored_array: PathLike | None = None,
    make_spherical: bool = False,
):
    """Layer-restricted GLL->GLL transfer (reference
    interpolator.py:288-439).  Per-layer candidate search + locate with
    the reference's _check_if_inside_element semantics (AABB prefilter,
    accept tol 1.04, fixed-ref fallback)."""
    original_mesh = _as_salvus(from_gll)
    if make_spherical:
        map_to_sphere(original_mesh)
    if parameters == "all":
        parameters = [
            p for p in _nodal_fields(original_mesh)
            if p != "z_node_1D"
        ]
    parameters = utils.pick_parameters(parameters)
    new_mesh = _as_salvus(to_gll)
    if make_spherical:
        map_to_sphere(new_mesh)

    ops, src_masks, tgt_masks = _layered_operators(
        original_mesh, new_mesh, layers, nelem_to_search, stored_array,
        accept_tol=1.04, fallback="fixed_ref", use_aabb=True,
    )
    _layered_apply_and_write(
        original_mesh, new_mesh, ops, src_masks, tgt_masks, parameters
    )


def gll_2_gll_layered_multi(
    from_gll: PathLike,
    to_gll: PathLike,
    layers="nocore",
    nelem_to_search: int = 20,
    parameters="all",
    threads: int | None = None,
    stored_array: PathLike | None = None,
    make_spherical: bool = False,
):
    """Reference parity alias (interpolator.py:442-618).

    The reference parallelizes layers over a process pool; here every
    layer already runs through the batched device pipeline, so this simply
    delegates (``threads`` accepted and ignored)."""
    del threads
    return gll_2_gll_layered(
        from_gll=from_gll,
        to_gll=to_gll,
        layers=layers,
        nelem_to_search=nelem_to_search,
        parameters=parameters,
        stored_array=stored_array,
        make_spherical=make_spherical,
    )


def gll_2_gll_layered_multi_two(
    from_gll: PathLike,
    to_gll: PathLike,
    layers,
    nelem_to_search: int = 30,
    parameters="all",
    stored_array: PathLike | None = None,
    make_spherical: bool = False,
    tolerance: float = 1.05,
):
    """Layered transfer with the get_element_weights engine per layer
    (reference interpolator.py:980-1082): acceptance ``tolerance``,
    snap-to-nearest fallback."""
    original_mesh = _as_salvus(from_gll)
    if make_spherical:
        map_to_sphere(original_mesh)
    if parameters == "all":
        parameters = [
            p for p in _nodal_fields(original_mesh)
            if p != "z_node_1D"
        ]
    parameters = utils.pick_parameters(parameters)
    new_mesh = _as_salvus(to_gll)
    if make_spherical:
        map_to_sphere(new_mesh)

    ops, src_masks, tgt_masks = _layered_operators(
        original_mesh, new_mesh, layers, nelem_to_search, stored_array,
        accept_tol=tolerance, fallback="snap", use_aabb=False,
    )
    _layered_apply_and_write(
        original_mesh, new_mesh, ops, src_masks, tgt_masks, parameters
    )


# -------------------------------------------------------------------------
# Exodus <-> GLL
# -------------------------------------------------------------------------
def exodus_2_gll(
    mesh: PathLike,
    gll_model: PathLike,
    gll_order: int = 4,
    dimensions: int = 3,
    nelem_to_search: int = 20,
    parameters="TTI",
    model_path: str = "MODEL/data",
    coordinates_path: str = "MODEL/coordinates",
):
    """Exodus (trilinear hexes) -> GLL mesh nodal transfer.

    Replaces the reference's per-GLL-slot C trilinear kernel loop
    (interpolator.py:142-224 + src/trilinearinterpolator.c): all
    npoints * n_gll target nodes are located in one batched device pass
    against the hex corners with the C kernel's acceptance semantics
    (accept 1.025, best-so-far below 1.5).
    """
    from .utils_profile import stage_timer

    exo = eio.Exodus(mesh)
    parameters = utils.pick_parameters(parameters)
    missing = [p for p in parameters if p not in exo.nodal_parameters]
    if missing:
        raise ValueError(
            f"exodus mesh lacks nodal parameters {missing}; "
            f"has {exo.nodal_parameters}"
        )

    with stage_timer("e2g.read_exodus"):
        corner_nodes = exo.canonical_corner_nodes()  # [E, 2^d, d]
        conn = exo.canonical_connectivity()

    with h5py.File(str(gll_model), "r+") as gll:
        with stage_timer("e2g.read_gll_coords"):
            # f32 target coordinates: h5py converts during the read, the
            # host->device upload halves (80 MB/s tunnel), and trilinear
            # (order-1) source accuracy is discretization-limited far
            # above the ~0.5 m f32 position granularity
            coords = np.asarray(gll[coordinates_path][()], np.float32)
        npoints, n_gll, dim = coords.shape

        cfg = LocateConfig(
            nelem_to_search=nelem_to_search, accept_tol=1.025,
            fallback_max=1.5, df32_polish=_df32_default(),
        )
        op = TransferOperator.build(
            corner_nodes,
            coords.reshape(-1, dim),
            order=1,
            cfg=cfg,
            fallback="best",
        )
        n_failed = op.num_missing
        if n_failed:
            raise RuntimeError(
                f"{n_failed} points could not be interpolated."
            )

        # per-node values: gather nodal fields through connectivity and
        # apply all parameters in ONE device pass (a single result pull
        # instead of one slow host transfer per parameter)
        with stage_timer("e2g.gather_fields"):
            fields = np.stack(
                [exo.get_nodal_field(p)[conn] for p in parameters]
            )  # [F, E, 2^d]
        with stage_timer("e2g.apply"):
            # relayout to the HDF5 target layout [npoints, F, n_gll] ON
            # DEVICE and downcast to f32 for the pull: the device->host
            # tunnel on this rig runs ~20 MB/s, so pulling f64 [N, F] and
            # transposing on the ~0.1 Gflop/s host (the previous shape of
            # this code) cost ~80 s at 10M slots; f32 halves the bytes
            # and HDF5 converts f32->f64 in C during the write
            vals_dev = op.apply(fields)  # [N, F]
            out_dev = vals_dev.reshape(
                npoints, n_gll, len(parameters)
            ).transpose(0, 2, 1).astype("float32")
        with stage_timer("e2g.stream_write"):
            sio.recreate_dataset(
                gll, parameters, model_path, coordinates_path
            )
            _stream_pull_write(gll[model_path], out_dev)


def gll_2_exodus(
    gll_model: PathLike,
    exodus_model: PathLike,
    gll_order: int = 4,
    dimensions: int = 3,
    nelem_to_search: int = 20,
    parameters="TTI",
    model_path: str = "MODEL/data",
    coordinates_path: str = "MODEL/coordinates",
    gradient: bool = False,
):
    """GLL -> Exodus nodal transfer (reference interpolator.py:227-285);
    parameter list is read from the GLL file's dimension labels."""
    with h5py.File(str(gll_model), "r") as f:
        gll_points = np.asarray(f[coordinates_path][()], np.float64)
        gll_data = np.asarray(f[model_path][()])
        parameters = sio.read_dim_labels(f[model_path])

    dim = gll_points.shape[2]
    order = int(round(gll_data.shape[2] ** (1.0 / dim))) - 1

    exo = eio.Exodus(exodus_model, mode="a")
    op = TransferOperator.build(
        gll_points,
        exo.points,
        order=order,
        cfg=_locate_cfg(nelem_to_search, accept_tol=1.04),
        fallback="fixed_ref",
        use_aabb=True,
        prefilter_m=PREFILTER_M,
    )
    fields = np.moveaxis(gll_data, 1, 0)  # [P, E, n]
    values = np.asarray(op.apply(fields))  # [N, P] -- ONE host pull
    for i, param in enumerate(parameters):
        exo.attach_field(param, values[:, i])
    return values


def get_element_weights(
    gll_points,
    shape_order: int,
    centroids,
    points,
    nelem_to_search: int = 25,
    tolerance: float = 1.05,
    snap_to_nearest: bool = False,
):
    """(elements, coeffs) for a point cloud -- reference parity wrapper.

    Same contract as the reference's main parallel engine
    (interpolator.py:1147-1255): gll_points [E, n, d], candidate count,
    acceptance tolerance, snap-to-nearest fallback; returns
    (elements [N] with -1 for missing, coeffs [N, n]) as host arrays.
    Instead of a centroid KD-tree this takes the centroids themselves
    (or None to compute them).
    """
    cfg = LocateConfig(nelem_to_search=nelem_to_search,
                       accept_tol=tolerance,
                       df32_polish=_df32_default())
    op = TransferOperator.build(
        gll_points,
        np.asarray(points, np.float64),
        order=shape_order,
        cfg=cfg,
        fallback="snap" if snap_to_nearest else "sentinel",
        prefilter_m=PREFILTER_M,
        centroids=centroids,
    )
    return np.asarray(op.elements), np.asarray(op.weights)


def get_element_weights_layered(
    new_coordinates,
    nearest_elements,
    original_mesh,
    original_mask,
    dimensions: int = 3,
    from_gll_order: int = 2,
):
    """Per-layer (elements, coeffs) dicts -- reference parity wrapper
    (interpolator.py:1258-1334; acceptance tolerance 1.03, sentinel).

    new_coordinates: layer -> (points, recon); nearest_elements: layer ->
    [N_layer, k] candidate ids into the masked element set."""
    cfg = LocateConfig(accept_tol=1.03, df32_polish=_df32_default())
    elems, coeffs = {}, {}
    for layer, (pts, _recon) in new_coordinates.items():
        op = TransferOperator.build(
            original_mesh.points[original_mask[layer]],
            np.asarray(pts, np.float64),
            order=from_gll_order,
            cfg=cfg,
            fallback="sentinel",
            candidates=np.asarray(nearest_elements[layer]),
        )
        elems[layer] = np.asarray(op.elements)
        coeffs[layer] = np.asarray(op.weights)
    return elems, coeffs


def exodus_2_exodus(
    mesh_a: PathLike,
    mesh_b: PathLike,
    parameters="TTI",
    nelem_to_search: int = 20,
):
    """Exodus -> Exodus nodal field transfer (the reference CLI's
    interpolate_mesh_a_to_b path, cli.py:35-104 + the C trilinear kernel):
    locate every node of mesh B inside mesh A's hexes, then one weighted
    gather per parameter."""
    exo_a = eio.Exodus(mesh_a)
    exo_b = eio.Exodus(mesh_b, mode="a")
    parameters = utils.pick_parameters(parameters)
    missing = [p for p in parameters if p not in exo_a.nodal_parameters]
    if missing:
        raise ValueError(
            f"mesh A lacks nodal parameters {missing}; "
            f"has {exo_a.nodal_parameters}"
        )

    cfg = LocateConfig(
        nelem_to_search=nelem_to_search, accept_tol=1.025,
        fallback_max=1.5, df32_polish=_df32_default(),
    )
    op = TransferOperator.build(
        exo_a.canonical_corner_nodes(),
        exo_b.points,
        order=1,
        cfg=cfg,
        fallback="best",
    )
    n_missing = op.num_missing
    if n_missing:
        raise RuntimeError(
            f"{n_missing} points could not be interpolated."
        )
    conn = exo_a.canonical_connectivity()
    # all parameters in ONE device pass + ONE host pull
    fields = np.stack(
        [exo_a.get_nodal_field(p)[conn] for p in parameters]
    )  # [F, E, 2^d]
    vals = np.asarray(op.apply(fields))  # [N, F]
    for i, p in enumerate(parameters):
        exo_b.attach_field(p, vals[:, i])


# -------------------------------------------------------------------------
# Point queries
# -------------------------------------------------------------------------
def query_model(
    coordinates: np.ndarray,
    model: PathLike,
    nelem_to_search: int = 20,
    model_path: str = "MODEL/data",
    coordinates_path: str = "MODEL/coordinates",
):
    """Query a GLL model at lat/lon/depth coordinates -> [N, n_params]
    (reference interpolator.py:60-139)."""
    coordinates = np.asarray(coordinates)
    if coordinates.shape[1] != 3:
        raise ValueError("coordinates must have shape [N, 3] (lat lon depth)")
    points = utils.latlondepth_to_xyz(coordinates)
    src_points, src_data, _params = sio.load_hdf5_params(
        model, model_path, coordinates_path
    )
    dim = src_points.shape[2]
    order = int(round(src_data.shape[2] ** (1.0 / dim))) - 1
    op = TransferOperator.build(
        src_points,
        points,
        order=order,
        cfg=_locate_cfg(nelem_to_search, accept_tol=1.04),
        fallback="fixed_ref",
        use_aabb=True,
        prefilter_m=PREFILTER_M,
    )
    return op.apply(np.moveaxis(src_data, 1, 0))


def interpolate_to_points(
    mesh,
    points: np.ndarray,
    params_to_interp: List[str],
    make_spherical: bool = False,
    cfg: LocateConfig = DEFAULT_LOCATE,
):
    """Mesh -> arbitrary point cloud; zeros for unlocatable points
    (reference interpolator.py:931-977)."""
    mesh = _as_salvus(mesh)
    if make_spherical:
        map_to_sphere(mesh)
    op = TransferOperator.build(
        mesh.points,
        np.asarray(points, np.float64),
        order=mesh.shape_order,
        cfg=cfg,
        fallback="sentinel",
        prefilter_m=PREFILTER_M,
    )
    if op.num_missing:
        print(
            f"{op.num_missing} points could not find an enclosing element. "
            "These points will be set to zero. Please check your domain or "
            "the interpolation tuning parameters"
        )
    fields = np.stack(
        [_nodal_fields(mesh)[p] for p in params_to_interp]
    )
    return op.apply(fields)


def interpolate_to_points_layered(
    from_mesh: PathLike,
    to_mesh: PathLike,
    parameters,
    layers="nocore",
    make_spherical: bool = False,
    nelem_to_search: int = 20,
):
    """Layered, more stable variant writing straight onto ``to_mesh``
    (reference interpolator.py:855-928): sentinel semantics, accept 1.03."""
    original_mesh = _as_salvus(from_mesh)
    if make_spherical:
        map_to_sphere(original_mesh)
    if parameters == "all":
        parameters = [
            p for p in _nodal_fields(original_mesh)
            if p != "z_node_1D"
        ]
    parameters = utils.pick_parameters(parameters)
    new_mesh = _as_salvus(to_mesh)
    if make_spherical:
        map_to_sphere(new_mesh)

    ops, src_masks, tgt_masks = _layered_operators(
        original_mesh, new_mesh, layers, nelem_to_search, None,
        accept_tol=1.03, fallback="sentinel", use_aabb=False,
    )
    num_failed = sum(op.num_missing for op in ops.values())
    _layered_apply_and_write(
        original_mesh, new_mesh, ops, src_masks, tgt_masks, parameters
    )
    if num_failed:
        print(f"{num_failed} points could not be interpolated")


def interpolate_to_mesh(
    old_mesh,
    new_mesh,
    params_to_interp=("VSV", "VSH", "VPV", "VPH"),
):
    """Map both meshes to spheres, interpolate old -> new nodal values,
    write onto the new mesh, restore geometry
    (reference api.py:353-393)."""
    old_mesh = _as_salvus(old_mesh)
    new_mesh = _as_salvus(new_mesh)
    old_pts = old_mesh.points.copy()
    new_pts = new_mesh.points.copy()
    try:
        map_to_sphere(old_mesh)
        map_to_sphere(new_mesh)
        flat = new_mesh.points.reshape(-1, new_mesh.dimensions)
        vals = np.asarray(interpolate_to_points(
            old_mesh, flat, list(params_to_interp)
        ))  # one host pull; per-column pulls cost a transfer each
        for i, p in enumerate(params_to_interp):
            new_mesh.attach_field(
                p, vals[:, i].reshape(new_mesh.nelem, new_mesh.n_gll_points)
            )
    finally:
        old_mesh.points[...] = old_pts
        new_mesh.points[...] = new_pts


def extract_regular_grid(
    mesh,
    parameters: List[str],
    lat_extent: Tuple[float, float, int],
    lon_extent: Tuple[float, float, int],
    depth_extent: Tuple[float, float, int],
) -> utils.RegularGridData:
    """Sample a mesh onto a regular lat/lon/depth grid
    (reference interpolator.py:1600-1646; implemented natively instead of
    delegating to salvus.mesh utilities)."""
    mesh = _as_salvus(mesh)
    lat = np.linspace(lat_extent[0], lat_extent[1], int(lat_extent[2]))
    lon = np.linspace(lon_extent[0], lon_extent[1], int(lon_extent[2]))
    depth = np.linspace(depth_extent[0], depth_extent[1],
                        int(depth_extent[2]))
    ds = utils.create_dataset_grid(lat=lat, lon=lon, depth=depth)

    dd, la, lo = np.meshgrid(depth, lat, lon, indexing="ij")
    lld = np.stack([la.ravel(), lo.ravel(), dd.ravel()], axis=-1)
    points = utils.latlondepth_to_xyz(lld)
    vals = np.asarray(interpolate_to_points(mesh, points, parameters))
    for i, p in enumerate(parameters):
        ds.data[p] = vals[:, i].reshape(len(depth), len(lat), len(lon))
    return ds
