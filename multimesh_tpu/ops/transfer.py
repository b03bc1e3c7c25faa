"""The sparse transfer operator: build once, apply as gather + einsum.

This is the framework's central abstraction.  The reference's single most
important behavior is "precompute the (elements, coefficients) pair once,
reuse forever" -- its ``stored_array`` caches (.npy pair at reference
multi_mesh/components/interpolator.py:724-740,797-810 and the layered
``interp_info.h5`` at :342-349,:391-398) -- but it keeps that pair
implicit inside each transfer function.  Here it is a first-class object:

    op = TransferOperator.build(src_points, tgt_points, order, ...)
    vals = op.apply(fields)          # device gather + weighted reduction
    op.save(dir); TransferOperator.load(dir)

``apply`` is a jitted gather + einsum; with F params it moves
N * (p+1)^d * F * itemsize bytes -- pure HBM-bandwidth work on TPU.
"""
from __future__ import annotations

import dataclasses
import functools
import os
import pathlib
from typing import Union

import jax
import jax.numpy as jnp
import numpy as np

from ..config import LocateConfig, DEFAULT_LOCATE
from ..search.locate import locate as _locate

PathLike = Union[str, pathlib.Path]


# Ties a saved transfer operator to the exact source/target geometry it
# was built from: two different meshes with equal point counts must never
# reuse each other's cached weights (the reference's name-only .npy
# caches have exactly that failure mode).  Memory-speed digest -- see
# multimesh_tpu.hashing (blake2b over every byte runs ~16 MB/s on this
# rig; a 10M-point f64 target would cost ~15 s per transfer).
from ..hashing import content_fingerprint  # noqa: E402,F401


@functools.partial(jax.jit, static_argnames=())
def _apply_device(elements, weights, fields):
    """elements [N], weights [N, n], fields [F, E, n] -> [N, F].

    Element -1 (not found) produces 0, matching the reference's zero-fill
    for unlocatable points (reference interpolator.py:963-970).
    """
    safe = jnp.maximum(elements, 0)
    gathered = fields[:, safe, :]  # [F, N, n]
    vals = jnp.einsum("fnk,nk->nf", gathered, weights)
    return jnp.where((elements >= 0)[:, None], vals, 0.0)


@functools.partial(jax.jit, static_argnames=("order",))
def _apply_device_refs(elements, refs, found, fields, order):
    """Fused apply: basis weights recomputed from ref coords on the fly
    (the [N, n] weights matrix never materializes in HBM)."""
    from ..core import gll

    weights = gll.tensor_basis(order, refs.astype(fields.dtype))
    weights = jnp.where(found[:, None], weights, 0.0)
    safe = jnp.maximum(elements, 0)
    gathered = fields[:, safe, :]
    vals = jnp.einsum("fnk,nk->nf", gathered, weights)
    return jnp.where((elements >= 0)[:, None], vals, 0.0)


@dataclasses.dataclass
class TransferOperator:
    """(elements, weights) pair mapping a source mesh onto target points.

    elements: [N] int32 source-element index per target point (-1 missing)
    weights:  [N, (p+1)^d] float interpolation weights
    order:    polynomial order of the source mesh
    recon:    optional [M] reconstruction indices when the operator was
              built on deduplicated unique points (apply_recon expands back)
    """

    elements: np.ndarray  # device or host array
    order: int
    refs: np.ndarray | None = None   # [N, d] ref coords (compact form)
    found: np.ndarray | None = None  # [N] bool
    recon: np.ndarray | None = None
    _weights: np.ndarray | None = None  # explicit weights (loaded caches)
    # df32 pair residuals of refs (LocateConfig.df32_polish): when
    # present, apply() runs the fused compensated-df32 kernel for
    # f64-grade values at near-f32 cost (search/pallas_df32.py)
    refs_lo: np.ndarray | None = None

    @property
    def weights(self):
        """[N, (p+1)^d] weights; materialized lazily from refs.  With a
        df32-polished operator the pair refs combine to f64 first, so
        saved caches keep the full pair precision."""
        if self._weights is not None:
            return self._weights
        from ..core import gll

        refs = jnp.asarray(self.refs)
        if self.refs_lo is not None:
            refs = refs.astype(jnp.float64) + jnp.asarray(
                self.refs_lo, jnp.float64
            )
        w = gll.tensor_basis(self.order, refs)
        if self.found is not None:
            w = jnp.where(jnp.asarray(self.found)[:, None], w, 0.0)
        return w

    @weights.setter
    def weights(self, value):
        self._weights = value

    @classmethod
    def build(
        cls,
        source_points,
        target_points,
        order: int,
        cfg: LocateConfig = DEFAULT_LOCATE,
        *,
        fallback: str = "sentinel",
        use_aabb: bool = False,
        prefilter_m: int = 0,
        centroids=None,
        candidates=None,
        recon=None,
        engine: str = "auto",
    ) -> "TransferOperator":
        from ..utils_profile import stage_timer

        with stage_timer("operator.build") as t:
            res = cls._build_locate(
                source_points, target_points, order, cfg, fallback,
                use_aabb, prefilter_m, centroids, candidates, engine,
            )
            t.sync(res.elements)
        return cls(
            elements=res.elements,
            order=order,
            refs=res.refs,
            found=res.found,
            recon=None if recon is None else jnp.asarray(recon),
            refs_lo=res.refs_lo,
        )

    @staticmethod
    def _build_locate(source_points, target_points, order, cfg, fallback,
                      use_aabb, prefilter_m, centroids, candidates,
                      engine):
        return _locate(
            target_points,
            source_points,
            order=order,
            cfg=cfg,
            fallback=fallback,
            use_aabb=use_aabb,
            prefilter_m=prefilter_m,
            centroids=centroids,
            candidates=candidates,
            engine=engine,
            want_weights=False,
        )

    @property
    def n_points(self) -> int:
        return self.elements.shape[0]

    @property
    def num_missing(self) -> int:
        return int(jnp.sum(jnp.asarray(self.elements) < 0))

    def apply(self, fields, expand: bool = True,
              chunk: int = 1_048_576,
              out_chunks: bool = False) -> np.ndarray:
        """Apply to one field [E, n] -> [N] or a stack [F, E, n] -> [N, F].

        When the operator was built on unique points and ``expand`` is set,
        the result is reconstructed to the original (duplicated) point
        ordering via ``recon``.  The result is a DEVICE array; call
        np.asarray(...) to bring it to the host (file write-back paths do).

        The gather is computed at the weights' dtype (f32 for the pallas
        engine, f64 for the xla engine -- matching the accuracy the
        location stage delivered) and chunked over points to bound the
        [F, chunk, n] gather buffer.

        ``out_chunks=True`` returns ``(chunks, chunk)`` -- the list of
        per-chunk DEVICE arrays (row ranges ``[i*chunk, (i+1)*chunk)``,
        un-expanded) instead of one concatenated array, so file paths can
        stream chunk pulls over the slow host tunnel while earlier rows
        are already being expanded and written (``expand`` is ignored).
        """
        fields = jnp.asarray(fields)
        single = fields.ndim == 2
        if single:
            fields = fields[None]
        elements = jnp.asarray(self.elements)
        N = elements.shape[0]
        if self._weights is not None:
            weights = jnp.asarray(self._weights)
            fields = fields.astype(weights.dtype)
            outs = [
                _apply_device(
                    elements[s:s + chunk], weights[s:s + chunk], fields
                )
                for s in range(0, N, chunk)
            ]
        elif self.refs_lo is not None:
            outs = self._apply_df32(fields, elements, chunk)
        else:
            refs = jnp.asarray(self.refs)
            found = (
                jnp.asarray(self.found)
                if self.found is not None
                else jnp.ones((N,), bool)
            )
            fields = fields.astype(refs.dtype)
            outs = [
                _apply_device_refs(
                    elements[s:s + chunk], refs[s:s + chunk],
                    found[s:s + chunk], fields, self.order,
                )
                for s in range(0, N, chunk)
            ]
        if out_chunks:
            return outs, chunk
        out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
        if expand and self.recon is not None:
            out = out[jnp.asarray(self.recon)]
        return out[:, 0] if single else out

    def _apply_df32(self, fields, elements, chunk):
        """Compensated-df32 apply: pair-precision weights from the
        polished (refs, refs_lo) dotted with split-f32 fields in the
        fused Pallas kernel -- f64-grade values with no emulated-f64 op
        anywhere in the per-point path (the final hi+lo combine is one
        add per output value)."""
        from ..search import pallas_df32 as pd32
        from ..search.locate import default_engine

        refs = jnp.asarray(self.refs, jnp.float32)
        refs_lo = jnp.asarray(self.refs_lo, jnp.float32)
        N, dim = refs.shape
        F = fields.shape[0]
        frows_hi, frows_lo = pd32.prepare_field_rows(
            fields, self.order, dim
        )
        interpret = default_engine() != "pallas"
        outs = []
        for s in range(0, N, chunk):
            el = elements[s:s + chunk]
            n = el.shape[0]
            bucket = max(pd32.BLOCK, 1 << max(0, (n - 1)).bit_length())

            def pad(x):
                if bucket == n:
                    return x
                return jnp.concatenate(
                    [x, jnp.repeat(x[:1], bucket - n, axis=0)]
                )

            safe = pad(jnp.maximum(el, 0))
            vh, vl = pd32.apply_pairs(
                pad(refs[s:s + chunk]), pad(refs_lo[s:s + chunk]),
                frows_hi[safe], frows_lo[safe],
                order=self.order, dim=dim, n_params=F,
                interpret=interpret,
            )
            vals = vh[:n].astype(jnp.float64) + vl[:n].astype(
                jnp.float64
            )
            outs.append(jnp.where((el >= 0)[:, None], vals, 0.0))
        return outs

    # -- persistence ------------------------------------------------------
    def save(self, directory: PathLike, fingerprint: int | None = None,
             dense: bool = False):
        """Persist the operator.

        Default (compact) format: elements.npy + refs.npy (+ found.npy,
        refs_lo.npy, recon.npy) -- the [N, d] reference coordinates the
        operator already carries, ~(p+1)^d/d smaller than the dense
        weights (a 100M-point order-4 operator is ~2.5 GB instead of
        ~100 GB), with the weights re-materialized lazily on load.

        ``dense=True`` writes the reference-compatible elements.npy /
        coeffs.npy pair instead (the file names the reference's
        stored_array caches use, reference interpolator.py:800-810) so
        external tooling expecting dense coefficients keeps working.

        ``fingerprint`` (see content_fingerprint) is stored in meta.npy
        so ``load`` can refuse a cache built from different geometry."""
        directory = str(directory)
        os.makedirs(directory, exist_ok=True)
        np.save(os.path.join(directory, "elements.npy"),
                np.asarray(self.elements))
        # explicitly-assigned weights (legacy loads, user edits) take
        # precedence: the refs may no longer describe them
        if self.refs is not None and self._weights is None and not dense:
            np.save(os.path.join(directory, "refs.npy"),
                    np.asarray(self.refs))
            found = (
                np.asarray(self.found)
                if self.found is not None
                else np.ones((self.n_points,), bool)
            )
            np.save(os.path.join(directory, "found.npy"), found)
            if self.refs_lo is not None:
                np.save(os.path.join(directory, "refs_lo.npy"),
                        np.asarray(self.refs_lo))
        else:
            np.save(os.path.join(directory, "coeffs.npy"),
                    np.asarray(self.weights))  # materializes from refs
        np.save(
            os.path.join(directory, "meta.npy"),
            np.array([self.order, 0 if fingerprint is None else fingerprint],
                     dtype=np.uint64),
        )
        if self.recon is not None:
            np.save(os.path.join(directory, "recon.npy"),
                    np.asarray(self.recon))

    @classmethod
    def load(cls, directory: PathLike,
             fingerprint: int | None = None) -> "TransferOperator":
        """Load a saved operator (compact refs format or legacy/export
        dense coeffs format, auto-detected).  When ``fingerprint`` is
        given, the cache must carry the same value (saved from the same
        source and target geometry) -- a cache without one, or with a
        different one, raises ValueError so callers rebuild instead of
        silently applying another mesh's weights."""
        directory = str(directory)
        elements = np.load(os.path.join(directory, "elements.npy"))
        refs_path = os.path.join(directory, "refs.npy")
        compact = os.path.exists(refs_path)
        if compact:
            refs = np.load(refs_path)
            if not np.isfinite(refs).all():
                raise ValueError(
                    f"stored refs at {directory} contain non-finite values"
                )
            found = np.load(os.path.join(directory, "found.npy"))
            lo_path = os.path.join(directory, "refs_lo.npy")
            refs_lo = np.load(lo_path) if os.path.exists(lo_path) else None
            weights = None
        else:
            weights = np.load(os.path.join(directory, "coeffs.npy"))
            if np.isnan(weights).any():
                # reference refuses NaN caches (interpolator.py:735-740)
                raise ValueError(
                    f"stored coeffs at {directory} contain NaNs"
                )
        meta_path = os.path.join(directory, "meta.npy")
        stored_fp = None
        if os.path.exists(meta_path):
            meta = np.load(meta_path)
            order = int(meta[0])
            if meta.shape[0] > 1 and int(meta[1]) != 0:
                stored_fp = int(np.asarray(meta, np.uint64)[1])
        elif compact:
            raise ValueError(
                f"compact operator at {directory} lacks meta.npy (order)"
            )
        else:
            dim = 3
            order = int(round(weights.shape[1] ** (1 / dim))) - 1
        if fingerprint is not None and stored_fp != fingerprint:
            raise ValueError(
                f"stored operator at {directory} was built from different "
                f"geometry (fingerprint {stored_fp} != {fingerprint})"
            )
        recon_path = os.path.join(directory, "recon.npy")
        recon = np.load(recon_path) if os.path.exists(recon_path) else None
        if compact:
            return cls(elements=elements.astype(np.int32), order=order,
                       refs=refs, found=found, refs_lo=refs_lo,
                       recon=recon)
        op = cls(elements=elements.astype(np.int32), order=order,
                 recon=recon)
        op._weights = weights
        return op

    @staticmethod
    def exists(directory: PathLike) -> bool:
        d = str(directory)
        return os.path.exists(os.path.join(d, "elements.npy")) and (
            os.path.exists(os.path.join(d, "coeffs.npy"))
            or os.path.exists(os.path.join(d, "refs.npy"))
        )
