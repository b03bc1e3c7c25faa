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


@dataclasses.dataclass
class TransferOperator:
    """(elements, weights) pair mapping a source mesh onto target points.

    elements: [N] int32 source-element index per target point (-1 missing)
    weights:  [N, (p+1)^d] float interpolation weights
    order:    polynomial order of the source mesh
    recon:    optional [M] reconstruction indices when the operator was
              built on deduplicated unique points (apply_recon expands back)
    """

    elements: np.ndarray
    weights: np.ndarray
    order: int
    recon: np.ndarray | None = None

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
    ) -> "TransferOperator":
        res = _locate(
            target_points,
            source_points,
            order=order,
            cfg=cfg,
            fallback=fallback,
            use_aabb=use_aabb,
            prefilter_m=prefilter_m,
            centroids=centroids,
            candidates=candidates,
        )
        return cls(res.elements, res.weights, order,
                   None if recon is None else np.asarray(recon))

    @property
    def n_points(self) -> int:
        return self.elements.shape[0]

    @property
    def num_missing(self) -> int:
        return int((self.elements < 0).sum())

    def apply(self, fields, expand: bool = True) -> np.ndarray:
        """Apply to one field [E, n] -> [N] or a stack [F, E, n] -> [N, F].

        When the operator was built on unique points and ``expand`` is set,
        the result is reconstructed to the original (duplicated) point
        ordering via ``recon``.
        """
        fields = np.asarray(fields)
        single = fields.ndim == 2
        if single:
            fields = fields[None]
        out = np.asarray(
            _apply_device(
                jnp.asarray(self.elements),
                jnp.asarray(self.weights),
                jnp.asarray(fields),
            )
        )
        if expand and self.recon is not None:
            out = out[self.recon]
        return out[:, 0] if single else out

    # -- persistence ------------------------------------------------------
    def save(self, directory: PathLike):
        """Persist as elements.npy / coeffs.npy (+ recon.npy), the same
        file names the reference uses for its stored_array caches
        (reference interpolator.py:800-810)."""
        directory = str(directory)
        os.makedirs(directory, exist_ok=True)
        np.save(os.path.join(directory, "elements.npy"), self.elements)
        np.save(os.path.join(directory, "coeffs.npy"), self.weights)
        np.save(
            os.path.join(directory, "meta.npy"),
            np.array([self.order], dtype=np.int64),
        )
        if self.recon is not None:
            np.save(os.path.join(directory, "recon.npy"), self.recon)

    @classmethod
    def load(cls, directory: PathLike) -> "TransferOperator":
        directory = str(directory)
        elements = np.load(os.path.join(directory, "elements.npy"))
        weights = np.load(os.path.join(directory, "coeffs.npy"))
        if np.isnan(weights).any():
            # reference refuses NaN-infested caches (interpolator.py:735-740)
            raise ValueError(f"stored coeffs at {directory} contain NaNs")
        meta_path = os.path.join(directory, "meta.npy")
        if os.path.exists(meta_path):
            order = int(np.load(meta_path)[0])
        else:
            dim = 3
            order = int(round(weights.shape[1] ** (1 / dim))) - 1
        recon_path = os.path.join(directory, "recon.npy")
        recon = np.load(recon_path) if os.path.exists(recon_path) else None
        return cls(elements.astype(np.int32), weights, order, recon)

    @staticmethod
    def exists(directory: PathLike) -> bool:
        return os.path.exists(
            os.path.join(str(directory), "coeffs.npy")
        ) and os.path.exists(os.path.join(str(directory), "elements.npy"))
