"""Unique-point deduplication + reconstruction indices.

Adjacent spectral elements share GLL nodes on their faces/edges, so a mesh
of E elements with (p+1)^d nodes each has ~2x fewer *unique* points (order
4).  Locating only the unique points and reconstructing afterwards is the
reference's key work-saver (reference multi_mesh/utils.py:465-515); here
the same contract is provided standalone and per-layer.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


def unique_points(points: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Flatten [E, n, d] (or accept [N, d]) and dedup exactly.

    Returns (unique [U, d], recon [E*n]) with
    ``unique[recon] == points.reshape(-1, d)`` -- the same contract as
    np.unique(..., return_inverse=True, axis=0) which the reference uses
    (utils.py:484-488), but implemented via lexsort (np.unique's axis-0
    path is substantially slower at the 1e7+ point counts we target).
    """
    pts = np.asarray(points)
    if pts.ndim == 3:
        pts = pts.reshape(-1, pts.shape[-1])
    order = np.lexsort(pts.T[::-1])
    spts = pts[order]
    is_new = np.empty(len(spts), dtype=bool)
    is_new[0] = True
    np.any(spts[1:] != spts[:-1], axis=1, out=is_new[1:])
    group = np.cumsum(is_new) - 1
    unique = spts[is_new]
    recon = np.empty(len(pts), dtype=np.int64)
    recon[order] = group
    return unique, recon


def unique_points_per_layer(
    points: np.ndarray, masks: Dict[str, np.ndarray]
) -> Dict[str, Tuple[np.ndarray, np.ndarray]]:
    """Per-layer dedup: layer -> (unique points, reconstruction indices).

    ``points`` [E, n, d]; ``masks`` layer -> boolean [E].  Mirrors the
    mesh path of the reference's get_unique_points (utils.py:503-515).
    """
    return {
        layer: unique_points(points[mask]) for layer, mask in masks.items()
    }
