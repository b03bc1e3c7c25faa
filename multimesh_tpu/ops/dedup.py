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


# NOTE on a measured dead end: a device-side dedup (jnp.lexsort +
# neighbor-compare + stable-argsort compaction, exact twin of the host
# path) was prototyped here to kill the ~8 s host lexsort the 10M-point
# gll_2_gll pays.  On XLA:TPU (v5e, x64 enabled) it is BOTH ~580x
# slower (818 s at 1.2M x 3 f64 -- the variadic f64 sort lowers to an
# emulated comparator over a 42x lane-padded [N, 3] layout) and WRONG
# (56% of unique rows disagreed with the host result: duplicate rows
# come out non-adjacent, i.e. the emulated f64 comparator does not
# order exact duplicates next to each other).  The host lexsort stays;
# repeated transfers against one target amortize it through the
# layered interp_info / stored_array caches.


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
