"""ctypes bindings for the native host runtime (native/libmmt_native.so).

The shared library is built with ``make -C native`` at the repo root (or
anywhere; set MMT_NATIVE_LIB to its path).  All functions are batched and
operate on contiguous float64/int64 numpy arrays.  The native runtime is
the host-side validation oracle and fallback for the device engine --
the reference's ctypes loader pattern (reference multi_mesh/helpers.py)
served a similar role for its C kernels.
"""
from __future__ import annotations

import ctypes as C
import os
import pathlib

import numpy as np

_cache: list = []

_F64_1 = np.ctypeslib.ndpointer(np.float64, ndim=1, flags="C_CONTIGUOUS")
_F64_2 = np.ctypeslib.ndpointer(np.float64, ndim=2, flags="C_CONTIGUOUS")
_F64_3 = np.ctypeslib.ndpointer(np.float64, ndim=3, flags="C_CONTIGUOUS")
_I64_1 = np.ctypeslib.ndpointer(np.int64, ndim=1, flags="C_CONTIGUOUS")
_I64_2 = np.ctypeslib.ndpointer(np.int64, ndim=2, flags="C_CONTIGUOUS")
_U8_1 = np.ctypeslib.ndpointer(np.uint8, ndim=1, flags="C_CONTIGUOUS")


def _lib_path() -> pathlib.Path | None:
    env = os.environ.get("MMT_NATIVE_LIB")
    if env:
        if not os.path.exists(env):
            # an explicitly requested library must not silently fall
            # back to the repo default (the user would validate against
            # the wrong binary)
            raise FileNotFoundError(
                f"MMT_NATIVE_LIB={env!r} does not exist"
            )
        return pathlib.Path(env)
    root = pathlib.Path(__file__).resolve().parents[2]
    cand = root / "native" / "libmmt_native.so"
    return cand if cand.exists() else None


def available() -> bool:
    return _lib_path() is not None


def load():
    if _cache:
        return _cache[0]
    path = _lib_path()
    if path is None:
        raise FileNotFoundError(
            "libmmt_native.so not built; run `make -C native` at the repo "
            "root or set MMT_NATIVE_LIB"
        )
    lib = C.CDLL(str(path))

    lib.mmt_centroids.restype = None
    lib.mmt_centroids.argtypes = [
        C.c_int64, C.c_int64, C.c_int64, _I64_2, _F64_2, _F64_2,
    ]
    lib.mmt_gll_basis.restype = None
    lib.mmt_gll_basis.argtypes = [
        C.c_int64, C.c_int32, C.c_int32, _F64_2, _F64_2,
    ]
    lib.mmt_inverse_map.restype = None
    lib.mmt_inverse_map.argtypes = [
        C.c_int64, C.c_int32, C.c_int32, _F64_3, _F64_2, C.c_int32,
        C.c_double, _F64_2, _U8_1,
    ]
    lib.mmt_locate.restype = C.c_int64
    lib.mmt_locate.argtypes = [
        C.c_int64, C.c_int64, C.c_int64, C.c_int32, C.c_int32, _F64_2,
        _I64_2, _F64_3, C.c_double, C.c_int32, C.c_double, C.c_double,
        C.c_int32, C.c_double, _I64_1, _F64_2, _F64_2,
    ]
    _cache.append(lib)
    return lib


def centroids(connectivity: np.ndarray, points: np.ndarray) -> np.ndarray:
    lib = load()
    conn = np.ascontiguousarray(connectivity, np.int64)
    pts = np.ascontiguousarray(points, np.float64)
    out = np.empty((conn.shape[0], pts.shape[1]))
    lib.mmt_centroids(conn.shape[0], conn.shape[1], pts.shape[1], conn,
                      pts, out)
    return out


# the C runtime's Basis1D uses fixed stack storage (kMaxOrder = 8 in
# native/src/mmt_native.cpp); out-of-range orders must fail loudly here,
# never reach the kernels
_MAX_ORDER = 8


def _check_order(order: int):
    if not 1 <= int(order) <= _MAX_ORDER:
        raise ValueError(
            f"order must be in [1, {_MAX_ORDER}], got {order}"
        )


def gll_basis(order: int, ref: np.ndarray) -> np.ndarray:
    _check_order(order)
    lib = load()
    ref = np.ascontiguousarray(ref, np.float64)
    n, dim = ref.shape
    out = np.empty((n, (order + 1) ** dim))
    lib.mmt_gll_basis(n, order, dim, ref, out)
    return out


def inverse_map(
    elem_nodes: np.ndarray,
    points: np.ndarray,
    order: int,
    max_iter: int = 50,
    rtol: float = 1e-12,
):
    _check_order(order)
    lib = load()
    nodes = np.ascontiguousarray(elem_nodes, np.float64)
    pts = np.ascontiguousarray(points, np.float64)
    n, dim = pts.shape
    # the C kernels index without bounds checks: mismatched shapes must
    # fail loudly here, not as OOB reads
    if nodes.shape[0] != n:
        raise ValueError(
            f"elem_nodes has {nodes.shape[0]} rows for {n} points"
        )
    if nodes.shape[1] != (order + 1) ** dim:
        raise ValueError(
            f"elem_nodes has {nodes.shape[1]} nodes/element, expected "
            f"{(order + 1) ** dim} for order {order} in {dim}D"
        )
    refs = np.empty((n, dim))
    conv = np.empty(n, np.uint8)
    lib.mmt_inverse_map(n, order, dim, nodes, pts, max_iter, rtol, refs,
                        conv)
    return refs, conv.astype(bool)


_FALLBACK_MODES = {"sentinel": 0, "snap": 1, "best": 2}


def locate(
    points: np.ndarray,
    candidates: np.ndarray,
    all_nodes: np.ndarray,
    order: int,
    accept_tol: float = 1.05,
    fallback: str = "sentinel",
    snap_clip: float = 1.02,
    fallback_max: float = 1.5,
    max_iter: int = 50,
    rtol: float = 1e-12,
):
    """Candidate-scan locate; returns (elements, refs, weights, n_failed)."""
    _check_order(order)
    lib = load()
    pts = np.ascontiguousarray(points, np.float64)
    cand = np.ascontiguousarray(candidates, np.int64)
    nodes = np.ascontiguousarray(all_nodes, np.float64)
    n, dim = pts.shape
    nn = (order + 1) ** dim
    # the C kernel indexes all_nodes by candidate id without bounds
    # checks: validate here so bad inputs raise instead of reading OOB
    if nodes.shape[1] != nn:
        raise ValueError(
            f"all_nodes has {nodes.shape[1]} nodes/element, expected "
            f"{nn} for order {order} in {dim}D"
        )
    if cand.shape[0] != n:
        raise ValueError(
            f"candidates has {cand.shape[0]} rows for {n} points"
        )
    if cand.size and (cand.min() < 0 or cand.max() >= nodes.shape[0]):
        raise ValueError(
            f"candidate ids outside [0, {nodes.shape[0]})"
        )
    elements = np.empty(n, np.int64)
    refs = np.empty((n, dim))
    weights = np.empty((n, nn))
    failed = lib.mmt_locate(
        n, cand.shape[1], nodes.shape[0], order, dim, pts, cand, nodes,
        accept_tol, _FALLBACK_MODES[fallback], snap_clip, fallback_max,
        max_iter, rtol, elements, refs, weights,
    )
    return elements, refs, weights, int(failed)
