"""Pallas TPU kernel: fused Newton inverse-map over point blocks.

This is the framework's hot kernel.  The XLA formulation of the batched
Newton solve re-reads every candidate's node coordinates from HBM on every
iteration (20 x ~1.5 KB per point per candidate) and pads the size-3
coordinate axis onto 128-wide vector lanes; measured on a v5e that lands
~8-30x off HBM speed-of-light.  Here instead:

* data is laid out coordinate-major with the *point* axis on the vector
  lanes: nodes [n_nodes, d, C/128, 128], points/refs [d, C/128, 128];
* a grid over blocks of 1024 points (an [8, 128] VPU tile per vector)
  streams each block's candidate nodes into VMEM **once** and runs the
  entire fixed Newton schedule there -- per-iteration HBM traffic drops to
  zero;
* the per-node basis products are unrolled at trace time (static orders
  1/2/4), so the whole iteration is straight-line VPU code.

Precision: the kernel is pure f32, but it consumes *pre-centered* element
nodes -- (nodes - element_center) / element_scale computed once in f64 --
so the f32 lattice is exact to ~1e-7 of the element size and the recovered
reference coordinates carry ~1e-7 accuracy at Earth-scale coordinates
(enough for the <1e-6 field-accuracy target; see core.shape for the f64
path used on hosts).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import gll

# Points per kernel invocation: one [8, 128] tile per vector register.
BLOCK = 1024
_SUBLANES = 8
_LANES = 128


def _lagrange_consts(order: int):
    nodes, _ = gll.gll_nodes(order)
    bary = gll.barycentric_weights(order)
    return (
        [float(x) for x in nodes],
        [float(w) for w in bary],
    )


def _eval_lagrange(x, nodes, bary):
    """Cardinal values and derivatives at x ([8,128] tile) -> two lists of
    n1 tiles.  Product form, fully unrolled."""
    n1 = len(nodes)
    diffs = [x - nodes[j] for j in range(n1)]
    vals = []
    ders = []
    for i in range(n1):
        prod = None
        for j in range(n1):
            if j == i:
                continue
            prod = diffs[j] if prod is None else prod * diffs[j]
        if prod is None:  # n1 == 1 cannot happen (order >= 1)
            prod = jnp.ones_like(x)
        vals.append(bary[i] * prod)
        total = None
        for k in range(n1):
            if k == i:
                continue
            term = None
            for j in range(n1):
                if j == i or j == k:
                    continue
                term = diffs[j] if term is None else term * diffs[j]
            if term is None:
                term = jnp.ones_like(x)
            total = term if total is None else total + term
        ders.append(bary[i] * total)
    return vals, ders


def _make_kernel(order: int, dim: int, iters: int, clamp: float):
    nodes1d, bary = _lagrange_consts(order)
    n1 = order + 1
    n_nodes = n1**dim

    def kernel(nodes_ref, pts_ref, ref_out, res_out):
        # NOTE: node tiles are loaded from the VMEM ref at point of use
        # (nodes_ref[m, a]); materializing the whole [n_nodes, dim, 8, 128]
        # block as one array value would need ~375 live vector registers
        # and drown the kernel in spills.
        pts = [pts_ref[a] for a in range(dim)]  # dim x [8, 128]

        def body(_, carry):
            ref = carry
            ls, ds_ = [], []
            for a in range(dim):
                v, dv = _eval_lagrange(ref[a], nodes1d, bary)
                ls.append(v)
                ds_.append(dv)

            # accumulate x(ref) and J = dx/dref over all lattice nodes
            x = [None] * dim
            jac = [[None] * dim for _ in range(dim)]  # jac[xd][rd]

            def acc(dst, term):
                return term if dst is None else dst + term

            if dim == 3:
                for i in range(n1):
                    for j in range(n1):
                        li_lj = ls[0][i] * ls[1][j]
                        di_lj = ds_[0][i] * ls[1][j]
                        li_dj = ls[0][i] * ds_[1][j]
                        for k in range(n1):
                            m = (i * n1 + j) * n1 + k
                            N = li_lj * ls[2][k]
                            g0 = di_lj * ls[2][k]
                            g1 = li_dj * ls[2][k]
                            g2 = li_lj * ds_[2][k]
                            for a in range(3):
                                nda = nodes_ref[m, a]
                                x[a] = acc(x[a], N * nda)
                                jac[a][0] = acc(jac[a][0], g0 * nda)
                                jac[a][1] = acc(jac[a][1], g1 * nda)
                                jac[a][2] = acc(jac[a][2], g2 * nda)
            else:
                for i in range(n1):
                    for j in range(n1):
                        m = i * n1 + j
                        N = ls[0][i] * ls[1][j]
                        g0 = ds_[0][i] * ls[1][j]
                        g1 = ls[0][i] * ds_[1][j]
                        for a in range(2):
                            nda = nodes_ref[m, a]
                            x[a] = acc(x[a], N * nda)
                            jac[a][0] = acc(jac[a][0], g0 * nda)
                            jac[a][1] = acc(jac[a][1], g1 * nda)

            r = [pts[a] - x[a] for a in range(dim)]

            if dim == 3:
                a_ = jac
                c00 = a_[1][1] * a_[2][2] - a_[1][2] * a_[2][1]
                c01 = a_[0][2] * a_[2][1] - a_[0][1] * a_[2][2]
                c02 = a_[0][1] * a_[1][2] - a_[0][2] * a_[1][1]
                c10 = a_[1][2] * a_[2][0] - a_[1][0] * a_[2][2]
                c11 = a_[0][0] * a_[2][2] - a_[0][2] * a_[2][0]
                c12 = a_[0][2] * a_[1][0] - a_[0][0] * a_[1][2]
                c20 = a_[1][0] * a_[2][1] - a_[1][1] * a_[2][0]
                c21 = a_[0][1] * a_[2][0] - a_[0][0] * a_[2][1]
                c22 = a_[0][0] * a_[1][1] - a_[0][1] * a_[1][0]
                det = a_[0][0] * c00 + a_[0][1] * c10 + a_[0][2] * c20
                inv = jnp.where(det == 0.0, 0.0, 1.0 / jnp.where(
                    det == 0.0, 1.0, det))
                step = [
                    (c00 * r[0] + c01 * r[1] + c02 * r[2]) * inv,
                    (c10 * r[0] + c11 * r[1] + c12 * r[2]) * inv,
                    (c20 * r[0] + c21 * r[1] + c22 * r[2]) * inv,
                ]
            else:
                det = jac[0][0] * jac[1][1] - jac[0][1] * jac[1][0]
                inv = jnp.where(det == 0.0, 0.0, 1.0 / jnp.where(
                    det == 0.0, 1.0, det))
                step = [
                    (jac[1][1] * r[0] - jac[0][1] * r[1]) * inv,
                    (jac[0][0] * r[1] - jac[1][0] * r[0]) * inv,
                ]

            new_ref = []
            for a in range(dim):
                s = jnp.where(jnp.isfinite(step[a]), step[a], 0.0)
                new_ref.append(jnp.clip(ref[a] + s, -clamp, clamp))
            return tuple(new_ref)

        ref0 = tuple(jnp.zeros_like(pts[a]) for a in range(dim))
        # int32 bounds: with jax x64 enabled a python-int loop counter
        # becomes i64, which Mosaic cannot legalize
        ref = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(iters), body, ref0
        )

        # final residual at the converged iterate (coordinates are in the
        # unit-element frame, so this is directly comparable to rtol)
        ls = [
            _eval_lagrange(ref[a], nodes1d, bary)[0] for a in range(dim)
        ]
        x = [None] * dim
        if dim == 3:
            for i in range(n1):
                for j in range(n1):
                    lij = ls[0][i] * ls[1][j]
                    for k in range(n1):
                        m = (i * n1 + j) * n1 + k
                        N = lij * ls[2][k]
                        for a in range(3):
                            t = N * nodes_ref[m, a]
                            x[a] = t if x[a] is None else x[a] + t
        else:
            for i in range(n1):
                for j in range(n1):
                    m = i * n1 + j
                    N = ls[0][i] * ls[1][j]
                    for a in range(2):
                        t = N * nodes_ref[m, a]
                        x[a] = t if x[a] is None else x[a] + t
        res = None
        for a in range(dim):
            e = jnp.abs(pts[a] - x[a])
            res = e if res is None else jnp.maximum(res, e)

        for a in range(dim):
            ref_out[a] = ref[a]
        res_out[0] = res

    return kernel


def _rows_feature_pad(order: int, dim: int) -> int:
    """Lane-padded feature width of a row-major node block."""
    n_nodes = (order + 1) ** dim
    return -(-(n_nodes * dim) // _LANES) * _LANES


class _ScratchNodesView:
    """Adapter letting the shared kernel body read node tiles from the
    transposed scratch buffer with the same ``nodes_ref[m, a]`` indexing
    it uses on the pre-transposed input layout."""

    def __init__(self, ref, dim):
        self._ref = ref
        self._dim = dim

    def __getitem__(self, ma):
        m, a = ma
        return self._ref[m * self._dim + a]


def _make_rows_kernel(order: int, dim: int, iters: int, clamp: float):
    base = _make_kernel(order, dim, iters, clamp)
    Fp = _rows_feature_pad(order, dim)

    def kernel(nrows_ref, pts_ref, ref_out, res_out, nt_scratch):
        # [BLOCK, Fp] row-major block -> [Fp, 8, 128] point-lanes layout,
        # transposed once in VMEM (the XLU does this at register speed;
        # doing it globally in HBM costs ~2x the Newton kernel itself)
        nt = nrows_ref[...]
        nt_scratch[...] = jnp.transpose(nt, (1, 0)).reshape(
            Fp, _SUBLANES, _LANES
        )
        base(_ScratchNodesView(nt_scratch, dim), pts_ref, ref_out, res_out)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("order", "dim", "iters", "clamp", "interpret")
)
def newton_refs_rows(
    nodes_rows,
    points_t,
    order: int,
    dim: int,
    iters: int = 20,
    clamp: float = 8.0,
    interpret: bool = False,
):
    """Batched inverse map from ROW-MAJOR gathered nodes.

    nodes_rows: [C, Fp] f32 -- row i holds point i's pre-centered element
                nodes flattened as ``m * dim + a`` and zero-padded to the
                lane width (``_rows_feature_pad``).  This is the layout a
                plain XLA row gather produces for free; the expensive
                [C, n, d] -> [n, d, C] HBM transpose of ``newton_refs``'s
                input is replaced by a per-block VMEM transpose here.
    points_t:   [dim, R, 128] f32 pre-centered points (R = C/128, R a
                multiple of 8).
    Returns (refs [dim, R, 128], residual [R, 128]).
    """
    R = points_t.shape[1]
    assert R % _SUBLANES == 0, f"row count {R} must be a multiple of 8"
    Fp = _rows_feature_pad(order, dim)
    assert nodes_rows.shape == (R * _LANES, Fp), (
        nodes_rows.shape, (R * _LANES, Fp))
    grid = (R // _SUBLANES,)
    kernel = _make_rows_kernel(order, dim, iters, clamp)
    zero = np.int32(0)
    refs, res = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((dim, R, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((1, R, _LANES), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (BLOCK, Fp),
                lambda i: (i, zero),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (dim, _SUBLANES, _LANES),
                lambda i: (zero, i, zero),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (dim, _SUBLANES, _LANES),
                lambda i: (zero, i, zero),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, _SUBLANES, _LANES),
                lambda i: (zero, i, zero),
                memory_space=pltpu.VMEM,
            ),
        ),
        scratch_shapes=[pltpu.VMEM((Fp, _SUBLANES, _LANES), jnp.float32)],
        interpret=interpret,
    )(nodes_rows, points_t)
    return refs, res[0]


@functools.partial(
    jax.jit, static_argnames=("order", "dim", "iters", "clamp", "interpret")
)
def newton_refs(
    nodes_t,
    points_t,
    order: int,
    dim: int,
    iters: int = 20,
    clamp: float = 8.0,
    interpret: bool = False,
):
    """Batched inverse map via the fused kernel.

    nodes_t:  [n_nodes, dim, R, 128] f32 pre-centered element nodes
    points_t: [dim, R, 128] f32 pre-centered points
    (R = C/128, R a multiple of 8).  Returns (refs [dim, R, 128],
    residual [R, 128]) where residual is the post-iteration max-abs
    mismatch in the unit-element frame.
    """
    n_nodes = (order + 1) ** dim
    R = points_t.shape[1]
    assert R % _SUBLANES == 0, f"row count {R} must be a multiple of 8"
    grid = (R // _SUBLANES,)
    kernel = _make_kernel(order, dim, iters, clamp)
    # index maps return explicit int32 zeros: the package enables jax x64
    # globally, which would otherwise make the literal block offsets i64
    # scalars Mosaic cannot legalize (numpy scalar, not a tracer: index
    # maps must not capture traced values)
    zero = np.int32(0)
    refs, res = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((dim, R, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((1, R, _LANES), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (n_nodes, dim, _SUBLANES, _LANES),
                lambda i: (zero, zero, i, zero),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (dim, _SUBLANES, _LANES),
                lambda i: (zero, i, zero),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (dim, _SUBLANES, _LANES),
                lambda i: (zero, i, zero),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, _SUBLANES, _LANES),
                lambda i: (zero, i, zero),
                memory_space=pltpu.VMEM,
            ),
        ),
        interpret=interpret,
    )(nodes_t, points_t)
    return refs, res[0]