"""Pallas TPU kernels for double-f32 accuracy: ref-coord polish + fused
compensated apply.

The bulk pipeline (`pallas_newton`) is pure f32 and plateaus at ~1e-7
reference-coordinate / field accuracy -- enough for the <1e-6 target but
with thin margin, and far from the reference implementation's f64-on-host
results (reference multi_mesh/utils.py:212 keeps all data f64).  XLA's
emulated f64 closes that gap at ~20-75x cost (measured 15 s per 1M points
for two polish iterations).  These kernels close it at near-f32 speed
using double-f32 (hi, lo) pair arithmetic (`core.df32`):

* ``polish_pairs`` -- one (or two) warm-started df32 Newton iteration(s)
  on already-accepted (point, element) pairs: basis values, the forward
  map x(ref) and the residual are evaluated in df32 on the split-f32 node
  lattice (hi + lo reconstructs the f64 unit-frame geometry); the
  Jacobian solve stays f32 (the step is ~1e-7, so f32 relative error
  contributes ~1e-14 absolutely).  Quadratic convergence takes the ~1e-7
  f32 warm start to the ~1e-12 df32 floor in ONE iteration.
* ``apply_pairs`` -- the transfer-operator apply with the accuracy to
  match: tensor-product basis weights evaluated in df32 straight from the
  polished (hi, lo) refs and dotted with split-f32 field values under a
  compensated (two_prod + two_sum) accumulation, emitting (hi, lo) value
  pairs.  The [N, (p+1)^d] df32 weights never materialize in HBM.

The df32 Newton/dot cores are written ONCE as layout-agnostic jnp code
and instantiated twice: inside the Pallas kernels (point-on-lanes tiles,
VMEM scratch node access) and as plain-XLA reference functions
(``polish_pairs_ref`` / ``apply_pairs_ref``).  On TPU hardware the Mosaic
kernels are bit-identical to the XLA reference (verified on v5e); the
*interpret* backend evaluates long kernel bodies with excess intermediate
precision, which breaks error-free-transform algebra (double rounding),
so CPU tests check strict accuracy on the reference functions and
plumbing/improvement on the interpreted kernels.

Layouts follow `pallas_newton.newton_refs_rows`: geometry/fields arrive
as lane-padded ROW-MAJOR tables (what an XLA row gather produces for
free) and are transposed to point-on-lanes layout per block in VMEM;
points and refs arrive as [d, R, 128] tiles.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import df32, gll
from . import pallas_newton as pn

BLOCK = pn.BLOCK
_SUBLANES = pn._SUBLANES
_LANES = pn._LANES

# A genuine polish step of an accepted f32 ref is O(f32 residual) ~ 1e-5;
# anything larger means the Newton update diverged (singular Jacobian,
# corrupted warm start) and the f32 ref is kept instead.
_STEP_GUARD = 0.05


def _lagrange_consts_pairs(order: int):
    nodes, _ = gll.gll_nodes(order)
    bary = gll.barycentric_weights(order)
    return (
        [df32.const_pair(float(x)) for x in nodes],
        [df32.const_pair(float(w)) for w in bary],
    )


def _eval_lagrange_df32(x_df, node_pairs, bary_pairs):
    """Cardinal values at df32 x -> list of df32 pairs (one per node)."""
    xh, xl = x_df
    diffs = []
    for nh, nl in node_pairs:
        s, e = df32.two_sum(xh, -nh)
        diffs.append(df32.fast_two_sum(s, e + (xl - nl)))
    n1 = len(node_pairs)
    vals = []
    for i in range(n1):
        prod = None
        for j in range(n1):
            if j == i:
                continue
            prod = diffs[j] if prod is None else df32.mul_dd(prod, diffs[j])
        if prod is None:  # order >= 1 always has n1 >= 2
            prod = (jnp.ones_like(xh), jnp.zeros_like(xh))
        # barycentric weight as an (hi, lo) scalar pair; np scalars
        # broadcast through the pair arithmetic
        vals.append(df32.mul_dd(prod, bary_pairs[i]))
    return vals


def _feature_pad(n: int) -> int:
    return -(-n // _LANES) * _LANES


def _solve_step(jac, r, dim):
    """f32 adjugate solve step = J^-1 r (same math as pallas_newton)."""
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
        inv = jnp.where(det == 0.0, 0.0,
                        1.0 / jnp.where(det == 0.0, 1.0, det))
        return [
            (c00 * r[0] + c01 * r[1] + c02 * r[2]) * inv,
            (c10 * r[0] + c11 * r[1] + c12 * r[2]) * inv,
            (c20 * r[0] + c21 * r[1] + c22 * r[2]) * inv,
        ]
    det = jac[0][0] * jac[1][1] - jac[0][1] * jac[1][0]
    inv = jnp.where(det == 0.0, 0.0, 1.0 / jnp.where(det == 0.0, 1.0, det))
    return [
        (jac[1][1] * r[0] - jac[0][1] * r[1]) * inv,
        (jac[0][0] * r[1] - jac[1][0] * r[0]) * inv,
    ]


# ---------------------------------------------------------------------------
# Shared df32 cores (layout-agnostic; instantiated by kernels AND by the
# plain-XLA reference paths)
# ---------------------------------------------------------------------------
def _newton_df32(ref, p_df, node_getter, order: int, dim: int,
                 iters: int, consts):
    """``iters`` df32 Newton iterations.

    ref: list of df32 pairs per dim; p_df: unit-frame point, df32 pairs;
    node_getter(m, a) -> (hi, lo) values of lattice node m, coordinate a.
    Returns (ref, ok)."""
    node_pairs, bary_pairs, nodes1d, bary = consts
    n1 = order + 1
    ok = None

    def acc(dst, term):
        return term if dst is None else dst + term

    for _ in range(iters):
        ls_df = [
            _eval_lagrange_df32(ref[a], node_pairs, bary_pairs)
            for a in range(dim)
        ]
        # f32 derivative values at the hi refs (Jacobian only)
        ds_ = [
            pn._eval_lagrange(ref[a][0], nodes1d, bary)[1]
            for a in range(dim)
        ]
        x_hi = [None] * dim
        x_lo = [None] * dim   # two_sum carries
        x_sm = [None] * dim   # small cross terms, plain f32
        jac = [[None] * dim for _ in range(dim)]

        def accumulate_node(m, N, grads):
            for a in range(dim):
                ndh, ndl = node_getter(m, a)
                ph, pe = df32.two_prod(N[0], ndh)
                if x_hi[a] is None:
                    x_hi[a], x_lo[a] = ph, pe
                    x_sm[a] = N[0] * ndl + N[1] * ndh
                else:
                    s, e = df32.two_sum(x_hi[a], ph)
                    x_hi[a] = s
                    x_lo[a] = x_lo[a] + (e + pe)
                    x_sm[a] = x_sm[a] + (N[0] * ndl + N[1] * ndh)
                for rd in range(dim):
                    jac[a][rd] = acc(jac[a][rd], grads[rd] * ndh)

        if dim == 3:
            for i in range(n1):
                for j in range(n1):
                    lij = df32.mul_dd(ls_df[0][i], ls_df[1][j])
                    di_lj = ds_[0][i] * ls_df[1][j][0]
                    li_dj = ls_df[0][i][0] * ds_[1][j]
                    for k in range(n1):
                        m = (i * n1 + j) * n1 + k
                        N = df32.mul_dd(lij, ls_df[2][k])
                        grads = (
                            di_lj * ls_df[2][k][0],
                            li_dj * ls_df[2][k][0],
                            lij[0] * ds_[2][k],
                        )
                        accumulate_node(m, N, grads)
        else:
            for i in range(n1):
                for j in range(n1):
                    m = i * n1 + j
                    N = df32.mul_dd(ls_df[0][i], ls_df[1][j])
                    grads = (
                        ds_[0][i] * ls_df[1][j][0],
                        ls_df[0][i][0] * ds_[1][j],
                    )
                    accumulate_node(m, N, grads)

        # residual r = p - x in df32, collapsed to f32 (|r| ~ 1e-7: f32
        # relative rounding contributes ~1e-14 absolutely)
        r = []
        for a in range(dim):
            x_df = df32.fast_two_sum(x_hi[a], x_lo[a] + x_sm[a])
            rd = df32.sub_dd(p_df[a], x_df)
            r.append(rd[0] + rd[1])
        step = _solve_step(jac, r, dim)
        good = None
        for a in range(dim):
            s_ok = jnp.abs(step[a]) < _STEP_GUARD
            good = s_ok if good is None else (good & s_ok)
            s = jnp.where(jnp.isfinite(step[a]), step[a], 0.0)
            ref[a] = df32.add_df(ref[a], s)
        ok = good if ok is None else (ok & good)
    return ref, ok


def _dot_df32(ref, field_getter, order: int, dim: int, n_params: int,
              node_pairs, bary_pairs):
    """df32 tensor-basis weights at ``ref`` dotted with split-f32 field
    values under compensated accumulation.

    field_getter(f, m) -> (hi, lo) values of param f at lattice node m.
    Returns list of df32 pairs, one per param.  Weights are consumed
    immediately -- neither materialized in HBM nor held as (p+1)^d live
    vector values (which would drown a kernel in register spills; only
    n_params * 3 accumulators + one weight stay live).
    """
    n1 = order + 1
    ls_df = [
        _eval_lagrange_df32(ref[a], node_pairs, bary_pairs)
        for a in range(dim)
    ]
    acc_hi = [None] * n_params
    acc_lo = [None] * n_params
    acc_sm = [None] * n_params

    def accumulate(m, N):
        for f in range(n_params):
            fh, fl = field_getter(f, m)
            ph, pe = df32.two_prod(N[0], fh)
            if acc_hi[f] is None:
                acc_hi[f], acc_lo[f] = ph, pe
                acc_sm[f] = N[0] * fl + N[1] * fh
            else:
                s, e = df32.two_sum(acc_hi[f], ph)
                acc_hi[f] = s
                acc_lo[f] = acc_lo[f] + (e + pe)
                acc_sm[f] = acc_sm[f] + (N[0] * fl + N[1] * fh)

    if dim == 3:
        for i in range(n1):
            for j in range(n1):
                lij = df32.mul_dd(ls_df[0][i], ls_df[1][j])
                for k in range(n1):
                    m = (i * n1 + j) * n1 + k
                    accumulate(m, df32.mul_dd(lij, ls_df[2][k]))
    else:
        for i in range(n1):
            for j in range(n1):
                m = i * n1 + j
                accumulate(m, df32.mul_dd(ls_df[0][i], ls_df[1][j]))

    return [
        df32.fast_two_sum(acc_hi[f], acc_lo[f] + acc_sm[f])
        for f in range(n_params)
    ]


class _NodesView:
    """Reads node tiles from the transposed VMEM scratch with
    ``getter(m, a)`` indexing."""

    def __init__(self, hi_ref, lo_ref, dim):
        self._hi = hi_ref
        self._lo = lo_ref
        self._dim = dim

    def __call__(self, m, a):
        return self._hi[m * self._dim + a], self._lo[m * self._dim + a]


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------
def _make_polish_kernel(order: int, dim: int, iters: int):
    consts = _lagrange_consts_pairs(order) + pn._lagrange_consts(order)
    Fp = pn._rows_feature_pad(order, dim)

    def kernel(nhi_ref, nlo_ref, pth_ref, ptl_ref, ref0_ref,
               refh_out, refl_out, ok_out, nhi_s, nlo_s):
        nhi_s[...] = jnp.transpose(nhi_ref[...], (1, 0)).reshape(
            Fp, _SUBLANES, _LANES
        )
        nlo_s[...] = jnp.transpose(nlo_ref[...], (1, 0)).reshape(
            Fp, _SUBLANES, _LANES
        )
        getter = _NodesView(nhi_s, nlo_s, dim)
        p_df = [(pth_ref[a], ptl_ref[a]) for a in range(dim)]
        ref = [
            (ref0_ref[a], jnp.zeros_like(ref0_ref[a])) for a in range(dim)
        ]
        ref, ok = _newton_df32(ref, p_df, getter, order, dim, iters,
                               consts)
        for a in range(dim):
            refh_out[a] = ref[a][0]
            refl_out[a] = ref[a][1]
        ok_out[0] = ok.astype(jnp.float32)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("order", "dim", "iters", "interpret")
)
def polish_refs_rows(
    nrows_hi,
    nrows_lo,
    pts_t_hi,
    pts_t_lo,
    ref0_t,
    order: int,
    dim: int,
    iters: int = 1,
    interpret: bool = False,
):
    """Warm-started df32 Newton polish over (point, element) row pairs.

    nrows_hi/lo: [C, Fp] f32 row-gathered split node lattices (see
                 locate._mesh_prep ``nodes_flat32`` / ``nodes_lo_flat32``)
    pts_t_hi/lo: [dim, R, 128] split pre-centered point coords
    ref0_t:      [dim, R, 128] f32 warm-start refs (accepted f32 solves)
    Returns (ref_hi [dim, R, 128], ref_lo [dim, R, 128], ok [R, 128]);
    rows whose Newton step exceeded the divergence guard report ok=False
    and should keep their f32 refs.
    """
    R = pts_t_hi.shape[1]
    assert R % _SUBLANES == 0, f"row count {R} must be a multiple of 8"
    Fp = pn._rows_feature_pad(order, dim)
    assert nrows_hi.shape == (R * _LANES, Fp)
    grid = (R // _SUBLANES,)
    kernel = _make_polish_kernel(order, dim, iters)
    zero = np.int32(0)
    rows_spec = pl.BlockSpec(
        (BLOCK, Fp), lambda i: (i, zero), memory_space=pltpu.VMEM
    )
    vec_spec = pl.BlockSpec(
        (dim, _SUBLANES, _LANES), lambda i: (zero, i, zero),
        memory_space=pltpu.VMEM,
    )
    one_spec = pl.BlockSpec(
        (1, _SUBLANES, _LANES), lambda i: (zero, i, zero),
        memory_space=pltpu.VMEM,
    )
    ref_hi, ref_lo, ok = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((dim, R, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((dim, R, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((1, R, _LANES), jnp.float32),
        ),
        grid=grid,
        in_specs=[rows_spec, rows_spec, vec_spec, vec_spec, vec_spec],
        out_specs=(vec_spec, vec_spec, one_spec),
        scratch_shapes=[
            pltpu.VMEM((Fp, _SUBLANES, _LANES), jnp.float32),
            pltpu.VMEM((Fp, _SUBLANES, _LANES), jnp.float32),
        ],
        interpret=interpret,
    )(nrows_hi, nrows_lo, pts_t_hi, pts_t_lo, ref0_t)
    return ref_hi, ref_lo, ok[0] > 0.5


def _make_apply_kernel(order: int, dim: int, n_params: int):
    node_pairs, bary_pairs = _lagrange_consts_pairs(order)
    n_nodes = (order + 1) ** dim
    n_pad = _feature_pad(n_nodes)
    Fw = n_params * n_pad

    def kernel(fh_ref, fl_ref, rh_ref, rl_ref, vh_out, vl_out,
               fh_s, fl_s):
        fh_s[...] = jnp.transpose(fh_ref[...], (1, 0)).reshape(
            Fw, _SUBLANES, _LANES
        )
        fl_s[...] = jnp.transpose(fl_ref[...], (1, 0)).reshape(
            Fw, _SUBLANES, _LANES
        )
        ref = [(rh_ref[a], rl_ref[a]) for a in range(dim)]

        def fgetter(f, m):
            return fh_s[f * n_pad + m], fl_s[f * n_pad + m]

        vals = _dot_df32(ref, fgetter, order, dim, n_params,
                         node_pairs, bary_pairs)
        for f in range(n_params):
            vh_out[f] = vals[f][0]
            vl_out[f] = vals[f][1]

    return kernel, n_pad


@functools.partial(
    jax.jit, static_argnames=("order", "dim", "n_params", "interpret")
)
def apply_refs_rows(
    frows_hi,
    frows_lo,
    ref_hi_t,
    ref_lo_t,
    order: int,
    dim: int,
    n_params: int,
    interpret: bool = False,
):
    """Fused df32 basis evaluation + compensated weighted reduction.

    frows_hi/lo: [C, n_params * n_pad] f32 split field values, row-major
                 per point (gathered by element; see
                 ``prepare_field_rows``)
    ref_hi/lo_t: [dim, R, 128] polished df32 reference coordinates
    Returns (vals_hi, vals_lo): each [n_params, R, 128] f32; their f64 sum
    is the interpolated value to ~1e-12 relative accuracy.
    """
    R = ref_hi_t.shape[1]
    assert R % _SUBLANES == 0
    kernel, n_pad = _make_apply_kernel(order, dim, n_params)
    Fw = n_params * n_pad
    assert frows_hi.shape == (R * _LANES, Fw), (frows_hi.shape, (R, Fw))
    grid = (R // _SUBLANES,)
    zero = np.int32(0)
    rows_spec = pl.BlockSpec(
        (BLOCK, Fw), lambda i: (i, zero), memory_space=pltpu.VMEM
    )
    vec_spec = pl.BlockSpec(
        (dim, _SUBLANES, _LANES), lambda i: (zero, i, zero),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (n_params, _SUBLANES, _LANES), lambda i: (zero, i, zero),
        memory_space=pltpu.VMEM,
    )
    vals_hi, vals_lo = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n_params, R, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_params, R, _LANES), jnp.float32),
        ),
        grid=grid,
        in_specs=[rows_spec, rows_spec, vec_spec, vec_spec],
        out_specs=(out_spec, out_spec),
        scratch_shapes=[
            pltpu.VMEM((Fw, _SUBLANES, _LANES), jnp.float32),
            pltpu.VMEM((Fw, _SUBLANES, _LANES), jnp.float32),
        ],
        interpret=interpret,
    )(frows_hi, frows_lo, ref_hi_t, ref_lo_t)
    return vals_hi, vals_lo


# ---------------------------------------------------------------------------
# Row-level wrappers (natural [M, ...] layouts; padding + transposes)
# ---------------------------------------------------------------------------
def _pad_rows(x, Mp, M):
    if Mp == M:
        return x
    reps = Mp - M
    return jnp.concatenate([x, jnp.repeat(x[:1], reps, axis=0)])


def _center_points_df32(p_hi, p_lo, ids, ctr_hi, ctr_lo, inv_scale,
                        inv_scale_lo):
    """df32 unit-frame point coords: (p - ctr) * inv_scale, via EFTs."""
    dh, de = df32.two_sum(p_hi, -ctr_hi[ids])
    d_df = df32.fast_two_sum(dh, de + (p_lo - ctr_lo[ids]))
    s_df = (inv_scale[ids][:, None], inv_scale_lo[ids][:, None])
    return df32.mul_dd(d_df, s_df)


@functools.partial(
    jax.jit, static_argnames=("order", "dim", "iters", "interpret")
)
def polish_pairs(
    p_hi,
    p_lo,
    ids,
    ref0,
    nodes_flat_hi,
    nodes_flat_lo,
    ctr_hi,
    ctr_lo,
    inv_scale,
    inv_scale_lo,
    order: int,
    dim: int,
    iters: int = 1,
    interpret: bool = False,
):
    """Row-level wrapper over ``polish_refs_rows``: natural [M, ...]
    layouts in and out, split-f32 point centering computed here with
    error-free transforms (zero emulated-f64 ops anywhere).

    p_hi/p_lo [M, d] split physical point coords; ids [M] element per
    point; ref0 [M, d] f32 warm-start refs.  Geometry arrives as the
    locate prep artifacts (lane-padded flat split lattices + split
    centers/inverse scales).  Returns (ref_hi [M, d], ref_lo [M, d],
    ok [M]).
    """
    M = p_hi.shape[0]
    Mp = int(np.ceil(M / BLOCK) * BLOCK)
    p_hi = _pad_rows(p_hi, Mp, M)
    p_lo = _pad_rows(p_lo, Mp, M)
    ids = _pad_rows(ids, Mp, M)
    ref0 = _pad_rows(ref0, Mp, M)

    pc_hi, pc_lo = _center_points_df32(
        p_hi, p_lo, ids, ctr_hi, ctr_lo, inv_scale, inv_scale_lo
    )
    R = Mp // _LANES
    pts_t_hi = jnp.transpose(pc_hi, (1, 0)).reshape(dim, R, _LANES)
    pts_t_lo = jnp.transpose(pc_lo, (1, 0)).reshape(dim, R, _LANES)
    ref0_t = jnp.transpose(
        ref0.astype(jnp.float32), (1, 0)
    ).reshape(dim, R, _LANES)
    nrows_hi = nodes_flat_hi[ids]
    nrows_lo = nodes_flat_lo[ids]
    ref_hi_t, ref_lo_t, ok_t = polish_refs_rows(
        nrows_hi, nrows_lo, pts_t_hi, pts_t_lo, ref0_t,
        order, dim, iters=iters, interpret=interpret,
    )
    ref_hi = jnp.transpose(ref_hi_t.reshape(dim, Mp), (1, 0))[:M]
    ref_lo = jnp.transpose(ref_lo_t.reshape(dim, Mp), (1, 0))[:M]
    return ref_hi, ref_lo, ok_t.reshape(Mp)[:M]


@functools.partial(
    jax.jit, static_argnames=("order", "dim", "n_params", "interpret")
)
def apply_pairs(
    ref_hi,
    ref_lo,
    frows_hi,
    frows_lo,
    order: int,
    dim: int,
    n_params: int,
    interpret: bool = False,
):
    """Row-level wrapper over ``apply_refs_rows``: refs [M, d] split
    pairs + per-point gathered field rows [M, n_params * n_pad] ->
    (vals_hi, vals_lo) [M, n_params]."""
    M = ref_hi.shape[0]
    Mp = int(np.ceil(M / BLOCK) * BLOCK)
    ref_hi = _pad_rows(ref_hi, Mp, M)
    ref_lo = _pad_rows(ref_lo, Mp, M)
    frows_hi = _pad_rows(frows_hi, Mp, M)
    frows_lo = _pad_rows(frows_lo, Mp, M)
    R = Mp // _LANES
    rh_t = jnp.transpose(ref_hi, (1, 0)).reshape(dim, R, _LANES)
    rl_t = jnp.transpose(ref_lo, (1, 0)).reshape(dim, R, _LANES)
    vh, vl = apply_refs_rows(
        frows_hi, frows_lo, rh_t, rl_t, order, dim, n_params,
        interpret=interpret,
    )
    vals_hi = jnp.transpose(vh.reshape(n_params, Mp), (1, 0))[:M]
    vals_lo = jnp.transpose(vl.reshape(n_params, Mp), (1, 0))[:M]
    return vals_hi, vals_lo


# ---------------------------------------------------------------------------
# Plain-XLA reference instantiations of the same df32 cores
# ---------------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=("order", "dim", "iters"))
def polish_pairs_ref(
    p_hi, p_lo, ids, ref0,
    nodes_flat_hi, nodes_flat_lo,
    ctr_hi, ctr_lo, inv_scale, inv_scale_lo,
    order: int, dim: int, iters: int = 1,
):
    """Pure-XLA twin of ``polish_pairs`` built on the SAME df32 Newton
    core (node access via gathered [M, Fp] rows instead of VMEM tiles).
    Strict-accuracy reference for tests; also usable as a production
    polish on backends without Mosaic."""
    consts = _lagrange_consts_pairs(order) + pn._lagrange_consts(order)
    pc_hi, pc_lo = _center_points_df32(
        p_hi, p_lo, ids, ctr_hi, ctr_lo, inv_scale, inv_scale_lo
    )
    nrows_hi = nodes_flat_hi[ids]
    nrows_lo = nodes_flat_lo[ids]

    def getter(m, a):
        return nrows_hi[:, m * dim + a], nrows_lo[:, m * dim + a]

    p_df = [(pc_hi[:, a], pc_lo[:, a]) for a in range(dim)]
    r0 = ref0.astype(jnp.float32)
    ref = [(r0[:, a], jnp.zeros_like(r0[:, a])) for a in range(dim)]
    ref, ok = _newton_df32(ref, p_df, getter, order, dim, iters, consts)
    return (
        jnp.stack([r[0] for r in ref], -1),
        jnp.stack([r[1] for r in ref], -1),
        ok,
    )


@functools.partial(jax.jit, static_argnames=("order", "dim", "n_params"))
def apply_pairs_ref(
    ref_hi, ref_lo, frows_hi, frows_lo,
    order: int, dim: int, n_params: int,
):
    """Pure-XLA twin of ``apply_pairs`` on the same df32 dot core."""
    node_pairs, bary_pairs = _lagrange_consts_pairs(order)
    n_pad = _feature_pad((order + 1) ** dim)

    def fgetter(f, m):
        return frows_hi[:, f * n_pad + m], frows_lo[:, f * n_pad + m]

    ref = [(ref_hi[:, a], ref_lo[:, a]) for a in range(dim)]
    vals = _dot_df32(ref, fgetter, order, dim, n_params,
                     node_pairs, bary_pairs)
    return (
        jnp.stack([v[0] for v in vals], -1),
        jnp.stack([v[1] for v in vals], -1),
    )


@functools.partial(jax.jit, static_argnames=("order", "dim"))
def prepare_field_rows(fields, order: int, dim: int):
    """[F, E, n_nodes] (any float dtype) -> row tables for
    ``apply_refs_rows``: ([E, F * n_pad] hi, [E, F * n_pad] lo)."""
    F, E, n_nodes = fields.shape
    n_pad = _feature_pad(n_nodes)
    hi = fields.astype(jnp.float32)
    lo = (fields - hi.astype(fields.dtype)).astype(jnp.float32)

    def pack(x):
        x = jnp.transpose(x, (1, 0, 2))  # [E, F, n]
        if n_pad != n_nodes:
            x = jnp.concatenate(
                [x, jnp.zeros((E, F, n_pad - n_nodes), jnp.float32)],
                axis=2,
            )
        return x.reshape(E, F * n_pad)

    return pack(hi), pack(lo)
