"""Pallas TPU kernel: fused nearest-centroid (distance + argmin).

The XLA formulation of the round-1 candidate pass (knn.nearest_centroid)
materializes the full [C, E] score matrix in HBM between the matmul and
the argmax -- 4.3 GB written + read per 262k-point chunk at E=4096,
measured ~29 ms on v5e, which makes the CANDIDATE SEARCH the single
largest stage of the small-mesh transfer pipeline (~40% of build+apply).

Here the scores never leave VMEM: each grid step computes one point
block's scores against ALL centroids with one MXU dot ([P, 8] x
[8, E] -- the coordinate axis is zero-padded to 8 lanes of K) and
reduces them to a single nearest index in-register.  HBM traffic drops
to reading the points and centroids once and writing one index per
point; measured ~4 ms for the same chunk (~7x).

Precision matches the XLA path deliberately: the dot runs at the MXU's
DEFAULT (bf16-grade) precision -- this is a CANDIDATE pass and the
locate ladder's rescue rounds re-try any point whose candidate fails
Newton acceptance (see knn.nearest_centroid's precision note).

Layouts (all lane-clean, no [N, 3] minor-dim padding):

* queries   [8, C_pad] f32 planar, centered; rows 0..d-1 hold coords
* centroids [8, E_pad] f32 planar, centered; E padded with far-away
  sentinels (score floor keeps them from ever winning)
* output    [1, C_pad] int32 nearest-centroid index
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_KPAD = 8  # coordinate axis padded to one sublane tile of K

# Far-away pad coordinate for unused centroid slots: |c|^2 = 3e18
# dominates any real Earth-scale score (<= ~1e14 after centering) even
# under bf16-grade rounding of the cross term (<= ~2e16).
_PAD_COORD = 1e9


def _make_kernel(E_pad: int):
    def kernel(q_ref, c_ref, cn_ref, out_ref):
        q = jnp.transpose(q_ref[...], (1, 0))  # [P, 8]
        c = c_ref[...]  # [8, E_pad]
        # d^2 up to the per-point constant |q|^2: |c|^2 - 2 q.c
        cross = jax.lax.dot_general(
            q, c, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [P, E_pad], one MXU pass
        scores = cn_ref[...] - 2.0 * cross
        m = jnp.min(scores, axis=1, keepdims=True)  # [P, 1]
        lane = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        idx = jnp.min(
            jnp.where(scores <= m, lane, np.int32(E_pad)), axis=1
        )  # [P] -- first (lowest-index) attaining the min, like argmin
        out_ref[...] = idx[None, :]

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def _nearest_pallas_jit(queries64, sources64, interpret: bool = False):
    """Exact twin of knn._nearest_jit's contract: centered f32 ranking,
    [C] int32 output; scores stay in VMEM (see module docstring)."""
    C, d = queries64.shape
    E = sources64.shape[0]
    center = jnp.mean(sources64, axis=0)
    s32 = (sources64 - center).astype(jnp.float32)
    q32 = (queries64 - center).astype(jnp.float32)

    E_pad = -(-E // _LANES) * _LANES
    c8 = jnp.full((_KPAD, E_pad), _PAD_COORD, jnp.float32)
    c8 = c8.at[d:, :].set(0.0)
    c8 = c8.at[:d, :E].set(jnp.transpose(s32, (1, 0)))
    cn = jnp.sum(c8[:d] * c8[:d], axis=0, keepdims=True)  # [1, E_pad]

    # block size scales down as E grows to bound the [P, E] VMEM scores
    # (<= ~2 MB with double buffering headroom); Mosaic requires the
    # lane (last) block dim to be a multiple of 128
    P = 256 if E_pad <= 2048 else 128
    C_pad = -(-C // P) * P
    q8 = jnp.zeros((_KPAD, C_pad), jnp.float32)
    q8 = q8.at[:d, :C].set(jnp.transpose(q32, (1, 0)))

    zero = np.int32(0)
    idx_f = pl.pallas_call(
        _make_kernel(E_pad),
        out_shape=jax.ShapeDtypeStruct((1, C_pad), jnp.int32),
        grid=(C_pad // P,),
        in_specs=[
            pl.BlockSpec((_KPAD, P), lambda i: (zero, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_KPAD, E_pad), lambda i: (zero, zero),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E_pad), lambda i: (zero, zero),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, P), lambda i: (zero, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(q8, c8, cn)
    return jnp.minimum(idx_f[0, :C], np.int32(E - 1))
