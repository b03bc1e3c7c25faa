"""df32 polish + compensated-apply: strict accuracy on the plain-XLA
instantiation of the shared df32 cores, plumbing on the Pallas kernels.

The production claim under test: warm-started df32 Newton recovers
reference coordinates to ~1e-10 of the unit element (vs the ~1e-7 f32
plateau) on Earth-scale geometry, and the fused df32 basis + compensated
dot reproduces the f64 interpolated values to ~1e-11 relative -- the
accuracy the reference gets from running everything in host f64
(reference multi_mesh/utils.py:212).

Strict bounds run against ``polish_pairs_ref`` / ``apply_pairs_ref``
(same ``_newton_df32`` / ``_dot_df32`` cores the kernels instantiate)
under ``jax.disable_jit()``: XLA:CPU contracts mul+add into fma inside
fused jitted kernels, which breaks error-free-transform algebra (see
core/df32.py docstring) -- eager per-op execution is exact, and the
Mosaic/XLA paths on a real v5e TPU are bit-identical to it (verified
round 3).  The jitted kernel tests assert correct plumbing + a
conservative accuracy bound instead.
"""
import jax
import numpy as np
import jax.numpy as jnp
import pytest

from multimesh_tpu.core import gll, shape
from multimesh_tpu.search import pallas_df32 as pd32
from tests.test_shape import make_element


def _build_geometry(order, dim, E, rng):
    """E deformed elements at Earth scale (worst f32 conditioning)."""
    elems = []
    for e in range(E):
        kind = "shell" if (dim == 3 and e % 2 == 0) else "curved"
        elems.append(
            make_element(
                order, dim, kind=kind, seed=e,
                scale=1e5, offset=rng.uniform(5.5e6, 6.0e6, dim),
            )
        )
    return np.stack(elems)  # [E, n, dim] f64


def _prep_split(elem_nodes, order, dim):
    """Split-f32 prep artifacts (mirrors locate._mesh_prep_host)."""
    lo = elem_nodes.min(axis=1)
    hi = elem_nodes.max(axis=1)
    centers = 0.5 * (lo + hi)
    scales = np.maximum(0.5 * (hi - lo).max(axis=-1), 1e-30)
    nodes_c = (elem_nodes - centers[:, None, :]) / scales[:, None, None]
    nodes_c32 = nodes_c.astype(np.float32)
    E, n_nodes, _ = nodes_c.shape
    Fp = pd32.pn._rows_feature_pad(order, dim)
    flat_hi = np.zeros((E, Fp), np.float32)
    flat_hi[:, : n_nodes * dim] = nodes_c32.reshape(E, n_nodes * dim)
    flat_lo = np.zeros((E, Fp), np.float32)
    flat_lo[:, : n_nodes * dim] = (
        nodes_c - nodes_c32.astype(np.float64)
    ).astype(np.float32).reshape(E, n_nodes * dim)
    ctr_hi = centers.astype(np.float32)
    ctr_lo = (centers - ctr_hi.astype(np.float64)).astype(np.float32)
    inv_scale = (1.0 / scales).astype(np.float32)
    inv_scale_lo = (
        1.0 / scales - inv_scale.astype(np.float64)
    ).astype(np.float32)
    return tuple(
        jnp.asarray(a)
        for a in (flat_hi, flat_lo, ctr_hi, ctr_lo, inv_scale,
                  inv_scale_lo)
    )


def _polish_setup(order, dim, E, M, rng):
    elem_nodes = _build_geometry(order, dim, E, rng)
    prep = _prep_split(elem_nodes, order, dim)
    refs_true = rng.uniform(-0.95, 0.95, (M, dim))
    ids = rng.integers(0, E, M).astype(np.int32)
    x = np.asarray(
        shape.forward_map(
            order, jnp.asarray(elem_nodes[ids]), jnp.asarray(refs_true)
        )
    )
    p_hi = x.astype(np.float32)
    p_lo = (x - p_hi.astype(np.float64)).astype(np.float32)
    # realistic warm start: the f32 ladder's ~1e-7-accurate refs
    ref0 = (refs_true + rng.uniform(-3e-6, 3e-6, (M, dim))).astype(
        np.float32
    )
    args = (
        jnp.asarray(p_hi), jnp.asarray(p_lo), jnp.asarray(ids),
        jnp.asarray(ref0), *prep,
    )
    return args, refs_true, ref0


@pytest.mark.parametrize("order,dim", [(4, 3), (2, 3), (4, 2)])
def test_polish_ref_reaches_df32_floor(order, dim, rng):
    # small M: disable_jit evaluates the unrolled core op-by-op on the
    # throttled host CPU (jitted CPU execution fma-contracts, see module
    # docstring)
    M = 64 if (order, dim) == (4, 3) else 200
    args, refs_true, ref0 = _polish_setup(order, dim, E=6, M=M, rng=rng)
    with jax.disable_jit():
        ref_hi, ref_lo, ok = pd32.polish_pairs_ref(
            *args, order=order, dim=dim, iters=1
        )
    assert bool(jnp.all(ok))
    got = np.asarray(ref_hi, np.float64) + np.asarray(ref_lo, np.float64)
    err = np.max(np.abs(got - refs_true))
    # one warm-started df32 iteration: quadratic convergence to the
    # ~1e-12 pair floor; 1e-10 leaves slack for geometry conditioning
    assert err < 1e-10, err
    # and the warm start itself was nowhere near that accurate
    assert np.max(np.abs(ref0 - refs_true)) > 1e-8


def test_polish_ref_second_iteration_stable(rng):
    """Re-polishing an already-converged ref must not degrade it."""
    order, dim = 4, 2
    args, refs_true, _ = _polish_setup(order, dim, E=4, M=200, rng=rng)
    with jax.disable_jit():
        out1 = pd32.polish_pairs_ref(*args, order=order, dim=dim, iters=1)
        out2 = pd32.polish_pairs_ref(*args, order=order, dim=dim, iters=2)
    e1 = np.max(np.abs(
        np.asarray(out1[0], np.float64) + np.asarray(out1[1], np.float64)
        - refs_true))
    e2 = np.max(np.abs(
        np.asarray(out2[0], np.float64) + np.asarray(out2[1], np.float64)
        - refs_true))
    assert e2 < 5 * max(e1, 1e-12)


@pytest.mark.parametrize("order,dim", [
    # (4, 3) interprets the full 125-node basis per Newton step: ~84 s
    # on this 1-CPU rig, the plumbing is identical -- slow lane only
    pytest.param(4, 3, marks=pytest.mark.slow),
    (4, 2),
])
def test_polish_kernel_interpret_plumbing(order, dim, rng):
    """Interpret-mode kernel: same wiring, conservative accuracy bound
    (the interpreter's excess intermediate precision degrades EFT
    algebra; Mosaic on real TPUs matches polish_pairs_ref bit-for-bit)."""
    args, refs_true, ref0 = _polish_setup(order, dim, E=6, M=300, rng=rng)
    ref_hi, ref_lo, ok = pd32.polish_pairs(
        *args, order=order, dim=dim, iters=1, interpret=True
    )
    assert bool(jnp.all(ok))
    got = np.asarray(ref_hi, np.float64) + np.asarray(ref_lo, np.float64)
    err = np.max(np.abs(got - refs_true))
    warm_err = np.max(np.abs(ref0 - refs_true))
    assert err < 1e-6, err
    # still a strict improvement over the f32 warm start
    assert err < warm_err


def _apply_setup(order, dim, E, M, F, rng):
    elem_nodes = _build_geometry(order, dim, E, rng)
    fields = np.stack(
        [
            np.sin(elem_nodes[..., 0] / 2e5)
            + (0.3 + 0.1 * f) * np.cos(elem_nodes[..., dim - 1] / 3e5)
            for f in range(F)
        ]
    )  # [F, E, n] f64
    refs = rng.uniform(-0.999, 0.999, (M, dim))
    ids = rng.integers(0, E, M).astype(np.int32)
    rows_hi, rows_lo = pd32.prepare_field_rows(
        jnp.asarray(fields), order, dim
    )
    ref_hi = refs.astype(np.float32)
    ref_lo = (refs - ref_hi.astype(np.float64)).astype(np.float32)
    w = np.asarray(gll.tensor_basis(order, jnp.asarray(refs)))  # f64
    want = np.einsum("fmk,mk->mf", fields[:, ids, :], w)
    args = (
        jnp.asarray(ref_hi), jnp.asarray(ref_lo),
        rows_hi[jnp.asarray(ids)], rows_lo[jnp.asarray(ids)],
    )
    return args, want


@pytest.mark.parametrize("order,dim", [(4, 3), (4, 2)])
def test_apply_ref_matches_f64_einsum(order, dim, rng):
    M = 64 if (order, dim) == (4, 3) else 260
    args, want = _apply_setup(order, dim, E=5, M=M, F=3, rng=rng)
    with jax.disable_jit():
        vh, vl = pd32.apply_pairs_ref(
            *args, order=order, dim=dim, n_params=3
        )
    got = np.asarray(vh, np.float64) + np.asarray(vl, np.float64)
    rel = np.max(np.abs(got - want) / np.maximum(np.abs(want), 1e-12))
    assert rel < 1e-11, rel


def test_apply_kernel_interpret_plumbing(rng):
    order, dim = 4, 2
    args, want = _apply_setup(order, dim, E=5, M=260, F=3, rng=rng)
    vh, vl = pd32.apply_pairs(
        *args, order=order, dim=dim, n_params=3, interpret=True
    )
    got = np.asarray(vh, np.float64) + np.asarray(vl, np.float64)
    rel = np.max(np.abs(got - want) / np.maximum(np.abs(want), 1e-12))
    # interpret-mode EFT degradation caps at ~f32 grade; the wiring
    # (layouts, padding, param packing) is what this checks
    assert rel < 5e-6, rel


def test_engine_env_flag_smoke(monkeypatch, rng):
    """MMT_DF32_POLISH=1 flows through the engine cfg sites without
    changing semantics on the xla (CPU) engine, where the ladder-only
    polish is inert."""
    import jax.numpy as jnp
    from multimesh_tpu import engine
    from multimesh_tpu import testing as mmt

    src = mmt.shell_mesh(n_lat=3, n_lon=3, n_rad=2, order=2)
    center_node = 27 // 2
    pts = src.points[:, center_node, :]
    base = engine.get_element_weights(src.points, 2, None, pts)
    monkeypatch.setenv("MMT_DF32_POLISH", "1")
    flagged = engine.get_element_weights(src.points, 2, None, pts)
    np.testing.assert_array_equal(base[0], flagged[0])
    np.testing.assert_allclose(base[1], flagged[1], rtol=0, atol=1e-12)


@pytest.mark.slow  # ~30 s on the 1-CPU rig; hardware twin: tests/test_tpu.py::test_tpu_df32_apply_end_to_end
def test_operator_df32_end_to_end(rng, tmp_path):
    """LocateConfig(df32_polish=True) threads pair refs through locate ->
    TransferOperator -> compensated apply -> save/load.  Accuracy here is
    interpret-grade (see module docstring); the <1e-8 end-to-end claim is
    measured on the real chip (bench.py BENCH_POLISH=df32)."""
    import jax.numpy as jnp
    from multimesh_tpu import testing as mmt
    from multimesh_tpu.config import LocateConfig, Precision
    from multimesh_tpu.ops import TransferOperator

    order = 2
    src = mmt.shell_mesh(n_lat=4, n_lon=4, n_rad=3, order=order)
    # element centers: strictly interior, exactly locatable
    center_node = ((order + 1) ** 3) // 2
    pts = src.points[:, center_node, :]
    cfg = LocateConfig(
        nelem_to_search=8, precision=Precision.MIXED, df32_polish=True
    )
    op = TransferOperator.build(
        src.points, jnp.asarray(pts), order=order, cfg=cfg,
        fallback="snap", engine="pallas",
    )
    assert op.refs_lo is not None
    assert op.num_missing == 0

    field = mmt.element_nodal_field(src, "smooth")
    vals = np.asarray(op.apply(jnp.asarray(field)))
    truth = mmt.smooth_field(pts)
    rel = np.max(np.abs(vals - truth) / np.abs(truth))
    assert rel < 5e-5, rel

    # plain f32 operator agrees (the polish is a refinement, not a
    # different mapping)
    cfg0 = LocateConfig(nelem_to_search=8, precision=Precision.MIXED)
    op0 = TransferOperator.build(
        src.points, jnp.asarray(pts), order=order, cfg=cfg0,
        fallback="snap", engine="pallas",
    )
    assert np.array_equal(
        np.asarray(op.elements), np.asarray(op0.elements)
    )
    vals0 = np.asarray(op0.apply(jnp.asarray(field)))
    assert np.max(np.abs(vals - vals0) / np.abs(truth)) < 1e-4

    # save materializes f64 pair-combined weights; load round-trips
    d = tmp_path / "op_cache"
    op.save(d)
    op2 = TransferOperator.load(d)
    vals2 = np.asarray(op2.apply(jnp.asarray(field)))
    assert np.max(np.abs(vals2 - vals) / np.abs(truth)) < 1e-5
