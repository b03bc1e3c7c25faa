"""Stage-level profiling of the transfer pipeline on the real chip.

Measures per-chunk costs of: kNN candidate search, locate (prefilter +
scan), rescue sync, apply.  Timing forces completion via scalar
transfers (axon block_until_ready does not block).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sync(x):
    return float(np.asarray(x.ravel()[0]))


def main():
    n_points = int(os.environ.get("PROF_N", 2 * 131072))
    order = 4

    import jax
    import jax.numpy as jnp
    from multimesh_tpu import testing as mmt
    from multimesh_tpu.config import LocateConfig, Precision
    import importlib
    knn_mod = importlib.import_module("multimesh_tpu.search.knn")
    from multimesh_tpu.search.locate import locate, _locate_chunk
    from multimesh_tpu.core import gll

    print("platform:", jax.devices()[0].platform)
    src = mmt.shell_mesh(n_lat=16, n_lon=16, n_rad=16, order=order)
    print("source elements:", src.nelem)
    base = mmt.element_nodal_field(src, "smooth")
    fields = np.stack([base * (1 + 0.1 * i) for i in range(3)])

    rng = np.random.default_rng(0)
    r = rng.uniform(3.6e6, 6.3e6, n_points)
    th = rng.uniform(0.55, 1.15, n_points)
    ph = rng.uniform(0.35, 1.35, n_points)
    pts = np.stack(
        [r * np.sin(th) * np.cos(ph), r * np.sin(th) * np.sin(ph),
         r * np.cos(th)], -1)

    cfg = LocateConfig(nelem_to_search=20, precision=Precision.MIXED)
    pts_dev = jnp.asarray(pts)
    elem_nodes = jnp.asarray(src.points)
    centroids = jnp.mean(elem_nodes, axis=1)
    fields_dev = jnp.asarray(fields)

    def timeit(name, fn, reps=3):
        out = fn()
        sync(out[0] if isinstance(out, tuple) else out)
        ts = []
        for _ in range(reps):
            t0 = time.time()
            out = fn()
            sync(out[0] if isinstance(out, tuple) else out)
            ts.append(time.time() - t0)
        print(f"{name:40s} {min(ts)*1e3:9.1f} ms")
        return out

    C = 131072
    q = pts_dev[:C]

    # --- kNN breakdown -----------------------------------------------
    _, cand = timeit("knn k=20 (one 131k chunk)",
                     lambda: knn_mod.knn(centroids, q, 20))
    timeit("knn k=12 (one 131k chunk)",
           lambda: knn_mod.knn(centroids, q, 12))

    # coarse only: matmul + group top_k without member re-rank
    import functools

    @functools.partial(jax.jit, static_argnames=("n_keep",))
    def coarse_only(qq, cents, n_keep):
        center = jnp.mean(cents, axis=0)
        src32 = (cents - center).astype(jnp.float32)
        q32 = (qq - center).astype(jnp.float32)
        d2 = (
            jnp.sum(q32 * q32, -1, keepdims=True)
            - 2.0 * (q32 @ src32.T)
            + jnp.sum(src32 * src32, -1)[None, :]
        )
        from multimesh_tpu.search.knn import _top_groups
        return _top_groups(-d2, n_keep)

    timeit("  coarse matmul+group top_k n_keep=22",
           lambda: coarse_only(q, centroids, 22))
    timeit("  coarse matmul+group top_k n_keep=14",
           lambda: coarse_only(q, centroids, 14))

    @jax.jit
    def matmul_only(qq, cents):
        center = jnp.mean(cents, axis=0)
        src32 = (cents - center).astype(jnp.float32)
        q32 = (qq - center).astype(jnp.float32)
        d2 = (
            jnp.sum(q32 * q32, -1, keepdims=True)
            - 2.0 * (q32 @ src32.T)
            + jnp.sum(src32 * src32, -1)[None, :]
        )
        return jnp.min(d2, axis=1)

    timeit("  coarse matmul only (min reduce)",
           lambda: matmul_only(q, centroids))

    # --- locate with given candidates ---------------------------------
    res = timeit(
        "locate chunk prefilter_m=4 (w/ rescue)",
        lambda: locate(q, elem_nodes, order=order, cfg=cfg,
                       fallback="snap", candidates=cand, prefilter_m=4,
                       want_weights=False).elements,
    )
    timeit(
        "locate chunk prefilter_m=0",
        lambda: locate(q, elem_nodes, order=order, cfg=cfg,
                       fallback="snap", candidates=cand, prefilter_m=0,
                       want_weights=False).elements,
    )

    # --- full pipeline -------------------------------------------------
    from multimesh_tpu.ops import TransferOperator

    def full():
        op = TransferOperator.build(
            src.points, pts_dev, order=order, cfg=cfg, fallback="snap",
            prefilter_m=4)
        vals = op.apply(fields_dev)
        return vals

    timeit(f"full build+apply ({n_points} pts)", full, reps=2)


if __name__ == "__main__":
    main()
