"""Stage-level profiling of the BIG-SOURCE (grid) candidate path on the
real chip: nearest_member internals (stage-1 bin ranking, stage-2 member
gather+argmin, id gather), the ladder locate, and the full gll_big
pipeline.  Timing forces completion via scalar transfers (axon
block_until_ready does not block)."""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sync(x):
    return float(np.asarray(x.ravel()[0]))


def main():
    import jax
    import jax.numpy as jnp
    from multimesh_tpu import testing as mmt
    from multimesh_tpu.config import LocateConfig, Precision
    from multimesh_tpu.search import grid as g

    print("platform:", jax.devices()[0].platform)

    order = 4
    n_lat, n_lon, n_rad = 80, 78, 80
    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench_cache", f"shell_{n_lat}x{n_lon}x{n_rad}_o{order}.npz",
    )
    if os.path.exists(cache):
        z = np.load(cache)
        src = mmt.StructuredMesh(
            z["points"], z["connectivity"], z["vertices"], order,
            z["layer_id"],
        )
    else:
        print("building 500k-element shell (slow host, one-time)...")
        src = mmt.shell_mesh(n_lat=n_lat, n_lon=n_lon, n_rad=n_rad,
                             order=order)
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        np.savez(cache, points=src.points, connectivity=src.connectivity,
                 vertices=src.vertices, layer_id=src.layer_id)
    src.points.setflags(write=False)
    print("source elements:", src.nelem)

    C = 262_144
    rng = np.random.default_rng(0)
    r = rng.uniform(3.6e6, 6.3e6, C)
    th = rng.uniform(0.55, 1.15, C)
    ph = rng.uniform(0.35, 1.35, C)
    pts = np.stack(
        [r * np.sin(th) * np.cos(ph), r * np.sin(th) * np.sin(ph),
         r * np.cos(th)], -1)
    q = jnp.asarray(pts)

    centroids = np.asarray(src.points, np.float64).mean(axis=1)
    index = g.build_grid(centroids)
    print("bins:", index.n_bins, "members/bin:", index.members_per_bin)

    def timeit(name, fn, reps=4):
        out = fn()
        sync(out[0] if isinstance(out, tuple) else out)
        ts = []
        for _ in range(reps):
            t0 = time.time()
            out = fn()
            sync(out[0] if isinstance(out, tuple) else out)
            ts.append(time.time() - t0)
        print(f"{name:52s} {min(ts)*1e3:9.1f} ms")
        return out

    # --- full nearest_member -------------------------------------------
    timeit("nearest_member n_probe=4 (262k chunk)",
           lambda: g.nearest_member(index, q, n_probe=4))
    timeit("nearest_member n_probe=2",
           lambda: g.nearest_member(index, q, n_probe=2))
    timeit("nearest_member n_probe=1",
           lambda: g.nearest_member(index, q, n_probe=1))

    # --- stage 1 only: rank bins ---------------------------------------
    @functools.partial(jax.jit, static_argnames=("p", "use_approx"))
    def stage1(reps32, qq, center, p, use_approx):
        q64 = qq - center
        q32 = q64.astype(jnp.float32)
        neg = (2.0 * (q32 @ reps32.T)
               - jnp.sum(reps32 * reps32, axis=-1)[None, :])
        if use_approx:
            _, probe = jax.lax.approx_max_k(neg, p)
        else:
            _, probe = jax.lax.top_k(neg, p)
        return probe

    probe4 = timeit("  stage1 matmul+approx_max_k p=4",
                    lambda: stage1(index.bin_reps32, q, index.center, 4,
                                   True))
    timeit("  stage1 matmul+approx_max_k p=1",
           lambda: stage1(index.bin_reps32, q, index.center, 1, True))

    @jax.jit
    def stage1_argmin(reps32, qq, center):
        q64 = qq - center
        q32 = q64.astype(jnp.float32)
        neg = (2.0 * (q32 @ reps32.T)
               - jnp.sum(reps32 * reps32, axis=-1)[None, :])
        return jnp.argmax(neg, axis=1)

    timeit("  stage1 matmul+argmax (p=1 exact)",
           lambda: stage1_argmin(index.bin_reps32, q, index.center))

    @jax.jit
    def stage1_matmul_only(reps32, qq, center):
        q64 = qq - center
        q32 = q64.astype(jnp.float32)
        neg = (2.0 * (q32 @ reps32.T)
               - jnp.sum(reps32 * reps32, axis=-1)[None, :])
        return jnp.min(neg, axis=1)

    timeit("  stage1 matmul+min-reduce (no topk)",
           lambda: stage1_matmul_only(index.bin_reps32, q, index.center))

    # --- stage 2 only: member gather + argmin, given probes -------------
    @jax.jit
    def stage2(coords6, elems, qq, center, probe):
        q64 = qq - center
        q32 = q64.astype(jnp.float32)
        d = 3
        coords = coords6[probe, :d, :]
        mem_ids = elems[probe]
        CC = q32.shape[0]
        p = probe.shape[1]
        m = coords6.shape[2]
        d2 = None
        for a in range(d):
            diff = coords[:, :, a, :] - q32[:, a, None, None]
            d2 = diff * diff if d2 is None else d2 + diff * diff
        pos = jnp.argmin(d2.reshape(CC, p * m), axis=1)
        return jnp.take_along_axis(
            mem_ids.reshape(CC, p * m), pos[:, None], 1)[:, 0]

    timeit("  stage2 gather+argmin+idgather p=4",
           lambda: stage2(index.bin_coords6, index.bin_elems, q,
                          index.center, probe4))

    @jax.jit
    def stage2_lateid(coords6, elems, qq, center, probe):
        q64 = qq - center
        q32 = q64.astype(jnp.float32)
        d = 3
        coords = coords6[probe, :d, :]
        CC = q32.shape[0]
        p = probe.shape[1]
        m = coords6.shape[2]
        d2 = None
        for a in range(d):
            diff = coords[:, :, a, :] - q32[:, a, None, None]
            d2 = diff * diff if d2 is None else d2 + diff * diff
        pos = jnp.argmin(d2.reshape(CC, p * m), axis=1)
        bin_sel = jnp.take_along_axis(probe, (pos // m)[:, None], 1)[:, 0]
        return elems[bin_sel, pos % m]

    timeit("  stage2 gather+argmin, LATE id fetch p=4",
           lambda: stage2_lateid(index.bin_coords6, index.bin_elems, q,
                                 index.center, probe4))

    # --- stage 2 with bf16 member coords --------------------------------
    d = 3
    coords_hi = np.asarray(index.bin_coords6)[:, :d, :]  # [B, d, m]
    reps_np = np.asarray(index.bin_reps32)  # [B, d]
    local = coords_hi - reps_np[:, :, None]
    coords_bf16 = jnp.asarray(local, jnp.bfloat16)

    @jax.jit
    def stage2_bf16(coords_b, elems, reps32, qq, center, probe):
        q64 = qq - center
        q32 = q64.astype(jnp.float32)
        coords = coords_b[probe]  # [C, p, d, m] bf16 bin-local
        reps_g = reps32[probe]  # [C, p, d]
        CC = q32.shape[0]
        p = probe.shape[1]
        m = coords_b.shape[2]
        d2 = None
        for a in range(d):
            qrel = q32[:, a, None] - reps_g[:, :, a]  # [C, p]
            diff = qrel[:, :, None] - coords[:, :, a, :].astype(jnp.float32)
            d2 = diff * diff if d2 is None else d2 + diff * diff
        pos = jnp.argmin(d2.reshape(CC, p * m), axis=1)
        bin_sel = jnp.take_along_axis(probe, (pos // m)[:, None], 1)[:, 0]
        return elems[bin_sel, pos % m]

    nm_bf = timeit("  stage2 bf16 bin-local coords, late id p=4",
                   lambda: stage2_bf16(coords_bf16, index.bin_elems,
                                       index.bin_reps32, q, index.center,
                                       probe4))
    # agreement with the f32 path
    nm_ref = g.nearest_member(index, q, n_probe=4)
    agree = float(jnp.mean((nm_bf == nm_ref).astype(jnp.float32)))
    print(f"  bf16 vs f32 nearest-member agreement: {agree:.6f}")

    # --- full locate ladder on this chunk --------------------------------
    from multimesh_tpu.search.locate import locate

    cfg = LocateConfig(nelem_to_search=20, precision=Precision.MIXED)
    timeit(
        "locate ladder (262k chunk, grid near1)",
        lambda: locate(q, src.points, order=order, cfg=cfg,
                       fallback="snap", want_weights=False).elements,
        reps=2,
    )


if __name__ == "__main__":
    main()
