"""Benchmarks for the BASELINE.md configs.  Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

BENCH_CONFIG selects the case (default "gll" = BASELINE config 3, the
driver's headline):

  gll        GLL->GLL remap, order-4 source shell, BENCH_N query points
             (default 10M), 3 params, full pipeline (kNN candidates +
             Newton locate ladder + gather/einsum apply).
  gll_big    same but against a ~500k-element source (exercises the
             balanced-bin grid candidate path end to end).
  exodus     Exodus->Exodus nodal transfer, ~100k-node hex meshes,
             1 param, through the file-based engine path (config 2).
  exodus_gll Exodus->GLL at BENCH_N GLL slots (default 10M) with
             best-so-far fallback, file-based (config 4).
  grid2d     2D mesh -> regular lat/lon grid point extraction
             (config 1; small).
  sharded    config 5: measures the PRODUCTION SHARDED PROGRAM itself
             (per-shard escalation ladder, dist.sharding) on a 1-device
             mesh on the real chip, after an 8-device virtual-mesh
             dryrun (incl. a 1M-point case) proves the same program
             executes SPMD; reports measured-per-chip x 8 (replicated
             scheme: zero steady-state collectives).
  gll_file   BASELINE config 3 as the reference runs it: FILE-TO-FILE
             api.gll_2_gll at BENCH_N GLL slots with the per-stage
             breakdown (read/dedup/build/apply/write) in the JSON.

vs_baseline is measured against the north-star rate implied by
BASELINE.json (100M points in <10 s on a v5e-8 => 1.25M pts/s/chip).
Timings force real device completion via scalar transfers -- on the axon
platform block_until_ready does not actually block.
"""
import json
import os
import tempfile
import time

import numpy as np

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)

NORTH_STAR_RATE = 1.25  # M pts/s/chip (100M in 10 s over 8 chips)


def _target_points(n_points, rng_seed=0):
    rng = np.random.default_rng(rng_seed)
    r = rng.uniform(3.6e6, 6.3e6, n_points)
    th = rng.uniform(0.55, 1.15, n_points)
    ph = rng.uniform(0.35, 1.35, n_points)
    return np.stack(
        [r * np.sin(th) * np.cos(ph), r * np.sin(th) * np.sin(ph),
         r * np.cos(th)], -1)


def bench_gll(n_points=None, big_source=False):
    import jax.numpy as jnp
    from multimesh_tpu import testing as mmt
    from multimesh_tpu.config import LocateConfig, Precision
    from multimesh_tpu.ops import TransferOperator

    order = 4
    if n_points is None:
        n_points = int(os.environ.get("BENCH_N", 10_000_000))
    if big_source:
        # ~500k-element source: candidates come from the balanced-bin
        # grid index (E > APPROX_GRID_MIN_SOURCES).  The host CPU on
        # this rig is extremely slow (~0.1 Gflop/s), so the one-time
        # mesh construction is cached on disk.
        n_lat, n_lon, n_rad = 80, 78, 80
        cache = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), ".bench_cache",
            f"shell_{n_lat}x{n_lon}x{n_rad}_o{order}.npz",
        )
        if os.path.exists(cache):
            z = np.load(cache)
            src = mmt.StructuredMesh(
                z["points"], z["connectivity"], z["vertices"], order,
                z["layer_id"],
            )
        else:
            src = mmt.shell_mesh(n_lat=n_lat, n_lon=n_lon, n_rad=n_rad,
                                 order=order)
            os.makedirs(os.path.dirname(cache), exist_ok=True)
            np.savez(cache, points=src.points,
                     connectivity=src.connectivity,
                     vertices=src.vertices, layer_id=src.layer_id)
    else:
        # ~4k-element order-4 shell source (500k GLL nodes)
        src = mmt.shell_mesh(n_lat=16, n_lon=16, n_rad=16, order=order)
    params = ("VP", "VS", "RHO")
    base = mmt.element_nodal_field(src, "smooth")
    fields = np.stack([base * (1 + 0.1 * i) for i in range(len(params))])

    # freeze the source lattice: read-only host arrays are fingerprinted
    # once per mesh (identity cache) instead of once per build -- on the
    # 500k-element source the content hash alone is ~1.5 GB/pass
    src.points.setflags(write=False)
    pts = _target_points(n_points)
    # BENCH_POLISH=df32 enables the pair-precision polish + compensated
    # apply (f64-grade values; measures its overhead vs the f32 path)
    polish = os.environ.get("BENCH_POLISH", "") == "df32"
    cfg = LocateConfig(nelem_to_search=20, precision=Precision.MIXED,
                       df32_polish=polish)
    fields_dev = jnp.asarray(fields)
    pts_dev = jnp.asarray(pts)

    def run():
        op = TransferOperator.build(
            src.points, pts_dev, order=order, cfg=cfg, fallback="snap",
        )
        vals = op.apply(fields_dev)
        # force completion with a scalar transfer (block_until_ready does
        # not actually block on the axon platform, and a full host
        # transfer of vals would time the tunnel, not the chip)
        float(jnp.sum(vals[:, 0]))
        return op, vals

    run()  # warmup / compile
    t0 = time.time()
    op, vals = run()
    dt = time.time() - t0

    truth = jnp.asarray(mmt.smooth_field(pts))
    rel_err = float(
        jnp.max(jnp.abs(vals[:, 0] - truth) / jnp.abs(truth))
    )

    rate = n_points / dt / 1e6  # M pts/s/chip
    return {
        "metric": (
            "GLL->GLL remap throughput (order-4 source, "
            f"{n_points} pts, 3 params, build+apply)"
            + (" [500k-element source, grid path]" if big_source else "")
            + (" [df32 polish]" if polish else "")
        ),
        "value": round(rate, 4),
        "unit": "M points/s/chip",
        "vs_baseline": round(rate / NORTH_STAR_RATE, 4),
        "wall_s": round(dt, 3),
        "interp_rel_err_vs_analytic": rel_err,
        "n_points": n_points,
        "n_source_elements": src.nelem,
    }


def bench_gll_100m():
    """The north-star workload on ONE chip: a 100M-point GLL->GLL
    transfer (BASELINE.json targets 100M < 10 s on a v5e-8).  Query
    points are generated on-device (the throttled host CPU would need
    ~10 minutes to synthesize 100M points) and accuracy is checked
    on-device against the analytic field.
    """
    import jax
    import jax.numpy as jnp
    from multimesh_tpu import testing as mmt
    from multimesh_tpu.config import LocateConfig, Precision
    from multimesh_tpu.ops import TransferOperator

    order = 4
    n_points = int(os.environ.get("BENCH_N", 100_000_000))
    src = mmt.shell_mesh(n_lat=16, n_lon=16, n_rad=16, order=order)
    params = ("VP", "VS", "RHO")
    base = mmt.element_nodal_field(src, "smooth")
    fields = np.stack([base * (1 + 0.1 * i) for i in range(len(params))])
    fields_dev = jnp.asarray(fields)

    # Points are generated on device in FIXED-SHAPE chunks: every compile
    # on this rig goes through a slow remote-compile helper (~20-60 s per
    # kernel, persistent cache not honored), so a single (n_points,)-shaped
    # generator would pay a fresh multi-minute compile per BENCH_N value.
    GEN = 1 << 24

    @jax.jit
    def make_chunk(key):
        k1, k2, k3 = jax.random.split(key, 3)
        r = jax.random.uniform(k1, (GEN,), jnp.float32, 3.6e6, 6.3e6)
        th = jax.random.uniform(k2, (GEN,), jnp.float32, 0.55, 1.15)
        ph = jax.random.uniform(k3, (GEN,), jnp.float32, 0.35, 1.35)
        # f32 point coordinates: eager ops on [1e8, 3] f64 arrays trip
        # padded-layout copies (f64 tiling pads the minor dim 3 -> 128, a
        # 102 GB copy); f32 behaves, and the accuracy bookkeeping is
        # exact because the analytic truth is evaluated at the SAME
        # (f32) coordinates
        return jnp.stack(
            [r * jnp.sin(th) * jnp.cos(ph), r * jnp.sin(th) * jnp.sin(ph),
             r * jnp.cos(th)], -1)

    keys = jax.random.split(
        jax.random.PRNGKey(0), (n_points + GEN - 1) // GEN
    )
    pts_dev = jnp.concatenate([make_chunk(k) for k in keys])[:n_points]
    float(jnp.sum(pts_dev[:1]))

    cfg = LocateConfig(nelem_to_search=20, precision=Precision.MIXED)

    def run():
        op = TransferOperator.build(
            src.points, pts_dev, order=order, cfg=cfg, fallback="snap",
        )
        vals = op.apply(fields_dev)
        float(jnp.sum(vals[:1, 0]))
        return op, vals

    run()
    t0 = time.time()
    op, vals = run()
    dt = time.time() - t0

    # NOTE: pts/vals are ARGUMENTS, not closure captures -- a captured
    # device array is baked into the compiled program as a literal
    # constant, and the remote-compile request then scales with N (the
    # serialized HLO hit the helper's HTTP body limit at 30M points).
    @jax.jit
    def rel_err_chunk(v, p):
        # analytic field at the query coordinates, on device
        truth = mmt.smooth_field_jnp(p)
        return jnp.max(jnp.abs(v[:, 0] - truth) / jnp.abs(truth))

    # full-GEN slices only (the last one overlaps backwards): one compile
    # shape regardless of n_points, and overlap is harmless under max()
    starts = list(range(0, max(n_points - GEN, 0) + 1, GEN))
    if starts[-1] != n_points - GEN and n_points > GEN:
        starts.append(n_points - GEN)
    err = max(
        float(rel_err_chunk(vals[s:s + GEN], pts_dev[s:s + GEN]))
        for s in starts
    )
    rate = n_points / dt / 1e6
    return {
        "metric": (
            f"GLL->GLL remap, {n_points} pts on ONE chip (north star: "
            "100M < 10 s on 8 chips)"
        ),
        "value": round(rate, 4),
        "unit": "M points/s/chip",
        "vs_baseline": round(rate / NORTH_STAR_RATE, 4),
        "wall_s": round(dt, 3),
        "interp_rel_err_vs_analytic": err,
        "n_points": n_points,
        "n_source_elements": src.nelem,
    }


def _cache_dir():
    d = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".bench_cache"
    )
    os.makedirs(d, exist_ok=True)
    return d


def _mesh_tag(mesh) -> str:
    """Fixture-cache key component derived from the mesh itself, so
    editing the generation parameters invalidates the cached file.
    Counts alone miss parameter edits that preserve them (extents,
    radii, warp), so a strided digest of the vertex coordinates is
    included."""
    import hashlib

    v = np.ascontiguousarray(mesh.vertices)
    b = v.reshape(-1).view(np.uint8)
    step = max(1, b.size // 65536)
    h = hashlib.blake2b(b[::step].tobytes(), digest_size=6).hexdigest()
    return f"{mesh.nelem}e{mesh.vertices.shape[0]}v_{h}"


def _cached_fixture(name, writer):
    """Write a mesh fixture once and reuse across bench runs (fixture
    synthesis runs minutes on this rig's ~0.1 Gflop/s host; a pristine
    copy restores mutated targets at disk speed).  Callers must embed
    the generating parameters in ``name`` (see ``_mesh_tag``)."""
    path = os.path.join(_cache_dir(), name)
    if not os.path.exists(path):
        tmp = path + ".tmp"
        writer(tmp)
        os.replace(tmp, path)
    return path


def _restore(pristine, working):
    import shutil

    shutil.copyfile(pristine, working)
    return working


def bench_exodus():
    """Config 2: Exodus->Exodus nodal transfer, ~100k nodes, 1 param."""
    from multimesh_tpu import testing as mmt
    from multimesh_tpu import engine
    from multimesh_tpu.io import exodus as eio

    # 46^3 vertices = 97,336 nodes on mesh B
    src = mmt.shell_mesh(n_lat=48, n_lon=48, n_rad=44, order=1)
    tgt = mmt.shell_mesh(n_lat=45, n_lon=45, n_rad=45, order=1,
                         r_inner=3.7e6, r_outer=6.2e6,
                         lat_extent=(0.58, 1.12), lon_extent=(0.38, 1.32))
    f_a = _cached_fixture(
        f"exo_a_{_mesh_tag(src)}.e",
        lambda p: mmt.write_exodus_fixture(p, src, parameters=("VP",)),
    )
    f_b0 = _cached_fixture(
        f"exo_b_{_mesh_tag(tgt)}_linear_pristine.e",
        lambda p: mmt.write_exodus_fixture(p, tgt, parameters=("VP",),
                                           field_kind="linear"),
    )
    with tempfile.TemporaryDirectory() as td:
        f_b = _restore(f_b0, os.path.join(td, "b.e"))
        n_nodes = tgt.vertices.shape[0]

        engine.exodus_2_exodus(f_a, f_b, parameters=["VP"])  # warmup
        f_b = _restore(f_b0, f_b)
        t0 = time.time()
        engine.exodus_2_exodus(f_a, f_b, parameters=["VP"])
        dt = time.time() - t0

        got = eio.Exodus(f_b).get_nodal_field("VP")
        truth = mmt.smooth_field(tgt.vertices)
        rel = float(np.max(np.abs(got - truth) / np.abs(truth)))
    rate = n_nodes / dt / 1e6
    return {
        "metric": (
            f"Exodus->Exodus nodal transfer ({n_nodes} nodes, 1 param, "
            "file to file)"
        ),
        "value": round(rate, 4),
        "unit": "M nodes/s/chip",
        "vs_baseline": round(rate / NORTH_STAR_RATE, 4),
        "wall_s": round(dt, 3),
        "interp_rel_err_vs_analytic": rel,
        "n_points": n_nodes,
        "n_source_elements": src.nelem,
    }


def bench_exodus_gll():
    """Config 4: Exodus -> GLL at BENCH_N GLL slots with fallback."""
    from multimesh_tpu import testing as mmt
    from multimesh_tpu import engine
    from multimesh_tpu.io import salvus as sio
    import h5py

    n_slots = int(os.environ.get("BENCH_N", 10_000_000))
    order = 4
    n_gll = (order + 1) ** 3
    # pick a GLL shell with ~n_slots nodes
    n_elem = max(8, n_slots // n_gll)
    n_lat = n_lon = max(2, int(round((n_elem / 12) ** (1 / 3) * 2)))
    n_rad = max(2, n_elem // (n_lat * n_lon))
    src = mmt.shell_mesh(n_lat=40, n_lon=40, n_rad=36, order=1)
    tgt = mmt.shell_mesh(n_lat=n_lat, n_lon=n_lon, n_rad=n_rad,
                         order=order, r_inner=3.7e6, r_outer=6.2e6,
                         lat_extent=(0.58, 1.12), lon_extent=(0.38, 1.32))
    n_slots_actual = tgt.nelem * n_gll
    f_exo = _cached_fixture(
        f"e2g_src_{_mesh_tag(src)}.e",
        lambda p: mmt.write_exodus_fixture(
            p, src, parameters=("VP", "VS", "RHO")),
    )
    f_gll0 = _cached_fixture(
        f"e2g_tgt_{_mesh_tag(tgt)}_o{order}_linear_pristine.h5",
        lambda p: mmt.write_salvus_fixture(
            p, tgt, parameters=("VP", "VS", "RHO"), field_kind="linear"),
    )
    from multimesh_tpu.utils_profile import reset_stages, stage_totals

    with tempfile.TemporaryDirectory() as td:
        f_gll = _restore(f_gll0, os.path.join(td, "tgt.h5"))
        engine.exodus_2_gll(f_exo, f_gll, parameters=["VP", "VS", "RHO"])
        f_gll = _restore(f_gll0, f_gll)
        t0 = time.time()
        engine.exodus_2_gll(f_exo, f_gll, parameters=["VP", "VS", "RHO"])
        dt = time.time() - t0
        with h5py.File(f_gll, "r") as h5:
            got = np.asarray(h5["MODEL/data"][:, 0, :])
        # separate profiled pass for the stage breakdown (its syncs
        # serialize the pipeline; the clean wall above is the headline)
        f_gll = _restore(f_gll0, f_gll)
        os.environ["MMT_PROFILE"] = "1"
        try:
            reset_stages()
            engine.exodus_2_gll(f_exo, f_gll,
                                parameters=["VP", "VS", "RHO"])
            stages = {k: round(v, 3) for k, v in stage_totals().items()}
        finally:
            del os.environ["MMT_PROFILE"]
        truth = mmt.smooth_field(tgt.points.reshape(-1, 3)).reshape(
            tgt.nelem, n_gll)
        # trilinear source: discretization-limited accuracy
        rel = float(np.max(np.abs(got - truth) / np.abs(truth)))
    rate = n_slots_actual / dt / 1e6
    return {
        "metric": (
            f"Exodus->GLL transfer ({n_slots_actual} GLL slots, 3 params, "
            "best-so-far fallback, file to file)"
        ),
        "value": round(rate, 4),
        "unit": "M points/s/chip",
        "vs_baseline": round(rate / NORTH_STAR_RATE, 4),
        "wall_s": round(dt, 3),
        "interp_rel_err_vs_analytic": rel,
        "n_points": n_slots_actual,
        "n_source_elements": src.nelem,
        "stage_breakdown_s": stages,
    }


def bench_grid2d():
    """Config 1: small 2D mesh -> regular grid point extraction."""
    import jax.numpy as jnp
    from multimesh_tpu import testing as mmt
    from multimesh_tpu.config import LocateConfig, Precision
    from multimesh_tpu.ops import TransferOperator

    order = 4
    src = mmt.box_mesh(shape=(24, 24), order=order, warp=0.05)
    gx, gy = np.meshgrid(
        np.linspace(0.02, 0.98, 512), np.linspace(0.02, 0.98, 512)
    )
    pts = np.stack([gx.ravel(), gy.ravel()], -1)
    field = mmt.element_nodal_field(src, "smooth")
    cfg = LocateConfig(nelem_to_search=20, precision=Precision.MIXED)

    def run():
        op = TransferOperator.build(
            src.points, jnp.asarray(pts), order=order, cfg=cfg,
            fallback="sentinel",
        )
        vals = op.apply(jnp.asarray(field))
        float(jnp.sum(vals[:1]))
        return vals

    run()
    t0 = time.time()
    vals = run()
    dt = time.time() - t0
    truth = mmt.smooth_field(pts)
    rel = float(jnp.max(jnp.abs(vals - truth) / np.abs(truth)))
    rate = pts.shape[0] / dt / 1e6
    return {
        "metric": (
            f"2D mesh -> regular grid extraction ({pts.shape[0]} grid "
            "points, order-4 2D source)"
        ),
        "value": round(rate, 4),
        "unit": "M points/s/chip",
        "vs_baseline": round(rate / NORTH_STAR_RATE, 4),
        "wall_s": round(dt, 3),
        "interp_rel_err_vs_analytic": rel,
        "n_points": int(pts.shape[0]),
        "n_source_elements": src.nelem,
    }


def bench_sharded():
    """Config 5: the SHARDED PROGRAM ITSELF, measured on the real chip.

    The production sharded program (per-shard escalation ladder +
    chunked apply, dist.sharding) runs on a 1-device mesh on the real
    TPU -- the same compiled shard program a v5e-8 runs per chip, and
    the replicated scheme has zero steady-state collectives, so the
    measured per-chip rate IS the scaling unit.  An 8-device
    virtual-CPU dryrun (subprocess) separately proves the identical
    program executes SPMD across a mesh with a 1M-point realistic-shape
    case.  The reported value is measured-rate x 8 with that basis
    stated -- no longer an extrapolation of a different code path.
    """
    import subprocess
    import sys

    import jax.numpy as jnp
    from multimesh_tpu import testing as mmt
    from multimesh_tpu.config import LocateConfig, Precision
    from multimesh_tpu.dist import make_mesh
    from multimesh_tpu.dist.sharding import sharded_transfer

    here = os.path.dirname(os.path.abspath(__file__))
    code = (
        "import __graft_entry__ as g; g.dryrun_multichip(8); print('OK')"
    )
    env = dict(os.environ, MMT_DRYRUN_BIG_N=os.environ.get(
        "MMT_DRYRUN_BIG_N", "1048576"))
    t0 = time.time()
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, cwd=here, env=env,
    )
    ok = "OK" in out.stdout
    dryrun_s = time.time() - t0

    order = 4
    n_points = int(os.environ.get("BENCH_N", 10_000_000))
    src = mmt.shell_mesh(n_lat=16, n_lon=16, n_rad=16, order=order)
    base = mmt.element_nodal_field(src, "smooth")
    fields = np.stack([base * (1 + 0.1 * i) for i in range(3)])
    src.points.setflags(write=False)
    pts_dev = jnp.asarray(_target_points(n_points))
    float(np.asarray(pts_dev.ravel()[0]))
    cfg = LocateConfig(nelem_to_search=20, precision=Precision.MIXED)
    dev_mesh = make_mesh(1)

    def run():
        vals = sharded_transfer(
            pts_dev, src.points, fields, order=order, cfg=cfg,
            fallback="snap", mesh=dev_mesh, device_out=True,
        )
        float(np.asarray(vals.ravel()[0]))
        return vals

    run()  # warmup / compile
    t0 = time.time()
    vals = run()
    dt = time.time() - t0

    truth = jnp.asarray(mmt.smooth_field(np.asarray(pts_dev)))
    rel_err = float(
        jnp.max(jnp.abs(vals[:, 0] - truth) / jnp.abs(truth))
    )
    rate1 = n_points / dt / 1e6
    rate8 = rate1 * 8
    return {
        "metric": (
            "sharded GLL->GLL: production shard program measured on one "
            f"chip ({n_points} pts, ladder engine) x 8; 8-device "
            "virtual-mesh dryrun incl. 1M-point case "
            + ("passed" if ok else "FAILED")
        ),
        "value": round(rate8, 4),
        "unit": "M points/s (8 chips)",
        "vs_baseline": round(rate8 / (NORTH_STAR_RATE * 8), 4),
        "measured_per_chip": round(rate1, 4),
        "wall_s": round(dt, 3),
        "interp_rel_err_vs_analytic": rel_err,
        "dryrun_ok": ok,
        "dryrun_wall_s": round(dryrun_s, 2),
    }


def bench_gll_file():
    """BASELINE config 3 measured as the reference runs it: FILE-TO-FILE
    ``api.gll_2_gll`` (HDF5 read -> dedup -> fixed_ref ladder locate ->
    apply -> fluid/solid repair -> HDF5 write), with the per-stage
    breakdown in the output JSON (VERDICT r3 item 3)."""
    import h5py
    from multimesh_tpu import testing as mmt
    from multimesh_tpu import api
    from multimesh_tpu.utils_profile import reset_stages, stage_totals

    order = 4
    n_gll = (order + 1) ** 3
    n_slots = int(os.environ.get("BENCH_N", 10_000_000))
    n_elem = max(8, n_slots // n_gll)
    n_lat = n_lon = max(2, int(round((n_elem / 12.5) ** (1 / 3) * 2)))
    n_rad = max(2, n_elem // (n_lat * n_lon))

    def _tgt_mesh():
        cache = os.path.join(
            _cache_dir(), f"g2g_tgt_{n_lat}x{n_lon}x{n_rad}_o{order}.npz"
        )
        if os.path.exists(cache):
            z = np.load(cache)
            return mmt.StructuredMesh(
                z["points"], z["connectivity"], z["vertices"], order,
                z["layer_id"],
            )
        m = mmt.shell_mesh(
            n_lat=n_lat, n_lon=n_lon, n_rad=n_rad, order=order,
            r_inner=3.7e6, r_outer=6.2e6,
            lat_extent=(0.58, 1.12), lon_extent=(0.38, 1.32),
        )
        np.savez(cache, points=m.points, connectivity=m.connectivity,
                 vertices=m.vertices, layer_id=m.layer_id)
        return m

    src = mmt.shell_mesh(n_lat=16, n_lon=16, n_rad=16, order=order)
    tgt = _tgt_mesh()
    n_slots_actual = tgt.nelem * n_gll
    f_src = _cached_fixture(
        f"g2g_src_{_mesh_tag(src)}_o{order}.h5",
        lambda p: mmt.write_salvus_fixture(
            p, src, parameters=("VP", "VS", "RHO")),
    )
    f_tgt0 = _cached_fixture(
        f"g2g_tgt_{_mesh_tag(tgt)}_o{order}_linear_pristine.h5",
        lambda p: mmt.write_salvus_fixture(
            p, tgt, parameters=("VP", "VS", "RHO"),
            field_kind="linear"),
    )
    with tempfile.TemporaryDirectory() as td:
        f_tgt = _restore(f_tgt0, os.path.join(td, "tgt.h5"))
        api.gll_2_gll(f_src, f_tgt)  # warmup / compile
        # timed run: CLEAN (no stage timers -- their device-complete
        # syncs serialize the stages and inflate the wall time)
        f_tgt = _restore(f_tgt0, f_tgt)
        t0 = time.time()
        api.gll_2_gll(f_src, f_tgt)
        dt = time.time() - t0
        with h5py.File(f_tgt, "r") as h5:
            got = np.asarray(h5["MODEL/data"][:, 0, :])
        # separate profiled pass for the stage breakdown (per-stage sums
        # exceed the clean wall time exactly where stages overlap)
        f_tgt = _restore(f_tgt0, f_tgt)
        os.environ["MMT_PROFILE"] = "1"
        try:
            reset_stages()
            api.gll_2_gll(f_src, f_tgt)
            stages = {k: round(v, 3) for k, v in stage_totals().items()}
        finally:
            del os.environ["MMT_PROFILE"]
    truth = mmt.smooth_field(tgt.points.reshape(-1, 3)).reshape(
        tgt.nelem, n_gll
    )
    rel = float(np.max(np.abs(got - truth) / np.abs(truth)))
    rate = n_slots_actual / dt / 1e6
    return {
        "metric": (
            f"GLL->GLL FILE-TO-FILE via api.gll_2_gll ({n_slots_actual} "
            "GLL slots, 3 params, fixed_ref semantics, incl. HDF5 "
            "read/write)"
        ),
        "value": round(rate, 4),
        "unit": "M points/s/chip",
        "vs_baseline": round(rate / NORTH_STAR_RATE, 4),
        "wall_s": round(dt, 3),
        "interp_rel_err_vs_analytic": rel,
        "n_points": n_slots_actual,
        "n_source_elements": src.nelem,
        "stage_breakdown_s": stages,
    }


def _tpu_reachable(timeout_s: float = 180.0) -> bool:
    """Probe device init in a SUBPROCESS with a timeout.

    The axon TPU tunnel occasionally goes down for hours; in that state
    ``jax.devices()`` blocks indefinitely (or dies on a libtpu version
    mismatch), which would turn the whole bench into a hang/crash.  A
    subprocess probe keeps this process's backend uninitialized so it
    can still fall back to CPU (``jax.config.update`` is ignored once
    the axon backend has been touched)."""
    import subprocess
    import sys

    try:
        out = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices(); print('ok')"],
            timeout=timeout_s, capture_output=True, text=True,
        )
        return out.returncode == 0 and "ok" in out.stdout
    except (subprocess.TimeoutExpired, OSError):
        return False


def main():
    config = os.environ.get("BENCH_CONFIG", "gll")
    note = None
    if os.environ.get("BENCH_SKIP_PROBE") != "1" and not _tpu_reachable():
        # Honest degradation: report a CPU number flagged as such rather
        # than hanging or crashing the round's bench record.
        import jax

        jax.config.update("jax_platforms", "cpu")
        # ~20k points keeps the CPU fallback under ~3 minutes on this
        # rig's throttled host (measured: 20k pts = 62 s timed run)
        os.environ.setdefault("BENCH_N", "20000")
        note = ("TPU unreachable (tunnel down at bench time); measured "
                "on the host CPU at reduced size -- not a chip rate")
    fn = {
        "gll": bench_gll,
        "gll100m": bench_gll_100m,
        "gll_big": lambda: bench_gll(big_source=True),
        "exodus": bench_exodus,
        "exodus_gll": bench_exodus_gll,
        "grid2d": bench_grid2d,
        "sharded": bench_sharded,
        "gll_file": bench_gll_file,
    }[config]
    result = fn()
    if note is not None:
        result["platform"] = "cpu-fallback"
        result["note"] = note
        # context for the record: the most recent real-chip measurement
        # of the headline config (round 5, one TPU v5e chip)
        result["last_tpu_measurement"] = {
            "value": 4.8516, "unit": "M points/s/chip",
            "n_points": 10_000_000, "round": 5,
        }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
