"""Benchmark: GLL -> GLL remap throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": M pts/s/chip, "unit": ..., "vs_baseline": ...}

Config follows BASELINE.md config 3 scaled by BENCH_N: order-4 source
shell mesh, BENCH_N target query points, 3 parameters, full pipeline
(kNN candidates + Newton locate + gather/einsum apply), plus an accuracy
check of max rel-err vs direct evaluation of the analytic nodal field.

vs_baseline is measured against the north-star rate implied by
BASELINE.json (100M points in <10 s on a v5e-8 => 1.25M pts/s/chip).
Timings force real device completion via host transfers -- on the axon
platform block_until_ready does not actually block.
"""
import json
import os
import time

import numpy as np


def main():
    n_points = int(os.environ.get("BENCH_N", 1_000_000))
    order = 4

    import jax.numpy as jnp
    from multimesh_tpu import testing as mmt
    from multimesh_tpu.config import LocateConfig, Precision
    from multimesh_tpu.ops import TransferOperator

    # ~4k-element order-4 shell source (500k GLL nodes)
    src = mmt.shell_mesh(n_lat=16, n_lon=16, n_rad=16, order=order)
    params = ("VP", "VS", "RHO")
    base = mmt.element_nodal_field(src, "smooth")
    fields = np.stack([base * (1 + 0.1 * i) for i in range(len(params))])

    rng = np.random.default_rng(0)
    r = rng.uniform(3.6e6, 6.3e6, n_points)
    th = rng.uniform(0.55, 1.15, n_points)
    ph = rng.uniform(0.35, 1.35, n_points)
    pts = np.stack(
        [r * np.sin(th) * np.cos(ph), r * np.sin(th) * np.sin(ph),
         r * np.cos(th)], -1)

    import jax

    cfg = LocateConfig(nelem_to_search=20, precision=Precision.MIXED)
    fields_dev = jnp.asarray(fields)
    pts_dev = jnp.asarray(pts)

    def run():
        op = TransferOperator.build(
            src.points, pts_dev, order=order, cfg=cfg, fallback="snap",
            prefilter_m=4,
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
    north_star_rate = 1.25  # M pts/s/chip (100M in 10 s over 8 chips)
    print(
        json.dumps(
            {
                "metric": (
                    "GLL->GLL remap throughput (order-4 source, "
                    f"{n_points} pts, 3 params, build+apply)"
                ),
                "value": round(rate, 4),
                "unit": "M points/s/chip",
                "vs_baseline": round(rate / north_star_rate, 4),
                "wall_s": round(dt, 3),
                "interp_rel_err_vs_analytic": rel_err,
                "n_points": n_points,
                "n_source_elements": src.nelem,
            }
        )
    )


if __name__ == "__main__":
    main()
