"""Time the full locate ladder on a 262k chunk against the cached
500k-element shell (real chip) — for A/B'ing candidate strategies via
MMT_VOXTAB / _FORCE_* toggles."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax.numpy as jnp
    from multimesh_tpu import testing as mmt
    from multimesh_tpu.config import LocateConfig, Precision
    from multimesh_tpu.search.locate import locate

    z = np.load(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench_cache",
        "shell_80x78x80_o4.npz"))
    src = mmt.StructuredMesh(z["points"], z["connectivity"],
                             z["vertices"], 4, z["layer_id"])
    src.points.setflags(write=False)
    C = 262_144
    rng = np.random.default_rng(0)
    r = rng.uniform(3.6e6, 6.3e6, C)
    th = rng.uniform(0.55, 1.15, C)
    ph = rng.uniform(0.35, 1.35, C)
    pts = np.stack([r * np.sin(th) * np.cos(ph),
                    r * np.sin(th) * np.sin(ph), r * np.cos(th)], -1)
    q = jnp.asarray(pts)
    cfg = LocateConfig(nelem_to_search=20, precision=Precision.MIXED)

    def run():
        res = locate(q, src.points, order=4, cfg=cfg, fallback="snap",
                     want_weights=False)
        float(np.asarray(res.elements[:1]))
        return res

    run()
    ts = []
    for _ in range(3):
        t0 = time.time()
        run()
        ts.append(time.time() - t0)
    print("locate ladder (262k, MMT_VOXTAB=%s): %.1f ms" % (
        os.environ.get("MMT_VOXTAB", "1"), min(ts) * 1e3))


if __name__ == "__main__":
    main()
