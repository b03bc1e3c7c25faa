"""Central configuration: tolerances, search constants, precision policy.

The reference scatters its numerical magic numbers across the code base
(acceptance tolerances 1.02/1.025/1.03/1.04/1.05/1.5, candidate counts
k=20/25/30, Newton iteration limit 50, tol 1e-8*scale; see e.g. reference
multi_mesh/components/interpolator.py:1204-1233, :1439-1472 and
multi_mesh/src/trilinearinterpolator.c:93,113,264-282).  Here they live in
one dataclass so every engine path shares identical semantics.
"""
from __future__ import annotations

import dataclasses
import enum

R_EARTH_M = 6_371_000.0  # reference multi_mesh/utils.py:534

# Default trilinear-prefilter width for the device engine: the prefilter
# ranks candidates with a cheap order-1 Newton and keeps the best
# PREFILTER_M for the full-order solve (shared by every engine path;
# retune it here, not at call sites).
PREFILTER_M = 4


class Precision(enum.Enum):
    """Numerical policy for the device pipeline.

    F64     -- everything in float64 (exactness validation; fast on CPU,
               emulated on TPU).
    MIXED   -- candidate search and Newton bulk iterations in float32 on
               element-centered coordinates, followed by float64 polish
               iterations and float64 basis weights.  Default on TPU.
    F32     -- everything float32 (max-throughput benchmarking).
    """

    F64 = "f64"
    MIXED = "mixed"
    F32 = "f32"


@dataclasses.dataclass(frozen=True)
class LocateConfig:
    """Point-location behavior knobs (one object instead of scattered args)."""

    # Number of candidate source elements examined per query point.
    # Reference defaults: 20 (gll_2_gll, interpolator.py:624), 25
    # (get_element_weights, interpolator.py:1152), 30 (layered_multi_two,
    # interpolator.py:984).
    nelem_to_search: int = 20

    # A candidate is accepted when all |ref coords| < accept_tol.
    # Reference: 1.05 (interpolator.py:1208), 1.04 (:1439), 1.03 (:1288),
    # 1.025 (trilinearinterpolator.c:93).
    accept_tol: float = 1.05

    # When snapping to the best candidate, ref coords are clipped to
    # +/- snap_clip (reference interpolator.py:1219).
    snap_clip: float = 1.02

    # Best-so-far fallback only taken when its max |ref| is below this
    # (reference trilinearinterpolator.c:113 uses 1.5).
    fallback_max: float = 1.5

    # Newton iteration counts.  The reference runs up to 50 double-precision
    # iterations with early exit (trilinearinterpolator.c:264).  We run a
    # fixed, branchless schedule: `newton_iters` bulk iterations plus
    # `polish_iters` at the accumulation dtype.  `prefilter_iters` is the
    # (cheaper) schedule used when the trilinear prefilter merely *ranks*
    # candidates -- ranking needs far less precision than acceptance.
    newton_iters: int = 16
    polish_iters: int = 2
    prefilter_iters: int = 8

    # When the trilinear prefilter is active, only the nearest
    # `prefilter_pool` candidates enter the ranking (the rescue pass
    # re-scans the full candidate list for any point the pool failed to
    # accept, so recall is preserved at full k).
    prefilter_pool: int = 12

    # Convergence tolerance, relative to element scale
    # (reference trilinearinterpolator.c:282: tol = 1e-8 * scale).
    newton_rtol: float = 1e-8

    # Ref-coord magnitude at which Newton iterates are clamped to avoid
    # overflow for far-away candidates (pure numerical guard; points with
    # clamped solutions can never pass accept_tol).
    newton_clamp: float = 8.0

    # Run 2 float64 Newton iterations on each ACCEPTED (point, element)
    # pair after the f32 ladder, warm-started from the f32 ref coords:
    # ref-coordinate accuracy goes from ~1e-7 (f32 plateau) to <1e-12,
    # and the returned refs/weights are f64.  Costs one extra gather of
    # the split-f32 node lattice plus emulated-f64 math for 2 iterations
    # over accepted points only; matches the reference's f64-throughout
    # numerics (reference multi_mesh/utils.py:212) when needed.
    f64_polish: bool = False

    # Double-f32 polish (TPU fast path): one warm-started Newton
    # iteration in (hi, lo) f32 pair arithmetic on each ACCEPTED pair
    # via the fused Pallas kernel (search/pallas_df32.py) -- the same
    # <1e-10 ref-coordinate accuracy as f64_polish at near-f32 speed
    # (error-free transforms instead of emulated f64).  The polished
    # refs ride along as a LocateResult.refs_lo / TransferOperator
    # refs_lo component, and apply() then uses the compensated df32
    # kernel for f64-grade end-to-end values.  Ladder/pallas engine
    # only; ignored by the xla/scan paths (which have f64_polish).
    df32_polish: bool = False

    # Iterations for the df32 polish (1 suffices: quadratic convergence
    # from the ~1e-7 f32 warm start hits the ~1e-12 pair floor).
    df32_polish_iters: int = 1

    precision: Precision = Precision.MIXED


DEFAULT_LOCATE = LocateConfig()

# Hardcoded interior fallback ref coordinate used by the reference when a
# point cannot be located at all but a value is still required
# (reference interpolator.py:1468-1471).
FALLBACK_REF_COORD = (0.645, -0.5, 0.22)

# Parameter-set presets (reference multi_mesh/utils.py:171-188).
PARAM_PRESETS = {
    "TTI": ["VPV", "VPH", "VSV", "VSH", "RHO", "ETA", "QKAPPA", "QMU"],
    "ISO": ["QKAPPA", "QMU", "RHO", "VP", "VS"],
}
