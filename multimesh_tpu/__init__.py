"""multimesh_tpu -- a TPU-native mesh-to-mesh interpolation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
solvithrastar/MultiMesh: transferring model parameters between unstructured
spectral-element (GLL) and hexahedral (Exodus) meshes, querying models at
point clouds / regular grids, and plotting.

The reference computes everything in float64 on the host
(reference multi_mesh/utils.py:212 and the asfortranarray float64 casts
throughout interpolator.py); we enable JAX x64 at import so host-side
arrays and the accuracy-critical device stages keep full precision, while
the hot device kernels explicitly down-cast to float32 per the configured
precision policy (see config.Precision).
"""
import jax as _jax

_jax.config.update("jax_enable_x64", True)

from . import config  # noqa: E402,F401
from . import core  # noqa: E402,F401

__version__ = "0.1.0"
