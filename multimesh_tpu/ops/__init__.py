from .transfer import TransferOperator, content_fingerprint  # noqa: F401
from .dedup import (  # noqa: F401
    unique_points,
    unique_points_cached,
    unique_points_per_layer,
)
from .layers import (  # noqa: F401
    resolve_layers,
    layer_masks,
    mesh_layer_masks,
)
from .spherical import map_to_sphere, map_to_ellipse  # noqa: F401
from .fluid import repair_fluid_solid  # noqa: F401
