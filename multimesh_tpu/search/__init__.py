from .knn import knn  # noqa: F401
from .grid import knn_any, grid_knn, build_grid, GridIndex  # noqa: F401
from .locate import locate, LocateResult, default_engine  # noqa: F401
