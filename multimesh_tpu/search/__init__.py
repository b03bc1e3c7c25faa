from .knn import knn  # noqa: F401
from .locate import locate, LocateResult  # noqa: F401
