from . import gll, shape  # noqa: F401
