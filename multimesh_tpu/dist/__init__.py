from .sharding import make_mesh, sharded_transfer  # noqa: F401
