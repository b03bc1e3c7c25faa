from .sharding import (  # noqa: F401
    make_mesh,
    sharded_transfer,
    source_sharded_transfer,
    partition_source,
)
