from .salvus import (  # noqa: F401
    SalvusMesh,
    write_salvus_mesh,
    load_hdf5_params,
    recreate_dataset,
    format_dim_label,
    parse_dim_label,
)
from .exodus import Exodus, write_exodus  # noqa: F401
