from .colormaps import get_colormap, roma, roma_r  # noqa: F401
from .plotter import (  # noqa: F401
    plot_depth_slice,
    plot_cross_section,
    create_projection,
    elliptic_to_geocentric_latitude,
    locations2degrees,
)
