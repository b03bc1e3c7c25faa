"""Native WGS84 geodesic (Vincenty) vs closed-form ellipsoid constants."""
import numpy as np
import pytest

from multimesh_tpu import geodesic as geod
from multimesh_tpu.utils import greatcircle_points


def test_quarter_meridian():
    """Equator to pole along a meridian: the WGS84 quarter-meridian
    length is a published constant (10 001 965.729 m)."""
    r = geod.inverse(0.0, 0.0, 90.0, 0.0)
    assert abs(r.s12 - 10001965.7293) < 0.01
    assert abs(r.azi1) < 1e-9  # due north


def test_quarter_equator():
    """Along the equator the geodesic is a circle of radius a:
    s = a * pi/2."""
    r = geod.inverse(0.0, 0.0, 0.0, 90.0)
    assert abs(r.s12 - geod.WGS84_A * np.pi / 2.0) < 0.01
    assert abs(r.azi1 - 90.0) < 1e-9  # due east


def test_direct_inverse_roundtrip():
    rng = np.random.default_rng(7)
    for _ in range(25):
        lat1, lat2 = rng.uniform(-80, 80, 2)
        lon1, lon2 = rng.uniform(-179, 179, 2)
        inv = geod.inverse(lat1, lon1, lat2, lon2)
        fwd = geod.direct(lat1, lon1, inv.azi1, inv.s12)
        assert abs(fwd.lat2 - lat2) < 1e-8
        dlon = (fwd.lon2 - lon2 + 180.0) % 360.0 - 180.0
        assert abs(dlon) < 1e-8


def test_waypoints_equally_spaced():
    """Sampled points must sit at i * s12 / npts along the geodesic
    (the reference's convention, reference utils.py:545-574: end point
    excluded)."""
    lat1, lon1, lat2, lon2 = 10.0, -30.0, 45.0, 40.0
    npts = 20
    pts = geod.waypoints(lat1, lon1, lat2, lon2, npts)
    assert pts.shape == (npts, 2)
    np.testing.assert_allclose(pts[0], [lat1, lon1], atol=1e-12)
    total = geod.inverse(lat1, lon1, lat2, lon2).s12
    for i in (1, 7, npts - 1):
        d = geod.inverse(lat1, lon1, pts[i, 0], pts[i, 1]).s12
        assert abs(d - i * total / npts) < 1e-3  # mm-level


def test_antipodal_raises_and_greatcircle_falls_back():
    with pytest.raises(geod.GeodesicError):
        geod.inverse(10.0, 20.0, -10.0, -160.0)  # exact antipode
    pts = greatcircle_points(10.0, 20.0, -10.0, -160.0, npts=11)
    assert pts.shape == (11, 2)
    assert np.isfinite(pts).all()


def test_greatcircle_points_uses_ellipsoid():
    """greatcircle_points must follow the WGS84 geodesic, not the
    sphere: for a long oblique path the two differ by ~0.1 deg in
    latitude mid-path."""
    pts = greatcircle_points(0.0, 0.0, 60.0, 100.0, npts=50)
    mid = pts[25]
    d = geod.inverse(0.0, 0.0, mid[0], mid[1]).s12
    total = geod.inverse(0.0, 0.0, 60.0, 100.0).s12
    assert abs(d - 25 * total / 50) < 1.0
