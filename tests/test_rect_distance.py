"""Port of S2LatLngRectTest.testGetDistance* (S2LatLngRectTest.java:291-380):
rect<->rect and rect<->point distances vs the brute-force oracle the
reference uses (densely sampled boundary distance)."""

import math

import numpy as np

from s2_geometry_library_java_spark.geometry.latlng_rect import (
    S2LatLngRect,
    rect_point_distance,
    rect_rect_distance,
)
from s2_geometry_library_java_spark.kernel import cellid as ck

RNG = np.random.default_rng(123456)


def rect_deg(lat_lo, lng_lo, lat_hi, lng_hi):
    return S2LatLngRect.from_degrees(lat_lo, lng_lo, lat_hi, lng_hi)


def point_rect(lat, lng):
    return rect_deg(lat, lng, lat, lng)


def _brute(a: S2LatLngRect, b: S2LatLngRect, samples=600) -> float:
    def boundary(rect):
        lats = np.linspace(rect.lat.lo, rect.lat.hi, samples)
        if rect.lng.lo <= rect.lng.hi:
            lngs = np.linspace(rect.lng.lo, rect.lng.hi, samples)
        else:
            lngs = np.concatenate(
                [np.linspace(rect.lng.lo, math.pi, samples // 2), np.linspace(-math.pi, rect.lng.hi, samples // 2)]
            )
        pts = [(la, lngs[0]) for la in lats] + [(la, lngs[-1]) for la in lats]
        pts += [(lats[0], lg) for lg in lngs] + [(lats[-1], lg) for lg in lngs]
        arr = np.array(pts)
        return ck.latlng_radians_to_xyz(arr[:, 0], arr[:, 1])

    pa, pb = boundary(a), boundary(b)
    d = pa @ pb.T
    np.clip(d, -1, 1, out=d)
    return float(np.arccos(d).min())


def verify_distance(a, b, tol=1e-2):
    got = rect_rect_distance(a, b)
    if a.intersects_rect(b):
        assert got == 0.0
    else:
        assert abs(got - _brute(a, b)) < tol, (got, _brute(a, b))
    assert abs(rect_rect_distance(b, a) - got) < 1e-15  # symmetry


def test_distance_overlapping():
    # S2LatLngRectTest.testGetDistanceOverlapping (:291-306)
    a = rect_deg(0, 0, 2, 2)
    b = point_rect(0, 0)
    assert rect_rect_distance(a, a) == 0.0
    assert rect_rect_distance(a, b) == 0.0
    assert rect_rect_distance(b, b) == 0.0
    assert rect_point_distance(a, 0.0, 0.0) == 0.0
    for r in [(0, 1, 2, 3), (0, 2, 2, 4), (1, 0, 3, 2), (2, 0, 4, 2), (1, 1, 3, 3), (2, 2, 4, 4)]:
        assert rect_rect_distance(a, rect_deg(*r)) == 0.0


def test_distance_rect_vs_point():
    # S2LatLngRectTest.testGetDistanceRectVsPoint (:308-340)
    a = rect_deg(-1, -1, 2, 1)
    for plat, plng in [(-2, -1), (1, 2)]:
        verify_distance(a, point_rect(plat, plng))
        got = rect_point_distance(a, math.radians(plat), math.radians(plng))
        assert abs(got - rect_rect_distance(a, point_rect(plat, plng))) < 1e-12

    b = rect_deg(86, 0, 88, 2)
    for plat, plng in [(87, 3), (87, -1), (89, 1), (89, 181), (85, 1), (85, 181), (90, 0)]:
        verify_distance(b, point_rect(plat, ((plng + 180) % 360) - 180))


def test_distance_random_pairs():
    for _ in range(40):
        la1, la2 = sorted(RNG.uniform(-80, 80, 2))
        lo1 = RNG.uniform(-180, 180)
        w1 = RNG.uniform(5, 90)
        a = rect_deg(la1, lo1, la2, ((lo1 + w1 + 180) % 360) - 180)
        lb1, lb2 = sorted(RNG.uniform(-80, 80, 2))
        lo2 = RNG.uniform(-180, 180)
        w2 = RNG.uniform(5, 90)
        b = rect_deg(lb1, lo2, lb2, ((lo2 + w2 + 180) % 360) - 180)
        verify_distance(a, b)
