"""S2LatLngRectTest.testBasic port (S2LatLngRectTest.java:61-261): the
constructor/accessor suite, the rect-pair relation matrix, add_point /
expanded / convolve_with_cap / get_cap_bound fixtures, and the full
testCellOps rect-vs-cell relationship ladder (0=no intersection,
1=may_intersect, 2=intersects, 3=vertex containment, 4=contains)."""

import math

import numpy as np

from s2_geometry_library_java_spark.geometry.cap import S2Cap
from s2_geometry_library_java_spark.geometry.cell import S2Cell
from s2_geometry_library_java_spark.geometry.interval import R1Interval, S1Interval
from s2_geometry_library_java_spark.geometry.latlng_rect import (
    S2LatLngRect,
    _latlng_of,
    _to_point,
)
from s2_geometry_library_java_spark.kernel import predicates as pr

PI = math.pi
PI_2 = math.pi / 2
PI_4 = math.pi / 4
D = math.pi / 180.0


def rect_deg(lat_lo, lng_lo, lat_hi, lng_hi):
    return S2LatLngRect.from_degrees(lat_lo, lng_lo, lat_hi, lng_hi)


def _rect_ops(x, y, expected, expected_union, expected_intersection):
    # S2LatLngRectTest.java:36-59 testIntervalOps
    assert x.contains_rect(y) == (expected[0] == "T")
    assert x.interior_contains_rect(y) == (expected[1] == "T")
    assert x.intersects_rect(y) == (expected[2] == "T")
    assert x.interior_intersects_rect(y) == (expected[3] == "T")
    assert x.contains_rect(y) == (x.union(y) == x)
    assert x.intersects_rect(y) == (not x.intersection(y).is_empty())
    assert x.union(y) == expected_union
    assert x.intersection(y) == expected_intersection
    if y.lat.get_length() == 0 and y.lng.get_length() == 0:
        assert x.add_point(y.lat.lo, y.lng.lo) == expected_union


def _cell_ops(r, cell, level):
    # S2LatLngRectTest.java:43-59 testCellOps
    vertex_contained = False
    for i in range(4):
        if r.contains_point(cell.get_vertex_raw(i)) or (
            not r.is_empty() and cell.contains_point(_to_point(*r.get_vertex(i)))
        ):
            vertex_contained = True
    assert r.may_intersect_cell(cell) == (level >= 1)
    assert r.intersects_cell(cell) == (level >= 2)
    assert vertex_contained == (level >= 3)
    assert r.contains_cell(cell) == (level >= 4)


def test_basic():
    empty = S2LatLngRect.empty()
    full = S2LatLngRect.full()
    assert empty.is_valid() and empty.is_empty()
    assert full.is_valid() and full.is_full()

    d1 = rect_deg(-90, 0, -45, 180)
    assert abs(d1.lat.lo / D - (-90)) < 1e-12
    assert abs(d1.lat.hi / D - (-45)) < 1e-12
    assert abs(d1.lng.lo / D - 0) < 1e-12
    assert abs(d1.lng.hi / D - 180) < 1e-12
    assert d1.lat == R1Interval(-PI_2, -PI_4)
    assert d1.lng == S1Interval(0, PI)

    # from_center_size
    assert S2LatLngRect.from_center_size(80 * D, 170 * D, 40 * D, 60 * D).approx_equals(
        rect_deg(60, 140, 90, -160)
    )
    assert S2LatLngRect.from_center_size(10 * D, 40 * D, 210 * D, 400 * D).is_full()
    assert S2LatLngRect.from_center_size(-90 * D, 180 * D, 20 * D, 50 * D).approx_equals(
        rect_deg(-90, 155, -80, -155)
    )

    # from_point / from_point_pair
    assert S2LatLngRect.from_point(d1.lat.lo, d1.lng.lo) == S2LatLngRect(
        R1Interval.from_point(d1.lat.lo), S1Interval.from_point(d1.lng.lo)
    )
    assert S2LatLngRect.from_point_pair(-35 * D, -140 * D, 15 * D, 155 * D) == rect_deg(
        -35, 155, 15, -140
    )
    assert S2LatLngRect.from_point_pair(25 * D, -70 * D, -90 * D, 80 * D) == rect_deg(
        -90, -70, 25, 80
    )

    # center / vertices / point containment
    r1 = S2LatLngRect(R1Interval(0, PI_2), S1Interval(-PI, 0))
    assert r1.get_center() == (PI_4, -PI_2)
    assert r1.get_vertex(0) == (0, PI)
    assert r1.get_vertex(1) == (0, 0)
    assert r1.get_vertex(2) == (PI_2, 0)
    assert r1.get_vertex(3) == (PI_2, PI)
    assert r1.contains_latlng(30 * D, -45 * D)
    assert not r1.contains_latlng(30 * D, 45 * D)
    assert not r1.interior_contains_latlng(0, -PI)
    assert not r1.interior_contains_latlng(PI_2, 0)
    assert r1.contains_point(np.array([0.5, -0.3, 0.1]))
    assert not r1.contains_point(np.array([0.5, 0.2, 0.1]))

    # get_vertex returns CCW order
    for i in range(4):
        lat = PI_4 * (i - 2)
        lng = PI_2 * (i - 2) + 0.2
        r = S2LatLngRect(
            R1Interval(lat, lat + PI_4),
            S1Interval(math.remainder(lng, 2 * PI), math.remainder(lng + PI_2, 2 * PI)),
        )
        for k in range(4):
            assert pr.simple_ccw(
                _to_point(*r.get_vertex((k - 1) & 3)),
                _to_point(*r.get_vertex(k)),
                _to_point(*r.get_vertex((k + 1) & 3)),
            )

    # rect-pair relation matrix
    r1_mid = rect_deg(45, -90, 45, -90)
    r_eq_m180 = S2LatLngRect(R1Interval(0, 0), S1Interval.from_point(-PI))
    r_north_pole = S2LatLngRect(R1Interval(PI_2, PI_2), S1Interval.from_point(0))

    _rect_ops(r1, r1_mid, "TTTT", r1, r1_mid)
    _rect_ops(r1, r_eq_m180, "TFTF", r1, r_eq_m180)
    _rect_ops(r1, r_north_pole, "TFTF", r1, r_north_pole)

    assert r1 == rect_deg(0, -180, 90, 0)
    _rect_ops(r1, rect_deg(-10, -1, 1, 20), "FFTT", rect_deg(-10, -180, 90, 20), rect_deg(0, -1, 1, 0))
    _rect_ops(r1, rect_deg(-10, -1, 0, 20), "FFTF", rect_deg(-10, -180, 90, 20), rect_deg(0, -1, 0, 0))
    _rect_ops(r1, rect_deg(-10, 0, 1, 20), "FFTF", rect_deg(-10, -180, 90, 20), rect_deg(0, 0, 1, 0))

    _rect_ops(
        rect_deg(-15, -160, -15, -150), rect_deg(20, 145, 25, 155), "FFFF",
        rect_deg(-15, 145, 25, -150), empty,
    )
    _rect_ops(
        rect_deg(70, -10, 90, -140), rect_deg(60, 175, 80, 5), "FFTT",
        rect_deg(60, -180, 90, 180), rect_deg(70, 175, 80, 5),
    )

    # lat-overlap-only / lng-overlap-only intersections are empty but valid
    _rect_ops(rect_deg(12, 30, 60, 60), rect_deg(0, 0, 30, 18), "FFFF", rect_deg(0, 0, 60, 60), empty)
    _rect_ops(rect_deg(0, 0, 18, 42), rect_deg(30, 12, 42, 60), "FFFF", rect_deg(0, 0, 42, 60), empty)

    # add_point
    p = S2LatLngRect.empty()
    p = p.add_point(0, 0)
    p = p.add_point(0, -PI_2)
    p = p.add_point(PI_4, -PI)
    lat, lng = _latlng_of(np.array([0.0, 0.0, 1.0]))
    p = p.add_point(lat, lng)
    assert p == r1

    # expanded
    assert rect_deg(70, 150, 80, 170).expanded(20 * D, 30 * D).approx_equals(rect_deg(50, 120, 90, -160))
    assert S2LatLngRect.empty().expanded(20 * D, 30 * D).is_empty()
    assert S2LatLngRect.full().expanded(20 * D, 30 * D).is_full()
    assert rect_deg(-90, 170, 10, 20).expanded(30 * D, 80 * D).approx_equals(rect_deg(-90, -180, 40, 180))

    # convolve_with_cap
    llr1 = S2LatLngRect.from_point_pair(0, 170 * D, 0, -170 * D).convolve_with_cap(15 * D)
    llr2 = rect_deg(-15, 155, 15, -155)
    assert llr1.approx_equals(llr2, 1e-9)
    llr1 = S2LatLngRect.from_point_pair(60 * D, 150 * D, 80 * D, 10 * D).convolve_with_cap(15 * D)
    llr2 = rect_deg(45, -180, 90, 180)
    assert llr1.approx_equals(llr2, 1e-9)

    # get_cap_bound
    assert rect_deg(-45, -45, 45, 45).get_cap_bound().approx_equals(
        S2Cap.from_axis_height(np.array([1.0, 0.0, 0.0]), 0.5)
    )
    assert rect_deg(88, -80, 89, 80).get_cap_bound().approx_equals(
        S2Cap.from_axis_angle(np.array([0.0, 0.0, 1.0]), 2 * D)
    )
    assert rect_deg(-30, -150, -10, 50).get_cap_bound().approx_equals(
        S2Cap.from_axis_angle(np.array([0.0, 0.0, -1.0]), 80 * D)
    )


def test_cell_ops():
    empty = S2LatLngRect.empty()
    full = S2LatLngRect.full()

    # Special cases.
    _cell_ops(empty, S2Cell.from_face_pos_level(3, 0, 0), 0)
    _cell_ops(full, S2Cell.from_face_pos_level(2, 0, 0), 4)
    _cell_ops(full, S2Cell.from_face_pos_level(5, 0, 25), 4)

    # First quadrant of face 0, slightly expanded.
    r4 = rect_deg(-45.1, -45.1, 0.1, 0.1)
    _cell_ops(r4, S2Cell.from_face_pos_level(0, 0, 0), 3)
    _cell_ops(r4, S2Cell.from_face_pos_level(0, 0, 1), 4)
    _cell_ops(r4, S2Cell.from_face_pos_level(1, 0, 1), 0)

    # Rectangle intersecting the first quadrant of face 0.
    r5 = rect_deg(-10, -45, 10, 0)
    _cell_ops(r5, S2Cell.from_face_pos_level(0, 0, 0), 3)
    _cell_ops(r5, S2Cell.from_face_pos_level(0, 0, 1), 3)
    _cell_ops(r5, S2Cell.from_face_pos_level(1, 0, 1), 0)

    # Rectangle consisting of a single point.
    _cell_ops(rect_deg(4, 4, 4, 4), S2Cell.from_face_pos_level(0, 0, 0), 3)

    # Intersects the bounding rectangle of a face but not the face itself.
    _cell_ops(rect_deg(41, -87, 42, -79), S2Cell.from_face_pos_level(2, 0, 0), 1)
    _cell_ops(rect_deg(-41, 160, -40, -160), S2Cell.from_face_pos_level(5, 0, 0), 1)

    # Leaf cell at the top-right corner of face 0.
    cell0tr = S2Cell.from_point(np.array([1.0 + 1e-12, 1.0, 1.0]))
    v0_lat, v0_lng = _latlng_of(cell0tr.get_vertex_raw(0))
    _cell_ops(
        rect_deg(v0_lat / D - 1e-8, v0_lng / D - 1e-8, v0_lat / D - 2e-10, v0_lng / D + 1e-10),
        cell0tr,
        1,
    )

    # Rectangles intersecting a face with no vertex of either region
    # contained by the other; the first passes through a face-cell corner.
    _cell_ops(rect_deg(-37, -70, -36, -20), S2Cell.from_face_pos_level(5, 0, 0), 2)
    cell202 = S2Cell.from_face_pos_level(2, 0, 2)
    bound202 = cell202.get_rect_bound()
    _cell_ops(
        rect_deg(
            bound202.lat.lo / D + 3, bound202.lng.lo / D + 3,
            bound202.lat.hi / D - 3, bound202.lng.hi / D - 3,
        ),
        cell202,
        2,
    )


def test_area():
    # S2LatLngRectTest.java testArea
    assert S2LatLngRect.empty().area() == 0.0
    assert abs(S2LatLngRect.full().area() - 4 * PI) < 1e-12
    assert abs(rect_deg(0, 0, 90, 90).area() - PI / 2) < 1e-12
