"""Ports of S2Test.testCCW/testAngleArea and S2EdgeUtilTest.testCrossings/
testGetDistance/testGetClosestPoint to the vectorized predicates kernel.

Reference: /root/reference/tests/com/google/common/geometry/{S2Test,S2EdgeUtilTest}.java
"""

from __future__ import annotations

import math

import numpy as np

from s2_geometry_library_java_spark.kernel import predicates as pr

RNG = np.random.default_rng(123456)


def P(x, y, z):
    return np.array([float(x), float(y), float(z)])


def N(x, y, z):
    v = P(x, y, z)
    return v / np.linalg.norm(v)


DEGENERATE = -2


def _assert_crossing(a, b, c, d, robust, edge_or_vertex, simple):
    got = int(pr.robust_crossing(a, b, c, d))
    if robust == DEGENERATE:
        assert got <= 0
    else:
        assert got == robust, (a, b, c, d, got, robust)
    if simple and robust != DEGENERATE:
        assert bool(pr.simple_crossing(a, b, c, d)) == (robust > 0)
    assert bool(pr.edge_or_vertex_crossing(a, b, c, d)) == edge_or_vertex


def _assert_crossings(a, b, c, d, robust, edge_or_vertex, simple):
    # S2EdgeUtilTest.assertCrossings (:64-80) symmetry battery.
    _assert_crossing(a, b, c, d, robust, edge_or_vertex, simple)
    _assert_crossing(b, a, c, d, robust, edge_or_vertex, simple)
    _assert_crossing(a, b, d, c, robust, edge_or_vertex, simple)
    _assert_crossing(b, a, d, c, robust, edge_or_vertex, simple)
    _assert_crossing(a, a, c, d, DEGENERATE, False, False)
    _assert_crossing(a, b, c, c, DEGENERATE, False, False)
    _assert_crossing(a, b, a, b, 0, True, False)
    _assert_crossing(c, d, a, b, robust, edge_or_vertex ^ (robust == 0), simple)


def test_crossings():
    # S2EdgeUtilTest.testCrossings (:81-148)
    _assert_crossings(N(1, 2, 1), N(1, -3, 0.5), N(1, -0.5, -3), N(0.1, 0.5, 3), 1, True, True)
    _assert_crossings(N(1, 2, 1), N(1, -3, 0.5), N(-1, 0.5, 3), N(-0.1, -0.5, -3), -1, False, True)
    _assert_crossings(N(0, 0, -1), N(0, 1, 0), N(0, 1, 1), N(0, 0, 1), -1, False, True)
    _assert_crossings(N(1, 0, 0), N(0, 1, 0), N(0, 0, 1), N(1, 1, -1), 1, True, True)
    _assert_crossings(N(1, 0, 0), N(0, 1, 0), N(0, 0, -1), N(-1, -1, 1), -1, False, True)
    _assert_crossings(N(2, 3, 4), N(-1, 2, 5), N(7, -2, 3), N(2, 3, 4), 0, False, True)
    _assert_crossings(N(1, 1, 1), N(1, 1 - 1e-15, -1), N(-1, -1, 0), N(1, 1, 0), 1, True, False)


def test_ccw_golden():
    # S2Test.testCCW (:191-196): nearly-colinear points must not be 0.
    a = P(0.72571927877036835, 0.46058825605889098, 0.51106749730504852)
    b = P(0.7257192746638208, 0.46058826573818168, 0.51106749441312738)
    c = P(0.72571927671709457, 0.46058826089853633, 0.51106749585908795)
    assert int(pr.robust_ccw(a, b, c)) != 0


def test_ccw_antisymmetry_mass():
    # robustCCW(c,b,a) == -robustCCW(a,b,c); rotation-invariance.
    pts = RNG.normal(size=(3000, 3, 3))
    pts /= np.linalg.norm(pts, axis=-1, keepdims=True)
    a, b, c = pts[:, 0], pts[:, 1], pts[:, 2]
    f = pr.robust_ccw(a, b, c)
    assert (pr.robust_ccw(c, b, a) == -f).all()
    assert (pr.robust_ccw(b, c, a) == f).all()


def test_angle_area():
    # S2Test.testAngleArea (:124-188)
    pz, p000, p045, p090, p180 = P(0, 0, 1), P(1, 0, 0), N(1, 1, 0), P(0, 1, 0), P(-1, 0, 0)
    # angle(a,b,c) in reference == angle at vertex b: cross(a,b) vs cross(c,b)
    def vert_angle(a, b, c):
        return float(pr.angle(pr.cross(a, b), pr.cross(c, b)))

    assert abs(vert_angle(p000, pz, p045) - math.pi / 4) < 1e-9
    assert abs(vert_angle(p045, pz, p180) - 3 * math.pi / 4) < 1e-9
    assert abs(vert_angle(p000, pz, p180) - math.pi) < 1e-9
    assert abs(vert_angle(pz, p000, pz) - 0) < 1e-9
    assert abs(vert_angle(pz, p000, p045) - math.pi / 2) < 1e-9

    assert abs(float(pr.area(p000, p090, pz)) - math.pi / 2) < 1e-9
    assert abs(float(pr.area(p045, pz, p180)) - 3 * math.pi / 4) < 1e-9

    eps = 1e-10
    pepsx = N(eps, 0, 1)
    pepsy = N(0, eps, 1)
    expected1 = 0.5 * eps * eps
    assert abs(float(pr.area(pepsx, pepsy, pz)) - expected1) < 1e-14 * expected1

    pr_ = P(0.257, -0.5723, 0.112)
    pq = P(-0.747, 0.401, 0.2235)
    assert float(pr.area(pr_, pr_, pr_)) == 0.0
    assert abs(float(pr.area(pr_, pq, pr_))) < 1e-9
    assert float(pr.area(p000, p045, p090)) == 0.0

    # Small-displacement mass test (:158-166).
    p0 = RNG.normal(size=(5000, 3))
    p0 /= np.linalg.norm(p0, axis=1, keepdims=True)
    d1 = RNG.normal(size=(5000, 3))
    d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
    d2 = RNG.normal(size=(5000, 3))
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    p1 = p0 + d1 * 1e-15
    p2 = p0 + d2 * 1e-15
    assert (pr.area(p0, p1, p2) < 0.7e-30).all()

    # Long skinny triangle golden (:169-171).
    p045eps = N(1, 1, eps)
    expected2 = 5.8578643762690495119753e-11
    assert abs(float(pr.area(p000, p045eps, p090)) - expected2) < 1e-9 * expected2

    # Quarter-sphere sums (:174-187).
    eps2 = 1e-10
    p000eps2 = N(1, 0.1 * eps2, eps2)
    q1 = (
        float(pr.area(p000eps2, p000, p090))
        + float(pr.area(p000eps2, p090, p180))
        + float(pr.area(p000eps2, p180, pz))
        + float(pr.area(p000eps2, pz, p000))
    )
    assert abs(q1 - math.pi) < 1e-9
    p045eps2 = N(1, 1, eps2)
    q2 = (
        float(pr.area(p045eps2, p000, p090))
        + float(pr.area(p045eps2, p090, p180))
        + float(pr.area(p045eps2, p180, pz))
        + float(pr.area(p045eps2, pz, p000))
    )
    assert abs(q2 - math.pi) < 1e-9


def _check_distance(x, a, b, distance_radians, expected_closest):
    # S2EdgeUtilTest.checkDistance (:417-434)
    x, a, b = N(*x), N(*a), N(*b)
    assert abs(float(pr.edge_distance(x, a, b)) - distance_radians) < 1e-10
    closest = pr.closest_point_on_edge(x, a, b)
    if expected_closest == (0, 0, 0):
        assert np.array_equal(closest, a) or np.array_equal(closest, b)
    else:
        ec = N(*expected_closest)
        assert float(pr.angle(closest, ec)) <= 1e-15 or np.allclose(closest, ec, atol=1e-12)


def test_get_distance():
    # S2EdgeUtilTest.testGetDistance (:437-467)
    _check_distance((1, 0, 0), (1, 0, 0), (0, 1, 0), 0, (1, 0, 0))
    _check_distance((0, 1, 0), (1, 0, 0), (0, 1, 0), 0, (0, 1, 0))
    _check_distance((1, 3, 0), (1, 0, 0), (0, 1, 0), 0, (1, 3, 0))
    _check_distance((0, 0, 1), (1, 0, 0), (0, 1, 0), math.pi / 2, (1, 0, 0))
    _check_distance((0, 0, -1), (1, 0, 0), (0, 1, 0), math.pi / 2, (1, 0, 0))
    _check_distance((-1, -1, 0), (1, 0, 0), (0, 1, 0), 0.75 * math.pi, (0, 0, 0))
    _check_distance((0, 1, 0), (1, 0, 0), (1, 1, 0), math.pi / 4, (1, 1, 0))
    _check_distance((0, -1, 0), (1, 0, 0), (1, 1, 0), math.pi / 2, (1, 0, 0))
    _check_distance((0, -1, 0), (1, 0, 0), (-1, 1, 0), math.pi / 2, (1, 0, 0))
    _check_distance((-1, -1, 0), (1, 0, 0), (-1, 1, 0), math.pi / 2, (-1, 1, 0))
    _check_distance((1, 1, 1), (1, 0, 0), (0, 1, 0), math.asin(math.sqrt(1.0 / 3)), (1, 1, 0))
    _check_distance((1, 1, -1), (1, 0, 0), (0, 1, 0), math.asin(math.sqrt(1.0 / 3)), (1, 1, 0))
    _check_distance((-1, 0, 0), (1, 1, 0), (1, 1, 0), 0.75 * math.pi, (1, 1, 0))
    _check_distance((0, 0, -1), (1, 1, 0), (1, 1, 0), math.pi / 2, (1, 1, 0))
    _check_distance((-1, 0, 0), (1, 0, 0), (1, 0, 0), math.pi, (1, 0, 0))


def test_get_closest_point_golden():
    # S2EdgeUtilTest.testGetClosestPoint (:391-414)
    from s2_geometry_library_java_spark.kernel import cellid as c

    def ll(lat, lng):
        return c.latlng_degrees_to_xyz(np.array([lat]), np.array([lng]))[0]

    a, b = ll(-0.5, 0), ll(0.5, 0)
    assert np.array_equal(pr.closest_point_on_edge(a, a, b), a)
    assert np.array_equal(pr.closest_point_on_edge(b, a, b), b)
    mid = ll(0, 0)
    assert float(pr.angle(pr.closest_point_on_edge(mid, a, b), mid)) < 1e-15
    assert np.array_equal(pr.closest_point_on_edge(ll(-1, 0), a, b), a)
    assert np.array_equal(pr.closest_point_on_edge(ll(1, 0), a, b), b)
    x = ll(0.1, 1)
    expected = ll(0.1, 0)
    got = pr.closest_point_on_edge(x, a, b)
    assert np.abs(got - expected).max() < 1e-6


def test_loop_parity_square():
    # A 20-degree square at the equator: parity kernel vs known containment.
    from s2_geometry_library_java_spark.kernel import cellid as c

    lats = np.array([-10.0, -10.0, 10.0, 10.0])
    lngs = np.array([-10.0, 10.0, 10.0, -10.0])
    verts = c.latlng_degrees_to_xyz(lats, lngs)  # CCW square

    # Note: the great-circle edge between (10,10) and (10,-10) bulges poleward
    # to ~10.15 deg at lng 0, so (10.1, 0) is inside; (11, 0) is outside.
    qlat = np.array([0.0, 0.0, 20.0, -20.0, 5.0, 9.9, 10.1, 11.0, 0.0])
    qlng = np.array([0.0, 20.0, 0.0, 0.0, -5.0, 9.9, 0.0, 0.0, 179.0])
    pts = c.latlng_degrees_to_xyz(qlat, qlng)
    parity = pr.loop_crossing_parity(verts, pts)
    # origin (0,1,0) = (lat 0, lng 90) is OUTSIDE this square -> contains == parity
    expect = np.array([True, False, False, False, True, True, True, False, False])
    assert (parity == expect).all()


def test_haversine_vs_angle_mass():
    lat1, lng1, lat2, lng2 = (RNG.uniform(-np.pi / 2, np.pi / 2, 2000), RNG.uniform(-np.pi, np.pi, 2000),
                              RNG.uniform(-np.pi / 2, np.pi / 2, 2000), RNG.uniform(-np.pi, np.pi, 2000))
    from s2_geometry_library_java_spark.kernel import cellid as c

    p1 = c.latlng_radians_to_xyz(lat1, lng1)
    p2 = c.latlng_radians_to_xyz(lat2, lng2)
    hv = pr.haversine_radians(lat1, lng1, lat2, lng2)
    ang = pr.angle(p1, p2)
    assert np.abs(hv - ang).max() < 1e-8


def test_intersection_tolerance():
    # S2EdgeUtilTest.java testIntersectionTolerance: edges crossing at angles
    # down to 1e-15 — the computed intersection x need not be near the true
    # crossing p, but MUST lie within DEFAULT_INTERSECTION_TOLERANCE of both
    # edges and be ordered between each edge's endpoints.  Same construction
    # as the reference with a fixed numpy seed (the property, not the RNG
    # stream, is what the reference pins — seed 123456 per GeometryTestCase).
    rng = np.random.RandomState(123456)

    def rand_frame():
        p = rng.randn(3)
        p /= np.linalg.norm(p)
        d1 = np.cross(p, rng.randn(3))
        d1 /= np.linalg.norm(d1)
        d2 = np.cross(p, d1)
        d2 /= np.linalg.norm(d2)
        return p, d1, d2

    def unit(v):
        return v / np.linalg.norm(v)

    for _ in range(1000):
        p, d1, d2 = rand_frame()
        slope = 1e-15 ** rng.rand()
        d2 = d1 + d2 * slope
        a = unit(p + d1 * (1e-15 / slope) ** rng.rand())
        b = unit(p - d1 * (1e-15 / slope) ** rng.rand())
        c = unit(p + d2 * (1e-15 / slope) ** rng.rand())
        d = unit(p - d2 * (1e-15 / slope) ** rng.rand())
        x = pr.get_intersection(a, b, c, d)
        dist_ab = float(pr.edge_distance(x, a, b))
        dist_cd = float(pr.edge_distance(x, c, d))
        assert dist_ab < pr.DEFAULT_INTERSECTION_TOLERANCE
        assert dist_cd < pr.DEFAULT_INTERSECTION_TOLERANCE
        assert pr.ordered_ccw(a, x, b, unit(pr.robust_cross_prod(a, b)))
        assert pr.ordered_ccw(c, x, d, unit(pr.robust_cross_prod(c, d)))
