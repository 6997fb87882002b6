"""R1Interval / S1Interval reference-test ports.

The interval classes carry the trickiest semantic parity in the repo (the
±pi wrap normalization feeding S2LatLngRect and RectBounder), so the
reference's full relation matrices are ported verbatim:
R1IntervalTest.java:26-113 and S1IntervalTest.java:21-260.
"""

import math

from s2_geometry_library_java_spark.geometry.interval import R1Interval, S1Interval

PI = math.pi
PI_2 = math.pi / 2


def _r1_ops(x: R1Interval, y: R1Interval, expected: str):
    assert x.contains_interval(y) == (expected[0] == "T")
    assert x.interior_contains_interval(y) == (expected[1] == "T")
    assert x.intersects(y) == (expected[2] == "T")
    assert x.interior_intersects(y) == (expected[3] == "T")
    assert x.contains_interval(y) == (x.union(y) == x)
    assert x.intersects(y) == (not x.intersection(y).is_empty())


def test_r1_basic():
    # R1IntervalTest.java:36-113 testBasic, ported line for line.
    unit = R1Interval(0, 1)
    negunit = R1Interval(-1, 0)
    assert (unit.lo, unit.hi) == (0.0, 1.0)
    assert (negunit.lo, negunit.hi) == (-1.0, 0.0)

    half = R1Interval(0.5, 0.5)
    empty = R1Interval.empty()
    assert not unit.is_empty() and not half.is_empty() and empty.is_empty()

    assert unit.get_center() == 0.5
    assert half.get_center() == 0.5
    assert negunit.get_length() == 1.0
    assert half.get_length() == 0.0
    assert empty.get_length() < 0

    assert unit.contains(0.5) and unit.interior_contains(0.5)
    assert unit.contains(0) and not unit.interior_contains(0)
    assert unit.contains(1) and not unit.interior_contains(1)

    _r1_ops(empty, empty, "TTFF")
    _r1_ops(empty, unit, "FFFF")
    _r1_ops(unit, half, "TTTT")
    _r1_ops(unit, unit, "TFTT")
    _r1_ops(unit, empty, "TTFF")
    _r1_ops(unit, negunit, "FFTF")
    _r1_ops(unit, R1Interval(0, 0.5), "TFTT")
    _r1_ops(half, R1Interval(0, 0.5), "FFTF")

    r = empty.add_point(5)
    assert (r.lo, r.hi) == (5.0, 5.0)
    r = r.add_point(-1)
    assert (r.lo, r.hi) == (-1.0, 5.0)
    r = r.add_point(0)
    assert (r.lo, r.hi) == (-1.0, 5.0)

    assert R1Interval.from_point_pair(4, 4) == R1Interval(4, 4)
    assert R1Interval.from_point_pair(-1, -2) == R1Interval(-2, -1)
    assert R1Interval.from_point_pair(-5, 3) == R1Interval(-5, 3)

    assert empty.expanded(0.45) == empty
    assert unit.expanded(0.5) == R1Interval(-0.5, 1.5)

    assert R1Interval(99, 100).union(empty) == R1Interval(99, 100)
    assert empty.union(R1Interval(99, 100)) == R1Interval(99, 100)
    assert R1Interval(5, 3).union(R1Interval(0, -2)).is_empty()
    assert R1Interval(0, -2).union(R1Interval(5, 3)).is_empty()
    assert unit.union(unit) == unit
    assert unit.union(negunit) == R1Interval(-1, 1)
    assert negunit.union(unit) == R1Interval(-1, 1)
    assert half.union(unit) == unit
    assert unit.intersection(half) == half
    assert unit.intersection(negunit) == R1Interval(0, 0)
    assert negunit.intersection(half).is_empty()
    assert unit.intersection(empty).is_empty()
    assert empty.intersection(unit).is_empty()


def _s1_ops(x, y, expected, expected_union, expected_intersection):
    # S1IntervalTest.java:21-45 testIntervalOps
    assert x.contains_interval(y) == (expected[0] == "T")
    assert x.interior_contains_interval(y) == (expected[1] == "T")
    assert x.intersects(y) == (expected[2] == "T")
    assert x.interior_intersects(y) == (expected[3] == "T")
    assert x.union(y) == expected_union
    assert x.intersection(y) == expected_intersection
    assert x.contains_interval(y) == (x.union(y) == x)
    assert x.intersects(y) == (not x.intersection(y).is_empty())
    if y.lo == y.hi:
        assert x.add_point(y.lo) == expected_union


def test_s1_basic():
    # S1IntervalTest.java:47-260 testBasic, ported line for line.
    quad12 = S1Interval(0, -PI)
    assert (quad12.lo, quad12.hi) == (0.0, PI)
    quad34 = S1Interval(-PI, 0)
    assert (quad34.lo, quad34.hi) == (PI, 0.0)
    pi = S1Interval(PI, PI)
    assert (pi.lo, pi.hi) == (PI, PI)
    mipi = S1Interval(-PI, -PI)
    assert (mipi.lo, mipi.hi) == (PI, PI)
    quad23 = S1Interval(PI_2, -PI_2)  # inverted
    assert (quad23.lo, quad23.hi) == (PI_2, -PI_2)
    quad1 = S1Interval(0, PI_2)

    zero = S1Interval(0, 0)
    assert zero.is_valid() and not zero.is_empty() and not zero.is_full()
    empty = S1Interval.empty()
    assert empty.is_valid() and empty.is_empty() and not empty.is_full()
    assert empty.is_inverted()
    full = S1Interval.full()
    assert full.is_valid() and not full.is_empty() and full.is_full()
    assert not quad12.is_empty() and not quad12.is_full() and not quad12.is_inverted()
    assert not quad23.is_empty() and not quad23.is_full() and quad23.is_inverted()
    assert pi.is_valid() and not pi.is_empty() and not pi.is_inverted()
    assert mipi.is_valid() and not mipi.is_empty() and not mipi.is_inverted()

    assert quad12.get_center() == PI_2
    assert quad12.get_length() == PI
    assert abs(S1Interval(3.1, 2.9).get_center() - (3.0 - PI)) < 1e-15
    assert abs(S1Interval(-2.9, -3.1).get_center() - (PI - 3.0)) < 1e-15
    assert abs(S1Interval(2.1, -2.1).get_center() - PI) < 1e-15
    assert pi.get_center() == PI and pi.get_length() == 0.0
    assert mipi.get_center() == PI and mipi.get_length() == 0.0
    assert abs(quad23.get_center()) == PI
    assert abs(quad23.get_length()) == PI
    quad123 = S1Interval(0, -PI_2)
    assert abs(quad123.get_center() - 0.75 * PI) < 1e-15
    assert abs(quad123.get_length() - 1.5 * PI) < 1e-15
    assert empty.get_length() < 0
    assert full.get_length() == 2 * PI

    assert empty.complement().is_full()
    assert full.complement().is_empty()
    assert pi.complement().is_full()
    assert mipi.complement().is_full()
    assert zero.complement().is_full()
    assert quad12.complement().approx_equals(quad34)
    assert quad34.complement().approx_equals(quad12)
    quad4 = S1Interval(-PI_2, 0)
    assert quad123.complement().approx_equals(quad4)
    quad234 = S1Interval(PI_2, 0)

    assert not empty.contains(0) and not empty.contains(PI) and not empty.contains(-PI)
    assert not empty.interior_contains(PI) and not empty.interior_contains(-PI)
    assert full.contains(0) and full.contains(PI) and full.contains(-PI)
    assert full.interior_contains(PI) and full.interior_contains(-PI)
    assert quad12.contains(0) and quad12.contains(PI) and quad12.contains(-PI)
    assert quad12.interior_contains(PI_2) and not quad12.interior_contains(0)
    assert not quad12.interior_contains(PI) and not quad12.interior_contains(-PI)
    assert quad23.contains(PI_2) and quad23.contains(-PI_2)
    assert quad23.contains(PI) and quad23.contains(-PI)
    assert not quad23.contains(0)
    assert not quad23.interior_contains(PI_2) and not quad23.interior_contains(-PI_2)
    assert quad23.interior_contains(PI) and quad23.interior_contains(-PI)
    assert not quad23.interior_contains(0)
    assert pi.contains(PI) and pi.contains(-PI) and not pi.contains(0)
    assert not pi.interior_contains(PI) and not pi.interior_contains(-PI)
    assert mipi.contains(PI) and mipi.contains(-PI) and not mipi.contains(0)
    assert not mipi.interior_contains(PI) and not mipi.interior_contains(-PI)
    assert zero.contains(0) and not zero.interior_contains(0)

    quad2 = S1Interval(PI_2, -PI)
    quad3 = S1Interval(PI, -PI_2)
    pi2 = S1Interval(PI_2, PI_2)
    mipi2 = S1Interval(-PI_2, -PI_2)

    _s1_ops(empty, empty, "TTFF", empty, empty)
    _s1_ops(empty, full, "FFFF", full, empty)
    _s1_ops(empty, zero, "FFFF", zero, empty)
    _s1_ops(empty, pi, "FFFF", pi, empty)
    _s1_ops(empty, mipi, "FFFF", mipi, empty)

    _s1_ops(full, empty, "TTFF", full, empty)
    _s1_ops(full, full, "TTTT", full, full)
    _s1_ops(full, zero, "TTTT", full, zero)
    _s1_ops(full, pi, "TTTT", full, pi)
    _s1_ops(full, mipi, "TTTT", full, mipi)
    _s1_ops(full, quad12, "TTTT", full, quad12)
    _s1_ops(full, quad23, "TTTT", full, quad23)

    _s1_ops(zero, empty, "TTFF", zero, empty)
    _s1_ops(zero, full, "FFTF", full, zero)
    _s1_ops(zero, zero, "TFTF", zero, zero)
    _s1_ops(zero, pi, "FFFF", S1Interval(0, PI), empty)
    _s1_ops(zero, pi2, "FFFF", quad1, empty)
    _s1_ops(zero, mipi, "FFFF", quad12, empty)
    _s1_ops(zero, mipi2, "FFFF", quad4, empty)
    _s1_ops(zero, quad12, "FFTF", quad12, zero)
    _s1_ops(zero, quad23, "FFFF", quad123, empty)

    _s1_ops(pi2, empty, "TTFF", pi2, empty)
    _s1_ops(pi2, full, "FFTF", full, pi2)
    _s1_ops(pi2, zero, "FFFF", quad1, empty)
    _s1_ops(pi2, pi, "FFFF", S1Interval(PI_2, PI), empty)
    _s1_ops(pi2, pi2, "TFTF", pi2, pi2)
    _s1_ops(pi2, mipi, "FFFF", quad2, empty)
    _s1_ops(pi2, mipi2, "FFFF", quad23, empty)
    _s1_ops(pi2, quad12, "FFTF", quad12, pi2)
    _s1_ops(pi2, quad23, "FFTF", quad23, pi2)

    _s1_ops(pi, empty, "TTFF", pi, empty)
    _s1_ops(pi, full, "FFTF", full, pi)
    _s1_ops(pi, zero, "FFFF", S1Interval(PI, 0), empty)
    _s1_ops(pi, pi, "TFTF", pi, pi)
    _s1_ops(pi, pi2, "FFFF", S1Interval(PI_2, PI), empty)
    _s1_ops(pi, mipi, "TFTF", pi, pi)
    _s1_ops(pi, mipi2, "FFFF", quad3, empty)
    _s1_ops(pi, quad12, "FFTF", S1Interval(0, PI), pi)
    _s1_ops(pi, quad23, "FFTF", quad23, pi)

    _s1_ops(mipi, empty, "TTFF", mipi, empty)
    _s1_ops(mipi, full, "FFTF", full, mipi)
    _s1_ops(mipi, zero, "FFFF", quad34, empty)
    _s1_ops(mipi, pi, "TFTF", mipi, mipi)
    _s1_ops(mipi, pi2, "FFFF", quad2, empty)
    _s1_ops(mipi, mipi, "TFTF", mipi, mipi)
    _s1_ops(mipi, mipi2, "FFFF", S1Interval(-PI, -PI_2), empty)
    _s1_ops(mipi, quad12, "FFTF", quad12, mipi)
    _s1_ops(mipi, quad23, "FFTF", quad23, mipi)

    _s1_ops(quad12, empty, "TTFF", quad12, empty)
    _s1_ops(quad12, full, "FFTT", full, quad12)
    _s1_ops(quad12, zero, "TFTF", quad12, zero)
    _s1_ops(quad12, pi, "TFTF", quad12, pi)
    _s1_ops(quad12, mipi, "TFTF", quad12, mipi)
    _s1_ops(quad12, quad12, "TFTT", quad12, quad12)
    _s1_ops(quad12, quad23, "FFTT", quad123, quad2)
    _s1_ops(quad12, quad34, "FFTF", full, quad12)

    _s1_ops(quad23, empty, "TTFF", quad23, empty)
    _s1_ops(quad23, full, "FFTT", full, quad23)
    _s1_ops(quad23, zero, "FFFF", quad234, empty)
    _s1_ops(quad23, pi, "TTTT", quad23, pi)
    _s1_ops(quad23, mipi, "TTTT", quad23, mipi)
    _s1_ops(quad23, quad12, "FFTT", quad123, quad2)
    _s1_ops(quad23, quad23, "TFTT", quad23, quad23)
    _s1_ops(quad23, quad34, "FFTT", quad234, S1Interval(-PI, -PI_2))

    _s1_ops(quad1, quad23, "FFTF", quad123, S1Interval(PI_2, PI_2))
    _s1_ops(quad2, quad3, "FFTF", quad23, mipi)
    _s1_ops(quad3, quad2, "FFTF", quad23, pi)
    _s1_ops(quad2, pi, "TFTF", quad2, pi)
    _s1_ops(quad2, mipi, "TFTF", quad2, mipi)
    _s1_ops(quad3, pi, "TFTF", quad3, pi)
    _s1_ops(quad3, mipi, "TFTF", quad3, mipi)

    mid12 = S1Interval(PI_2 - 0.02, PI_2 + 0.01)
    mid23 = S1Interval(PI - 0.01, -PI + 0.02)
    mid34 = S1Interval(-PI_2 - 0.02, -PI_2 + 0.01)
    mid41 = S1Interval(-0.01, 0.02)

    quad2hi = S1Interval(mid23.lo, quad12.hi)
    quad1lo = S1Interval(quad12.lo, mid41.hi)
    quad12eps = S1Interval(quad12.lo, mid23.hi)
    quadeps12 = S1Interval(mid41.lo, quad12.hi)
    quad123eps = S1Interval(quad12.lo, mid34.hi)
    _s1_ops(quad12, mid12, "TTTT", quad12, mid12)
    _s1_ops(mid12, quad12, "FFTT", quad12, mid12)
    _s1_ops(quad12, mid23, "FFTT", quad12eps, quad2hi)
    _s1_ops(mid23, quad12, "FFTT", quad12eps, quad2hi)
    _s1_ops(quad12, mid34, "FFFF", quad123eps, empty)
    _s1_ops(mid34, quad12, "FFFF", quad123eps, empty)
    _s1_ops(quad12, mid41, "FFTT", quadeps12, quad1lo)
    _s1_ops(mid41, quad12, "FFTT", quadeps12, quad1lo)
