"""S2Test projection-identity ports and S2EdgeUtilTest.testWedges port.

Covers the reference tests not exercised elsewhere: traversal-order table
consistency (S2Test.java testTraversalOrder), ST<->UV inverses (testSTUV),
face frame identities + cross-face Hilbert continuity (testFaceUVtoXYZ),
axis/derivative consistency (testUVAxes), UV edge normals (testUVNorms,
S2Test.java:97-112 — round-4 addition closing the last unported reference
test fragment), the full wedge relation matrix (S2EdgeUtilTest.java:
260-340, all four relations), and the S2LatLng E5/E6/E7 fixed-point
codecs (S2LatLngTest.java:70-73).
"""

import numpy as np

from s2_geometry_library_java_spark.geometry.loop import (
    _wedge_contains,
    _wedge_contains_or_crosses,
    _wedge_contains_or_intersects,
    _wedge_intersects,
)
from s2_geometry_library_java_spark.kernel import cellid as c


def _swap_axes(ij: int) -> int:
    return ((ij >> 1) & 1) + ((ij & 1) << 1)


def _invert_bits(ij: int) -> int:
    return ij ^ 3


def test_traversal_order():
    # S2Test.java testTraversalOrder: table consistency under axis swap /
    # direction inversion, and that POS_TO_IJ / IJ_TO_POS are inverses.
    for r in range(4):
        for i in range(4):
            assert c.IJ_TO_POS[r][i] == c.IJ_TO_POS[r ^ c.SWAP_MASK][_swap_axes(i)]
            assert c.POS_TO_IJ[r][i] == _swap_axes(c.POS_TO_IJ[r ^ c.SWAP_MASK][i])
            assert c.IJ_TO_POS[r][i] == c.IJ_TO_POS[r ^ c.INVERT_MASK][_invert_bits(i)]
            assert c.POS_TO_IJ[r][i] == _invert_bits(c.POS_TO_IJ[r ^ c.INVERT_MASK][i])
            assert c.IJ_TO_POS[r][c.POS_TO_IJ[r][i]] == i
            assert c.POS_TO_IJ[r][c.IJ_TO_POS[r][i]] == i


def test_stuv():
    # S2Test.java testSTUV: fixed points at -1/0/1 and inverse round-trips.
    ends = np.array([-1.0, 0.0, 1.0])
    assert np.array_equal(c.st_to_uv(ends), ends)
    assert np.array_equal(c.uv_to_st(ends), ends)
    x = np.arange(-1.0, 1.0 + 1e-12, 1e-4)
    assert np.allclose(c.uv_to_st(c.st_to_uv(x)), x, atol=1e-10)
    assert np.allclose(c.st_to_uv(c.uv_to_st(x)), x, atol=1e-10)


def test_face_uv_to_xyz():
    # S2Test.java testFaceUVtoXYZ.
    faces = np.arange(6)
    zero = np.zeros(6)
    centers = c.face_uv_to_xyz(faces, zero, zero)
    # Each face center is its norm, a unit axis vector; abs-sum = (2,2,2).
    assert np.array_equal(centers, c.FACE_NORMS)
    assert np.array_equal(np.abs(centers).max(axis=1), np.ones(6))
    assert np.array_equal(np.abs(centers).sum(axis=0), np.array([2.0, 2.0, 2.0]))
    # Right-handed frame on every face: (uAxis x vAxis) . norm == 1.
    rh = (np.cross(c.FACE_U_AXES, c.FACE_V_AXES) * centers).sum(axis=1)
    assert np.array_equal(rh, np.ones(6))
    # Hilbert curves on the faces join into one continuous cube curve: the
    # face curve ends at (1,-1) (no swap) or (-1,1) (swap) and the next
    # face's curve starts at (-1,-1).
    for face in range(6):
        sign = -1.0 if (face & c.SWAP_MASK) else 1.0
        end = c.face_uv_to_xyz(np.array([face]), np.array([sign]), np.array([-sign]))
        start = c.face_uv_to_xyz(np.array([(face + 1) % 6]), np.array([-1.0]), np.array([-1.0]))
        assert np.array_equal(end, start)


def test_uv_axes():
    # S2Test.java testUVAxes: axes are the du/dv derivatives of faceUvToXyz.
    faces = np.arange(6)
    zero = np.zeros(6)
    one = np.ones(6)
    origin = c.face_uv_to_xyz(faces, zero, zero)
    assert np.array_equal(c.FACE_U_AXES, c.face_uv_to_xyz(faces, one, zero) - origin)
    assert np.array_equal(c.FACE_V_AXES, c.face_uv_to_xyz(faces, zero, one) - origin)


def _norm(p):
    p = np.asarray(p, dtype=np.float64)
    return p / np.linalg.norm(p)


def _assert_wedge(a0, ab1, a2, b0, b2, contains, intersects, crosses):
    # S2EdgeUtilTest.java:260-281 assertWedge — all FOUR wedge relations,
    # exactly the reference's expectations.
    a0, ab1, a2, b0, b2 = map(_norm, (a0, ab1, a2, b0, b2))
    assert _wedge_contains(a0, ab1, a2, b0, b2) == (1 if contains else 0)
    assert _wedge_intersects(a0, ab1, a2, b0, b2) == (-1 if intersects else 0)
    assert _wedge_contains_or_intersects(a0, ab1, a2, b0, b2) == (
        1 if contains else -1 if intersects else 0
    )
    assert _wedge_contains_or_crosses(a0, ab1, a2, b0, b2) == (
        1 if contains else -1 if crosses else 0
    )


def test_wedges():
    # S2EdgeUtilTest.java:283-340 testWedges, all 12 fixtures in order.
    # Intersection in one wedge.
    _assert_wedge((-1, 0, 10), (0, 0, 1), (1, 2, 10), (0, 1, 10), (1, -2, 10), False, True, True)
    # Intersection in two wedges.
    _assert_wedge((-1, -1, 10), (0, 0, 1), (1, -1, 10), (1, 0, 10), (-1, 1, 10), False, True, True)
    # Normal containment.
    _assert_wedge((-1, -1, 10), (0, 0, 1), (1, -1, 10), (-1, 0, 10), (1, 0, 10), True, True, False)
    # Containment with equality on one side.
    _assert_wedge((2, 1, 10), (0, 0, 1), (-1, -1, 10), (2, 1, 10), (1, -5, 10), True, True, False)
    # Containment with equality on the other side.
    _assert_wedge((2, 1, 10), (0, 0, 1), (-1, -1, 10), (1, -2, 10), (-1, -1, 10), True, True, False)
    # Containment with equality on both sides.
    _assert_wedge((-2, 3, 10), (0, 0, 1), (4, -5, 10), (-2, 3, 10), (4, -5, 10), True, True, False)
    # Disjoint with equality on one side.
    _assert_wedge((-2, 3, 10), (0, 0, 1), (4, -5, 10), (4, -5, 10), (-2, -3, 10), False, False, False)
    # Disjoint with equality on the other side.
    _assert_wedge((-2, 3, 10), (0, 0, 1), (0, 5, 10), (4, -5, 10), (-2, 3, 10), False, False, False)
    # Disjoint with equality on both sides.
    _assert_wedge((-2, 3, 10), (0, 0, 1), (4, -5, 10), (4, -5, 10), (-2, 3, 10), False, False, False)
    # B contains A with equality on one side.
    _assert_wedge((2, 1, 10), (0, 0, 1), (1, -5, 10), (2, 1, 10), (-1, -1, 10), False, True, False)
    # B contains A with equality on the other side.
    _assert_wedge((2, 1, 10), (0, 0, 1), (1, -5, 10), (-2, 1, 10), (1, -5, 10), False, True, False)


def test_e5_e6_e7_codecs():
    """S2LatLngTest.java:70-73 golden (fromE5(123456, 98765) -> 1.23456,
    0.98765 degrees) plus exact round-trips and Java Math.round negative
    semantics across all three precisions."""
    assert c.from_e5(np.array([123456]))[0] == 1.23456
    assert c.from_e5(np.array([98765]))[0] == 0.98765
    rng = np.random.default_rng(7)
    for enc, dec, lim in [
        (c.to_e5, c.from_e5, 90 * 10**5),
        (c.to_e6, c.from_e6, 90 * 10**6),
        (c.to_e7, c.from_e7, 90 * 10**7),
    ]:
        e = rng.integers(-lim, lim, 2000, dtype=np.int64)
        rt = enc(dec(e))
        assert rt.dtype == np.int64 and np.array_equal(rt, e)
    # Java Math.round == floor(x + 0.5): -2.5 rounds UP to -2
    assert c.to_e5(np.array([-2.5e-5]))[0] == -2
    assert c.to_e5(np.array([2.5e-5]))[0] == 3


def test_e5_e6_e7_sql_surface(spark):
    """The s2_from_e*/s2_to_e* SQL functions match the kernel bit-for-bit
    and constant-fold/codegen (pure arithmetic bodies)."""
    from s2_geometry_library_java_spark.functions.sql_api import (
        register_sql_functions,
    )

    register_sql_functions(spark)
    rows = spark.sql(
        "SELECT s2_from_e5(123456) AS a, s2_from_e6(1234567) AS b, "
        "s2_from_e7(12345678) AS c, s2_to_e5(1.23456D) AS d, "
        "s2_to_e6(-1.2345675D) AS e, s2_to_e7(s2_from_e7(-987654321)) AS f"
    ).collect()[0]
    assert rows.a == c.from_e5(np.array([123456]))[0]
    assert rows.b == c.from_e6(np.array([1234567]))[0]
    assert rows.c == c.from_e7(np.array([12345678]))[0]
    assert rows.d == c.to_e5(np.array([1.23456]))[0]
    assert rows.e == c.to_e6(np.array([-1.2345675]))[0]
    assert rows.f == -987654321


def test_uv_norms():
    """S2Test.java:97-112 testUVNorms: getUNorm/getVNorm are right-handed
    normals of increasing-u / increasing-v edges — the cross product of the
    edge endpoints must be PARALLEL to the table normal (angle ~ 0)."""
    x = np.arange(-1.0, 1.0 + 1e-12, 1.0 / 1024.0)
    ones = np.ones_like(x)
    for face in range(6):
        f = np.full_like(x, face, dtype=np.int64)
        eu = np.cross(
            c.face_uv_to_xyz(f, x, -ones), c.face_uv_to_xyz(f, x, ones)
        )
        un = c.get_u_norm(f, x)
        # angle(a,b) = atan2(|a x b|, a.b); assertDoubleNear tolerance 1e-9
        ang_u = np.arctan2(
            np.linalg.norm(np.cross(eu, un), axis=1), (eu * un).sum(axis=1)
        )
        assert ang_u.max() < 1e-9
        ev = np.cross(
            c.face_uv_to_xyz(f, -ones, x), c.face_uv_to_xyz(f, ones, x)
        )
        vn = c.get_v_norm(f, x)
        ang_v = np.arctan2(
            np.linalg.norm(np.cross(ev, vn), axis=1), (ev * vn).sum(axis=1)
        )
        assert ang_v.max() < 1e-9
