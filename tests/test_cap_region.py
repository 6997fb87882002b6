"""S2CapTest.testRectBound and testCells ports (S2CapTest.java:100-215):
cap -> lat/lng bounding-rect fixtures and the exhaustive face-relative
cap-vs-cell containment/intersection sweep that drives the covering and
pip_join_cap refinement paths."""

import math

import numpy as np

from s2_geometry_library_java_spark.geometry.cap import S2Cap
from s2_geometry_library_java_spark.geometry.cell import S2Cell
from s2_geometry_library_java_spark.geometry.latlng_rect import _to_point
from s2_geometry_library_java_spark.kernel import cellid as ck

D = math.pi / 180.0
EPS = 1e-15  # S2CapTest.java:25
DEG_EPS = 1e-13


def _ll_point(lat_deg: float, lng_deg: float) -> np.ndarray:
    return _to_point(lat_deg * D, lng_deg * D)


def test_rect_bound():
    assert S2Cap.empty().get_rect_bound().is_empty()
    assert S2Cap.full().get_rect_bound().is_full()

    # Cap that includes the south pole.
    rect = S2Cap.from_axis_angle(_ll_point(-45, 57), 50 * D).get_rect_bound()
    assert abs(rect.lat.lo / D - (-90)) < DEG_EPS
    assert abs(rect.lat.hi / D - 5) < DEG_EPS
    assert rect.lng.is_full()

    # Cap that is tangent to the north pole.
    axis = np.array([1.0, 0.0, 1.0]) / math.sqrt(2)
    rect = S2Cap.from_axis_angle(axis, math.pi / 4).get_rect_bound()
    assert abs(rect.lat.lo) < 1e-9
    assert abs(rect.lat.hi - math.pi / 2) < 1e-9
    assert rect.lng.is_full()

    rect = S2Cap.from_axis_angle(axis, 45 * D).get_rect_bound()
    assert abs(rect.lat.lo / D) < DEG_EPS
    assert abs(rect.lat.hi / D - 90) < DEG_EPS
    assert rect.lng.is_full()

    # The eastern hemisphere.
    rect = S2Cap.from_axis_angle(np.array([0.0, 1.0, 0.0]), math.pi / 2 + 5e-16).get_rect_bound()
    assert abs(rect.lat.lo / D - (-90)) < DEG_EPS
    assert abs(rect.lat.hi / D - 90) < DEG_EPS
    assert rect.lng.is_full()

    # A cap centered on the equator.
    rect = S2Cap.from_axis_angle(_ll_point(0, 50), 20 * D).get_rect_bound()
    assert abs(rect.lat.lo / D - (-20)) < DEG_EPS
    assert abs(rect.lat.hi / D - 20) < DEG_EPS
    assert abs(rect.lng.lo / D - 30) < DEG_EPS
    assert abs(rect.lng.hi / D - 70) < DEG_EPS

    # A cap centered on the north pole.
    rect = S2Cap.from_axis_angle(_ll_point(90, 123), 10 * D).get_rect_bound()
    assert abs(rect.lat.lo / D - 80) < DEG_EPS
    assert abs(rect.lat.hi / D - 90) < DEG_EPS
    assert rect.lng.is_full()


def test_cells():
    face_radius = math.atan(math.sqrt(2.0))  # center-to-vertex distance

    for face in range(6):
        root_cell = S2Cell.from_face_pos_level(face, 0, 0)

        # A leaf cell at the midpoint of the v=1 edge, and one at the
        # (u=1, v=1) corner.
        edge_cell = S2Cell.from_point(
            ck.face_uv_to_xyz(np.array([face]), np.array([0.0]), np.array([1 - EPS]))[0]
        )
        corner_cell = S2Cell.from_point(
            ck.face_uv_to_xyz(np.array([face]), np.array([1 - EPS]), np.array([1 - EPS]))[0]
        )

        assert S2Cap.full().contains_cell(root_cell)
        assert not S2Cap.empty().may_intersect_cell(root_cell)

        # Bounding caps of the leaf cells adjacent to corner_cell along the
        # Hilbert curve (locally stays within the face at this corner).
        cid = np.array([corner_cell.id], dtype=np.uint64)
        first = ck.prev_id(ck.prev_id(ck.prev_id(cid)))
        last = ck.next_id(ck.next_id(ck.next_id(ck.next_id(cid))))
        cur = first
        while cur[0] < last[0]:
            cell = S2Cell(int(cur[0]))
            cap = cell.get_cap_bound()
            assert cap.contains_cell(corner_cell) == (cur[0] == cid[0])
            assert cap.may_intersect_cell(corner_cell) == bool(
                ck.contains(ck.parent(cur, cell.level - 1), cid)[0]
            )
            cur = ck.next_id(cur)

        anti_face = (face + 3) % 6
        for cap_face in range(6):
            center = ck.FACE_NORMS[cap_face]

            # A cap that barely contains all of cap_face.
            covering = S2Cap.from_axis_angle(center, face_radius + EPS)
            assert covering.contains_cell(root_cell) == (cap_face == face)
            assert covering.may_intersect_cell(root_cell) == (cap_face != anti_face)
            assert covering.contains_cell(edge_cell) == (
                float(np.dot(center, edge_cell.get_center())) > 0.1
            )
            assert covering.contains_cell(edge_cell) == covering.may_intersect_cell(edge_cell)
            assert covering.contains_cell(corner_cell) == (cap_face == face)
            assert covering.may_intersect_cell(corner_cell) == (
                float(np.dot(center, corner_cell.get_center())) > 0
            )

            # A cap that barely intersects the edges of cap_face.
            bulging = S2Cap.from_axis_angle(center, math.pi / 4 + EPS)
            assert not bulging.contains_cell(root_cell)
            assert bulging.may_intersect_cell(root_cell) == (cap_face != anti_face)
            assert bulging.contains_cell(edge_cell) == (cap_face == face)
            assert bulging.may_intersect_cell(edge_cell) == (
                float(np.dot(center, edge_cell.get_center())) > 0.1
            )
            assert not bulging.contains_cell(corner_cell)
            assert not bulging.may_intersect_cell(corner_cell)

            # A singleton cap.
            singleton = S2Cap.from_axis_angle(center, 0.0)
            assert singleton.may_intersect_cell(root_cell) == (cap_face == face)
            assert not singleton.may_intersect_cell(edge_cell)
            assert not singleton.may_intersect_cell(corner_cell)
