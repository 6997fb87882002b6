"""Ports of S2CapTest.testBasic, S2LatLngTest.testConversion/testDistance,
S2CellTest.testFaces/testSubdivide (subset), and the S2CellUnionTest area /
expand / leaf-cells-covered cases not yet covered by test_geometry.py."""

import math

import numpy as np
import pytest

from s2_geometry_library_java_spark.geometry import S2Cap, S2Cell, S2CellUnion
from s2_geometry_library_java_spark.kernel import cellid as ck
from s2_geometry_library_java_spark.kernel import metrics as m
from s2_geometry_library_java_spark.kernel import predicates as pr

EPS = 1e-15
RNG = np.random.default_rng(123456)


def _norm(v):
    return np.asarray(v, dtype=np.float64) / np.linalg.norm(v)


def _ll_point(lat_deg, lng_deg):
    return ck.latlng_degrees_to_xyz(np.array([lat_deg]), np.array([lng_deg]))[0]


# ---------------------------------------------------------------------------
# S2CapTest.testBasic (S2CapTest.java:27-116)
# ---------------------------------------------------------------------------
def test_cap_basic():
    empty, full = S2Cap.empty(), S2Cap.full()
    assert empty.is_empty() and empty.complement().is_full()
    assert full.is_full() and full.complement().is_empty()
    assert full.height == 2.0
    assert abs(math.degrees(full.angle()) - 180) < 1e-12

    assert empty.contains_cap(empty) and full.contains_cap(empty) and full.contains_cap(full)
    assert not empty.interior_intersects(empty)
    assert full.interior_intersects(full)
    assert not full.interior_intersects(empty)

    xaxis = S2Cap.from_axis_height(np.array([1.0, 0, 0]), 0)
    assert xaxis.contains_point(np.array([1.0, 0, 0]))
    assert not xaxis.contains_point(_norm([1.0, 1e-20, 0])) or True  # see below
    # the reference uses the unnormalized point; chordal distance > 0
    assert not xaxis.contains_point(np.array([1.0, 1e-20, 0]))
    assert xaxis.angle() == 0.0

    xcomp = xaxis.complement()
    assert xcomp.is_full() and xcomp.contains_point(xaxis.axis)
    assert xcomp.complement().is_empty()

    tiny_rad = 1e-10
    tiny = S2Cap.from_axis_angle(_norm([1.0, 2, 3]), tiny_rad)
    tangent = _norm(np.cross(tiny.axis, np.array([3.0, 2, 1])))
    assert tiny.contains_point(tiny.axis + tangent * (0.99 * tiny_rad))
    assert not tiny.contains_point(tiny.axis + tangent * (1.01 * tiny_rad))

    hemi = S2Cap.from_axis_height(_norm([1.0, 0, 1]), 1)
    assert np.array_equal(hemi.complement().axis, -hemi.axis)
    assert hemi.complement().height == 1.0
    assert hemi.contains_point(np.array([1.0, 0, 0]))
    assert not hemi.complement().contains_point(np.array([1.0, 0, 0]))
    assert hemi.contains_point(_norm([1.0, 0, -(1 - EPS)]))
    assert not hemi.interior_contains_point(_norm([1.0, 0, -(1 + EPS)]))

    concave = S2Cap.from_axis_angle(_ll_point(80, 10), math.radians(150))
    assert concave.contains_point(_ll_point(-70 * (1 - EPS), 10))
    assert not concave.contains_point(_ll_point(-70 * (1 + EPS), 10))
    assert concave.contains_point(_ll_point(-50 * (1 - EPS), -170))
    assert not concave.contains_point(_ll_point(-50 * (1 + EPS), -170))

    assert not empty.contains_cap(xaxis)
    assert full.contains_cap(xaxis) and full.interior_intersects(xaxis)
    assert not xaxis.contains_cap(full)
    assert xaxis.contains_cap(xaxis) and not xaxis.interior_intersects(xaxis)
    assert xaxis.contains_cap(empty)
    assert hemi.contains_cap(tiny)
    assert hemi.contains_cap(S2Cap.from_axis_angle(np.array([1.0, 0, 0]), math.pi / 4 - EPS))
    assert not hemi.contains_cap(S2Cap.from_axis_angle(np.array([1.0, 0, 0]), math.pi / 4 + EPS))
    assert concave.contains_cap(hemi)
    assert concave.interior_intersects(hemi.complement())
    assert not concave.contains_cap(S2Cap.from_axis_height(-concave.axis, 0.1))


# ---------------------------------------------------------------------------
# S2LatLngTest.testConversion / testDistance (S2LatLngTest.java:52-89)
# ---------------------------------------------------------------------------
def test_latlng_conversion():
    lat, _ = ck.xyz_to_latlng_radians(_ll_point(90.0, 65.0))
    assert abs(math.degrees(lat) - 90.0) < 1e-9
    p = ck.latlng_radians_to_xyz(np.array([-math.pi / 2]), np.array([1.0]))[0]
    lat, _ = ck.xyz_to_latlng_radians(p)
    assert lat == -math.pi / 2
    _, lng = ck.xyz_to_latlng_radians(_ll_point(12.2, 180.0))
    assert abs(abs(math.degrees(lng)) - 180.0) < 1e-9

    pts = pr.normalize(RNG.standard_normal((20000, 3)))
    lat, lng = ck.xyz_to_latlng_radians(pts)
    back = ck.latlng_radians_to_xyz(lat, lng)
    assert np.max(np.abs(pts - back)) < 1e-14


def test_latlng_distance():
    def dist_deg(lat1, lng1, lat2, lng2):
        return math.degrees(
            float(
                pr.haversine_radians(
                    math.radians(lat1), math.radians(lng1), math.radians(lat2), math.radians(lng2)
                )
            )
        )

    assert dist_deg(90, 0, 90, 0) == 0.0
    assert abs(dist_deg(-37, 25, -66, -155) - 77) < 1e-12
    assert abs(dist_deg(0, 165, 0, -80) - 115) < 1e-12
    assert abs(dist_deg(47, -127, -47, 53) - 180) < 2e-6


# ---------------------------------------------------------------------------
# S2CellTest.testFaces + subdivide subset (S2CellTest.java:27-60,163-300)
# ---------------------------------------------------------------------------
def test_cell_faces():
    edge_counts: dict = {}
    vertex_counts: dict = {}
    for face in range(6):
        cid = ck.from_face_pos_level(face, 0, 0)[0]
        cell = S2Cell(int(cid))
        assert int(ck.face(np.array([cid]))[0]) == face
        assert cell.level == 0
        # Top-level faces have alternating orientations (S2CellTest.java:38)
        _, _, _, orientation = ck.to_face_ij_orientation(np.array([cid]), want_orientation=True)
        assert int(orientation[0]) == (face & ck.SWAP_MASK)
        for k in range(4):
            ekey = tuple(np.round(cell.get_edge_raw(k), 12))
            vkey = tuple(np.round(cell.get_vertex_raw(k), 12))
            edge_counts[ekey] = edge_counts.get(ekey, 0) + 1
            vertex_counts[vkey] = vertex_counts.get(vkey, 0) + 1
            # vertices orthogonal to their edges (S2CellTest.java:51-57)
            assert abs(float(np.dot(cell.get_vertex_raw(k), cell.get_edge_raw(k)))) < 1e-15
            assert (
                abs(float(np.dot(cell.get_vertex_raw((k + 1) & 3), cell.get_edge_raw(k)))) < 1e-15
            )
    # Each face edge appears twice (shared), each vertex three times.
    assert all(c == 2 for c in edge_counts.values())
    assert all(c == 3 for c in vertex_counts.values())


def test_cell_subdivide_areas():
    # children partition the parent: exact areas sum (S2CellTest.java:192-210)
    for face in range(6):
        parent = S2Cell.from_face_pos_level(face, 0, 0)
        stack = [parent]
        while stack:
            cell = stack.pop()
            if cell.level >= 2:
                continue
            children = cell.subdivide()
            assert len(children) == 4
            child_area = sum(c.exact_area() for c in children)
            assert abs(child_area - cell.exact_area()) < 1e-10 * cell.exact_area()
            for c in children:
                assert cell.contains_cell(c)
                assert cell.contains_point(c.get_center())
            stack.extend(children)


def test_cell_min_max_avg_metrics():
    # average_area matches the AVG_AREA metric exactly (S2Cell.java:143-145)
    for level in (0, 3, 9):
        cell = S2Cell(int(ck.parent(ck.from_latlng_degrees(np.array([10.0]), np.array([20.0])), level)[0]))
        assert cell.average_area() == m.AVG_AREA.get_value(level)
        assert m.MIN_AREA.get_value(level) <= cell.exact_area() <= m.MAX_AREA.get_value(level)


# ---------------------------------------------------------------------------
# S2CellUnionTest: expand / leafCellsCovered / areas (S2CellUnionTest.java:308-440)
# ---------------------------------------------------------------------------
def test_cellunion_leaf_cells_covered():
    u = S2CellUnion([])
    assert u.leaf_cells_covered() == 0
    # one leaf
    leaf = ck.from_latlng_degrees(np.array([10.0]), np.array([20.0]))[0]
    u = S2CellUnion([leaf])
    assert u.leaf_cells_covered() == 1
    # whole sphere at level 0
    u = S2CellUnion([ck.from_face_pos_level(f, 0, 0)[0] for f in range(6)])
    assert u.leaf_cells_covered() == 6 * (1 << 60)


def test_cellunion_areas():
    # full sphere: exact area == 4*pi (S2CellUnionTest.java:426-440)
    u = S2CellUnion([ck.from_face_pos_level(f, 0, 0)[0] for f in range(6)])
    assert abs(u.exact_area() - 4 * math.pi) < 1e-12
    assert abs(u.average_based_area() - 4 * math.pi) < 1e-9
    assert u.approx_area() == pytest.approx(4 * math.pi, rel=1e-9)


def test_cellunion_expand_contains_original():
    cap = S2Cap.from_axis_angle(_norm([1.0, 2, 3]), 0.1)
    from s2_geometry_library_java_spark.geometry import S2RegionCoverer

    cov = S2RegionCoverer(max_cells=16)
    u = cov.get_covering_union(cap)
    expanded = S2CellUnion(u.ids.copy())
    expanded.expand_radius(0.05, 10)
    assert expanded.contains_union(u)
    # boundary points at radius within the buffer are covered
    tangent = _norm(np.cross(cap.axis, [0.0, 0, 1]))
    for t in np.linspace(0, 2 * math.pi, 16):
        d = math.cos(t) * tangent + math.sin(t) * _norm(np.cross(cap.axis, tangent))
        p = _norm(cap.axis * math.cos(0.12) + d * math.sin(0.12))
        leaf = ck.from_xyz(p[None, :])[0]
        assert expanded.contains_id(leaf)


def test_cellunion_intersection_with_cell_matches_general():
    """C8 slice (S2CellUnion.java:246-264) == general intersection with a
    single-cell union, probed over ancestors, members, descendants, and
    disjoint cells."""
    cap = S2Cap.from_axis_angle(_norm([1.0, 2, 3]), 0.1)
    from s2_geometry_library_java_spark.geometry import S2RegionCoverer

    u = S2RegionCoverer(max_cells=24).get_covering_union(cap)
    probes = list(u.ids[:5])  # members
    probes += [ck.parent(np.array([u.ids[0]]), 2)[0]]  # ancestor
    probes += [ck.child_begin(np.array([u.ids[-1]]))[0]]  # descendant
    probes += [ck.from_xyz(_norm([-1.0, -2, -3])[None, :])[0]]  # disjoint side
    for lvl in (0, 3, 8):
        probes.append(ck.parent(ck.from_xyz(_norm([0.5, -1, 2])[None, :]), lvl)[0])
    for cid in probes:
        got = u.intersection_with_cell(cid)
        expect = S2CellUnion.intersection_of(u, S2CellUnion(np.array([cid], dtype=np.uint64)))
        assert list(got.ids) == list(expect.ids), hex(int(cid))
