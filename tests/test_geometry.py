"""M2 tests: regions, loops, polygons, cell unions, coverer.

Ports of S2LoopTest (bounds/contains, :38-210), S2PolygonTest relation matrix
(:135-184), S2CellUnionTest normalize, and S2RegionCovererTest
(:25-135) including the recursive checkCovering oracle
(GeometryTestCase.java:107-132) and determinism assertions.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from s2_geometry_library_java_spark.kernel import cellid as ck
from s2_geometry_library_java_spark.kernel import metrics
from s2_geometry_library_java_spark.geometry import (
    S2Cap,
    S2Cell,
    S2CellUnion,
    S2LatLngRect,
    S2Loop,
    S2Polygon,
    S2RegionCoverer,
)
from s2_geometry_library_java_spark.geometry.text_format import make_loop, make_point, make_polygon

RNG = np.random.default_rng(123456)


def random_point() -> np.ndarray:
    p = RNG.normal(size=3)
    return p / np.linalg.norm(p)


def random_cap(min_area: float, max_area: float) -> S2Cap:
    cap_area = max_area * (min_area / max_area) ** RNG.uniform()
    return S2Cap.from_axis_area(random_point(), cap_area)


# ---------------------------------------------------------------------------
# S2Loop fixtures (S2LoopTest.java:38-99)
# ---------------------------------------------------------------------------
candy_cane = make_loop("-20:150, -20:-70, 0:70, 10:-150, 10:70, -10:-70")
small_ne_cw = make_loop("35:20, 45:20, 40:25")
arctic_80 = make_loop("80:-150, 80:-30, 80:90")
antarctic_80 = make_loop("-80:120, -80:0, -80:-120")
north_hemi = make_loop("0:-180, 0:-90, 0:0, 0:90")
west_hemi = make_loop("0:-180, -90:0, 0:0, 90:0")
near_hemi = make_loop("0:-90, -90:0, 0:90, 90:0")


def _inverted(loop: S2Loop) -> S2Loop:
    out = S2Loop(loop.vertices.copy())
    out.invert()
    return out


def test_loop_bounds():
    # S2LoopTest.testBounds (:101-118)
    assert candy_cane.get_rect_bound().lng.is_full()
    assert math.degrees(candy_cane.get_rect_bound().lat.lo) < -20
    assert math.degrees(candy_cane.get_rect_bound().lat.hi) > 10
    assert small_ne_cw.get_rect_bound().is_full()
    d = math.pi / 180.0
    assert arctic_80.get_rect_bound().approx_equals(
        S2LatLngRect.from_degrees(80, -180, 90, 180), 1e-12
    )
    assert antarctic_80.get_rect_bound().approx_equals(
        S2LatLngRect.from_degrees(-90, -180, -80, 180), 1e-12
    )


def test_loop_area():
    # Hemisphere areas = 2*pi (S2LoopTest testAreaCentroid style).
    assert abs(north_hemi.get_area() - 2 * math.pi) < 1e-9
    assert abs(west_hemi.get_area() - 2 * math.pi) < 1e-9


def test_loop_contains():
    # S2LoopTest.testContains (:189-200)
    assert candy_cane.contains_point(make_point("5:71"))
    south_hemi = _inverted(north_hemi)
    east_hemi = _inverted(west_hemi)
    pz = np.array([0.0, 0.0, 1.0])
    py = np.array([0.0, 1.0, 0.0])
    assert north_hemi.contains_point(pz)
    assert not north_hemi.contains_point(-pz)
    assert not south_hemi.contains_point(pz)
    assert south_hemi.contains_point(-pz)
    assert not west_hemi.contains_point(py)
    assert west_hemi.contains_point(-py)
    assert east_hemi.contains_point(py)
    assert not east_hemi.contains_point(-py)


def test_loop_cell_vertex_exactly_one():
    # Each cell vertex is contained by exactly one of the adjacent cells
    # (S2LoopTest.testContains :203-230).
    for level in range(3):
        loops = []
        loop_vertices = []
        points = set()
        cid = ck.begin(level)
        end = ck.end(level)
        arr = np.array([cid], dtype=np.uint64)
        while arr[0] != end:
            cell = S2Cell(int(arr[0]))
            points.add(tuple(cell.get_center()))
            for k in range(4):
                loop_vertices.append(cell.get_vertex(k))
                points.add(tuple(cell.get_vertex(k)))
            loops.append(S2Loop(np.stack(loop_vertices)))
            loop_vertices = []
            arr = ck.next_id(arr)
        for point in points:
            p = np.array(point)
            count = sum(1 for loop in loops if loop.contains_point(p))
            assert count == 1


# ---------------------------------------------------------------------------
# S2Polygon relation matrix (S2PolygonTest.java:31-184)
# ---------------------------------------------------------------------------
NEAR0 = "-1:0, 0:1, 1:0, 0:-1;"
NEAR1 = "-1:-1, -1:0, -1:1, 0:1, 1:1, 1:0, 1:-1, 0:-1;"
NEAR2 = "5:-2, -2:5, -1:-2;"
NEAR3 = "6:-3, -3:6, -2:-2;"
NEAR_HEMI = "0:-90, -90:0, 0:90, 90:0;"
FAR0 = "0:179, 1:180, 0:-179, 2:-180;"
FAR1 = "0:179, -1:179, 1:180, -1:-179, 0:-179, 3:-178, 2:-180, 3:178;"
FAR2 = "-1:-179, -1:179, 3:178, 3:-178;"
FAR3 = "-3:-178, -2:179, -3:178, 4:177, 4:-177;"
FAR_HEMI = "0:-90, 60:90, -60:90;"
SOUTH0a = "-90:0, -89.99:0, -89.99:0.01;"
SOUTH0b = "-90:0, -89.99:0.02, -89.99:0.03;"
SOUTH0c = "-90:0, -89.99:0.04, -89.99:0.05;"
SOUTH1 = "-90:0, -89.9:-0.1, -89.9:0.1;"
SOUTH2 = "-90:0, -89.8:-0.2, -89.8:0.2;"
SOUTH_HEMI = "0:-180, 0:60, 0:-60;"
NEAR_FAR1 = "-1:-9, -9:-9, -9:9, 9:9, 9:-9, 1:-9, 1:-175, 9:-175, 9:175, -9:175, -9:-175, -1:-175;"
NEAR_FAR2 = "-8:-4, 8:-4, 2:15, 2:170, 8:-175, -8:-175, -2:170, -2:15;"


def test_polygon_init_contains():
    # S2PolygonTest.testInit (:84-100)
    pairs = [
        (NEAR1, NEAR0),
        (NEAR2, NEAR1),
        (NEAR3, NEAR2),
        (NEAR_HEMI, NEAR3),
        (FAR1, FAR0),
        (FAR2, FAR1),
        (FAR3, FAR2),
        (FAR_HEMI, FAR3),
        (SOUTH1, SOUTH0a),
        (SOUTH1, SOUTH0b),
        (SOUTH1, SOUTH0c),
        (SOUTH_HEMI, SOUTH2),
        (NEAR_FAR1, NEAR3),
        (NEAR_FAR1, FAR3),
        (NEAR_FAR2, NEAR3),
        (NEAR_FAR2, FAR3),
    ]
    for a_str, b_str in pairs:
        assert make_polygon(a_str).contains_polygon(make_polygon(b_str)), (a_str, b_str)


@pytest.fixture(scope="module")
def polys():
    return {
        "near10": make_polygon(NEAR0 + NEAR1),
        "near30": make_polygon(NEAR3 + NEAR0),
        "near32": make_polygon(NEAR2 + NEAR3),
        "near3210": make_polygon(NEAR0 + NEAR2 + NEAR3 + NEAR1),
        "nearH3210": make_polygon(NEAR0 + NEAR2 + NEAR3 + NEAR_HEMI + NEAR1),
        "far10": make_polygon(FAR0 + FAR1),
        "far21": make_polygon(FAR2 + FAR1),
        "far321": make_polygon(FAR2 + FAR3 + FAR1),
        "farH20": make_polygon(FAR2 + FAR_HEMI + FAR0),
        "farH3210": make_polygon(FAR2 + FAR_HEMI + FAR0 + FAR1 + FAR3),
        "south0ab": make_polygon(SOUTH0a + SOUTH0b),
        "south2": make_polygon(SOUTH2),
        "south210b": make_polygon(SOUTH2 + SOUTH0b + SOUTH1),
        "southH21": make_polygon(SOUTH2 + SOUTH_HEMI + SOUTH1),
        "southH20abc": make_polygon(SOUTH2 + SOUTH0b + SOUTH_HEMI + SOUTH0a + SOUTH0c),
        "nf1n10f2s10abc": make_polygon(
            SOUTH0c + FAR2 + NEAR1 + NEAR_FAR1 + NEAR0 + SOUTH1 + SOUTH0b + SOUTH0a
        ),
        "nf2n2f210s210ab": make_polygon(
            FAR2 + SOUTH0a + FAR1 + SOUTH1 + FAR0 + SOUTH0b + NEAR_FAR2 + SOUTH2 + NEAR2
        ),
        "f32n0": make_polygon(FAR2 + NEAR0 + FAR3),
        "n32s0b": make_polygon(NEAR3 + SOUTH0b + NEAR2),
    }


RELATIONS = [
    ("near10", "near30", -1, True),
    ("near10", "near32", 0, False),
    ("near10", "near3210", -1, True),
    ("near10", "nearH3210", 0, False),
    ("near30", "near32", 1, True),
    ("near30", "near3210", 1, True),
    ("near30", "nearH3210", 0, True),
    ("near32", "near3210", -1, True),
    ("near32", "nearH3210", 0, False),
    ("near3210", "nearH3210", 0, False),
    ("far10", "far21", 0, False),
    ("far10", "far321", -1, True),
    ("far10", "farH20", 0, False),
    ("far10", "farH3210", 0, False),
    ("far21", "far321", 0, False),
    ("far21", "farH20", 0, False),
    ("far21", "farH3210", -1, True),
    ("far321", "farH20", 0, True),
    ("far321", "farH3210", 0, True),
    ("farH20", "farH3210", 0, True),
    ("south0ab", "south2", -1, True),
    ("south0ab", "south210b", 0, True),
    ("south0ab", "southH21", -1, True),
    ("south0ab", "southH20abc", -1, True),
    ("south2", "south210b", 1, True),
    ("south2", "southH21", 0, True),
    ("south2", "southH20abc", 0, True),
    ("south210b", "southH21", 0, True),
    ("south210b", "southH20abc", 0, True),
    ("southH21", "southH20abc", 1, True),
    ("nf1n10f2s10abc", "nf2n2f210s210ab", 0, True),
    ("nf1n10f2s10abc", "near32", 1, True),
    ("nf1n10f2s10abc", "far21", 0, False),
    ("nf1n10f2s10abc", "south0ab", 0, False),
    ("nf1n10f2s10abc", "f32n0", 1, True),
    ("nf2n2f210s210ab", "near10", 0, False),
    ("nf2n2f210s210ab", "far10", 1, True),
    ("nf2n2f210s210ab", "south210b", 1, True),
    ("nf2n2f210s210ab", "south0ab", 1, True),
    ("nf2n2f210s210ab", "n32s0b", 1, True),
]


def test_polygon_relations(polys):
    # S2PolygonTest.testRelations (:139-184)
    for a_name, b_name, contains, intersects in RELATIONS:
        a, b = polys[a_name], polys[b_name]
        assert a.contains_polygon(b) == (contains > 0), (a_name, b_name)
        assert b.contains_polygon(a) == (contains < 0), (a_name, b_name)
        assert a.intersects_polygon(b) == intersects, (a_name, b_name)


# ---------------------------------------------------------------------------
# S2CellUnion (S2CellUnionTest normalize essentials)
# ---------------------------------------------------------------------------
def test_cellunion_normalize_siblings_collapse():
    base = ck.from_face_pos_level(2, 0, 10)
    children = []
    ch = ck.child_begin(base)
    for _ in range(4):
        children.append(ch[0])
        ch = ck.next_id(ch)
    u = S2CellUnion(np.array(children, dtype=np.uint64))
    assert len(u) == 1
    assert u.ids[0] == base[0]


def test_cellunion_contains_and_denormalize():
    ids = np.concatenate([ck.from_face_pos_level(1, 0, 5), ck.from_face_pos_level(3, 123456, 8)])
    u = S2CellUnion(ids)
    for cid in u.ids:
        child = ck.child_begin(np.array([cid]), int(ck.level(np.array([cid]))[0]) + 2)
        assert u.contains_id(child[0])
    den = u.denormalize(9, 1)
    assert (ck.level(den) >= 9).all()
    u2 = S2CellUnion(den)
    for cid in ids:
        # Denormalize then re-normalize returns the original region.
        assert u2.contains_id(cid)


def test_cellunion_vectorized_contains_matches_scalar():
    ids = np.array([int(ck.from_face_pos_level(f, RNG.integers(0, 1 << 60), int(RNG.integers(2, 12)))[0]) for f in RNG.integers(0, 6, 20)], dtype=np.uint64)
    u = S2CellUnion(ids)
    probes = np.array([int(ck.from_face_pos_level(f, RNG.integers(0, 1 << 60), 30)[0]) for f in RNG.integers(0, 6, 500)], dtype=np.uint64)
    vec = u.contains_ids(probes)
    for p, v in zip(probes, vec):
        assert u.contains_id(p) == bool(v)


# ---------------------------------------------------------------------------
# S2RegionCoverer (S2RegionCovererTest.java:25-135)
# ---------------------------------------------------------------------------
def _check_covering_recursive(region, union: S2CellUnion, check_tight: bool, cid=None):
    # GeometryTestCase.checkCovering (:107-132)
    if cid is None:
        for face in range(6):
            _check_covering_recursive(region, union, check_tight, ck.from_face_pos_level(face, 0, 0)[0])
        return
    cell = S2Cell(int(cid))
    if not region.may_intersect_cell(cell):
        if check_tight:
            assert not union.intersects_id(cid)
    elif not union.contains_id(cid):
        assert not region.contains_cell(cell)
        assert not ck.is_leaf(np.array([cid]))[0]
        ch = ck.child_begin(np.array([cid], dtype=np.uint64))
        endv = ck.child_end(np.array([cid], dtype=np.uint64))[0]
        while ch[0] != endv:
            _check_covering_recursive(region, union, check_tight, ch[0])
            ch = ck.next_id(ch)


def _check_covering(coverer: S2RegionCoverer, region, covering: np.ndarray, interior: bool):
    # S2RegionCovererTest.checkCovering (:41-75)
    min_level_cells = {}
    for cid in covering:
        level = int(ck.level(np.array([cid]))[0])
        assert level >= coverer.min_level
        assert level <= coverer.max_level
        assert (level - coverer.min_level) % coverer.level_mod == 0
        key = int(ck.parent(np.array([cid]), coverer.min_level)[0])
        min_level_cells[key] = min_level_cells.get(key, 0) + 1
    if len(covering) > coverer.max_cells:
        for count in min_level_cells.values():
            assert count == 1
    if interior:
        for cid in covering:
            assert region.contains_cell(S2Cell(int(cid)))
    else:
        union = S2CellUnion(covering.copy())
        _check_covering_recursive(region, union, True)


def test_coverer_random_cells():
    # S2RegionCovererTest.testRandomCells (:25-39): maxCells=1 on a cell region.
    coverer = S2RegionCoverer(max_cells=1)
    for _ in range(200):
        cid = ck.from_face_pos_level(int(RNG.integers(0, 6)), int(RNG.integers(0, 1 << 60)), int(RNG.integers(0, 31)))[0]
        covering = coverer.get_covering(S2Cell(int(cid)))
        assert len(covering) == 1
        assert covering[0] == cid


def _skewed(max_log: int) -> int:
    base = int(RNG.integers(0, max_log + 1))
    return int(RNG.integers(0, 1 << 31)) & ((1 << base) - 1)


def test_coverer_random_caps():
    # S2RegionCovererTest.testRandomCaps (:77-117), reduced trial count.
    for _ in range(60):
        while True:
            min_level = int(RNG.integers(0, 31))
            max_level = int(RNG.integers(0, 31))
            if min_level <= max_level:
                break
        max_cells = _skewed(10)
        level_mod = int(RNG.integers(1, 4))
        coverer = S2RegionCoverer(max_cells=max_cells, min_level=min_level, max_level=max_level, level_mod=level_mod)
        max_area = min(4 * math.pi, (3 * max(max_cells, 1) + 1) * metrics.AVG_AREA.get_value(min_level))
        cap = random_cap(0.1 * metrics.AVG_AREA.get_value(30), max_area)
        covering = coverer.get_covering(cap)
        _check_covering(coverer, cap, covering, False)
        interior = coverer.get_interior_covering(cap)
        _check_covering(coverer, cap, interior, True)
        # Determinism (S2RegionCovererTest.java:102-105)
        covering2 = coverer.get_covering(cap)
        assert (covering == covering2).all()


def test_coverer_polygon_covering_covers_points():
    # Covering of a polygon must contain the cells of all points inside it.
    poly = make_polygon(NEAR0 + NEAR1)
    coverer = S2RegionCoverer(max_cells=16)
    covering = S2CellUnion(coverer.get_covering(poly).copy())
    lat = RNG.uniform(-2, 2, 400)
    lng = RNG.uniform(-2, 2, 400)
    pts = ck.latlng_degrees_to_xyz(lat, lng)
    inside = poly.contains_points(pts)
    leaf_ids = ck.from_xyz(pts)
    covered = covering.contains_ids(leaf_ids)
    assert (covered[inside]).all()


def test_simple_covering():
    # S2RegionCovererTest.testSimpleCoverings (:119-135), reduced.
    for _ in range(50):
        level = int(RNG.integers(0, 18))
        coverer = S2RegionCoverer(max_cells=1 << 30, min_level=level, max_level=level)
        max_area = min(4 * math.pi, 1000 * metrics.AVG_AREA.get_value(level))
        cap = random_cap(0.1 * metrics.AVG_AREA.get_value(30), max_area)
        covering = S2RegionCoverer.get_simple_covering(cap, cap.axis, level)
        _check_covering(coverer, cap, covering, False)


# ---------------------------------------------------------------------------
# S2LoopTest.testLoopRelations (:232-307) + testGetDistance (:467-503)
# and S2PolygonTest.testGetDistance (:304-337)
# ---------------------------------------------------------------------------
north_hemi3 = make_loop("0:-180, 0:-60, 0:60")
loop_a = make_loop("0:178, -1:180, 0:-179, 1:-180")
loop_b = make_loop("0:179, -1:180, 0:-178, 1:-180")
a_intersect_b = make_loop("0:179, -1:180, 0:-179, 1:-180")
a_union_b = make_loop("0:178, -1:180, 0:-178, 1:-180")
a_minus_b = make_loop("0:178, -1:180, 0:179, 1:-180")
b_minus_a = make_loop("0:-179, -1:180, 0:-178, 1:-180")


def _assert_relation(a, b, contains_or_crosses, intersects, nestable):
    # S2LoopTest.java assertRelation
    assert a.contains_loop(b) == (contains_or_crosses == 1)
    assert a.intersects_loop(b) == intersects
    if nestable:
        assert a.contains_nested(b) == a.contains_loop(b)
    if contains_or_crosses >= -1:
        assert a.contains_or_crosses(b) == contains_or_crosses


def test_loop_relations():
    south_hemi = _inverted(north_hemi)
    east_hemi = _inverted(west_hemi)
    far_hemi = _inverted(near_hemi)

    _assert_relation(north_hemi, north_hemi, 1, True, False)
    _assert_relation(north_hemi, south_hemi, 0, False, False)
    _assert_relation(north_hemi, east_hemi, -1, True, False)
    _assert_relation(north_hemi, arctic_80, 1, True, True)
    _assert_relation(north_hemi, antarctic_80, 0, False, True)
    _assert_relation(north_hemi, candy_cane, -1, True, False)

    # We can't compare north_hemi3 vs. north_hemi or south_hemi.
    _assert_relation(north_hemi3, north_hemi3, 1, True, False)
    _assert_relation(north_hemi3, east_hemi, -1, True, False)
    _assert_relation(north_hemi3, arctic_80, 1, True, True)
    _assert_relation(north_hemi3, antarctic_80, 0, False, True)
    _assert_relation(north_hemi3, candy_cane, -1, True, False)

    _assert_relation(south_hemi, north_hemi, 0, False, False)
    _assert_relation(south_hemi, south_hemi, 1, True, False)
    _assert_relation(south_hemi, far_hemi, -1, True, False)
    _assert_relation(south_hemi, arctic_80, 0, False, True)
    _assert_relation(south_hemi, antarctic_80, 1, True, True)
    _assert_relation(south_hemi, candy_cane, -1, True, False)

    _assert_relation(candy_cane, north_hemi, -1, True, False)
    _assert_relation(candy_cane, south_hemi, -1, True, False)
    _assert_relation(candy_cane, arctic_80, 0, False, True)
    _assert_relation(candy_cane, antarctic_80, 0, False, True)
    _assert_relation(candy_cane, candy_cane, 1, True, False)

    _assert_relation(near_hemi, west_hemi, -1, True, False)

    _assert_relation(small_ne_cw, south_hemi, 1, True, False)
    _assert_relation(small_ne_cw, west_hemi, 1, True, False)
    _assert_relation(small_ne_cw, north_hemi, -2, True, False)
    _assert_relation(small_ne_cw, east_hemi, -2, True, False)

    _assert_relation(loop_a, loop_a, 1, True, False)
    _assert_relation(loop_a, loop_b, -1, True, False)
    _assert_relation(loop_a, a_intersect_b, 1, True, False)
    _assert_relation(loop_a, a_union_b, 0, True, False)
    _assert_relation(loop_a, a_minus_b, 1, True, False)
    _assert_relation(loop_a, b_minus_a, 0, False, False)

    _assert_relation(loop_b, loop_a, -1, True, False)
    _assert_relation(loop_b, loop_b, 1, True, False)
    _assert_relation(loop_b, a_intersect_b, 1, True, False)
    _assert_relation(loop_b, a_union_b, 0, True, False)
    _assert_relation(loop_b, a_minus_b, 0, False, False)
    _assert_relation(loop_b, b_minus_a, 1, True, False)

    _assert_relation(a_intersect_b, loop_a, 0, True, False)
    _assert_relation(a_intersect_b, loop_b, 0, True, False)
    _assert_relation(a_intersect_b, a_intersect_b, 1, True, False)
    _assert_relation(a_intersect_b, a_union_b, 0, True, True)
    _assert_relation(a_intersect_b, a_minus_b, 0, False, False)
    _assert_relation(a_intersect_b, b_minus_a, 0, False, False)

    _assert_relation(a_union_b, loop_a, 1, True, False)
    _assert_relation(a_union_b, loop_b, 1, True, False)
    _assert_relation(a_union_b, a_intersect_b, 1, True, True)
    _assert_relation(a_union_b, a_union_b, 1, True, False)
    _assert_relation(a_union_b, a_minus_b, 1, True, False)
    _assert_relation(a_union_b, b_minus_a, 1, True, False)

    _assert_relation(a_minus_b, loop_a, 0, True, False)
    _assert_relation(a_minus_b, loop_b, 0, False, False)
    _assert_relation(a_minus_b, a_intersect_b, 0, False, False)
    _assert_relation(a_minus_b, a_union_b, 0, True, False)
    _assert_relation(a_minus_b, a_minus_b, 1, True, False)
    _assert_relation(a_minus_b, b_minus_a, 0, False, True)

    _assert_relation(b_minus_a, loop_a, 0, False, False)
    _assert_relation(b_minus_a, loop_b, 0, True, False)
    _assert_relation(b_minus_a, a_intersect_b, 0, False, False)
    _assert_relation(b_minus_a, a_union_b, 0, True, False)
    _assert_relation(b_minus_a, a_minus_b, 0, False, True)
    _assert_relation(b_minus_a, b_minus_a, 1, True, False)


def test_loop_get_distance():
    # S2LoopTest.testGetDistance: normal-onto-vertex, normal-not-onto-vertex,
    # and not-along-a-normal cases; the closest point to the origin is (0,1)
    # in all three, at exactly 1 degree measured along the equator.
    eps = 1e-15
    d = math.pi / 180.0
    s1 = make_loop("0:1, 1:1, 1:2, 0:2")
    s2 = make_loop("-1:1, 1:1, 1:2, -1:2")
    s3 = make_loop("1:0, 2:1, 3:0, 2:-1")

    for i in range(len(s1.vertices)):
        assert abs(s1.get_distance(s1.vertices[i])) < eps
    assert abs(s1.get_distance(make_point("0.5:1"))) < eps

    origin = make_point("0:0")
    assert abs(s1.get_distance(origin) / d - 1) < 1e-13
    assert abs(s2.get_distance(origin) / d - 1) < 1e-13
    assert abs(s3.get_distance(origin) / d - 1) < 1e-13


def test_polygon_get_distance():
    # S2PolygonTest.testGetDistance: vertices and edge points at distance 0,
    # interior point at 0, and the hole pushing the origin 1 degree out.
    eps = 1e-15
    d = math.pi / 180.0
    inner = "3:1, 3:-1, -3:-1, -3:1;"
    outer = "4:2, 4:-2, -4:-2, -4:2;"
    rect = make_polygon(inner)
    shell = make_polygon(inner + outer)

    for loop in shell.loops:
        for j in range(len(loop.vertices)):
            assert abs(shell.get_distance(loop.vertices[j])) < eps

    mid = rect.loops[0].vertices[0] + rect.loops[0].vertices[1]
    mid = mid / np.linalg.norm(mid)
    assert abs(rect.get_distance(mid)) < eps

    origin = make_point("0:0")
    assert abs(rect.get_distance(origin)) < eps
    assert abs(shell.get_distance(origin) / d - 1) < 1e-13


def test_loop_is_valid():
    # S2LoopTest.testIsValid (+ the bowtie fixture :81) and testRoundingError.
    from s2_geometry_library_java_spark.geometry.loop import loop_is_valid

    bowtie = "0:0, 2:0, 1:1, 0:2, 2:2, 1:1"
    assert loop_is_valid(loop_a.vertices)
    assert loop_is_valid(loop_b.vertices)
    assert not loop_is_valid(make_loop(bowtie).vertices)
    # testRoundingError: nearly-colinear vertices must not be reported as
    # crossing by the validity sweep.
    pts = np.array(
        [
            [-0.9190364081111774, 0.17231932652084575, 0.35451111445694833],
            [-0.92130667053206, 0.17274500072476123, 0.3483578383756171],
            [-0.9257244057938284, 0.17357332608634282, 0.3360158106235289],
            [-0.9278712595449962, 0.17397586116468677, 0.32982923679138537],
        ]
    )
    assert loop_is_valid(pts)


def test_cellunion_contains_cellunion():
    # S2CellUnionTest.testContainsCellUnion with the reference's fixed seed.
    rng = np.random.RandomState(123456)

    def random_leaf():
        face = rng.randint(6)
        pos = rng.randint(0, 1 << 62) & ((1 << (2 * ck.MAX_LEVEL)) - 1)
        return int(ck.from_face_pos_level(face, pos, ck.MAX_LEVEL)[0])

    cells = {random_leaf() for _ in range(100)}
    union = S2CellUnion(np.array(sorted(cells), dtype=np.uint64))
    extra = random_leaf()
    while extra in cells:
        extra = random_leaf()
    plus_one = S2CellUnion(np.array(sorted(cells | {extra}), dtype=np.uint64))
    assert plus_one.contains_union(union)
    assert not union.contains_union(plus_one)

    parents = {int(ck.parent(np.array([c], dtype=np.uint64), ck.MAX_LEVEL - 1)[0]) for c in cells}
    parent_union = S2CellUnion(np.array(sorted(parents), dtype=np.uint64))
    assert parent_union.contains_union(union)
    assert not union.contains_union(parent_union)
