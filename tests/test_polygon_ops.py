"""Ports of S2PolygonTest boolean-op cases (testDisjoint,
testUnionSloppySuccess/Failure, tryUnion equivalence) and
S2PolygonBuilder assembly behavior — no Spark needed."""

import math

import numpy as np
import pytest

from s2_geometry_library_java_spark.geometry import ops
from s2_geometry_library_java_spark.geometry.builder import (
    BuilderOptions,
    S2PolygonBuilder,
    undirected_xor,
)
from s2_geometry_library_java_spark.geometry.polygon import S2Polygon
from s2_geometry_library_java_spark.geometry.text_format import make_loop, make_polygon
from s2_geometry_library_java_spark.kernel import cellid as ck

# Fixtures from S2PolygonTest.java:65-70
ADJACENT0 = "0:1, 1:1, 2:1, 2:0, 1:0, 0:0;"
ADJACENT1 = "0:2, 1:2, 2:2, 2:1.01, 1:0.99, 0:1.01;"
UN_ADJACENT = "10:10, 11:10, 12:10, 12:9, 11:9, 10:9;"
NEAR0 = "-1:0, 0:1, 1:0, 0:-1;"
NEAR1 = "-1:-1, -1:0, -1:1, 0:1, 1:1, 1:0, 1:-1, 0:-1;"


def _loop_approx_equal(a, b, max_error):
    # S2Loop.boundaryApproxEquals (S2Loop.java:554-575): match up to rotation.
    if a.n != b.n:
        return False
    for offset in range(a.n):
        if all(
            np.max(np.abs(a.vertex((offset + i) % a.n) - b.vertex(i))) <= max_error
            for i in range(a.n)
        ):
            return True
    return False


def _poly_approx_equal(a: S2Polygon, b: S2Polygon, max_error=1e-9):
    # S2Polygon.boundaryApproxEquals (S2Polygon.java:829-852)
    if a.num_loops() != b.num_loops():
        return False
    used = set()
    for i in range(a.num_loops()):
        found = False
        for j in range(b.num_loops()):
            if j in used:
                continue
            if b.loop(j).depth == a.loop(i).depth and _loop_approx_equal(a.loop(i), b.loop(j), max_error):
                used.add(j)
                found = True
                break
        if not found:
            return False
    return True


def _check_equal(a: S2Polygon, b: S2Polygon):
    # S2PolygonTest.checkEqual (:193-209): re-assemble through UNDIRECTED_XOR
    # when not normalized, then compare boundaries.
    ba = S2PolygonBuilder(undirected_xor())
    ba.add_polygon(a)
    a2, ok_a = ba.assemble_polygon()
    bb = S2PolygonBuilder(undirected_xor())
    bb.add_polygon(b)
    b2, ok_b = bb.assemble_polygon()
    assert ok_a and ok_b
    assert _poly_approx_equal(a2, b2)


def try_union(a: S2Polygon, b: S2Polygon):
    # S2PolygonTest.tryUnion (:211-221)
    u = ops.union(a, b)
    du = ops.destructive_union([S2Polygon([l for l in map(a.loop, range(a.num_loops()))]),
                                S2Polygon([l for l in map(b.loop, range(b.num_loops()))])])
    _check_equal(u, du)
    return u


def test_disjoint():
    # S2PolygonTest.testDisjoint (:223-236)
    adj0 = make_polygon(ADJACENT0)
    un_adj = make_polygon(UN_ADJACENT)
    builder = S2PolygonBuilder(undirected_xor())
    builder.add_polygon(adj0)
    builder.add_polygon(un_adj)
    ab, ok = builder.assemble_polygon()
    assert ok
    union = ops.union(make_polygon(ADJACENT0), make_polygon(UN_ADJACENT))
    assert union.num_loops() == 2
    _check_equal(ab, union)
    try_union(make_polygon(ADJACENT0), make_polygon(UN_ADJACENT))


def _latlng_deg(p):
    lat = math.degrees(math.atan2(p[2], math.hypot(p[0], p[1])))
    lng = math.degrees(math.atan2(p[1], p[0]))
    return lat, lng


def test_union_sloppy_success():
    # S2PolygonTest.testUnionSloppySuccess (:238-261)
    adj0 = make_polygon(ADJACENT0)
    adj1 = make_polygon(ADJACENT1)
    union = ops.destructive_union([adj0, adj1], math.radians(0.1))
    assert union.num_loops() == 1
    loop = union.loop(0)
    assert loop.n == 8
    expect = [(2, 0), (1, 0), (0, 0), (0, 1), (0, 2), (1, 2), (2, 2), (2, 1)]
    for k, (elat, elng) in enumerate(expect):
        lat, lng = _latlng_deg(loop.vertex(k))
        assert abs(lat - elat) <= 0.01 and abs(lng - elng) <= 0.01, (k, lat, lng)


def test_union_sloppy_failure():
    # S2PolygonTest.testUnionSloppyFailure (:263-273)
    union = ops.destructive_union(
        [make_polygon(ADJACENT0), make_polygon(UN_ADJACENT)], math.radians(0.1)
    )
    assert union.num_loops() == 2


def test_intersection_nested():
    # inner ∩ outer == inner; inner ∪ outer == outer (NEAR0 inside NEAR1)
    inner = make_polygon(NEAR0)
    outer = make_polygon(NEAR1)
    inter = ops.intersection(inner, outer)
    assert _poly_approx_equal(inter, make_polygon(NEAR0), 1e-9)
    union = try_union(make_polygon(NEAR0), make_polygon(NEAR1))
    assert _poly_approx_equal(union, make_polygon(NEAR1), 1e-9)


def test_intersection_overlap_area():
    # Two overlapping 20x20-degree quads: intersection area sanity vs direct
    # point sampling parity (area additivity: A + B = A∪B + A∩B).
    a = make_polygon("0:0, 0:20, 20:20, 20:0;")
    b = make_polygon("10:10, 10:30, 30:30, 30:10;")
    inter = ops.intersection(a, b)
    union = ops.union(a, b)
    assert inter.num_loops() == 1 and union.num_loops() == 1
    lhs = a.get_area() + b.get_area()
    rhs = union.get_area() + inter.get_area()
    assert abs(lhs - rhs) < 1e-10


def test_builder_assemble_from_edge_soup():
    # Feed a loop's directed edges in scrambled order; assembly reconstructs it.
    loop = make_loop("0:0, 0:10, 10:10, 10:0")
    edges = [(loop.vertex(i), loop.vertex(i + 1)) for i in range(loop.n)]
    rng = np.random.default_rng(123456)
    for perm in range(5):
        builder = S2PolygonBuilder(BuilderOptions(False, True))
        for i in rng.permutation(len(edges)):
            builder.add_edge(*edges[i])
        loops, ok = builder.assemble_loops()
        assert ok and len(loops) == 1
        assert _loop_approx_equal(loops[0], loop, 0.0)


def test_builder_xor_cancels():
    # An edge and its reverse cancel under xor (S2PolygonBuilder.java:225-239).
    loop = make_loop("0:0, 0:10, 10:10, 10:0")
    builder = S2PolygonBuilder(BuilderOptions(False, True))
    for i in range(loop.n):
        builder.add_edge(loop.vertex(i), loop.vertex(i + 1))
    for i in range(loop.n):
        builder.add_edge(loop.vertex(i + 1), loop.vertex(i))
    loops, ok = builder.assemble_loops()
    assert ok and loops == []


def test_builder_merge_vertices():
    # Two nearly-identical chains merge into one loop within merge_distance.
    a = make_loop("0:0, 0:10, 10:10, 10:0")
    jitter = 1e-9
    vs = a.vertices + jitter * np.array([[1, -1, 1]] * a.n)
    vs = vs / np.linalg.norm(vs, axis=1, keepdims=True)
    builder = S2PolygonBuilder(BuilderOptions(False, True, merge_distance=1e-6))
    for i in range(a.n):
        builder.add_edge(a.vertex(i), a.vertex(i + 1))
    # extra open chain that should snap onto existing vertices
    builder.add_edge(vs[0], a.vertex(0))
    loops, ok = builder.assemble_loops()
    assert len(loops) == 1
