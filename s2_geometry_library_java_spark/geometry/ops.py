"""Polygon boolean operations: intersection, union, destructive union.

Port of ``S2Polygon.java`` clipping machinery (B5-B6 in SURVEY.md §2.6):
clipEdge (:590-611) finds where B's boundary crosses an A edge (here a
vectorized robust_crossing sweep over all B edges — the reference's
S2PolygonIndex, :516-554, is a perf-only candidate filter with identical
results), addIntersection (:556-583) handles proper and vertex crossings,
clipBoundary (:623-660) tracks inside/outside parity along each A loop and
emits the clipped sub-edges, and initToIntersection/initToUnion (:684-730)
assemble the pieces with a DIRECTED_XOR builder at the default intersection
tolerance (S2EdgeUtil.java:40).

Broadcast-side: polygon layers are small; at engine scale these run
per-layer-pair on the driver (layer prep), never against the fact table.
"""

from __future__ import annotations

import numpy as np

from s2_geometry_library_java_spark.kernel import predicates as pr
from s2_geometry_library_java_spark.geometry.builder import BuilderOptions, S2PolygonBuilder
from s2_geometry_library_java_spark.geometry.polygon import S2Polygon

DEFAULT_INTERSECTION_TOLERANCE = pr.DEFAULT_INTERSECTION_TOLERANCE


def _polygon_edges(poly: S2Polygon, reverse: bool) -> tuple[np.ndarray, np.ndarray]:
    """All boundary edges with hole-direction reversal
    (S2PolygonIndex.edgeFromTo, S2Polygon.java:533-554)."""
    froms, tos = [], []
    for i in range(poly.num_loops()):
        loop = poly.loop(i)
        v0 = loop.vertices
        v1 = np.roll(loop.vertices, -1, axis=0)
        if loop.is_hole() ^ reverse:
            froms.append(v1[::-1])
            tos.append(v0[::-1])
        else:
            froms.append(v0)
            tos.append(v1)
    if not froms:
        return np.zeros((0, 3)), np.zeros((0, 3))
    return np.concatenate(froms), np.concatenate(tos)


def _add_intersection(a0, a1, b0, b1, add_shared_edges, crossing, intersections) -> None:
    # S2Polygon.addIntersection (:556-583)
    if crossing > 0:
        x = pr.get_intersection(a0, a1, b0, b1)
        t = pr.get_distance_fraction(x, a0, a1)
        intersections.append((t, tuple(x)))
    elif pr.vertex_crossing_scalar(a0, a1, b0, b1):
        t = 0.0 if (np.array_equal(a0, b0) or np.array_equal(a0, b1)) else 1.0
        if not add_shared_edges and np.array_equal(a1, b1):
            t = 1.0
        intersections.append((t, tuple(a0 if t == 0.0 else a1)))


def _clip_edge(a0, a1, b_from, b_to, add_shared_edges, intersections) -> None:
    # S2Polygon.clipEdge (:590-611) — vectorized crossing sweep, then the
    # rare (crossing >= 0) rows handled scalar.
    if b_from.shape[0] == 0:
        return
    crossings = pr.robust_crossing(a0[None, :], a1[None, :], b_from, b_to)
    for i in np.flatnonzero(crossings >= 0):
        _add_intersection(a0, a1, b_from[i], b_to[i], add_shared_edges, int(crossings[i]), intersections)


def _clip_boundary(a: S2Polygon, reverse_a: bool, b: S2Polygon, reverse_b: bool,
                   invert_b: bool, add_shared_edges: bool, builder: S2PolygonBuilder) -> None:
    # S2Polygon.clipBoundary (:623-660)
    b_from, b_to = _polygon_edges(b, reverse_b)
    for li in range(a.num_loops()):
        a_loop = a.loop(li)
        n = a_loop.n
        direction = -1 if (a_loop.is_hole() ^ reverse_a) else 1
        inside = bool(b.contains_point(a_loop.vertex(0))) ^ invert_b
        j = 0 if direction > 0 else n
        for _ in range(n):
            a0 = a_loop.vertex(j)
            a1 = a_loop.vertex(j + direction)
            intersections: list[tuple[float, tuple]] = []
            _clip_edge(a0, a1, b_from, b_to, add_shared_edges, intersections)
            if inside:
                intersections.append((0.0, tuple(a0)))
            inside = (len(intersections) & 1) == 1
            if inside:
                intersections.append((1.0, tuple(a1)))
            # Sort by (t, point) — ParametrizedS2Point.compareTo (:1160-1167).
            intersections.sort()
            for i in range(1, len(intersections), 2):
                builder.add_edge(np.array(intersections[i - 1][1]), np.array(intersections[i][1]))
            j += direction


def intersection(a: S2Polygon, b: S2Polygon,
                 vertex_merge_radius: float = DEFAULT_INTERSECTION_TOLERANCE) -> S2Polygon:
    """A ∩ B (S2Polygon.initToIntersectionSloppy, :690-708)."""
    if not a.get_rect_bound().intersects_rect(b.get_rect_bound()):
        return S2Polygon()
    builder = S2PolygonBuilder(BuilderOptions(False, True, merge_distance=vertex_merge_radius))
    _clip_boundary(a, False, b, False, False, True, builder)
    _clip_boundary(b, False, a, False, False, False, builder)
    poly, _ = builder.assemble_polygon()
    return poly


def union(a: S2Polygon, b: S2Polygon,
          vertex_merge_radius: float = DEFAULT_INTERSECTION_TOLERANCE) -> S2Polygon:
    """A ∪ B (S2Polygon.initToUnionSloppy, :710-730)."""
    builder = S2PolygonBuilder(BuilderOptions(False, True, merge_distance=vertex_merge_radius))
    _clip_boundary(a, False, b, False, True, True, builder)
    _clip_boundary(b, False, a, False, True, False, builder)
    poly, _ = builder.assemble_polygon()
    return poly


def destructive_union(polygons: list[S2Polygon],
                      vertex_merge_radius: float = DEFAULT_INTERSECTION_TOLERANCE) -> S2Polygon:
    """Union of many polygons, smallest-two-first queue
    (S2Polygon.destructiveUnionSloppy, :736-791)."""
    queue: list[tuple[int, int, S2Polygon]] = []
    seq = 0
    for poly in polygons:
        queue.append((poly.num_vertices, seq, poly))
        seq += 1
    polygons.clear()
    import heapq

    heapq.heapify(queue)
    while len(queue) > 1:
        a_size, _, a_poly = heapq.heappop(queue)
        b_size, _, b_poly = heapq.heappop(queue)
        merged = union(a_poly, b_poly, vertex_merge_radius)
        heapq.heappush(queue, (a_size + b_size, seq, merged))
        seq += 1
    return queue[0][2] if queue else S2Polygon()
