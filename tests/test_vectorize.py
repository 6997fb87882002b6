"""Raster -> vector boundary extraction (operators/vectorize.py).

The inverse direction of tiling: uniform-level tile rasters back to closed
boundary rings.  Checks edge cancellation (O(area) -> O(perimeter)),
deterministic ring chaining (outer CCW / holes CW per the face frames,
S2Projections.java:271-286), cross-face seam cancellation, and the exact
integer re-rasterization round trip.
"""

import numpy as np
import pytest

from s2_geometry_library_java_spark.kernel import cellid as ck
from s2_geometry_library_java_spark.operators.vectorize import (
    boundary_edges,
    boundary_rings,
    directed_edges,
    raster_df,
    rasterize_rings_single_face,
    tiles_to_grid,
    uniform_raster,
)


def _block(layer, face, x0, y0, w, h, skip=()):
    return [
        (layer, face, x, y)
        for x in range(x0, x0 + w)
        for y in range(y0, y0 + h)
        if (x, y) not in skip
    ]


def _rings_of(df):
    out = {}
    for r in df.collect():
        out.setdefault((r.layer_id, r.ring_id), []).append((r.seq, r.vlat, r.vlng))
    return {
        k: [(la, ln) for _, la, ln in sorted(v)] for k, v in out.items()
    }


def test_directed_edges_explode_count(spark):
    tiles = raster_df(spark, _block("a", 1, 10, 10, 3, 2))
    assert directed_edges(tiles, 8).count() == 4 * 6


def test_interior_cancellation_perimeter_only(spark):
    # 4x4 solid block: 16 tiles, 64 directed edges, perimeter = 16 edges
    tiles = raster_df(spark, _block("a", 2, 100, 100, 4, 4))
    be = boundary_edges(tiles, 10)
    assert be.count() == 16


def test_single_tile_ring_is_ccw_square(spark):
    tiles = raster_df(spark, [("t", 0, 512, 512)])
    rings = _rings_of(boundary_rings(tiles, 10))
    assert len(rings) == 1
    ring = rings[("t", 0)]
    assert len(ring) == 4
    # CCW in (s,t) on face 0 => CCW on the sphere => positive signed area in
    # the local tangent plane (shoelace on lat/lng is fine for a tiny square
    # near the face center)
    area2 = sum(
        ring[i][1] * ring[(i + 1) % 4][0] - ring[(i + 1) % 4][1] * ring[i][0]
        for i in range(4)
    )
    assert area2 > 0


def test_donut_two_rings_hole_cw(spark):
    # 5x5 block minus center tile: outer ring (20 verts) CCW + hole (4 verts) CW
    tiles = raster_df(spark, _block("d", 1, 200, 200, 5, 5, skip={(202, 202)}))
    rings = _rings_of(boundary_rings(tiles, 9))
    assert len(rings) == 2
    by_len = sorted(rings.values(), key=len)
    assert [len(r) for r in by_len] == [4, 20]

    def shoelace(r):
        return sum(
            r[i][1] * r[(i + 1) % len(r)][0] - r[(i + 1) % len(r)][1] * r[i][0]
            for i in range(len(r))
        )

    assert shoelace(by_len[1]) > 0  # outer CCW
    assert shoelace(by_len[0]) < 0  # hole CW


def test_two_layers_independent(spark):
    rows = _block("a", 0, 10, 10, 2, 2) + _block("b", 0, 10, 10, 2, 2)
    rings = _rings_of(boundary_rings(raster_df(spark, rows), 6))
    assert set(k[0] for k in rings) == {"a", "b"}
    assert all(len(v) == 8 for v in rings.values())


def test_cross_face_seam_cancels(spark):
    # Two leaf-adjacent tiles on different faces: their shared geometric edge
    # must cancel in ring chaining, leaving ONE ring of 6 vertices (the two
    # squares fused into a 2x1 rectangle across the face seam).
    level = 6
    n = 1 << level
    # face 0's u=+1 edge (gx = n-1) abuts face 1's u=-1 edge (gx = 0); the
    # (s,t) grids are oriented so gy runs the same way along this seam.
    rows = [("s", 0, n - 1, 7), ("s", 1, 0, 7)]
    rings = _rings_of(boundary_rings(raster_df(spark, rows), level))
    assert len(rings) == 1
    (ring,) = rings.values()
    assert len(ring) == 6


def test_uniform_raster_and_grid_roundtrip():
    # covering cells at mixed levels -> uniform raster -> grid coords -> ids
    ids = np.array(
        [ck.from_latlng_degrees(np.array([48.85]), np.array([2.35]))[0]], dtype=np.uint64
    )
    parent8 = ck.parent(ids, 8)
    from s2_geometry_library_java_spark.geometry.cellunion import S2CellUnion

    union = S2CellUnion(np.concatenate([ck.parent(ids, 10), ck.parent(ids, 12)]))
    tiles = uniform_raster(union, 10)
    assert (ck.level(tiles) == 10).all()
    face, gx, gy = tiles_to_grid(tiles, 10)
    assert len(tiles) == len(np.unique(tiles))
    # every tile's level-8 ancestor is the original parent8
    assert (ck.parent(tiles, 8) == parent8[0]).all()


def test_rasterize_round_trip_single_face(spark):
    # vectorize an L-shaped raster, then re-rasterize the rings over a
    # candidate window and recover exactly the input tile set
    level = 9
    rows = _block("L", 3, 50, 50, 4, 4, skip={(52, 52), (53, 52), (52, 53), (53, 53)})
    tiles = raster_df(spark, rows)
    be = boundary_edges(tiles, level).collect()

    # unpack keys back to grid segments
    from s2_geometry_library_java_spark.operators.vectorize import _unpack_vertices

    ka = np.array([r.ka for r in be], dtype=np.int64)
    kb = np.array([r.kb for r in be], dtype=np.int64)
    _, xa, ya = _unpack_vertices(level, ka)
    _, xb, yb = _unpack_vertices(level, kb)
    segs = list(zip(xa.tolist(), ya.tolist(), xb.tolist(), yb.tolist()))

    cand = np.array([(x, y) for x in range(45, 60) for y in range(45, 60)], dtype=np.int64)
    mask = rasterize_rings_single_face(segs, cand)
    got = {(int(x), int(y)) for (x, y), m in zip(cand.tolist(), mask.tolist()) if m}
    assert got == {(x, y) for _, _, x, y in rows}


def test_boundary_edges_plan_is_native(spark):
    # explode + anti-join must stay codegen'd: no Python eval in the plan
    tiles = raster_df(spark, _block("a", 0, 0, 0, 2, 2))
    plan = boundary_edges(tiles, 8)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
