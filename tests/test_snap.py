"""Radius-bounded snap-to-polyline: completeness vs the covering-free
brute recompute (also pinned by the snap_roads golden gate), level choice,
and the plan shape (broadcast candidates, no fact-side shuffle before the
refine)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from s2_geometry_library_java_spark.geometry.polyline import S2Polyline
from s2_geometry_library_java_spark.geometry.text_format import parse_vertices
from s2_geometry_library_java_spark.kernel import cellid as ck
from s2_geometry_library_java_spark.kernel import metrics
from s2_geometry_library_java_spark.kernel import predicates as pr
from s2_geometry_library_java_spark.operators.snap import snap_join, snap_level

LINES = {
    "l1": S2Polyline(parse_vertices("0:-60, 10:0, 0:60")),
    "l2": S2Polyline(parse_vertices("-30:-30, -45:30")),
}
RADIUS = 0.03
N = 4000


@pytest.fixture(scope="module")
def pts(spark):
    keys = np.arange(N, dtype=np.int64)
    lat = -90.0 + 180.0 * (((keys * 2654435761) % 4294967296).astype(np.float64) / 4294967296.0)
    lng = -180.0 + 360.0 * (((keys * 2246822519 + 1013904223) % 4294967296).astype(np.float64) / 4294967296.0)
    cells = ck.from_latlng_degrees(lat, lng).view(np.int64)
    df = spark.createDataFrame(
        [(int(k), float(a), float(o), int(c)) for k, a, o, c in zip(keys, lat, lng, cells)],
        "point_id long, lat double, lng double, cell_id long",
    )
    return df, lat, lng


def _brute(lat, lng):
    x = ck.latlng_degrees_to_xyz(lat, lng)
    max_nrad = int(np.floor(RADIUS * 1e9 + 0.5))
    best_d = np.full(len(lat), np.iinfo(np.int64).max, dtype=np.int64)
    best_l = np.full(len(lat), "", dtype=object)
    for lid in sorted(LINES):
        a, b = LINES[lid].vertices[:-1], LINES[lid].vertices[1:]
        d = np.min(
            np.stack([pr.edge_distance(x, a[k][None, :], b[k][None, :]) for k in range(len(a))]),
            axis=0,
        )
        nrad = np.floor(d * 1e9 + 0.5).astype(np.int64)
        better = nrad < best_d
        best_d = np.where(better, nrad, best_d)
        best_l = np.where(better, lid, best_l)
    keep = best_d <= max_nrad
    return {
        (int(i), str(l), int(d))
        for i, l, d in zip(np.arange(len(lat))[keep], best_l[keep], best_d[keep])
    }


def test_snap_matches_brute(spark, pts):
    df, lat, lng = pts
    got = {
        (r.point_id, r.line_id, r.dist_nrad)
        for r in snap_join(df, LINES, RADIUS).collect()
    }
    want = _brute(lat, lng)
    assert got == want and len(want) > 20


def test_level_guarantees_one_ring(spark):
    lvl = snap_level(RADIUS)
    assert metrics.MIN_WIDTH.get_value(lvl) >= RADIUS
    assert metrics.MIN_WIDTH.get_value(lvl + 1) < RADIUS


def test_plan_broadcasts_candidates_no_fact_shuffle(spark, pts):
    df, _, _ = pts
    plan = snap_join(df, LINES, RADIUS)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the only Exchange is the per-point argmin window over candidate pairs
    # AFTER the refine; the fact scan side must join shuffle-free.
    pre_refine = plan.split("MapInPandas")[-1]  # plan prints children below
    assert "Exchange hashpartitioning" not in pre_refine, pre_refine


def test_degenerate_polyline_rejected_driver_side(spark, pts):
    """A 0/1-vertex line has no edges: snap_join must fail fast with the
    line id in the message, not deep inside an Arrow task."""
    df, _, _ = pts
    bad = dict(LINES)
    bad["stub"] = S2Polyline(parse_vertices("5:5"))
    with pytest.raises(ValueError, match="stub"):
        snap_join(df, bad, RADIUS)
