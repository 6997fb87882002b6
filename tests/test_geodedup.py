"""Geo near-dup pairs: parity with an unblocked numpy brute recompute
(also pinned by the geo_neardup gate at sf0.01), pair uniqueness, the
blocking-level choice, and the no-all-pairs plan shape."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from s2_geometry_library_java_spark.kernel import cellid as ck
from s2_geometry_library_java_spark.kernel import metrics
from s2_geometry_library_java_spark.operators.geodedup import (
    geo_block_level,
    geo_neardup_pairs,
)

RADIUS = 0.05
MAX_HAM = 5
N = 2500


@pytest.fixture(scope="module")
def pts(spark):
    keys = np.arange(N, dtype=np.int64)
    lat = -90.0 + 180.0 * (((keys * 2654435761) % 4294967296).astype(np.float64) / 4294967296.0)
    lng = -180.0 + 360.0 * (((keys * 2246822519 + 1013904223) % 4294967296).astype(np.float64) / 4294967296.0)
    cells = ck.from_latlng_degrees(lat, lng).view(np.int64)
    ph = (keys * 40503) % 65536
    df = spark.createDataFrame(
        [(int(k), float(a), float(o), int(c), int(h)) for k, a, o, c, h in zip(keys, lat, lng, cells, ph)],
        "point_id long, lat double, lng double, cell_id long, phash long",
    )
    return df, lat, lng, ph


def _brute(lat, lng, ph):
    phi, lam = np.radians(lat), np.radians(lng)
    out = set()
    for i in range(N):
        dlat = np.sin(0.5 * (phi[i] - phi))
        dlng = np.sin(0.5 * (lam[i] - lam))
        x = dlat * dlat + dlng * dlng * np.cos(phi) * np.cos(phi[i])
        d = 2 * np.arctan2(np.sqrt(x), np.sqrt(np.maximum(0.0, 1.0 - x)))
        ham = np.array([bin(int(ph[i]) ^ int(h)).count("1") for h in ph])
        hit = (d <= RADIUS) & (ham <= MAX_HAM) & (np.arange(N) > i)
        out |= {(i, int(j)) for j in np.nonzero(hit)[0]}
    return out


def test_matches_unblocked_brute(spark, pts):
    df, lat, lng, ph = pts
    rows = geo_neardup_pairs(df, RADIUS, MAX_HAM).collect()
    got = {(r.id_lo, r.id_hi) for r in rows}
    assert len(got) == len(rows)  # pair dedup held
    want = _brute(lat, lng, ph)
    assert got == want and len(want) > 10


def test_block_level_covers_radius():
    lvl = geo_block_level(RADIUS)
    assert metrics.MIN_WIDTH.get_value(lvl) >= RADIUS
    assert metrics.MIN_WIDTH.get_value(lvl + 1) < RADIUS


def test_plan_has_no_all_pairs_join(spark, pts):
    df, _, _, _ = pts
    plan = (
        geo_neardup_pairs(df, RADIUS, MAX_HAM)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan  # refine is fully native
