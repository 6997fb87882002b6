"""Adaptive tiling: brute-recursion parity (also pinned by the
adaptive_tiles golden gate), the disjoint/complete/cap invariants, and
the plan shape (post-grid plan never rereads the facts)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from s2_geometry_library_java_spark.kernel import cellid as ck
from s2_geometry_library_java_spark.operators.adaptive import adaptive_tiles

CAP = 40
MIN_LVL = 1
MAX_LVL = 6
N = 5000


@pytest.fixture(scope="module")
def pts(spark):
    keys = np.arange(N, dtype=np.int64)
    lat = -90.0 + 180.0 * (((keys * 2654435761) % 4294967296).astype(np.float64) / 4294967296.0)
    lng = -180.0 + 360.0 * (((keys * 2246822519 + 1013904223) % 4294967296).astype(np.float64) / 4294967296.0)
    cells = ck.from_latlng_degrees(lat, lng).view(np.int64)
    df = spark.createDataFrame(
        [(int(k), int(c)) for k, c in zip(keys, cells)], "point_id long, cell_id long"
    )
    return df, cells


def _brute(cells):
    grid: dict[int, int] = {}
    for c in ck.parent(cells.view(np.uint64), MAX_LVL).view(np.int64):
        grid[int(c)] = grid.get(int(c), 0) + 1
    counts = {MAX_LVL: grid}
    kids: dict[int, dict[int, list[int]]] = {}
    for lvl in range(MAX_LVL - 1, MIN_LVL - 1, -1):
        counts[lvl], kids[lvl] = {}, {}
        arr = np.fromiter(counts[lvl + 1], dtype=np.int64)
        for k, p in zip(arr, ck.parent(arr.view(np.uint64), lvl).view(np.int64)):
            counts[lvl][int(p)] = counts[lvl].get(int(p), 0) + counts[lvl + 1][int(k)]
            kids[lvl].setdefault(int(p), []).append(int(k))
    out = set()

    def walk(cell, lvl):
        n = counts[lvl][cell]
        if n <= CAP or lvl == MAX_LVL:
            out.add((cell, lvl, n, n > CAP))
        else:
            for k in kids[lvl][cell]:
                walk(k, lvl + 1)

    for cell in counts[MIN_LVL]:
        walk(cell, MIN_LVL)
    return out


@pytest.fixture(scope="module")
def tiles(spark, pts):
    df, _ = pts
    return adaptive_tiles(df, CAP, MIN_LVL, MAX_LVL)


def test_matches_brute_recursion(tiles, pts):
    _, cells = pts
    got = {(r.tile_id, r.level, r.n, r.overflow) for r in tiles.collect()}
    assert got == _brute(cells)
    assert any(lvl > MIN_LVL for _, lvl, _, _ in got)  # splits actually happened


def test_disjoint_complete_and_capped(tiles, pts):
    _, cells = pts
    rows = tiles.collect()
    ids = np.array([r.tile_id for r in rows], dtype=np.int64).view(np.uint64)
    rmin, rmax = ck.range_min(ids), ck.range_max(ids)
    # disjoint: K14 descendant ranges never overlap pairwise
    order = np.argsort(rmin)
    assert (rmin[order][1:] > rmax[order][:-1]).all()
    # complete, exactly once: every point's leaf falls in exactly one range
    leafs = cells.view(np.uint64)
    starts = np.searchsorted(rmin[order], leafs, side="right") - 1
    assert (starts >= 0).all() and (leafs <= rmax[order][starts]).all()
    # cap respected except flagged overflow at the floor
    for r in rows:
        assert r.n <= CAP or (r.overflow and r.level == MAX_LVL)
    assert sum(r.n for r in rows) == N


def test_plan_runs_on_grid_not_facts(tiles):
    plan = tiles._jdf.queryExecution().executedPlan().toString()
    # the fact pass happened once inside the eager grid checkpoint; the
    # tile plan itself only scans the checkpointed grid RDD
    assert "Scan parquet" not in plan and "Scan ExistingRDD" in plan
    assert "BroadcastHashJoin" in plan


def test_floor_equals_ceiling_flags_overflow(spark, pts):
    df, cells = pts
    got = {
        (r.tile_id, r.n, r.overflow)
        for r in adaptive_tiles(df, CAP, 2, 2).collect()
    }
    grid: dict[int, int] = {}
    for c in ck.parent(cells.view(np.uint64), 2).view(np.int64):
        grid[int(c)] = grid.get(int(c), 0) + 1
    assert got == {(c, n, n > CAP) for c, n in grid.items()}
