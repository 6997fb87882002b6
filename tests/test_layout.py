"""Hilbert-locality layout: the pruned scan returns exactly the right
rows (also pinned by the layout_prune golden gate), the BETWEEN reaches
the parquet reader as a pushed filter, and the sorted layout's footer
stats actually admit row-group pruning where a shuffled layout's don't."""

import shutil

import numpy as np
import pytest
from pyspark.sql import functions as F

from s2_geometry_library_java_spark.kernel import cellid as ck
from s2_geometry_library_java_spark.operators.layout import (
    prunable_row_groups,
    read_cell_range,
    write_hilbert_layout,
)

N = 20000
N_FILES = 16


@pytest.fixture(scope="module")
def layout(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("layout")
    keys = np.arange(N, dtype=np.int64)
    lat = -90.0 + 180.0 * (((keys * 2654435761) % 4294967296).astype(np.float64) / 4294967296.0)
    lng = -180.0 + 360.0 * (((keys * 2246822519 + 1013904223) % 4294967296).astype(np.float64) / 4294967296.0)
    cells = ck.from_latlng_degrees(lat, lng).view(np.int64)
    df = spark.createDataFrame(
        [(int(k), int(c)) for k, c in zip(keys, cells)], "point_id long, cell_id long"
    )
    sorted_path, random_path = str(base / "sorted"), str(base / "random")
    write_hilbert_layout(df, sorted_path, n_files=N_FILES)
    # control: same rows, hash-shuffled layout (no spatial locality)
    df.repartition(N_FILES, "point_id").write.mode("overwrite").parquet(random_path)
    yield sorted_path, random_path, cells
    shutil.rmtree(str(base), ignore_errors=True)


def _probe_range(cells):
    # the level-2 parent of the median face-0..3 cell: positive int64 range
    pos = np.sort(cells[cells > 0])
    probe = ck.parent(pos[len(pos) // 2 : len(pos) // 2 + 1].view(np.uint64), 2)
    return int(ck.range_min(probe)[0].view(np.int64)), int(ck.range_max(probe)[0].view(np.int64))


def test_pruned_scan_is_exact(spark, layout):
    sorted_path, _, cells = layout
    rmin, rmax = _probe_range(cells)
    got = sorted(r.point_id for r in read_cell_range(spark, sorted_path, rmin, rmax).collect())
    want = sorted(np.nonzero((cells >= rmin) & (cells <= rmax))[0].tolist())
    assert got == want and len(want) > 10


def test_filter_is_pushed_to_parquet(spark, layout):
    sorted_path, _, cells = layout
    rmin, rmax = _probe_range(cells)
    plan = read_cell_range(spark, sorted_path, rmin, rmax)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "GreaterThanOrEqual(cell_id" in plan, plan


def test_sorted_layout_prunes_where_random_cannot(layout):
    sorted_path, random_path, cells = layout
    rmin, rmax = _probe_range(cells)
    s_hit, s_total = prunable_row_groups(sorted_path, rmin, rmax)
    r_hit, r_total = prunable_row_groups(random_path, rmin, rmax)
    # range covers ~1/96 of the sphere: the sorted layout touches O(1) row
    # groups; every shuffled row group intersects (its [min,max] spans all).
    assert s_total >= N_FILES and s_hit <= max(2, s_total // 8), (s_hit, s_total)
    assert r_hit == r_total, (r_hit, r_total)
