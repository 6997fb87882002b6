"""Spherical Douglas-Peucker simplification: the deviation guarantee
(every dropped vertex within tol of its covering kept segment),
endpoint retention, the tol extremes, and distributed/driver parity."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from s2_geometry_library_java_spark.kernel import cellid as ck
from s2_geometry_library_java_spark.kernel import predicates as pr
from s2_geometry_library_java_spark.operators.simplify import (
    dp_keep_mask,
    simplify_trajectories,
)

TOL = 0.9
N = 2000
N_USERS = 20


def _keys():
    # a fixed permutation: consecutive-integer geotag keys walk a regular
    # lattice (every vertex a corner, nothing simplifiable); permuting
    # them yields irregular traces that DP actually compresses
    return np.random.RandomState(42).permutation(N).astype(np.int64)


@pytest.fixture(scope="module")
def traces(spark):
    perm = _keys()
    rows = [(int(k % N_USERS), int(k), int(perm[k])) for k in range(N)]
    df = spark.createDataFrame(rows, "user_id long, ts long, event_id long")
    return df


def _geotag_xyz(keys):
    lat = -90.0 + 180.0 * (((keys * 2654435761) % 4294967296).astype(np.float64) / 4294967296.0)
    lng = -180.0 + 360.0 * (((keys * 2246822519 + 1013904223) % 4294967296).astype(np.float64) / 4294967296.0)
    return ck.latlng_degrees_to_xyz(lat, lng)


def test_deviation_guarantee_and_parity(spark, traces):
    got = simplify_trajectories(traces, TOL).collect()
    by_user = {}
    for r in got:
        by_user.setdefault(r.user_id, []).append(r.seq)
    perm = _keys()
    assert len(got) < N  # corpus-level: simplification actually happened
    for u in range(N_USERS):
        xyz = _geotag_xyz(perm[np.arange(N) % N_USERS == u])
        want = np.nonzero(dp_keep_mask(xyz, TOL))[0]
        assert sorted(by_user[u]) == list(want)  # distributed == driver mask
        seqs = np.asarray(sorted(by_user[u]))
        assert seqs[0] == 0 and seqs[-1] == len(xyz) - 1  # endpoints kept
        # every dropped vertex within TOL of its covering kept segment
        for a, b in zip(seqs[:-1], seqs[1:]):
            if b > a + 1:
                d = pr.edge_distance(xyz[a + 1 : b], xyz[a][None, :], xyz[b][None, :])
                assert (d <= TOL).all()


def test_tol_extremes():
    xyz = _geotag_xyz(np.arange(50, dtype=np.int64))
    assert dp_keep_mask(xyz, np.pi).sum() == 2          # only endpoints
    assert dp_keep_mask(xyz, 0.0).sum() == len(xyz)     # nothing dropped
    assert dp_keep_mask(xyz[:1], 0.1).tolist() == [True]
    assert dp_keep_mask(xyz[:0], 0.1).tolist() == []


def test_single_shuffle_plan(spark, traces):
    plan = (
        simplify_trajectories(traces, TOL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "MapInPandas" in plan  # batched traces, not one pandas hop per trace
    assert "Sort" in plan  # (user, ts, key) within partitions


def test_batch_straddle_stitching(spark, traces):
    """A trace split across Arrow batches must produce identical output:
    force 7-row batches (traces are ~100 rows) and compare to the default."""
    want = sorted(map(tuple, simplify_trajectories(traces, TOL).collect()))
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        got = sorted(map(tuple, simplify_trajectories(traces, TOL).collect()))
    finally:
        spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
    assert got == want


def test_id_column_types_follow_input_schema(spark):
    """A string entity id / int key must flow through (the output schema is
    derived from the input, not hardcoded long)."""
    from pyspark.sql import functions as F

    from s2_geometry_library_java_spark.operators.simplify import (
        simplify_trajectories,
    )

    base = spark.range(200).select(
        F.concat(F.lit("u"), (F.col("id") % 4).cast("string")).alias("user_id"),
        F.col("id").alias("ts"),
        F.col("id").cast("int").alias("event_id"),
    )
    out = simplify_trajectories(base, tol_rad=1e-3)
    assert dict(out.dtypes)["user_id"] == "string"
    assert dict(out.dtypes)["event_id"] == "int"
    rows = out.collect()
    assert len(rows) > 0 and all(r.user_id.startswith("u") for r in rows)
