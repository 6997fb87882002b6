"""Tests for the as-of join and the multi-resolution time rollup."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _ts(s: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s)


def test_asof_backward_semantics(spark):
    from s2_geometry_library_java_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 1, _ts(5)), (2, 1, _ts(15)), (3, 1, _ts(20)), (4, 2, _ts(100))],
        "row_id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, _ts(10), 1.0), (1, _ts(20), 2.0), (3, _ts(0), 9.0)],
        "k long, ts timestamp, v double",
    )
    got = {r["row_id"]: r for r in asof_join(left, right, "k", payload_cols=["v"]).collect()}
    assert got[1]["asof_v"] is None  # before any right row
    assert got[1]["asof_ts"] is None
    assert got[2]["asof_v"] == 1.0  # latest <= 15 is ts=10
    assert got[3]["asof_v"] == 2.0  # equal timestamp matches (>= semantics)
    assert got[4]["asof_v"] is None  # key 2 has no right rows at all
    assert set(got[3].asDict()) == {"row_id", "k", "ts", "asof_ts", "asof_v"}


def test_asof_single_shuffle_no_join(spark):
    """The tagged-union sort-fill must plan ONE hash exchange and zero
    join operators — the whole point over a range join."""
    from s2_geometry_library_java_spark.operators.asof import asof_join

    left = spark.range(1000).select(
        F.col("id").alias("row_id"), (F.col("id") % 13).alias("k"),
        F.timestamp_seconds(F.col("id")).alias("ts"),
    )
    right = spark.range(100).select(
        (F.col("id") % 13).alias("k"), F.timestamp_seconds(F.col("id") * 10).alias("ts"),
        F.rand(7).alias("v"),
    ).groupBy("k", "ts").agg(F.max("v").alias("v"))
    plan = _plan(asof_join(left, right, "k", payload_cols=["v"]))
    assert "Join" not in plan, plan
    # one exchange for the right-side dedup agg is allowed; the asof fill
    # itself adds exactly one more (the window partitioning).
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_time_rollup_matches_duckdb(spark):
    import duckdb

    from s2_geometry_library_java_spark.operators.asof import time_rollup, time_rollup_sql

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    got = (
        time_rollup(ev).toPandas().sort_values(["resolution", "bucket"]).reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql("CREATE VIEW events AS SELECT * FROM '/root/testdata/sf0.001/events.parquet'")
    want = con.sql(time_rollup_sql()).df().sort_values(["resolution", "bucket"]).reset_index(drop=True)
    assert len(got) == len(want)
    for c in got.columns:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c


def test_time_rollup_one_pass(spark):
    """All three resolutions come from a single scan + a single aggregate
    exchange (GROUPING SETS), not three unioned jobs."""
    from s2_geometry_library_java_spark.operators.asof import time_rollup

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    plan = _plan(time_rollup(ev))
    assert plan.count("Scan parquet") == 1, plan
    assert "Expand" in plan  # grouping-sets expansion node


def test_asof_forward_semantics(spark):
    from s2_geometry_library_java_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 1, _ts(5)), (2, 1, _ts(15)), (3, 1, _ts(25)), (4, 2, _ts(0))],
        "row_id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, _ts(10), 1.0), (1, _ts(20), 2.0)],
        "k long, ts timestamp, v double",
    )
    got = {
        r["row_id"]: r
        for r in asof_join(left, right, "k", payload_cols=["v"], direction="forward").collect()
    }
    assert got[1]["asof_v"] == 1.0  # earliest >= 5 is ts=10
    assert got[2]["asof_v"] == 2.0  # earliest >= 15 is ts=20
    assert got[3]["asof_v"] is None  # nothing after 25
    assert got[4]["asof_v"] is None  # key 2 empty


def test_asof_forward_equal_ts_matches(spark):
    from s2_geometry_library_java_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 1, _ts(10))], "row_id long, k long, ts timestamp")
    right = spark.createDataFrame([(1, _ts(10), 7.0)], "k long, ts timestamp, v double")
    [row] = asof_join(left, right, "k", payload_cols=["v"], direction="forward").collect()
    assert row["asof_v"] == 7.0


def test_asof_tolerance_filters_far_matches(spark):
    from s2_geometry_library_java_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 1, _ts(12)), (2, 1, _ts(100))], "row_id long, k long, ts timestamp"
    )
    right = spark.createDataFrame([(1, _ts(10), 1.0)], "k long, ts timestamp, v double")
    got = {
        r["row_id"]: r
        for r in asof_join(
            left, right, "k", payload_cols=["v"], tolerance_seconds=5.0
        ).collect()
    }
    assert got[1]["asof_v"] == 1.0  # 2 s gap, inside tolerance
    assert got[2]["asof_v"] is None  # 90 s gap, filtered
    assert got[2]["asof_ts"] is None


def test_asof_rejects_bad_direction(spark):
    import pytest

    from s2_geometry_library_java_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 1, _ts(0))], "row_id long, k long, ts timestamp")
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, left.select("k", "ts"), "k", direction="sideways")
