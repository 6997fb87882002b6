"""Temporal interval-overlap join: edge semantics, cross-bucket spans,
the max_buckets guard, and the plan shape (equi-join, never a per-key
nested loop)."""

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from s2_geometry_library_java_spark.operators.interval_join import interval_overlap_join

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def frames(spark):
    pts = spark.createDataFrame(
        [
            Row(event_id=1, user_id=1, ts=_ts(0)),     # == start (closed)
            Row(event_id=2, user_id=1, ts=_ts(30)),    # == end (closed)
            Row(event_id=3, user_id=1, ts=_ts(30.01)), # just past end
            Row(event_id=4, user_id=1, ts=_ts(75)),    # inside the long interval only
            Row(event_id=5, user_id=2, ts=_ts(10)),    # right key, other user
            Row(event_id=6, user_id=1, ts=_ts(-0.01)), # just before start
        ]
    )
    iv = spark.createDataFrame(
        [
            Row(user_id=1, interval_id=100, start_ts=_ts(0), end_ts=_ts(30)),
            # spans 5 buckets at the default 1800 s width
            Row(user_id=1, interval_id=200, start_ts=_ts(60), end_ts=_ts(180)),
        ]
    )
    return pts, iv


EXPECTED = {(1, 100), (2, 100), (4, 200)}


def test_pairs_exact(frames):
    pts, iv = frames
    got = {
        (r.event_id, r.interval_id)
        for r in interval_overlap_join(pts, iv).select("event_id", "interval_id").collect()
    }
    assert got == EXPECTED


def test_shuffled_path_matches_broadcast(frames):
    pts, iv = frames
    got = {
        (r.event_id, r.interval_id)
        for r in interval_overlap_join(pts, iv, broadcast_intervals=False)
        .select("event_id", "interval_id")
        .collect()
    }
    assert got == EXPECTED


def test_bucket_width_invariance(frames):
    # Any bucket width yields the same pairs — the refine owns semantics.
    pts, iv = frames
    for width in (60, 600, 7200):
        got = {
            (r.event_id, r.interval_id)
            for r in interval_overlap_join(pts, iv, bucket_seconds=width)
            .select("event_id", "interval_id")
            .collect()
        }
        assert got == EXPECTED, f"width={width}"


def test_max_buckets_guard(frames):
    pts, iv = frames
    with pytest.raises(Exception, match="max_buckets"):
        interval_overlap_join(pts, iv, bucket_seconds=60, max_buckets=2).collect()


def test_plan_is_equi_join_not_nested_loop(frames):
    pts, iv = frames
    for bcast in (True, False):
        plan = (
            interval_overlap_join(pts, iv, broadcast_intervals=bcast)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        want = "BroadcastHashJoin" if bcast else "Join"
        assert want in plan, plan


def test_fact_side_never_explodes(frames):
    # The explode (the 1-D covering) must sit on the interval side only.
    pts, iv = frames
    plan = (
        interval_overlap_join(pts.withColumnRenamed("event_id", "pid"), iv)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    gen = [ln for ln in plan.splitlines() if "Generate explode" in ln]
    assert len(gen) == 1
    sub = plan[plan.index(gen[0]) :]
    assert "pid" not in sub, "explode sits above the fact scan"
