"""Tests for the trajectory, decontamination, and repetition operators —
scalar recomputation cross-checks plus plan-shape assertions."""

from __future__ import annotations

import datetime

import numpy as np
import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# trajectory_stats
# ---------------------------------------------------------------------------
def _geotag(key: int) -> tuple[float, float]:
    lat = -90.0 + 180.0 * (((key * 2654435761) % 4294967296) / 4294967296.0)
    lng = -180.0 + 360.0 * (((key * 2246822519 + 1013904223) % 4294967296) / 4294967296.0)
    return lat, lng


def _hav(p: tuple[float, float], q: tuple[float, float]) -> float:
    d2r = np.pi / 180.0
    lat1, lat2 = p[0] * d2r, q[0] * d2r
    dlat = np.sin(0.5 * (lat2 - lat1))
    dlng = np.sin(0.5 * (q[1] * d2r - p[1] * d2r))
    x = dlat * dlat + dlng * dlng * np.cos(lat1) * np.cos(lat2)
    return 2.0 * np.arctan2(np.sqrt(x), np.sqrt(max(0.0, 1.0 - x)))


def test_trajectory_matches_scalar_recompute(spark):
    from s2_geometry_library_java_spark.operators.trajectory import (
        long_step_threshold_rad,
        trajectory_stats,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        # user 1: three events, out of insertion order to exercise the sort
        (10, t0 + datetime.timedelta(seconds=30), 1),
        (11, t0 + datetime.timedelta(seconds=10), 1),
        (12, t0 + datetime.timedelta(seconds=20), 1),
        # user 2: a single event -> zero totals
        (20, t0, 2),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    got = {r["user_id"]: r for r in trajectory_stats(df).collect()}

    order = [11, 12, 10]  # by ts
    pts = [_geotag(k) for k in order]
    steps = [_hav(pts[i], pts[i + 1]) for i in range(2)]
    thresh = long_step_threshold_rad()
    u1 = got[1]
    assert u1["n_events"] == 3
    assert u1["total_nrad"] == sum(int(np.round(s * 1e9)) for s in steps)
    assert u1["max_nrad"] == max(int(np.round(s * 1e9)) for s in steps)
    assert u1["n_long_steps"] == sum(1 for s in steps if s > thresh)
    u2 = got[2]
    assert (u2["n_events"], u2["total_nrad"], u2["max_nrad"], u2["n_long_steps"]) == (1, 0, 0, 0)


def test_trajectory_single_shuffle(spark):
    """The lag window and the rollup share the user_id partitioning — the
    executed plan must contain exactly one shuffle exchange."""
    from s2_geometry_library_java_spark.operators.trajectory import trajectory_stats

    df = spark.range(100).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(F.col("id") * 10).alias("ts"),
        (F.col("id") % 7).alias("user_id"),
    )
    plan = _plan(trajectory_stats(df))
    assert plan.count("Exchange hashpartitioning") == 1, plan


# ---------------------------------------------------------------------------
# ngram_contamination
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def contamination_frames(spark):
    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),  # shares 'alpha beta gamma'
            (2, "one two three four"),  # clean
            (3, "x alpha beta gamma y zeta eta theta"),  # shares, longer
        ],
        "doc_id long, text string",
    )
    evalset = spark.createDataFrame(
        [(100, "alpha beta gamma"), (101, "zeta eta theta iota")],
        "doc_id long, text string",
    )
    return train, evalset


def test_contamination_counts(spark, contamination_frames):
    from s2_geometry_library_java_spark.operators.decontam import ngram_contamination

    train, evalset = contamination_frames
    got = {r["doc_id"]: r for r in ngram_contamination(train, evalset).collect()}
    assert set(got) == {1, 3}  # doc 2 is clean and absent
    # doc 1: trigrams {abc, bcd, cde}; only 'alpha beta gamma' hits, 1 eval doc
    assert (got[1]["n_hit_grams"], got[1]["n_grams"], got[1]["n_eval_docs"]) == (1, 3, 1)
    assert got[1]["contamination"] == pytest.approx(1 / 3, abs=1e-9)
    # doc 3: 6 trigrams; hits 'alpha beta gamma' and 'zeta eta theta' -> 2 eval docs
    assert (got[3]["n_hit_grams"], got[3]["n_grams"], got[3]["n_eval_docs"]) == (2, 6, 2)


def test_contamination_broadcast_and_fallback_agree(spark, contamination_frames):
    from s2_geometry_library_java_spark.operators.decontam import ngram_contamination

    train, evalset = contamination_frames
    bc = ngram_contamination(train, evalset, broadcast_eval=True)
    sh = ngram_contamination(train, evalset, broadcast_eval=False)
    assert "BroadcastHashJoin" in _plan(bc)
    assert sorted(map(tuple, bc.collect())) == sorted(map(tuple, sh.collect()))


# ---------------------------------------------------------------------------
# text_repetition
# ---------------------------------------------------------------------------
def test_repetition_metrics_exact(spark):
    from s2_geometry_library_java_spark.operators.text import text_repetition

    df = spark.createDataFrame(
        [
            (1, "a a a b"),  # 4 words, 2 distinct, top 'a'x3; 2-grams: aa,aa,ab -> 1 dup
            (2, "w x y z"),  # no repetition
            (3, "solo"),  # single word: bigram list degenerates to the word itself
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in text_repetition(df).collect()}
    r1 = got[1]
    assert r1["n_words"] == 4
    assert r1["frac_dup_words"] == pytest.approx(0.5, abs=1e-9)
    assert r1["frac_top_word"] == pytest.approx(0.75, abs=1e-9)
    assert r1["frac_dup_2grams"] == pytest.approx(1 / 3, abs=1e-9)
    r2 = got[2]
    assert (r2["frac_dup_words"], r2["frac_top_word"], r2["frac_dup_2grams"]) == (0.0, 0.25, 0.0)
    r3 = got[3]
    assert (r3["n_words"], r3["frac_dup_words"], r3["frac_dup_2grams"]) == (1, 0.0, 0.0)


def test_repetition_dialects_agree(spark):
    """Spark and DuckDB expression twins produce identical values on the
    sf0.001 documents fixture."""
    import duckdb

    from s2_geometry_library_java_spark.operators.text import repetition_exprs

    pdf_spark = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .selectExpr(
            "doc_id", *(f"round({e}, 9) AS {n}" if n.startswith("frac_") else f"{e} AS {n}" for n, e in repetition_exprs("spark").items())
        )
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    cols = ", ".join(
        f"round({e}, 9) AS {n}" if n.startswith("frac_") else f"{e} AS {n}"
        for n, e in repetition_exprs("duck").items()
    )
    pdf_duck = con.sql(
        f"SELECT doc_id, {cols} FROM '/root/testdata/sf0.001/documents.parquet' ORDER BY doc_id"
    ).df()
    for c in pdf_spark.columns:
        assert np.array_equal(pdf_spark[c].to_numpy(), pdf_duck[c].to_numpy()), c
