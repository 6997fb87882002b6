"""Physical-plan shape assertions: the scale story must be visible in
explain() — column-pruned scans, a single broadcast hash join with the
native refinement folded in, exactly one Arrow hop for the encode, and the
salted variant shuffling instead of broadcasting."""

import re

import pytest
from pyspark.sql import functions as F

from s2_geometry_library_java_spark.operators.pip_join import pip_join, with_cell_id
from s2_geometry_library_java_spark.sources.tables import geotagged_points


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def analyzed(df) -> str:
    return df._jdf.queryExecution().toString()


@pytest.fixture(scope="module")
def points(spark, sf_dir):
    return geotagged_points(spark, sf_dir)


def test_scan_prunes_to_key_column(points):
    # geotag derivation needs only o_orderkey; the parquet scan must not
    # read anything else (O18 pushdown/pruning).
    plan = plan_of(with_cell_id(points))
    m = re.search(r"ReadSchema: ([^\n]*)", plan)
    assert m and "o_orderkey" in m.group(1)
    assert "o_totalprice" not in m.group(1) and "o_orderdate" not in m.group(1)


def test_encode_is_single_arrow_hop(points):
    plan = plan_of(with_cell_id(points))
    assert plan.count("ArrowEvalPython") == 1
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python anywhere


def test_native_join_is_broadcast_with_folded_refinement(spark, points):
    from __spark_entry__ import NATIVE_LAYERS

    plan = plan_of(pip_join(points, NATIVE_LAYERS, strategy="ancestor"))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "ArrowEvalPython" in plan  # the encode hop only
    # rect/cap refinement runs inside the join condition (no extra stage)
    assert "BroadcastNestedLoopJoin" not in plan


def test_auto_strategy_small_covering_takes_range(spark, points):
    # I2 cost model wired in: a small covering (RECT_LAYERS -> 17 cells)
    # goes through the broadcast range join (BNLJ on the BETWEEN predicate).
    from __spark_entry__ import RECT_LAYERS

    plan = plan_of(pip_join(points, RECT_LAYERS))
    assert "BroadcastNestedLoopJoin" in plan
    assert "BroadcastHashJoin" not in plan
    # the encode UDF must appear ONCE: without the non-null coalesce in
    # with_cell_id, Catalyst's inferred IsNotNull(cell_id) constraint pushed
    # a filter that re-ran the encode over the whole fact side
    assert plan.count("ArrowEvalPython") == 1


def test_auto_strategy_large_covering_takes_stab(spark, points):
    # ...and a covering past the breakeven (ALL_LAYERS -> 56 cells, no row
    # hint -> assume web-scale rows) crosses into the interval-stab lookup:
    # a broadcast equi-join on the segment id with NO ancestor explode (no
    # Generate node) — the fact side is never row-amplified.
    from __spark_entry__ import ALL_LAYERS

    plan = plan_of(pip_join(points, ALL_LAYERS))
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Generate" not in plan  # no explode anywhere in the stab plan


def test_auto_strategy_row_hint(spark, points):
    # I2 cost model, fact-side term (the predictAdditionalCalls analog,
    # S2EdgeIndex.java:204-211): with a KNOWN fact-row count the model keys
    # on total BNLJ work (rows x cells vs RANGE_WORK_BUDGET) — small fact
    # sides stay on the bounded-work BNLJ instead of paying the stab hop's
    # fixed costs; web-scale fact sides take the stab lookup.
    from __spark_entry__ import ALL_LAYERS
    from s2_geometry_library_java_spark.operators.covering import covering_rows
    from s2_geometry_library_java_spark.operators.pip_join import choose_strategy

    cov56 = covering_rows(ALL_LAYERS, max_cells=8, min_level=0, max_level=12, level_mod=1)
    assert choose_strategy(cov56, [], n_rows=8_000_000) == "range"
    assert choose_strategy(cov56, [], n_rows=128_000_000) == "stab"
    assert choose_strategy(cov56, [], n_rows=None) == "stab"
    big = covering_rows(ALL_LAYERS, max_cells=256, min_level=0, max_level=14, level_mod=1)
    assert len(big) > 1000
    assert choose_strategy(big, [], n_rows=10_000) == "range"
    assert choose_strategy(big, [], n_rows=1_000_000_000) == "stab"
    plan = plan_of(pip_join(points, ALL_LAYERS, n_rows=8_000_000))
    assert "BroadcastNestedLoopJoin" in plan
    plan_big = plan_of(pip_join(points, ALL_LAYERS, n_rows=200_000_000))
    assert "BroadcastNestedLoopJoin" not in plan_big
    assert "BroadcastHashJoin" in plan_big


def test_radius_join_fact_side_stays_narrow(spark, points):
    # The radius join buckets the fact side with native parent() bit math —
    # no explode (Generate) on the fact lineage, one broadcast hash join on
    # the bucket, and the only Generate in the whole plan is the <=4
    # vertex-neighbor explode on the tiny query side.
    from s2_geometry_library_java_spark.operators.knn import radius_join

    plan = plan_of(radius_join(points, [("q0", 10.0, 10.0), ("q1", -40.0, 100.0)], 0.1))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Generate") == 1  # query-side neighbor explode only
    assert plan.count("Scan parquet") == 1  # single pass over the fact table
    assert "BatchEvalPython" not in plan


def test_radius_join_large_query_set_shuffles(spark, points):
    # broadcast_queries=False: the 100M-query shape — both sides shuffle on
    # the bucket into SMJ/SHJ instead of broadcasting the probe.
    from s2_geometry_library_java_spark.operators.knn import radius_join

    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        plan = plan_of(
            radius_join(points, [("q0", 10.0, 10.0)], 0.1, broadcast_queries=False)
        )
        assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan)
        assert "BroadcastNestedLoopJoin" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_salted_join_shuffles(spark, points):
    from __spark_entry__ import NATIVE_LAYERS

    # At sf-test sizes AQE rightly broadcast-converts anything; pin the
    # thresholds down to see the shape this plan takes at 100 TB.
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        plan = plan_of(pip_join(points, NATIVE_LAYERS, broadcast_cells=False, salt=4))
        assert "BroadcastHashJoin" not in plan
        assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan)
        # the salt is PACKED into a single BIGINT join key (_pkey/_ckey), so
        # the probe-side sort stays radix-eligible (r4: compound keys
        # measured 2-3x slower); exactly one join key column per side
        assert "_pkey" in plan and "_ckey" in plan
        assert "_psalt" not in plan  # no compound-key fallback at level<=12
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_poly_refinement_single_pass(spark, points):
    from __spark_entry__ import ALL_LAYERS

    # default (auto -> stab at 56 cells, no row hint) FUSES encode+stab into
    # one struct hop on un-encoded input: exactly two python ops total (the
    # fused hop + the parity refinement) — proof the refine is single-pass
    # (no union of per-kind branches)
    plan = plan_of(pip_join(points, ALL_LAYERS))
    assert plan.count("ArrowEvalPython") == 2
    assert plan.count("Scan parquet") == 1
    # the small-fact range path (BNLJ) adds zero Python: encode + parity only
    plan_rng = plan_of(pip_join(points, ALL_LAYERS, strategy="range"))
    assert plan_rng.count("ArrowEvalPython") == 2
    assert plan_rng.count("Scan parquet") == 1
    # pre-encoded input pays the extra (8B in / 4B out) seg hop instead
    plan_pre = plan_of(pip_join(with_cell_id(points), ALL_LAYERS, strategy="stab"))
    assert plan_pre.count("ArrowEvalPython") == 3
    plan_anc = plan_of(pip_join(points, ALL_LAYERS, strategy="ancestor"))
    # the ancestor strategy keeps the original two-hop shape
    assert plan_anc.count("ArrowEvalPython") == 2
    assert plan_anc.count("Scan parquet") == 1


def test_cc_star_phases_are_min_aggs_not_adjacency_arrays(spark):
    # Connected components must never materialize a star root's adjacency in
    # one task: each phase is a partial-aggregatable min (HashAggregate, no
    # collect_set ObjectHashAggregate) joined back to the edge list, all
    # JVM-native (no Python hop) and never a cartesian product.
    from s2_geometry_library_java_spark.operators.dedup import (
        _cc_large_star,
        _cc_small_star,
    )

    e = spark.createDataFrame([(3, 1), (5, 2), (5, 1)], "u long, v long")
    for phase in (_cc_large_star, _cc_small_star):
        plan = plan_of(phase(e))
        assert "collect_set" not in plan
        assert "ObjectHashAggregate" not in plan
        assert "HashAggregate" in plan  # partial + final min agg
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "CartesianProduct" not in plan
