"""Caption-extracted region candidates (operators/captions.py): parse,
gazetteer resolution, anchor-containment validation, and plan shape."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from s2_geometry_library_java_spark.operators.captions import (
    CAPTION_VOCAB,
    caption_region_counts,
    caption_region_join,
    extract_mentions,
    gazetteer_df,
)


@pytest.fixture(scope="module")
def layers():
    from __spark_entry__ import ALL_LAYERS

    return ALL_LAYERS


@pytest.fixture(scope="module")
def gazetteer():
    from __spark_entry__ import CAPTION_GAZETTEER

    return CAPTION_GAZETTEER


def test_vocab_matches_image_source():
    from s2_geometry_library_java_spark.sources.images import _WORDS

    assert tuple(_WORDS) == CAPTION_VOCAB


def test_extract_mentions_slots_and_words(spark):
    df = spark.createDataFrame(
        [("a", "caption 0000000042 tile anchor"), ("b", "caption 0000000007 cover cover")],
        "image_id string, caption string",
    )
    rows = {(r.image_id, r.slot): r.word for r in extract_mentions(df).collect()}
    assert rows == {
        ("a", 0): "tile",
        ("a", 1): "anchor",
        ("b", 0): "cover",
        ("b", 1): "cover",
    }


def test_join_validates_against_region_objects(spark, layers, gazetteer):
    # points chosen to land inside/outside specific layers, including the
    # kernel-refined loop (l_tri <- 'cover') and polygon-with-hole
    # (p_hole <- 'join'): (15,15) is inside l_tri's interior AND inside
    # p_hole's hole triangle (so p_hole must say False there).
    df = spark.createDataFrame(
        [
            ("in_tri", "caption 0000000001 cover join", 15.0, 15.0),
            ("in_eu", "caption 0000000002 tile index", 50.0, 10.0),
            ("out_all", "caption 0000000003 tile cover", -80.0, 100.0),
            ("noise", "caption 0000000004 index anchor", 0.0, 0.0),
        ],
        "image_id string, caption string, lat double, lng double",
    )
    out = caption_region_join(df, layers, gazetteer)
    got = {(r.image_id, r.polygon_id): r.inside for r in out.collect()}
    # unmapped words (index, anchor) dropped entirely
    assert "noise" not in {k[0] for k in got}
    assert got[("in_tri", "l_tri")] is True
    assert got[("in_tri", "p_hole")] is False  # inside the hole
    assert got[("in_eu", "r_eu")] is True
    assert got[("out_all", "r_eu")] is False
    assert got[("out_all", "l_tri")] is False
    # ground truth straight from the region objects for every row
    by_id = {l.polygon_id: l for l in layers}
    for r in out.collect():
        src = {row.image_id: row for row in df.collect()}[r.image_id]
        expect = bool(
            by_id[r.polygon_id].contains_points(
                np.array([src.lat]), np.array([src.lng])
            )[0]
        )
        assert r.inside == expect, (r.image_id, r.polygon_id)


def test_unknown_gazetteer_layer_raises(spark, layers):
    df = spark.createDataFrame(
        [("a", "caption 0000000001 tile tile", 0.0, 0.0)],
        "image_id string, caption string, lat double, lng double",
    )
    with pytest.raises(ValueError, match="nowhere"):
        caption_region_join(df, layers, {"tile": "nowhere"})


def test_counts_rollup(spark, layers, gazetteer):
    df = spark.createDataFrame(
        [
            ("a", "caption 0000000001 tile tile", 50.0, 10.0),
            ("b", "caption 0000000002 tile face", 50.0, 10.0),
        ],
        "image_id string, caption string, lat double, lng double",
    )
    m = caption_region_join(df, layers, gazetteer)
    rows = {(r.polygon_id, r.slot): (r.n_mentions, r.n_inside) for r in caption_region_counts(m).collect()}
    assert rows[("r_eu", 0)] == (2, 2)
    assert rows[("r_eu", 1)] == (1, 1)
    assert rows[("c_tokyo", 1)] == (1, 0)


def test_row_level_plan_is_shuffle_free_broadcast(spark, layers, gazetteer):
    # fact side: a real distributed frame; the gazetteer join must broadcast
    # and the row-level output must need no Exchange at all.
    n = 10_000
    vocab = F.array(*[F.lit(w) for w in CAPTION_VOCAB])
    pid = F.col("id")
    df = spark.range(n).select(
        pid.cast("string").alias("image_id"),
        F.concat_ws(
            " ",
            F.lit("caption"),
            F.lpad(pid.cast("string"), 10, "0"),
            F.element_at(vocab, (F.pmod(pid, F.lit(10)) + F.lit(1)).cast("int")),
            F.element_at(vocab, (F.pmod(F.floor(pid / 10), F.lit(10)) + F.lit(1)).cast("int")),
        ).alias("caption"),
        (F.lit(-90.0) + F.lit(180.0) * F.pmod(pid * 37, F.lit(1000)) / 1000.0).alias("lat"),
        (F.lit(-180.0) + F.lit(360.0) * F.pmod(pid * 73, F.lit(1000)) / 1000.0).alias("lng"),
    )
    out = caption_region_join(df, layers, gazetteer)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # tiny gazetteer inlines as a literal map: NO join in the plan at all
    assert "Join" not in plan
    assert "Exchange hashpartitioning" not in plan  # zero fact shuffle
    assert "BatchEvalPython" not in plan  # parity kernel is Arrow-batched
    # mention fan-out is exactly 2x mapped fraction: 8/10 words mapped
    assert out.count() == n * 2 * 8 // 10

    # a big gazetteer (beyond the inline bound) takes the broadcast join
    big = dict(gazetteer)
    big.update({f"w{i:03d}": "r_eu" for i in range(100)})
    out_big = caption_region_join(df, layers, big)
    plan_big = out_big._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_big
    assert "SortMergeJoin" not in plan_big
    assert "Exchange hashpartitioning" not in plan_big
    assert out_big.count() == out.count()  # the filler words never occur
