"""The spark.sql() function surface: s2_* callable by name, SQL scalar
functions inlining into codegen (no Python), pandas-UDF kernels reachable
from raw SQL, outputs bit-identical to the NumPy kernel."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from s2_geometry_library_java_spark.functions.sql_api import register_sql_functions
from s2_geometry_library_java_spark.kernel import cellid as ck


@pytest.fixture(scope="module")
def sql_spark(spark):
    register_sql_functions(spark)
    return spark


@pytest.fixture(scope="module")
def cells(sql_spark):
    # valid ids at levels 0..30 across all 6 faces
    rng = np.random.default_rng(123456)
    lat = rng.uniform(-89, 89, 400)
    lng = rng.uniform(-179, 179, 400)
    leaf = ck.from_latlng_degrees(lat, lng)
    lvl = rng.integers(0, 31, 400)
    ids = ck.parent(leaf, lvl)  # vectorized parent at per-row levels
    df = sql_spark.createDataFrame(
        [(int(i), int(v), int(l)) for i, (v, l) in enumerate(zip(ids.view(np.int64), lvl))],
        "rid long, cell bigint, lvl_in int",
    )
    df.createOrReplaceTempView("sql_api_cells")
    return ids, lvl, df


def test_sql_scalars_match_kernel(sql_spark, cells):
    ids, lvl, _ = cells
    rows = sql_spark.sql(
        """
        SELECT rid, s2_level(cell) lvl, s2_face(cell) face,
               s2_range_min(cell) rmin, s2_range_max(cell) rmax,
               s2_is_leaf(cell) leaf,
               s2_parent(cell, CAST(greatest(0, lvl_in - 1) AS INT)) up1,
               s2_cell_contains(s2_parent(cell, CAST(greatest(0, lvl_in - 1) AS INT)), cell) inp
        FROM sql_api_cells ORDER BY rid
        """
    ).collect()
    up_lvl = np.maximum(0, lvl - 1)
    expect_parent = ck.parent(ids, up_lvl)
    for i, r in enumerate(rows):
        assert r["lvl"] == int(ck.level(ids[i : i + 1])[0])
        assert r["face"] == int(ck.face(ids[i : i + 1])[0])
        assert np.int64(r["rmin"]).view(np.uint64) == ck.range_min(ids[i : i + 1])[0]
        assert np.int64(r["rmax"]).view(np.uint64) == ck.range_max(ids[i : i + 1])[0]
        assert r["leaf"] == bool(lvl[i] == 30)
        assert np.int64(r["up1"]).view(np.uint64) == expect_parent[i]
        assert r["inp"] is True


def test_sql_scalar_only_query_is_pure_codegen(sql_spark, cells):
    df = sql_spark.sql(
        "SELECT s2_parent(cell, 4) p, s2_level(cell) l, s2_biased(cell) b FROM sql_api_cells"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # the *(n) prefix is executedPlan.toString's WholeStageCodegen marker
    assert "*(1) Project" in plan


def test_sql_encode_decode_roundtrip(sql_spark):
    # kernel UDFs by name from raw SQL: encode -> token -> from_token, and
    # decode of the cell center stays inside the leaf cell
    rows = sql_spark.sql(
        """
        SELECT s2_cell_from_latlng(lat, lng) cell,
               s2_from_token(s2_token(s2_cell_from_latlng(lat, lng))) rt,
               s2_cell_lat(s2_cell_from_latlng(lat, lng)) dlat,
               lat
        FROM VALUES (10.5D, 20.25D), (-45.0D, 170.0D), (88.0D, -3.0D) AS t(lat, lng)
        """
    ).collect()
    for r in rows:
        assert r["rt"] == r["cell"]
        assert abs(r["dlat"] - r["lat"]) < 1e-6  # leaf cell ~ cm-scale


def test_sql_unsigned_order_matches_kernel(sql_spark, cells):
    ids, _, _ = cells
    # SQL UDFs can't sit directly in Sort (UNSUPPORTED_SQL_UDF_USAGE in
    # Spark 4.1); project the order key first — same plan after inlining
    got = [
        r["rid"]
        for r in sql_spark.sql(
            "SELECT rid FROM (SELECT rid, s2_biased(cell) bk FROM sql_api_cells) ORDER BY bk, rid"
        ).collect()
    ]
    expect = list(np.lexsort((np.arange(len(ids)), ids)))
    assert got == [int(x) for x in expect]


def test_sql_intersects_semantics(sql_spark):
    # sibling cells do not intersect; parent intersects child either way
    row = sql_spark.sql(
        """
        SELECT s2_cell_intersects(s2_parent(c, 3), c) pi,
               s2_cell_intersects(c, s2_parent(c, 3)) ip,
               s2_cell_intersects(c, d) sib
        FROM (SELECT s2_cell_from_latlng(10.0D, 10.0D) c,
                     s2_cell_from_latlng(-60.0D, 120.0D) d)
        """
    ).collect()[0]
    assert row["pi"] and row["ip"] and not row["sib"]


def test_package_level_reexport(sql_spark):
    import s2_geometry_library_java_spark as s2

    s2.register_sql_functions(sql_spark)
    assert sql_spark.sql("SELECT s2_face(s2_cell_from_latlng(0.0D, -179.0D))").collect()[0][0] in range(6)


def test_register_is_idempotent(sql_spark):
    register_sql_functions(sql_spark)
    assert sql_spark.sql("SELECT s2_level(s2_parent(s2_cell_from_latlng(1.0D, 1.0D), 9))").collect()[0][0] == 9


def test_radius_level_matches_kernel_at_boundaries(sql_spark):
    """s2_radius_level must equal MIN_WIDTH.get_max_level(2r) capped at 29
    EVERYWHERE, including radii where deriv/r sits within an ulp of a power
    of two (libm LOG2 can round across the integer boundary there; the SQL
    body corrects the guess with exact power-of-two compares)."""
    from s2_geometry_library_java_spark.kernel import metrics

    deriv = metrics.MIN_WIDTH.deriv
    rng = np.random.default_rng(7)
    radii = list(rng.uniform(1e-9, 0.5, 200))
    # exact and ulp-adjacent power-of-two quotients for every level
    for n in range(0, 30):
        base = deriv / (2.0**n)
        radii += [base, np.nextafter(base, 0.0), np.nextafter(base, 1.0)]
    df = sql_spark.createDataFrame([(float(r),) for r in radii], "r double")
    df.createOrReplaceTempView("radius_probe")
    got = {
        r["r"]: r["lvl"]
        for r in sql_spark.sql(
            "SELECT r, s2_radius_level(r) lvl FROM radius_probe"
        ).collect()
    }
    for r in radii:
        want = min(metrics.MIN_WIDTH.get_max_level(2.0 * float(r)), 29)
        assert got[float(r)] == want, (r, got[float(r)], want)


def test_geotag_full_64bit_key_domain(sql_spark):
    """The wrap-free split form: huge and negative keys give in-range
    coordinates (the old bare multiply wrapped past |key| ~ 3.47e9), and
    in-domain keys are bit-identical to the original formula."""
    rows = sql_spark.sql(
        "SELECT k, s2_geotag_lat(k) AS la, s2_geotag_lng(k) AS ln FROM VALUES "
        "(0L), (12345L), (3000000000L), (9223372036854775807L), "
        "(-9223372036854775808L), (-5L) AS t(k)"
    ).collect()
    for r in rows:
        assert -90.0 <= r.la < 90.0 and -180.0 <= r.ln < 180.0, r
        k32 = r.k % 2**32  # python ints: exact reference recompute
        assert r.la == -90.0 + 180.0 * (((k32 * 2654435761) % 2**32) / 2**32)
        assert r.ln == -180.0 + 360.0 * (((k32 * 2246822519 + 1013904223) % 2**32) / 2**32)
