"""Distributed polygon boolean ops and relation predicates.

Gate plumbing for B5/B6 (S2Polygon.initToIntersection/initToUnion/
destructiveUnion, S2Polygon.java:684-791) and the polygon relation
predicates (contains/intersects, S2Polygon.java:352-394): polygons arrive
as DSL strings in a DataFrame, each Arrow batch assembles them with the
driver-side geometry kernels and emits boundary-vertex / relation rows.
The same row builders run flat on the driver to pin the golden VALUES
oracle, so the gate checks the full distributed plumbing (createDataFrame,
mapInPandas batching, schema) against a single-process evaluation.

At engine scale this is the layer-preparation path: boolean ops run once
per polygon-layer pair (thousands of rows, not the fact table), so a
mapInPandas over a small DataFrame is exactly the production plan shape —
embarrassingly parallel over cases, never joined to fact data.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

BOOLOP_COLUMNS = ["case_id", "op", "loop_idx", "depth", "seq", "vlat", "vlng"]
BOOLOP_SCHEMA = (
    "case_id string, op string, loop_idx int, depth int, seq int, vlat double, vlng double"
)
RELATION_COLUMNS = ["pair_id", "a_contains_b", "b_contains_a", "intersects"]
RELATION_SCHEMA = (
    "pair_id string, a_contains_b boolean, b_contains_a boolean, intersects boolean"
)


def _vertex_latlng_degrees(v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    # S2LatLng(point): lat = atan2(z, hypot(x, y)) — exact on unit vectors
    lat = np.degrees(np.arctan2(v[:, 2], np.hypot(v[:, 0], v[:, 1])))
    lng = np.degrees(np.arctan2(v[:, 1], v[:, 0]))
    return lat, lng


def boolop_rows_pandas(pdf: pd.DataFrame) -> pd.DataFrame:
    """(case_id, op, dsl_a, dsl_b) rows -> boundary vertices of the result
    polygon, one row per (loop, vertex).  Deterministic: the builder's
    assembly walk is single-threaded with total-ordered tie-breaks."""
    from s2_geometry_library_java_spark.geometry import ops
    from s2_geometry_library_java_spark.geometry.text_format import make_polygon

    rows: list[tuple] = []
    for r in pdf.itertuples(index=False):
        a, b = make_polygon(r.dsl_a), make_polygon(r.dsl_b)
        if r.op == "intersection":
            res = ops.intersection(a, b)
        elif r.op == "union":
            res = ops.union(a, b)
        elif r.op == "destructive_union":
            res = ops.destructive_union([a, b])
        else:
            raise ValueError(f"unknown boolop {r.op!r}")
        for li in range(res.num_loops()):
            loop = res.loop(li)
            lat, lng = _vertex_latlng_degrees(loop.vertices)
            rows.extend(
                (r.case_id, r.op, li, int(loop.depth), s, float(lat[s]), float(lng[s]))
                for s in range(loop.n)
            )
    return pd.DataFrame(rows, columns=BOOLOP_COLUMNS)


def polygon_boolops(cases: DataFrame) -> DataFrame:
    def it(batches):
        for pdf in batches:
            if len(pdf):
                yield boolop_rows_pandas(pdf)

    return cases.mapInPandas(it, BOOLOP_SCHEMA)


def relation_rows_pandas(pdf: pd.DataFrame) -> pd.DataFrame:
    """(pair_id, dsl_a, dsl_b) rows -> the full relation triple
    (S2PolygonTest.java:139-184 matrix semantics)."""
    from s2_geometry_library_java_spark.geometry.text_format import make_polygon

    rows: list[tuple] = []
    for r in pdf.itertuples(index=False):
        a, b = make_polygon(r.dsl_a), make_polygon(r.dsl_b)
        rows.append(
            (
                r.pair_id,
                bool(a.contains_polygon(b)),
                bool(b.contains_polygon(a)),
                bool(a.intersects_polygon(b)),
            )
        )
    return pd.DataFrame(rows, columns=RELATION_COLUMNS)


def polygon_relations(pairs: DataFrame) -> DataFrame:
    def it(batches):
        for pdf in batches:
            if len(pdf):
                yield relation_rows_pandas(pdf)

    return pairs.mapInPandas(it, RELATION_SCHEMA)
