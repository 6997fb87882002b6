"""Exact kNN via cell-covering candidate rings + window top-k.

Blueprint: the reference's fixed-level cell-hash radius query
(S2PolygonBuilder.PointIndex, S2PolygonBuilder.java:629-689) plus the
cell-union ring-expansion op (S2CellUnion.expand, S2CellUnion.java:359-406).

Algorithm (exact, not approximate):
1. cover a cap of radius r around each query (deterministic coverer) and run
   the ancestor equi-join to collect all points within the cap — a superset
   of all points at distance <= r (cap membership is the exact chord test,
   S2Cap.java:384-388);
2. queries with >= k candidates are resolved: their true k nearest are all
   within r, hence among the candidates.  Unresolved queries grow r by 4x
   (the ring expansion) and repeat — bounded by r reaching pi (full sphere);
3. exact haversine distances (S2LatLng.getDistance, S2LatLng.java:180-205)
   and a window ``row_number() over (partition by query order by dist, id)``
   produce the final top-k, ties broken deterministically by point id.

The per-iteration join is the same scan-shaped covering join as pip_join, so
the whole operator inherits its scale story (broadcast covering, native
refinement, no shuffle of the fact side beyond the final window).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from s2_geometry_library_java_spark.functions.native import haversine_expr
from s2_geometry_library_java_spark.operators.layers import cap_layer
from s2_geometry_library_java_spark.operators.pip_join import pip_join, with_cell_id


def knn_join(
    points: DataFrame,
    queries: list[tuple],
    k: int,
    lat_col: str = "lat",
    lng_col: str = "lng",
    id_col: str = "point_id",
    init_radius_rad: float | None = None,
    max_cells: int = 12,
) -> DataFrame:
    """points x queries -> (query_id, point columns, dist, rank<=k).

    ``queries``: small driver-side list of (query_id, qlat_deg, qlng_deg).
    """
    spark = points.sparkSession
    pts = with_cell_id(points, lat_col, lng_col).cache()
    try:
        n_points = pts.count()
        k_eff = min(k, n_points)
        if init_radius_rad is None:
            # Density-derived first ring: size the cap so a uniform corpus
            # yields ~40k candidates (few queries need a second round); cap
            # height h = 1 - cos(r), expected points = n * h / 2.
            target = min(max(40.0 * k_eff, 100.0), float(n_points))
            init_radius_rad = math.acos(max(-1.0, 1.0 - 2.0 * target / max(n_points, 1)))
        unresolved = {str(q[0]): (float(q[1]), float(q[2])) for q in queries}
        resolved_parts: list[DataFrame] = []
        r = init_radius_rad
        while unresolved:
            caps = [
                cap_layer(qid, qlat, qlng, math.degrees(min(r, math.pi)))
                for qid, (qlat, qlng) in unresolved.items()
            ]
            cand = pip_join(pts, caps, lat_col, lng_col, max_cells=max_cells)
            counts = {row["polygon_id"]: row["cnt"] for row in cand.groupBy("polygon_id").agg(F.count(F.lit(1)).alias("cnt")).collect()}
            done = [qid for qid in unresolved if counts.get(qid, 0) >= k_eff or r >= math.pi]
            if done:
                resolved_parts.append(cand.filter(F.col("polygon_id").isin(done)))
            for qid in done:
                del unresolved[qid]
            r *= 4.0

        all_cand = resolved_parts[0]
        for p in resolved_parts[1:]:
            all_cand = all_cand.unionByName(p)

        qdf = spark.createDataFrame(
            [(str(q[0]), float(q[1]), float(q[2])) for q in queries],
            "query_id string, qlat double, qlng double",
        )
        joined = all_cand.withColumnRenamed("polygon_id", "query_id").join(F.broadcast(qdf), "query_id")
        dist = haversine_expr(F.col("qlat"), F.col("qlng"), F.col(lat_col), F.col(lng_col))
        w = Window.partitionBy("query_id").orderBy(F.col("dist").asc(), F.col(id_col).asc())
        return (
            joined.withColumn("dist", dist)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k_eff)
            .drop("qlat", "qlng")
        )
    finally:
        pts.unpersist()
