"""Geo near-duplicate pairs: spatially-blocked perceptual dedup.

Training corpora of geotagged images accumulate bursts of near-identical
shots at the same place (retries, livestream frames, re-uploads).  The
pair definition here is BOTH-axes near-dup: haversine distance <= radius
(P19, `S2LatLng.java:180-205`) AND phash Hamming distance <= a bit
budget.  This composes the engine's two grafted modalities — the S2
bucket machinery provides the spatial blocking, the perceptual hash the
content test.

Scale shape (the 100-TB plan):
- Blocking level L = deepest level whose MIN WIDTH >= radius
  (`S2Projections.java` metrics), so two points within the radius land
  in the same level-L cell or K21-adjacent cells (`S2CellId.java:640-682`)
  — the same one-ring completeness proof as the snap join.
- LEFT side keys by its own bucket (native parent() bit op, no explode);
  RIGHT side explodes to bucket + 8 neighbors (9x on the smaller
  candidate stream only).  The equi-join is a plain shuffled hash join
  on the bucket, so co-located pairs meet without any all-pairs scan.
- A pair can meet through up to 2 shared buckets -> one distinct on the
  canonical (id_lo, id_hi) pair.
- The refine (haversine + bit_count(xor)) is 100% native codegen —
  no Python anywhere.

Pair explosion is bounded by density: a bucket holding k co-located
points emits k^2/2 candidates; radius chooses L, so cap density by
deduping exact-location first (dedup_exact) or lowering the radius —
the n-gram max_df lesson (`operators/dedup.py`), stated here so the
operator's contract is explicit rather than silently quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from s2_geometry_library_java_spark.functions.native import (
    haversine_expr,
    parent_expr,
)
from s2_geometry_library_java_spark.functions.udfs import s2_all_neighbors_udf
from s2_geometry_library_java_spark.kernel import metrics


def geo_block_level(radius_rad: float) -> int:
    """Deepest level whose MIN_WIDTH still covers the radius."""
    return metrics.MIN_WIDTH.get_max_level(radius_rad)


def geo_neardup_pairs(
    points: DataFrame,
    radius_rad: float,
    max_hamming: int,
    id_col: str = "point_id",
    cell_col: str = "cell_id",
    lat_col: str = "lat",
    lng_col: str = "lng",
    hash_col: str = "phash",
) -> DataFrame:
    """(id_lo, id_hi, dist_nrad, hamming) for every pair within
    ``radius_rad`` on the sphere AND ``max_hamming`` phash bits.
    Distance reported in fixed-point nano-radians."""
    level = geo_block_level(radius_rad)
    bkt = parent_expr(F.col(cell_col), level)
    left = points.select(
        F.col(id_col).alias("id_l"),
        F.col(lat_col).alias("lat_l"),
        F.col(lng_col).alias("lng_l"),
        F.col(hash_col).alias("h_l"),
        bkt.alias("bucket"),
    )
    right = points.select(
        F.col(id_col).alias("id_r"),
        F.col(lat_col).alias("lat_r"),
        F.col(lng_col).alias("lng_r"),
        F.col(hash_col).alias("h_r"),
        F.explode(
            F.array_distinct(
                F.concat(
                    F.array(bkt),
                    s2_all_neighbors_udf(bkt, F.lit(level)),
                )
            )
        ).alias("bucket"),
    )
    dist = haversine_expr(
        F.col("lat_l"), F.col("lng_l"), F.col("lat_r"), F.col("lng_r")
    )
    ham = F.bit_count(F.col("h_l").bitwiseXOR(F.col("h_r")))
    # the radius test compares the RAW double (the completeness proof is in
    # true distance; rounding first would admit pairs epsilon past the
    # blocking guarantee); nano-radian fixed point is output-only
    return (
        left.join(right, "bucket")
        .filter(F.col("id_l") < F.col("id_r"))
        .filter((dist <= F.lit(radius_rad)) & (ham <= max_hamming))
        .select(
            F.col("id_l").alias("id_lo"),
            F.col("id_r").alias("id_hi"),
            F.round(dist * F.lit(1e9)).cast("bigint").alias("dist_nrad"),
            ham.cast("int").alias("hamming"),
        )
        .dropDuplicates(["id_lo", "id_hi"])
    )
