"""Per-trajectory polyline simplification (spherical Douglas-Peucker).

Compress each entity's ordered GPS trace to the minimal vertex subset
whose great-circle deviation from the original stays within ``tol``:
keep both endpoints, find the interior point farthest from the
connecting edge (the P9 point-to-edge kernel, `S2EdgeUtil.java:750-787`,
the same distance `S2Polyline.getNearestEdge` ranks by,
`S2Polyline.java:213-239`), split there if it exceeds ``tol``, recurse.
The standard pre-storage compaction for trajectory corpora — typical
GPS traces shrink 10-50x at road-scale tolerances.

Scale shape (the 100-TB plan):
- ONE shuffle: groupBy(entity) -> applyInPandas.  Per-entity work is
  the classic DP bound (O(n log n) typical, O(n^2) adversarial) on that
  entity's own rows only; hot entities are bounded by per-entity
  retention and sessionized upstream when they are not.
- Inside each split the farthest-point scan is one vectorized kernel
  call over the span (no per-point Python).
- Determinism: the split point is the FIRST argmax (lowest index on
  ties), so output is partitioning-independent; distances compare in
  exact doubles, output carries fixed-point nano-radian deviation.

GEOTAG KEY DOMAIN: ``key_col`` feeds the synthetic geotag hash, so
|key| must stay below ~3.47e9 (see s2_geotag_lat); real deployments
replace the geotag expressions with their lat/lng columns.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from s2_geometry_library_java_spark.functions.native import (
    geotag_lat_expr,
    geotag_lng_expr,
)
from s2_geometry_library_java_spark.kernel import cellid as ck
from s2_geometry_library_java_spark.kernel import predicates as pr


def dp_keep_mask(xyz: np.ndarray, tol_rad: float) -> np.ndarray:
    """Douglas-Peucker keep mask over one ordered point array (n,3).
    Endpoints always kept; interior points kept iff some recursion span
    needs them to stay within ``tol_rad``."""
    n = len(xyz)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[n - 1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        d = pr.edge_distance(xyz[i + 1 : j], xyz[i][None, :], xyz[j][None, :])
        k = int(np.argmax(d))  # first max: deterministic tie-break
        if d[k] > tol_rad:
            k += i + 1
            keep[k] = True
            stack.append((i, k))
            stack.append((k, j))
    return keep


def simplify_trajectories(
    events: DataFrame,
    tol_rad: float,
    user_col: str = "user_id",
    ts_col: str = "ts",
    key_col: str = "event_id",
) -> DataFrame:
    """(user, seq, key, lat, lng) for every KEPT vertex, ``seq`` being the
    vertex's position in the original ordered trace — one row group per
    entity, order within entity reconstructible by seq."""
    pts = events.select(
        F.col(user_col),
        F.col(ts_col),
        F.col(key_col),
        geotag_lat_expr(F.col(key_col)).alias("lat"),
        geotag_lng_expr(F.col(key_col)).alias("lng"),
    )

    def simplify(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, key_col], kind="mergesort").reset_index(drop=True)
        xyz = ck.latlng_degrees_to_xyz(
            pdf["lat"].to_numpy(np.float64), pdf["lng"].to_numpy(np.float64)
        )
        keep = dp_keep_mask(xyz, tol_rad)
        out = pdf.loc[keep, [user_col, key_col, "lat", "lng"]].copy()
        out.insert(1, "seq", np.nonzero(keep)[0].astype(np.int64))
        return out

    schema = f"{user_col} long, seq long, {key_col} long, lat double, lng double"
    return pts.groupBy(user_col).applyInPandas(simplify, schema=schema)
