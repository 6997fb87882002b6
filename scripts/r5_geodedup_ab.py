#!/usr/bin/env python
"""Round-5 A/B for geo_neardup hot-bucket salting (task 4): a 128M-row
hot-city corpus — uniform background plus HOT_ROWS rows jittered inside one
level-L bucket (the stadium/landmark burst shape) — timed through
geo_neardup_pairs unsalted vs salted, and unsalted with AQE's skew-join
split disabled to isolate what AQE already absorbs.

The pair output is identical across legs by construction (pytest pins it at
small scale); this campaign measures WALL CLOCK only.  The hot bucket emits
HOT_ROWS^2 candidate pairs: unsalted they generate in ONE reducer task;
salt=s spreads them over s tasks at the cost of an s-fold right-side
shuffle.  Fresh JVM per leg (subprocess self-invocation), best-of-N.

Usage:  python scripts/r5_geodedup_ab.py            # full campaign
        AB_N_ROWS=32000000 python scripts/...       # smaller corpus
Appends one JSON line per leg to stdout -> BENCH/r5_geodedup_ab.jsonl.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

RADIUS = 0.0005  # ~3 km -> blocking level 11 (uniform background stays sparse)
MAX_HAM = 4
HOT_LAT, HOT_LNG = 48.0, 10.0  # hot box center (inside r_eu, same as bench skew)


def corpus_dir(n_rows: int, hot_rows: int) -> str:
    return f"/tmp/s2bench_geodedup_{n_rows}_{hot_rows}"


def generate(n_rows: int, hot_rows: int) -> None:
    """Deterministic corpus: uniform geotags from the id hash; the first
    hot_rows ids collapse into a ~0.002-degree box inside ONE level-11
    bucket (jitter keeps leaf cells distinct so the packed-bit salt can
    split them).  cell_id materialized so legs time the join, not encode."""
    out = corpus_dir(n_rows, hot_rows)
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return
    from pyspark.sql import functions as F

    from s2_geometry_library_java_spark.functions.native import geotag_lat_expr, geotag_lng_expr
    from s2_geometry_library_java_spark.functions.udfs import s2_cell_id
    from s2_geometry_library_java_spark.session import get_spark

    spark = get_spark("geodedup-gen", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.range(0, n_rows, 1, 128).select(F.col("id").alias("point_id"))
    jit1 = F.pmod(F.xxhash64("point_id"), F.lit(100000)) / F.lit(100000.0)
    jit2 = F.pmod(F.xxhash64("point_id", F.lit(1)), F.lit(100000)) / F.lit(100000.0)
    hot = F.col("point_id") < F.lit(hot_rows)
    lat = F.when(hot, F.lit(HOT_LAT) + jit1 * F.lit(0.002)).otherwise(geotag_lat_expr(F.col("point_id")))
    lng = F.when(hot, F.lit(HOT_LNG) + jit2 * F.lit(0.002)).otherwise(geotag_lng_expr(F.col("point_id")))
    df = (
        df.withColumn("lat", lat)
        .withColumn("lng", lng)
        .withColumn("cell_id", F.coalesce(s2_cell_id(F.col("lat"), F.col("lng")), F.lit(0)))
        .withColumn("phash", F.pmod(F.xxhash64("point_id", F.lit(2)), F.lit(65536)))
    )
    df.write.mode("overwrite").parquet(out)
    spark.stop()


def run_leg(
    n_rows: int, hot_rows: int, salt: int, skew_join: bool, reps: int, threshold: int = 0
) -> None:
    from pyspark.sql import functions as F  # noqa: F401

    from s2_geometry_library_java_spark.operators.geodedup import geo_neardup_pairs
    from s2_geometry_library_java_spark.session import get_spark

    spark = get_spark(
        "geodedup-ab",
        master="local[32]",
        extra_conf={
            "spark.sql.adaptive.skewJoin.enabled": "true" if skew_join else "false",
            # fact-scale shuffle at 128M: keep partitions wide enough that a
            # NON-hot partition fits, so only the hot key is the variable
            "spark.sql.shuffle.partitions": "64",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(corpus_dir(n_rows, hot_rows))

    def job() -> int:
        return geo_neardup_pairs(
            df, RADIUS, MAX_HAM, n_rows=n_rows, salt=salt or None,
            salt_threshold=threshold or None,
        ).count()

    n_pairs = job()  # warmup (worker fork, JIT)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        job()
        best = min(best, time.time() - t0)
    print(
        json.dumps(
            {
                "n_rows": n_rows, "hot_rows": hot_rows, "salt": salt,
                "salt_threshold": threshold or None,
                "skew_join": skew_join, "sec": round(best, 3),
                "n_pairs": n_pairs, "reps": reps,
            }
        ),
        flush=True,
    )
    spark.stop()


LEGS = [  # (salt, aqe_skew_join, hot_only_threshold)
    (0, True, 0),    # unsalted, AQE absorbs what it can
    (0, False, 0),   # isolate AQE's contribution
    (8, True, 0),    # GLOBAL salt: right side explodes 8x corpus-wide
    (32, True, 0),   # global salt 32: measured OOM at 32M (kept as evidence)
    (8, True, 4096),   # HOT-ONLY: explode only the hot 9-neighborhood
    (32, True, 4096),  # hot-only absorbs deep salt the global arm cannot
]


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "leg":
        n_rows, hot_rows, salt, skew, reps, thr = (int(x) for x in sys.argv[2:8])
        run_leg(n_rows, hot_rows, salt, bool(skew), reps, thr)
        return
    n_rows = int(os.environ.get("AB_N_ROWS", "128000000"))
    hot_rows = int(os.environ.get("AB_HOT_ROWS", "32000"))
    reps = int(os.environ.get("AB_REPS", "3"))
    only_thr = os.environ.get("AB_ONLY_THRESHOLD")  # run just the hot-only legs
    generate(n_rows, hot_rows)
    for salt, skew, thr in LEGS:
        if only_thr is not None and not thr:
            continue
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "leg",
             str(n_rows), str(hot_rows), str(salt), str(int(skew)), str(reps), str(thr)],
            capture_output=True, text=True, cwd=REPO, timeout=3600,
        )
        lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
        if lines:
            print(lines[-1], flush=True)
        else:
            sys.stderr.write(f"LEG FAILED salt={salt} skew={skew} thr={thr}:\n{out.stderr[-2000:]}\n")
            print(json.dumps({"salt": salt, "skew_join": skew, "salt_threshold": thr or None, "error": "leg crashed"}), flush=True)


if __name__ == "__main__":
    main()
