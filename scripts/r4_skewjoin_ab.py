#!/usr/bin/env python
"""Mechanism probe for the round-4 A/B claim that the 25%-hot-box corpus
shows no straggler penalty on the (unsalted) prefix join: is it AQE's
OptimizeSkewedJoin splitting the hot reducer, or merely the hot rows
LZ4-compressing in the exchange?

spark.sql.adaptive.skewJoin.enabled is runtime-settable, so this is a
same-session interleaved A/B (the repo's standard design for mechanism
questions): 2 warmups, then alternating OFF/ON timed reps of the identical
128M-row skewed e2e job.  One JSON line per rep.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from __spark_entry__ import ALL_LAYERS
    from s2_geometry_library_java_spark.operators.pip_join import pip_join
    from s2_geometry_library_java_spark.operators.tiling import tile_manifest
    from s2_geometry_library_java_spark.plans.pipeline import encode_images
    from s2_geometry_library_java_spark.session import get_spark

    n_images = int(os.environ.get("AB_N_IMAGES", "128000000"))
    img_dir = f"/tmp/s2bench_images_{n_images}_skew25"
    if not os.path.exists(os.path.join(img_dir, "_SUCCESS")):
        raise SystemExit(f"materialize the skewed corpus first (bench.py BENCH_SKEW_FRACTION=0.25): {img_dir}")
    spark = get_spark("skewjoin-ab")

    def job() -> int:
        imgs = spark.read.parquet(img_dir)
        enc = encode_images(imgs.select("phash"))
        m = pip_join(enc, ALL_LAYERS, strategy="prefix", broadcast_cells=False, n_rows=n_images)
        return tile_manifest(m, tile_level=7).count()

    for _ in range(2):
        job()
    for rep in range(int(os.environ.get("AB_REPS", "6"))):
        enabled = rep % 2 == 1
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(enabled).lower())
        t0 = time.time()
        rows = job()
        print(json.dumps({"rep": rep, "skew_join": enabled, "sec": round(time.time() - t0, 3), "manifest_rows": rows}), flush=True)


if __name__ == "__main__":
    main()
