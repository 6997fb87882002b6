#!/usr/bin/env python
"""Calibrate choose_strategy's fact-row-count cutover: run the bench e2e job
(encode + pip_join(ALL_LAYERS) + tile_manifest L7) at a given image count
with each candidate strategy, best-of-3 after warmups.  Usage:

    python scripts/measure_e2e_strategy.py [n_images ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from __spark_entry__ import ALL_LAYERS
    from s2_geometry_library_java_spark.operators.pip_join import pip_join
    from s2_geometry_library_java_spark.operators.tiling import tile_manifest
    from s2_geometry_library_java_spark.plans.pipeline import encode_images
    from s2_geometry_library_java_spark.session import get_spark
    from s2_geometry_library_java_spark.sources.images import synthetic_images

    ns = [int(a) for a in sys.argv[1:]] or [8_000_000]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    out = {}
    for n in ns:
        img_dir = f"/tmp/s2bench_images_{n}"
        split_bytes = 16 * 1024 * 1024
        if os.path.isdir(img_dir):
            total = sum(
                os.path.getsize(os.path.join(img_dir, f))
                for f in os.listdir(img_dir)
                if f.endswith(".parquet")
            )
            if total:
                split_bytes = max(1 << 20, total // cpus)
        spark = get_spark(
            "measure",
            master=f"local[{cpus}]",
            extra_conf={"spark.sql.files.maxPartitionBytes": str(split_bytes)},
        )
        spark.sparkContext.setLogLevel("ERROR")
        if not os.path.exists(os.path.join(img_dir, "_SUCCESS")):
            synthetic_images(spark, n, partitions=128, with_bytes=False).select(
                "image_id", "caption", "phash"
            ).write.mode("overwrite").parquet(img_dir)

        def job(strategy: str) -> int:
            imgs = spark.read.parquet(img_dir)
            enc = encode_images(imgs.select("phash"))
            m = pip_join(enc, ALL_LAYERS, strategy=strategy)
            return tile_manifest(m, tile_level=7).count()

        res = {}
        for strat in ("ancestor", "stab", "range"):
            for _ in range(2):
                job(strat)  # warmup
            best = float("inf")
            rows = 0
            for _ in range(3):
                t0 = time.time()
                rows = job(strat)
                best = min(best, time.time() - t0)
            res[strat] = {"sec": round(best, 3), "rows": rows}
        out[n] = res
        print(json.dumps({n: res}), flush=True)
        spark.stop()
    print("FINAL " + json.dumps(out))


if __name__ == "__main__":
    main()
