#!/usr/bin/env python
"""North-rule scaling in Spark's multi-executor local-cluster mode: the
SAME coordinated job on 1 executor x 2 cores vs 4 executors x 2 cores —
separate executor JVMs with separate memory pools and Python worker pools,
one driver, real shuffles/broadcasts between them.  This is the closest
sandbox analog of the rule's "N and 4N executors" test (closer than
single-JVM local[N], whose shared SparkContext binds the big leg — see
BENCH/BASELINE.md decomposition).

Usage: python scripts/r3_local_cluster.py [n_images]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_leg(n_exec: int, n_images: int, pin: str | None) -> dict:
    """One fresh local-cluster session; returns best-of-3 e2e seconds."""
    from __spark_entry__ import ALL_LAYERS
    from s2_geometry_library_java_spark.operators.pip_join import pip_join
    from s2_geometry_library_java_spark.operators.tiling import tile_manifest
    from s2_geometry_library_java_spark.plans.pipeline import encode_images
    from s2_geometry_library_java_spark.session import get_spark

    img_dir = f"/tmp/s2bench_images_{n_images}"
    total = sum(
        os.path.getsize(os.path.join(img_dir, f))
        for f in os.listdir(img_dir)
        if f.endswith(".parquet")
    )
    cores = 2 * n_exec
    split = max(1 << 20, total // (2 * cores))  # 2 tasks/core (<=8-core regime)
    spark = get_spark(
        f"lc{n_exec}",
        master=f"local-cluster[{n_exec},2,3072]",
        shuffle_partitions=cores,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(split),
            "spark.executor.memory": "3g",
            # executor JVMs are separate processes: ship the package path the
            # way spark-submit --py-files would
            "spark.executorEnv.PYTHONPATH": os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    def job() -> int:
        imgs = spark.read.parquet(img_dir)
        enc = encode_images(imgs.select("phash"))
        m = pip_join(enc, ALL_LAYERS, n_rows=n_images)
        return tile_manifest(m, tile_level=7).count()

    rows = job()  # warmup
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        job()
        best = min(best, time.time() - t0)
    spark.stop()
    return {"n_exec": n_exec, "cores": cores, "sec": round(best, 2),
            "img_per_sec": round(n_images / best), "manifest_rows": rows}


def main() -> None:
    if "--leg" in sys.argv:
        i = sys.argv.index("--leg")
        n_exec = int(sys.argv[i + 1])
        n_images = int(sys.argv[i + 2])
        print(json.dumps(run_leg(n_exec, n_images, None)), flush=True)
        return

    # Orchestrate: each leg a fresh process pinned (taskset affinity is
    # inherited by the executor JVMs it spawns) to exactly its core budget.
    import subprocess

    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 128_000_000
    legs = {}
    for n_exec, pin in ((1, "0-1"), (4, "0-7")):
        out = subprocess.run(
            ["taskset", "-c", pin, sys.executable, os.path.abspath(__file__),
             "--leg", str(n_exec), str(n_images)],
            capture_output=True, text=True, timeout=3000,
        )
        line = out.stdout.strip().splitlines()[-1]
        legs[n_exec] = json.loads(line)
        print(line, flush=True)
    eff = legs[4]["img_per_sec"] / (4.0 * legs[1]["img_per_sec"])
    print(json.dumps({"efficiency_1to4_executors": round(eff, 3)}), flush=True)


if __name__ == "__main__":
    main()
