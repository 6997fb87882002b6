#!/usr/bin/env python
"""spark-submit entrypoint for the north-rule pipeline.

Cluster invocation (the --py-files deployment shape the north rule names):

    zip -r s2spark.zip s2_geometry_library_java_spark
    spark-submit --py-files s2spark.zip scripts/submit_pipeline.py \
        --images /warehouse/images --out /warehouse/tiles \
        --layers layers.json --tile-level 7 --buckets 256

Resumable: rerunning with the same --out skips ledger-committed tile
buckets (operators/tiling.py), the batch-snapshot analog of restarting from
the last committed Iceberg snapshot.  In this sandbox the same flow runs
locally with a synthesized images table (--n-images).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_layers(path: str | None):
    from s2_geometry_library_java_spark.operators.layers import cap_layer, loop_layer, polygon_layer, rect_layer

    if path is None:
        from __spark_entry__ import ALL_LAYERS

        return ALL_LAYERS
    makers = {"rect": rect_layer, "cap": cap_layer, "loop": loop_layer, "polygon": polygon_layer}
    layers = []
    with open(path) as fh:
        for spec in json.load(fh):
            kind = spec.pop("kind")
            layers.append(makers[kind](**spec))
    return layers


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", help="parquet/Iceberg path of the images table")
    ap.add_argument("--n-images", type=int, default=1_000_000, help="synthesize if no --images")
    ap.add_argument("--out", required=True)
    ap.add_argument("--layers", help="JSON list of layer specs ({kind, ...kwargs})")
    ap.add_argument("--tile-level", type=int, default=7)
    ap.add_argument("--buckets", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from s2_geometry_library_java_spark.plans.pipeline import run_pipeline

    # On a cluster spark-submit provides the session; locally fall back to
    # the engine defaults.
    spark = SparkSession.builder.getOrCreate()
    images = spark.read.parquet(args.images) if args.images else None
    metrics = run_pipeline(
        spark,
        build_layers(args.layers),
        n_images=args.n_images,
        tile_level=args.tile_level,
        out_dir=args.out,
        buckets=args.buckets,
        images=images,
    )
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
