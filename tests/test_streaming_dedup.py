"""Stateful streaming dedup: first-occurrence semantics must hold across a
query restart (state restored from checkpoint; durable parquet sink)."""

import hashlib
import os

import pandas as pd


def _run_batch(spark, src, ckpt, out_dir):
    from s2_geometry_library_java_spark.streaming.dedup_stream import streaming_exact_dedup

    stream = spark.readStream.schema("doc_id long, content string").parquet(src)
    dedup = streaming_exact_dedup(stream)
    q = (
        dedup.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.read.parquet(out_dir).toPandas()


def test_streaming_dedup_across_restart(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    batch1 = pd.DataFrame({"doc_id": [1, 2, 3, 4], "content": ["a", "b", "a", "c"]})
    spark.createDataFrame(batch1).write.mode("append").parquet(src)
    out1 = _run_batch(spark, src, ckpt, out)
    got1 = {r.content_hash: (r.keeper_id, r.n_new_copies) for r in out1.itertuples()}
    assert len(got1) == 3  # a, b, c
    ha = hashlib.md5(b"a").hexdigest()
    assert got1[ha] == (1, 2)  # doc 1 kept, 2 copies in batch

    # restart with new data: duplicates of old content must be suppressed
    batch2 = pd.DataFrame({"doc_id": [5, 6, 7], "content": ["a", "d", "b"]})
    spark.createDataFrame(batch2).write.mode("append").parquet(src)
    out2 = _run_batch(spark, src, ckpt, out)
    hd = hashlib.md5(b"d").hexdigest()
    got2 = {r.content_hash: (r.keeper_id, r.n_new_copies) for r in out2.itertuples()}
    assert len(got2) == 4  # the 3 from batch1 plus only 'd' from batch2
    assert got2[hd] == (6, 1)
    # nothing re-emitted for a/b: their keeper rows are unchanged
    assert got2[ha] == (1, 2)
