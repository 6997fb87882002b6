#!/usr/bin/env python
"""Round-5 ANN quality/latency curve (task 7): recall@10 vs brute force AND
best-of-3 latency for the LSH (bits x tables) and IVF (n_probe) knobs at
sf0.1 — so the approximate paths have a measured curve, not a point.
Markdown to stdout -> BENCH/r5_ann_recall.md.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

K = 10
NQ = 8


def best_of(fn, reps: int = 3) -> float:
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    from s2_geometry_library_java_spark.operators import ann
    from s2_geometry_library_java_spark.session import get_spark
    from s2_geometry_library_java_spark.sources.tables import load_table

    spark = get_spark("ann-recall", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, "/root/testdata/sf0.1", "embeddings").cache()
    n = emb.count()

    brute = {(r["query_id"], r["vec_id"]) for r in ann.cosine_topk(emb, NQ, K).collect()}
    brute_sec = best_of(lambda: ann.cosine_topk(emb, NQ, K).count())
    print(f"# ANN recall/latency at sf0.1 ({n} vectors, 64-dim, k={K}, {NQ} queries)\n")
    print(f"Brute-force cosine top-{K}: {brute_sec:.3f} s (recall 1.0 by definition).\n")
    print("| path | config | mean recall@10 | best-of-3 sec |")
    print("|---|---|---|---|")

    for bits, tables in [(8, 4), (8, 12), (8, 16), (6, 16), (6, 24)]:
        got = {
            (r["query_id"], r["vec_id"])
            for r in ann.lsh_cosine_topk(emb, 64, NQ, K, bits=bits, tables=tables).collect()
        }
        rec = len(got & brute) / len(brute)
        sec = best_of(lambda: ann.lsh_cosine_topk(emb, 64, NQ, K, bits=bits, tables=tables).count())
        print(f"| LSH | bits={bits} tables={tables} | {rec:.3f} | {sec:.3f} |")

    for n_probe in [1, 2, 4, 8, 16]:
        got = {
            (r["query_id"], r["vec_id"])
            for r in ann.ivf_cosine_topk(emb, NQ, K, n_lists=16, n_probe=n_probe).collect()
        }
        rec = len(got & brute) / len(brute)
        sec = best_of(lambda: ann.ivf_cosine_topk(emb, NQ, K, n_lists=16, n_probe=n_probe).count())
        print(f"| IVF | n_lists=16 n_probe={n_probe} | {rec:.3f} | {sec:.3f} |")

    for ksub, sl in [
        (16, 25), (16, 50), (16, 100), (16, 200), (16, None),
        (64, 100), (64, 200), (256, 100),
    ]:
        got = {
            (r["query_id"], r["vec_id"])
            for r in ann.pq_cosine_topk(emb, NQ, K, ksub=ksub, shortlist=sl).collect()
        }
        rec = len(got & brute) / len(brute)
        sec = best_of(lambda: ann.pq_cosine_topk(emb, NQ, K, ksub=ksub, shortlist=sl).count())
        label = "full (exact)" if sl is None else str(sl)
        print(f"| PQ | m=8 ksub={ksub} shortlist={label} | {rec:.3f} | {sec:.3f} |")
    spark.stop()


if __name__ == "__main__":
    main()
