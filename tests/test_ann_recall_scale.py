"""ANN quality gates at scale (round-5 task 7): the approximate paths get a
measured recall curve, not a point — LSH recall >= 0.9 vs brute at sf0.1
(the real-ANN-SLO bar), and the IVF probe-count knob's recall is monotone
in n_probe with exactness at full probe.
"""

import pytest
from pyspark.sql import functions as F

from s2_geometry_library_java_spark.operators import ann
from s2_geometry_library_java_spark.sources.tables import load_table

EMB_DIM = 64


@pytest.fixture(scope="module")
def emb01(spark):
    return load_table(spark, "/root/testdata/sf0.1", "embeddings").cache()


def test_lsh_recall_sf01_meets_slo(spark, emb01):
    """Multi-table multi-probe LSH top-10 must reach mean recall >= 0.9
    against the exact brute top-10 at sf0.1 (2000 vectors, 64-dim) — the
    scale gate behind the sf0.01 driver row (ann_lsh_recall).

    The sf0.1 corpus is near-random (brute top-1 cosine ~0.37, median pair
    ~0.0 — the hardest LSH regime), so hitting a real-ANN SLO needs the
    bits/tables knob turned toward recall: measured curve at this SF
    (mean recall@10 over 8 queries) —
      bits=8  tables=4  (driver default): 0.33
      bits=8  tables=12: 0.75      bits=8 tables=16: 0.85
      bits=6  tables=16: 0.99      bits=6 tables=24: 1.00
    Gate the named SLO config; the full recall/latency table lives in
    BENCH/r5_ann_recall.md."""
    rec = ann.lsh_recall(emb01, EMB_DIM, n_queries=8, k=10, bits=6, tables=16).collect()
    assert len(rec) == 8
    mean_recall = sum(r["recall"] for r in rec) / len(rec)
    assert mean_recall >= 0.9, f"LSH mean recall {mean_recall:.3f} < 0.9 SLO"


def _ivf_recall(emb, n_probe: int, n_lists: int = 16, k: int = 10) -> float:
    brute = {
        (r["query_id"], r["vec_id"])
        for r in ann.cosine_topk(emb, n_queries=8, k=k).collect()
    }
    got = {
        (r["query_id"], r["vec_id"])
        for r in ann.ivf_cosine_topk(
            emb, n_queries=8, k=k, n_lists=n_lists, n_probe=n_probe
        ).collect()
    }
    return len(got & brute) / len(brute)


def test_ivf_probe_knob_recall_curve(spark, emb01):
    """recall@10 must be non-decreasing in n_probe and EXACT at
    n_probe == n_lists (every cell probed == brute force) — the measured
    quality/latency curve the operator's docstring promises."""
    n_lists = 16
    r1 = _ivf_recall(emb01, n_probe=1, n_lists=n_lists)
    r4 = _ivf_recall(emb01, n_probe=4, n_lists=n_lists)
    r_full = _ivf_recall(emb01, n_probe=n_lists, n_lists=n_lists)
    assert r1 <= r4 + 1e-9 <= r_full + 2e-9
    assert r_full == 1.0  # full probe = exact
    assert r4 >= 0.6  # the default probe setting is usefully accurate


def test_ivf_candidate_volume_scales_with_probe(spark, emb01):
    """The latency lever behind the knob: candidate volume (rows surviving
    the cell equi-join before re-rank) must grow ~linearly with n_probe —
    the n_probe/n_lists cost model stated in ivf_cosine_topk's docstring.
    Measured through the operator's own plan by counting matched pairs at
    k=corpus (no top-k cut): with uniform lists the ratio sits near 4, and
    the [2, 8] band keeps the gate robust to list-size imbalance without
    letting a constant-volume (broken-knob) implementation pass."""
    n = emb01.count()
    v1 = ann.ivf_cosine_topk(emb01, n_queries=8, k=n, n_lists=16, n_probe=1).count()
    v4 = ann.ivf_cosine_topk(emb01, n_queries=8, k=n, n_lists=16, n_probe=4).count()
    assert 2.0 <= v4 / v1 <= 8.0
