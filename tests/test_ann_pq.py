"""Product-quantization ANN gates: exactness of the full-shortlist mode
(the driver-row configuration), the recall-vs-shortlist quality curve of
the approximate regime, code bounds/compression, and codebook determinism
(no RNG anywhere in train — bit-reproducible across runs and cluster
sizes, the property the bounded-collect train contract depends on)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from s2_geometry_library_java_spark.operators import ann
from s2_geometry_library_java_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def emb(spark, sf01_dir):
    return load_table(spark, sf01_dir, "embeddings").cache()


def _pairs(rows):
    return sorted((r["query_id"], r["vec_id"], r["rank"], r["sim"]) for r in rows)


def test_pq_full_shortlist_is_exact(spark, emb):
    """shortlist=None keeps every ADC candidate for the exact re-rank, so
    the output must equal brute-force cosine_topk row-for-row (rank ties
    broken id-asc on both sides) — the invariant behind sharing the brute
    DuckDB oracle in the ann_pq driver row."""
    brute = _pairs(ann.cosine_topk(emb, n_queries=8, k=5).collect())
    pq = _pairs(ann.pq_cosine_topk(emb, n_queries=8, k=5, shortlist=None).collect())
    assert pq == brute
    assert len(pq) == 8 * 5


def test_pq_recall_monotone_in_shortlist(spark, emb):
    """recall@5 vs brute must be non-decreasing as the ADC shortlist widens
    and reach 1.0 at shortlist >= corpus (nothing dropped).  Absolute floor
    pinned at the measured sf0.01 curve (near-random 64-dim corpus, 4-bit
    codes: 0.425/0.65/0.75/0.95 at 10/25/50/100)."""
    bset = {(r["query_id"], r["vec_id"]) for r in ann.cosine_topk(emb, n_queries=8, k=5).collect()}
    last = 0.0
    for sl, floor in ((10, 0.35), (25, 0.55), (50, 0.65), (100, 0.85)):
        got = {
            (r["query_id"], r["vec_id"])
            for r in ann.pq_cosine_topk(emb, n_queries=8, k=5, shortlist=sl).collect()
        }
        rec = len(got & bset) / len(bset)
        assert rec >= floor, f"shortlist={sl}: recall {rec:.3f} < floor {floor}"
        assert rec >= last - 1e-9, f"recall curve not monotone at shortlist={sl}"
        last = rec
    full = _pairs(ann.pq_cosine_topk(emb, n_queries=8, k=5, shortlist=10**9).collect())
    assert {(q, v) for q, v, _, _ in full} == bset


def test_pq_encode_codes_bounded_and_compact(spark, emb):
    books = ann.pq_train_codebooks(emb)
    m, ksub, dsub = books.shape
    assert (m, ksub, dsub) == (ann.PQ_M, ann.PQ_KSUB, 64 // ann.PQ_M)
    coded = ann.pq_encode(emb, books)
    stats = coded.select(
        F.min(F.array_min("pq_codes")).alias("lo"),
        F.max(F.array_max("pq_codes")).alias("hi"),
        F.min(F.size("pq_codes")).alias("lmin"),
        F.max(F.size("pq_codes")).alias("lmax"),
    ).first()
    assert stats["lo"] >= 0 and stats["hi"] < ksub
    assert stats["lmin"] == stats["lmax"] == m
    # compression story: m codes of log2(ksub) bits vs dim float32
    assert m * np.log2(ksub) / 8 <= (64 * 4) / 16  # >= 16x smaller bit-packed


def test_pq_train_deterministic(spark, emb):
    b1 = ann.pq_train_codebooks(emb)
    b2 = ann.pq_train_codebooks(emb)
    assert np.array_equal(b1, b2)
    # centroids live in normalized-vector subspace scale
    assert np.isfinite(b1).all()


def test_pq_train_rejects_indivisible_dim(spark, emb):
    with pytest.raises(ValueError, match="not divisible"):
        ann.pq_train_codebooks(emb, m=7)


def test_ivfpq_full_config_is_exact(spark, emb):
    """n_probe == n_lists + shortlist=None: both pruners pass everything,
    so IVF-PQ must equal brute row-for-row — the ann_ivfpq driver-row
    invariant."""
    brute = _pairs(ann.cosine_topk(emb, n_queries=8, k=5).collect())
    got = _pairs(
        ann.ivfpq_cosine_topk(
            emb, n_queries=8, k=5, n_lists=16, n_probe=16, shortlist=None
        ).collect()
    )
    assert got == brute


def test_ivfpq_approximate_regime_recall(spark, emb):
    """Quarter-probe + 10%-shortlist must clear a real recall floor
    (measured 0.925 at sf0.01), and at a FIXED probe set recall must be
    monotone in shortlist (wider shortlist = superset of exact-re-rank
    candidates).  Note recall is NOT monotone in n_probe at fixed
    shortlist — extra probed cells add ADC candidates that can crowd true
    positives out of the shortlist (measured: n_probe 4->8 at shortlist 50
    moves recall 0.925->0.85) — so that direction is deliberately
    ungated."""
    bset = {(r["query_id"], r["vec_id"]) for r in ann.cosine_topk(emb, n_queries=8, k=5).collect()}

    def rec(n_probe, shortlist):
        got = {
            (r["query_id"], r["vec_id"])
            for r in ann.ivfpq_cosine_topk(
                emb, n_queries=8, k=5, n_probe=n_probe, shortlist=shortlist
            ).collect()
        }
        return len(got & bset) / len(bset)

    r_narrow = rec(4, 50)
    r_wide = rec(4, 150)
    assert r_narrow >= 0.8, f"ivfpq recall {r_narrow:.3f} < 0.8 at n_probe=4"
    assert r_wide >= r_narrow - 1e-9, "recall decreased with wider shortlist"


def test_pq_pack_roundtrip_and_adc_equivalence(spark, emb):
    """Packing the m codes into one BIGINT and unpacking natively must
    round-trip exactly.  Codes equal implies ADC equal — ADC similarity
    is a pure function of the codes — so exact round-trip IS the
    storage-losslessness proof for the packed form; no separate top-k
    rerun is needed."""
    books = ann.pq_train_codebooks(emb)
    coded = ann.pq_encode(emb, books)
    rt = coded.select(
        "vec_id",
        "pq_codes",
        F.expr(ann.pq_unpack_expr(ann.pq_pack_expr())).alias("unpacked"),
    )
    assert rt.filter(F.col("pq_codes") != F.col("unpacked")).count() == 0
    # packed footprint: m * ceil(log2(ksub)) bits fits one long
    top = coded.select(F.expr(ann.pq_pack_expr()).alias("p")).agg(
        F.max("p").alias("hi"), F.min("p").alias("lo")
    ).first()
    assert 0 <= top["lo"] and top["hi"] < (1 << (ann.PQ_M * 4))
    with pytest.raises(ValueError, match="exceeds"):
        ann.pq_pack_expr(m=8, ksub=1 << 60)


def test_pq_train_guards_and_zero_norm_robustness(spark, emb):
    """ksub beyond the sampled rows must fail with a CLEAR error (not a
    mid-train numpy broadcast), and a zero-norm embedding must stay a
    zero row — affecting only itself — rather than poisoning every
    codebook with NaN."""
    with pytest.raises(ValueError, match="exceeds the"):
        ann.pq_train_codebooks(emb, ksub=4096)
    rows = [(0, [0.0] * 64)] + [
        (i, [float((i * 37 + j * 11) % 13 - 6) for j in range(64)]) for i in range(1, 40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    books = ann.pq_train_codebooks(df, ksub=8, sample_n=40)
    assert np.isfinite(books).all()
    coded = ann.pq_encode(df, books)
    got = coded.select(F.min(F.array_min("pq_codes")), F.max(F.array_max("pq_codes"))).first()
    assert got[0] >= 0 and got[1] < 8
