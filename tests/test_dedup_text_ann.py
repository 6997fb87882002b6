"""Training-data-pipeline ops: dedup (exact/MinHash/SimHash), text analysis,
and embedding similarity — each cross-checked against a NumPy/pure-Python
brute-force oracle (SURVEY.md §5 style 3)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from s2_geometry_library_java_spark.operators import ann, dedup, text
from s2_geometry_library_java_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").cache()


@pytest.fixture(scope="module")
def docs_pdf(docs):
    return docs.toPandas()


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").cache()


@pytest.fixture(scope="module")
def emb_np(emb):
    pdf = emb.orderBy("vec_id").toPandas()
    return pdf["vec_id"].to_numpy(), np.stack(pdf["embedding"].to_numpy()).astype(np.float64)


# ---------------------------------------------------------------------------
# Dedup
# ---------------------------------------------------------------------------
def test_exact_dedup(docs, docs_pdf):
    out = dedup.exact_dedup(docs).collect()
    by_text = {}
    for r in docs_pdf.itertuples(index=False):
        by_text.setdefault(r.text, []).append(r.doc_id)
    assert len(out) == len(by_text)
    got = {r["keeper_id"]: r["n_copies"] for r in out}
    expect = {min(v): len(v) for v in by_text.values()}
    assert got == expect


def _shingle_set(t, w=dedup.SHINGLE_W):
    if len(t) < w:
        return {t[:w]} if t else set()
    return {t[i : i + w] for i in range(len(t) - w + 1)}


def test_minhash_neardup_finds_true_jaccard_pairs(docs, docs_pdf):
    pairs = dedup.minhash_neardup_pairs(docs, threshold=0.35).collect()
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    # every reported pair must have the true Jaccard it claims
    sets = {r.doc_id: _shingle_set(r.text) for r in docs_pdf.itertuples(index=False)}
    for (a, b), j in got.items():
        sa, sb = sets[a], sets[b]
        true_j = len(sa & sb) / len(sa | sb)
        assert j == pytest.approx(true_j, abs=1e-9)
        assert true_j >= 0.35
    # LSH candidates, then verified — recall over truly-high-similarity pairs
    # must be high (identical signatures collide in every band)
    truth = []
    ids = list(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            sa, sb = sets[a], sets[b]
            j = len(sa & sb) / len(sa | sb)
            if j >= 0.6:
                truth.append((min(a, b), max(a, b)))
    if truth:
        found = sum(1 for p in truth if p in got)
        assert found / len(truth) >= 0.8


def _ngram_set(t, w=dedup.NGRAM_W):
    toks = t.split(" ")
    if len(toks) <= w:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + w]) for i in range(len(toks) - w + 1)}


def test_ngram_jaccard_exact_vs_bruteforce(docs, docs_pdf):
    # EXACT operator: result must equal the full all-pairs brute force, both
    # membership AND values — no LSH recall slack here.
    got = {
        (r["id_a"], r["id_b"]): (r["n_common"], r["jaccard"])
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.35).collect()
    }
    sets = {r.doc_id: _ngram_set(r.text) for r in docs_pdf.itertuples(index=False)}
    ids = sorted(sets)
    expect = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            sa, sb = sets[a], sets[b]
            inter = len(sa & sb)
            if inter and inter / len(sa | sb) >= 0.35:
                expect[(min(a, b), max(a, b))] = (inter, len(sa | sb))
    assert set(got) == set(expect)
    for k, (inter, union) in expect.items():
        assert got[k][0] == inter
        assert got[k][1] == pytest.approx(inter / union, abs=1e-9)


def test_ngram_jaccard_max_df_bounds_hot_gram(spark):
    """The hot-key guard: a stopword gram shared by k docs would emit k^2/2
    pairs inside ONE groupBy task; with max_df it must be pruned ENTIRELY
    (bounding any gram's pair explode to max_df^2/2), and the surviving
    output must equal the capped-domain brute force exactly."""
    import pandas as pd

    n_hot = 40
    rows = [(i, f"the common stopword gram u{i}a u{i}b u{i}c") for i in range(n_hot)]
    # one genuine near-dup pair held together by discriminative grams
    rows.append((100, "alpha beta gamma delta epsilon zeta"))
    rows.append((101, "alpha beta gamma delta epsilon eta"))
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))

    capped = {
        (r["id_a"], r["id_b"])
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.1, max_df=8).collect()
    }
    # every hot-gram-only pair (held together solely by "the common
    # stopword"/"common stopword gram", df=40 > 8) is gone — without the cap
    # there would be n_hot*(n_hot-1)/2 of them
    assert capped == {(100, 101)}
    uncapped = {
        (r["id_a"], r["id_b"])
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.1, max_df=None).collect()
    }
    assert len(uncapped) == n_hot * (n_hot - 1) // 2 + 1
    # capped jaccard is a LOWER bound on true jaccard for surviving pairs
    j_capped = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.0, max_df=8).collect()
    }
    j_full = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.0, max_df=None).collect()
    }
    for pair, j in j_capped.items():
        assert j <= j_full[pair] + 1e-12


def test_simhash_fingerprint_matches_scalar_oracle(docs, docs_pdf):
    import hashlib

    out = {r["doc_id"]: r["simhash"] for r in dedup.simhash_fingerprints(docs).collect()}
    for r in docs_pdf.head(50).itertuples(index=False):
        votes = np.zeros(dedup.SIMHASH_BITS, dtype=np.int64)
        for tok in r.text.split(" "):
            h = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % dedup.MINHASH_PRIME
            for b in range(dedup.SIMHASH_BITS):
                votes[b] += 1 if (h >> b) & 1 else -1
        expect = sum(1 << b for b in range(dedup.SIMHASH_BITS) if votes[b] > 0)
        assert out[r.doc_id] == expect


def test_simhash_neardup_pairs_hamming(docs):
    pairs = dedup.simhash_neardup_pairs(docs, max_hamming=10).collect()
    fps = {r["doc_id"]: r["simhash"] for r in dedup.simhash_fingerprints(docs).collect()}
    for r in pairs:
        assert bin(fps[r["id_a"]] ^ fps[r["id_b"]]).count("1") == r["hamming"] <= 10


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------
def test_text_profile(docs, docs_pdf):
    prof = {r["doc_id"]: r for r in text.text_profile(docs).collect()}
    import hashlib

    for r in docs_pdf.head(50).itertuples(index=False):
        p = prof[r.doc_id]
        toks = r.text.split(" ")
        assert p["n_ws_tokens"] == len(toks)
        assert p["n_chars"] == len(r.text)
        assert p["fp_md5"] == hashlib.md5(r.text.encode()).hexdigest()
        stop = sum(toks.count(w) for w in text.EN_STOPWORDS)
        assert p["stopword_ratio"] == pytest.approx(stop / len(toks), abs=1e-9)
        assert p["lang_guess"] in ("en", "fr", "de")


# ---------------------------------------------------------------------------
# Embedding similarity
# ---------------------------------------------------------------------------
def _brute_topk(ids, mat, n_queries, k):
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = norm @ norm.T
    expect = {}
    for q in range(n_queries):
        order = sorted(((-sims[q, j], ids[j]) for j in range(len(ids)) if ids[j] != ids[q]))
        expect[ids[q]] = [int(v) for _, v in order[:k]]
    return expect


def test_cosine_topk_matches_bruteforce(emb, emb_np):
    ids, mat = emb_np
    k, nq = 5, 8
    out = ann.cosine_topk(emb, n_queries=nq, k=k).collect()
    got = {}
    for r in sorted(out, key=lambda r: (r["query_id"], r["rank"])):
        got.setdefault(r["query_id"], []).append(r["vec_id"])
    expect = _brute_topk(ids, mat, nq, k)
    for q in range(nq):
        assert got[ids[q]] == expect[ids[q]]


def test_lsh_topk_recall_on_clustered_data(spark):
    """Recall check on planted clusters (the workload LSH is for); the sf
    embeddings are isotropic noise where pruning-based ANN has no signal."""
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((10, 32))
    vecs, ids = [], []
    for c in range(10):
        for j in range(30):
            v = centers[c] + 0.15 * rng.standard_normal(32)
            ids.append(c * 100 + j)
            vecs.append((v / np.linalg.norm(v)).astype(np.float32))
    pdf = __import__("pandas").DataFrame({"vec_id": ids, "embedding": vecs})
    df = spark.createDataFrame(pdf)
    mat = np.stack(vecs).astype(np.float64)
    order = np.argsort(ids)
    k, nq = 5, 8
    out = ann.lsh_cosine_topk(df, dim=32, n_queries=nq, k=k).collect()
    got = {}
    for r in out:
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    sids = np.array(sorted(ids))
    smat = mat[order]
    expect = _brute_topk(sids, smat, nq, k)
    recalls = [len(got.get(int(sids[q]), set()) & set(expect[sids[q]])) / k for q in range(nq)]
    assert float(np.mean(recalls)) >= 0.8


def test_lsh_recall_matches_local_golden(emb, emb_np):
    """The distributed recall companion (ann_lsh_recall gate) must equal the
    single-process recompute exactly — same hyperplanes, same multi-probe
    rule, same fold-cosine ranking."""
    ids, mat = emb_np
    k, nq = 5, 8
    got = {
        r["query_id"]: (r["n_hits"], r["recall"])
        for r in ann.lsh_recall(emb, dim=mat.shape[1], n_queries=nq, k=k).collect()
    }
    expect = {q: (n, rec) for q, n, rec in ann.lsh_recall_local(mat, ids, n_queries=nq, k=k)}
    assert got == expect
    assert len(got) == nq


def test_embedding_neardup(emb, emb_np):
    ids, mat = emb_np
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = norm @ norm.T
    tau = 0.4
    expect = {(int(ids[i]), int(ids[j])) for i in range(len(ids)) for j in range(i + 1, len(ids)) if sims[i, j] >= tau - 1e-12}
    out = {(r["id_a"], r["id_b"]) for r in ann.embedding_neardup(emb, threshold=tau).collect()}
    # fp tolerance at the threshold boundary: compare away from the edge
    strict = {(int(ids[i]), int(ids[j])) for i in range(len(ids)) for j in range(i + 1, len(ids)) if sims[i, j] >= tau + 1e-9}
    assert strict <= out <= expect


def test_ivf_full_probe_is_exact(emb):
    """n_probe == n_lists -> candidates = whole corpus -> identical to the
    brute cosine top-k (rows, ranks, and rounded sims)."""
    exact = {tuple(r) for r in ann.cosine_topk(emb, n_queries=8, k=5).collect()}
    ivf = {tuple(r) for r in ann.ivf_cosine_topk(emb, n_queries=8, k=5, n_lists=8, n_probe=8).collect()}
    assert exact == ivf and len(exact) == 40


def test_ivf_partial_probe_recall(emb):
    exact = {}
    for r in ann.cosine_topk(emb, n_queries=8, k=5).collect():
        exact.setdefault(r["query_id"], set()).add(r["vec_id"])
    got = {}
    for r in ann.ivf_cosine_topk(emb, n_queries=8, k=5, n_lists=8, n_probe=3).collect():
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [len(got.get(q, set()) & s) / len(s) for q, s in exact.items()]
    assert sum(recalls) / len(recalls) >= 0.5  # coarse quantizer at 3/8 lists


def test_embedding_neardup_blocked_is_bit_exact_vs_brute(emb):
    """The centroid-blocked plan must reproduce the row-cartesian brute
    force EXACTLY (ids and rounded sims) — recall 1.0 is the design claim."""
    brute = {tuple(r) for r in ann.embedding_neardup_brute(emb, threshold=0.4).collect()}
    blocked = {tuple(r) for r in ann.embedding_neardup(emb, threshold=0.4, n_blocks=8).collect()}
    assert brute == blocked and len(brute) > 0


def test_embedding_neardup_salted_skewed_block_is_exact(emb):
    """Skew path: a tiny rows_per_task forces every block past the salt
    threshold, sub-splitting blocks by id hash and expanding the pair list
    to all sub-block combos — results must STILL equal brute exactly (each
    id lives in one (block, salt), so no pair is lost or duplicated)."""
    brute = sorted(
        tuple(r) for r in ann.embedding_neardup_brute(emb, threshold=0.4).collect()
    )
    salted = sorted(
        tuple(r)
        for r in ann.embedding_neardup(
            emb, threshold=0.4, n_blocks=4, rows_per_task=7
        ).collect()
    )
    assert salted == brute and len(brute) > 0  # sorted lists: dup pairs would differ


def test_embedding_neardup_derives_blocks_from_hint(emb):
    """n_rows hint drives the block count: the centroid limit reflects
    ceil(n_rows / rows_per_task) clamped to [16, 4096], and results stay
    exact under the derived blocking."""
    brute = {tuple(r) for r in ann.embedding_neardup_brute(emb, threshold=0.4).collect()}
    hinted = {
        tuple(r)
        for r in ann.embedding_neardup(
            emb, threshold=0.4, n_rows=10_000_000, rows_per_task=100_000
        ).collect()
    }
    assert hinted == brute


# ---------------------------------------------------------------------------
# Connected components (near-dup cluster collapse)
# ---------------------------------------------------------------------------
def _uf_components(n_nodes, edges):
    """Pure-Python union-find oracle: node -> min id of its component."""
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in range(n_nodes)}


def _cc_spark(spark, edges):
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "id_a long, id_b long"
    )
    out = dedup.connected_components(df)
    return {r["node"]: r["root"] for r in out.collect()}


@pytest.mark.parametrize("seed,n,m", [(1, 40, 25), (2, 80, 120), (3, 200, 60)])
def test_connected_components_vs_union_find(spark, seed, n, m):
    rng = np.random.RandomState(seed)
    edges = [(int(a), int(b)) for a, b in rng.randint(0, n, size=(m, 2)) if a != b]
    got = _cc_spark(spark, edges)
    expect = _uf_components(n, edges)
    touched = {a for e in edges for a in e}
    assert got == {x: expect[x] for x in touched}


def test_connected_components_path_graph_beats_diameter(spark):
    # a 64-node chain has diameter 63; large-star/small-star must converge in
    # O(log^2 n) rounds, far under the 12-round budget (label propagation
    # would need ~63) — max_iter raises if the bound is exceeded.
    edges = [(i, i + 1) for i in range(63)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    out = dedup.connected_components(df, max_iter=12)
    assert {(r["node"], r["root"]) for r in out.collect()} == {(i, 0) for i in range(64)}


def test_connected_components_empty_and_selfpairs(spark):
    df = spark.createDataFrame([(7, 7)], "id_a long, id_b long")
    assert dedup.connected_components(df).count() == 0


def test_neardup_clusters_and_collapse(docs, docs_pdf):
    pairs = dedup.minhash_neardup_pairs(docs, threshold=0.35)
    clusters = dedup.neardup_clusters(pairs, docs)
    rows = {r["doc_id"]: r["cluster_id"] for r in clusters.collect()}
    assert len(rows) == len(docs_pdf)  # whole universe covered
    ids = sorted(docs_pdf["doc_id"])
    idx = {d: i for i, d in enumerate(ids)}
    edges = [
        (idx[r["id_a"]], idx[r["id_b"]]) for r in pairs.collect()
    ]
    expect = _uf_components(len(ids), edges)
    assert rows == {d: ids[expect[idx[d]]] for d in ids}
    collapsed = dedup.collapse_neardups(docs, clusters)
    keepers = {r["doc_id"]: r["n_members"] for r in collapsed.collect()}
    from collections import Counter

    sizes = Counter(rows.values())
    assert keepers == dict(sizes)
    assert set(collapsed.columns) == set(docs.columns) | {"n_members"}
