"""Similarity search over the ``embeddings`` table (array<float> columns).

- ``cosine_topk``: brute-force exact top-k cosine — the correctness
  baseline.  The dot product is a native ``aggregate(zip_with(...))`` fold
  (JVM-side, sequential, bit-identical to DuckDB's list_dot_product — probed
  empirically), queries broadcast, ranking by window row_number.
- ``lsh_cosine_topk``: the scale path — random-hyperplane LSH bucket join:
  sign-bit signatures from D deterministic hyperplanes (seeded NumPy,
  computed in one vectorized pandas UDF), candidates = bucket collisions
  (multi-probe over all 1-bit flips), exact cosine re-rank within
  candidates.  Recall is validated against brute force in pytest.
- ``embedding_neardup``: near-duplicate pairs with cosine >= threshold.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, IntegerType

LSH_BITS = 8
LSH_TABLES = 4
LSH_SEED = 20260816


def _dot_expr(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
        f"0.0d, (acc, v) -> acc + v)"
    )


def _norm_expr(a: str) -> str:
    return f"sqrt({_dot_expr(a, a)})"


def cosine_expr(a: str, b: str) -> str:
    return f"({_dot_expr(a, b)} / ({_norm_expr(a)} * {_norm_expr(b)}))"


def cosine_topk(
    embeddings: DataFrame,
    n_queries: int = 8,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors for the first ``n_queries`` vectors (self-join,
    excluding self-matches).  Returns (query_id, vec_id, rank, sim)."""
    q = embeddings.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    joined = embeddings.join(F.broadcast(q), F.col(id_col) != F.col("query_id"))
    sim = F.expr(cosine_expr("qvec", vec_col))
    w = Window.partitionBy("query_id").orderBy(F.col("_sim").desc(), F.col(id_col).asc())
    return (
        joined.withColumn("_sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "rank", F.round("_sim", 9).alias("sim"))
    )


def _hyperplanes(dim: int, bits: int = LSH_BITS, tables: int = LSH_TABLES) -> np.ndarray:
    rng = np.random.default_rng(LSH_SEED)
    return rng.standard_normal((tables, bits, dim))


def with_lsh_buckets(
    embeddings: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    bits: int = LSH_BITS,
    tables: int = LSH_TABLES,
) -> DataFrame:
    """Add ``lsh_buckets``: one sign-bit bucket per hash table (multi-table
    random-hyperplane LSH) — one vectorized matmul per Arrow batch."""
    planes = _hyperplanes(dim, bits, tables)  # (T, B, dim)

    @pandas_udf(ArrayType(IntegerType()))
    def lsh_sig(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy()).astype(np.float64)  # (n, dim)
        weights = (1 << np.arange(bits)).astype(np.int64)
        out = np.empty((len(mat), tables), dtype=np.int32)
        for t in range(tables):
            out[:, t] = ((mat @ planes[t].T > 0) @ weights).astype(np.int32)
        return pd.Series(list(out))

    return embeddings.withColumn("lsh_buckets", lsh_sig(F.col(vec_col)))


def lsh_cosine_topk(
    embeddings: DataFrame,
    dim: int,
    n_queries: int = 8,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = LSH_BITS,
    tables: int = LSH_TABLES,
) -> DataFrame:
    """Approximate top-k: a candidate collides with the query in ANY table,
    under the exact bucket or any 1-bit probe flip; exact cosine re-rank.
    Recall follows the standard multi-table bound 1-(1-p^b)^T."""
    emb_b = with_lsh_buckets(embeddings, dim, vec_col, bits, tables).cache()
    data = emb_b.select(
        id_col, vec_col, F.posexplode("lsh_buckets").alias("table", "bucket")
    )
    probe_cols = []
    for t in range(tables):
        base = F.col("lsh_buckets").getItem(t)
        for flip in [0] + [1 << i for i in range(bits)]:
            probe_cols.append(F.struct(F.lit(t).alias("table"), base.bitwiseXOR(F.lit(flip)).alias("bucket")))
    q = (
        emb_b.filter(F.col(id_col) < n_queries)
        .select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"), F.explode(F.array(*probe_cols)).alias("p"))
        .select("query_id", "qvec", F.col("p.table").alias("table"), F.col("p.bucket").alias("bucket"))
    )
    cand = data.join(F.broadcast(q), ["table", "bucket"]).filter(F.col(id_col) != F.col("query_id"))
    sim = F.expr(cosine_expr("qvec", vec_col))
    w = Window.partitionBy("query_id").orderBy(F.col("_sim").desc(), F.col(id_col).asc())
    return (
        cand.select("query_id", id_col, vec_col, "qvec").distinct()
        .withColumn("_sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "rank", F.round("_sim", 9).alias("sim"))
    )


def embedding_neardup(
    embeddings: DataFrame,
    threshold: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine >= threshold (id_a < id_b) — brute variant; the
    LSH-bucketed variant reuses with_lsh_bucket for the 100 TB path."""
    a = embeddings.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    sim = F.expr(cosine_expr("va", "vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("_sim", sim)
        .filter(F.col("_sim") >= threshold)
        .select("id_a", "id_b", F.round("_sim", 9).alias("sim"))
    )
