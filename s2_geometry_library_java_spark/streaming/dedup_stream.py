"""Stateful streaming exact-dedup: emit only the first occurrence of each
content hash across the whole stream, with state checkpointed so a restarted
query keeps suppressing duplicates seen before the restart.

The custom stateful operator is ``applyInPandasWithState`` keyed by the
content hash — the streaming face of the batch exact_dedup operator
(operators/dedup.py); at production scale state is RocksDB-backed and the
key space shards across executors like any hash shuffle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

OUTPUT_SCHEMA = StructType(
    [
        StructField("content_hash", StringType()),
        StructField("keeper_id", LongType()),
        StructField("n_new_copies", LongType()),
    ]
)
STATE_SCHEMA = StructType([StructField("seen", LongType())])


def _dedup_fn(key, pdfs, state: GroupState):
    n = 0
    first_id = None
    for pdf in pdfs:
        if len(pdf):
            n += len(pdf)
            cand = int(pdf["doc_id"].min())
            first_id = cand if first_id is None else min(first_id, cand)
    if state.exists:
        (seen,) = state.get
        state.update((seen + n,))
        return iter(())  # duplicate content: suppressed
    state.update((n,))
    yield pd.DataFrame({"content_hash": [key[0]], "keeper_id": [first_id], "n_new_copies": [n]})


def streaming_exact_dedup(stream: DataFrame, content_col: str = "content", id_col: str = "doc_id") -> DataFrame:
    """(doc_id long, content string) stream -> first-occurrence rows only."""
    keyed = stream.select(
        F.md5(F.col(content_col)).alias("content_hash"), F.col(id_col).cast("long").alias("doc_id")
    )
    return keyed.groupBy("content_hash").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
