"""Hilbert-locality storage layout: write a fact table range-partitioned
and sorted by S2 cell id so spatial range predicates prune at the parquet
row-group level.

Why this is a first-class operator at 100 TB: the cell id IS a
space-filling-curve key (the Hilbert derivation in `kernel/cellid.py`),
so sorting by it clusters spatially-near rows into the same row groups.
A query for any cell's descendant range (`range_min <= cell_id <=
range_max`, K14) then touches only the row groups whose [min, max]
footer interval intersects the range — the same effect Iceberg/Delta
z-ordering buys, obtained with nothing but a sort, because S2 already
linearizes 2-D locality (reference: the cell-id ordering guarantees in
`S2CellId.java:59-72`).

The write is `repartitionByRange(cell_id) + sortWithinPartitions` — one
range shuffle (sampled bounds), then each file is internally sorted, so
BOTH file-level and row-group-level min/max are tight.  Readers get the
pruning for free from the parquet predicate pushdown; the physical
evidence (row groups whose stats intersect a query range) is inspectable
straight from the footers — see `prunable_row_groups`.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_hilbert_layout(
    df: DataFrame, path: str, n_files: int = 32, cell_col: str = "cell_id"
) -> None:
    """Write ``df`` as parquet range-partitioned + sorted by ``cell_col``.

    One range Exchange (driver samples the bounds); skew in the cell
    distribution lands in file SIZES, not in task blowup, because ranges
    split the sorted domain.  n_files sizes the layout: at corpus scale
    pick rows/file so a row group (~128 MB default) holds a few million
    rows.
    """
    (
        df.repartitionByRange(n_files, F.col(cell_col))
        .sortWithinPartitions(cell_col)
        .write.mode("overwrite")
        .parquet(path)
    )


def read_cell_range(spark, path: str, range_min: int, range_max: int, cell_col: str = "cell_id"):
    """Scan the layout for one cell's descendant range; the BETWEEN reaches
    the parquet reader as a pushed filter (assert via PushedFilters in the
    scan node) and prunes non-intersecting row groups."""
    df = spark.read.parquet(path)
    return df.filter((F.col(cell_col) >= range_min) & (F.col(cell_col) <= range_max))


def prunable_row_groups(path: str, range_min: int, range_max: int, cell_col: str = "cell_id"):
    """Footer-level evidence: (intersecting, total) row-group counts for a
    query range, read directly from the parquet statistics — the fraction
    a stats-aware reader must touch.  Signed int64 compare is safe here
    because a valid descendant range never crosses the face-4/5 sign
    boundary mid-range (range_min/range_max share the cell's face bits)."""
    import pyarrow.parquet as pq

    hit = total = 0
    for name in os.listdir(path):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        ci = {md.schema.column(i).name: i for i in range(md.num_columns)}[cell_col]
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            total += 1
            if st is None or st.min is None:
                hit += 1  # no stats -> reader must scan it
            elif st.min <= range_max and st.max >= range_min:
                hit += 1
    return hit, total
