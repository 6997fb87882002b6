"""PySpark-native S2 spatial-join & tiling engine.

A from-scratch engine with the query/data-processing capabilities of the
S2 spherical-geometry reference library (Enovea/s2-geometry-library-java),
re-expressed Spark-first: batched NumPy kernels inside pandas/Arrow UDFs
over DataFrames, relational covering joins, salted tiling, and
checkpoint-resumable manifest writes.

Layout:
  kernel/    pure-NumPy vectorized geometry kernels (no Spark dependency)
  geometry/  driver-side region objects (cap, rect, loop, polygon, cell union)
             and the deterministic region coverer
  functions/ pandas_udf wrappers exposing kernels as Spark columns
  operators/ relational operators: spatial join, kNN, tiling, dedup, text,
             similarity, multimodal plumbing
  sources/   synthetic deterministic images source + readers
  plans/     session builder + end-to-end pipeline with checkpointed resume
  streaming/ structured-streaming variants
"""

__version__ = "0.1.0"


def register_sql_functions(spark):
    """Install the s2_* function surface into a session catalog (see
    functions/sql_api.py) — re-exported here so `import
    s2_geometry_library_java_spark as s2; s2.register_sql_functions(spark)`
    is the one-line SQL-user onboarding."""
    from s2_geometry_library_java_spark.functions.sql_api import (
        register_sql_functions as _impl,
    )

    _impl(spark)
