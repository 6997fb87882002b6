"""Sources: parquet/testdata loaders, deterministic geotagging, and the
synthetic ``images`` fact table (FIXTURES.md F1)."""

from s2_geometry_library_java_spark.sources.tables import (
    load_table,
    geotagged_points,
    geotagged_queries,
)
from s2_geometry_library_java_spark.sources.images import (
    synthetic_images,
    images_pandas,
)

__all__ = [
    "load_table",
    "geotagged_points",
    "geotagged_queries",
    "synthetic_images",
    "images_pandas",
]
