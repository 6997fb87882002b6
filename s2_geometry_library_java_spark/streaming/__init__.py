"""Structured Streaming surface (supplementary: the north rule's resume model
is batch snapshot + ledger, see operators/tiling.py; this module shows the
same encode/tile kernels composing with readStream for incremental feeds)."""

from s2_geometry_library_java_spark.streaming.encode_stream import streaming_tile_counts
from s2_geometry_library_java_spark.streaming.dedup_stream import streaming_exact_dedup

__all__ = ["streaming_tile_counts", "streaming_exact_dedup"]
