"""End-to-end pipeline plans (the north-rule encode -> join -> tile flow)."""

from s2_geometry_library_java_spark.plans.pipeline import run_pipeline, encode_images

__all__ = ["run_pipeline", "encode_images"]
