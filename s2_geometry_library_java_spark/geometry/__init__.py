"""Driver-side region objects and the deterministic region coverer.

These run per-region on the broadcast/driver side (polygon layers are small);
the 10^12-row side only ever sees their *relational images*: exploded
covering rows and vertex arrays consumed by the vectorized kernels.
"""

from s2_geometry_library_java_spark.geometry.interval import R1Interval, S1Interval
from s2_geometry_library_java_spark.geometry.cap import S2Cap
from s2_geometry_library_java_spark.geometry.latlng_rect import S2LatLngRect
from s2_geometry_library_java_spark.geometry.cell import S2Cell
from s2_geometry_library_java_spark.geometry.loop import S2Loop
from s2_geometry_library_java_spark.geometry.polygon import S2Polygon
from s2_geometry_library_java_spark.geometry.cellunion import S2CellUnion
from s2_geometry_library_java_spark.geometry.coverer import S2RegionCoverer
from s2_geometry_library_java_spark.geometry.polyline import S2Polyline
from s2_geometry_library_java_spark.geometry.builder import BuilderOptions, S2PolygonBuilder

__all__ = [
    "S2Polyline",
    "BuilderOptions",
    "S2PolygonBuilder",
    "R1Interval",
    "S1Interval",
    "S2Cap",
    "S2LatLngRect",
    "S2Cell",
    "S2Loop",
    "S2Polygon",
    "S2CellUnion",
    "S2RegionCoverer",
]
