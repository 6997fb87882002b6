"""The reference's "lat:lng, lat:lng" loop/polygon DSL.

Port of GeometryTestCase.parseVertices/makeLoop/makePolygon
(``tests/.../GeometryTestCase.java:165-210``) — also the input format for
polygon-layer definitions in the engine's pipeline configs.
"""

from __future__ import annotations

import numpy as np

from s2_geometry_library_java_spark.kernel import cellid as ck
from s2_geometry_library_java_spark.geometry.loop import S2Loop
from s2_geometry_library_java_spark.geometry.polygon import S2Polygon


def parse_vertices(s: str) -> np.ndarray:
    """Parse "lat:lng, lat:lng, ..." (degrees) into an (n,3) unit-vector array."""
    lats, lngs = [], []
    for token in s.split(","):
        token = token.strip()
        if not token:
            continue
        lat_s, lng_s = token.split(":")
        lats.append(float(lat_s))
        lngs.append(float(lng_s))
    return ck.latlng_degrees_to_xyz(np.array(lats), np.array(lngs))


def make_point(s: str) -> np.ndarray:
    pts = parse_vertices(s)
    assert pts.shape[0] == 1
    return pts[0]


def make_loop(s: str) -> S2Loop:
    return S2Loop(parse_vertices(s))


def make_polygon(s: str) -> S2Polygon:
    """Semicolon-separated loops; each is normalized (area <= 2*pi) first."""
    loops = []
    for token in s.split(";"):
        token = token.strip()
        if not token:
            continue
        loop = make_loop(token)
        loop.normalize()
        loops.append(loop)
    return S2Polygon(loops)
