"""S2Polyline: open vertex chain on the sphere.

Capability parity with ``S2Polyline.java`` (273 LoC): arclength,
arc-length interpolation (S2Polyline.java:115-140), RectBounder bound
(:153-160), vertex/edge-crossing mayIntersect (:178-206), nearest edge and
projection (:213-249).  Vectorized where the math is columnar (distances via
the P9 kernel); contains(cell) is intentionally unsupported exactly like the
reference (:167-175).
"""

from __future__ import annotations

import math

import numpy as np

from s2_geometry_library_java_spark.kernel import predicates as pr
from s2_geometry_library_java_spark.geometry.loop import RectBounder


class S2Polyline:
    def __init__(self, vertices: np.ndarray):
        self.vertices = np.asarray(vertices, dtype=np.float64)
        self.n = self.vertices.shape[0]

    @staticmethod
    def is_valid_vertices(vertices: np.ndarray) -> bool:
        """Unit-length vertices; adjacent pairs not identical/antipodal
        (S2Polyline.java:66-86)."""
        v = np.asarray(vertices, dtype=np.float64)
        if not np.allclose(np.sum(v * v, axis=1), 1.0, atol=1e-15):
            return False
        if v.shape[0] > 1:
            same = np.all(v[:-1] == v[1:], axis=1)
            anti = np.all(v[:-1] == -v[1:], axis=1)
            if same.any() or anti.any():
                return False
        return True

    def num_vertices(self) -> int:
        return self.n

    def vertex(self, k: int) -> np.ndarray:
        return self.vertices[k]

    def _edge_lengths(self) -> np.ndarray:
        return pr.angle(self.vertices[:-1], self.vertices[1:])

    def get_arclength_angle(self) -> float:
        """Total arclength in radians (S2Polyline.java:101-107)."""
        return float(np.sum(self._edge_lengths())) if self.n > 1 else 0.0

    def interpolate(self, fraction: float) -> np.ndarray:
        """Point at the given arc-length fraction, clamped
        (S2Polyline.java:115-140); slerp within the containing edge."""
        if fraction <= 0:
            return self.vertices[0]
        lengths = self._edge_lengths()
        target = fraction * float(np.sum(lengths))
        for i in range(self.n - 1):
            length = float(lengths[i])
            if target < length:
                f = math.sin(target) / math.sin(length)
                return (math.cos(target) - f * math.cos(length)) * self.vertices[i] + f * self.vertices[i + 1]
            target -= length
        return self.vertices[self.n - 1]

    # ------------------------------------------------------------------
    # Region interface
    def get_rect_bound(self):
        bounder = RectBounder()
        for i in range(self.n):
            bounder.add_point(self.vertices[i])
        return bounder.bound

    def get_cap_bound(self):
        return self.get_rect_bound().get_cap_bound()

    def contains_cell(self, cell) -> bool:
        raise NotImplementedError(
            "containment is not numerically well-defined except at the "
            "polyline vertices (S2Polyline.java:167-175)"
        )

    def may_intersect_cell(self, cell) -> bool:
        # S2Polyline.mayIntersect (S2Polyline.java:178-206)
        if self.n == 0:
            return False
        for i in range(self.n):
            if cell.contains_point(self.vertices[i]):
                return True
        cell_vertices = cell.get_vertices()
        for j in range(4):
            a = cell_vertices[j][None, :]
            b = cell_vertices[(j + 1) & 3][None, :]
            crossings = pr.robust_crossing(a, b, self.vertices[:-1], self.vertices[1:])
            if (crossings >= 0).any():
                return True
        return False

    # ------------------------------------------------------------------
    def get_nearest_edge_index(self, point: np.ndarray) -> int:
        """Index of the closest edge's start vertex (S2Polyline.java:213-233),
        vectorized over all edges with the P9 distance kernel."""
        if self.n == 0:
            raise ValueError("Empty polyline")
        if self.n == 1:
            return 0
        d = pr.edge_distance(point[None, :], self.vertices[:-1], self.vertices[1:])
        return int(np.argmin(d))

    def project_to_edge(self, point: np.ndarray, index: int) -> np.ndarray:
        """Closest point on edge ``index`` to ``point`` (S2Polyline.java:240-249)."""
        if self.n == 0:
            raise ValueError("Empty polyline")
        if self.n == 1:
            return self.vertices[0]
        return pr.closest_point_on_edge(
            point[None, :], self.vertices[index][None, :], self.vertices[index + 1][None, :]
        )[0]

    def project(self, point: np.ndarray) -> np.ndarray:
        return self.project_to_edge(point, self.get_nearest_edge_index(point))

    def get_distance(self, point: np.ndarray) -> float:
        d = pr.edge_distance(point[None, :], self.vertices[:-1], self.vertices[1:])
        return float(d.min())

    def __repr__(self):
        return f"S2Polyline({self.n} vertices)"
