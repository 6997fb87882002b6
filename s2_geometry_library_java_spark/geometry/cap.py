"""S2Cap: spherical cap region (axis + height h = 1 - cos(theta)).

Port of ``S2Cap.java`` — used as the bounding-cap primitive for initial
covering candidates and kNN search discs. Driver-side scalar.
"""

from __future__ import annotations

import math

import numpy as np

from s2_geometry_library_java_spark.geometry.interval import R1Interval, S1Interval, M_PI, M_PI_2, ieee_remainder

ROUND_UP = 1.0 + 1.0 / (1 << 52)


class S2Cap:
    __slots__ = ("axis", "height")

    def __init__(self, axis: np.ndarray, height: float):
        self.axis = np.asarray(axis, dtype=np.float64)
        self.height = float(height)

    @staticmethod
    def from_axis_height(axis: np.ndarray, height: float) -> "S2Cap":
        return S2Cap(axis, height)

    @staticmethod
    def from_axis_angle(axis: np.ndarray, angle_radians: float) -> "S2Cap":
        # h = 2 sin^2(angle/2), more accurate than 1-cos (S2Cap.java:73-81)
        d = math.sin(0.5 * angle_radians)
        return S2Cap(axis, 2 * d * d)

    @staticmethod
    def from_axis_area(axis: np.ndarray, area: float) -> "S2Cap":
        return S2Cap(axis, area / (2 * M_PI))

    @staticmethod
    def empty() -> "S2Cap":
        return S2Cap(np.array([1.0, 0.0, 0.0]), -1.0)

    @staticmethod
    def full() -> "S2Cap":
        return S2Cap(np.array([1.0, 0.0, 0.0]), 2.0)

    def area(self) -> float:
        return 2 * M_PI * max(0.0, self.height)

    def angle(self) -> float:
        """Opening angle in radians; negative for empty caps (S2Cap.java:121-129)."""
        if self.is_empty():
            return -1.0
        return 2 * math.asin(math.sqrt(0.5 * self.height))

    def is_empty(self) -> bool:
        return self.height < 0

    def is_full(self) -> bool:
        return self.height >= 2

    def complement(self) -> "S2Cap":
        c_height = -1.0 if self.is_full() else 2 - max(self.height, 0.0)
        return S2Cap(-self.axis, c_height)

    def contains_cap(self, other: "S2Cap") -> bool:
        if self.is_full() or other.is_empty():
            return True
        return self.angle() >= _angle_between(self.axis, other.axis) + other.angle()

    def interior_intersects(self, other: "S2Cap") -> bool:
        return not self.complement().contains_cap(other)

    def interior_contains_point(self, p: np.ndarray) -> bool:
        d = self.axis - p
        return self.is_full() or float(d @ d) < 2 * self.height

    def contains_point(self, p: np.ndarray) -> bool:
        d = self.axis - p
        return float(d @ d) <= 2 * self.height

    def add_point(self, p: np.ndarray) -> "S2Cap":
        if self.is_empty():
            return S2Cap(p, 0.0)
        d = self.axis - p
        dist2 = float(d @ d)
        return S2Cap(self.axis, max(self.height, ROUND_UP * 0.5 * dist2))

    def add_cap(self, other: "S2Cap") -> "S2Cap":
        if self.is_empty():
            return S2Cap(other.axis, other.height)
        ang = _angle_between(self.axis, other.axis) + other.angle()
        if ang >= M_PI:
            return S2Cap(self.axis, 2.0)
        d = math.sin(0.5 * ang)
        return S2Cap(self.axis, max(self.height, ROUND_UP * 2 * d * d))

    # -- region interface --
    def get_cap_bound(self) -> "S2Cap":
        return self

    def get_rect_bound(self):
        from s2_geometry_library_java_spark.geometry.latlng_rect import S2LatLngRect

        if self.is_empty():
            return S2LatLngRect.empty()
        # S2Cap.java:243-293
        axis_lat = math.atan2(self.axis[2], math.sqrt(self.axis[0] ** 2 + self.axis[1] ** 2))
        axis_lng = math.atan2(self.axis[1], self.axis[0])
        cap_angle = self.angle()
        all_longitudes = False
        lat_lo = axis_lat - cap_angle
        lng = [-M_PI, M_PI]
        if lat_lo <= -M_PI_2:
            lat_lo = -M_PI_2
            all_longitudes = True
        lat_hi = axis_lat + cap_angle
        if lat_hi >= M_PI_2:
            lat_hi = M_PI_2
            all_longitudes = True
        if not all_longitudes:
            sin_a = math.sqrt(self.height * (2 - self.height))
            sin_c = math.cos(axis_lat)
            if sin_a <= sin_c:
                angle_a = math.asin(sin_a / sin_c)
                lng[0] = ieee_remainder(axis_lng - angle_a, 2 * M_PI)
                lng[1] = ieee_remainder(axis_lng + angle_a, 2 * M_PI)
        return S2LatLngRect(R1Interval(lat_lo, lat_hi), S1Interval(lng[0], lng[1]))

    def contains_cell(self, cell) -> bool:
        # S2Cap.java:296-312
        vertices = [cell.get_vertex(k) for k in range(4)]
        for v in vertices:
            if not self.contains_point(v):
                return False
        return not self.complement()._intersects(cell, vertices)

    def may_intersect_cell(self, cell) -> bool:
        # S2Cap.java:315-325
        vertices = [cell.get_vertex(k) for k in range(4)]
        for v in vertices:
            if self.contains_point(v):
                return True
        return self._intersects(cell, vertices)

    def _intersects(self, cell, vertices) -> bool:
        # S2Cap.java:331-382
        if self.height >= 1:
            return False
        if self.is_empty():
            return False
        if cell.contains_point(self.axis):
            return True
        sin2_angle = self.height * (2 - self.height)
        for k in range(4):
            edge = cell.get_edge_raw(k)
            dot = float(self.axis @ edge)
            if dot > 0:
                continue
            if dot * dot > sin2_angle * float(edge @ edge):
                return False
            direction = np.cross(edge, self.axis)
            if float(direction @ vertices[k]) < 0 and float(direction @ vertices[(k + 1) & 3]) > 0:
                return True
        return False

    def approx_equals(self, other: "S2Cap", max_error: float = 1e-14) -> bool:
        return (
            bool(np.all(np.abs(self.axis - other.axis) < max_error)) and abs(self.height - other.height) <= max_error
        ) or (self.is_empty() and other.height <= max_error) or (other.is_empty() and self.height <= max_error) or (
            self.is_full() and other.height >= 2 - max_error
        ) or (other.is_full() and self.height >= 2 - max_error)

    def __repr__(self):
        return f"S2Cap(axis={self.axis}, h={self.height})"


def _angle_between(a: np.ndarray, b: np.ndarray) -> float:
    return math.atan2(float(np.linalg.norm(np.cross(a, b))), float(a @ b))
