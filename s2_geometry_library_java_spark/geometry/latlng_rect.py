"""S2LatLngRect: latitude-longitude rectangle region.

Port of ``S2LatLngRect.java``: interval-product region with exact
curved-edge cell-intersection tests. Driver-side scalar; its relational
image on the Spark side is 4 bbox columns + native filter predicates.
"""

from __future__ import annotations

import math

import numpy as np

from s2_geometry_library_java_spark.geometry.interval import R1Interval, S1Interval, M_PI, M_PI_2, ieee_remainder
from s2_geometry_library_java_spark.kernel import predicates as pr
from s2_geometry_library_java_spark.kernel import cellid as ck


def _latlng_of(p: np.ndarray) -> tuple[float, float]:
    lat = math.atan2(p[2], math.sqrt(p[0] * p[0] + p[1] * p[1]))
    lng = math.atan2(p[1], p[0])
    return lat, lng


def _to_point(lat: float, lng: float) -> np.ndarray:
    cosphi = math.cos(lat)
    return np.array([math.cos(lng) * cosphi, math.sin(lng) * cosphi, math.sin(lat)])


class S2LatLngRect:
    __slots__ = ("lat", "lng")

    def __init__(self, lat: R1Interval, lng: S1Interval):
        self.lat = lat
        self.lng = lng

    @staticmethod
    def empty() -> "S2LatLngRect":
        return S2LatLngRect(R1Interval.empty(), S1Interval.empty())

    @staticmethod
    def full() -> "S2LatLngRect":
        return S2LatLngRect(S2LatLngRect.full_lat(), S1Interval.full())

    @staticmethod
    def full_lat() -> R1Interval:
        return R1Interval(-M_PI_2, M_PI_2)

    @staticmethod
    def from_point(lat: float, lng: float) -> "S2LatLngRect":
        return S2LatLngRect(R1Interval.from_point(lat), S1Interval.from_point(lng))

    @staticmethod
    def from_point_pair(lat1: float, lng1: float, lat2: float, lng2: float) -> "S2LatLngRect":
        return S2LatLngRect(R1Interval.from_point_pair(lat1, lat2), S1Interval.from_point_pair(lng1, lng2))

    @staticmethod
    def from_degrees(lat_lo: float, lng_lo: float, lat_hi: float, lng_hi: float) -> "S2LatLngRect":
        d = math.pi / 180.0
        return S2LatLngRect(R1Interval(lat_lo * d, lat_hi * d), S1Interval(lng_lo * d, lng_hi * d))

    @staticmethod
    def from_center_size(center_lat: float, center_lng: float, size_lat: float, size_lng: float) -> "S2LatLngRect":
        # S2LatLngRect.java:110-118
        return S2LatLngRect.from_point(center_lat, center_lng).expanded(0.5 * size_lat, 0.5 * size_lng)

    def is_valid(self) -> bool:
        # S2LatLngRect.java:137-143
        return (
            abs(self.lat.lo) <= M_PI_2
            and abs(self.lat.hi) <= M_PI_2
            and self.lng.is_valid()
            and self.lat.is_empty() == self.lng.is_empty()
        )

    def is_empty(self) -> bool:
        return self.lat.is_empty()

    def is_full(self) -> bool:
        return self.lat == S2LatLngRect.full_lat() and self.lng.is_full()

    def get_center(self) -> tuple[float, float]:
        return (self.lat.get_center(), self.lng.get_center())

    def get_vertex(self, k: int) -> tuple[float, float]:
        # CCW order (S2LatLngRect.java:198-216)
        if k == 0:
            return (self.lat.lo, self.lng.lo)
        if k == 1:
            return (self.lat.lo, self.lng.hi)
        if k == 2:
            return (self.lat.hi, self.lng.hi)
        return (self.lat.hi, self.lng.lo)

    def contains_latlng(self, lat: float, lng: float) -> bool:
        return self.lat.contains(lat) and self.lng.contains(lng)

    def interior_contains_latlng(self, lat: float, lng: float) -> bool:
        return self.lat.interior_contains(lat) and self.lng.interior_contains(lng)

    def contains_point(self, p: np.ndarray) -> bool:
        lat, lng = _latlng_of(p)
        return self.contains_latlng(lat, lng)

    def contains_rect(self, other: "S2LatLngRect") -> bool:
        return self.lat.contains_interval(other.lat) and self.lng.contains_interval(other.lng)

    def interior_contains_rect(self, other: "S2LatLngRect") -> bool:
        return self.lat.interior_contains_interval(other.lat) and self.lng.interior_contains_interval(other.lng)

    def intersects_rect(self, other: "S2LatLngRect") -> bool:
        return self.lat.intersects(other.lat) and self.lng.intersects(other.lng)

    def interior_intersects_rect(self, other: "S2LatLngRect") -> bool:
        return self.lat.interior_intersects(other.lat) and self.lng.interior_intersects(other.lng)

    def add_point(self, lat: float, lng: float) -> "S2LatLngRect":
        return S2LatLngRect(self.lat.add_point(lat), self.lng.add_point(lng))

    def expanded(self, margin_lat: float, margin_lng: float) -> "S2LatLngRect":
        if self.is_empty():
            return self
        return S2LatLngRect(
            self.lat.expanded(margin_lat).intersection(S2LatLngRect.full_lat()),
            self.lng.expanded(margin_lng),
        )

    def union(self, other: "S2LatLngRect") -> "S2LatLngRect":
        return S2LatLngRect(self.lat.union(other.lat), self.lng.union(other.lng))

    def intersection(self, other: "S2LatLngRect") -> "S2LatLngRect":
        lat = self.lat.intersection(other.lat)
        lng = self.lng.intersection(other.lng)
        if lat.is_empty() or lng.is_empty():
            return S2LatLngRect.empty()
        return S2LatLngRect(lat, lng)

    def convolve_with_cap(self, angle_radians: float) -> "S2LatLngRect":
        from s2_geometry_library_java_spark.geometry.cap import S2Cap

        cap = S2Cap.from_axis_angle(np.array([1.0, 0.0, 0.0]), angle_radians)
        r = self
        for k in range(4):
            lat, lng = self.get_vertex(k)
            vertex_cap = S2Cap(_to_point(lat, lng), cap.height)
            r = r.union(vertex_cap.get_rect_bound())
        return r

    def area(self) -> float:
        if self.is_empty():
            return 0.0
        return self.lng.get_length() * abs(math.sin(self.lat.hi) - math.sin(self.lat.lo))

    # -- region interface --
    def get_rect_bound(self) -> "S2LatLngRect":
        return self

    def get_cap_bound(self):
        from s2_geometry_library_java_spark.geometry.cap import S2Cap
        from s2_geometry_library_java_spark.geometry.interval import ieee_remainder

        if self.is_empty():
            return S2Cap.empty()
        if self.lat.lo + self.lat.hi < 0:
            pole_z, pole_angle = -1.0, M_PI_2 + self.lat.hi
        else:
            pole_z, pole_angle = 1.0, M_PI_2 - self.lat.lo
        pole_cap = S2Cap.from_axis_angle(np.array([0.0, 0.0, pole_z]), pole_angle)
        lng_span = self.lng.hi - self.lng.lo
        if ieee_remainder(lng_span, 2 * M_PI) >= 0 and lng_span < 2 * M_PI:
            clat, clng = self.get_center()
            mid_cap = S2Cap.from_axis_angle(_to_point(clat, clng), 0.0)
            for k in range(4):
                lat, lng = self.get_vertex(k)
                mid_cap = mid_cap.add_point(_to_point(lat, lng))
            if mid_cap.height < pole_cap.height:
                return mid_cap
        return pole_cap

    def contains_cell(self, cell) -> bool:
        # Exact: rect contains cell iff it contains the cell's bound (S2LatLngRect.java:636-641)
        return self.contains_rect(cell.get_rect_bound())

    def may_intersect_cell(self, cell) -> bool:
        return self.intersects_rect(cell.get_rect_bound())

    def intersects_cell(self, cell) -> bool:
        """Exact curved-edge cell intersection (S2LatLngRect.java:384-446)."""
        if self.is_empty():
            return False
        if self.contains_point(cell.get_center()):
            return True
        clat, clng = self.get_center()
        if cell.contains_point(_to_point(clat, clng)):
            return True
        if not self.intersects_rect(cell.get_rect_bound()):
            return False
        cell_v = [cell.get_vertex(i) for i in range(4)]
        cell_ll = [_latlng_of(v) for v in cell_v]
        for ll in cell_ll:
            if self.contains_latlng(*ll):
                return True
        for i in range(4):
            edge_lng = S1Interval.from_point_pair(cell_ll[i][1], cell_ll[(i + 1) & 3][1])
            if not self.lng.intersects(edge_lng):
                continue
            a = cell_v[i]
            b = cell_v[(i + 1) & 3]
            if edge_lng.contains(self.lng.lo) and _intersects_lng_edge(a, b, self.lat, self.lng.lo):
                return True
            if edge_lng.contains(self.lng.hi) and _intersects_lng_edge(a, b, self.lat, self.lng.hi):
                return True
            if _intersects_lat_edge(a, b, self.lat.lo, self.lng):
                return True
            if _intersects_lat_edge(a, b, self.lat.hi, self.lng):
                return True
        return False

    def approx_equals(self, other: "S2LatLngRect", max_error: float = 1e-15) -> bool:
        lat_ok = (
            abs(self.lat.lo - other.lat.lo) <= max_error and abs(self.lat.hi - other.lat.hi) <= max_error
        ) or (self.lat.is_empty() and other.lat.get_length() <= max_error)
        return lat_ok and self.lng.approx_equals(other.lng, max_error)

    def __eq__(self, other):
        return isinstance(other, S2LatLngRect) and self.lat == other.lat and self.lng == other.lng

    def __repr__(self):
        return f"S2LatLngRect(lat={self.lat}, lng={self.lng})"


def _intersects_lng_edge(a: np.ndarray, b: np.ndarray, lat: R1Interval, lng: float) -> bool:
    # S2LatLngRect.java:663-673
    return bool(
        pr.simple_crossing(a, b, _to_point(lat.lo, lng), _to_point(lat.hi, lng))
    )


def _intersects_lat_edge(a: np.ndarray, b: np.ndarray, lat: float, lng: S1Interval) -> bool:
    # S2LatLngRect.java:676-733
    z = pr.robust_cross_prod(a, b)
    z = z / np.linalg.norm(z)
    if z[2] < 0:
        z = -z
    y = pr.robust_cross_prod(z, np.array([0.0, 0.0, 1.0]))
    y = y / np.linalg.norm(y)
    x = np.cross(y, z)
    sin_lat = math.sin(lat)
    if abs(sin_lat) >= x[2]:
        return False
    cos_theta = sin_lat / x[2]
    sin_theta = math.sqrt(1 - cos_theta * cos_theta)
    theta = math.atan2(sin_theta, cos_theta)
    ab_theta = S1Interval.from_point_pair(
        math.atan2(float(a @ y), float(a @ x)), math.atan2(float(b @ y), float(b @ x))
    )
    if ab_theta.contains(theta):
        isect = x * cos_theta + y * sin_theta
        if lng.contains(math.atan2(isect[1], isect[0])):
            return True
    if ab_theta.contains(-theta):
        isect = x * cos_theta - y * sin_theta
        if lng.contains(math.atan2(isect[1], isect[0])):
            return True
    return False


def _ll_to_point(lat: float, lng: float) -> "np.ndarray":
    return ck.latlng_radians_to_xyz(np.array([lat]), np.array([lng]))[0]


def rect_point_distance(rect: S2LatLngRect, lat: float, lng: float) -> float:
    """Min surface distance rect<->point in radians
    (S2LatLngRect.getDistance(S2LatLng), S2LatLngRect.java:227-251)."""
    assert not rect.is_empty()
    if rect.lng.contains(lng):
        return max(0.0, max(lat - rect.lat.hi, rect.lat.lo - lat))
    interval = S1Interval(rect.lng.hi, rect.lng.complement().get_center())
    a_lng = rect.lng.lo
    if interval.contains(lng):
        a_lng = rect.lng.hi
    lo = _ll_to_point(rect.lat.lo, a_lng)
    hi = _ll_to_point(rect.lat.hi, a_lng)
    lo_cross_hi = _ll_to_point(0.0, ieee_remainder(a_lng - M_PI_2, 2 * M_PI))
    p = _ll_to_point(lat, lng)
    return float(pr.edge_distance(p[None, :], lo[None, :], hi[None, :], lo_cross_hi[None, :])[0])


def rect_rect_distance(a: S2LatLngRect, b: S2LatLngRect) -> float:
    """Min surface distance between rects in radians
    (S2LatLngRect.getDistance(S2LatLngRect), S2LatLngRect.java:253-317)."""
    assert not a.is_empty() and not b.is_empty()
    if a.lng.intersects(b.lng):
        if a.lat.intersects(b.lat):
            return 0.0
        if a.lat.lo > b.lat.hi:
            lo, hi = b.lat.hi, a.lat.lo
        else:
            lo, hi = a.lat.hi, b.lat.lo
        return hi - lo

    lo_hi = S1Interval.from_point_pair(a.lng.lo, b.lng.hi)
    hi_lo = S1Interval.from_point_pair(a.lng.hi, b.lng.lo)
    if lo_hi.get_length() < hi_lo.get_length():
        a_lng, b_lng = a.lng.lo, b.lng.hi
    else:
        a_lng, b_lng = a.lng.hi, b.lng.lo

    a_lo = _ll_to_point(a.lat.lo, a_lng)
    a_hi = _ll_to_point(a.lat.hi, a_lng)
    a_cross = _ll_to_point(0.0, ieee_remainder(a_lng - M_PI_2, 2 * M_PI))
    b_lo = _ll_to_point(b.lat.lo, b_lng)
    b_hi = _ll_to_point(b.lat.hi, b_lng)
    b_cross = _ll_to_point(0.0, ieee_remainder(b_lng - M_PI_2, 2 * M_PI))

    def dist(x, u, v, ucv):
        return float(pr.edge_distance(x[None, :], u[None, :], v[None, :], ucv[None, :])[0])

    return min(
        dist(a_lo, b_lo, b_hi, b_cross),
        dist(a_hi, b_lo, b_hi, b_cross),
        dist(b_lo, a_lo, a_hi, a_cross),
        dist(b_hi, a_lo, a_hi, a_cross),
    )
