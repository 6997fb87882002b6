"""S2Loop: simple spherical polygon loop (region to the LEFT of the vertex chain).

Port of ``S2Loop.java``: origin-inside bit + edge-crossing-parity containment
(S2Loop.java:624-654, 814-837), RectBounder lat/lng bound with pole fixes
(S2EdgeUtil.java:163-229, S2Loop.java:839-865), and the loop-relation tests
used by coverer oracles (S2Loop.java:388-545). Driver-side; point containment
for row batches goes through the vectorized parity kernel.
"""

from __future__ import annotations

import math

import numpy as np

from s2_geometry_library_java_spark.kernel import predicates as pr
from s2_geometry_library_java_spark.kernel import cellid as ck
from s2_geometry_library_java_spark.geometry.interval import R1Interval, S1Interval, M_PI_2
from s2_geometry_library_java_spark.geometry.latlng_rect import S2LatLngRect, _latlng_of


class RectBounder:
    """Exact lat/lng bound of a vertex chain (S2EdgeUtil.java:163-229)."""

    def __init__(self):
        self.bound = S2LatLngRect.empty()
        self._a = None
        self._a_latlng = None

    def add_point(self, b: np.ndarray) -> None:
        b_latlng = _latlng_of(b)
        if self.bound.is_empty():
            self.bound = self.bound.add_point(*b_latlng)
        else:
            self.bound = self.bound.union(
                S2LatLngRect.from_point_pair(self._a_latlng[0], self._a_latlng[1], b_latlng[0], b_latlng[1])
            )
            a_cross_b = pr.robust_cross_prod(self._a, b)
            direction = np.cross(a_cross_b, np.array([0.0, 0.0, 1.0]))
            da = float(direction @ self._a)
            db = float(direction @ b)
            if da * db < 0:
                # Min/max latitude occurs in the edge interior.
                abs_lat = math.acos(abs(a_cross_b[2] / np.linalg.norm(a_cross_b)))
                lat = self.bound.lat
                if da < 0:
                    lat = R1Interval(lat.lo, max(abs_lat, lat.hi))
                else:
                    lat = R1Interval(min(-abs_lat, lat.lo), lat.hi)
                self.bound = S2LatLngRect(lat, self.bound.lng)
        self._a = b
        self._a_latlng = b_latlng


class S2Loop:
    def __init__(self, vertices: np.ndarray, _skip_init: bool = False):
        """vertices: (n,3) unit vectors, CCW for a shell. n >= 3."""
        self.vertices = np.asarray(vertices, dtype=np.float64)
        self.n = self.vertices.shape[0]
        self.depth = 0
        self.bound = S2LatLngRect.full()
        self._edge_index = None  # lazy I5 index, built on first large batch
        if not _skip_init:
            self._init_origin()
            self._init_bound()

    @staticmethod
    def from_cell(cell) -> "S2Loop":
        # S2Loop(S2Cell) (S2Loop.java:111-125): 4 cell vertices; bound from cell.
        loop = S2Loop(cell.get_vertices(), _skip_init=True)
        loop.bound = cell.get_rect_bound()
        # Origin containment computed the same way as the normal constructor.
        loop._init_origin()
        return loop

    def vertex(self, i: int) -> np.ndarray:
        return self.vertices[i - self.n if i >= self.n else i]

    def sign(self) -> int:
        return -1 if self.is_hole() else 1

    def is_hole(self) -> bool:
        return (self.depth & 1) != 0

    # ------------------------------------------------------------------
    def _init_origin(self) -> None:
        # S2Loop.initOrigin (S2Loop.java:814-837)
        self.origin_inside = False
        v1_inside = bool(
            pr.ordered_ccw(pr.ortho_scalar(self.vertex(1)), self.vertex(0), self.vertex(2), self.vertex(1))
        )
        if v1_inside != self.contains_point(self.vertex(1)):
            self.origin_inside = True

    def _init_bound(self) -> None:
        # S2Loop.initBound (S2Loop.java:839-865)
        bounder = RectBounder()
        for i in range(self.n + 1):
            bounder.add_point(self.vertex(i))
        b = bounder.bound
        self.bound = S2LatLngRect.full()
        if self.contains_point(np.array([0.0, 0.0, 1.0])):
            b = S2LatLngRect(R1Interval(b.lat.lo, M_PI_2), S1Interval.full())
        if b.lng.is_full() and self.contains_point(np.array([0.0, 0.0, -1.0])):
            b = S2LatLngRect(R1Interval(-M_PI_2, b.lat.hi), b.lng)
        self.bound = b

    # ------------------------------------------------------------------
    def contains_point(self, p: np.ndarray) -> bool:
        if not self.bound.contains_point(p):
            return False
        parity = pr.loop_crossing_parity(self.vertices, p[None, :])[0]
        return bool(self.origin_inside ^ parity)

    def contains_points(self, pts: np.ndarray) -> np.ndarray:
        """Vectorized batch containment: bound prefilter + parity kernel.

        I5 cutover (S2Loop.java:681-702): above MAX_BRUTE_FORCE_VERTICES the
        O(points x edges) dense kernel switches to the lazy cell-keyed edge
        index, testing only edges whose covering cells meet each query
        segment — identical results, per-point cost ~ local edge density."""
        pts = np.asarray(pts, dtype=np.float64)
        out = np.zeros(pts.shape[0], dtype=bool)
        lat = np.arctan2(pts[:, 2], np.sqrt(pts[:, 0] ** 2 + pts[:, 1] ** 2))
        lng = np.arctan2(pts[:, 1], pts[:, 0])
        in_bound = _rect_contains_vec(self.bound, lat, lng)
        if in_bound.any():
            from s2_geometry_library_java_spark.geometry import loop_index as li

            if self.n >= li.MAX_BRUTE_FORCE_VERTICES:
                if self._edge_index is None:
                    self._edge_index = li.LoopEdgeIndex(self.vertices)
                parity = li.sparse_crossing_parity(self.vertices, pts[in_bound], self._edge_index)
            else:
                parity = pr.loop_crossing_parity(self.vertices, pts[in_bound])
            out[in_bound] = self.origin_inside ^ parity
        return out

    def get_distance(self, p: np.ndarray) -> float:
        # S2Loop.getDistance (S2Loop.java:661-672)
        pn = p / np.linalg.norm(p)
        d = pr.edge_distance(pn[None, :], self.vertices, np.roll(self.vertices, -1, axis=0))
        return float(d.min())

    def get_area(self) -> float:
        return self.get_area_centroid(False)[0]

    def get_area_centroid(self, do_centroid: bool = True):
        # S2Loop.getAreaCentroid (S2Loop.java:281-342)
        if self.n < 3:
            return 0.0, None
        origin = self.vertex(0)
        axis = (int(np.argmax(np.abs(origin))) + 1) % 3
        # Reference tie-break: largestAbsComponent prefers z on ties; replicate.
        ax, ay, az = abs(origin[0]), abs(origin[1]), abs(origin[2])
        k = 0 if (ax > ay and ax > az) else (1 if ay > az else 2)
        axis = (k + 1) % 3
        displaced = origin.copy()
        displaced[axis] = origin[axis] + math.e * 1e-10
        origin = displaced / np.linalg.norm(displaced)

        v0 = self.vertices
        v1 = np.roll(self.vertices, -1, axis=0)
        areas = pr.signed_area(origin[None, :], v0, v1)
        area_sum = float(np.sum(areas))
        centroid = None
        if do_centroid:
            centroid = pr.true_centroid(origin[None, :], v0, v1).sum(axis=0)
        if area_sum < 0:
            area_sum += 4 * math.pi
        return area_sum, centroid

    def is_valid(self) -> bool:
        """S2Loop.isValid (S2Loop.java:705-787)."""
        return loop_is_valid(self.vertices)

    def is_normalized(self) -> bool:
        return self.get_area() <= 2 * math.pi + 1e-14

    def invert(self) -> None:
        # S2Loop.invert (S2Loop.java:259-278)
        self.vertices = self.vertices[::-1].copy()
        self._edge_index = None  # edge order changed; lazy index is stale
        self.origin_inside ^= True
        if self.bound.lat.lo > -M_PI_2 and self.bound.lat.hi < M_PI_2:
            self.bound = S2LatLngRect.full()
        else:
            self._init_bound()

    def normalize(self) -> None:
        if not self.is_normalized():
            self.invert()

    # ------------------------------------------------------------------
    # Loop relations (S2Loop.java:388-545) — brute-force edge-crossing scan
    # (the reference's lazy S2EdgeIndex only changes performance, not results;
    # broadcast-side loops are small).
    def _find_vertex(self, p: np.ndarray) -> int:
        # S2Loop.findVertex (S2Loop.java:872-886): maps vertex(i) for i=1..n,
        # so vertices[0] -> n and duplicate points take the largest index.
        eq = np.all(self.vertices == p[None, :], axis=1)
        idx = np.flatnonzero(eq)
        if not idx.size:
            return -1
        mapped = [self.n if j == 0 else int(j) for j in idx]
        return max(mapped)

    def _check_edge_crossings(self, b: "S2Loop", relation) -> int:
        # S2Loop.checkEdgeCrossings (S2Loop.java:898-930), brute force over
        # all edge pairs with the crossing computed vectorized per b-edge.
        result = 1
        a0 = self.vertices
        a1 = np.roll(self.vertices, -1, axis=0)
        for j in range(b.n):
            bj = b.vertex(j)
            bj1 = b.vertex(j + 1)
            crossings = pr.robust_crossing(bj[None, :], bj1[None, :], a0, a1)
            if (crossings > 0).any():
                return -1
            for i in np.flatnonzero(crossings == 0):
                if np.array_equal(self.vertex(int(i) + 1), bj1):
                    result = min(
                        result,
                        relation(self.vertex(int(i)), self.vertex(int(i) + 1), self.vertex(int(i) + 2),
                                 b.vertex(j), b.vertex(j + 2)),
                    )
                    if result < 0:
                        return result
        return result

    def contains_loop(self, b: "S2Loop") -> bool:
        # S2Loop.contains (S2Loop.java:388-432)
        if not self.bound.contains_rect(b.bound):
            return False
        if not self.contains_point(b.vertex(0)) and self._find_vertex(b.vertex(0)) < 0:
            return False
        if self._check_edge_crossings(b, _wedge_contains) <= 0:
            return False
        if self.bound.union(b.bound).is_full():
            if b.contains_point(self.vertex(0)) and b._find_vertex(self.vertex(0)) < 0:
                return False
        return True

    def intersects_loop(self, b: "S2Loop") -> bool:
        # S2Loop.intersects (S2Loop.java:438-480)
        if not self.bound.intersects_rect(b.bound):
            return False
        if b.bound.lng.get_length() > self.bound.lng.get_length():
            return b.intersects_loop(self)
        if self.contains_point(b.vertex(0)) and self._find_vertex(b.vertex(0)) < 0:
            return True
        if self._check_edge_crossings(b, _wedge_intersects) < 0:
            return True
        if b.bound.contains_rect(self.bound):
            if b.contains_point(self.vertex(0)) and b._find_vertex(self.vertex(0)) < 0:
                return True
        return False

    def contains_nested(self, b: "S2Loop") -> bool:
        # S2Loop.containsNested (S2Loop.java:486-502)
        if not self.bound.contains_rect(b.bound):
            return False
        m = self._find_vertex(b.vertex(1))
        if m < 0:
            return self.contains_point(b.vertex(1))
        return _wedge_contains(self.vertex(m - 1), self.vertex(m), self.vertex(m + 1), b.vertex(0), b.vertex(2)) > 0

    def contains_or_crosses(self, b: "S2Loop") -> int:
        # S2Loop.containsOrCrosses (S2Loop.java:510-545)
        if not self.bound.intersects_rect(b.bound):
            return 0
        result = self._check_edge_crossings(b, _wedge_contains_or_crosses)
        if result <= 0:
            return result
        if not self.bound.contains_rect(b.bound):
            return 0
        if not self.contains_point(b.vertex(0)) and self._find_vertex(b.vertex(0)) < 0:
            return 0
        return 1

    # ------------------------------------------------------------------
    # Region interface
    def get_rect_bound(self) -> S2LatLngRect:
        return self.bound

    def get_cap_bound(self):
        return self.bound.get_cap_bound()

    def contains_cell(self, cell) -> bool:
        # S2Loop.contains(S2Cell) (S2Loop.java:590-601)
        cell_bound = cell.get_rect_bound()
        if not self.bound.contains_rect(cell_bound):
            return False
        cell_loop = S2Loop.from_cell(cell)
        return self.contains_loop(cell_loop)

    def may_intersect_cell(self, cell) -> bool:
        # S2Loop.mayIntersect (S2Loop.java:609-619)
        cell_bound = cell.get_rect_bound()
        if not self.bound.intersects_rect(cell_bound):
            return False
        return S2Loop.from_cell(cell).intersects_loop(self)

    def __repr__(self):
        return f"S2Loop({self.n} vertices, depth={self.depth})"


def _rect_contains_vec(rect: S2LatLngRect, lat: np.ndarray, lng: np.ndarray) -> np.ndarray:
    """Vectorized S2LatLngRect.contains(S2LatLng) over arrays."""
    lat_ok = (lat >= rect.lat.lo) & (lat <= rect.lat.hi)
    lo, hi = rect.lng.lo, rect.lng.hi
    lng_n = np.where(lng == -np.pi, np.pi, lng)
    if rect.lng.is_inverted():
        lng_ok = ((lng_n >= lo) | (lng_n <= hi)) & ~np.bool_(rect.lng.is_empty())
    else:
        lng_ok = (lng_n >= lo) & (lng_n <= hi)
    return lat_ok & lng_ok


# Wedge relations (S2EdgeUtil.java:379-490)
def _wedge_contains(a0, ab1, a2, b0, b2) -> int:
    return 1 if (pr.ordered_ccw(a2, b2, b0, ab1) and pr.ordered_ccw(b0, a0, a2, ab1)) else 0


def _wedge_intersects(a0, ab1, a2, b0, b2) -> int:
    return 0 if (pr.ordered_ccw(a0, b2, b0, ab1) and pr.ordered_ccw(b0, a2, a0, ab1)) else -1


def _wedge_contains_or_crosses(a0, ab1, a2, b0, b2) -> int:
    if pr.ordered_ccw(a0, a2, b2, ab1):
        if pr.ordered_ccw(b2, b0, a0, ab1):
            return 1
        return 0 if np.array_equal(a2, b2) else -1
    return 0 if pr.ordered_ccw(a0, b0, a2, ab1) else -1


def _wedge_contains_or_intersects(a0, ab1, a2, b0, b2) -> int:
    """+1 if A contains B, 0 if disjoint, -1 if A intersects but does not
    contain B — the 4th wedge relation (S2EdgeUtil.java:461-487,
    WedgeContainsOrIntersects): distinguishes case 1 (contains), case 3
    (disjoint), and cases 2/4/5/6 (intersects-not-contains)."""
    if pr.ordered_ccw(a0, a2, b2, ab1):
        # case 1, 5, or 6 — or case 2 if a2 == b2
        return 1 if pr.ordered_ccw(b2, b0, a0, ab1) else -1
    if not pr.ordered_ccw(a2, b0, b2, ab1):
        return 0  # case 3 (disjoint)
    # case 2 or 4 — or case 3 if a2 == b0
    return 0 if np.array_equal(a2, b0) else -1


MAX_INTERSECTION_ERROR = 1e-15  # S2Loop.java:53


def loop_is_valid(vertices: np.ndarray) -> bool:
    """Port of S2Loop.isValid (S2Loop.java:705-787): >=3 unit-length
    distinct vertices, no non-adjacent edge crossings — vectorized edge
    sweep with the reference's nearly-colinear workaround."""
    v = np.asarray(vertices, dtype=np.float64)
    n = v.shape[0]
    if n < 3:
        return False
    if not np.allclose(np.sum(v * v, axis=1), 1.0, atol=1e-14):
        return False
    if len({tuple(p) for p in v}) != n:
        return False
    vnext = np.roll(v, -1, axis=0)
    for a1 in range(n):
        a2 = (a1 + 1) % n
        crossings = pr.robust_crossing(v[a1][None, :], vnext[a1][None, :], v, vnext)
        for b1 in np.flatnonzero(crossings > 0):
            b2 = (int(b1) + 1) % n
            if a1 in (int(b1), b2) or a2 == int(b1):
                continue
            # Ignore nearly-colinear quadruples (S2Loop.java:752-762).
            abc = _corner_angle(v, a1, a2, int(b1))
            abd = _corner_angle(v, a1, a2, b2)
            near = lambda x: abs(x) <= MAX_INTERSECTION_ERROR or abs(x - math.pi) <= MAX_INTERSECTION_ERROR
            if near(abc) and near(abd):
                continue
            return False
    return True


def _corner_angle(v: np.ndarray, i: int, j: int, k: int) -> float:
    """S2.angle(v[i], v[j], v[k]): angle at vertex j."""
    a = np.cross(v[i], v[j])
    b = np.cross(v[k], v[j])
    return float(pr.angle(a[None, :], b[None, :])[0])

