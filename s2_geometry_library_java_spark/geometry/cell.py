"""S2Cell: a cell id with cached (face, level, orientation, uv-bounds).

Port of ``S2Cell.java`` — the geometric view of a cell id used by region
contains/mayIntersect oracles during covering generation. Driver-side scalar.
"""

from __future__ import annotations

import math

import numpy as np

from s2_geometry_library_java_spark.kernel import cellid as ck
from s2_geometry_library_java_spark.kernel import metrics
from s2_geometry_library_java_spark.geometry.interval import R1Interval, S1Interval, M_PI, M_PI_2

M_PI_4 = math.pi / 4.0
MAX_CELL_SIZE = 1 << ck.MAX_LEVEL
# S2Cell.java:292-299
MAX_ERROR = 1.0 / (1 << 51)
POLE_MIN_LAT = math.asin(math.sqrt(1.0 / 3.0)) - MAX_ERROR

# getUNorm/getVNorm coefficient views (S2Projections.java:342-374):
# u_norm(face, u) and v_norm(face, v) as base + scale tables.
_U_NORM = {
    0: lambda u: np.array([u, -1.0, 0.0]),
    1: lambda u: np.array([1.0, u, 0.0]),
    2: lambda u: np.array([1.0, 0.0, u]),
    3: lambda u: np.array([-u, 0.0, 1.0]),
    4: lambda u: np.array([0.0, -u, 1.0]),
    5: lambda u: np.array([0.0, -1.0, -u]),
}
_V_NORM = {
    0: lambda v: np.array([-v, 0.0, 1.0]),
    1: lambda v: np.array([0.0, -v, 1.0]),
    2: lambda v: np.array([0.0, -1.0, -v]),
    3: lambda v: np.array([v, -1.0, 0.0]),
    4: lambda v: np.array([1.0, v, 0.0]),
    5: lambda v: np.array([1.0, 0.0, v]),
}


def _st_to_uv(s: float) -> float:
    return float(ck.st_to_uv(np.array([s]))[0])


class S2Cell:
    __slots__ = ("id", "face", "level", "orientation", "uv")

    def __init__(self, cell_id: int | np.uint64 | None = None):
        if cell_id is not None:
            self._init(np.uint64(cell_id))

    @staticmethod
    def from_face_pos_level(face: int, pos: int, level: int) -> "S2Cell":
        return S2Cell(int(ck.from_face_pos_level(face, pos, level)[0]))

    @staticmethod
    def from_point(p: np.ndarray) -> "S2Cell":
        return S2Cell(int(ck.from_xyz(p[None, :])[0]))

    def _init(self, cid: np.uint64) -> None:
        self.id = cid
        arr = np.array([cid], dtype=np.uint64)
        f, i, j, orient = ck.to_face_ij_orientation(arr, want_orientation=True)
        self.face = int(f[0])
        self.orientation = int(orient[0])
        self.level = int(ck.level(arr)[0])
        cell_size = 1 << (ck.MAX_LEVEL - self.level)
        self.uv = np.empty((2, 2), dtype=np.float64)
        for d, ij in enumerate((int(i[0]), int(j[0]))):
            sij_lo = (ij & -cell_size) * 2 - MAX_CELL_SIZE
            sij_hi = sij_lo + cell_size * 2
            self.uv[d][0] = _st_to_uv((1.0 / MAX_CELL_SIZE) * sij_lo)
            self.uv[d][1] = _st_to_uv((1.0 / MAX_CELL_SIZE) * sij_hi)

    def is_leaf(self) -> bool:
        return self.level == ck.MAX_LEVEL

    def get_vertex_raw(self, k: int) -> np.ndarray:
        # SW, SE, NE, NW (S2Cell.java:94-97)
        u = self.uv[0][(k >> 1) ^ (k & 1)]
        v = self.uv[1][k >> 1]
        return ck.face_uv_to_xyz(np.array([self.face]), np.array([u]), np.array([v]))[0]

    def get_vertex(self, k: int) -> np.ndarray:
        v = self.get_vertex_raw(k)
        return v / np.linalg.norm(v)

    def get_vertices(self) -> np.ndarray:
        """(4,3) normalized vertices in CCW order."""
        return np.stack([self.get_vertex(k) for k in range(4)])

    def get_edge_raw(self, k: int) -> np.ndarray:
        # Inward-facing edge normals (S2Cell.java:103-114)
        if k == 0:
            return _V_NORM[self.face](self.uv[1][0])  # South
        if k == 1:
            return _U_NORM[self.face](self.uv[0][1])  # East
        if k == 2:
            return -_V_NORM[self.face](self.uv[1][1])  # North
        return -_U_NORM[self.face](self.uv[0][0])  # West

    def subdivide(self) -> list["S2Cell"]:
        """Four children in traversal order (S2Cell.java:130-158)."""
        if ck.is_leaf(np.array([self.id]))[0]:
            raise ValueError("cannot subdivide a leaf cell")
        uv_mid = self.get_center_uv()
        children = []
        cid = ck.child_begin(np.array([self.id], dtype=np.uint64))
        for pos in range(4):
            child = S2Cell()
            child.face = self.face
            child.level = self.level + 1
            child.orientation = self.orientation ^ int(ck.POS_TO_ORIENTATION[pos])
            child.id = cid[0]
            ij = int(ck.POS_TO_IJ[self.orientation][pos])
            child.uv = np.empty((2, 2), dtype=np.float64)
            for d in range(2):
                m = 1 - ((ij >> (1 - d)) & 1)
                child.uv[d][m] = uv_mid[d]
                child.uv[d][1 - m] = self.uv[d][1 - m]
            children.append(child)
            cid = ck.next_id(cid)
        return children

    def get_center_uv(self) -> tuple[float, float]:
        arr = np.array([self.id], dtype=np.uint64)
        _, i, j, _ = ck.to_face_ij_orientation(arr)
        cell_size = 1 << (ck.MAX_LEVEL - self.level)
        si = (int(i[0]) & -cell_size) * 2 + cell_size - MAX_CELL_SIZE
        sj = (int(j[0]) & -cell_size) * 2 + cell_size - MAX_CELL_SIZE
        return (_st_to_uv((1.0 / MAX_CELL_SIZE) * si), _st_to_uv((1.0 / MAX_CELL_SIZE) * sj))

    def get_center_raw(self) -> np.ndarray:
        return ck.to_point_raw(np.array([self.id], dtype=np.uint64))[0]

    def get_center(self) -> np.ndarray:
        c = self.get_center_raw()
        return c / np.linalg.norm(c)

    # -- areas (S2Cell.java:200-252) --
    def average_area(self) -> float:
        return metrics.AVG_AREA.get_value(self.level)

    def approx_area(self) -> float:
        if self.level < 2:
            return self.average_area()
        v = [self.get_vertex(k) for k in range(4)]
        flat_area = 0.5 * np.linalg.norm(np.cross(v[2] - v[0], v[3] - v[1]))
        return float(flat_area * 2 / (1 + math.sqrt(1 - min((1.0 / math.pi) * flat_area, 1.0))))

    def exact_area(self) -> float:
        from s2_geometry_library_java_spark.kernel import predicates as pr

        v = [self.get_vertex(k) for k in range(4)]
        return float(pr.area(v[0], v[1], v[2]) + pr.area(v[0], v[2], v[3]))

    # -- region interface --
    def get_cap_bound(self):
        from s2_geometry_library_java_spark.geometry.cap import S2Cap

        u = 0.5 * (self.uv[0][0] + self.uv[0][1])
        v = 0.5 * (self.uv[1][0] + self.uv[1][1])
        axis = ck.face_uv_to_xyz(np.array([self.face]), np.array([u]), np.array([v]))[0]
        axis = axis / np.linalg.norm(axis)
        cap = S2Cap(axis, 0.0)
        for k in range(4):
            cap = cap.add_point(self.get_vertex(k))
        return cap

    def get_rect_bound(self):
        from s2_geometry_library_java_spark.geometry.latlng_rect import S2LatLngRect

        if self.level > 0:
            # S2Cell.java:303-330
            u = self.uv[0][0] + self.uv[0][1]
            v = self.uv[1][0] + self.uv[1][1]
            i = (1 if u < 0 else 0) if ck.FACE_U_AXES[self.face][2] == 0 else (1 if u > 0 else 0)
            j = (1 if v < 0 else 0) if ck.FACE_V_AXES[self.face][2] == 0 else (1 if v > 0 else 0)
            lat = R1Interval.from_point_pair(self._get_latitude(i, j), self._get_latitude(1 - i, 1 - j))
            lat = lat.expanded(MAX_ERROR).intersection(S2LatLngRect.full_lat())
            if lat.lo == -M_PI_2 or lat.hi == M_PI_2:
                return S2LatLngRect(lat, S1Interval.full())
            lng = S1Interval.from_point_pair(self._get_longitude(i, 1 - j), self._get_longitude(1 - i, j))
            return S2LatLngRect(lat, lng.expanded(MAX_ERROR))
        # Face cells (S2Cell.java:333-355)
        f = self.face
        if f == 0:
            return S2LatLngRect(R1Interval(-M_PI_4, M_PI_4), S1Interval(-M_PI_4, M_PI_4))
        if f == 1:
            return S2LatLngRect(R1Interval(-M_PI_4, M_PI_4), S1Interval(M_PI_4, 3 * M_PI_4))
        if f == 2:
            return S2LatLngRect(R1Interval(POLE_MIN_LAT, M_PI_2), S1Interval(-M_PI, M_PI))
        if f == 3:
            return S2LatLngRect(R1Interval(-M_PI_4, M_PI_4), S1Interval(3 * M_PI_4, -3 * M_PI_4))
        if f == 4:
            return S2LatLngRect(R1Interval(-M_PI_4, M_PI_4), S1Interval(-3 * M_PI_4, -M_PI_4))
        return S2LatLngRect(R1Interval(-M_PI_2, -POLE_MIN_LAT), S1Interval(-M_PI, M_PI))

    def contains_point(self, p: np.ndarray) -> bool:
        # S2Cell.java:363-373: faceXyzToUv validity + uv box test.
        f = self.face
        comp = p[f % 3]
        if f < 3:
            if comp <= 0:
                return False
        else:
            if comp >= 0:
                return False
        u, v = ck.valid_face_xyz_to_uv(np.array([f]), p[None, :])
        u, v = float(u[0]), float(v[0])
        return self.uv[0][0] <= u <= self.uv[0][1] and self.uv[1][0] <= v <= self.uv[1][1]

    def contains_cell(self, other: "S2Cell") -> bool:
        return bool(ck.contains(np.array([self.id], dtype=np.uint64), np.array([other.id], dtype=np.uint64))[0])

    def may_intersect_cell(self, other: "S2Cell") -> bool:
        # S2Cell.mayIntersect (S2Cell.java:359-361)
        return bool(
            ck.intersects(np.array([self.id], dtype=np.uint64), np.array([other.id], dtype=np.uint64))[0]
        )

    def _get_latitude(self, i: int, j: int) -> float:
        p = ck.face_uv_to_xyz(np.array([self.face]), np.array([self.uv[0][i]]), np.array([self.uv[1][j]]))[0]
        return math.atan2(p[2], math.sqrt(p[0] * p[0] + p[1] * p[1]))

    def _get_longitude(self, i: int, j: int) -> float:
        p = ck.face_uv_to_xyz(np.array([self.face]), np.array([self.uv[0][i]]), np.array([self.uv[1][j]]))[0]
        return math.atan2(p[1], p[0])

    def __repr__(self):
        return f"S2Cell(face={self.face}, level={self.level}, id={int(self.id):#x})"
