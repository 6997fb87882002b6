"""S2Polygon: multi-loop polygon with nesting hierarchy (depth = hole parity).

Port of ``S2Polygon.java`` init/contains/relations (S2Polygon.java:143-186,
360-445, 860-990). Boolean ops (initToIntersection/Union) are deferred to a
later milestone per SURVEY.md §7.
"""

from __future__ import annotations

import numpy as np

from s2_geometry_library_java_spark.geometry.loop import S2Loop
from s2_geometry_library_java_spark.geometry.latlng_rect import S2LatLngRect


def _loop_sort_key(loop: S2Loop):
    """Total order on loops: compare by (n, vertex tuple) like S2Loop.compareTo."""
    return (loop.n, loop.vertices.tobytes())


class S2Polygon:
    def __init__(self, loops: list[S2Loop] | S2Loop | None = None):
        self.loops: list[S2Loop] = []
        self.bound = S2LatLngRect.empty()
        self.has_holes = False
        self.num_vertices = 0
        if loops is None:
            return
        if isinstance(loops, S2Loop):
            # Single-loop fast path (S2Polygon.java:86-96)
            self.loops = [loops]
            self.num_vertices = loops.n
            self.bound = loops.get_rect_bound()
            self.has_holes = False
        else:
            self.init(list(loops))

    def init(self, loops: list[S2Loop]) -> None:
        # S2Polygon.init (S2Polygon.java:143-186)
        loop_map: dict[int | None, list[S2Loop]] = {None: []}
        for loop in loops:
            self._insert_loop(loop, None, loop_map)
            self.num_vertices += loop.n
        # Sort children lists for a total ordering.
        for key in loop_map:
            loop_map[key].sort(key=_loop_sort_key)
        self._init_loop(None, -1, loop_map)
        self.has_holes = False
        self.bound = S2LatLngRect.empty()
        for loop in self.loops:
            if loop.sign() < 0:
                self.has_holes = True
            else:
                self.bound = self.bound.union(loop.get_rect_bound())

    def _insert_loop(self, new_loop: S2Loop, parent: S2Loop | None, loop_map) -> None:
        # S2Polygon.insertLoop (S2Polygon.java:937-971)
        key = id(parent) if parent is not None else None
        children = loop_map.setdefault(key, [])
        for child in children:
            if child.contains_nested(new_loop):
                self._insert_loop(new_loop, child, loop_map)
                return
        new_children = loop_map.setdefault(id(new_loop), [])
        i = 0
        while i < len(children):
            child = children[i]
            if new_loop.contains_nested(child):
                new_children.append(child)
                children.pop(i)
            else:
                i += 1
        children.append(new_loop)

    def _init_loop(self, loop: S2Loop | None, depth: int, loop_map) -> None:
        if loop is not None:
            loop.depth = depth
            self.loops.append(loop)
        key = id(loop) if loop is not None else None
        for child in loop_map.get(key, []):
            self._init_loop(child, depth + 1, loop_map)

    def num_loops(self) -> int:
        return len(self.loops)

    def loop(self, i: int) -> S2Loop:
        return self.loops[i]

    # ------------------------------------------------------------------
    def contains_point(self, p: np.ndarray) -> bool:
        # S2Polygon.contains(S2Point) (S2Polygon.java:913-928)
        if self.num_loops() == 1:
            return self.loops[0].contains_point(p)
        if not self.bound.contains_point(p):
            return False
        inside = False
        for loop in self.loops:
            inside ^= loop.contains_point(p)
            if inside and not self.has_holes:
                break
        return inside

    def contains_points(self, pts: np.ndarray) -> np.ndarray:
        """Vectorized XOR of per-loop batch containment."""
        pts = np.asarray(pts, dtype=np.float64)
        if self.num_loops() == 1:
            return self.loops[0].contains_points(pts)
        inside = np.zeros(pts.shape[0], dtype=bool)
        for loop in self.loops:
            inside ^= loop.contains_points(pts)
        return inside

    def get_distance(self, p: np.ndarray) -> float:
        # S2Polygon.getDistance (S2Polygon.java:344-357)
        pn = p / np.linalg.norm(p)
        if self.contains_point(pn):
            return 0.0
        return min(loop.get_distance(pn) for loop in self.loops)

    def get_area(self) -> float:
        """Signed sum over loops: shells add, holes subtract."""
        return sum(loop.sign() * loop.get_area() for loop in self.loops)

    # ------------------------------------------------------------------
    def contains_polygon(self, b: "S2Polygon") -> bool:
        # S2Polygon.contains (S2Polygon.java:364-401)
        if self.num_loops() == 1 and b.num_loops() == 1:
            return self.loops[0].contains_loop(b.loops[0])
        if not self.bound.contains_rect(b.bound):
            if not self.bound.lng.union(b.bound.lng).is_full():
                return False
        if not self.has_holes and not b.has_holes:
            return all(self._any_loop_contains(bl) for bl in b.loops)
        return self._contains_all_shells(b) and b._excludes_all_holes(self)

    def intersects_polygon(self, b: "S2Polygon") -> bool:
        # S2Polygon.intersects (S2Polygon.java:407-445)
        if self.num_loops() == 1 and b.num_loops() == 1:
            return self.loops[0].intersects_loop(b.loops[0])
        if not self.bound.intersects_rect(b.bound):
            return False
        if not self.has_holes and not b.has_holes:
            for la in self.loops:
                for lb in b.loops:
                    if la.intersects_loop(lb):
                        return True
            return False
        return self._intersects_any_shell(b) or b._intersects_any_shell(self)

    def _any_loop_contains(self, b: S2Loop) -> bool:
        return any(loop.contains_loop(b) for loop in self.loops)

    def _contains_or_crosses(self, b: S2Loop) -> int:
        # S2Polygon.containsOrCrosses (S2Polygon.java:988-1010)
        inside = False
        for loop in self.loops:
            result = loop.contains_or_crosses(b)
            if result < 0:
                return -1
            if result > 0:
                inside ^= True
        return 1 if inside else 0

    def _contains_all_shells(self, b: "S2Polygon") -> bool:
        for loop in b.loops:
            if loop.sign() < 0:
                continue
            if self._contains_or_crosses(loop) <= 0:
                return False
        return True

    def _excludes_all_holes(self, b: "S2Polygon") -> bool:
        for loop in b.loops:
            if loop.sign() > 0:
                continue
            if self._contains_or_crosses(loop) != 0:
                return False
        return True

    def _intersects_any_shell(self, b: "S2Polygon") -> bool:
        for loop in b.loops:
            if loop.sign() < 0:
                continue
            if self._contains_or_crosses(loop) != 0:
                return True
        return False

    # ------------------------------------------------------------------
    # Region interface
    def get_rect_bound(self) -> S2LatLngRect:
        return self.bound

    def get_cap_bound(self):
        return self.bound.get_cap_bound()

    def contains_cell(self, cell) -> bool:
        # S2Polygon.contains(S2Cell) (S2Polygon.java:875-888)
        if self.num_loops() == 1:
            return self.loops[0].contains_cell(cell)
        if not self.bound.contains_rect(cell.get_rect_bound()):
            return False
        cell_poly = S2Polygon(S2Loop.from_cell(cell))
        return self.contains_polygon(cell_poly)

    def may_intersect_cell(self, cell) -> bool:
        # S2Polygon.mayIntersect (S2Polygon.java:895-908)
        if self.num_loops() == 1:
            return self.loops[0].may_intersect_cell(cell)
        if not self.bound.intersects_rect(cell.get_rect_bound()):
            return False
        cell_poly = S2Polygon(S2Loop.from_cell(cell))
        return self.intersects_polygon(cell_poly)

    def __repr__(self):
        return f"S2Polygon({self.num_loops()} loops, {self.num_vertices} vertices)"
