"""S2PolygonBuilder: assemble loops/polygons from an edge soup.

Port of ``S2PolygonBuilder.java`` (B1-B4 in SURVEY.md §2.6): edge multimap
with XOR-cancel of opposite edges (:225-279), leftmost-turn loop assembly
with dead-end backtracking (:295-334, 444-502), polygon assembly
(:352-385), and merge-radius vertex clustering via the fixed-level cell-id
PointIndex (:519-616, 629-689) — the same index shape the engine's kNN
bucket join uses at scale.

Broadcast/driver-side: operates on small polygon layers; vertices are keyed
by their exact (x, y, z) float triple (the Java code keys a HashMap by
S2Point value equality, S2Point.java:137-151).
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass, field

import numpy as np

from s2_geometry_library_java_spark.kernel import cellid as ck
from s2_geometry_library_java_spark.kernel import metrics
from s2_geometry_library_java_spark.kernel import predicates as pr
from s2_geometry_library_java_spark.geometry.loop import S2Loop
from s2_geometry_library_java_spark.geometry.polygon import S2Polygon


def _key(p: np.ndarray) -> tuple:
    return (float(p[0]), float(p[1]), float(p[2]))


def _pt(key: tuple) -> np.ndarray:
    return np.array(key, dtype=np.float64)


@dataclass
class BuilderOptions:
    """Mirrors S2PolygonBuilder.Options (S2PolygonBuilder.java:84-211)."""

    undirected_edges: bool = False
    xor_edges: bool = True
    validate: bool = False
    merge_distance: float = 0.0  # radians


def directed_xor() -> BuilderOptions:
    return BuilderOptions(False, True)


def undirected_xor() -> BuilderOptions:
    return BuilderOptions(True, True)


def undirected_union() -> BuilderOptions:
    return BuilderOptions(True, False)


def directed_union() -> BuilderOptions:
    return BuilderOptions(False, False)


class S2PolygonBuilder:
    def __init__(self, options: BuilderOptions | None = None):
        self.options = options or BuilderOptions()
        # vertex key -> multiset of outgoing vertex keys (S2PolygonBuilder.java:68)
        self.edges: dict[tuple, Counter] = {}

    # ------------------------------------------------------------------
    def add_edge(self, v0: np.ndarray, v1: np.ndarray) -> None:
        # S2PolygonBuilder.addEdge (:225-252)
        k0, k1 = _key(v0), _key(v1)
        if k0 == k1:
            return
        if self.options.xor_edges:
            candidates = self.edges.get(k1)
            if candidates is not None and candidates[k0] > 0:
                self._erase_edge(k1, k0)
                return
        self.edges.setdefault(k0, Counter())[k1] += 1
        if self.options.undirected_edges:
            self.edges.setdefault(k1, Counter())[k0] += 1

    def add_loop(self, loop: S2Loop) -> None:
        # addLoop (:262-268): holes contribute reversed edges.
        sign = loop.sign()
        for i in range(loop.n, 0, -1):
            self.add_edge(loop.vertex(i), loop.vertex(i + sign))

    def add_polygon(self, polygon: S2Polygon) -> None:
        for i in range(polygon.num_loops()):
            self.add_loop(polygon.loop(i))

    # ------------------------------------------------------------------
    def _erase_edge(self, k0: tuple, k1: tuple) -> None:
        # eraseEdge (:405-424)
        vset = self.edges[k0]
        vset[k1] -= 1
        if vset[k1] <= 0:
            del vset[k1]
        if not vset:
            del self.edges[k0]
        if self.options.undirected_edges:
            vset = self.edges[k1]
            vset[k0] -= 1
            if vset[k0] <= 0:
                del vset[k0]
            if not vset:
                del self.edges[k1]

    def _erase_loop_keys(self, keys: list[tuple]) -> None:
        n = len(keys)
        i = n - 1
        for j in range(n):
            self._erase_edge(keys[i], keys[j])
            i = j

    def _assemble_loop(self, k0: tuple, k1: tuple, unused_edges: list) -> S2Loop | None:
        # assembleLoop (:444-502): walk leftmost turns, backtrack dead ends.
        path = [k0, k1]
        index = {k1: 1}
        while len(path) >= 2:
            k0, k1 = path[-2], path[-1]
            v0, v1 = _pt(k0), _pt(k1)
            k2 = None
            v2_found = False
            vset = self.edges.get(k1)
            if vset is not None:
                for k in vset:
                    if k == k0:
                        continue
                    if not v2_found or bool(pr.ordered_ccw(v0, _pt(k2), _pt(k), v1)):
                        k2 = k
                    v2_found = True
            if not v2_found:
                # Dead end: drop this edge and backtrack (:477-482).
                unused_edges.append((k0, k1))
                self._erase_edge(k0, k1)
                index.pop(k1, None)
                path.pop()
            elif k2 not in index:
                index[k2] = len(path)
                path.append(k2)
            else:
                # Loop completed; trim vertices before the repeat (:488-500).
                path = path[index[k2]:]
                loop = S2Loop(np.array([_pt(k) for k in path]))
                if self.options.validate and not _loop_is_valid(loop):
                    for idx in range(len(path)):
                        unused_edges.append((path[idx - 1], path[idx]))
                    self._erase_loop_keys(path)
                    return None
                return loop
        return None

    def assemble_loops(self, unused_edges: list | None = None) -> tuple[list[S2Loop], bool]:
        # assembleLoops (:295-334)
        if self.options.merge_distance > 0:
            self._merge_vertices()
        if unused_edges is None:
            unused_edges = []
        unused_edges.clear()
        loops: list[S2Loop] = []
        while self.edges:
            k0 = next(iter(self.edges))
            k1 = next(iter(self.edges[k0]))
            loop = self._assemble_loop(k0, k1, unused_edges)
            if loop is None:
                continue
            while self.options.undirected_edges and not loop.is_normalized():
                loop = self._assemble_loop(_key(loop.vertex(1)), _key(loop.vertex(0)), unused_edges)
            loops.append(loop)
            self._erase_loop_keys([_key(loop.vertex(i)) for i in range(loop.n)])
        return loops, not unused_edges

    def assemble_polygon(self, unused_edges: list | None = None) -> tuple[S2Polygon, bool]:
        # assemblePolygon (:352-385)
        if unused_edges is None:
            unused_edges = []
        loops, success = self.assemble_loops(unused_edges)
        if not self.options.undirected_edges:
            for loop in loops:
                loop.normalize()
        if self.options.validate and not _polygon_loops_valid(loops):
            for loop in loops:
                for i in range(loop.n):
                    unused_edges.append((_key(loop.vertex(i - 1)), _key(loop.vertex(i))))
            return S2Polygon(), False
        return S2Polygon(loops), success

    # ------------------------------------------------------------------
    def _merge_vertices(self) -> None:
        # mergeVertices (:562-616): connected components of the <=merge_distance
        # graph via the fixed-level cell-id PointIndex (:629-689).
        radius = self.options.merge_distance
        level = min(metrics.MIN_WIDTH.get_max_level(2 * radius), ck.MAX_LEVEL - 1)

        index: dict[int, list] = {}  # cell id -> [ [key, marked] ]
        seen: set[tuple] = set()

        def index_add(k: tuple) -> None:
            if k in seen:
                return
            seen.add(k)
            cid = int(ck.parent(ck.from_xyz(_pt(k)[None, :]), level)[0])
            index.setdefault(cid, []).append([k, False])

        for k0, vset in self.edges.items():
            index_add(k0)
            for k1 in vset:
                index_add(k1)

        def query(center_key: tuple) -> list[tuple]:
            # PointIndex.query (:669-689): 4 vertex-neighbor buckets + exact test.
            out = []
            center = _pt(center_key)
            cid = ck.from_xyz(center[None, :])
            _, nbrs = ck.get_vertex_neighbors(cid, level)
            for nb in nbrs:
                for entry in index.get(int(nb), []):
                    if entry[1]:
                        continue
                    p = _pt(entry[0])
                    if float(pr.angle(center[None, :], p[None, :])[0]) <= radius:
                        out.append(entry[0])
                        entry[1] = True
            return out

        merge_map: dict[tuple, tuple] = {}
        for bucket in index.values():
            for entry in bucket:
                if entry[1]:
                    continue
                entry[1] = True
                vstart = entry[0]
                frontier = [vstart]
                while frontier:
                    k0 = frontier.pop()
                    for k1 in query(k0):
                        frontier.append(k1)
                        merge_map[k1] = vstart
        self._move_vertices(merge_map)

    def _move_vertices(self, merge_map: dict[tuple, tuple]) -> None:
        # moveVertices (:519-556)
        if not merge_map:
            return
        edges_copy = []
        for k0, vset in self.edges.items():
            for k1, cnt in vset.items():
                if k0 in merge_map or k1 in merge_map:
                    if not self.options.undirected_edges or k0 < k1:
                        edges_copy.extend([(k0, k1)] * cnt)
        for k0, k1 in edges_copy:
            self._erase_edge(k0, k1)
            n0 = merge_map.get(k0, k0)
            n1 = merge_map.get(k1, k1)
            self.add_edge(_pt(n0), _pt(n1))


# ---------------------------------------------------------------------------
# Validity helpers (S2Loop.isValid :705-787 / S2Polygon.isValid :198-235,
# simplified: unit vertices, >=3 vertices, no self/pairwise crossings).
# ---------------------------------------------------------------------------
def _loop_is_valid(loop: S2Loop) -> bool:
    from s2_geometry_library_java_spark.geometry.loop import loop_is_valid

    return loop_is_valid(loop.vertices)


def _polygon_loops_valid(loops: list[S2Loop]) -> bool:
    for loop in loops:
        if not _loop_is_valid(loop):
            return False
    for i in range(len(loops)):
        for j in range(i + 1, len(loops)):
            if loops[i].contains_or_crosses(loops[j]) < 0:
                return False
    return True
