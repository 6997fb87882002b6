"""S2RegionCoverer: deterministic best-first region covering.

Port of ``S2RegionCoverer.java:56-548``: seed with <=6 face cells or the 4
vertex-neighbors of the cap center (:437-470); expand a priority queue
ordered by (level, #intersecting children, #terminal children) (:393-404)
until <= max_cells; normalize + denormalize for min_level/level_mod.

Determinism (O11 in SURVEY.md §4) is a correctness requirement: the queue is
keyed (priority, insertion_seq) so re-runs produce identical coverings —
checkpointed pipelines depend on this.

Runs per-region on the driver / inside applyInPandas groups; output is the
exploded ``polygon_cells`` covering table.
"""

from __future__ import annotations

import heapq

import numpy as np

from s2_geometry_library_java_spark.kernel import cellid as ck
from s2_geometry_library_java_spark.kernel import metrics
from s2_geometry_library_java_spark.geometry.cell import S2Cell
from s2_geometry_library_java_spark.geometry.cellunion import S2CellUnion

DEFAULT_MAX_CELLS = 8

_FACE_CELLS = [S2Cell.from_face_pos_level(f, 0, 0) for f in range(6)]


class _Candidate:
    __slots__ = ("cell", "is_terminal", "children")

    def __init__(self, cell: S2Cell, is_terminal: bool):
        self.cell = cell
        self.is_terminal = is_terminal
        self.children: list["_Candidate"] = []


class S2RegionCoverer:
    def __init__(
        self,
        max_cells: int = DEFAULT_MAX_CELLS,
        min_level: int = 0,
        max_level: int = ck.MAX_LEVEL,
        level_mod: int = 1,
    ):
        self.max_cells = max_cells
        self.min_level = max(0, min(ck.MAX_LEVEL, min_level))
        self.max_level = max(0, min(ck.MAX_LEVEL, max_level))
        self.level_mod = max(1, min(3, level_mod))

    # ------------------------------------------------------------------
    def get_covering(self, region) -> np.ndarray:
        """Covering cell ids honoring min_level/level_mod (S2RegionCoverer.java:251-262)."""
        union = self.get_covering_union(region)
        return union.denormalize(self.min_level, self.level_mod)

    def get_interior_covering(self, region) -> np.ndarray:
        union = self.get_interior_covering_union(region)
        return union.denormalize(self.min_level, self.level_mod)

    def get_covering_union(self, region) -> S2CellUnion:
        result = self._get_covering_internal(region, interior=False)
        return S2CellUnion(result)

    def get_interior_covering_union(self, region) -> S2CellUnion:
        result = self._get_covering_internal(region, interior=True)
        return S2CellUnion(result)

    @staticmethod
    def get_simple_covering(region, start_point: np.ndarray, level: int) -> np.ndarray:
        """Fixed-level BFS flood fill from a seed (S2RegionCoverer.java:316-319,522-547)."""
        start = ck.parent(ck.from_xyz(start_point[None, :]), level)[0]
        seen = {int(start)}
        frontier = [np.uint64(start)]
        output = []
        while frontier:
            cid = frontier.pop()
            if not region.may_intersect_cell(S2Cell(int(cid))):
                continue
            output.append(cid)
            nbrs = ck.get_edge_neighbors(np.array([cid], dtype=np.uint64))[0]
            for nbr in nbrs:
                if int(nbr) not in seen:
                    seen.add(int(nbr))
                    frontier.append(nbr)
        return np.array(output, dtype=np.uint64)

    # ------------------------------------------------------------------
    def _max_children_shift(self) -> int:
        return 2 * self.level_mod

    def _new_candidate(self, cell: S2Cell, region, interior: bool) -> _Candidate | None:
        # S2RegionCoverer.newCandidate (:326-353)
        if not region.may_intersect_cell(cell):
            return None
        is_terminal = False
        if cell.level >= self.min_level:
            if interior:
                if region.contains_cell(cell):
                    is_terminal = True
                elif cell.level + self.level_mod > self.max_level:
                    return None
            else:
                if cell.level + self.level_mod > self.max_level or region.contains_cell(cell):
                    is_terminal = True
        return _Candidate(cell, is_terminal)

    def _expand_children(self, candidate: _Candidate, cell: S2Cell, num_levels: int, region, interior: bool) -> int:
        # S2RegionCoverer.expandChildren (:411-435)
        num_levels -= 1
        num_terminals = 0
        for child_cell in cell.subdivide():
            if num_levels > 0:
                if region.may_intersect_cell(child_cell):
                    num_terminals += self._expand_children(candidate, child_cell, num_levels, region, interior)
                continue
            child = self._new_candidate(child_cell, region, interior)
            if child is not None:
                candidate.children.append(child)
                if child.is_terminal:
                    num_terminals += 1
        return num_terminals

    def _add_candidate(self, candidate: _Candidate | None, state) -> None:
        # S2RegionCoverer.addCandidate (:383-404)
        result, queue, region, interior = state
        if candidate is None:
            return
        if candidate.is_terminal:
            result.append(candidate.cell.id)
            return
        num_levels = 1 if candidate.cell.level < self.min_level else self.level_mod
        num_terminals = self._expand_children(candidate, candidate.cell, num_levels, region, interior)

        if not candidate.children:
            pass
        elif (
            not interior
            and num_terminals == 1 << self._max_children_shift()
            and candidate.cell.level >= self.min_level
        ):
            # All children terminal: add the parent instead (:383-391).
            candidate.is_terminal = True
            self._add_candidate(candidate, state)
        else:
            shift = self._max_children_shift()
            # Java pushes priority = -(key) and polls the LARGEST value, i.e.
            # the smallest key — refine the largest cells first, then fewest
            # intersecting children, then fewest terminal children (:393-404).
            # heapq pops smallest, so push the key directly; (key, seq) breaks
            # ties deterministically FIFO.
            key = (((candidate.cell.level << shift) + len(candidate.children)) << shift) + num_terminals
            self._seq += 1
            heapq.heappush(queue, (key, self._seq, candidate))

    def _get_initial_candidates(self, state) -> None:
        # S2RegionCoverer.getInitialCandidates (:437-470)
        result, queue, region, interior = state
        if self.max_cells >= 4:
            cap = region.get_cap_bound()
            level = min(
                metrics.MIN_WIDTH.get_max_level(2 * cap.angle()),
                min(self.max_level, ck.MAX_LEVEL - 1),
            )
            if self.level_mod > 1 and level > self.min_level:
                level -= (level - self.min_level) % self.level_mod
            if level > 0:
                cid = ck.from_xyz(cap.axis[None, :])
                _, base = ck.get_vertex_neighbors(cid, level)
                for b in base:
                    self._add_candidate(self._new_candidate(S2Cell(int(b)), region, interior), state)
                return
        for face_cell in _FACE_CELLS:
            self._add_candidate(self._new_candidate(face_cell, region, interior), state)

    def _get_covering_internal(self, region, interior: bool) -> np.ndarray:
        # S2RegionCoverer.getCoveringInternal (:472-515)
        result: list = []
        queue: list = []
        self._seq = 0
        state = (result, queue, region, interior)
        self._get_initial_candidates(state)
        while queue and (not interior or len(result) < self.max_cells):
            candidate = heapq.heappop(queue)[2]
            if (
                candidate.cell.level < self.min_level
                or len(candidate.children) == 1
                or len(result) + (0 if interior else len(queue)) + len(candidate.children) <= self.max_cells
            ):
                for child in candidate.children:
                    self._add_candidate(child, state)
            elif interior:
                pass
            else:
                candidate.is_terminal = True
                candidate.children = []
                self._add_candidate(candidate, state)
        return np.array(result, dtype=np.uint64)
