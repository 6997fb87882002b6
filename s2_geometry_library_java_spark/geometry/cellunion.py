"""S2CellUnion: normalized sorted vector of cell ids — the relational form of
a region approximation.

Port of ``S2CellUnion.java`` over a NumPy uint64 array: normalize
(sort/dedup/4-sibling collapse, :561-618), denormalize (:118-142), log-n
contains/intersects (:160-198), expand (:359-406), union/intersection
(:232-319), and measure ops (:475-528). The Spark-side mirror of
``contains(id)`` is the ``cell_id BETWEEN range_min AND range_max`` join.
"""

from __future__ import annotations

import numpy as np

from s2_geometry_library_java_spark.kernel import cellid as ck
from s2_geometry_library_java_spark.kernel import metrics

_U1 = np.uint64(1)


class S2CellUnion:
    __slots__ = ("ids",)

    def __init__(self, ids: np.ndarray | list | None = None, normalize: bool = True):
        if ids is None:
            self.ids = np.empty(0, dtype=np.uint64)
        else:
            self.ids = np.asarray(ids, dtype=np.uint64).copy()
            if normalize:
                self.normalize()

    def __len__(self) -> int:
        return int(self.ids.shape[0])

    def __iter__(self):
        return iter(self.ids)

    def normalize(self) -> bool:
        """Sort; drop contained; collapse 4 siblings -> parent (S2CellUnion.java:561-618)."""
        ids = np.sort(self.ids)
        out: list[np.uint64] = []
        for cid in ids:
            # Skip cells contained by the previous output cell.
            if out and ck.range_max(np.array([out[-1]]))[0] >= cid:
                if ck.contains(np.array([out[-1]]), np.array([cid]))[0]:
                    continue
            # Discard previous cells contained by this one.
            while out and ck.contains(np.array([cid]), np.array([out[-1]]))[0]:
                out.pop()
            # Collapse 4 siblings into the parent, repeatedly.
            while len(out) >= 3:
                if (out[-3] ^ out[-2] ^ out[-1]) != cid:
                    break
                mask = ck.lowest_on_bit(np.array([cid]))[0] << _U1
                mask = ~(mask + (mask << _U1))
                id_masked = cid & mask
                if (
                    (out[-3] & mask) != id_masked
                    or (out[-2] & mask) != id_masked
                    or (out[-1] & mask) != id_masked
                    or ck.is_face(np.array([cid]))[0]
                ):
                    break
                out.pop()
                out.pop()
                out.pop()
                cid = ck.immediate_parent(np.array([cid]))[0]
            out.append(cid)
        changed = len(out) < len(self.ids)
        self.ids = np.array(out, dtype=np.uint64)
        return changed

    def denormalize(self, min_level: int, level_mod: int) -> np.ndarray:
        """Expand to min_level/level_mod grid (S2CellUnion.java:118-142)."""
        out: list[np.ndarray] = []
        levels = ck.level(self.ids)
        for cid, lvl in zip(self.ids, levels):
            new_level = max(min_level, int(lvl))
            if level_mod > 1:
                new_level += (ck.MAX_LEVEL - (new_level - min_level)) % level_mod
                new_level = min(ck.MAX_LEVEL, new_level)
            if new_level == lvl:
                out.append(np.array([cid], dtype=np.uint64))
            else:
                arr = np.array([cid], dtype=np.uint64)
                start = ck.child_begin(arr, new_level)[0]
                step = ck.lowest_on_bit(np.array([start]))[0] << _U1
                count = 1 << (2 * (new_level - int(lvl)))
                out.append(start + np.arange(count, dtype=np.uint64) * step)
        return np.concatenate(out) if out else np.empty(0, dtype=np.uint64)

    def contains_id(self, cid: np.uint64 | int) -> bool:
        # Binary search over sorted span (S2CellUnion.java:160-178)
        cid = np.uint64(cid)
        pos = int(np.searchsorted(self.ids, cid, side="left"))
        if pos < len(self.ids) and ck.range_min(np.array([self.ids[pos]]))[0] <= cid:
            return True
        return pos != 0 and ck.range_max(np.array([self.ids[pos - 1]]))[0] >= cid

    def intersects_id(self, cid: np.uint64 | int) -> bool:
        cid = np.uint64(cid)
        pos = int(np.searchsorted(self.ids, cid, side="left"))
        if pos < len(self.ids) and ck.range_min(np.array([self.ids[pos]]))[0] <= ck.range_max(np.array([cid]))[0]:
            return True
        return pos != 0 and ck.range_max(np.array([self.ids[pos - 1]]))[0] >= ck.range_min(np.array([cid]))[0]

    def contains_ids(self, cids: np.ndarray) -> np.ndarray:
        """Vectorized contains over a cell-id column — the sort-merge range join."""
        cids = np.asarray(cids, dtype=np.uint64)
        if len(self.ids) == 0:
            return np.zeros(cids.shape, dtype=bool)
        pos = np.searchsorted(self.ids, cids, side="left")
        rmin = ck.range_min(self.ids)
        rmax = ck.range_max(self.ids)
        hit_right = (pos < len(self.ids)) & (rmin[np.minimum(pos, len(self.ids) - 1)] <= cids)
        hit_left = (pos != 0) & (rmax[np.maximum(pos - 1, 0)] >= cids)
        return hit_right | hit_left

    def contains_union(self, other: "S2CellUnion") -> bool:
        return bool(all(self.contains_id(c) for c in other.ids))

    def intersects_union(self, other: "S2CellUnion") -> bool:
        return bool(any(self.intersects_id(c) for c in other.ids))

    @staticmethod
    def union_of(x: "S2CellUnion", y: "S2CellUnion") -> "S2CellUnion":
        return S2CellUnion(np.concatenate([x.ids, y.ids]))

    def intersection_with_cell(self, cell_id: np.uint64 | int) -> "S2CellUnion":
        """C8: slice of this union intersecting ONE cell
        (S2CellUnion.getIntersection(x, cellId), S2CellUnion.java:246-264):
        either the containing ancestor of ``cell_id`` alone, or the
        contiguous run of descendants inside its leaf range — two sorted
        searches, no merge walk."""
        cid = np.uint64(cell_id)
        if self.contains_id(cid):
            return S2CellUnion(np.array([cid], dtype=np.uint64), normalize=False)
        lo = int(np.searchsorted(self.ids, ck.range_min(np.array([cid]))[0], side="left"))
        hi = int(np.searchsorted(self.ids, ck.range_max(np.array([cid]))[0], side="right"))
        return S2CellUnion(self.ids[lo:hi].copy(), normalize=False)

    @staticmethod
    def intersection_of(x: "S2CellUnion", y: "S2CellUnion") -> "S2CellUnion":
        """Sorted-merge intersection (S2CellUnion.java:270-319)."""
        out = []
        i = j = 0
        xi, yi = x.ids, y.ids
        while i < len(xi) and j < len(yi):
            imin = ck.range_min(np.array([xi[i]]))[0]
            jmin = ck.range_min(np.array([yi[j]]))[0]
            if imin > jmin:
                if xi[i] <= ck.range_max(np.array([yi[j]]))[0]:
                    out.append(xi[i])
                    i += 1
                else:
                    j = int(np.searchsorted(yi[j + 1 :], imin, side="left")) + j + 1
                    if xi[i] <= ck.range_max(np.array([yi[j - 1]]))[0]:
                        j -= 1
            elif jmin > imin:
                if yi[j] <= ck.range_max(np.array([xi[i]]))[0]:
                    out.append(yi[j])
                    j += 1
                else:
                    i = int(np.searchsorted(xi[i + 1 :], jmin, side="left")) + i + 1
                    if yi[j] <= ck.range_max(np.array([xi[i - 1]]))[0]:
                        i -= 1
            else:
                if xi[i] < yi[j]:
                    out.append(xi[i])
                    i += 1
                else:
                    out.append(yi[j])
                    j += 1
        result = S2CellUnion()
        result.ids = np.array(out, dtype=np.uint64)
        return result

    def expand_level(self, level: int) -> None:
        """Add all neighbors at the given level (S2CellUnion.java:359-387)."""
        output: list[np.uint64] = []
        level_lsb = np.uint64(1) << np.uint64(2 * (ck.MAX_LEVEL - level))
        i = len(self.ids) - 1
        while i >= 0:
            cid = self.ids[i]
            if ck.lowest_on_bit(np.array([cid]))[0] < level_lsb:
                cid = ck.parent(np.array([cid]), level)[0]
                while i > 0 and ck.contains(np.array([cid]), np.array([self.ids[i - 1]]))[0]:
                    i -= 1
            output.append(cid)
            _, nbrs = ck.get_all_neighbors(np.array([cid]), level)
            output.extend(nbrs)
            i -= 1
        self.ids = np.array(output, dtype=np.uint64)
        self.normalize()

    def expand_radius(self, min_radius_radians: float, max_level_diff: int) -> None:
        # S2CellUnion.expand(minRadius, maxLevelDiff) (S2CellUnion.java:393-406)
        min_level = ck.MAX_LEVEL
        if len(self.ids):
            min_level = int(ck.level(self.ids).min())
        radius_level = metrics.MIN_WIDTH.get_max_level(min_radius_radians)
        if radius_level == 0 and min_radius_radians > metrics.MIN_WIDTH.get_value(0):
            self.expand_level(0)
        self.expand_level(min(min_level + max_level_diff, radius_level))

    def leaf_cells_covered(self) -> int:
        levels = ck.level(self.ids)
        return int(np.sum(1 << (2 * (ck.MAX_LEVEL - levels)).astype(np.int64)))

    def average_based_area(self) -> float:
        return metrics.AVG_AREA.get_value(ck.MAX_LEVEL) * self.leaf_cells_covered()

    def approx_area(self) -> float:
        from s2_geometry_library_java_spark.geometry.cell import S2Cell

        return float(sum(S2Cell(int(c)).approx_area() for c in self.ids))

    def exact_area(self) -> float:
        from s2_geometry_library_java_spark.geometry.cell import S2Cell

        return float(sum(S2Cell(int(c)).exact_area() for c in self.ids))

    def range_table(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(cell_id, range_min, range_max) — the exploded relational covering."""
        return self.ids, ck.range_min(self.ids), ck.range_max(self.ids)

    # Region interface (S2CellUnion.java:420-467)
    def get_cap_bound(self):
        from s2_geometry_library_java_spark.geometry.cap import S2Cap

        if len(self.ids) == 0:
            return S2Cap.empty()
        centroid = np.zeros(3)
        for cid in self.ids:
            area = metrics.AVG_AREA.get_value(int(ck.level(np.array([cid]))[0]))
            centroid += area * ck.to_point(np.array([cid]))[0]
        n = np.linalg.norm(centroid)
        if n == 0:
            centroid = np.array([1.0, 0.0, 0.0])
        else:
            centroid = centroid / n
        cap = S2Cap(centroid, 0.0)
        for cid in self.ids:
            from s2_geometry_library_java_spark.geometry.cell import S2Cell

            cap = cap.add_cap(S2Cell(int(cid)).get_cap_bound())
        return cap

    def contains_cell(self, cell) -> bool:
        return self.contains_id(cell.id)

    def may_intersect_cell(self, cell) -> bool:
        return self.intersects_id(cell.id)

    def __repr__(self):
        return f"S2CellUnion({len(self.ids)} cells)"
