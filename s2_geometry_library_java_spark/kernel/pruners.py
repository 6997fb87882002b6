"""P18 edge-chain pruners (S2EdgeUtil.java:242-366), vectorized.

The reference's XYZPruner / LongitudePruner walk a vertex chain and cheaply
reject edges that cannot intersect a bounding region.  Relationally this
shape becomes a plain filter predicate that Catalyst pushes below the exact
test (SURVEY.md §4 O14); the kernels here are the NumPy image used inside
batch refinement: given a whole chain at once, they return the keep-mask for
every edge in one pass.
"""

from __future__ import annotations

import numpy as np

from s2_geometry_library_java_spark.geometry.interval import S1Interval


class XYZPruner:
    """Port of S2EdgeUtil.XYZPruner: accumulate an xyz bound over target
    edges (with the arc-deformation allowance, :288-296), then reject chain
    edges entirely outside the expanded box."""

    def __init__(self):
        self._bounds_set = False
        self.lo = np.zeros(3)
        self.hi = np.zeros(3)
        self.max_deformation = 0.0

    def add_edges_to_bounds(self, froms: np.ndarray, tos: np.ndarray) -> None:
        froms = np.atleast_2d(np.asarray(froms, dtype=np.float64))
        tos = np.atleast_2d(np.asarray(tos, dtype=np.float64))
        lo = np.minimum(froms, tos).min(axis=0)
        hi = np.maximum(froms, tos).max(axis=0)
        if not self._bounds_set:
            self.lo, self.hi = lo, hi
            self._bounds_set = True
        else:
            self.lo = np.minimum(self.lo, lo)
            self.hi = np.maximum(self.hi, hi)
        # Geodesic deformation allowance (S2EdgeUtil.java:281-296).
        arc = np.abs(froms - tos).sum(axis=1)
        deform = np.where(arc < 0.025, arc * 0.0025, np.where(arc < 1.0, arc * 0.11, arc * 0.5))
        self.max_deformation = max(self.max_deformation, float(deform.max(initial=0.0)))

    def finalize_bounds(self) -> None:
        # setFirstIntersectPoint's bound expansion (:297-304).
        self.lo = self.lo - self.max_deformation
        self.hi = self.hi + self.max_deformation

    def intersect_chain(self, vertices: np.ndarray) -> np.ndarray:
        """Keep-mask for each edge (v[i], v[i+1]) of the chain — False only
        when the edge is certainly outside the bound (:312-327)."""
        v = np.asarray(vertices, dtype=np.float64)
        a, b = v[:-1], v[1:]
        below = (a < self.lo[None, :]) & (b < self.lo[None, :])
        above = (a > self.hi[None, :]) & (b > self.hi[None, :])
        return ~(below | above).any(axis=1)


def longitude_prune_chain(interval: S1Interval, vertices: np.ndarray) -> np.ndarray:
    """Port of S2EdgeUtil.LongitudePruner over a whole chain: for each edge
    (v[i], v[i+1]), does its longitude span intersect ``interval``
    (S2EdgeUtil.java:339-366)."""
    v = np.asarray(vertices, dtype=np.float64)
    lng = np.arctan2(v[:, 1], v[:, 0])
    out = np.empty(len(v) - 1, dtype=bool)
    for i in range(len(v) - 1):  # S1Interval wraparound logic is scalar
        out[i] = interval.intersects(S1Interval.from_point_pair(float(lng[i]), float(lng[i + 1])))
    return out
