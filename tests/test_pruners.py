"""P18 pruner cross-check: the pruner may over-keep but must never reject an
edge that actually crosses a target edge (conservative-rejection contract,
S2EdgeUtil.java:308-311)."""

import numpy as np

from s2_geometry_library_java_spark.geometry.interval import S1Interval
from s2_geometry_library_java_spark.kernel import cellid as ck
from s2_geometry_library_java_spark.kernel import predicates as pr
from s2_geometry_library_java_spark.kernel.pruners import XYZPruner, longitude_prune_chain

RNG = np.random.default_rng(123456)


def _chain(n, lat0, lng0, spread):
    lats = lat0 + np.cumsum(RNG.uniform(-spread, spread, n))
    lngs = lng0 + np.cumsum(RNG.uniform(-spread, spread, n))
    return ck.latlng_degrees_to_xyz(lats, lngs)


def test_xyz_pruner_never_rejects_true_crossings():
    for _ in range(20):
        target = _chain(8, RNG.uniform(-30, 30), RNG.uniform(-60, 60), 2.0)
        chain = _chain(60, RNG.uniform(-40, 40), RNG.uniform(-80, 80), 3.0)
        pruner = XYZPruner()
        pruner.add_edges_to_bounds(target[:-1], target[1:])
        pruner.finalize_bounds()
        keep = pruner.intersect_chain(chain)
        a, b = chain[:-1], chain[1:]
        for i in range(len(a)):
            crossings = pr.robust_crossing(a[i][None, :], b[i][None, :], target[:-1], target[1:])
            if (crossings >= 0).any():
                assert keep[i], f"pruner rejected a truly crossing edge {i}"
        # and it must actually prune something on disjoint chains
    far = _chain(40, 70, 150, 1.0)
    pruner = XYZPruner()
    near = _chain(6, -40, -120, 1.0)
    pruner.add_edges_to_bounds(near[:-1], near[1:])
    pruner.finalize_bounds()
    assert not pruner.intersect_chain(far).any()


def test_longitude_pruner_matches_interval_semantics():
    interval = S1Interval.from_point_pair(np.radians(10.0), np.radians(40.0))
    chain = _chain(50, 0, 0, 4.0)
    keep = longitude_prune_chain(interval, chain)
    lng = np.degrees(np.arctan2(chain[:, 1], chain[:, 0]))
    for i in range(len(chain) - 1):
        lo, hi = sorted((lng[i], lng[i + 1]))
        overlaps = (hi >= 10.0) and (lo <= 40.0) if hi - lo <= 180 else True
        assert keep[i] == overlaps, (i, lng[i], lng[i + 1])
