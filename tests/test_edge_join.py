"""F6-style edge-index cross-validation (S2EdgeIndexTest.java:61-139):
the distributed covering-join candidate set must be a superset of all
brute-force robustCrossing >= 0 pairs, and the refined result must equal
the brute force exactly."""

import math

import numpy as np
import pytest

from s2_geometry_library_java_spark.kernel import cellid as ck
from s2_geometry_library_java_spark.kernel import predicates as pr
from s2_geometry_library_java_spark.operators.edge_join import (
    _containing_cell2,
    crossing_join,
    edge_coverings,
    edges_df,
)

RNG = np.random.default_rng(123456)


def _random_edges(n: int, max_length_m: float, cap_radius_m: float = 5000.0):
    """Random earth-scale edges inside a cap (S2EdgeIndexTest.java:61-84)."""
    earth_radius = 6371000.0
    center = pr.normalize(RNG.standard_normal(3))
    cap_angle = cap_radius_m / earth_radius
    a_list, b_list = [], []
    for _ in range(n):
        a = _sample_in_cap(center, cap_angle)
        edge_len = RNG.random() * max_length_m / earth_radius
        b = _sample_in_cap(a, edge_len)
        a_list.append(a)
        b_list.append(b)
    return np.array(a_list), np.array(b_list)


def _sample_in_cap(axis, angle):
    # uniform-ish point within angle of axis
    z = 1 - RNG.random() * (1 - math.cos(angle))
    phi = RNG.random() * 2 * math.pi
    r = math.sqrt(max(0.0, 1 - z * z))
    local = np.array([r * math.cos(phi), r * math.sin(phi), z])
    # rotate local z to axis
    if abs(axis[2]) < 0.999:
        u = pr.normalize(np.cross(np.array([0.0, 0.0, 1.0]), axis))
        ang = math.acos(max(-1.0, min(1.0, axis[2])))
        return _rotate(local, u, ang)
    return local if axis[2] > 0 else -local


def _rotate(p, axis, angle):
    c, s = math.cos(angle), math.sin(angle)
    return p * c + np.cross(axis, p) * s + axis * float(axis @ p) * (1 - c)


def test_containing_cell_pairs():
    pts = pr.normalize(RNG.standard_normal((500, 3)))
    a = ck.from_xyz(pts)
    jitter = pr.normalize(pts + 1e-7 * RNG.standard_normal((500, 3)))
    b = ck.from_xyz(jitter)
    cells = _containing_cell2(a, b)
    for i in range(500):
        if cells[i] == np.uint64(0):
            assert ck.face(a[i : i + 1])[0] != ck.face(b[i : i + 1])[0]
        else:
            cid = cells[i : i + 1]
            assert ck.contains(cid, a[i : i + 1])[0] and ck.contains(cid, b[i : i + 1])[0]
            # smallest: the immediate child containing a does not contain b
            lvl = int(ck.level(cid)[0])
            if lvl < 30:
                child = ck.parent(a[i : i + 1], lvl + 1)
                assert not ck.contains(child, b[i : i + 1])[0]


def test_edge_covering_covers_edge_samples():
    a, b = _random_edges(300, 1000.0)
    rows, cells = edge_coverings(a, b, thicken=False)
    for i in range(300):
        cover = cells[rows == i]
        assert cover.size > 0
        # interpolated samples along the edge must fall inside the covering
        for t in np.linspace(0, 1, 7):
            p = pr.normalize((1 - t) * a[i] + t * b[i])
            leaf = ck.from_xyz(p[None, :])
            assert ck.contains(cover, np.broadcast_to(leaf, cover.shape)).any(), (i, t)


@pytest.mark.parametrize("n,max_len", [(300, 100.0), (300, 5000.0)])
def test_crossing_join_matches_bruteforce(spark, n, max_len):
    a, b = _random_edges(n, max_len)
    df = edges_df(spark, a, b)
    got = {(r["id_a"], r["id_b"]): r["crossing"] for r in crossing_join(df).collect()}
    # brute force all pairs
    expect = {}
    for i in range(n):
        cr = pr.robust_crossing(a[i][None, :], b[i][None, :], a, b)
        for j in np.flatnonzero(cr >= 0):
            if j > i:
                expect[(i, int(j))] = int(cr[j])
    assert got == expect
