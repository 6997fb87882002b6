"""I5 large-loop containment index: the sparse cell-indexed parity path must
match the dense O(points x edges) kernel exactly, while testing only a small
fraction of (point, edge) pairs."""

import numpy as np
import pytest

from s2_geometry_library_java_spark.geometry import loop_index as li
from s2_geometry_library_java_spark.geometry.loop import S2Loop
from s2_geometry_library_java_spark.kernel import cellid as ck
from s2_geometry_library_java_spark.kernel import predicates as pr


def _wiggly_loop(n: int = 5000) -> S2Loop:
    """A CCW loop with n vertices: a circle around (lat 20, lng 30) whose
    radius wiggles — a coastline-ish chain with high vertex count."""
    t = np.linspace(0.0, 2.0 * np.pi, n, endpoint=False)
    radius = np.radians(10.0) * (1.0 + 0.25 * np.sin(13 * t))
    lat = np.radians(20.0) + radius * np.sin(t)
    lng = np.radians(30.0) + radius * np.cos(t) / np.cos(lat)
    return S2Loop(ck.latlng_radians_to_xyz(lat, lng))


@pytest.fixture(scope="module")
def loop5k():
    return _wiggly_loop(5000)


@pytest.fixture(scope="module")
def probe_pts():
    rng = np.random.default_rng(7)
    lat = np.radians(rng.uniform(0.0, 40.0, 4000))
    lng = np.radians(rng.uniform(10.0, 50.0, 4000))
    return ck.latlng_radians_to_xyz(lat, lng)


def test_sparse_matches_dense(loop5k, probe_pts):
    dense = pr.loop_crossing_parity(loop5k.vertices, probe_pts)
    idx = li.LoopEdgeIndex(loop5k.vertices)
    sparse = li.sparse_crossing_parity(loop5k.vertices, probe_pts, idx)
    assert np.array_equal(dense, sparse)
    assert dense.any() and not dense.all()  # fixture straddles the boundary


def test_contains_points_uses_index_above_cutover(loop5k, probe_pts, monkeypatch):
    expected = loop5k.contains_points(probe_pts)  # n=5000 >= 2000: sparse
    assert loop5k._edge_index is not None
    monkeypatch.setattr(li, "MAX_BRUTE_FORCE_VERTICES", 10**9)
    loop5k._edge_index = None
    dense = loop5k.contains_points(probe_pts)
    assert loop5k._edge_index is None  # dense path didn't build it
    assert np.array_equal(expected, dense)


def test_candidate_fraction_is_small(loop5k, probe_pts):
    """The point of the index: far fewer robust-crossing evaluations than
    the dense n*m sweep."""
    idx = li.LoopEdgeIndex(loop5k.vertices)
    from s2_geometry_library_java_spark.operators.edge_join import edge_coverings

    _, a_sub, b_sub = li._subdivide(probe_pts, idx.seg_len)
    lo, hi = idx.pruner.lo[None, :], idx.pruner.hi[None, :]
    keep = ~(((a_sub < lo) & (b_sub < lo)) | ((a_sub > hi) & (b_sub > hi))).any(axis=1)
    qrows, qcells = edge_coverings(a_sub[keep], b_sub[keep], thicken=False)
    pi, _ = idx.candidates(qrows, qcells)
    dense_pairs = probe_pts.shape[0] * loop5k.n
    # 5k fixture measures ~13%; the fraction FALLS with vertex count (1.8%
    # at 50k) because seg_len adapts to edge scale.
    assert len(pi) < 0.2 * dense_pairs
