"""Port of the S2PolygonBuilderTest case table
(S2PolygonBuilderTest.java:81-244, harness :296-400): edge-chain soups
assembled under each allowed (undirected, xor) option combination must
produce exactly the expected loops and unused-edge counts.

Deterministic subset: identity frame, no perturbation (the reference's
random frames/perturbations only stress the merge machinery, which case 11
exercises explicitly via merge_distance)."""

import math

import numpy as np
import pytest

from s2_geometry_library_java_spark.geometry.builder import BuilderOptions, S2PolygonBuilder
from s2_geometry_library_java_spark.geometry.text_format import parse_vertices

# (undirected_tristate, xor_tristate, merge_deg, chains[(str, closed)], expected_loops, n_unused)
CASES = [
    # 0: no loops
    (0, 0, 0.0, [], [], 0),
    # 1: one loop with extra edges
    (0, 0, 0.0,
     [("0:0, 0:10, 10:5", True), ("0:0, 5:5", False), ("10:5, 20:7, 30:10, 40:15, 50:3, 60:-20", False)],
     ["0:0, 0:10, 10:5"], 6),
    # 2: loop with an edge removed by XORing + extra edges
    (0, 1, 0.0,
     [("0:0, 0:10, 5:15, 10:10, 10:0", True),
      ("10:10, 12:12, 14:14, 16:16, 18:18", False),
      ("14:14, 14:16, 14:18, 14:20", False),
      ("14:18, 16:20, 18:22", False),
      ("18:12, 16:12, 14:12, 12:12", False),
      ("20:18, 18:16, 16:14, 14:12", False),
      ("20:14, 18:14, 16:14", False),
      ("5:15, 0:10", False)],
     [], 21),
    # 3: two shells + one hole combine into one loop (XOR)
    (0, 1, 0.0,
     [("0:0, 0:10, 5:10, 10:10, 10:5, 10:0", True),
      ("0:10, 0:15, 5:15, 5:10", True),
      ("10:10, 5:10, 5:5, 10:5", True)],
     ["0:0, 0:10, 0:15, 5:15, 5:10, 5:5, 10:5, 10:0"], 0),
    # 4: pyramid of triangles (directed edges required)
    (-1, 0, 0.0,
     [("0:0, 0:2, 0:4, 0:6, 1:5, 2:4, 3:3, 2:2, 1:1", True),
      ("0:2, 1:1, 1:3", True),
      ("0:4, 1:3, 1:5", True),
      ("1:3, 2:2, 2:4", True),
      ("0:0, 0:1", False),
      ("1:3, 5:7", False)],
     ["0:0, 0:2, 1:1", "0:2, 0:4, 1:3", "0:4, 0:6, 1:5",
      "1:1, 1:3, 2:2", "1:3, 1:5, 2:4", "2:2, 2:4, 3:3"], 2),
    # 5: four subsquares, don't XOR — extract the four loops
    (0, -1, 0.0,
     [("0:0, 0:5, 5:5, 5:0", True), ("0:5, 0:10, 5:10, 5:5", True),
      ("5:0, 5:5, 10:5, 10:0", True), ("5:5, 5:10, 10:10, 10:5", True),
      ("0:10, 0:15, 0:20", False), ("20:0, 15:0, 10:0", False)],
     ["0:0, 0:5, 5:5, 5:0", "0:5, 0:10, 5:10, 5:5",
      "5:0, 5:5, 10:5, 10:0", "5:5, 5:10, 10:10, 10:5"], 4),
    # 6: five nested loops touching at a point
    (0, 0, 0.0,
     [("0:0, 0:10, 10:10, 10:0", True), ("0:0, 1:9, 9:9, 9:1", True),
      ("0:0, 2:8, 8:8, 8:2", True), ("0:0, 3:7, 7:7, 7:3", True),
      ("0:0, 4:6, 6:6, 6:4", True)],
     ["0:0, 0:10, 10:10, 10:0", "0:0, 1:9, 9:9, 9:1", "0:0, 2:8, 8:8, 8:2",
      "0:0, 3:7, 7:7, 7:3", "0:0, 4:6, 6:6, 6:4"], 0),
    # 7: four nested diamonds touching at two points (directed)
    (-1, 0, 0.0,
     [("0:-20, -10:0, 0:20, 10:0", True), ("0:10, -10:0, 0:-10, 10:0", True),
      ("0:-10, -5:0, 0:10, 5:0", True), ("0:5, -5:0, 0:-5, 5:0", True)],
     ["0:-20, -10:0, 0:-10, 10:0", "0:-10, -5:0, 0:-5, 5:0",
      "0:5, -5:0, 0:10, 5:0", "0:10, -10:0, 0:20, 10:0"], 0),
    # 9: triangle + self-intersecting bowtie
    (0, 0, 0.0,
     [("0:0, 0:10, 5:5", True), ("0:20, 0:30, 10:20", False), ("10:20, 10:30, 0:20", False)],
     ["0:0, 0:10, 5:5"], 4),
    # 10: two triangles that intersect each other (validate rejects both)
    (0, 0, 0.0,
     [("0:0, 0:10, 5:5", True), ("2:2, 2:12, 7:7", True)],
     [], 6),
]


def _loops_equal(a_vertices: np.ndarray, b_vertices: np.ndarray, allow_reverse: bool) -> bool:
    n = a_vertices.shape[0]
    if b_vertices.shape[0] != n:
        return False
    cands = [b_vertices] + ([b_vertices[::-1]] if allow_reverse else [])
    for bv in cands:
        for off in range(n):
            if np.allclose(np.roll(a_vertices, -off, axis=0), bv, atol=1e-13):
                return True
    return False


def _run(chains, undirected, xor, merge_deg, use_polygon, validate):
    builder = S2PolygonBuilder(
        BuilderOptions(undirected, xor, validate=validate, merge_distance=math.radians(merge_deg))
    )
    for s, closed in chains:
        verts = parse_vertices(s)
        pts = [verts[i] for i in range(verts.shape[0])]
        if closed:
            pts.append(pts[0])
        for i in range(1, len(pts)):
            builder.add_edge(pts[i - 1], pts[i])
    unused: list = []
    if use_polygon:
        poly, _ = builder.assemble_polygon(unused)
        loops = [poly.loop(i) for i in range(poly.num_loops())]
    else:
        loops, _ = builder.assemble_loops(unused)
    return loops, unused


@pytest.mark.parametrize("case_idx", range(len(CASES)))
def test_builder_case(case_idx):
    und_t, xor_t, merge_deg, chains, expected, n_unused = CASES[case_idx]
    und_options = [True, False] if und_t == 0 else [und_t > 0]
    xor_options = [True, False] if xor_t == 0 else [xor_t > 0]
    for undirected in und_options:
        for xor in xor_options:
            use_polygon = xor_t >= 0
            loops, unused = _run(chains, undirected, xor, merge_deg, use_polygon, validate=True)
            assert len(unused) == n_unused, (undirected, xor, len(unused))
            assert len(loops) == len(expected), (undirected, xor, len(loops))
            exp_sets = [parse_vertices(e) for e in expected]
            used = set()
            for loop in loops:
                matched = False
                for k, ev in enumerate(exp_sets):
                    if k in used:
                        continue
                    if _loops_equal(loop.vertices, ev, allow_reverse=undirected or use_polygon):
                        used.add(k)
                        matched = True
                        break
                assert matched, (undirected, xor, loop.vertices)


def test_builder_merge_case_11():
    """Case 11 (S2PolygonBuilderTest.java:228-244): four squares' worth of
    broken chains with misaligned center copies; merge clustering must sew
    them into the single outer square (8 vertices, no unused edges)."""
    chains = [
        ("-8:-8, -8:0", False), ("-8:1, -8:8", False), ("0:-9, -2:0", False),
        ("-1:1, 1:9", False), ("0:8, 2:2", False), ("0:-2, 1:-8", False),
        ("8:9, 9:1", False), ("9:0, 8:-9", False), ("9:-9, 0:-8", False),
        ("1:-9, -9:-9", False), ("8:0, 1:0", False), ("1:2, -8:0", False),
        ("-8:1, 1:-1", False), ("0:1, 8:1", False), ("-9:8, 1:8", False),
        ("0:9, 8:8", False),
    ]
    loops, unused = _run(chains, undirected=False, xor=True, merge_deg=2.0, use_polygon=True, validate=False)
    assert unused == []
    assert len(loops) == 1
    assert loops[0].n == 8
