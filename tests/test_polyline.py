"""Port of S2PolylineTest (tests/.../S2PolylineTest.java) + P9/P10 kernel
cross-checks for nearest-edge/projection."""

import math

import numpy as np

from s2_geometry_library_java_spark.geometry.cell import S2Cell
from s2_geometry_library_java_spark.geometry.polyline import S2Polyline
from s2_geometry_library_java_spark.kernel import predicates as pr

RNG = np.random.default_rng(123456)


def _norm(v):
    return v / np.linalg.norm(v)


def test_basic_empty_bound():
    # S2PolylineTest.testBasic (:36-40)
    empty = S2Polyline(np.zeros((0, 3)))
    assert empty.get_rect_bound().is_empty()


def test_arclength_great_circles():
    # S2PolylineTest.testGetLengthCentroid (:42-67)
    for _ in range(40):
        x = _norm(RNG.standard_normal(3))
        y = _norm(np.cross(x, RNG.standard_normal(3)))
        vertices = []
        theta = 0.0
        while theta < 2 * math.pi:
            p = math.cos(theta) * x + math.sin(theta) * y
            if not vertices or not np.array_equal(p, vertices[-1]):
                vertices.append(p)
            theta += RNG.random() ** 10
        vertices.append(vertices[0])
        line = S2Polyline(np.array(vertices))
        assert abs(line.get_arclength_angle() - 2 * math.pi) < 2e-14


def test_may_intersect():
    # S2PolylineTest.testMayIntersect (:69-78)
    line = S2Polyline(np.array([_norm(np.array([1, -1.1, 0.8])), _norm(np.array([1, -0.8, 1.1]))]))
    for face in range(6):
        cell = S2Cell.from_face_pos_level(face, 0, 0)
        assert line.may_intersect_cell(cell) == ((face & 1) == 0)


def test_interpolate():
    # S2PolylineTest.testInterpolate (:80-96)
    v = np.array([[1, 0, 0], [0, 1, 0], _norm(np.array([0, 1, 1])), [0, 0, 1]], dtype=np.float64)
    line = S2Polyline(v)
    assert np.array_equal(line.interpolate(-0.1), v[0])
    expect = _norm(np.array([1, math.tan(0.2 * math.pi / 2), 0]))
    assert np.linalg.norm(_norm(line.interpolate(0.1)) - expect) < 1e-14
    assert np.linalg.norm(_norm(line.interpolate(0.25)) - _norm(np.array([1, 1, 0]))) < 1e-14
    assert np.array_equal(line.interpolate(0.5), v[1])
    assert np.array_equal(line.interpolate(0.75), v[2])
    assert np.array_equal(line.interpolate(1.1), v[3])


def test_nearest_edge_and_project():
    """Nearest-edge index + projection vs a scalar brute force (P9/P10)."""
    v = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]], dtype=np.float64)
    line = S2Polyline(v)
    for _ in range(50):
        p = _norm(RNG.standard_normal(3))
        idx = line.get_nearest_edgeindex if False else line.get_nearest_edge_index(p)
        dists = [float(pr.edge_distance(p[None, :], v[i][None, :], v[i + 1][None, :])[0]) for i in range(2)]
        assert idx == int(np.argmin(dists))
        proj = line.project(p)
        # projection lies on the sphere and is at the min distance
        assert abs(np.linalg.norm(proj) - 1.0) < 1e-12
        assert abs(float(pr.angle(p[None, :], proj[None, :])[0]) - min(dists)) < 1e-12


def test_is_valid():
    good = np.array([[1, 0, 0], [0, 1, 0]], dtype=np.float64)
    assert S2Polyline.is_valid_vertices(good)
    assert not S2Polyline.is_valid_vertices(np.array([[1, 0, 0], [1, 0, 0]], dtype=np.float64))
    assert not S2Polyline.is_valid_vertices(np.array([[1, 0, 0], [-1, 0, 0]], dtype=np.float64))
    assert not S2Polyline.is_valid_vertices(np.array([[2, 0, 0]], dtype=np.float64))
