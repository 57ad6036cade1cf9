"""Golden + fuzz tests for the batched 2D geometry kernels.

Golden cases reproduce the reference truth tables
(``/root/reference/tests/test_geometry_2D_utils.py``); the fuzz tests
cross-validate against the reference NumPy implementation directly.
"""

import numpy as np
import pytest

from gymnasium_planar_robotics_tpu.ops import geometry

from conftest import import_reference, reference_available


SEG_CASES = [
    # (p1, p2, q1, q2, expected) — reference tests/test_geometry_2D_utils.py:10-100
    ([0, 0], [1, 1], [0, 0], [1, 0.5], True),
    ([0, 0], [1, 1], [0.1, 0.5], [1, 1], True),
    ([0, 0], [1, 1], [1, 0.5], [1, 1], True),
    ([0, 0], [1, 1], [0.5, 0.5], [1, 0.8], True),
    ([0, 0], [1, 1], [0.5, 0.5], [-1, 0.8], True),
    ([0.5, 0.5], [1, 0.8], [0, 0], [1, 1], True),
    ([0.5, 0.5], [-1, 0.8], [0, 0], [1, 1], True),
    ([0, 1], [1, 1], [1, 0], [0, 0.5], False),
    ([1, 0], [0, 0.5], [0, 1], [1, 1], False),
    ([0, 1], [1, 1], [-2, 0], [-1, 1], False),
    ([-2, 0], [-1, 1], [0, 1], [1, 1], False),
    ([0, 1], [1, 1], [1, 0], [0, 2], True),
    ([0, 1], [1, 1], [0, 0], [1, 2], True),
    ([0, 1], [1, 1], [0, 1], [1, 1], True),
    ([0, 0], [1, 1], [0.5, 0.5], [2, 2], True),
    ([0, 0], [-1, -1], [-0.5, -0.5], [-2, -2], True),
]


def test_segment_intersect_truth_table():
    p1 = np.array([c[0] for c in SEG_CASES], dtype=np.float64)
    p2 = np.array([c[1] for c in SEG_CASES], dtype=np.float64)
    q1 = np.array([c[2] for c in SEG_CASES], dtype=np.float64)
    q2 = np.array([c[3] for c in SEG_CASES], dtype=np.float64)
    expected = np.array([c[4] for c in SEG_CASES])
    got = np.asarray(geometry.check_line_segments_intersect(p1, p2, q1, q2))
    np.testing.assert_array_equal(got, expected)


def _quat45():
    return [0.9238795, 0.0, 0.0, 0.3826834]


RECT_CASES = [
    # (xy1, quat1, xy2, quat2, expected) with half-size 0.08x0.08 each —
    # reference tests/test_geometry_2D_utils.py:103-164
    ([0.05, 0.05], _quat45(), [0.05, 0.05], [1, 0, 0, 0], True),
    ([0, 0], [1, 0, 0, 0], [-0.16, -0.16], [1, 0, 0, 0], True),
    ([0, 0], [1, 0, 0, 0], [-0.16, 0.16], [1, 0, 0, 0], True),
    ([0, 0], [1, 0, 0, 0], [0.16, 0.16], [1, 0, 0, 0], True),
    ([0, 0], [1, 0, 0, 0], [0.16, -0.16], [1, 0, 0, 0], True),
    ([0, 0], [1, 0, 0, 0], [-0.08, -0.16], [1, 0, 0, 0], True),
    ([0, 0], [1, 0, 0, 0], [0.16, -0.08], [1, 0, 0, 0], True),
    ([0, 0], [1, 0, 0, 0], [-0.16, -0.08], [1, 0, 0, 0], True),
    ([0, 0], [1, 0, 0, 0], [-np.sqrt(2) * 0.08 - 0.08, -0.08], _quat45(), True),
    ([0, 0], [1, 0, 0, 0], [-np.sqrt(2) * 0.08 - 0.08, 0.08], _quat45(), True),
    ([0, 0], [1, 0, 0, 0], [-np.sqrt(2) * 0.08 - 0.08, -0.04], _quat45(), True),
    ([0, 0], [1, 0, 0, 0], [np.sqrt(2) * 0.08 + 0.08, 0.08], _quat45(), True),
    ([0, 0], [1, 0, 0, 0], [np.sqrt(2) * 0.08 + 0.08, -0.08], _quat45(), True),
    ([0, 0], [1, 0, 0, 0], [np.sqrt(2) * 0.08 + 0.08, -0.04], _quat45(), True),
]


def test_rectangles_intersect_truth_table():
    n = len(RECT_CASES)
    qpos1 = np.zeros((n, 7))
    qpos2 = np.zeros((n, 7))
    for i, (xy1, quat1, xy2, quat2, _) in enumerate(RECT_CASES):
        qpos1[i, :2] = xy1
        qpos1[i, 3:] = quat1
        qpos2[i, :2] = xy2
        qpos2[i, 3:] = quat2
    size = np.full((n, 2), 0.08)
    expected = np.array([c[4] for c in RECT_CASES])
    got = np.asarray(geometry.check_rectangles_intersect(qpos1, qpos2, size, size))
    np.testing.assert_array_equal(got, expected)


def test_rect_vertices_shape_and_values():
    qpos = np.zeros((3, 7))
    qpos[:, 3] = 1.0
    qpos[1, :2] = [2.0, 3.0]
    # 90 degree rotation about z
    qpos[2, 3:] = [np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)]
    size = np.array([[1.0, 0.5]] * 3)
    v = np.asarray(geometry.get_2D_rect_vertices(qpos, size))
    assert v.shape == (3, 2, 4)
    np.testing.assert_allclose(v[0], [[-1, -1, 1, 1], [-0.5, 0.5, 0.5, -0.5]], atol=1e-12)
    np.testing.assert_allclose(v[1], [[1, 1, 3, 3], [2.5, 3.5, 3.5, 2.5]], atol=1e-12)
    # 90°: (x,y)_local -> (-y, x)_base
    np.testing.assert_allclose(v[2], [[0.5, -0.5, -0.5, 0.5], [-1, -1, 1, 1]], atol=1e-9)


@pytest.mark.skipif(not reference_available(), reason='reference repo not mounted')
def test_segment_intersect_fuzz_vs_reference():
    import_reference()
    from gymnasium_planar_robotics.utils import geometry_2D_utils as ref_geo

    rng = np.random.default_rng(0)
    n = 4096
    pts = rng.uniform(-1, 1, size=(4, n, 2))
    # include exactly-touching / collinear structure: snap some points to a grid
    snap = rng.random((4, n, 2)) < 0.4
    pts = np.where(snap, np.round(pts * 4) / 4, pts)
    p1, p2, q1, q2 = pts
    expected = ref_geo.check_line_segments_intersect(p1=p1, p2=p2, q1=q1, q2=q2)
    got = np.asarray(geometry.check_line_segments_intersect(p1, p2, q1, q2))
    np.testing.assert_array_equal(got, expected)


@pytest.mark.skipif(not reference_available(), reason='reference repo not mounted')
def test_rectangles_intersect_fuzz_vs_reference():
    import_reference()
    from gymnasium_planar_robotics.utils import geometry_2D_utils as ref_geo

    rng = np.random.default_rng(1)
    n = 2048
    qpos1 = np.zeros((n, 7))
    qpos2 = np.zeros((n, 7))
    qpos1[:, :2] = rng.uniform(-0.3, 0.3, size=(n, 2))
    qpos2[:, :2] = rng.uniform(-0.3, 0.3, size=(n, 2))
    ang1 = rng.uniform(-np.pi, np.pi, size=n)
    ang2 = rng.uniform(-np.pi, np.pi, size=n)
    qpos1[:, 3] = np.cos(ang1 / 2)
    qpos1[:, 6] = np.sin(ang1 / 2)
    qpos2[:, 3] = np.cos(ang2 / 2)
    qpos2[:, 6] = np.sin(ang2 / 2)
    size1 = rng.uniform(0.02, 0.15, size=(n, 2))
    size2 = rng.uniform(0.02, 0.15, size=(n, 2))
    expected = ref_geo.check_rectangles_intersect(qpos_r1=qpos1, qpos_r2=qpos2, size_r1=size1, size_r2=size2)
    got = np.asarray(geometry.check_rectangles_intersect(qpos1, qpos2, size1, size2))
    np.testing.assert_array_equal(got, expected)
