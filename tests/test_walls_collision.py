"""Cross-validation of the wall-validity and mover-collision kernels.

Oracle = the reference implementation itself (``BasicPlanarRoboticsEnv.
qpos_is_valid`` / ``check_mover_collision``), driven over the same layout
family as the reference's 1,633-line truth-table suite
(``/root/reference/tests/test_basic_env.py``): 2x2 and 3x3 layouts with each
missing-tile pattern, circle and box shapes, axis-aligned and rotated movers,
with and without safety offsets — plus random larger layouts.
"""

import numpy as np
import pytest

from gymnasium_planar_robotics_tpu.ops import collision, grid, walls

from conftest import import_reference, reference_available

pytestmark = pytest.mark.skipif(not reference_available(), reason='reference repo not mounted')


LAYOUTS = {
    '1x1': np.ones((1, 1)),
    '2x2_full': np.ones((2, 2)),
    '2x2_miss_bl': np.array([[1, 1], [0, 1]]),
    '2x2_miss_br': np.array([[1, 1], [1, 0]]),
    '2x2_miss_tl': np.array([[0, 1], [1, 1]]),
    '2x2_miss_tr': np.array([[1, 0], [1, 1]]),
    '3x3_full': np.ones((3, 3)),
    '3x3_miss_corner': np.array([[1, 1, 1], [1, 1, 1], [1, 1, 0]]),
    '3x3_miss_edge': np.array([[1, 0, 1], [1, 1, 1], [1, 1, 1]]),
    '3x3_L': np.array([[1, 0, 0], [1, 1, 1], [1, 1, 1]]),
    '4x4_holes': np.array([[1, 1, 1, 1], [1, 0, 1, 1], [1, 1, 1, 0], [1, 1, 1, 1]]),
    '2x4_strip': np.array([[1, 1, 1, 1], [1, 1, 0, 1]]),
}


def _make_ref_env(layout, c_shape, c_size, offset=0.0, offset_wall=0.0):
    import_reference()
    from gymnasium_planar_robotics.envs.basic_envs import BasicPlanarRoboticsEnv

    return BasicPlanarRoboticsEnv(
        layout_tiles=np.asarray(layout),
        num_movers=1,
        render_mode=None,
        collision_params={'shape': c_shape, 'size': c_size, 'offset': offset, 'offset_wall': offset_wall},
    )


def _random_quats(rng, n, axis_aligned_frac=0.5):
    """Mix of 0/90/45-degree and fully random in-plane rotations."""
    ang = rng.uniform(-np.pi, np.pi, size=n)
    snap = rng.random(n) < axis_aligned_frac
    snapped = rng.choice([0.0, np.pi / 2, np.pi / 4, -np.pi / 4], size=n)
    ang = np.where(snap, snapped, ang)
    quat = np.zeros((n, 4))
    quat[:, 0] = np.cos(ang / 2)
    quat[:, 3] = np.sin(ang / 2)
    return quat


@pytest.mark.parametrize('layout_name', sorted(LAYOUTS))
@pytest.mark.parametrize('c_shape', ['circle', 'box'])
def test_qpos_is_valid_fuzz_vs_reference(layout_name, c_shape):
    layout = LAYOUTS[layout_name]
    rng = np.random.default_rng(hash((layout_name, c_shape)) % 2**31)
    n = 512

    if c_shape == 'circle':
        c_base = 0.11
    else:
        c_base = np.array([0.155 / 2, 0.155 / 2])
    env = _make_ref_env(layout, c_shape, c_base)
    g = grid.make_tile_grid(layout)

    # keep positions inside the grid bounding box (the reference asserts
    # coverage, basic_envs.py:514-517)
    hi = np.array([layout.shape[0] * 0.24, layout.shape[1] * 0.24])
    qpos = np.zeros((n, 7))
    qpos[:, :2] = rng.uniform(0.0, 1.0, size=(n, 2)) * hi
    qpos[:, 3:] = _random_quats(rng, n)

    # per-qpos sizes in a realistic range (up to ~tile half-size)
    if c_shape == 'circle':
        c_size = rng.uniform(0.02, 0.12, size=n)
    else:
        c_size = rng.uniform(0.02, 0.12, size=(n, 2))

    expected = env.qpos_is_valid(qpos=qpos, c_size=c_size, add_safety_offset=False)
    got = np.asarray(
        walls.qpos_is_valid(g, qpos[:, :2], c_size, quat=qpos[:, 3:], collision_shape=c_shape)
    ).astype(int)
    np.testing.assert_array_equal(got, expected, err_msg=f'{layout_name}/{c_shape}')


@pytest.mark.parametrize('c_shape', ['circle', 'box'])
def test_qpos_is_valid_with_offsets_vs_reference(c_shape):
    """Reference applies offsets by inflating c_size (basic_envs.py:487); we
    pass the inflated size explicitly — verify the convention end to end."""
    layout = LAYOUTS['3x3_miss_corner']
    rng = np.random.default_rng(7)
    n = 256
    offset, offset_wall = 0.013, 0.021
    c_base = 0.08 if c_shape == 'circle' else np.array([0.06, 0.09])
    env = _make_ref_env(layout, c_shape, c_base, offset=offset, offset_wall=offset_wall)
    g = grid.make_tile_grid(layout)

    hi = np.array([layout.shape[0] * 0.24, layout.shape[1] * 0.24])
    qpos = np.zeros((n, 7))
    qpos[:, :2] = rng.uniform(0.0, 1.0, size=(n, 2)) * hi
    qpos[:, 3:] = _random_quats(rng, n)

    expected = env.qpos_is_valid(qpos=qpos, c_size=c_base, add_safety_offset=True)
    c_eff = np.broadcast_to(np.asarray(c_base), (n,) if c_shape == 'circle' else (n, 2)) + offset + offset_wall
    got = np.asarray(
        walls.qpos_is_valid(g, qpos[:, :2], c_eff, quat=qpos[:, 3:], collision_shape=c_shape)
    ).astype(int)
    np.testing.assert_array_equal(got, expected)


@pytest.mark.parametrize('c_shape', ['circle', 'box'])
@pytest.mark.parametrize('num_movers', [2, 3, 5])
def test_check_mover_collision_fuzz_vs_reference(c_shape, num_movers):
    layout = np.ones((4, 4))
    c_size = 0.11 if c_shape == 'circle' else np.array([0.0775, 0.0775])
    env = _make_ref_env(layout, c_shape, c_size, offset=0.0)
    rng = np.random.default_rng(1234 + num_movers)

    n_trials = 200
    mismatches = []
    for t in range(n_trials):
        qpos = np.zeros((num_movers, 7))
        # cluster positions so that collisions actually occur in the sample
        qpos[:, :2] = rng.uniform(0.1, 0.6, size=(num_movers, 2))
        qpos[:, 3:] = _random_quats(rng, num_movers)
        expected = env.check_mover_collision(
            mover_names=[f'm{i}' for i in range(num_movers)], c_size=c_size, mover_qpos=qpos
        )
        csz = np.broadcast_to(np.atleast_1d(c_size), (num_movers,) if c_shape == 'circle' else (num_movers, 2))
        got = bool(
            collision.check_mover_collision(qpos[:, :2], csz, quat=qpos[:, 3:], collision_shape=c_shape)
        )
        if got != bool(expected):
            mismatches.append((t, got, bool(expected)))
    assert not mismatches, mismatches[:5]
