"""Domain-core facade vs. the reference's BasicPlanarRoboticsEnv methods."""

import numpy as np
import pytest

from gymnasium_planar_robotics_tpu.core import PlanarRoboticsCore

from conftest import import_reference, reference_available


@pytest.mark.skipif(not reference_available(), reason='reference repo not mounted')
def test_facade_matches_reference_methods():
    import_reference()
    from gymnasium_planar_robotics.envs.basic_envs import BasicPlanarRoboticsEnv

    layout = np.array([[1, 1, 1], [1, 1, 0], [1, 1, 1]])
    cparams = {'shape': 'circle', 'size': 0.1, 'offset': 0.01, 'offset_wall': 0.005}
    ref = BasicPlanarRoboticsEnv(layout_tiles=layout, num_movers=1, render_mode=None, collision_params=cparams)
    core = PlanarRoboticsCore(layout, collision_params=cparams)

    tx, ty = core.get_tile_xy_pos()
    np.testing.assert_allclose(tx, ref.x_pos_tiles)
    np.testing.assert_allclose(ty, ref.y_pos_tiles)

    rng = np.random.default_rng(5)
    qpos = np.zeros((128, 7))
    qpos[:, :2] = rng.uniform(0.02, 0.70, size=(128, 2))
    qpos[:, 3] = 1.0
    for off in (False, True):
        np.testing.assert_array_equal(
            core.qpos_is_valid(qpos, add_safety_offset=off),
            ref.qpos_is_valid(qpos=qpos, c_size=0.1, add_safety_offset=off),
        )
        np.testing.assert_array_equal(
            core.check_wall_collision(qpos, add_safety_offset=off),
            ref.check_wall_collision(mover_names=['m'], c_size=0.1, add_safety_offset=off, mover_qpos=qpos),
        )

    pair = np.zeros((2, 7))
    pair[:, 3] = 1.0
    pair[0, :2] = [0.3, 0.3]
    pair[1, :2] = [0.45, 0.3]
    assert core.check_mover_collision(pair) == bool(
        ref.check_mover_collision(mover_names=['a', 'b'], c_size=0.1, mover_qpos=pair)
    )


def test_mesh_mover_shape_resolves_size():
    import jax.numpy as jnp

    from gymnasium_planar_robotics_tpu.models import planning
    from gymnasium_planar_robotics_tpu.utils import meshes

    config, params = planning.make_planning_env(
        np.ones((3, 3)), 2, dtype=jnp.float64,
        mover_params={'shape': 'mesh', 'mesh': {'mover_stl_path': 'beckhoff_apm4220_mover'}},
    )
    expect = np.asarray(meshes.PREDEFINED_MESH_DIMS['beckhoff_apm4220_mover']) / 2
    np.testing.assert_allclose(np.asarray(params.mover_size)[0], expect, atol=1e-6)


@pytest.mark.skipif(not reference_available(), reason='reference repo not mounted')
def test_get_tile_indices_mask_matches_reference():
    """The windowed pattern search equals the reference's double-loop
    implementation (basic_envs.py:1312-1340) over random layouts and every
    mask shape its wall-collision machinery uses (3x3 + the four 2x2
    corner patterns), plus odd/even rectangular masks."""
    import_reference()
    import numpy as _np

    from gymnasium_planar_robotics.envs.basic_envs import BasicPlanarRoboticsEnv

    from gymnasium_planar_robotics_tpu.core import PlanarRoboticsCore

    rng = _np.random.default_rng(5)
    masks = [
        _np.ones((3, 3)),
        _np.array([[1, 1], [1, 0]]), _np.array([[1, 1], [0, 1]]),
        _np.array([[1, 0], [1, 1]]), _np.array([[0, 1], [1, 1]]),
        _np.ones((1, 2)), _np.array([[1, 0, 1]]), _np.ones((2, 3)),
    ]
    for trial in range(4):
        layout = (rng.random((rng.integers(3, 6), rng.integers(3, 6))) > 0.3).astype(_np.int8)
        layout[0, 0] = 1  # keep at least one tile
        ref = BasicPlanarRoboticsEnv(layout_tiles=layout, num_movers=1, render_mode=None,
                                     initial_mover_start_xy_pos=_np.asarray(ref_start(layout)))
        mine = PlanarRoboticsCore(layout)
        for mask in masks:
            rx, ry = ref.get_tile_indices_mask(mask.astype(layout.dtype))
            mx, my = mine.get_tile_indices_mask(mask)
            # both return x-major order; compare the index PAIRS exactly
            _np.testing.assert_array_equal(
                _np.stack([rx, ry], -1).reshape(-1, 2),
                _np.stack([mx, my], -1).reshape(-1, 2), err_msg=f'{mask.shape}')


def ref_start(layout):
    """A start position above some existing tile (reference reset sampling
    needs a valid initial pose for model construction)."""
    import numpy as _np

    i, j = _np.argwhere(layout)[0]
    return [[(2 * i + 1) * 0.12, (2 * j + 1) * 0.12]]
