"""MJCF export: the generated scene must compile in MuJoCo and place bodies
exactly where the engine state says they are."""

import numpy as np
import pytest

import jax.numpy as jnp

from gymnasium_planar_robotics_tpu.models import planning, pushing
from gymnasium_planar_robotics_tpu.utils import scene_export

mujoco = pytest.importorskip('mujoco')


def test_planning_scene_compiles_and_matches():
    layout = np.array([[1, 1, 1], [1, 1, 1], [1, 1, 0]])
    config, params = planning.make_planning_env(layout, num_movers=2, dtype=jnp.float64)
    mover_xy = np.array([[0.2, 0.2], [0.5, 0.4]])
    goals = np.array([[0.55, 0.55], [0.15, 0.5]])
    xml = scene_export.export_scene_xml(params, mover_xy=mover_xy, goals_xy=goals)

    model = mujoco.MjModel.from_xml_string(xml)
    data = mujoco.MjData(model)
    mujoco.mj_forward(model, data)

    # 8 tiles (one missing), 2 movers, 2 goal sites
    tile_geoms = [model.geom(i).name for i in range(model.ngeom) if model.geom(i).name.startswith('tile_')]
    assert len(tile_geoms) == 8
    for k in range(2):
        body = model.body(f'mover_{k}')
        np.testing.assert_allclose(data.xpos[body.id][:2], mover_xy[k], atol=1e-12)
    assert model.site(f'goal_site_mover_1') is not None


def test_pushing_scene_with_object():
    config, params = pushing.make_pushing_env(dtype=jnp.float64)
    xml = scene_export.export_scene_xml(
        params, mover_xy=np.array([[0.3, 0.3]]), object_xy=np.array([0.5, 0.5]),
        object_goal_xy=np.array([0.6, 0.6]),
    )
    model = mujoco.MjModel.from_xml_string(xml)
    assert model.body('object') is not None
    assert model.site('object_goal_site') is not None
    # timestep parity with the reference scene (basic_envs.py:1132)
    assert model.opt.timestep == 0.001


def test_mesh_mover_scene_compiles_with_real_silhouettes():
    """mover_shape='mesh' emits mesh assets (regenerated real silhouettes:
    rounded-corner slab mover + hollow-frame bumper) and compiles; the
    bumper geom carries its own mass on the body (basic_envs.py:911-925)."""
    mover_params = {'shape': 'mesh', 'mesh': {'bumper_mass': 0.35}}
    config, params = planning.make_planning_env(
        np.ones((3, 3)), num_movers=1, dtype=jnp.float64, mover_params=mover_params
    )
    xml = scene_export.export_scene_xml(
        params, mover_xy=np.array([[0.3, 0.3]]), mover_shape='mesh',
        mesh_cfg=mover_params['mesh'],
    )
    assert '<mesh name="mover_mesh"' in xml and '<mesh name="bumper_mesh"' in xml
    model = mujoco.MjModel.from_xml_string(xml)
    assert model.geom('bumper_geom_0') is not None
    # composed body mass = mover + bumper, like the reference's compiled model
    np.testing.assert_allclose(float(model.body('mover_0').mass[0]), 1.24 + 0.35, atol=1e-6)
    # the mesh AABB matches the engine's resolved mover size
    mid = model.geom('mover_geom_0').dataid[0]
    v0 = model.mesh_vertadr[mid]
    v1 = v0 + model.mesh_vertnum[mid]
    verts = model.mesh_vert[v0:v1]
    # MuJoCo re-orients mesh assets to principal axes (compensated by the
    # stored mesh_quat), permuting the raw vertex-buffer AABB — compare sorted
    np.testing.assert_allclose(
        np.sort((verts.max(0) - verts.min(0)) / 2),
        np.sort(np.asarray(params.mover_size[0])), atol=1e-5,
    )


def test_custom_hooks_injected():
    config, params = planning.make_planning_env(np.ones((2, 2)), num_movers=1, dtype=jnp.float64)
    xml = scene_export.export_scene_xml(
        params,
        mover_xy=np.array([[0.2, 0.2]]),
        custom_xml_strings={
            'custom_worldbody_xml_str': '      <site name="my_probe" pos="0.1 0.1 0.1" size="0.01"/>',
            'custom_outworldbody_xml_str': (
                '  <actuator>\n'
                '    <general name="mover_actuator_x_0" joint="mover_joint_0" gear="1 0 0 0 0 0" '
                'gaintype="fixed" gainprm="1.24 0 0" biastype="none"/>\n'
                '  </actuator>'
            ),
        },
    )
    model = mujoco.MjModel.from_xml_string(xml)
    assert model.site('my_probe') is not None
    assert model.actuator('mover_actuator_x_0') is not None


def test_unknown_hook_rejected():
    config, params = planning.make_planning_env(np.ones((2, 2)), num_movers=1, dtype=jnp.float64)
    with pytest.raises(AssertionError):
        scene_export.export_scene_xml(params, custom_xml_strings={'bogus_key': ''})
