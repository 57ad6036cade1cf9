"""The ``mujoco_utils`` migration shim (C8, round-3 VERDICT #7).

Custom envs built on the reference call its name-keyed MuJoCo helpers
(reference ``utils/mujoco_utils.py``).  This suite runs REFERENCE-STYLE
snippets unmodified against (a) the engine's 3D mirror model through the
shim, cross-checked value-for-value against the reference implementation on
the same model, and (b) the engine state through the adapters'
``get_mover_qpos/qvel/qacc`` (reference ``basic_envs.py:801-855`` semantics).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import import_reference, reference_available

from gymnasium_planar_robotics_tpu.models import planning
from gymnasium_planar_robotics_tpu.utils import mujoco_utils


def _mirror(num_movers=2):
    from gymnasium_planar_robotics_tpu.utils.mujoco_viewer import MujocoViewerCollection

    _, params = planning.make_planning_env(np.ones((3, 3)), num_movers, dtype=jnp.float32)
    vc = MujocoViewerCollection(params, use_mj_passive_viewer=False)
    return vc.model, vc.data


def test_model_names_registry_over_mirror_model():
    model, data = _mirror()
    names = mujoco_utils.MujocoModelNames(model)
    assert 'mover_0' in names.body_name2id and 'mover_1' in names.body_name2id
    assert 'mover_joint_0' in names.joint_name2id
    assert 'goal_site_mover_0' in names.site_name2id
    # id2name inverts name2id
    for n, i in names.body_name2id.items():
        assert names.body_id2name[i] == n
    # reference-style discovery snippet (benchmark_planning_env.py:231-236)
    joints = mujoco_utils.get_mujoco_type_names(model, obj_type='joint', name_pattern='mover')
    assert joints == ['mover_joint_0', 'mover_joint_1']
    with pytest.raises(AttributeError):
        names.tendon_names  # not one of the 7 indexed types


def test_joint_accessors_roundtrip_and_widths():
    model, data = _mirror()
    q = mujoco_utils.get_joint_qpos(model, data, 'mover_joint_0')
    assert q.shape == (7,)
    v = mujoco_utils.get_joint_qvel(model, data, 'mover_joint_0')
    a = mujoco_utils.get_joint_qacc(model, data, 'mover_joint_0')
    assert v.shape == (6,) and a.shape == (6,)

    new_q = np.array([0.3, 0.4, 0.05, 1.0, 0.0, 0.0, 0.0])
    mujoco_utils.set_joint_qpos(model, data, 'mover_joint_1', new_q)
    np.testing.assert_array_equal(mujoco_utils.get_joint_qpos(model, data, 'mover_joint_1'), new_q)
    # writes are a copy, not a view
    new_q[0] = 9.0
    assert mujoco_utils.get_joint_qpos(model, data, 'mover_joint_1')[0] == 0.3

    new_v = np.array([0.1, -0.2, 0.0, 0.0, 0.0, 0.3])
    mujoco_utils.set_joint_qvel(model, data, 'mover_joint_1', new_v)
    np.testing.assert_array_equal(mujoco_utils.get_joint_qvel(model, data, 'mover_joint_1'), new_v)

    with pytest.raises(AssertionError):
        mujoco_utils.set_joint_qpos(model, data, 'mover_joint_0', np.zeros(3))
    with pytest.raises(KeyError):
        mujoco_utils.get_joint_qpos(model, data, 'no_such_joint')


@pytest.mark.skipif(not reference_available(), reason='reference repo not mounted')
def test_shim_matches_reference_implementation_on_same_model():
    """Value-for-value parity with the reference's own mujoco_utils over the
    mirror model: extract_mj_names tables and every joint accessor."""
    import_reference()
    import mujoco
    from gymnasium_planar_robotics.utils import mujoco_utils as ref_mu

    model, data = _mirror()
    data.qpos[:] = np.arange(model.nq) * 0.01
    data.qvel[:] = np.arange(model.nv) * 0.02
    data.qacc[:] = np.arange(model.nv) * 0.03

    for tname in mujoco_utils.MJ_OBJ_TYPES:
        obj_type = getattr(mujoco.mjtObj, tname)
        ours = mujoco_utils.extract_mj_names(model, obj_type)
        theirs = ref_mu.extract_mj_names(model, obj_type)
        assert ours[0] == theirs[0], tname
        assert ours[1] == theirs[1], tname
        assert ours[2] == theirs[2], tname

    for jname in ('mover_joint_0', 'mover_joint_1'):
        np.testing.assert_array_equal(
            mujoco_utils.get_joint_qpos(model, data, jname),
            ref_mu.get_joint_qpos(model, data, jname),
        )
        np.testing.assert_array_equal(
            mujoco_utils.get_joint_qvel(model, data, jname),
            ref_mu.get_joint_qvel(model, data, jname),
        )
        np.testing.assert_array_equal(
            mujoco_utils.get_joint_qacc(model, data, jname),
            ref_mu.get_joint_qacc(model, data, jname),
        )

    assert (
        mujoco_utils.get_mujoco_type_names(model, 'body', 'mover')
        == ref_mu.get_mujoco_type_names(model, 'body', 'mover')
    )


def test_set_actuator_ctrl_via_custom_hook_scene():
    """Reference-style actuator injection + control write: a custom
    actuator XML hook (the reference's _custom_xml_string_callback pattern,
    benchmark_planning_env.py:293-334) compiled into a scene, then
    set_actuator_ctrl / get_mujoco_type_names drive it unmodified."""
    import mujoco

    from gymnasium_planar_robotics_tpu.utils import scene_export

    _, params = planning.make_planning_env(np.ones((3, 3)), 1, dtype=jnp.float32)
    hook = (
        '<actuator>'
        '<general name="mover_actuator_x_0" joint="mover_joint_0" gear="1 0 0 0 0 0" gainprm="1.24 0 0"/>'
        '<general name="mover_actuator_y_0" joint="mover_joint_0" gear="0 1 0 0 0 0" gainprm="1.24 0 0"/>'
        '</actuator>'
    )
    xml = scene_export.export_scene_xml(
        params, custom_xml_strings={'custom_outworldbody_xml_str': hook}
    )
    model = mujoco.MjModel.from_xml_string(xml)
    data = mujoco.MjData(model)

    # unmodified reference snippet (benchmark_planning_env.py:231-236, 444-450)
    xs = mujoco_utils.get_mujoco_type_names(model, obj_type='actuator', name_pattern='mover_actuator_x')
    ys = mujoco_utils.get_mujoco_type_names(model, obj_type='actuator', name_pattern='mover_actuator_y')
    assert xs == ['mover_actuator_x_0'] and ys == ['mover_actuator_y_0']
    mujoco_utils.set_actuator_ctrl(model, data, xs[0], 1.5)
    mujoco_utils.set_actuator_ctrl(model, data, ys[0], -0.5)
    np.testing.assert_array_equal(data.ctrl, [1.5, -0.5])


def test_env_level_name_keyed_accessors():
    """Adapter get_mover_qpos/qvel/qacc: reference shapes and semantics
    (z rebased to bottom-above-tile = initial_mover_zpos, identity quat,
    per-call noise from the dedicated reseeded stream)."""
    from gymnasium_planar_robotics_tpu.envs.gym_env import PlanningGymEnv

    env = PlanningGymEnv(num_movers=2, dtype=jnp.float32, std_noise=1e-3)
    obs, info = env.reset(seed=5)
    assert env.mover_names == ['mover_0', 'mover_1']

    # reference-style array stack (basic_envs.py:1244-1290 pattern)
    qpos = np.stack([env.get_mover_qpos(name) for name in env.mover_names])
    qvel = np.stack([env.get_mover_qvel(name) for name in env.mover_names])
    qacc = np.stack([env.get_mover_qacc(name) for name in env.mover_names])
    assert qpos.shape == (2, 7) and qvel.shape == (2, 6) and qacc.shape == (2, 6)

    state_pos = np.asarray(env._state.pos)
    np.testing.assert_allclose(qpos[:, :2], state_pos, atol=1e-12)  # no noise requested
    np.testing.assert_allclose(qpos[:, 2], 0.003, atol=1e-12)  # z = initial_mover_zpos
    np.testing.assert_allclose(qpos[:, 3:], [[1, 0, 0, 0]] * 2, atol=1e-12)
    np.testing.assert_allclose(qvel[:, :2], np.asarray(env._state.vel), atol=1e-12)
    np.testing.assert_allclose(qacc[:, :2], np.asarray(env._state.acc), atol=1e-12)

    # noisy reads differ from the state but stay within ~6 sigma
    noisy = np.stack([env.get_mover_qpos(n, add_noise=True) for n in env.mover_names])
    d = noisy[:, :2] - state_pos
    assert (np.abs(d) > 0).all() and (np.abs(d) < 6e-3).all()

    # the noise stream reseeds with the env: same seed + same CALL SEQUENCE
    # => same noisy reads (noiseless calls consume draws too — the
    # reference's scale-by-gate trick, basic_envs.py:828)
    env.reset(seed=5)
    for name in env.mover_names:
        env.get_mover_qpos(name)
    for name in env.mover_names:
        env.get_mover_qvel(name)
    for name in env.mover_names:
        env.get_mover_qacc(name)
    again = np.stack([env.get_mover_qpos(n, add_noise=True) for n in env.mover_names])
    np.testing.assert_array_equal(noisy, again)
    env.close()


def test_pushing_env_accessors_too():
    from gymnasium_planar_robotics_tpu.envs.gym_env import PushingGymEnv

    env = PushingGymEnv(dtype=jnp.float32)
    env.reset(seed=3)
    assert env.mover_names == ['mover_0']
    q = env.get_mover_qpos('mover_0')
    np.testing.assert_allclose(q[:2], np.asarray(env._state.pos), atol=1e-12)
    env.step(np.asarray(env.action_space.sample()))
    v = env.get_mover_qvel('mover_0')
    np.testing.assert_allclose(v[:2], np.asarray(env._state.vel), atol=1e-12)
    env.close()
