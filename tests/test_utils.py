"""Utils: STL parsing/sizing, predefined mesh generation, impedance control."""

import numpy as np
import pytest

import jax.numpy as jnp

from gymnasium_planar_robotics_tpu.utils import impedance, meshes

from conftest import reference_available


def test_write_and_measure_box_stl(tmp_path):
    p = tmp_path / 'box.stl'
    meshes.write_box_stl(p, (0.1, 0.2, 0.012))
    half = meshes.mesh_half_extents(p)
    np.testing.assert_allclose(half, [0.05, 0.1, 0.006], atol=1e-7)
    # scale behaves like MuJoCo mesh scale (basic_envs.py:1435)
    half2 = meshes.mesh_half_extents(p, scale=(2.0, 1.0, 0.5))
    np.testing.assert_allclose(half2, [0.1, 0.1, 0.003], atol=1e-7)


def test_predefined_mesh_resolution(tmp_path):
    path = meshes.resolve_mesh_path('beckhoff_apm4330_mover', asset_dir=tmp_path)
    assert path.exists()
    half = meshes.mesh_half_extents(path)
    np.testing.assert_allclose(2 * half, meshes.PREDEFINED_MESH_DIMS['beckhoff_apm4330_mover'], atol=1e-6)
    # all 11 names resolve
    for name in meshes.PREDEFINED_MESH_DIMS:
        assert meshes.resolve_mesh_path(name, asset_dir=tmp_path).exists()


@pytest.mark.skipif(not reference_available(), reason='reference repo not mounted')
def test_predefined_dims_match_reference_assets():
    """Our dimension table must equal the AABB of the reference's real assets."""
    from pathlib import Path

    ref_assets = Path('/root/reference/gymnasium_planar_robotics/envs/assets')
    file_map = {
        'planar_motor_M3-06': 'planar_motor_M3-06-04.stl',
        'planar_motor_M3-15': 'planar_motor_M3-15-05.stl',
        'planar_motor_M3-25': 'planar_motor_M3-25-05.stl',
        'planar_motor_M4-11': 'planar_motor_M4-11-01.stl',
        'planar_motor_M4-18': 'planar_motor_M4-18-01.stl',
    }
    for name, dims in meshes.PREDEFINED_MESH_DIMS.items():
        f = ref_assets / file_map.get(name, f'{name}.stl')
        if not f.exists():
            continue
        half = meshes.mesh_half_extents(f)
        np.testing.assert_allclose(2 * half, dims, atol=2e-4, err_msg=name)


def _surface_samples(path, n=8000, seed=0):
    """Area-weighted uniform samples on an STL's triangle surface."""
    import struct

    data = open(path, 'rb').read()
    (cnt,) = struct.unpack('<I', data[80:84])
    raw = np.frombuffer(data[84 : 84 + cnt * 50], dtype=np.uint8).reshape(cnt, 50)
    t = raw[:, 12:48].copy().view('<f4').astype(np.float64).reshape(-1, 3, 3)
    area = 0.5 * np.linalg.norm(np.cross(t[:, 1] - t[:, 0], t[:, 2] - t[:, 0]), axis=1)
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(t), n, p=area / area.sum())
    u, v = rng.random((2, n))
    sw = np.sqrt(u)
    a, b, c = t[idx, 0], t[idx, 1], t[idx, 2]
    return a * (1 - sw)[:, None] + b * (sw * (1 - v))[:, None] + c * (sw * v)[:, None]


@pytest.mark.skipif(not reference_available(), reason='reference repo not mounted')
def test_predefined_mesh_silhouette_matches_reference(tmp_path):
    """The regenerated predefined meshes match the REAL assets' geometry to a
    measured surface-Hausdorff bound (round-2 VERDICT item #7): movers are
    rounded-corner slabs, bumpers rounded-corner frames.  Bounds: Beckhoff
    family <= 9 mm (sampling floor ~3 mm); Planar Motor <= 25 mm (their
    interior mounting-hole detail is not reproduced — silhouette only)."""
    from pathlib import Path

    from scipy.spatial import cKDTree

    ref_assets = Path('/root/reference/gymnasium_planar_robotics/envs/assets')
    file_map = {
        'planar_motor_M3-06': 'planar_motor_M3-06-04.stl',
        'planar_motor_M3-15': 'planar_motor_M3-15-05.stl',
        'planar_motor_M3-25': 'planar_motor_M3-25-05.stl',
        'planar_motor_M4-11': 'planar_motor_M4-11-01.stl',
        'planar_motor_M4-18': 'planar_motor_M4-18-01.stl',
    }
    for name in meshes.PREDEFINED_MESH_DIMS:
        ref_file = ref_assets / file_map.get(name, f'{name}.stl')
        if not ref_file.exists():
            continue
        mine_path = meshes.resolve_mesh_path(name, asset_dir=tmp_path)
        pa = _surface_samples(mine_path)
        pb = _surface_samples(ref_file)
        h = max(cKDTree(pb).query(pa)[0].max(), cKDTree(pa).query(pb)[0].max())
        bound = 0.025 if name.startswith('planar_motor') else 0.009
        assert h < bound, f'{name}: surface Hausdorff {h*1e3:.1f}mm >= {bound*1e3:.0f}mm'


@pytest.mark.skipif(not reference_available(), reason='reference repo not mounted')
def test_bumper_meshes_are_frames(tmp_path):
    """The real bumpers are hollow frames that wrap the mover; the regenerated
    ones must have the same inner opening (a solid box here would render a
    visibly wrong 3D mirror view)."""
    for name in ('beckhoff_apm4220_bumper', 'beckhoff_apm4330_bumper', 'beckhoff_apm4550_bumper'):
        v = meshes.read_stl_vertices(meshes.resolve_mesh_path(name, asset_dir=tmp_path))
        # inner-wall vertices sit on the square opening: Chebyshev distance
        opening = np.abs(v[:, :2]).max(axis=1).min()
        want = meshes.PREDEFINED_MESH_STYLE[name]['inner_half']
        assert abs(opening - want) < 2e-3, f'{name}: opening {opening:.4f} vs {want:.4f}'


def test_stale_generated_assets_regenerate(tmp_path):
    """Assets written by an older generator (no version tag) are replaced."""
    p = tmp_path / 'beckhoff_apm4330_mover.stl'
    meshes.write_box_stl(p, meshes.PREDEFINED_MESH_DIMS['beckhoff_apm4330_mover'])
    assert not open(p, 'rb').read(80).startswith(b'gprt-stl')
    path = meshes.resolve_mesh_path('beckhoff_apm4330_mover', asset_dir=tmp_path)
    assert open(path, 'rb').read(80).startswith(b'gprt-stl')


def test_resolve_mover_size_shapes(tmp_path):
    direct = meshes.resolve_mover_size('box', [0.07, 0.07, 0.006])
    np.testing.assert_allclose(direct, [0.07, 0.07, 0.006])
    via_mesh = meshes.resolve_mover_size('mesh', None, 'beckhoff_apm4220_mover', asset_dir=tmp_path)
    np.testing.assert_allclose(2 * via_mesh, meshes.PREDEFINED_MESH_DIMS['beckhoff_apm4220_mover'], atol=1e-6)


# ---------------------------------------------------------------------------
# impedance
# ---------------------------------------------------------------------------


def test_impedance_critical_damping_rule():
    g = impedance.make_gains(1.24, translational_stiffness=1.0, rotational_stiffness=0.1)
    np.testing.assert_allclose(np.asarray(g.damping[:3]), 2 * np.sqrt(1.0 * 1.24))
    np.testing.assert_allclose(np.asarray(g.damping[3:]), 2 * np.sqrt(0.1 * 1.24))


def test_impedance_wrench_restoring():
    g = impedance.make_gains(1.0, 2.0, 0.5, joint_mask=np.array([0, 0, 1, 1, 1, 1]))
    pos = jnp.asarray([0.1, 0.2, 0.05])
    quat = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    vel = jnp.zeros(6)
    w = impedance.impedance_wrench(g, pos, quat, vel, jnp.asarray([0.0, 0.0, 0.009]), quat)
    w = np.asarray(w)
    assert w[0] == 0 and w[1] == 0  # masked DoFs
    assert w[2] < 0  # pushes z down toward desired
    np.testing.assert_allclose(w[3:], 0, atol=1e-12)  # no orientation error


def test_impedance_orientation_error_direction():
    g = impedance.make_gains(1.0, 1.0, 1.0)
    pos = jnp.zeros(3)
    quat = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    ang = 0.3
    quat_d = jnp.asarray([np.cos(ang / 2), 0.0, 0.0, np.sin(ang / 2)])
    w = np.asarray(impedance.impedance_wrench(g, pos, quat, jnp.zeros(6), pos, quat_d))
    np.testing.assert_allclose(w[5], ang, atol=1e-9)  # torque about z toward desired
    np.testing.assert_allclose(w[:5], 0, atol=1e-9)


@pytest.mark.skipif(not reference_available(), reason='reference repo not mounted')
def test_impedance_matches_reference_controller():
    """Drive the reference MoverImpedanceController on a real model and compare
    wrenches for the same (pos, quat, vel) state."""
    import sys

    sys.path.insert(0, '/root/reference')
    from gymnasium_planar_robotics.envs.manipulation.benchmark_pushing_env import BenchmarkPushingEnv
    from gymnasium_planar_robotics.utils import mujoco_utils
    import mujoco

    env = BenchmarkPushingEnv(std_noise=0.0, render_mode=None)
    env.reload_model(mover_start_xy_pos=np.array([[0.3, 0.3]]))
    model, data = env.model, env.data
    ctrl_ref = {}

    # perturb the mover state, then capture what the reference controller writes
    joint = env.mover_joint_names[0]
    qpos = mujoco_utils.get_joint_qpos(model, data, joint)
    qpos[2] += 0.004  # z offset
    mujoco_utils.set_joint_qpos(model, data, joint, qpos)
    qvel = np.array([0.1, -0.2, 0.03, 0.01, -0.02, 0.05])
    mujoco_utils.set_joint_qvel(model, data, joint, qvel)
    mujoco.mj_forward(model, data)

    pos_d = np.array([0, 0, env.initial_mover_zpos + env.mover_size[0, 2]])
    quat_d = np.array([1.0, 0, 0, 0])
    env.impedance_controller.update(model=model, data=data, pos_d=pos_d, quat_d=quat_d)
    names = env.impedance_controller.actuator_names
    for idx, name in enumerate(names):
        if name:
            aid = model.actuator(name).id
            ctrl_ref[idx] = data.ctrl[aid]

    g = impedance.make_gains(
        float(model.body(env.impedance_controller.mover_body_id).mass[0]),
        1.0, 0.1, joint_mask=np.array([0, 0, 1, 1, 1, 1]), dtype=jnp.float64,
    )
    xpos = data.xpos[env.impedance_controller.mover_body_id].copy()
    xquat = data.xquat[env.impedance_controller.mover_body_id].copy()
    w = np.asarray(
        impedance.impedance_wrench(g, jnp.asarray(xpos), jnp.asarray(xquat), jnp.asarray(qvel),
                                   jnp.asarray(pos_d), jnp.asarray(quat_d))
    )
    for idx, val in ctrl_ref.items():
        np.testing.assert_allclose(w[idx], val, atol=1e-8, err_msg=f'dof {idx}')
