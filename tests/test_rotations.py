"""Rotation utilities (ops/rotations.py) fuzz-validated against the reference
NumPy implementation (``/root/reference/gymnasium_planar_robotics/utils/
rotations_utils.py``) over random batches — full C7 surface (SURVEY.md §2.1)."""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import import_reference, reference_available
from gymnasium_planar_robotics_tpu.ops import rotations as R

needs_ref = pytest.mark.skipif(not reference_available(), reason='reference repo not mounted')


def _rng():
    return np.random.default_rng(7)


def _rand_euler(n=128):
    return _rng().uniform(-np.pi, np.pi, (n, 3))


def _rand_quat(n=128, positive_w=False):
    q = _rng().normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    if positive_w:
        q[:, 0] = np.abs(q[:, 0])
    return q


@needs_ref
def test_euler_quat_mat_roundtrips_vs_reference():
    import_reference()
    from gymnasium_planar_robotics.utils import rotations_utils as ref

    e = _rand_euler()
    np.testing.assert_allclose(np.asarray(R.euler2mat(e)), ref.euler2mat(e), atol=1e-6)
    np.testing.assert_allclose(np.asarray(R.euler2quat(e)), ref.euler2quat(e), atol=1e-6)
    np.testing.assert_allclose(np.asarray(R.mat2euler(ref.euler2mat(e))), ref.mat2euler(ref.euler2mat(e)), atol=1e-6)
    q = _rand_quat()
    np.testing.assert_allclose(np.asarray(R.quat2mat(q)), ref.quat2mat(q), atol=1e-6)


@needs_ref
def test_mat2quat_matches_reference_up_to_sign():
    import_reference()
    from gymnasium_planar_robotics.utils import rotations_utils as ref

    m = ref.euler2mat(_rand_euler())
    mine = np.asarray(R.mat2quat(jnp.asarray(m)))
    theirs = ref.mat2quat(m)
    # q and -q encode the same rotation; the eigenvector method's sign is arbitrary
    sign = np.sign(np.sum(mine * theirs, axis=-1, keepdims=True))
    np.testing.assert_allclose(mine * sign, theirs, atol=1e-5)


@needs_ref
def test_quat_algebra_vs_reference():
    import_reference()
    from gymnasium_planar_robotics.utils import rotations_utils as ref

    q0, q1 = _rand_quat(), _rand_quat()[::-1]
    np.testing.assert_allclose(np.asarray(R.quat_mul(q0, q1)), ref.quat_mul(q0, q1), atol=1e-7)
    np.testing.assert_allclose(np.asarray(R.quat_conjugate(q0)), ref.quat_conjugate(q0), atol=1e-12)
    v = _rng().normal(size=(128, 3))
    # reference quat_rot_vec is unbatched (rotations_utils.py:309-317)
    for i in range(0, 128, 16):
        np.testing.assert_allclose(
            np.asarray(R.quat_rot_vec(q0[i], v[i])), ref.quat_rot_vec(q0[i], v[i]), atol=1e-6
        )
    for frac in (0.0, 0.25, 0.9, 1.0):
        np.testing.assert_allclose(
            np.asarray(R.quat_slerp(q0[0], q1[0], frac)), ref.quat_slerp(q0[0], q1[0], frac), atol=1e-6
        )


@needs_ref
def test_point_representations_vs_reference():
    import_reference()
    from gymnasium_planar_robotics.utils import rotations_utils as ref

    e = _rand_euler()
    np.testing.assert_allclose(np.asarray(R.euler2point_euler(e)), ref.euler2point_euler(e), atol=1e-12)
    pe = ref.euler2point_euler(e)
    np.testing.assert_allclose(np.asarray(R.point_euler2euler(pe)), ref.point_euler2euler(pe.copy()), atol=1e-9)
    q = _rand_quat(positive_w=True)
    np.testing.assert_allclose(np.asarray(R.quat2point_quat(q)), ref.quat2point_quat(q.copy()), atol=1e-7)
    pq = ref.quat2point_quat(q.copy())
    np.testing.assert_allclose(np.asarray(R.point_quat2quat(pq)), ref.point_quat2quat(pq.copy()), atol=1e-7)


@needs_ref
def test_angle_helpers_vs_reference():
    import_reference()
    from gymnasium_planar_robotics.utils import rotations_utils as ref

    a = _rng().uniform(-7.0, 7.0, (256,))
    np.testing.assert_allclose(np.asarray(R.normalize_angles(a)), ref.normalize_angles(a.copy()), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(R.round_to_straight_angles(a)), ref.round_to_straight_angles(a.copy()), atol=1e-12
    )
    e1, e2 = _rand_euler(), _rand_euler()[::-1]
    mine = np.asarray(R.subtract_euler(e1, e2))
    theirs = ref.subtract_euler(e1, e2)
    np.testing.assert_allclose(
        np.asarray(R.normalize_angles(mine - theirs)), np.zeros_like(mine), atol=1e-5
    )


@needs_ref
def test_get_parallel_rotations_vs_reference():
    import_reference()
    from gymnasium_planar_robotics.utils import rotations_utils as ref

    theirs = ref.get_parallel_rotations()
    mine = R.get_parallel_rotations()
    assert len(mine) == len(theirs) == 24
    for t in theirs:
        assert any(np.allclose(t, m, atol=1e-9) for m in mine)


def test_point_representations_jit_and_batch_shapes():
    """The new helpers are jit-compatible and shape-polymorphic (no reference needed)."""
    import jax

    e = jnp.asarray(_rand_euler(8))
    pe = jax.jit(R.euler2point_euler)(e)
    assert pe.shape == (8, 6)
    back = jax.jit(R.point_euler2euler)(pe)
    np.testing.assert_allclose(np.asarray(R.normalize_angles(back - e)), 0.0, atol=1e-5)
    # small-angle quats: the point round-trip only holds where 2·arccos(w)
    # lies in arctan's principal range (a reference-inherited limit)
    ang = _rng().uniform(-0.7, 0.7, (8, 1))
    axis = R.unit_vector(jnp.asarray(_rng().normal(size=(8, 3))))
    q = jnp.concatenate([jnp.cos(ang / 2), jnp.sin(ang / 2) * axis], axis=-1)
    pq = jax.jit(R.quat2point_quat)(q)
    assert pq.shape == (8, 5)
    qq = jax.jit(R.point_quat2quat)(pq)
    np.testing.assert_allclose(np.asarray(qq), np.asarray(q), atol=1e-5)
