"""Checkpoint/resume: bit-exact trajectory continuation after restore."""

import numpy as np

import jax
import jax.numpy as jnp

from gymnasium_planar_robotics_tpu.models import planning
from gymnasium_planar_robotics_tpu.utils import checkpoint


def test_env_state_resume_bit_exact(tmp_path):
    config, params = planning.make_planning_env(np.ones((3, 3)), 2, std_noise=1e-5, dtype=jnp.float64, num_cycles=8)
    state, obs, _ = planning.init_batch(config, params, jax.random.PRNGKey(0), 4)
    actions = jnp.ones((4, 4), jnp.float64)

    # run 3 steps, checkpoint, run 2 more
    for _ in range(3):
        state, *_ = planning.batched_step(config, params, state, actions)
    checkpoint.save(tmp_path, state, step=3)
    cont = state
    for _ in range(2):
        cont, obs_a, r_a, *_ = planning.batched_step(config, params, cont, actions)

    # restore into a template of the same structure, resume, compare
    template, _, _ = planning.init_batch(config, params, jax.random.PRNGKey(99), 4)
    restored = checkpoint.restore(tmp_path, template)
    assert checkpoint.saved_step(tmp_path) == 3
    for _ in range(2):
        restored, obs_b, r_b, *_ = planning.batched_step(config, params, restored, actions)

    np.testing.assert_array_equal(np.asarray(cont.pos), np.asarray(restored.pos))
    np.testing.assert_array_equal(np.asarray(r_a), np.asarray(r_b))
    np.testing.assert_array_equal(np.asarray(obs_a['observation']), np.asarray(obs_b['observation']))


def test_structure_mismatch_rejected(tmp_path):
    config, params = planning.make_planning_env(np.ones((3, 3)), 1, dtype=jnp.float64)
    state, _, _ = planning.init_batch(config, params, jax.random.PRNGKey(0), 2)
    checkpoint.save(tmp_path, {'only': state.pos})
    try:
        checkpoint.restore(tmp_path, {'different': state.pos, 'extra': state.vel})
        raise AssertionError('should have raised')
    except AssertionError as e:
        assert 'mismatch' in str(e)
