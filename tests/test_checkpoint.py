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


def test_learner_state_resume_bit_exact(tmp_path):
    """Full training-run checkpoint: env state + policy + optimizer + RNG key
    round-trip through orbax and training continues bit-exactly (the
    framework-level resume story the reference has no analog for)."""
    from gymnasium_planar_robotics_tpu.models import ppo

    config, params = planning.make_planning_env(
        np.ones((3, 3)), 1, std_noise=1e-5, dtype=jnp.float32, reward_mode='dense', num_cycles=8
    )
    cfg = ppo.PPOConfig(obs_dim=6, action_dim=2, hidden=(16, 16), rollout_steps=4, update_epochs=1)
    pol = ppo.init_params(jax.random.PRNGKey(1), cfg)
    train_step, optimizer = ppo.make_train_step(config, params, cfg, planning.step_autoreset)
    opt_state = optimizer.init(pol)
    state, obs, _ = planning.init_batch(config, params, jax.random.PRNGKey(2), 8)
    obs_vec = jnp.concatenate(
        [obs['observation'], obs['achieved_goal'], obs['desired_goal']], axis=-1
    ).astype(jnp.float32)
    runner = (state, obs_vec, pol, opt_state, jax.random.PRNGKey(3))
    step = jax.jit(train_step)

    for _ in range(2):
        runner, _ = step(runner)
    checkpoint.save(tmp_path, runner, step=2)

    cont = runner
    for _ in range(2):
        cont, m_a = step(cont)

    restored = checkpoint.restore(tmp_path, runner)
    for _ in range(2):
        restored, m_b = step(restored)

    assert float(m_a['loss']) == float(m_b['loss'])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)), cont[2], restored[2]
    )
    np.testing.assert_array_equal(np.asarray(cont[0].pos), np.asarray(restored[0].pos))
