"""End-to-end learning check: PPO on dense-reward planning improves.

Deterministic on the CPU test platform (fixed seeds, fixed iteration count) —
this is the 'mixed suite feeding PPO learner' path of BASELINE.md exercised
for real: sharded-shape env batch -> on-device rollout -> GAE -> PPO updates.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gymnasium_planar_robotics_tpu.models import planning, ppo


@pytest.mark.slow
def test_ppo_improves_on_dense_planning():
    config, params = planning.make_planning_env(
        np.ones((3, 3)), 1, std_noise=1e-5, dtype=jnp.float32, reward_mode='dense', a_max=3.0
    )
    B = 256
    cfg = ppo.PPOConfig(
        obs_dim=6, action_dim=2, hidden=(64, 64), rollout_steps=16,
        action_scale=10.0, learning_rate=1e-3, update_epochs=4,
    )
    pol = ppo.init_params(jax.random.PRNGKey(0), cfg)
    train_step, opt = ppo.make_train_step(config, params, cfg, planning.step_autoreset)
    opt_state = opt.init(pol)
    state, obs, _ = planning.init_batch(config, params, jax.random.PRNGKey(1), B)
    obs_vec = jnp.concatenate(
        [obs['observation'], obs['achieved_goal'], obs['desired_goal']], -1
    ).astype(jnp.float32)
    runner = (state, obs_vec, pol, opt_state, jax.random.PRNGKey(2))
    step = jax.jit(train_step)

    rewards = []
    for i in range(110):
        runner, m = step(runner)
        rewards.append(float(m['reward_mean']))
    early = np.mean(rewards[:10])
    late = np.mean(rewards[-10:])
    assert np.isfinite(rewards).all()
    assert late > early + 0.3, f'PPO failed to improve: early {early:.3f}, late {late:.3f}'


def test_sparse_reward_mode_is_default_reference_semantics():
    config, params = planning.make_planning_env(np.ones((3, 3)), 2, dtype=jnp.float64)
    assert config.reward_mode == 'sparse'
    a = jnp.asarray([[0.3, 0.3, 0.5, 0.5]])
    d = jnp.asarray([[0.31, 0.3, 0.5, 0.5]])
    r = planning.compute_reward(config, params, a, d, jnp.asarray([False]), jnp.asarray([False]))
    assert float(r[0]) == 50.0

    dense_cfg, _ = planning.make_planning_env(np.ones((3, 3)), 2, dtype=jnp.float64, reward_mode='dense')
    r = planning.compute_reward(dense_cfg, params, a, jnp.asarray([[0.5, 0.3, 0.5, 0.5]]), jnp.asarray([False]), jnp.asarray([False]))
    np.testing.assert_allclose(float(r[0]), -0.2, atol=1e-9)  # -sum of distances
