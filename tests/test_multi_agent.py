"""Batched multi-agent surface: consistency with the PettingZoo adapter's
per-agent semantics, at [B, N] scale."""

import numpy as np

import jax
import jax.numpy as jnp

from gymnasium_planar_robotics_tpu.models import multi_agent, planning


def test_batched_parallel_step_shapes_and_semantics():
    config, params = planning.make_planning_env(
        np.ones((4, 4)), 4, std_noise=0.0, dtype=jnp.float64, num_cycles=8
    )
    B, N = 16, 4
    state, obs, _ = planning.init_batch(config, params, jax.random.PRNGKey(0), B)
    step = multi_agent.make_batched_parallel_step(config, params)
    actions = jnp.zeros((B, N, 2), jnp.float64)
    state, out = step(state, actions)

    assert out.observation.shape == (B, N, 2)
    assert out.achieved_goal.shape == (B, N, 2)
    assert out.reward.shape == (B, N)
    # shared-fate: terminated identical across agents
    assert (out.terminated == out.terminated[:, :1]).all()
    # zero action from a fresh collision-free reset: no +/-50 events at step 1,
    # so each agent's reward is 0 (own goal reached) or -1
    assert set(np.unique(np.asarray(out.reward))) <= {0.0, -1.0}

    # per-agent reward matches own-goal distances
    dist = np.linalg.norm(np.asarray(out.achieved_goal - out.desired_goal), axis=-1)
    expect = -(dist > float(params.threshold_pos)).astype(float)
    shared = np.abs(np.asarray(out.reward)) == 50.0
    np.testing.assert_array_equal(np.asarray(out.reward)[~shared], expect[~shared])


def test_matches_pettingzoo_adapter_split():
    """The stacked split must equal the PettingZoo adapter's dict split."""
    from gymnasium_planar_robotics_tpu.envs.pettingzoo_env import PlanningParallelEnv

    env = PlanningParallelEnv(num_movers=3, layout_tiles=np.ones((4, 4)), std_noise=0.0)
    obs, _ = env.reset(seed=0)

    config, params = env.config, env.params
    state = env._state
    raw_obs = planning._get_obs(config, params, state, jax.random.PRNGKey(0))
    observation, achieved, desired = multi_agent.split_obs(config, raw_obs)
    for i, agent in enumerate(env.possible_agents):
        np.testing.assert_allclose(np.asarray(achieved[i]), obs[agent]['achieved_goal'], atol=1e-9)
        np.testing.assert_allclose(np.asarray(desired[i]), obs[agent]['desired_goal'], atol=1e-12)
