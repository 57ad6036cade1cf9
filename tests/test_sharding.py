"""Mesh-sharded batch execution on the virtual 8-device CPU mesh.

What the reference cannot do at all (SURVEY.md §2.3 D1/D2): shard the env
batch over a device mesh, step it in lockstep, verify results are identical
to unsharded execution and that per-device shards are actually distributed.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gymnasium_planar_robotics_tpu.models import planning
from gymnasium_planar_robotics_tpu.parallel import rollout as rollout_lib
from gymnasium_planar_robotics_tpu.parallel import sharding


@pytest.fixture(scope='module')
def env():
    return planning.make_planning_env(
        layout_tiles=np.ones((3, 3)),
        num_movers=2,
        std_noise=1e-5,
        num_cycles=10,
        dtype=jnp.float64,
    )


def test_eight_device_mesh_available():
    assert len(jax.devices()) == 8, 'conftest should provide 8 virtual CPU devices'


def test_sharded_step_matches_unsharded(env):
    config, params = env
    mesh = sharding.make_mesh()
    batch = 16

    state, obs, _ = planning.init_batch(config, params, jax.random.PRNGKey(0), batch)
    actions = jax.random.uniform(jax.random.PRNGKey(1), (batch, 4), jnp.float64, -5.0, 5.0)

    # unsharded
    s0, o0, r0, t0, _, i0 = planning.batched_step(config, params, state, actions)

    # sharded (no donation so `state` stays usable above)
    sh_state = sharding.shard_batch(state, mesh)
    sh_actions = sharding.shard_batch(actions, mesh)
    step = sharding.sharded_step_fn(config, params, mesh, planning.step, donate=False)
    s1, o1, r1, t1, _, i1 = step(sh_state, sh_actions)

    assert s1.pos.sharding.is_equivalent_to(sharding.batch_sharding(mesh), s1.pos.ndim)
    np.testing.assert_array_equal(np.asarray(r0), np.asarray(r1))
    np.testing.assert_array_equal(np.asarray(s0.pos), np.asarray(s1.pos))
    np.testing.assert_array_equal(np.asarray(o0['observation']), np.asarray(o1['observation']))
    np.testing.assert_array_equal(np.asarray(i0['is_success']), np.asarray(i1['is_success']))


def test_metrics_summary_replicated(env):
    config, params = env
    mesh = sharding.make_mesh()
    batch = 16
    state, obs, _ = planning.init_batch(config, params, jax.random.PRNGKey(2), batch)
    actions = jnp.zeros((batch, 4), jnp.float64)
    step = sharding.sharded_step_fn(config, params, mesh, planning.step, donate=False)

    @jax.jit
    def step_and_metrics(state, actions):
        s, o, r, t, tr, i = step(state, actions)
        return sharding.metrics_summary(r, t, i)

    m = step_and_metrics(sharding.shard_batch(state, mesh), sharding.shard_batch(actions, mesh))
    assert m['reward_mean'].shape == ()
    assert 0.0 <= float(m['terminated_rate']) <= 1.0


def test_jit_rollout_sharded(env):
    config, params = env
    mesh = sharding.make_mesh()
    batch = 16

    state, obs, _ = planning.init_batch(config, params, jax.random.PRNGKey(3), batch)
    policy = rollout_lib.uniform_policy(4, -10.0, 10.0)
    roll = rollout_lib.jit_rollout(
        config, params, planning.step_autoreset, policy, num_steps=7, mesh=mesh
    )
    state = sharding.shard_batch(state, mesh)
    obs = sharding.shard_batch(obs, mesh)
    s, o, k, metrics = roll(state, obs, jax.random.PRNGKey(4))
    assert metrics['reward_mean'].shape == (7,)
    assert np.isfinite(np.asarray(metrics['reward_mean'])).all()
    # autoreset keeps every env inside the table
    assert (np.asarray(s.pos) >= 0).all()
