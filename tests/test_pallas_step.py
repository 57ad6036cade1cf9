"""Fused Pallas step vs. the XLA scan path (interpret mode on CPU).

Bit-exact state match at std_noise=0 (same arithmetic, noise unused);
distributional match of collision behavior at std_noise>0.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gymnasium_planar_robotics_tpu.models import planning
from gymnasium_planar_robotics_tpu.ops import pallas_step


def _mk(std=0.0, learn_jerk=False, layout=None):
    return planning.make_planning_env(
        np.ones((3, 3)) if layout is None else layout,
        1,
        std_noise=std,
        num_cycles=40,
        v_max=1.0,
        a_max=8.0,
        j_max=80.0,
        learn_jerk=learn_jerk,
        dtype=jnp.float32,
    )


def _random_states(config, params, b, seed=0):
    state, obs, _ = planning.init_batch(config, params, jax.random.PRNGKey(seed), b)
    return state


@pytest.mark.parametrize('learn_jerk', [False, True])
def test_fused_matches_xla_at_zero_noise(learn_jerk):
    config, params = _mk(std=0.0, learn_jerk=learn_jerk)
    assert pallas_step.supports(config, params)
    b = 256
    state = _random_states(config, params, b)
    limit = 80.0 if learn_jerk else 8.0
    actions = jax.random.uniform(jax.random.PRNGKey(1), (b, 2), jnp.float32, -limit, limit)

    xla_state, _, xla_rew, xla_term, _, xla_info = planning.batched_step(config, params, state, actions)
    fused_step = planning.make_fused_step(config, params, interpret=True)
    f_state, _, f_rew, f_term, _, f_info = fused_step(state, actions)

    np.testing.assert_array_equal(np.asarray(f_state.pos), np.asarray(xla_state.pos))
    np.testing.assert_array_equal(np.asarray(f_state.vel), np.asarray(xla_state.vel))
    np.testing.assert_array_equal(np.asarray(f_state.acc), np.asarray(xla_state.acc))
    np.testing.assert_array_equal(np.asarray(f_info['wall_collision']), np.asarray(xla_info['wall_collision']))
    # rewards use noisy obs positions drawn from different streams — at std=0
    # they are identical
    np.testing.assert_array_equal(np.asarray(f_rew), np.asarray(xla_rew))


def test_fused_matches_xla_multi_step_holed_layout():
    layout = np.array([[1, 1, 1], [1, 1, 0], [1, 1, 1]])
    config, params = _mk(std=0.0, layout=layout)
    b = 128
    state = _random_states(config, params, b, seed=3)
    fused_step = planning.make_fused_step(config, params, interpret=True)
    key = jax.random.PRNGKey(5)
    for t in range(5):
        key, k = jax.random.split(key)
        actions = jax.random.uniform(k, (b, 2), jnp.float32, -8.0, 8.0)
        xs, _, xr, xt, _, xi = planning.batched_step(config, params, state, actions)
        fs, _, fr, ft, _, fi = fused_step(state, actions)
        np.testing.assert_array_equal(np.asarray(fs.pos), np.asarray(xs.pos), err_msg=f't={t}')
        np.testing.assert_array_equal(
            np.asarray(fi['wall_collision']), np.asarray(xi['wall_collision']), err_msg=f't={t}'
        )
        # advance along the XLA trajectory (keys differ in the fused state)
        state = xs


def test_fused_noise_distribution_matches():
    """With std>0 the streams differ; wall-collision rates and mean speeds
    must agree distributionally."""
    config, params = _mk(std=3e-3)
    b = 1024
    state = _random_states(config, params, b, seed=7)
    fused_step = planning.make_fused_step(config, params, interpret=True)
    actions = jnp.tile(jnp.asarray([6.0, 0.0], jnp.float32), (b, 1))  # drive at the wall

    walls_x, walls_f, speed_x, speed_f = [], [], [], []
    sx = sf = state
    for t in range(6):
        sx2, _, _, _, _, ix = planning.batched_step(config, params, sx, actions)
        sf2, _, _, _, _, iff = fused_step(sf, actions)
        walls_x.append(np.asarray(ix['wall_collision']).mean())
        walls_f.append(np.asarray(iff['wall_collision']).mean())
        speed_x.append(np.linalg.norm(np.asarray(sx2.vel), axis=-1).mean())
        speed_f.append(np.linalg.norm(np.asarray(sf2.vel), axis=-1).mean())
        sx, sf = sx2, sf2
    np.testing.assert_allclose(np.mean(speed_x), np.mean(speed_f), rtol=0.02)
    np.testing.assert_allclose(np.mean(walls_x), np.mean(walls_f), atol=0.03)


def test_supports_gate():
    config, params = planning.make_planning_env(np.ones((3, 3)), 2, dtype=jnp.float32)
    assert not pallas_step.supports(config, params)  # M=2
    config, params = planning.make_planning_env(
        np.ones((3, 3)), 1, dtype=jnp.float32, collision_params={'shape': 'box', 'size': np.array([0.07, 0.07])}
    )
    assert not pallas_step.supports(config, params)  # box shape


def test_fused_autoreset_restarts_episodes():
    config, params = _mk(std=1e-5)
    b = 128
    state = _random_states(config, params, b, seed=11)
    step = planning.make_fused_step_autoreset(config, params, interpret=True)
    actions = jnp.tile(jnp.asarray([8.0, 0.0], jnp.float32), (b, 1))  # slam the wall
    terminated_any = False
    for _ in range(8):
        state, obs, rew, term, trunc, info = step(state, actions)
        terminated_any = terminated_any or bool(np.asarray(term).any())
        done = np.asarray(term) | np.asarray(trunc)
        assert (np.asarray(state.steps)[done] == 0).all()
        # restarted envs are inside the sampling region again
        pos = np.asarray(state.pos)[done]
        if pos.size:
            assert (pos >= np.asarray(params.min_xy) - 1e-6).all()
            assert (pos <= np.asarray(params.max_xy) + 1e-6).all()
    assert terminated_any, 'wall slam never terminated an episode'


# ---------------------------------------------------------------------------
# pushing kernel
# ---------------------------------------------------------------------------


def _mk_push(std=0.0, learn_jerk=False):
    from gymnasium_planar_robotics_tpu.models import pushing

    return pushing.make_pushing_env(std_noise=std, learn_jerk=learn_jerk, dtype=jnp.float32)


@pytest.mark.parametrize('learn_jerk', [False, True])
def test_fused_pushing_matches_xla_at_zero_noise(learn_jerk):
    from gymnasium_planar_robotics_tpu.models import pushing

    config, params = _mk_push(std=0.0, learn_jerk=learn_jerk)
    b = 128
    state, obs, _ = pushing.init_batch(config, params, jax.random.PRNGKey(0), b)
    # plant half the movers right next to the object so contact fires
    import dataclasses

    state = dataclasses.replace(
        state,
        pos=state.obj_pos + jnp.asarray([-0.115, 0.0], jnp.float32),
        vel=jnp.tile(jnp.asarray([0.4, 0.0], jnp.float32), (b, 1)),
    )
    limit = 80.0 if learn_jerk else 8.0
    actions = jax.random.uniform(jax.random.PRNGKey(1), (b, 2), jnp.float32, -limit, limit)

    xs, _, xr, xt, _, xi = pushing.batched_step(config, params, state, actions)
    fused_step = pushing.make_fused_step(config, params, interpret=True)
    fs, _, fr, ft, _, fi = fused_step(state, actions)

    # ulp-level tolerance: the two programs fuse multiplies differently (FMA
    # contraction), so contact-coupled quantities can differ in the last bit
    tol = dict(rtol=2e-6, atol=2e-7)
    np.testing.assert_allclose(np.asarray(fs.pos), np.asarray(xs.pos), **tol)
    np.testing.assert_allclose(np.asarray(fs.vel), np.asarray(xs.vel), **tol)
    np.testing.assert_allclose(np.asarray(fs.obj_pos), np.asarray(xs.obj_pos), **tol)
    np.testing.assert_allclose(np.asarray(fs.obj_vel), np.asarray(xs.obj_vel), **tol)
    np.testing.assert_allclose(np.asarray(fs.acc), np.asarray(xs.acc), rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(fi['wall_collision']), np.asarray(xi['wall_collision']))
    # object moved for at least some envs (contact actually exercised)
    assert (np.abs(np.asarray(fs.obj_pos - state.obj_pos)) > 1e-5).any()


def test_fused_pushing_autoreset():
    from gymnasium_planar_robotics_tpu.models import pushing

    config, params = _mk_push(std=1e-5)
    b = 128
    state, obs, _ = pushing.init_batch(config, params, jax.random.PRNGKey(2), b)
    step = pushing.make_fused_step_autoreset(config, params, interpret=True)
    actions = jnp.tile(jnp.asarray([8.0, 0.0], jnp.float32), (b, 1))
    hit = False
    for _ in range(8):
        state, obs, rew, term, trunc, info = step(state, actions)
        hit = hit or bool(np.asarray(term).any())
        done = np.asarray(term) | np.asarray(trunc)
        assert (np.asarray(state.steps)[done] == 0).all()
    assert hit


def test_fused_pushing_inkernel_autoreset_semantics():
    """In-kernel reset (acc mode): noise-independent invariants.

    NOTE: interpret mode's hardware PRNG yields all-zero bits, so sampled
    values degenerate to the range minimum here — value distributions are
    validated on real TPU (see the verify drive); this test checks the
    mechanics: step counters, goal switching, final-obs bookkeeping.
    """
    from gymnasium_planar_robotics_tpu.models import pushing

    config, params = _mk_push(std=0.0)
    b = 256
    state, obs, _ = pushing.init_batch(config, params, jax.random.PRNGKey(3), b)
    step = pushing.make_fused_step_autoreset(config, params, interpret=True)
    actions = jnp.tile(jnp.asarray([9.0, 0.0], jnp.float32), (b, 1))
    resets = 0
    for t in range(6):
        prev_goal = np.asarray(state.goal)
        state, obs, rew, term, trunc, info = step(state, actions)
        done = np.asarray(term) | np.asarray(trunc)
        resets += int(done.sum())
        keep = ~done
        assert (np.asarray(state.steps)[done] == 0).all()
        assert (np.abs(np.asarray(state.vel)[done]) < 1e-6).all()
        # final_observation keeps the OLD goal; out obs carries the new state goal
        np.testing.assert_allclose(
            np.asarray(info['final_observation']['desired_goal']), prev_goal, atol=1e-6
        )
        np.testing.assert_allclose(np.asarray(obs['desired_goal']), np.asarray(state.goal), atol=1e-6)
        # non-done envs keep their goal and advance their counter
        np.testing.assert_allclose(np.asarray(state.goal)[keep], prev_goal[keep], atol=1e-6)
        # rewards: wall envs -50, others 0/-1
        assert set(np.unique(np.asarray(rew))) <= {0.0, -1.0, -50.0}
        assert (np.asarray(rew)[np.asarray(term)] == -50.0).all()
    assert resets > 0, 'no episode ever restarted'


def test_fused_multi_mover_autoreset_mechanics():
    """M=3 in-kernel autoreset: noise-independent mechanics (interpret mode
    PRNG yields zeros — value distributions validated on device)."""
    config, params = planning.make_planning_env(
        np.ones((4, 4)), 3, std_noise=0.0, num_cycles=40, dtype=jnp.float32
    )
    b = 128
    state, obs, _ = planning.init_batch(config, params, jax.random.PRNGKey(5), b)
    step = planning.make_fused_step_autoreset(config, params, interpret=True)
    # drive movers 0 and 1 into each other
    actions = jnp.tile(jnp.asarray([[6.0, 0.0], [-6.0, 0.0], [0.0, 2.0]], jnp.float32), (b, 1, 1))
    collided_any = False
    for t in range(6):
        prev_goal = np.asarray(state.goals)
        state, o, r, te, tr, info = step(state, actions.reshape(b, -1))
        done = np.asarray(te) | np.asarray(tr)
        collided_any = collided_any or bool(
            (np.asarray(info['mover_collision']) | np.asarray(info['wall_collision'])).any()
        )
        assert (np.asarray(state.steps)[done] == 0).all()
        keep = ~done
        np.testing.assert_allclose(np.asarray(state.goals)[keep], prev_goal[keep], atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(info['final_observation']['desired_goal']), prev_goal.reshape(b, -1), atol=1e-6
        )
        rw = np.asarray(r)
        assert ((rw == 50.0) | (rw == -50.0) | ((rw <= 0) & (rw >= -3))).all()
        # collision => -50 and terminated
        col = np.asarray(info['mover_collision']) | np.asarray(info['wall_collision'])
        assert (rw[col] == -50.0).all()
        assert np.asarray(te)[col].all()
    assert collided_any, 'head-on movers never collided'


def test_fused_multi_matches_xla_single_step_zero_noise():
    """M=2, std=0: kernel cycle physics must match the XLA step bit-exactly
    (state only; obs/reset streams differ)."""
    config, params = planning.make_planning_env(
        np.ones((4, 4)), 2, std_noise=0.0, num_cycles=40, dtype=jnp.float32
    )
    b = 128
    state, obs, _ = planning.init_batch(config, params, jax.random.PRNGKey(9), b)
    actions = jax.random.uniform(jax.random.PRNGKey(1), (b, 4), jnp.float32, -8.0, 8.0)

    xs, _, xr, xt, _, xi = planning.batched_step(config, params, state, actions)
    step = planning.make_fused_step_autoreset(config, params, interpret=True)
    fs, fo, fr, ft, ftr, fi = step(state, actions)

    # compare only envs the XLA path did NOT terminate (the fused path resets
    # terminated envs in place)
    live = ~(np.asarray(xt))
    np.testing.assert_array_equal(np.asarray(fs.pos)[live], np.asarray(xs.pos)[live])
    np.testing.assert_array_equal(np.asarray(fs.vel)[live], np.asarray(xs.vel)[live])
    np.testing.assert_array_equal(
        np.asarray(fi['wall_collision']), np.asarray(xi['wall_collision'])
    )
    np.testing.assert_array_equal(
        np.asarray(fi['mover_collision']), np.asarray(xi['mover_collision'])
    )
    np.testing.assert_array_equal(np.asarray(fr), np.asarray(xr))
