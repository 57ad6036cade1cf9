"""Checkified step: clean runs pass, corrupted state raises with a message."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gymnasium_planar_robotics_tpu.models import debug, planning


def test_clean_step_passes():
    config, params = planning.make_planning_env(np.ones((3, 3)), 1, std_noise=0.0, dtype=jnp.float64)
    state, obs, _ = planning.reset(config, params, jax.random.PRNGKey(0))
    checked = debug.make_checked_step(config, params, planning.step)
    err, out = checked(state, jnp.zeros(2))
    err.throw()  # no violation


def test_corrupted_state_raises():
    import dataclasses

    config, params = planning.make_planning_env(np.ones((3, 3)), 1, std_noise=0.0, dtype=jnp.float64)
    state, obs, _ = planning.reset(config, params, jax.random.PRNGKey(0))
    bad = dataclasses.replace(state, pos=jnp.full_like(state.pos, jnp.nan))
    checked = debug.make_checked_step(config, params, planning.step)
    err, out = checked(bad, jnp.zeros(2))
    with pytest.raises(Exception, match='non-finite'):
        err.throw()


def test_off_table_terminates_instead_of_tripping():
    """Being off the table is a wall termination in-step, not a missed one —
    the invariant must accept that path."""
    import dataclasses

    config, params = planning.make_planning_env(np.ones((3, 3)), 1, std_noise=0.0, dtype=jnp.float64)
    state, obs, _ = planning.reset(config, params, jax.random.PRNGKey(0))
    far = dataclasses.replace(state, pos=jnp.asarray([[5.0, 5.0]]))
    checked = debug.make_checked_step(config, params, planning.step)
    err, (s, o, r, term, tr, info) = checked(far, jnp.zeros(2))
    err.throw()
    assert bool(term) and float(r) == -50.0


def test_invariants_hold_over_random_rollout():
    """All invariants stay green over a random-action rollout, including the
    recovery path: the clamp chain rescales even an absurd injected velocity
    back under v_max within one env step."""
    import dataclasses

    config, params = planning.make_planning_env(np.ones((3, 3)), 1, std_noise=1e-5, dtype=jnp.float64)
    state, obs, _ = planning.reset(config, params, jax.random.PRNGKey(0))
    state = dataclasses.replace(state, vel=jnp.asarray([[200.0, 0.0]]))
    checked = debug.make_checked_step(config, params, planning.step)
    key = jax.random.PRNGKey(1)
    for _ in range(5):
        key, k = jax.random.split(key)
        action = jax.random.uniform(k, (2,), jnp.float64, -10.0, 10.0)
        err, (state, *_rest) = checked(state, action)
        err.throw()
    assert float(jnp.linalg.norm(state.vel)) <= float(params.v_max) + 1e-6
