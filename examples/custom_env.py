"""A complete third environment family built on the public kernel surface.

``ReachingEnv``: one mover must reach a goal disc and hold position inside it
(planning ends the episode at goal contact; here staying matters, like the
reference pushing env's "stay until truncation" rule,
``benchmark_pushing_env.py:457-476``). Demonstrates the extension contract of
``docs/make_own_env.md`` end-to-end:

- config/params/state pytrees instead of XML + subclass callbacks,
- a custom per-cycle actuation law (viscous drag added to the commanded
  acceleration — "actuation is just code"),
- the reusable kernels: tile grid, wall validity, MuJoCo-equivalent
  integration with the clamp chain, sensor noise,
- bounded rejection-sampling reset, latched collision early-stop,
- batched autoreset step, jit/vmap/shard-ready.

Run: python examples/custom_env.py
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from gymnasium_planar_robotics_tpu.models import common
from gymnasium_planar_robotics_tpu.ops import dynamics, walls
from gymnasium_planar_robotics_tpu.ops.grid import TileGrid, make_tile_grid


@dataclasses.dataclass(frozen=True)
class ReachingConfig:
    num_cycles: int = 40
    max_episode_steps: int = 50
    hold_steps: int = 5  # consecutive in-goal steps required for success


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ReachingParams:
    grid: TileGrid
    dt: jax.Array
    mass: jax.Array
    v_max: jax.Array
    a_max: jax.Array
    drag: jax.Array  # viscous drag coefficient [1/s]
    c_size: jax.Array  # wall-collision radius
    goal_radius: jax.Array
    std_noise: jax.Array  # (3,) pos/vel/acc sensor noise
    min_xy: jax.Array
    max_xy: jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ReachingState:
    pos: jax.Array  # [2]
    vel: jax.Array  # [2]
    goal: jax.Array  # [2]
    held: jax.Array  # consecutive in-goal step counter
    steps: jax.Array
    key: jax.Array


def make_reaching_env(layout=None, drag=0.5, goal_radius=0.05, dtype=jnp.float32):
    layout = np.ones((3, 3)) if layout is None else layout
    tile_size = np.array([0.24 / 2, 0.24 / 2, 0.0352 / 2])
    grid = make_tile_grid(layout, tile_size, dtype=dtype)
    c = 0.11
    lo = jnp.asarray([c, c], dtype)
    hi = jnp.asarray(
        [layout.shape[0] * 0.24 - c, layout.shape[1] * 0.24 - c], dtype
    )
    params = ReachingParams(
        grid=grid,
        dt=jnp.asarray(0.001, dtype),
        mass=jnp.asarray(1.24, dtype),
        v_max=jnp.asarray(2.0, dtype),
        a_max=jnp.asarray(10.0, dtype),
        drag=jnp.asarray(drag, dtype),
        c_size=jnp.asarray(c, dtype),
        goal_radius=jnp.asarray(goal_radius, dtype),
        std_noise=jnp.asarray([1e-5, 1e-5, 1e-5], dtype),
        min_xy=lo,
        max_xy=hi,
    )
    return ReachingConfig(), params


def _sample_valid_xy(params: ReachingParams, key: jax.Array) -> jax.Array:
    """Bounded rejection sampling of a wall-valid position (16 candidates,
    first accepted wins — same acceptance distribution as a rejection loop)."""
    cands = jax.random.uniform(key, (16, 2), params.min_xy.dtype, params.min_xy, params.max_xy)
    ok = walls.qpos_is_valid(params.grid, cands, jnp.broadcast_to(params.c_size, (16,)))
    idx = jnp.argmax(ok)  # first valid candidate (0 if none — layout dependent)
    return cands[idx]


def reset(config: ReachingConfig, params: ReachingParams, key: jax.Array):
    k1, k2, k3 = jax.random.split(key, 3)
    pos = _sample_valid_xy(params, k1)
    goal = _sample_valid_xy(params, k2)
    state = ReachingState(
        pos=pos,
        vel=jnp.zeros_like(pos),
        goal=goal,
        held=jnp.zeros((), jnp.int32),
        steps=jnp.zeros((), jnp.int32),
        key=k3,
    )
    return state, _obs(params, state, k3), {}


def _obs(params, state, key):
    kp, kv = jax.random.split(key)
    noisy_pos = state.pos + params.std_noise[0] * jax.random.normal(kp, (2,), state.pos.dtype)
    noisy_vel = state.vel + params.std_noise[1] * jax.random.normal(kv, (2,), state.vel.dtype)
    return {
        'observation': noisy_vel,
        'achieved_goal': noisy_pos,
        'desired_goal': state.goal,
    }


def step(config: ReachingConfig, params: ReachingParams, state: ReachingState, action: jax.Array):
    action = jnp.clip(action.astype(state.pos.dtype), -params.a_max, params.a_max)
    key, k_obs = jax.random.split(state.key)

    def cycle(carry, _):
        pos, vel, dead = carry
        # custom actuation law: commanded acceleration minus viscous drag
        acc = action - params.drag * vel
        res = dynamics.acceleration_cycle(pos, vel, vel, acc, params.v_max, params.dt)
        new_pos, new_vel = res.pos, res.vel
        # latched early stop: a dead env stops integrating (reference
        # basic_envs.py:1902-1905 break semantics, branch-free)
        pos = jnp.where(dead, pos, new_pos)
        vel = jnp.where(dead, vel, new_vel)
        hit = ~walls.qpos_is_valid(
            params.grid, pos[None, :], params.c_size[None]
        )[0]
        return (pos, vel, dead | hit), None

    (pos, vel, wall_hit), _ = jax.lax.scan(
        cycle, (state.pos, state.vel, jnp.zeros((), jnp.bool_)), None, length=config.num_cycles
    )

    in_goal = jnp.linalg.norm(pos - state.goal) <= params.goal_radius
    held = jnp.where(in_goal, state.held + 1, 0)
    success = held >= config.hold_steps

    reward = jnp.where(wall_hit, -50.0, jnp.where(in_goal, 0.0, -1.0)).astype(pos.dtype)
    terminated = wall_hit | success
    truncated = state.steps + 1 >= config.max_episode_steps

    new_state = ReachingState(pos=pos, vel=vel, goal=state.goal, held=held, steps=state.steps + 1, key=key)
    info = {'is_success': success, 'wall_collision': wall_hit}
    return new_state, _obs(params, new_state, k_obs), reward, terminated, truncated, info


def batched_step_autoreset(config, params, state, actions):
    """vmap + reset-where-done, the same shape as the built-in families."""
    s, obs, rew, term, trunc, info = jax.vmap(partial(step, config, params))(state, actions)
    done = term | trunc

    def maybe_reset(d, s_row, key):
        def do_reset(_):
            ns, _, _ = reset(config, params, key)
            return ns

        return jax.lax.cond(d, do_reset, lambda _: s_row, None)

    keys = jax.vmap(lambda k: jax.random.split(k, 2)[1])(s.key)
    new_state = jax.vmap(maybe_reset)(done, s, keys)
    obs2 = jax.vmap(partial(_obs, params))(new_state, keys)
    obs = jax.tree_util.tree_map(lambda a, b: jnp.where(done.reshape(-1, *([1] * (a.ndim - 1))), b, a), obs, obs2)
    return new_state, obs, rew, term, trunc, info


def main():
    config, params = make_reaching_env()
    B = 512
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    state, obs, _ = jax.vmap(partial(reset, config, params))(keys)

    stepper = jax.jit(partial(batched_step_autoreset, config, params))
    key = jax.random.PRNGKey(1)
    succ = 0.0
    for t in range(50):
        key, k = jax.random.split(key)
        # greedy proportional controller toward the goal
        direction = obs['desired_goal'] - obs['achieved_goal']
        actions = 10.0 * direction - 2.0 * obs['observation']
        state, obs, rew, term, trunc, info = stepper(state, actions)
        succ += float(jnp.mean(info['is_success']))
    print(f'ReachingEnv: 50 batched autoreset steps OK; mean success/step {succ / 50:.3f}')


if __name__ == '__main__':
    main()
