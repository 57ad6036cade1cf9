"""Shared building blocks for the env families.

The reference factors this as the ``BasicPlanarRoboticsEnv`` class
(``/root/reference/gymnasium_planar_robotics/envs/basic_envs.py:21-1626``);
here the equivalent surface is a set of pure functions over a static config +
an array pytree, so everything composes with ``jit``/``vmap``/``shard_map``.
"""

from __future__ import annotations

import jax.numpy as jnp

from gymnasium_planar_robotics_tpu.ops import collision, walls
from gymnasium_planar_robotics_tpu.ops.grid import TileGrid

IDENTITY_QUAT = (1.0, 0.0, 0.0, 0.0)


def wall_collision_any(
    grid: TileGrid, xy: jnp.ndarray, quat: jnp.ndarray, c_size: jnp.ndarray, collision_shape: str
) -> jnp.ndarray:
    """True if any mover collides with a wall (reference check_wall_collision
    = 1 - qpos_is_valid, basic_envs.py:426-457)."""
    return ~walls.qpos_is_valid(grid, xy, c_size, quat=quat, collision_shape=collision_shape).all()


def mover_collision_any(
    xy: jnp.ndarray, quat: jnp.ndarray, c_size: jnp.ndarray, collision_shape: str
) -> jnp.ndarray:
    """True if any mover pair collides (reference check_mover_collision,
    basic_envs.py; all M*(M-1)/2 pairs as static gathers)."""
    return collision.check_mover_collision(xy, c_size, quat=quat, collision_shape=collision_shape)


def expand_c_size(c_size, num_movers: int, collision_shape: str, dtype) -> jnp.ndarray:
    """Normalize user-facing collision size to [M] (circle) / [M, 2] (box)
    (reference get_c_size_arr, basic_envs.py:1209-1242)."""
    c = jnp.asarray(c_size, dtype)
    if collision_shape == 'circle':
        return jnp.broadcast_to(c.reshape(-1), (num_movers,))
    if c.ndim <= 1:
        return jnp.broadcast_to(c.reshape(1, 2), (num_movers, 2))
    return c.reshape(num_movers, 2)


def min_goal_distance(c_size: jnp.ndarray, c_offset, collision_shape: str) -> jnp.ndarray:
    """Minimum distance between any two sampled goals
    (benchmark_planning_env.py:269-274; uses the scalar/2-vector user size)."""
    if collision_shape == 'circle':
        return 2.0 * (c_size[0] + c_offset)
    return 2.0 * jnp.linalg.norm(c_size[0] + c_offset)
