"""Debug-mode invariant checking (the reference's loud asserts, under jit).

The reference validates at runtime with Python asserts — e.g. "mover not
above any tile => missed termination" (``/root/reference/gymnasium_planar_
robotics/envs/basic_envs.py:514-517``).  Branch-free jitted kernels cannot
raise, so the production path reports such states as invalid instead; this
module restores the loud behavior for debugging via ``jax.experimental
.checkify``: wrap a step function once, run it, and call ``err.throw()``
host-side (or inspect ``err.get()``) to surface violated invariants with
messages.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def _default_invariants(config, params, state, out) -> None:
    new_state, obs, reward, terminated, truncated, info = out
    pos = new_state.pos
    vel = new_state.vel
    checkify.check(jnp.isfinite(pos).all(), 'non-finite mover position')
    checkify.check(jnp.isfinite(vel).all(), 'non-finite mover velocity')
    # clamp chain guarantees |v| <= v_max (+ sensor-noise slack)
    vmax = params.v_max + 10.0 * params.std_noise[1] + 1e-6
    speed = jnp.linalg.norm(vel.reshape(-1, 2), axis=-1)
    checkify.check((speed <= vmax).all(), 'velocity clamp violated')
    # the reference's "mover must be above a tile" assert (basic_envs.py:514-517):
    # outside the grid bounding box means a missed wall termination upstream
    hi = params.grid.max_xy
    xy = pos.reshape(-1, 2)
    on_table = ((xy >= -params.c_size.max()) & (xy <= hi + params.c_size.max())).all()
    checkify.check(on_table | terminated.any(), 'mover left the table without termination')


def make_checked_step(config, params, step_fn: Callable, extra_invariants: Callable | None = None):
    """Wrap ``step_fn(config, params, state, action)`` with invariant checks.

    Returns ``checked(state, action) -> (err, (state, obs, reward, term,
    trunc, info))``; call ``err.throw()`` to raise on violations.
    """

    def body(state, action):
        out = step_fn(config, params, state, action)
        _default_invariants(config, params, state, out)
        if extra_invariants is not None:
            extra_invariants(config, params, state, out)
        return out

    return jax.jit(checkify.checkify(body, errors=checkify.user_checks))
