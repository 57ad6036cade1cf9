"""Planar box-push contact kernel (the P3 native-equivalent of SURVEY.md §2.2).

The reference's only real use of MuJoCo contact dynamics is the pushing env:
a 1.24 kg impedance-stabilized mover box pushes a 10 g box across the tiles
(``/root/reference/gymnasium_planar_robotics/envs/manipulation/
benchmark_pushing_env.py:172-178, 331-342``; elliptic cone, solref (0.02, 1),
friction (1, 0.005, 1e-4), object joint damping 0.01).

Empirical reduction (measured from the reference engine, see
tests/test_pushing_env.py): the object translates with negligible yaw even
under off-center pushes (floor friction of the flat 4-corner contact patch
dominates; observed |yaw| < 0.003 rad, lateral drift < 0.5 mm), penetration
under sustained push is 1-2 mm, the object velocity-matches the mover, and
free sliding decelerates at ~mu*g with a short solver-artifact creep phase
near stop.  That licenses a quasi-2D axis-aligned model:

- mover-object: penalty normal force ``F = k*pen - b*v_sep`` along the axis
  of minimum overlap + capped viscous tangential friction (elliptic cone in
  2D degenerates to a per-axis cap), equal-and-opposite reaction on the mover;
- object-floor: exact discrete Coulomb (``|dv| = min(mu*g*dt, |v|)`` opposing
  motion — the stick-slip update that a 1 kHz integrator realizes) plus the
  object joint's linear damping.

Parameters are exposed and tolerance-calibrated against reference
trajectories rather than bit-matched (SURVEY.md §2.2 P3).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class ContactForces(NamedTuple):
    f_obj: jnp.ndarray  # [2] force on the object
    f_mover: jnp.ndarray  # [2] reaction on the mover
    penetration: jnp.ndarray  # scalar >= 0
    in_contact: jnp.ndarray  # scalar bool


def box_push_contact(
    mover_xy: jnp.ndarray,
    mover_vel: jnp.ndarray,
    obj_xy: jnp.ndarray,
    obj_vel: jnp.ndarray,
    mover_half: jnp.ndarray,  # [2]
    obj_half: jnp.ndarray,  # [2]
    k_n: jnp.ndarray,  # normal penalty stiffness [N/m]
    b_n: jnp.ndarray,  # normal damping [N s/m]
    b_t: jnp.ndarray,  # tangential viscous coefficient [N s/m]
    mu: jnp.ndarray,  # mover-object friction coefficient
) -> ContactForces:
    """Axis-aligned box-box penalty contact; batched over leading dims."""
    d = obj_xy - mover_xy
    overlap = (mover_half + obj_half) - jnp.abs(d)  # [..., 2]
    in_contact = (overlap > 0).all(axis=-1)

    axis_x = overlap[..., 0] < overlap[..., 1]
    pen = jnp.where(axis_x, overlap[..., 0], overlap[..., 1])
    sign = jnp.where(axis_x, jnp.sign(d[..., 0]), jnp.sign(d[..., 1]))
    sign = jnp.where(sign == 0, 1.0, sign)
    # outward normal (mover -> object)
    n = jnp.stack(
        [jnp.where(axis_x, sign, 0.0), jnp.where(axis_x, 0.0, sign)], axis=-1
    )

    v_rel = obj_vel - mover_vel
    vn = (v_rel * n).sum(-1)  # separation speed along the normal
    f_n_mag = jnp.maximum(0.0, k_n * pen - b_n * vn)

    t = jnp.stack([-n[..., 1], n[..., 0]], axis=-1)
    vt = (v_rel * t).sum(-1)
    f_t_mag = jnp.clip(-b_t * vt, -mu * f_n_mag, mu * f_n_mag)

    f_obj = (f_n_mag[..., None] * n + f_t_mag[..., None] * t) * in_contact[..., None]
    return ContactForces(
        f_obj=f_obj,
        f_mover=-f_obj,
        penetration=jnp.maximum(pen, 0.0) * in_contact,
        in_contact=in_contact,
    )


def coulomb_floor_step(
    vel: jnp.ndarray, mu_g_dt: jnp.ndarray, eps: float = 1e-12
) -> jnp.ndarray:
    """One discrete Coulomb floor-friction update: shrink the speed by up to
    ``mu*g*dt``, stopping dead instead of reversing (exact stick-slip)."""
    speed = jnp.linalg.norm(vel, axis=-1, keepdims=True)
    scale = jnp.maximum(0.0, 1.0 - mu_g_dt / jnp.maximum(speed, eps))
    return vel * scale
