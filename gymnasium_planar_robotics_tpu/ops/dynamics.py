"""Mover dynamics kernels: clamp chain + exact MuJoCo-equivalent integration.

The reference delegates integration to the MuJoCo C engine; for GymPR's mover
configuration (free joint, ``damping=0``, ``gravcomp=1``, force actuators on
x/y only — basic_envs.py:1132 and benchmark_planning_env.py:305-321) the
engine reduces *exactly* to a planar double integrator with semi-implicit
Euler updates:

    qacc = F / m            (force actuator, gainprm = mass  =>  qacc = ctrl)
    v   += dt * qacc
    p   += dt * v

and, in jerk mode, an actuator activation state integrated *before* force
application (``dyntype="integrator" actearly="true"``):

    act += dt * ctrl;  F = m * act  =>  qacc = act

The reference's own test oracle encodes this update order
(``/root/reference/tests/test_benchmark_planning_env.py:86-97``); these
kernels reproduce it bit-for-bit in float64 and are fully batched.

``ensure_max_dyn_val`` mirrors ``BenchmarkPlanningEnv.ensure_max_dyn_val``
(``benchmark_planning_env.py:610-645``): candidate = current + dt * deriv;
if its L2 norm exceeds the max, rescale onto the max sphere and back-compute
the derivative actually applied.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


def ensure_max_dyn_val(
    current: jnp.ndarray, max_value: jnp.ndarray | float, next_deriv: jnp.ndarray, dt: jnp.ndarray | float
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Clamp the integrated value to an L2 ball, back-computing the applied derivative.

    Batched over leading dims; last dim is the (x, y) pair.  Mirrors
    benchmark_planning_env.py:610-645 (note the reference clamps when
    ``norm >= max`` — inclusive).
    """
    candidate = current + dt * next_deriv
    norm = jnp.linalg.norm(candidate, axis=-1, keepdims=True)
    clamp = norm >= max_value
    safe_norm = jnp.where(norm > 0, norm, 1.0)
    clamped_value = max_value * candidate / safe_norm
    next_value = jnp.where(clamp, clamped_value, candidate)
    next_deriv_new = jnp.where(clamp, (next_value - current) / dt, next_deriv)
    return next_value, next_deriv_new


class CycleResult(NamedTuple):
    pos: jnp.ndarray  # [M, 2]
    vel: jnp.ndarray  # [M, 2]
    acc: jnp.ndarray  # [M, 2] acceleration applied this cycle (MuJoCo qacc)
    act: jnp.ndarray  # [M, 2] actuator activation state (jerk mode; zeros otherwise)


def acceleration_cycle(
    pos: jnp.ndarray,
    vel: jnp.ndarray,
    vel_measured: jnp.ndarray,
    action: jnp.ndarray,
    v_max: float,
    dt: float,
    accel_scale: jnp.ndarray | float = 1.0,
) -> CycleResult:
    """One 1 ms control cycle in acceleration mode.

    ``vel_measured`` is the (possibly noisy) velocity reading used for the
    clamp (benchmark_planning_env.py:430, 442); the true state integrates the
    resulting control exactly.

    ``accel_scale`` is gain-mass / total-body-mass: the actuator gain is the
    configured mover mass (benchmark_planning_env.py:303-321) but a bumper
    geom adds its own mass to the body (basic_envs.py:911-925), so the real
    qacc is the commanded acceleration scaled by m_gain/(m_mover+m_bumper).
    1.0 (no bumper) multiplies exactly (IEEE), keeping the bit-exact path.
    """
    _, acc_cmd = ensure_max_dyn_val(vel_measured, v_max, action, dt)
    qacc = accel_scale * acc_cmd
    new_vel = vel + dt * qacc
    new_pos = pos + dt * new_vel
    return CycleResult(new_pos, new_vel, qacc, jnp.zeros_like(acc_cmd))


def jerk_cycle(
    pos: jnp.ndarray,
    vel: jnp.ndarray,
    act: jnp.ndarray,
    vel_measured: jnp.ndarray,
    action: jnp.ndarray,
    v_max: float,
    a_max: float,
    dt: float,
    accel_scale: jnp.ndarray | float = 1.0,
) -> CycleResult:
    """One 1 ms control cycle in jerk mode.

    The acceleration reading is the activation state itself (read without
    noise — benchmark_planning_env.py:433, "only SetAcc is available in a
    real system").  Clamp chain per benchmark_planning_env.py:432-440: first
    bound the candidate acceleration to ``a_max``, then bound the resulting
    velocity to ``v_max``; if the velocity clamp changed the acceleration,
    re-derive the jerk from the acceleration actually needed.

    ``accel_scale``: see ``acceleration_cycle`` — the activation integrates
    in control space, the body accelerates at ``accel_scale * act``.  The
    clamp chain reads the REAL qacc (``get_mover_qacc``,
    benchmark_planning_env.py:433) == ``accel_scale * act``; with no bumper
    the two coincide.
    """
    acc_meas = accel_scale * act
    acc_tmp, jerk_1 = ensure_max_dyn_val(acc_meas, a_max, action, dt)
    _, acc_final = ensure_max_dyn_val(vel_measured, v_max, acc_tmp, dt)
    vel_clamped = (acc_final != acc_tmp).any(axis=-1, keepdims=True)
    jerk_ctrl = jnp.where(vel_clamped, (acc_final - acc_meas) / dt, jerk_1)

    # MuJoCo integrator actuator with actearly: act += dt * ctrl, then F = m * act
    new_act = act + dt * jerk_ctrl
    qacc = accel_scale * new_act
    new_vel = vel + dt * qacc
    new_pos = pos + dt * new_vel
    return CycleResult(new_pos, new_vel, qacc, new_act)
