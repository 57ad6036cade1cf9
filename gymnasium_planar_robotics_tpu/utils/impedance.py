"""Task-space impedance control, pure-function form.

API-surface equivalent of the reference's ``MoverImpedanceController``
(``/root/reference/gymnasium_planar_robotics/utils/impedance_control.py``):
stiffness diag(K_t, K_r), critical damping ``D = 2*sqrt(K*m)``
(impedance_control.py:41-47), orientation error as the axis-angle of
``R_cur^T @ R_des`` rotated into the base frame (impedance_control.py:142-147),
wrench = mask * (K e - D v) (impedance_control.py:150).

For a free joint the reference's ``mj_jacBody`` Jacobian is identity-
structured (SURVEY.md §3.5), so the whole controller reduces to this direct
PD law — no Jacobian machinery, fully batched and jittable.  The pushing env
uses it implicitly (z + rotations held); this module is the standalone surface
for users who subclassed or configured the reference controller.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from gymnasium_planar_robotics_tpu.ops import rotations


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ImpedanceGains:
    """Stiffness/damping configuration (reference impedance_control.py:28-55)."""

    stiffness: jax.Array  # [6] diag of K: (x, y, z, a, b, c)
    damping: jax.Array  # [6] diag of D
    joint_mask: jax.Array  # [6] 0/1 — which DoFs the controller drives


def make_gains(
    mover_mass: float,
    translational_stiffness=1.0,
    rotational_stiffness=0.1,
    joint_mask=None,
    dtype=jnp.float64,
) -> ImpedanceGains:
    """Build gains with the reference's critical-damping rule D = 2*sqrt(K*m)."""
    kt = jnp.broadcast_to(jnp.asarray(translational_stiffness, dtype), (3,))
    kr = jnp.broadcast_to(jnp.asarray(rotational_stiffness, dtype), (3,))
    k = jnp.concatenate([kt, kr])
    d = 2.0 * jnp.sqrt(k * mover_mass)
    mask = jnp.ones(6, dtype) if joint_mask is None else jnp.asarray(joint_mask, dtype)
    return ImpedanceGains(stiffness=k, damping=d, joint_mask=mask)


def impedance_wrench(
    gains: ImpedanceGains,
    pos: jnp.ndarray,  # [..., 3] current position
    quat: jnp.ndarray,  # [..., 4] current orientation (w, x, y, z)
    vel: jnp.ndarray,  # [..., 6] current twist (v, omega)
    pos_d: jnp.ndarray,  # [..., 3] desired position
    quat_d: jnp.ndarray,  # [..., 4] desired orientation
    ctrl_callback: Callable[[jnp.ndarray], jnp.ndarray] | None = None,
) -> jnp.ndarray:
    """Desired wrench [..., 6] = mask * (K e - D v), batched.

    ``ctrl_callback`` mirrors the reference's hook for force/torque limits
    (impedance_control.py:104-112).
    """
    mat = rotations.quat2mat(quat)
    mat_d = rotations.quat2mat(quat_d)

    pos_err = pos_d - pos
    # orientation error: axis-angle of R_cur^T R_des, expressed in base frame
    rel = jnp.matmul(jnp.swapaxes(mat, -1, -2), mat_d)
    axis, theta = rotations.quat2axisangle(rotations.mat2quat(rel))
    rot_err = jnp.matmul(mat, (axis * theta[..., None])[..., None])[..., 0]

    err = jnp.concatenate([pos_err, rot_err], axis=-1)
    ctrl = gains.joint_mask * (gains.stiffness * err - gains.damping * vel)
    if ctrl_callback is not None:
        ctrl = ctrl_callback(ctrl)
    return ctrl
