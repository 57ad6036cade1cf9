"""Instrumented per-cycle contact-quantity dump for calibration work: runs
scenarios through a copy of the pushing cycle loop that also records slip,
budget, f_lat, resid, f_z, f_n, zf and mover z per cycle.

    PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python tools/instrument_contact.py
"""

from __future__ import annotations

import dataclasses
import sys

import numpy as np

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, '/root/repo')

from gymnasium_planar_robotics_tpu.models import pushing  # noqa: E402
from gymnasium_planar_robotics_tpu.ops import contact, dynamics  # noqa: E402


def run_instrumented(m0, o0, actions, tweak=None):
    config, params = pushing.make_pushing_env(std_noise=0.0, dtype=jnp.float64)
    if tweak is not None:
        params = tweak(params)
    dt = float(params.dt)
    mu_g_dt = float(params.floor_mu * params.gravity * params.dt)

    pos = jnp.asarray(m0, jnp.float64)
    vel = jnp.zeros(2, jnp.float64)
    obj_pos = jnp.asarray(o0, jnp.float64)
    obj_vel = jnp.zeros(2, jnp.float64)
    obj_yaw = jnp.zeros((), jnp.float64)
    obj_w = jnp.zeros((), jnp.float64)
    mz = jnp.asarray(float(params.initial_zpos), jnp.float64)
    mvz = jnp.zeros((), jnp.float64)
    logs = []
    for t, a in enumerate(actions):
        action = jnp.asarray(a, jnp.float64)
        c_axis = jnp.asarray(-1.0, jnp.float64)
        for cyc in range(config.num_cycles):
            _, ctrl_acc = dynamics.ensure_max_dyn_val(vel, params.v_max, action, params.dt)
            forces = contact.box_push_contact_v2(
                pos, vel, obj_pos, obj_vel, obj_yaw, obj_w,
                params.mover_half, params.object_half,
                params.contact_k, params.contact_b, params.contact_bt, params.contact_mu,
                sticky_axis=c_axis, cone_zeta=params.cone_zeta, cone_vt=params.cone_vt,
                cone_vt_hi=params.cone_vt_hi, cone_vt_off=params.cone_vt_off,
                fz_cap=params.cone_fz_cap
                + params.cone_fz_slope * jnp.maximum(mz - params.initial_zpos, 0.0),
            )
            zf = float(jnp.clip(
                (jnp.minimum(mz + params.mover_height, params.object_height) - mz) / params.mover_height,
                0.0, 1.0))
            f_obj_c = forces.f_obj * zf
            f_imp_c = forces.f_imp * zf
            f_z_c = forces.f_z * zf
            torque_c = forces.torque_obj * zf
            # tangential diagnostics (recompute like the kernel)
            n = jnp.where(forces.axis == 0.0,
                          jnp.asarray([1.0, 0.0]) * jnp.sign(obj_pos[0] - pos[0]),
                          jnp.asarray([0.0, 1.0]) * jnp.sign(obj_pos[1] - pos[1]))
            tvec = jnp.asarray([-n[1], n[0]])
            v_rel = obj_vel - vel
            vt = float(v_rel @ tvec)
            vn = float(v_rel @ n)
            budget = float(params.contact_mu * forces.f_n_mag)

            zacc = (params.imp_k * (params.initial_zpos - mz) - params.imp_d * mvz + f_z_c) / params.total_mass
            mvz = mvz + params.dt * zacc
            mz = jnp.maximum(mz + params.dt * mvz, 0.0)
            qacc = params.accel_scale * ctrl_acc.reshape(2) + (-f_obj_c) / params.total_mass
            vel = vel + params.dt * qacc
            pos = pos + params.dt * vel
            obj_acc = f_obj_c / params.object_mass
            damp = 1.0 + params.dt * params.object_damping / params.object_mass
            v_obj = (obj_vel + params.dt * obj_acc) / damp
            load = 1.0 + jnp.minimum(
                params.plow_kappa * f_imp_c / (params.object_mass * params.gravity), params.plow_cap,
            ) + jnp.minimum(
                params.cone_plow * f_z_c / (params.object_mass * params.gravity), params.cone_plow_cap,
            )
            v_obj = contact.coulomb_floor_step(v_obj, mu_g_dt * load)
            obj_pos = obj_pos + params.dt * v_obj
            obj_vel = v_obj
            damp_w = 1.0 + params.dt * params.object_damping / params.obj_inertia
            obj_w = (obj_w + params.dt * torque_c / params.obj_inertia) / damp_w
            obj_w = contact.coulomb_spin_step(obj_w, params.mu_spin * params.dt * load)
            obj_yaw = obj_yaw + params.dt * obj_w
            c_axis = jnp.where(zf > 0, forces.axis, -1.0)
            if cyc % 10 == 0:
                logs.append(dict(
                    t=t, cyc=cyc, contact=bool(forces.in_contact), vt=vt, vn=vn,
                    fn=float(forces.f_n_mag), budget=budget, fz=float(forces.f_z),
                    load=float(load), mz=float(mz), pen=float(forces.penetration),
                    ox=float(obj_pos[0]), oy=float(obj_pos[1]), zf=zf,
                ))
    return logs


SCEN = {
    'diagonal_50_gentle': ([0.17, 0.185], [0.27, 0.283], [[0.45, 0.42]] * 30),
    'diagonal_strong': ([0.24, 0.24], [0.34, 0.34], [[2.0, 2.0]] * 10),
}


def main():
    tweak = None
    if len(sys.argv) > 2:
        cap0, slope = (float(x) for x in sys.argv[1:3])
        def tweak(p):
            return dataclasses.replace(
                p, cone_fz_cap=jnp.asarray(cap0, jnp.float64),
                cone_fz_slope=jnp.asarray(slope, jnp.float64))
    for name, (m0, o0, acts) in SCEN.items():
        print(f'\n=== {name} ===')
        logs = run_instrumented(m0, o0, acts, tweak)
        print(f'{"t":>2} {"cyc":>3} {"ct":>2} {"vt":>7} {"vn":>7} {"fn":>6} {"budget":>6} '
              f'{"fz":>6} {"load":>5} {"mz_mm":>6} {"pen_mm":>6} {"zf":>4}')
        for r in logs:
            if not r['contact'] and r['cyc'] != 0:
                continue
            print(f'{r["t"]:2d} {r["cyc"]:3d} {int(r["contact"]):2d} {r["vt"]:7.3f} {r["vn"]:7.3f} '
                  f'{r["fn"]:6.3f} {r["budget"]:6.3f} {r["fz"]:6.3f} {r["load"]:5.2f} '
                  f'{r["mz"]*1e3:6.1f} {r["pen"]*1e3:6.1f} {r["zf"]:4.2f}')


if __name__ == '__main__':
    main()
