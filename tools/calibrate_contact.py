"""Episode-scale contact calibration: full 50-step open-loop + closed-loop
error-growth curves of the quasi-2D contact model vs the reference MuJoCo
engine (reference benchmark_pushing_env.py physics; SURVEY.md §2.2 P3
tolerance bar).

Run on CPU (the reference is CPU MuJoCo):

    PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python tools/calibrate_contact.py

Prints one row per scenario (max object error over the episode, error at the
final step, max mover error, max |yaw| error) and a per-step curve for the
worst case; CALIBRATION.md records the results.
"""

from __future__ import annotations

import sys

import numpy as np

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, '/root/repo')
sys.path.insert(0, '/root/reference')

from gymnasium_planar_robotics_tpu.models import pushing  # noqa: E402

EPISODE = 50


def scripted_pursuit(obs, a_max=10.0):
    """Closed-loop probe policy: accelerate the mover toward the point behind
    the object (seen through the policy's OWN engine observations), pushing
    it toward the goal; brake near contact.  Purely a function of the obs
    dict, so each engine feeds it its own diverging observations."""
    mover = np.asarray(obs['observation'][:2], float)
    mover_vel = np.asarray(obs['observation'][2:4], float)
    obj = np.asarray(obs['achieved_goal'], float)
    goal = np.asarray(obs['desired_goal'], float)
    to_goal = goal - obj
    d = np.linalg.norm(to_goal)
    push_dir = to_goal / max(d, 1e-6)
    target = obj - 0.11 * push_dir  # stand-off point behind the object
    acc = 60.0 * (target - mover) - 12.0 * mover_vel
    n = np.linalg.norm(acc)
    return acc if n <= a_max else a_max * acc / n


def run_reference(mover_start, obj_start, goal, actions=None, policy=None, steps=EPISODE):
    from gymnasium_planar_robotics.envs.manipulation.benchmark_pushing_env import BenchmarkPushingEnv
    from gymnasium_planar_robotics.utils import mujoco_utils

    env = BenchmarkPushingEnv(std_noise=0.0, render_mode=None)
    env.object_xy_start_pos = np.array(obj_start)
    env.object_xy_goal_pos = np.array(goal)
    env.reload_model(mover_start_xy_pos=np.array([mover_start]))
    obs = {
        'observation': np.concatenate([np.array(mover_start), np.zeros(2)]),
        'achieved_goal': np.array(obj_start),
        'desired_goal': np.array(goal),
    }
    rows = []
    for t in range(steps):
        a = np.asarray(actions[t], float) if actions is not None else policy(obs)
        obs, rew, term, trunc, info = env.step(a)
        mq = env.get_mover_qpos(env.mover_names[0])
        oq = mujoco_utils.get_joint_qpos(env.model, env.data, env.object_joint_name)
        qw, qx, qy, qz = oq[3:7]
        yaw = np.arctan2(2 * (qw * qz + qx * qy), 1 - 2 * (qy * qy + qz * qz))
        rows.append(dict(mx=mq[0], my=mq[1], mz=float(mq[2]), ox=oq[0], oy=oq[1], yaw=float(yaw), term=bool(term)))
        if term:
            break
    return rows


def run_mine(mover_start, obj_start, goal, actions=None, policy=None, steps=EPISODE):
    config, params = pushing.make_pushing_env(std_noise=0.0, dtype=jnp.float64)
    z = jnp.zeros(2, jnp.float64)
    s = jnp.zeros((), jnp.float64)
    st = pushing.PushingState(
        pos=jnp.asarray(mover_start, jnp.float64), vel=z, acc=z, act=z,
        obj_pos=jnp.asarray(obj_start, jnp.float64), obj_vel=z, obj_yaw=s, obj_w=s,
        mover_z=jnp.asarray(params.initial_zpos, jnp.float64), mover_vz=s,
        goal=jnp.asarray(goal, jnp.float64), key=jax.random.PRNGKey(0),
        steps=jnp.asarray(0, jnp.int32),
    )
    stepf = jax.jit(lambda s_, a_: pushing.step(config, params, s_, a_))
    obs = {
        'observation': np.concatenate([np.array(mover_start), np.zeros(2)]),
        'achieved_goal': np.array(obj_start),
        'desired_goal': np.array(goal),
    }
    rows = []
    for t in range(steps):
        a = np.asarray(actions[t], float) if actions is not None else policy(obs)
        st, jobs, rew, term, trunc, info = stepf(st, jnp.asarray(a, jnp.float64))
        obs = {k: np.asarray(v) for k, v in jobs.items()}
        rows.append(dict(mx=float(st.pos[0]), my=float(st.pos[1]), mz=float(st.mover_z),
                         ox=float(st.obj_pos[0]), oy=float(st.obj_pos[1]),
                         yaw=float(st.obj_yaw), term=bool(term)))
        if term:
            break
    return rows


# 50-step scenarios: gentle enough that mover AND object stay on the 3x3
# table (workspace [0, 0.66], sampling box ~[0.13, 0.53]) for a full episode.
# (mover, object, goal, actions-or-None for closed loop)
SCENARIOS = {
    'headon_slow_50': ([0.20, 0.36], [0.3605, 0.36], [0.52, 0.36],
                       [[0.4, 0.0]] * 25 + [[-0.4, 0.0]] * 25),
    'pulse_pauses_50': ([0.20, 0.36], [0.3605, 0.36], [0.52, 0.36],
                        ([[1.2, 0.0]] * 5 + [[-1.2, 0.0]] * 5) * 5),
    'offcenter_50': ([0.18, 0.32], [0.30, 0.36], [0.50, 0.40],
                     [[0.5, 0.06]] * 30 + [[-0.5, -0.06]] * 20),
    # NOTE: a PERFECTLY symmetric diagonal push (mover, object and action all
    # on the x=y line) is a saddle: the object can escape off either the +x
    # or +y corner, engines pick the branch from sub-mm asymmetries, and the
    # branches end at different walls (~0.4 m apart).  That is chaos of the
    # underlying system, not model error — the calibration uses slightly
    # asymmetric diagonals, like any real trajectory.
    'diagonal_50': ([0.17, 0.185], [0.27, 0.283], [0.50, 0.50],
                    [[0.45, 0.42]] * 30 + [[-0.45, -0.42]] * 20),
    'spin_heavy_50': ([0.18, 0.425], [0.30, 0.48], [0.50, 0.46],
                      [[0.6, 0.0]] * 30 + [[-0.6, 0.0]] * 20),
    'face_switch_50': ([0.20, 0.36], [0.36, 0.36], [0.42, 0.52],
                       [[0.9, 0.0]] * 12 + [[-0.9, 0.7]] * 14 + [[0.0, 0.7]] * 24),
    'closed_loop_pursuit': ([0.20, 0.30], [0.34, 0.38], [0.50, 0.44], None),
    'closed_loop_diag': ([0.18, 0.20], [0.30, 0.315], [0.47, 0.49], None),
}


def run_ensemble(n_seeds: int = 20, steps: int = EPISODE):
    """Randomized 50-step episodes (start poses jittered, random moderate
    action sequences — the distribution RL training actually visits): per-seed
    max object error vs the reference, reported as median/90th/max.  This is
    the headline bound; the named scenarios above are directed stress cases."""
    errs = []
    climbs = 0  # episodes entering the corner-slip regime (reference mover z
    # lifts >5 mm above hover — the instrumented climb signature)
    for seed in range(n_seeds):
        rng = np.random.default_rng(100 + seed)
        m0 = [0.18 + 0.04 * rng.random(), 0.30 + 0.08 * rng.random()]
        ang = rng.uniform(-0.5, 0.5)
        o0 = [m0[0] + 0.12 * np.cos(ang), m0[1] + 0.12 * np.sin(ang)]
        g = [0.45, 0.40]
        acts = rng.uniform(-1.2, 1.2, size=(steps, 2))
        acts[:, 0] = np.abs(acts[:, 0]) * 0.8 + 0.2  # bias toward the object
        ref = run_reference(m0, o0, g, acts)
        mine = run_mine(m0, o0, g, acts)
        n = min(len(ref), len(mine))
        e = max(max(abs(r['ox'] - m['ox']), abs(r['oy'] - m['oy'])) for r, m in zip(ref[:n], mine[:n]))
        errs.append(e)
        z0 = ref[0]['mz']
        if max(r['mz'] for r in ref) > z0 + 0.005:
            climbs += 1
    errs = np.sort(np.asarray(errs))
    print(f'\nensemble ({n_seeds} seeds, {steps}-step episodes, random moderate pushes):')
    print(f'  median={np.median(errs)*1e3:.1f}mm  p90={errs[int(0.9*len(errs))-1]*1e3:.1f}mm  max={errs[-1]*1e3:.1f}mm')
    print(f'  corner-slip regime entered (reference mover z lift >5mm): {climbs}/{n_seeds} episodes')
    return errs


def main():
    worst = None
    print(f'{"scenario":24s} {"steps":>5s} {"max_obj_err":>12s} {"final_obj_err":>13s} {"max_mover_err":>13s} {"max_yaw_err":>11s}')
    for name, (m0, o0, g, acts) in SCENARIOS.items():
        pol = scripted_pursuit if acts is None else None
        ref = run_reference(m0, o0, g, acts, pol)
        mine = run_mine(m0, o0, g, acts, pol)
        n = min(len(ref), len(mine))
        obj_err = [max(abs(r['ox'] - m['ox']), abs(r['oy'] - m['oy'])) for r, m in zip(ref[:n], mine[:n])]
        mov_err = [max(abs(r['mx'] - m['mx']), abs(r['my'] - m['my'])) for r, m in zip(ref[:n], mine[:n])]
        yaw_err = [abs(r['yaw'] - m['yaw']) for r, m in zip(ref[:n], mine[:n])]
        print(f'{name:24s} {n:5d} {max(obj_err)*1e3:10.1f}mm {obj_err[-1]*1e3:11.1f}mm '
              f'{max(mov_err)*1e3:11.1f}mm {max(yaw_err):11.4f}')
        if worst is None or max(obj_err) > worst[1]:
            worst = (name, max(obj_err), obj_err)
    name, peak, curve = worst
    print(f'\nworst case {name} (peak {peak*1e3:.1f} mm), per-step object error [mm]:')
    print('  ' + ' '.join(f'{e*1e3:.1f}' for e in curve))
    run_ensemble()


if __name__ == '__main__':
    main()
