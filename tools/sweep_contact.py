"""Contact-model parameter sweep harness (round 5): evaluates a parameter
tweak over the 10-step strong + gentle suites (tests/test_pushing_env.py
CONTACT_SCENARIOS) and the 50-step open-loop episode suite
(tools/calibrate_contact.py SCENARIOS), against the live reference engine.

Default sweep: the wedge-capped vertical share (cone_fz_cap, cone_fz_slope).

    PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python tools/sweep_contact.py "0.005,0.008" "75,100,125"
"""

from __future__ import annotations

import dataclasses
import itertools
import sys

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, '/root/repo')
sys.path.insert(0, '/root/reference')
sys.path.insert(0, '/root/repo/tools')

from gymnasium_planar_robotics_tpu.models import pushing  # noqa: E402

import calibrate_contact as cc  # noqa: E402

# 10-step suites (mirrors tests/test_pushing_env.py CONTACT_SCENARIOS)
STRONG = {
    'diagonal': ([0.24, 0.24], [0.34, 0.34], [[2.0, 2.0]] * 10),
    'diag_fast': ([0.22, 0.22], [0.345, 0.345], [[4.0, 4.0]] * 8),
    'diag_asym': ([0.24, 0.26], [0.35, 0.345], [[2.5, 2.0]] * 10),
}
GENTLE = {
    'headon': ([0.24, 0.36], [0.4005, 0.36], [[3.0, 0.0]] * 10),
    'offcenter': ([0.24, 0.40], [0.36, 0.44], [[3.0, 0.0]] * 10),
    'push_release': ([0.24, 0.36], [0.4005, 0.36], [[5.0, 0.0]] * 5 + [[-5.0, 0.0]] * 5),
    'slow': ([0.30, 0.36], [0.4005, 0.36], [[1.0, 0.0]] * 12),
    'corner_skim': ([0.24, 0.30], [0.355, 0.405], [[3.0, 0.5]] * 10),
    'push_turn': ([0.24, 0.36], [0.4005, 0.36], [[3.0, 0.0]] * 5 + [[0.0, 3.0]] * 5),
    'offcenter_big': ([0.24, 0.395], [0.36, 0.475], [[3.5, 0.0]] * 10),
}

_REF_CACHE: dict = {}
_REF50: dict = {}


def ref_traj(m0, o0, acts):
    key = (tuple(m0), tuple(o0), tuple(map(tuple, acts)))
    if key not in _REF_CACHE:
        _REF_CACHE[key] = cc.run_reference(m0, o0, [0.55, 0.55], acts, steps=len(acts))
    return _REF_CACHE[key]


def run_mine_tweaked(m0, o0, acts, tweak):
    config, params = pushing.make_pushing_env(std_noise=0.0, dtype=jnp.float64)
    if tweak is not None:
        params = tweak(params)
    z = jnp.zeros(2, jnp.float64)
    s = jnp.zeros((), jnp.float64)
    st = pushing.PushingState(
        pos=jnp.asarray(m0, jnp.float64), vel=z, acc=z, act=z,
        obj_pos=jnp.asarray(o0, jnp.float64), obj_vel=z, obj_yaw=s, obj_w=s,
        mover_z=jnp.asarray(params.initial_zpos, jnp.float64), mover_vz=s,
        goal=jnp.asarray([0.55, 0.55], jnp.float64), key=jax.random.PRNGKey(0),
        steps=jnp.asarray(0, jnp.int32),
    )
    stepf = jax.jit(lambda s_, a_: pushing.step(config, params, s_, a_))
    rows = []
    for a in acts:
        st, obs, rew, term, trunc, info = stepf(st, jnp.asarray(a, jnp.float64))
        rows.append(dict(ox=float(st.obj_pos[0]), oy=float(st.obj_pos[1]),
                         mx=float(st.pos[0]), my=float(st.pos[1]), term=bool(term)))
        if bool(term):
            break
    return rows


def suite_err(scenarios, tweak):
    out = {}
    for name, (m0, o0, acts) in scenarios.items():
        ref = ref_traj(m0, o0, acts)
        mine = run_mine_tweaked(m0, o0, acts, tweak)
        n = min(len(ref), len(mine))
        e = max(max(abs(r['ox'] - m['ox']), abs(r['oy'] - m['oy'])) for r, m in zip(ref[:n], mine[:n]))
        out[name] = e
    return out


def suite50_err(tweak):
    out = {}
    for name, (m0, o0, g, acts) in cc.SCENARIOS.items():
        if acts is None:
            continue  # closed-loop rows are slow; run tools/calibrate_contact.py for them
        if name not in _REF50:
            _REF50[name] = cc.run_reference(m0, o0, g, acts)
        ref = _REF50[name]
        mine = run_mine_tweaked(m0, o0, acts, tweak)
        n = min(len(ref), len(mine))
        e = max(max(abs(r['ox'] - m['ox']), abs(r['oy'] - m['oy'])) for r, m in zip(ref[:n], mine[:n]))
        out[name] = e
    return out


def report(label, tweak):
    s = suite_err(STRONG, tweak)
    g = suite_err(GENTLE, tweak)
    e50 = suite50_err(tweak)
    wg = max(g, key=g.get)
    e50s = ' '.join(f'{k.split("_50")[0][:9]}={v*1e3:.0f}' for k, v in sorted(e50.items()))
    print(f'{label} | '
          f'{s["diagonal"]*1e3:5.1f} {s["diag_fast"]*1e3:5.1f} {s["diag_asym"]*1e3:5.1f} | '
          f'{max(g.values())*1e3:6.1f} ({wg:>13s}) | {e50s}')


def main():
    caps = [float(x) for x in (sys.argv[1].split(',') if len(sys.argv) > 1 else ('0.005', '0.008', '0.011'))]
    slopes = [float(x) for x in (sys.argv[2].split(',') if len(sys.argv) > 2 else ('75', '100', '125'))]
    print(f'{"cap0":>6} {"slope":>6} | strong d/df/da | gentle max (worst) | 50-step all')
    for cap0, slope in itertools.product(caps, slopes):
        def tweak(p, cap0=cap0, slope=slope):
            return dataclasses.replace(
                p, cone_fz_cap=jnp.asarray(cap0, jnp.float64),
                cone_fz_slope=jnp.asarray(slope, jnp.float64))
        report(f'{cap0:6.3f} {slope:6.1f}', tweak)


if __name__ == '__main__':
    main()
