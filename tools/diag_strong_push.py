"""Diagnostic: per-step trajectory dump for the strong diagonal-push
scenarios (the round-4 'Known trade', CALIBRATION.md) — reference MuJoCo vs
this engine.  Prints mover/object paths, reference mover z, and the error
decomposition (along-push vs lateral) so the model gap is attributable.

    PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python tools/diag_strong_push.py
"""

from __future__ import annotations

import sys

import numpy as np

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

sys.path.insert(0, '/root/repo')
sys.path.insert(0, '/root/reference')
sys.path.insert(0, '/root/repo/tools')

from calibrate_contact import run_mine, run_reference  # noqa: E402

SCEN = {
    'diagonal': ([0.24, 0.24], [0.34, 0.34], [[2.0, 2.0]] * 10),
    'diag_fast': ([0.22, 0.22], [0.345, 0.345], [[4.0, 4.0]] * 8),
    'diag_asym': ([0.24, 0.26], [0.35, 0.345], [[2.5, 2.0]] * 10),
}


def main():
    for name, (m0, o0, acts) in SCEN.items():
        goal = [0.55, 0.55]
        ref = run_reference(m0, o0, goal, acts, steps=len(acts))
        mine = run_mine(m0, o0, goal, acts, steps=len(acts))
        u = np.asarray(acts[0], float)
        u = u / np.linalg.norm(u)  # push direction
        print(f'\n=== {name}  push dir ({u[0]:.2f},{u[1]:.2f}) ===')
        print(f'{"t":>2} {"ref obj":>16} {"my obj":>16} {"err":>6} {"along":>7} {"lat":>7} '
              f'{"ref mz":>7} {"my mz":>7} {"ref mover":>16} {"my mover":>16}')
        o_prev_r = np.asarray(o0, float)
        o_prev_m = np.asarray(o0, float)
        for t, (r, m) in enumerate(zip(ref, mine)):
            ro = np.array([r['ox'], r['oy']])
            mo = np.array([m['ox'], m['oy']])
            d = mo - ro
            along = d @ u
            lat = d @ np.array([-u[1], u[0]])
            print(f'{t:2d} ({r["ox"]:.4f},{r["oy"]:.4f}) ({m["ox"]:.4f},{m["oy"]:.4f}) '
                  f'{np.linalg.norm(d)*1e3:5.1f} {along*1e3:+6.1f} {lat*1e3:+6.1f} '
                  f'{r["mz"]*1e3:6.1f} {m["mz"]*1e3:6.1f} '
                  f'({r["mx"]:.4f},{r["my"]:.4f}) ({m["mx"]:.4f},{m["my"]:.4f})')
            # per-step object displacement magnitude (ride speed)
            dr = np.linalg.norm(ro - o_prev_r)
            dm = np.linalg.norm(mo - o_prev_m)
            o_prev_r, o_prev_m = ro, mo
            print(f'    obj step disp: ref {dr*1e3:5.1f}mm  mine {dm*1e3:5.1f}mm')


if __name__ == '__main__':
    main()
