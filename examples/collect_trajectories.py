"""Collect rollout batches into the native trajectory store.

Usage:
    python examples/collect_trajectories.py --out /tmp/planar_traj --steps 200

Each frame is one batched transition pytree (obs/action/reward/done); the C++
background writer keeps the device loop from ever blocking on disk.
"""

import argparse

import numpy as np

import jax
import jax.numpy as jnp

from gymnasium_planar_robotics_tpu.models import planning
from gymnasium_planar_robotics_tpu.utils import trajstore


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--out', default='/tmp/planar_traj')
    ap.add_argument('--batch', type=int, default=512)
    ap.add_argument('--steps', type=int, default=200)
    args = ap.parse_args()

    config, params = planning.make_planning_env(np.ones((3, 3)), 1, std_noise=1e-5, dtype=jnp.float32)
    state, obs, _ = planning.init_batch(config, params, jax.random.PRNGKey(0), args.batch)
    step = jax.jit(lambda s, a: planning.batched_step_autoreset(config, params, s, a))

    key = jax.random.PRNGKey(1)
    with trajstore.TrajWriter(args.out) as w:
        for t in range(args.steps):
            key, k = jax.random.split(key)
            actions = jax.random.uniform(k, (args.batch, 2), jnp.float32, -10.0, 10.0)
            state, obs, reward, term, trunc, info = step(state, actions)
            w.append_pytree({'obs': obs, 'action': actions, 'reward': reward, 'done': term | trunc})
    # report after close(): the native writer appends on a background thread,
    # so frames_written only reflects every append once the writer has drained
    print(f'wrote {w.frames_written} frames to {args.out} '
          f'({"native" if trajstore.native_available() else "python"} writer)')

    with trajstore.TrajReader(args.out) as r:
        print(f'readable frames: {len(r)}; frame 0 leaves: {len(r.get_arrays(0))}')


if __name__ == '__main__':
    main()
