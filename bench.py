"""Throughput benchmark: batched env engine on the real TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline config (BASELINE.json): pushing env, 4096 envs, env-steps/s per
chip, compared against the reference's measured single-core CPU rate
(BASELINE.md: ~79 env-steps/s for the pushing env).  One env-step =
num_cycles (40) physics sub-steps of 1 ms, exactly as in the reference.
Run ``python bench.py --suite`` for the full BASELINE.md config table.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

BATCH = 4096
ROLLOUT_T = 64  # env-steps per jitted rollout call
TIMED_CALLS = 5

# reference CPU rates measured on this machine (BASELINE.md)
REF_PUSHING = 79.0
REF_PLANNING_1 = 134.0
REF_PLANNING_4 = 35.0


def _throughput(config, params, step_autoreset_fn, init_batch_fn, action_dim, batch):
    from gymnasium_planar_robotics_tpu.parallel import rollout as rollout_lib

    state, obs, _ = jax.block_until_ready(init_batch_fn(config, params, jax.random.PRNGKey(0), batch))
    policy = rollout_lib.uniform_policy(action_dim, -10.0, 10.0)
    roll = rollout_lib.jit_rollout(config, params, step_autoreset_fn, policy, ROLLOUT_T)
    key = jax.random.PRNGKey(1)
    state, obs, key, _ = jax.block_until_ready(roll(state, obs, key))  # compile
    t0 = time.perf_counter()
    for _ in range(TIMED_CALLS):
        state, obs, key, metrics = roll(state, obs, key)
    jax.block_until_ready(metrics)
    return batch * ROLLOUT_T * TIMED_CALLS / (time.perf_counter() - t0)


def bench_pushing(batch=BATCH):
    from gymnasium_planar_robotics_tpu.models import pushing

    config, params = pushing.make_pushing_env(std_noise=1e-5, dtype=jnp.float32)
    return _throughput(config, params, pushing.step_autoreset, pushing.init_batch, 2, batch)


def bench_planning(batch=BATCH, num_movers=1, layout=None):
    from gymnasium_planar_robotics_tpu.models import planning

    config, params = planning.make_planning_env(
        layout_tiles=np.ones((3, 3)) if layout is None else layout,
        num_movers=num_movers,
        std_noise=1e-5,
        dtype=jnp.float32,
    )
    return _throughput(config, params, planning.step_autoreset, planning.init_batch, num_movers * 2, batch)


def main() -> None:
    if '--suite' in sys.argv:
        rows = [
            ('pushing 4096 envs', bench_pushing(4096), REF_PUSHING),
            ('planning 1-mover 4096 envs', bench_planning(4096, 1), REF_PLANNING_1),
            ('planning 4-mover 256 envs', bench_planning(256, 4, np.ones((4, 4))), REF_PLANNING_4),
        ]
        for name, v, ref in rows:
            print(json.dumps({'metric': f'{name} env-steps/s per chip', 'value': round(v, 1),
                              'unit': 'env-steps/s', 'vs_baseline': round(v / ref, 2)}))
        return

    value = bench_pushing()
    print(
        json.dumps(
            {
                'metric': f'pushing env-steps/s per chip ({BATCH} envs, 40 cycles)',
                'value': round(value, 1),
                'unit': 'env-steps/s',
                'vs_baseline': round(value / REF_PUSHING, 2),
            }
        )
    )


if __name__ == '__main__':
    main()
