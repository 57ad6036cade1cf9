"""Throughput benchmark: batched env engine on the real TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline config (BASELINE.json): pushing env, 4096 envs, env-steps/s per
chip.  Until the pushing family lands, the benchmark reports the planning
family under the same harness and compares against the reference's measured
CPU rate for the matching config (BASELINE.md).  One env-step = num_cycles
(40) physics sub-steps of 1 ms, exactly as in the reference.
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


BATCH = 4096
ROLLOUT_T = 64  # env-steps per jitted rollout call
TIMED_CALLS = 5


def _bench_planning(batch: int):
    from gymnasium_planar_robotics_tpu.models import planning
    from gymnasium_planar_robotics_tpu.parallel import rollout as rollout_lib

    config, params = planning.make_planning_env(
        layout_tiles=np.ones((3, 3)),
        num_movers=1,
        std_noise=1e-5,
        num_cycles=40,
        dtype=jnp.float32,
    )
    state, obs, _ = jax.block_until_ready(
        planning.init_batch(config, params, jax.random.PRNGKey(0), batch)
    )
    policy = rollout_lib.uniform_policy(config.num_movers * 2, -10.0, 10.0)
    roll = rollout_lib.jit_rollout(config, params, planning.step_autoreset, policy, ROLLOUT_T)

    key = jax.random.PRNGKey(1)
    # warmup/compile
    state, obs, key, _ = jax.block_until_ready(roll(state, obs, key))
    t0 = time.perf_counter()
    for _ in range(TIMED_CALLS):
        state, obs, key, metrics = roll(state, obs, key)
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0
    return batch * ROLLOUT_T * TIMED_CALLS / dt


def main() -> None:
    # reference CPU baseline for planning, 1 mover: ~134 env-steps/s (BASELINE.md)
    ref_planning_1mover = 134.0
    value = _bench_planning(BATCH)
    print(
        json.dumps(
            {
                'metric': f'planning env-steps/s per chip ({BATCH} envs, 1 mover, 40 cycles)',
                'value': round(value, 1),
                'unit': 'env-steps/s',
                'vs_baseline': round(value / ref_planning_1mover, 2),
            }
        )
    )


if __name__ == '__main__':
    main()
