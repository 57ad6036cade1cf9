"""Multi-process mesh worker: 2 processes x 4 CPU devices = one 8-device
data mesh spanning 'hosts'. Each process owns its batch shard; the jitted
sharded step runs SPMD; a global metrics reduction crosses processes.

Launched by test_multihost.py; also runnable by hand:
    python tests/multihost/worker.py 0 & python tests/multihost/worker.py 1
"""
import sys

import jax

proc = int(sys.argv[1])
jax.config.update('jax_platforms', 'cpu')
jax.distributed.initialize(
    coordinator_address='127.0.0.1:9911', num_processes=2, process_id=proc,
    local_device_ids=list(range(4)),
)
import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

sys.path.insert(0, '/root/repo')
from gymnasium_planar_robotics_tpu.models import planning
from gymnasium_planar_robotics_tpu.parallel import sharding

assert jax.device_count() == 8 and jax.local_device_count() == 4

config, params = planning.make_planning_env(np.ones((3, 3)), 1, std_noise=1e-5, dtype=jnp.float32)
mesh = sharding.make_mesh()  # global 8-device mesh across both processes
B = int(sys.argv[2]) if len(sys.argv) > 2 else 64

# build the global batch from per-process shards
state, obs, _ = planning.init_batch(config, params, jax.random.PRNGKey(0), B)
sh = NamedSharding(mesh, P('data'))

def to_global(x):
    # every process computed the full batch (same seed); take the local rows
    local = np.asarray(x)
    arrs = []
    for d in jax.local_devices():
        idx = sh.addressable_devices_indices_map((B,) + local.shape[1:])[d]
        arrs.append(jax.device_put(local[idx], d))
    return jax.make_array_from_single_device_arrays((B,) + local.shape[1:], sh, arrs)

gstate = jax.tree_util.tree_map(to_global, state)
actions = to_global(np.zeros((B, 2), np.float32))

step = sharding.sharded_step_fn(config, params, mesh, planning.step, donate=False)

@jax.jit
def step_and_metrics(s, a):
    s2, o, r, t, tr, i = step(s, a)
    return s2, sharding.metrics_summary(r, t, i)

s2, metrics = step_and_metrics(gstate, actions)
val = float(metrics['reward_mean'])  # replicated -> addressable everywhere
assert np.isfinite(val)

# throughput: timed cross-process sharded stepping (the metrics reduction
# inside forces a real inter-host collective every step)
import time

K = 12
s = s2
jax.block_until_ready(s.pos)
t0 = time.perf_counter()
for _ in range(K):
    s, metrics = step_and_metrics(s, actions)
jax.block_until_ready(metrics['reward_mean'])
dt = time.perf_counter() - t0
rate = B * K / dt
print(f'proc {proc}: global reward_mean {val:.4f} over {jax.device_count()} devices OK', flush=True)
print(f'proc {proc}: RATE {rate:.1f} env-steps/s (B={B}, {K} steps, 2-process mesh)', flush=True)
