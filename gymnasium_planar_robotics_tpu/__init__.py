"""gymnasium_planar_robotics_tpu — a TPU-native planar-robotics environment engine.

A from-scratch JAX/XLA re-design of the capabilities of
``gymnasium-planar-robotics`` (magnetic-levitation planar motor RL
environments): batched, jit-compiled physics and collision kernels stepping
thousands of environments in lockstep on TPU, mesh-sharded across hosts, with
Gymnasium / PettingZoo adapters at the edge.

Architecture (vs. the reference's MuJoCo + Python class stack):

- ``ops/``      pure-jnp kernels (geometry, rotations, dynamics, walls, collision, contact)
- ``models/``   environment families as pure functions: EnvParams + EnvState -> step/reset
- ``parallel/`` device-mesh sharding of env batches, collective metrics
- ``envs/``     Gymnasium single-env, Gymnasium vector, PettingZoo parallel adapters
- ``utils/``    host-side rendering, STL mesh sizing, impedance-control API surface
"""

__version__ = '0.1.0'

from gymnasium_planar_robotics_tpu.envs.registration import register_gymnasium_envs

register_gymnasium_envs()
