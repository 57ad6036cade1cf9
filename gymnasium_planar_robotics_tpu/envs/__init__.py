"""Gymnasium / PettingZoo adapters at the edge of the pure-functional core."""

from gymnasium_planar_robotics_tpu.envs.registration import register_gymnasium_envs  # noqa: F401
