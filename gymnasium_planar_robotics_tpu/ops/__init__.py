"""Pure-JAX compute kernels: geometry, rotations, dynamics, collision, contact."""

from gymnasium_planar_robotics_tpu.ops import collision, geometry, grid, rotations, walls  # noqa: F401
