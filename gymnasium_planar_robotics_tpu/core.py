"""Domain-core facade with the reference's method names.

``BasicPlanarRoboticsEnv`` is the reference's RL-API-free domain layer —
scene/config handling plus the analytic collision system
(``/root/reference/gymnasium_planar_robotics/envs/basic_envs.py:21-1626``).
Users who called its methods directly (custom envs, planners, validity
filters) get the same surface here, backed by the batched JAX kernels:
NumPy in, NumPy out, identical semantics, arbitrarily many qpos at once.
"""

from __future__ import annotations

from typing import Any

import numpy as np

import jax.numpy as jnp

from gymnasium_planar_robotics_tpu.models import common
from gymnasium_planar_robotics_tpu.ops import collision as collision_ops
from gymnasium_planar_robotics_tpu.ops import walls as walls_ops
from gymnasium_planar_robotics_tpu.ops.grid import make_tile_grid


class PlanarRoboticsCore:
    """Tile table + collision configuration, without any RL machinery.

    :param layout_tiles: 0/1 array [num_tiles_x, num_tiles_y]
    :param tile_params: {'size': (3,) half-extents, 'mass': float}
    :param collision_params: {'shape': 'circle'|'box', 'size', 'offset',
        'offset_wall'} — reference defaults apply (basic_envs.py:257-264)
    """

    def __init__(
        self,
        layout_tiles: np.ndarray,
        tile_params: dict[str, Any] | None = None,
        collision_params: dict[str, Any] | None = None,
        dtype=jnp.float64,
    ):
        tile_params = tile_params or {}
        collision_params = collision_params or {}
        self.layout_tiles = np.asarray(layout_tiles).astype(np.int8)
        self.tile_size = np.asarray(tile_params.get('size', np.array([0.24 / 2, 0.24 / 2, 0.0352 / 2])))
        self.tile_mass = tile_params.get('mass', 5.6)
        self.grid = make_tile_grid(self.layout_tiles, self.tile_size, dtype=dtype)
        self.c_shape = collision_params.get('shape', 'circle')
        self.c_size = collision_params.get('size', 0.11)
        self.c_size_offset = float(collision_params.get('offset', 0.0))
        self.c_size_offset_wall = float(collision_params.get('offset_wall', 0.0))
        self._dtype = dtype

    # -- reference-named API ------------------------------------------------

    def get_tile_xy_pos(self) -> tuple[np.ndarray, np.ndarray]:
        """Tile-center coordinate grids (basic_envs.py:1292-1310)."""
        return np.asarray(self.grid.tile_x), np.asarray(self.grid.tile_y)

    def get_tile_indices_mask(self, mask: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Indices of layout windows matching a 0/1 structure pattern
        (basic_envs.py:1312-1340; same anchor convention: the returned index
        is the window's center cell, biased low for even mask sizes).

        Vectorized as one windowed comparison instead of the reference's
        Python double loop."""
        mask = np.asarray(mask)
        assert mask.ndim == 2, 'Unexpected shape of the mask array.'
        assert np.bitwise_or(mask == 0, mask == 1).all(), 'Use a numpy array of only 0 and 1 to specify the mask.'
        mx, my = mask.shape
        lay = self.layout_tiles
        if lay.shape[0] < mx or lay.shape[1] < my:
            return np.array([], dtype=int), np.array([], dtype=int)
        windows = np.lib.stride_tricks.sliding_window_view(lay, (mx, my))
        hits = (windows == mask).all(axis=(2, 3))
        wx, wy = np.nonzero(hits)
        # reference anchor: window start + ceil(m/2) for odd, m/2 - 1 for even
        ax = (mx // 2) if mx % 2 == 1 else (mx // 2 - 1)
        ay = (my // 2) if my % 2 == 1 else (my // 2 - 1)
        return wx + ax, wy + ay

    def get_c_size_arr(self, c_size, num_reps: int) -> np.ndarray:
        """Normalize a collision size to per-mover rows (basic_envs.py:1209-1242)."""
        return np.asarray(common.expand_c_size(c_size, num_reps, self.c_shape, self._dtype))

    def qpos_is_valid(self, qpos: np.ndarray, c_size=None, add_safety_offset: bool = False) -> np.ndarray:
        """1 where the (x, y) pose is wall-collision-free (basic_envs.py:459-788)."""
        qpos = np.asarray(qpos)
        assert qpos.ndim == 2 and qpos.shape[1] == 7, 'qpos must be [num_qpos, 7]'
        n = qpos.shape[0]
        c_size = self.c_size if c_size is None else c_size
        c = common.expand_c_size(c_size, n, self.c_shape, self._dtype)
        c = c + self.c_size_offset_wall + (self.c_size_offset if add_safety_offset else 0.0)
        valid = walls_ops.qpos_is_valid(
            self.grid, jnp.asarray(qpos[:, :2], self._dtype), c,
            quat=jnp.asarray(qpos[:, 3:], self._dtype), collision_shape=self.c_shape,
        )
        return np.asarray(valid).astype(int)

    def check_wall_collision(self, mover_qpos: np.ndarray, c_size=None, add_safety_offset: bool = False) -> np.ndarray:
        """1 where the mover collides with a wall (basic_envs.py:426-457)."""
        return 1 - self.qpos_is_valid(mover_qpos, c_size, add_safety_offset)

    def check_mover_collision(self, mover_qpos: np.ndarray, c_size=None, add_safety_offset: bool = False) -> bool:
        """True if any two movers collide (basic_envs.py:355-424)."""
        mover_qpos = np.asarray(mover_qpos)
        n = mover_qpos.shape[0]
        c_size = self.c_size if c_size is None else c_size
        c = common.expand_c_size(c_size, n, self.c_shape, self._dtype)
        c = c + (self.c_size_offset if add_safety_offset else 0.0)
        hit = collision_ops.check_mover_collision(
            jnp.asarray(mover_qpos[:, :2], self._dtype), c,
            quat=jnp.asarray(mover_qpos[:, 3:], self._dtype), collision_shape=self.c_shape,
        )
        return bool(hit)
