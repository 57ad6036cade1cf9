"""Static tile-grid model.

The reference compiles the tile layout into a MuJoCo XML scene and keeps a set
of index lists for special layout structures (full 3x3 neighborhoods, four 2x2
missing-corner patterns — ``/root/reference/gymnasium_planar_robotics/envs/
basic_envs.py:203-221,1292-1339``).  Here the same information is precomputed
host-side with NumPy into a small frozen pytree of dense arrays — no XML, no
index lists — shaped for branch-free batched use under ``jit``/``vmap``:

- ``tile_x/tile_y``: tile-center coordinates on the full grid ``[Tx, Ty]``
  (``get_tile_xy_pos``, basic_envs.py:1292-1310; centers exist for *every*
  grid cell, missing tiles included, exactly like the reference's meshgrid).
- ``layout``: the 0/1 tile layout.
- ``complete3x3``: 1 where the cell is the center of a full 3x3 patch of
  tiles — the wall check's fast path (basic_envs.py:206-207, 528-540).
- ``corner_onehot``/``corner_xy``: a compact static list of "missing diagonal
  corner" sites — tiles whose diagonal neighbor in some direction is missing
  while both adjacent edge neighbors exist — the dense equivalent of the
  reference's four 2x2 corner pattern index lists (basic_envs.py:209-219,
  652-783).  The list length is a static property of the layout, so the wall
  kernel only pays for rectangle tests against corners that actually exist.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TileGrid:
    """Dense static description of the tile table (all leaves are arrays)."""

    layout: jax.Array  # [Tx, Ty] int32, 1 = tile present
    tile_x: jax.Array  # [Tx, Ty] tile center x
    tile_y: jax.Array  # [Tx, Ty] tile center y
    tile_size: jax.Array  # [3] half-extents of a tile (x, y, z)
    complete3x3: jax.Array  # [Tx, Ty] bool: full 3x3 neighborhood of tiles
    # [C, Tx, Ty] bool: one-hot of the tile that triggers corner check c (C may be 0)
    corner_onehot: jax.Array
    # [C, 2] (x, y) center of the missing diagonal tile for corner check c
    corner_xy: jax.Array

    @property
    def num_tiles_x(self) -> int:
        return self.layout.shape[0]

    @property
    def num_tiles_y(self) -> int:
        return self.layout.shape[1]

    @property
    def max_xy(self) -> jax.Array:
        """(x, y) upper corner of the grid bounding box (lower corner is (0, 0))."""
        return jnp.stack(
            [self.tile_x[-1, -1] + self.tile_size[0], self.tile_y[-1, -1] + self.tile_size[1]]
        )

    @property
    def workspace_max_xy(self) -> jax.Array:
        """The reference's workspace bound: max tile center + tile_size/2
        (benchmark_planning_env.py:243-244, 264-266 — note: half of the
        *half*-extent, i.e. 0.66 on a 3x3 table whose bbox ends at 0.72).
        Sampling regions and goal-space highs must use this, not the bbox."""
        return jnp.stack(
            [
                self.tile_x[-1, -1] + self.tile_size[0] / 2,
                self.tile_y[-1, -1] + self.tile_size[1] / 2,
            ]
        )


# order of the four diagonal directions in `corner_missing`
CORNER_DIRS = ((1, -1), (1, 1), (-1, -1), (-1, 1))


def make_tile_grid(layout_tiles: np.ndarray, tile_size: np.ndarray | None = None, dtype=jnp.float64) -> TileGrid:
    """Build the static grid pytree from a 0/1 layout array (host-side, NumPy).

    ``tile_size`` is the half-extent triple; the default matches the reference
    (basic_envs.py:201, 0.24/2 x 0.24/2 x 0.0352/2).
    """
    layout = np.asarray(layout_tiles).astype(np.int32)
    assert layout.ndim == 2, 'layout_tiles must be 2D'
    assert np.isin(layout, (0, 1)).all(), 'layout_tiles must contain only 0 and 1'
    tx, ty = layout.shape
    if tile_size is None:
        tile_size = np.array([0.24 / 2, 0.24 / 2, 0.0352 / 2])
    tile_size = np.asarray(tile_size, dtype=np.float64)

    # tile centers: first center at half a tile width, spacing one tile width
    # (reference get_1D_tile_pos, basic_envs.py:1300-1302)
    xs = (np.arange(tx) * 2.0 + 1.0) * tile_size[0]
    ys = (np.arange(ty) * 2.0 + 1.0) * tile_size[1]
    tile_x, tile_y = np.meshgrid(xs, ys, indexing='ij')

    # padded layout (1 ring of zeros on every side) for neighbor lookups
    pad = np.pad(layout, 1, mode='constant', constant_values=0)

    def nb(dx: int, dy: int) -> np.ndarray:
        """Neighbor-existence map: 1 if tile at (i+dx, j+dy) exists."""
        return pad[1 + dx : 1 + dx + tx, 1 + dy : 1 + dy + ty]

    complete3x3 = layout.astype(bool)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            complete3x3 = complete3x3 & (nb(dx, dy) == 1)

    corner_onehots: list[np.ndarray] = []
    corner_xys: list[tuple[float, float]] = []
    ii, jj = np.meshgrid(np.arange(tx), np.arange(ty), indexing='ij')
    for dx, dy in CORNER_DIRS:
        # pattern: this tile, its x-neighbor (dx) and y-neighbor (dy) exist,
        # the diagonal (dx, dy) does not (reference 2x2 masks, basic_envs.py:209-219),
        # with the diagonal index in bounds as in the reference's mask_idx_*
        # gating (basic_envs.py:575-578, 659, 691, 723, 755)
        in_bounds = (ii + dx >= 0) & (ii + dx < tx) & (jj + dy >= 0) & (jj + dy < ty)
        pattern = (layout == 1) & (nb(dx, 0) == 1) & (nb(0, dy) == 1) & (nb(dx, dy) == 0) & in_bounds
        for i, j in zip(*np.nonzero(pattern)):
            onehot = np.zeros((tx, ty), dtype=bool)
            onehot[i, j] = True
            corner_onehots.append(onehot)
            corner_xys.append((tile_x[i + dx, j + dy], tile_y[i + dx, j + dy]))

    num_corners = len(corner_onehots)
    corner_onehot = (
        np.stack(corner_onehots) if num_corners else np.zeros((0, tx, ty), dtype=bool)
    )
    corner_xy = (
        np.array(corner_xys, dtype=np.float64) if num_corners else np.zeros((0, 2), dtype=np.float64)
    )

    return TileGrid(
        layout=jnp.asarray(layout),
        tile_x=jnp.asarray(tile_x, dtype=dtype),
        tile_y=jnp.asarray(tile_y, dtype=dtype),
        tile_size=jnp.asarray(tile_size, dtype=dtype),
        complete3x3=jnp.asarray(complete3x3),
        corner_onehot=jnp.asarray(corner_onehot),
        corner_xy=jnp.asarray(corner_xy, dtype=dtype),
    )
