"""Mover-mover collision kernel.

Batched re-design of the reference's ``check_mover_collision``
(``/root/reference/gymnasium_planar_robotics/envs/basic_envs.py:355-424``).
The reference expands all M(M-1)/2 pairs with a Python loop and, for box
shapes, runs the exact rotated-rectangle test only behind a conservative
center-distance prefilter.  Here the pair expansion is a pair of static gather
indices and the exact test runs for every pair unconditionally — the
prefilter is strictly conservative (max center distance for two rects with
half-extents <= s is 2*sqrt(2)*s < 4*s = the prefilter bound), so results are
identical and the kernel stays branch-free.

Note on the circle test: the reference compares the [P] pair distances with a
[P, 1] radius-sum column, which NumPy broadcasts to [P, P] before ``.any()``
(basic_envs.py:408-409) — with per-mover radii this couples unrelated pairs.
We implement the per-pair comparison (``dist_p <= r_i(p) + r_j(p)``), which is
what the reference computes whenever all movers share one radius (the default
and every shipped configuration).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from gymnasium_planar_robotics_tpu.ops import geometry


def pair_indices(num_movers: int) -> tuple[np.ndarray, np.ndarray]:
    """Static upper-triangle (i, j) index arrays for all mover pairs."""
    return np.triu_indices(num_movers, k=1)


def check_mover_collision(
    xy: jnp.ndarray,
    c_size: jnp.ndarray,
    quat: jnp.ndarray | None = None,
    collision_shape: str = 'circle',
) -> jnp.ndarray:
    """Whether any two movers collide.

    :param xy: [M, 2] mover positions
    :param c_size: collision sizes *including* any safety offset ([M] radii
        for 'circle', [M, 2] half-extents for 'box'; the reference adds
        ``offset`` before calling, basic_envs.py:390)
    :param quat: [M, 4] orientations (required for 'box')
    :return: scalar bool — True if at least one pair collides
    """
    xy = jnp.asarray(xy)
    m = xy.shape[0]
    if m < 2:
        return jnp.asarray(False)
    ii, jj = pair_indices(m)

    if collision_shape == 'circle':
        r = jnp.asarray(c_size).reshape(m)
        dist = jnp.linalg.norm(xy[ii] - xy[jj], axis=-1)
        return (dist <= r[ii] + r[jj]).any()
    elif collision_shape == 'box':
        assert quat is not None, "collision_shape 'box' requires quaternions"
        c = jnp.asarray(c_size).reshape(m, 2)
        qpos7 = jnp.concatenate([xy, jnp.zeros((m, 1), xy.dtype), quat], axis=-1)
        hits = geometry.check_rectangles_intersect(qpos7[ii], qpos7[jj], c[ii], c[jj])
        return hits.any()
    raise ValueError(f'unknown collision shape: {collision_shape!r}')
