"""BenchmarkPlanningEnv, TPU-native: pure-functional batched motion planning.

Re-design of ``/root/reference/gymnasium_planar_robotics/envs/planning/
benchmark_planning_env.py`` (collision-free multi-mover goal reaching with
jerk- or acceleration-limited actuation).  Instead of the reference's
XML-rebuild-per-reset + 40x(Python callback -> MuJoCo FFI -> collision pass)
step loop (basic_envs.py:1879-1905), the whole environment is three pure
functions over a static config and an array pytree:

    reset(config, params, key)           -> (state, obs, info)
    step(config, params, state, action)  -> (state, obs, reward, term, trunc, info)
    step_autoreset(...)                  -> same, resetting done envs in-place

Everything is single-env shaped; batch with ``jax.vmap`` and shard the batch
axis with ``NamedSharding`` (see ``parallel/``).  The 40-cycle hot loop is a
``lax.scan`` with a latched collision mask replacing the reference's ``break``
(no further integration after a collision, basic_envs.py:1847-1850, 1902-1905).

Correctness bar (validated in tests/test_planning_env.py): bit-identical
float64 trajectories vs. the reference MuJoCo env at ``std_noise=0`` for fixed
action sequences, and the reference's own physics-oracle tests reproduced.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from gymnasium_planar_robotics_tpu.models import common
from gymnasium_planar_robotics_tpu.ops import dynamics
from gymnasium_planar_robotics_tpu.ops.grid import TileGrid, make_tile_grid

REWARD_SUCCESS = 50.0  # benchmark_planning_env.py:220


@dataclasses.dataclass(frozen=True)
class PlanningConfig:
    """Static (hashable) structure of the env — anything that changes shapes
    or trace structure."""

    num_movers: int
    num_cycles: int = 40
    learn_jerk: bool = False
    collision_shape: str = 'circle'  # 'circle' | 'box'
    max_reset_trials: int = 100
    max_episode_steps: int = 50  # TimeLimit applied by step_autoreset / adapters
    # 'sparse' = reference semantics (+50 / -50 / -#unreached); 'dense' is an
    # opt-in shaped variant (-sum of goal distances, same collision penalty)
    # for learners without hindsight relabeling
    reward_mode: str = 'sparse'


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PlanningParams:
    """Array-valued parameters (a pytree; shardable/donatable)."""

    grid: TileGrid
    mover_mass: jax.Array  # [M] configured mover mass == actuator gain
    accel_scale: jax.Array  # [M] gain-mass / total-body-mass (< 1 with bumper geoms)
    mover_size: jax.Array  # [M, 3] half-extents
    c_size: jax.Array  # [M] (circle) or [M, 2] (box)
    c_offset: jax.Array  # scalar: collision_params['offset']
    c_offset_wall: jax.Array  # scalar: collision_params['offset_wall']
    std_noise: jax.Array  # [3] pos/vel/acc sensor noise std
    v_max: jax.Array
    a_max: jax.Array
    j_max: jax.Array
    threshold_pos: jax.Array
    initial_zpos: jax.Array
    dt: jax.Array  # cycle time (MuJoCo timestep), 0.001
    min_xy: jax.Array  # [2] sampling bounds (benchmark_planning_env.py:262-267)
    max_xy: jax.Array
    min_goal_dist: jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PlanningState:
    """Per-env dynamic state (vmap over a leading batch axis)."""

    pos: jax.Array  # [M, 2]
    vel: jax.Array  # [M, 2]
    acc: jax.Array  # [M, 2] last applied acceleration (MuJoCo qacc)
    act: jax.Array  # [M, 2] jerk-integrator activation state
    goals: jax.Array  # [M, 2]
    key: jax.Array  # jax PRNG key
    steps: jax.Array  # int32 env steps taken this episode


def make_planning_env(
    layout_tiles,
    num_movers: int,
    tile_params: dict[str, Any] | None = None,
    mover_params: dict[str, Any] | None = None,
    initial_mover_zpos: float = 0.003,
    std_noise=1e-5,
    num_cycles: int = 40,
    collision_params: dict[str, Any] | None = None,
    v_max: float = 2.0,
    a_max: float = 10.0,
    j_max: float = 100.0,
    learn_jerk: bool = False,
    threshold_pos: float = 0.1,
    dtype=jnp.float32,
    max_reset_trials: int = 100,
    reward_mode: str = 'sparse',
) -> tuple[PlanningConfig, PlanningParams]:
    """Host-side constructor mirroring the reference's kwargs
    (benchmark_planning_env.py:165-291)."""
    tile_params = tile_params or {}
    mover_params = mover_params or {}
    collision_params = collision_params or {}

    tile_size = np.asarray(tile_params.get('size', np.array([0.24 / 2, 0.24 / 2, 0.0352 / 2])))
    grid = make_tile_grid(layout_tiles, tile_size, dtype=dtype)

    mover_mass = np.broadcast_to(np.asarray(mover_params.get('mass', 1.24), dtype=np.float64).reshape(-1), (num_movers,))
    accel_scale = np.ones((num_movers,))
    mover_shape = mover_params.get('shape', 'box')
    if mover_shape == 'mesh':
        # mesh movers: size comes from the (scaled) mesh AABB, exactly like the
        # reference's _resolve_mover_size (basic_envs.py:1396-1437)
        from gymnasium_planar_robotics_tpu.utils import meshes

        mesh_cfg = mover_params.get('mesh', {})
        mover_size = meshes.resolve_mover_size(
            'mesh',
            None,
            mesh_cfg.get('mover_stl_path', 'beckhoff_apm4330_mover'),
            mesh_cfg.get('scale', (1.0, 1.0, 1.0)),
        )
        mover_size = np.broadcast_to(mover_size.reshape(-1, 3), (num_movers, 3))
        # a bumper geom carries its OWN mass on the same body
        # (basic_envs.py:911-925) while the actuator gain stays the
        # configured mover mass (benchmark_planning_env.py:303-321), so the
        # real acceleration is the command scaled by m_gain / m_total
        if mesh_cfg.get('bumper_stl_path', 'beckhoff_apm4330_bumper') is not None:
            bumper_mass = np.broadcast_to(
                np.asarray(mesh_cfg.get('bumper_mass', 0.1), dtype=np.float64).reshape(-1), (num_movers,)
            )
            assert (bumper_mass >= 0).all(), 'Bumper mass must be non-negative.'
            accel_scale = mover_mass / (mover_mass + bumper_mass)
    else:
        assert mover_shape in ('box', 'cylinder'), f'unknown mover shape {mover_shape!r}'
        mover_size = np.asarray(mover_params.get('size', np.array([0.155 / 2, 0.155 / 2, 0.012 / 2])))
        mover_size = np.broadcast_to(mover_size.reshape(-1, 3), (num_movers, 3))

    c_shape = collision_params.get('shape', 'circle')
    c_size_in = collision_params.get('size', 0.11)
    c_offset = float(collision_params.get('offset', 0.0))
    c_offset_wall = float(collision_params.get('offset_wall', 0.0))
    c_size = common.expand_c_size(c_size_in, num_movers, c_shape, dtype)

    std = np.asarray(std_noise, dtype=np.float64).reshape(-1)
    std = np.broadcast_to(std, (3,)) if std.shape == (1,) else std
    assert std.shape == (3,), 'noise standard deviation has to be a float or an array of shape (3,)'

    # construction-time validation (reference basic_envs.py:1469-1626)
    from gymnasium_planar_robotics_tpu.models import validation

    validation.check_tile_config(layout_tiles, tile_size)
    validation.check_mover_config(num_movers, mover_size, mover_mass, initial_mover_zpos)
    validation.check_collision_params(c_shape, np.asarray(c_size), mover_size, mover_shape)

    # sampling bounds: the reference's workspace (max tile center +
    # tile_size/2) shrunk by the full safety margin
    # (benchmark_planning_env.py:262-267; for 'box' the margin is the 2-vector)
    if c_shape == 'circle':
        margin = np.asarray(c_size_in).reshape(-1)[0] + c_offset + c_offset_wall
        margin = np.array([margin, margin])
    else:
        margin = np.asarray(c_size_in).reshape(-1, 2)[0] + c_offset + c_offset_wall
    hi = np.array(
        [
            (2 * layout_tiles.shape[0] - 1) * tile_size[0] + tile_size[0] / 2,
            (2 * layout_tiles.shape[1] - 1) * tile_size[1] + tile_size[1] / 2,
        ]
    )

    config = PlanningConfig(
        num_movers=num_movers,
        num_cycles=num_cycles,
        learn_jerk=learn_jerk,
        collision_shape=c_shape,
        max_reset_trials=max_reset_trials,
        reward_mode=reward_mode,
    )
    params = PlanningParams(
        grid=grid,
        mover_mass=jnp.asarray(mover_mass, dtype),
        accel_scale=jnp.asarray(accel_scale, dtype),
        mover_size=jnp.asarray(mover_size, dtype),
        c_size=c_size,
        c_offset=jnp.asarray(c_offset, dtype),
        c_offset_wall=jnp.asarray(c_offset_wall, dtype),
        std_noise=jnp.asarray(std, dtype),
        v_max=jnp.asarray(v_max, dtype),
        a_max=jnp.asarray(a_max, dtype),
        j_max=jnp.asarray(j_max, dtype),
        threshold_pos=jnp.asarray(threshold_pos, dtype),
        initial_zpos=jnp.asarray(initial_mover_zpos, dtype),
        dt=jnp.asarray(0.001, dtype),
        min_xy=jnp.asarray(margin, dtype),
        max_xy=jnp.asarray(hi - margin, dtype),
        min_goal_dist=common.min_goal_distance(c_size, jnp.asarray(c_offset, dtype), c_shape),
    )
    return config, params


# ---------------------------------------------------------------------------
# collision checks (shared by reset and the cycle loop)
# ---------------------------------------------------------------------------


def _apply_pose_noise(config, pos, noise):
    """(noisy_xy, noisy_quat) from a pre-drawn noise row ([M, 2] or [M, 6])."""
    xy = pos + noise[:, :2]
    if config.collision_shape == 'box':
        quat = jnp.asarray(common.IDENTITY_QUAT, pos.dtype) + noise[:, 2:]
    else:
        quat = None
    return xy, quat


def _pose_noise_dims(config: PlanningConfig) -> int:
    return 6 if config.collision_shape == 'box' else 2


def _collision_checks(
    config: PlanningConfig,
    params: PlanningParams,
    pos: jnp.ndarray,
    wall_noise: jnp.ndarray,
    mover_noise: jnp.ndarray,
    wall_safety_offset: bool,
    mover_safety_offset: bool,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(wall_collision, mover_collision) using pre-drawn sensor noise,
    mirroring the two per-cycle checks at basic_envs.py:1888-1901 (each check
    perturbs the pose independently, as the reference's separate
    get_mover_qpos calls do)."""
    xy_w, quat_w = _apply_pose_noise(config, pos, wall_noise)
    c_wall = params.c_size + params.c_offset_wall + jnp.where(wall_safety_offset, params.c_offset, 0.0)
    wall = common.wall_collision_any(params.grid, xy_w, quat_w, c_wall, config.collision_shape)

    xy_m, quat_m = _apply_pose_noise(config, pos, mover_noise)
    c_mover = params.c_size + jnp.where(mover_safety_offset, params.c_offset, 0.0)
    mover = common.mover_collision_any(xy_m, quat_m, c_mover, config.collision_shape)
    return wall, mover


def _noisy_collision_checks(
    config: PlanningConfig,
    params: PlanningParams,
    key: jax.Array,
    pos: jnp.ndarray,
    wall_safety_offset: bool,
    mover_safety_offset: bool,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    m = config.num_movers
    n = _pose_noise_dims(config)
    noise = jax.random.normal(key, (2, m, n), pos.dtype) * params.std_noise[0]
    return _collision_checks(
        config, params, pos, noise[0], noise[1], wall_safety_offset, mover_safety_offset
    )


# ---------------------------------------------------------------------------
# reset
# ---------------------------------------------------------------------------


def _rejection_sample(key, sample_fn, accept_fn, max_trials: int, block: int = 8):
    """Bounded rejection sampler: first-accepted of ``block`` iid draws per
    round, retrying until accepted or ``max_trials`` draws.

    Returns (sample, accepted, trials).  The reference's unbounded while loops
    (benchmark_planning_env.py:369-413) become a ``lax.while_loop`` with a
    trial bound so resets stay jittable; a stall shows up as trials ==
    max_trials in the info dict instead of a log-warning spin.

    Drawing a block per round matters under ``vmap``: a batched while_loop
    runs until EVERY lane accepts, so the expected round count is the *max*
    of per-lane geometrics — which grows with batch width.  First-accepted-
    of-K has identical distribution to pure rejection sampling and cuts the
    round count ~K-fold (it made 4-mover auto-reset the bottleneck at 1024
    envs before this).  For high-acceptance samplers K > 1 is pure overhead
    (it halved pushing auto-reset throughput) — pass ``block=1`` there.
    """

    def draw(k):
        samples = jax.vmap(sample_fn)(jax.random.split(k, block))
        accepts = jax.vmap(accept_fn)(samples)
        idx = jnp.argmax(accepts)  # first accepted (or 0 if none)
        return jax.tree_util.tree_map(lambda s: s[idx], samples), accepts.any()

    def cond(carry):
        _, _, ok, trials = carry
        return jnp.logical_and(~ok, trials < max_trials)

    def body(carry):
        key, _, _, trials = carry
        key, sub = jax.random.split(key)
        sample, ok = draw(sub)
        return key, sample, ok, trials + block

    key, first = jax.random.split(key)
    init_sample, init_ok = draw(first)
    carry = (key, init_sample, init_ok, jnp.asarray(block, jnp.int32))
    _, sample, ok, trials = jax.lax.while_loop(cond, body, carry)
    return sample, ok, trials


def reset(
    config: PlanningConfig,
    params: PlanningParams,
    key: jax.Array,
    start_xy: jnp.ndarray | None = None,
    goals_xy: jnp.ndarray | None = None,
) -> tuple[PlanningState, dict[str, jnp.ndarray], dict[str, jnp.ndarray]]:
    """Sample collision-free starts and reachable, separated goals; build a
    fresh episode state (reference _reset_callback + base reset,
    benchmark_planning_env.py:355-418, basic_envs.py:1770-1833).

    ``start_xy`` / ``goals_xy`` ([M, 2]) override sampling — the counterpart
    of the reference base class's ``initial_mover_start_xy_pos`` /
    ``initial_mover_goal_xy_pos`` kwargs (basic_envs.py:176-177)."""
    m = config.num_movers
    dtype = params.min_xy.dtype
    key, k_start, k_goal, k_noise, next_key = jax.random.split(key, 5)

    def sample_xy(k):
        return jax.random.uniform(k, (m, 2), dtype, params.min_xy, params.max_xy)

    ident = jnp.tile(jnp.asarray([common.IDENTITY_QUAT], dtype), (m, 1))
    c_wall_sample = params.c_size + params.c_offset_wall + params.c_offset
    c_mover_sample = params.c_size + params.c_offset

    def accept_start(xy):
        from gymnasium_planar_robotics_tpu.ops import walls

        valid = walls.qpos_is_valid(params.grid, xy, c_wall_sample, quat=ident, collision_shape=config.collision_shape).all()
        no_col = ~common.mover_collision_any(xy, ident, c_mover_sample, config.collision_shape)
        return valid & no_col

    def accept_goal(xy):
        from gymnasium_planar_robotics_tpu.ops import walls

        reachable = walls.qpos_is_valid(
            params.grid, xy, c_wall_sample, quat=ident, collision_shape=config.collision_shape
        ).all()
        if m > 1:
            ii, jj = np.triu_indices(m, k=1)
            dist = jnp.linalg.norm(xy[ii] - xy[jj], axis=-1)
            separated = (dist >= params.min_goal_dist).all()
        else:
            separated = jnp.asarray(True)
        return reachable & separated

    # multi-mover acceptance decays with M (pairwise separation + per-mover
    # validity): blocks pay off; single-mover acceptance is near 1: block=1
    block = 8 if m > 1 else 1
    if start_xy is None:
        start_xy, start_ok, start_trials = _rejection_sample(
            k_start, sample_xy, accept_start, config.max_reset_trials, block=block
        )
    else:
        start_xy = jnp.asarray(start_xy, dtype).reshape(m, 2)
        start_ok, start_trials = accept_start(start_xy), jnp.asarray(0, jnp.int32)
    if goals_xy is None:
        goal_xy, goal_ok, goal_trials = _rejection_sample(
            k_goal, sample_xy, accept_goal, config.max_reset_trials, block=block
        )
    else:
        goal_xy = jnp.asarray(goals_xy, dtype).reshape(m, 2)
        goal_ok, goal_trials = accept_goal(goal_xy), jnp.asarray(0, jnp.int32)

    zeros = jnp.zeros((m, 2), dtype)
    state = PlanningState(
        pos=start_xy,
        vel=zeros,
        acc=zeros,
        act=zeros,
        goals=goal_xy,
        key=next_key,
        steps=jnp.asarray(0, jnp.int32),
    )

    # base-class reset re-checks with noise (wall with offset, mover without —
    # basic_envs.py:1799-1805)
    k_checks, k_obs = jax.random.split(k_noise)
    wall, mover = _noisy_collision_checks(config, params, k_checks, start_xy, wall_safety_offset=True, mover_safety_offset=False)
    obs = _get_obs(config, params, state, k_obs)
    info = _get_info(config, params, obs, mover, wall)
    info['reset_stalled'] = ~(start_ok & goal_ok)
    info['reset_trials'] = start_trials + goal_trials
    return state, obs, info


# ---------------------------------------------------------------------------
# step
# ---------------------------------------------------------------------------


def _step_core(
    config: PlanningConfig, params: PlanningParams, state: PlanningState, action: jnp.ndarray
):
    m = config.num_movers
    dtype = state.pos.dtype
    limit = params.j_max if config.learn_jerk else params.a_max
    action = jnp.clip(jnp.asarray(action, dtype).reshape(m, 2), -limit, limit)

    key, k_cycles, k_obs = jax.random.split(state.key, 3)

    # all per-cycle sensor noise drawn in one fused op before the scan (same
    # distributions as per-cycle draws; the stream layout differs, which only
    # matters for cross-engine bit-matching of noisy runs — impossible anyway,
    # SURVEY.md §2.3 D4)
    c = config.num_cycles
    n = _pose_noise_dims(config)
    k_vel, k_checks = jax.random.split(k_cycles)
    vel_noise = jax.random.normal(k_vel, (c, m, 2), dtype) * params.std_noise[1]
    pose_noise = jax.random.normal(k_checks, (c, 2, m, n), dtype) * params.std_noise[0]

    def cycle(carry, noise):
        pos, vel, acc, act, wall, mover, done = carry
        nv, npose = noise
        # noisy velocity reading for the clamp chain (benchmark_planning_env.py:430)
        vel_meas = vel + nv
        scale = params.accel_scale[:, None]  # [M, 1] over the (x, y) pair
        if config.learn_jerk:
            res = dynamics.jerk_cycle(
                pos, vel, act, vel_meas, action, params.v_max, params.a_max, params.dt, accel_scale=scale
            )
        else:
            res = dynamics.acceleration_cycle(
                pos, vel, vel_meas, action, params.v_max, params.dt, accel_scale=scale
            )
        new_wall, new_mover = _collision_checks(
            config, params, res.pos, npose[0], npose[1],
            wall_safety_offset=False, mover_safety_offset=False,
        )
        # latch: once done, state freezes and flags keep their value at the
        # colliding cycle (reference `break`, basic_envs.py:1902-1905)
        pos = jnp.where(done, pos, res.pos)
        vel = jnp.where(done, vel, res.vel)
        acc = jnp.where(done, acc, res.acc)
        act = jnp.where(done, act, res.act)
        wall = jnp.where(done, wall, new_wall)
        mover = jnp.where(done, mover, new_mover)
        done = done | wall | mover
        # per-cycle pose + done emitted for render_every_cycle (reference
        # basic_envs.py:1884-1905 renders the colliding cycle's frame, then
        # breaks); dead-code-eliminated when the caller discards it
        return (pos, vel, acc, act, wall, mover, done), (pos, vel, done)

    init = (
        state.pos,
        state.vel,
        state.acc,
        state.act,
        jnp.asarray(False),
        jnp.asarray(False),
        jnp.asarray(False),
    )
    (pos, vel, acc, act, wall, mover, _), cyc = jax.lax.scan(cycle, init, (vel_noise, pose_noise))

    new_state = PlanningState(
        pos=pos, vel=vel, acc=acc, act=act, goals=state.goals, key=key, steps=state.steps + 1
    )
    obs = _get_obs(config, params, new_state, k_obs)
    info = _get_info(config, params, obs, mover, wall)
    reward = compute_reward(config, params, obs['achieved_goal'], obs['desired_goal'], mover, wall)
    terminated = jnp.abs(reward) == REWARD_SUCCESS  # benchmark_planning_env.py:477-479
    truncated = jnp.asarray(False)  # TimeLimit handled by adapters / autoreset
    return (new_state, obs, reward, terminated, truncated, info), cyc


def step(
    config: PlanningConfig, params: PlanningParams, state: PlanningState, action: jnp.ndarray
) -> tuple[PlanningState, dict[str, jnp.ndarray], jnp.ndarray, jnp.ndarray, jnp.ndarray, dict[str, jnp.ndarray]]:
    """One env step = ``num_cycles`` 1 ms control cycles with per-cycle noisy
    collision checks and a latched early stop (basic_envs.py:1835-1950)."""
    return _step_core(config, params, state, action)[0]


def step_with_cycles(
    config: PlanningConfig, params: PlanningParams, state: PlanningState, action: jnp.ndarray
):
    """``step`` plus the per-cycle ``(pos[C, M, 2], vel[C, M, 2], done[C])``
    trajectory, for the adapters' ``render_every_cycle`` mode (reference
    ``basic_envs.py:1708,1884-1885``); ``done`` lets the replay stop at the
    colliding cycle like the reference's render-then-break."""
    out, cyc = _step_core(config, params, state, action)
    return (*out, cyc)


def _get_obs(
    config: PlanningConfig, params: PlanningParams, state: PlanningState, key: jax.Array
) -> dict[str, jnp.ndarray]:
    """Noisy velocities (+accelerations in jerk mode), noisy positions as the
    achieved goal (benchmark_planning_env.py:536-573)."""
    m = config.num_movers
    dtype = state.pos.dtype
    k_pos, k_vel = jax.random.split(key)
    pos_noisy = state.pos + jax.random.normal(k_pos, (m, 2), dtype) * params.std_noise[0]
    vel_noisy = state.vel + jax.random.normal(k_vel, (m, 2), dtype) * params.std_noise[1]
    if config.learn_jerk:
        observation = jnp.concatenate([vel_noisy, state.acc], axis=0).reshape(-1)
    else:
        observation = vel_noisy.reshape(-1)
    return {
        'observation': observation,
        'achieved_goal': pos_noisy.reshape(-1),
        'desired_goal': state.goals.reshape(-1),
    }


def _get_info(config, params, obs, mover_collision, wall_collision) -> dict[str, jnp.ndarray]:
    dist = _goal_distances(config, obs['achieved_goal'], obs['desired_goal'])
    is_success = (dist <= params.threshold_pos).all() & ~mover_collision & ~wall_collision
    return {
        'is_success': is_success,
        'mover_collision': mover_collision,
        'wall_collision': wall_collision,
    }


def _goal_distances(config: PlanningConfig, achieved: jnp.ndarray, desired: jnp.ndarray) -> jnp.ndarray:
    a = achieved.reshape(*achieved.shape[:-1], config.num_movers, 2)
    d = desired.reshape(*desired.shape[:-1], config.num_movers, 2)
    return jnp.linalg.norm(a - d, axis=-1)


def compute_reward(
    config: PlanningConfig,
    params: PlanningParams,
    achieved_goal: jnp.ndarray,
    desired_goal: jnp.ndarray,
    mover_collision: jnp.ndarray,
    wall_collision: jnp.ndarray,
) -> jnp.ndarray:
    """HER-compatible batched reward (benchmark_planning_env.py:502-534):
    +50 all goals reached, -50 on collision, else -(#unreached).  Pure
    function of (achieved, desired, collision flags) — collision flags ride in
    ``info`` exactly so HER relabeling never re-runs collision checks."""
    dist = _goal_distances(config, achieved_goal, desired_goal)
    num_reached = (dist <= params.threshold_pos).sum(axis=-1)
    collided = mover_collision | wall_collision
    if config.reward_mode == 'dense':
        reward = jnp.where(collided, -REWARD_SUCCESS, -dist.sum(axis=-1))
    else:
        reward = jnp.where(collided, -REWARD_SUCCESS, -(config.num_movers - num_reached).astype(dist.dtype))
    all_reached = num_reached == config.num_movers
    return jnp.where(all_reached & ~collided, REWARD_SUCCESS, reward)


# ---------------------------------------------------------------------------
# fused Pallas step (batched; 1 mover, circle shape)
# ---------------------------------------------------------------------------


def make_fused_step(
    config: PlanningConfig, params: PlanningParams, interpret: bool = False, inject_noise: bool = False
):
    """Batched step with the whole cycle loop in one Pallas launch
    (``ops/pallas_step``); signature matches ``batched_step``:
    ``fused_step(state, action[B, M*2][, noise]) -> (state, obs, reward, term,
    trunc, info)``.  Falls back configs are the caller's job — check
    ``pallas_step.supports(config, params)`` first."""
    from gymnasium_planar_robotics_tpu.ops import pallas_step

    fused = pallas_step.make_fused_planning_cycles(
        config, params, interpret=interpret, inject_noise=inject_noise
    )
    m = config.num_movers
    limit = params.j_max if config.learn_jerk else params.a_max

    def step_fn(state: PlanningState, action: jnp.ndarray, noise=None):
        b = state.pos.shape[0]
        dtype = state.pos.dtype
        action = jnp.clip(jnp.asarray(action, dtype).reshape(b, m, 2), -limit, limit)

        # one key per batched step drives the kernel's hardware PRNG; per-env
        # obs noise still uses the per-env keys
        keys = jax.vmap(lambda k: jax.random.split(k, 3))(state.key)  # [B, 3, 2]
        new_keys = keys[:, 0]
        seed = jax.random.randint(jax.random.fold_in(state.key[0], 7), (), 0, 2**31 - 1)

        pos, vel, acc, act, wall = fused(
            state.pos, state.vel, state.acc, state.act, action[:, 0], seed, noise=noise
        )
        new_state = PlanningState(
            pos=pos.astype(dtype), vel=vel.astype(dtype), acc=acc.astype(dtype),
            act=act.astype(dtype), goals=state.goals, key=new_keys,
            steps=state.steps + 1,
        )
        mover = jnp.zeros((b,), jnp.bool_)
        obs = jax.vmap(partial(_get_obs, config, params))(new_state, keys[:, 1])
        info = jax.vmap(partial(_get_info, config, params))(obs, mover, wall)
        reward = compute_reward(config, params, obs['achieved_goal'], obs['desired_goal'], mover, wall)
        terminated = jnp.abs(reward) == REWARD_SUCCESS
        truncated = jnp.zeros((b,), jnp.bool_)
        return new_state, obs, reward, terminated, truncated, info

    step_fn.noise_planes = fused.noise_planes
    return step_fn


def make_fused_step_autoreset(
    config: PlanningConfig, params: PlanningParams, interpret: bool = False,
    inject_noise: bool = False, cand_k: int = 16,
):
    """Fused Pallas step + episode restart.

    The circle/acceleration/sparse configurations (any M, per-mover radii)
    run the restart (wall-valid start/goal resampling, termination, both
    observations) inside the kernel as well; other supported configs compose
    the fused step with the XLA reset.  A stalled in-kernel sampler (no valid
    candidate) leaves the env un-reset and reports
    ``info['reset_stalled']`` — the retry happens on the next step."""
    from gymnasium_planar_robotics_tpu.ops import pallas_step

    in_kernel_multi = (
        config.num_movers > 1
        and np.asarray(params.v_max).dtype == np.float32
    )
    if in_kernel_multi:
        fused_all = pallas_step.make_fused_planning_multi_autoreset_cycles(
            config, params, interpret=interpret, inject_noise=inject_noise, cand_k=cand_k
        )
        m = config.num_movers
        limit = params.j_max if config.learn_jerk else params.a_max

        scale_vec = np.asarray(params.accel_scale).reshape(-1)
        unit_scale = bool(np.allclose(scale_vec, 1.0))

        def step_fn(state: PlanningState, action: jnp.ndarray, noise=None):
            b = state.pos.shape[0]
            dtype = state.pos.dtype
            action = jnp.clip(jnp.asarray(action, dtype).reshape(b, m, 2), -limit, limit)
            new_keys = jax.vmap(lambda k: jax.random.split(k, 1)[0])(state.key)
            seed = jax.random.randint(jax.random.fold_in(state.key[0], 19), (), 0, 2**31 - 1)

            # kernel planes are control-space: the integrator act state in
            # jerk mode (qacc = accel_scale * act; they coincide without a
            # bumper — ops/dynamics.jerk_cycle), unused on entry in acc mode
            a_in = state.act if config.learn_jerk else state.acc

            def to_qacc(a):
                return a if unit_scale else a * jnp.asarray(scale_vec, a.dtype)[None, :, None]

            (pos, vel, acc, goals, steps), obs_sel, obs_final, wall, mover, unreached, stalled, trials = fused_all(
                state.pos, state.vel, a_in, state.goals, state.steps, action, seed, noise=noise
            )
            act = acc.astype(dtype)
            acc = to_qacc(act)
            new_state = PlanningState(
                pos=pos.astype(dtype), vel=vel.astype(dtype), acc=acc,
                act=act if config.learn_jerk else jnp.zeros_like(act),
                goals=goals.astype(dtype), key=new_keys, steps=steps,
            )
            s_v, s_ag = obs_sel
            f_v, f_ag, f_acc = obs_final
            f_acc = to_qacc(f_acc.astype(dtype))  # pre-reset qacc from act planes
            old_goal = state.goals.reshape(b, m * 2).astype(dtype)

            collided = wall | mover
            all_reached = unreached == 0
            if config.reward_mode == 'dense':
                dist = jnp.linalg.norm(
                    f_ag.astype(dtype) - state.goals.astype(dtype), axis=-1
                ).sum(axis=-1)
                reward = jnp.where(collided, -REWARD_SUCCESS, -dist)
            else:
                reward = jnp.where(collided, -REWARD_SUCCESS, -unreached)
            reward = jnp.where(all_reached & ~collided, REWARD_SUCCESS, reward).astype(dtype)
            terminated = collided | all_reached
            truncated = (state.steps + 1) >= config.max_episode_steps

            def _obs_vec(v_blk, a_blk):
                if config.learn_jerk:
                    return jnp.concatenate([v_blk, a_blk], axis=1).reshape(b, m * 4).astype(dtype)
                return v_blk.reshape(b, m * 2).astype(dtype)

            final_obs = {
                'observation': _obs_vec(f_v, f_acc),
                'achieved_goal': f_ag.reshape(b, m * 2).astype(dtype),
                'desired_goal': old_goal,
            }
            out_obs = {
                'observation': _obs_vec(s_v, new_state.acc),
                'achieved_goal': s_ag.reshape(b, m * 2).astype(dtype),
                'desired_goal': goals.reshape(b, m * 2).astype(dtype),
            }
            info = {
                'is_success': all_reached & ~collided,
                'mover_collision': mover,
                'wall_collision': wall,
                'final_observation': final_obs,
                'reset_stalled': stalled,
                'reset_trials': trials,
            }
            return new_state, out_obs, reward, terminated, truncated, info

        step_fn.noise_planes = fused_all.noise_planes
        return step_fn

    in_kernel = pallas_step.supports(config, params)
    if in_kernel:
        fused_all = pallas_step.make_fused_planning_autoreset_cycles(
            config, params, interpret=interpret, inject_noise=inject_noise, cand_k=cand_k
        )
        limit = params.j_max if config.learn_jerk else params.a_max

        scale1 = float(np.asarray(params.accel_scale).reshape(-1)[0])

        def step_fn(state: PlanningState, action: jnp.ndarray, noise=None):
            b = state.pos.shape[0]
            dtype = state.pos.dtype
            action = jnp.clip(jnp.asarray(action, dtype).reshape(b, 2), -limit, limit)
            new_keys = jax.vmap(lambda k: jax.random.split(k, 1)[0])(state.key)
            seed = jax.random.randint(jax.random.fold_in(state.key[0], 17), (), 0, 2**31 - 1)

            # kernel planes are control-space (integrator act in jerk mode;
            # the body's qacc = accel_scale * act — ops/dynamics.jerk_cycle)
            a_state = state.act[:, 0] if config.learn_jerk else state.acc[:, 0]
            (pos, vel, acc, goals, steps), obs_sel, obs_final, wall, reached, stalled, trials = fused_all(
                state.pos[:, 0], state.vel[:, 0], a_state, state.goals[:, 0],
                state.steps, action, seed, noise=noise,
            )
            as_m = lambda x: x[:, None, :].astype(dtype)
            act_m = as_m(acc)
            acc_m = act_m if scale1 == 1.0 else scale1 * act_m
            new_state = PlanningState(
                pos=as_m(pos), vel=as_m(vel), acc=acc_m,
                act=act_m if config.learn_jerk else act_m * 0,
                goals=as_m(goals), key=new_keys, steps=steps,
            )
            old_goal = state.goals[:, 0].astype(dtype)
            f_v, f_ag, f_acc = (x.astype(dtype) for x in obs_final)
            if scale1 != 1.0:
                f_acc = scale1 * f_acc  # pre-reset qacc from the act plane
            s_v, s_ag = (x.astype(dtype) for x in obs_sel)

            mover = jnp.zeros((b,), jnp.bool_)
            if config.reward_mode == 'dense':
                dist = jnp.linalg.norm(f_ag - old_goal, axis=-1)
                reward = jnp.where(wall, -REWARD_SUCCESS, jnp.where(reached, REWARD_SUCCESS, -dist))
            else:
                reward = jnp.where(wall, -REWARD_SUCCESS, jnp.where(reached, REWARD_SUCCESS, -1.0))
            reward = reward.astype(dtype)
            terminated = wall | reached
            truncated = (state.steps + 1) >= config.max_episode_steps

            def _obs_vec(v_blk, a_blk):
                if config.learn_jerk:
                    return jnp.concatenate([v_blk, a_blk], axis=-1)
                return v_blk

            final_obs = {
                'observation': _obs_vec(f_v, f_acc),
                'achieved_goal': f_ag,
                'desired_goal': old_goal,
            }
            out_obs = {
                'observation': _obs_vec(s_v, acc_m[:, 0]),
                'achieved_goal': s_ag,
                'desired_goal': goals.astype(dtype),
            }
            info = {
                'is_success': reached & ~wall,
                'mover_collision': mover,
                'wall_collision': wall,
                'final_observation': final_obs,
                'reset_stalled': stalled,
                'reset_trials': trials,
            }
            return new_state, out_obs, reward, terminated, truncated, info

        step_fn.noise_planes = fused_all.noise_planes
        return step_fn

    fused = make_fused_step(config, params, interpret=interpret, inject_noise=inject_noise)
    batched_reset = jax.vmap(partial(reset, config, params))

    def step_fn(state: PlanningState, action: jnp.ndarray, noise=None):
        new_state, obs, reward, terminated, _, info = fused(state, action, noise=noise)
        truncated = new_state.steps >= config.max_episode_steps
        done = terminated | truncated

        keys = jax.vmap(jax.random.split)(new_state.key)  # [B, 2, 2]
        reset_state, reset_obs, reset_info = batched_reset(keys[:, 0])
        # a stalled batched reset leaves the env un-reset; done re-fires next
        # step and the sampler retries with a fresh key
        do_reset = done & ~reset_info['reset_stalled']
        kept = jax.vmap(autoreset_select)(do_reset, new_state, reset_state, keys[:, 1])
        out_obs = jax.tree_util.tree_map(
            lambda a, b: jax.vmap(_where_done)(do_reset, b, a), obs, reset_obs
        )
        info = dict(info)
        info['final_observation'] = obs
        info['reset_stalled'] = done & reset_info['reset_stalled']
        info['reset_trials'] = jnp.where(done, reset_info['reset_trials'], 0)
        return kept, out_obs, reward, terminated, truncated, info

    step_fn.noise_planes = fused.noise_planes
    return step_fn


# ---------------------------------------------------------------------------
# auto-reset wrapper (the batch/throughput entry point)
# ---------------------------------------------------------------------------


def step_autoreset(
    config: PlanningConfig, params: PlanningParams, state: PlanningState, action: jnp.ndarray
):
    """Step with in-place episode restart: done (terminated or 50-step
    time limit) envs are replaced by freshly reset episodes.  Returns
    ``(state, obs, reward, terminated, truncated, info)`` where ``obs`` is the
    first observation of the new episode for restarted envs (the pre-restart
    observation is in ``info['final_observation']``)."""
    new_state, obs, reward, terminated, _, info = step(config, params, state, action)
    truncated = new_state.steps >= config.max_episode_steps
    done = terminated | truncated

    reset_key, carry_key = jax.random.split(new_state.key)
    reset_state, reset_obs, reset_info = reset(config, params, reset_key)

    # stalled reset sampling => keep the env un-reset (state + step counter
    # carry over); done re-fires next step and the sampler retries with a
    # fresh key.  The reference instead spins in an unbounded rejection loop,
    # warning every 100 trials (benchmark_planning_env.py:371-375).
    do_reset = done & ~reset_info['reset_stalled']
    kept = autoreset_select(do_reset, new_state, reset_state, carry_key)
    out_obs = jax.tree_util.tree_map(lambda a, b: _where_done(do_reset, b, a), obs, reset_obs)
    info = dict(info)
    info['final_observation'] = obs
    info['reset_stalled'] = done & reset_info['reset_stalled']
    info['reset_trials'] = jnp.where(done, reset_info['reset_trials'], 0)
    return kept, out_obs, reward, terminated, truncated, info


def _where_done(done, if_done, if_not):
    """Broadcast the scalar done flag over an arbitrary-rank leaf."""
    return jnp.where(jnp.reshape(done, (1,) * if_not.ndim) if if_not.ndim else done, if_done, if_not)


def autoreset_select(done, stepped_state, reset_state, carry_key):
    """Replace done envs' state with the freshly reset one (pytree-generic, so
    new state fields cannot silently escape auto-reset), keeping the RNG key
    chain: continuing envs advance to ``carry_key``."""
    kept = jax.tree_util.tree_map(lambda a, b: _where_done(done, b, a), stepped_state, reset_state)
    return dataclasses.replace(kept, key=jnp.where(done, reset_state.key, carry_key))


def _chunked_rollout(raw_rollout, planes0, action_planes, seed, K: int, reward_from):
    """Drive an in-kernel K-step rollout over ``T`` total steps: a
    ``lax.scan`` over ``T // K`` chunks (plus one tail launch for ``T % K``)
    carrying kernel-layout state planes.  ``raw_rollout(K)`` builds the
    chunk invocation (pallas_step.make_fused_*_autoreset_cycles.raw_rollout);
    ``reward_from(wall, reached, trunc)`` maps the per-step signal planes
    ``[T, rows, LANES]`` to (reward, term, trunc).  Shared by the planning
    and pushing rollout wrappers."""
    T = action_planes.shape[0]
    n_chunks, tail = divmod(T, K)
    seed = jnp.asarray(seed, jnp.int32)
    parts = []
    planes = planes0
    if n_chunks:
        run_k = raw_rollout(K)
        main = action_planes[: n_chunks * K].reshape((n_chunks, K) + action_planes.shape[1:])

        def body(carry, x):
            planes, c = carry
            *st, wall, reached, trunc = run_k(planes, (x[:, 0], x[:, 1]), seed + c)
            return (tuple(st), c + 1), (wall, reached, trunc)

        (planes, _), (w, r, tr) = jax.lax.scan(
            body, (planes, jnp.asarray(0, jnp.int32)), main
        )
        parts.append(tuple(a.reshape((n_chunks * K,) + a.shape[2:]) for a in (w, r, tr)))
    if tail:
        x = action_planes[n_chunks * K:]
        *st, w, r, tr = raw_rollout(tail)(planes, (x[:, 0], x[:, 1]), seed + n_chunks)
        planes = tuple(st)
        parts.append((w, r, tr))
    wall, reached, trunc = (
        parts[0] if len(parts) == 1
        else tuple(jnp.concatenate(a) for a in zip(*parts))
    )
    rew, term, trunc = reward_from(wall, reached, trunc)
    return planes, rew, term, trunc


def _pad_rollout_batch(state, actions, b: int):
    """Lane-pad a rollout's state pytree + action tensor (batch on axis 1) to
    the next 128 multiple by replicating the last env; callers slice outputs
    back to ``b`` (round 5: any batch size keeps the plane-form path, like
    ``ops/pallas_step._pad_lanes`` does for the per-step kernels)."""
    b_pad = -(-b // 128) * 128
    if b_pad == b:
        return state, actions, b

    def pad0(x):
        return jnp.concatenate([x, jnp.broadcast_to(x[-1:], (b_pad - b,) + x.shape[1:])], 0)

    state = jax.tree_util.tree_map(pad0, state)
    actions = jnp.concatenate(
        [actions, jnp.broadcast_to(actions[:, -1:], actions.shape[:1] + (b_pad - b,) + actions.shape[2:])], 1
    )
    return state, actions, b_pad


def make_fused_rollout(
    config: PlanningConfig, params: PlanningParams, interpret: bool = False, cand_k: int = 16,
    steps_per_launch: int = 1,
):
    """Plane-form K-step fused rollout for the glue-bound SMALL-BATCH regime
    (round-3 VERDICT #5).

    The per-step fused path pays a fixed ~30 µs of XLA pack/unpack glue per
    step (measured at 256 envs, where the kernel body itself is ~4 µs); this
    rollout keeps the env state in the kernel's plane layout across a
    ``lax.scan`` — ONE pack and ONE unpack per rollout — and feeds the kernel
    a pre-computed action tensor (random/offline policies; for a REACTIVE
    policy at the same rate use ``make_reactive_rollout``, round 5).

    ``steps_per_launch > 1`` additionally runs that many complete autoreset
    env steps inside ONE kernel launch
    (``ops/pallas_step._planning_rollout_kernel`` — a ``fori_loop`` over the
    exact per-step body), scanning over ``T / steps_per_launch`` chunks.
    Measured on v5e (tunnel, bench.py protocol): within noise at 256 envs
    (+5%) and ~13% SLOWER at 4096 envs (the in-kernel dynamic-indexed action
    reads / signal stores cost more than the ~0.3 µs in-graph launch they
    replace — launches inside a jitted scan were never the bottleneck), so
    the default stays 1; the knob exists for hosts where per-launch dispatch
    is a real cost.

    Returns ``rollout(state, actions[T, B, 2], seed) -> (final PlanningState,
    rewards [T, B], terminated [T, B], truncated [T, B])``.  Sparse rewards;
    single-mover in-kernel configs only (``pallas_step.supports``); episode
    restarts run in-kernel exactly as the per-step path.  Randomness comes
    from the on-core hardware PRNG seeded per launch per row-block.
    """
    from gymnasium_planar_robotics_tpu.ops import pallas_step

    assert config.reward_mode == 'sparse', 'fused rollout computes the sparse reward in-plane'
    if config.num_movers > 1:
        assert np.asarray(params.v_max).dtype == np.float32, 'f64 parity mode has no fused kernel'
        return _make_fused_rollout_multi(config, params, interpret=interpret, cand_k=cand_k)
    assert pallas_step.supports(config, params), 'config has no single-mover fused kernel'
    fused = pallas_step.make_fused_planning_autoreset_cycles(
        config, params, interpret=interpret, cand_k=cand_k
    )
    raw = fused.raw_planes
    limit = params.j_max if config.learn_jerk else params.a_max
    scale = float(np.asarray(params.accel_scale).reshape(-1)[0])
    max_steps = float(config.max_episode_steps)

    def rollout(state: PlanningState, actions: jnp.ndarray, seed):
        b0 = state.pos.shape[0]
        actions = jnp.clip(jnp.asarray(actions, jnp.float32).reshape(-1, b0, 2), -limit, limit)
        state, actions, b = _pad_rollout_batch(state, actions, b0)
        rows = b // 128
        dtype = state.pos.dtype

        def plane(x, comp):
            return x.reshape(b, 2)[:, comp].reshape(rows, 128).astype(jnp.float32)

        a_in = state.act if config.learn_jerk else state.acc
        planes0 = tuple(
            [plane(state.pos, 0), plane(state.pos, 1), plane(state.vel, 0), plane(state.vel, 1),
             plane(a_in, 0), plane(a_in, 1), plane(state.goals, 0), plane(state.goals, 1),
             state.steps.astype(jnp.float32).reshape(rows, 128)]
        )
        action_planes = actions.reshape(-1, b, 2).transpose(0, 2, 1).reshape(-1, 2, rows, 128)
        T = action_planes.shape[0]

        def reward_from(wall, reached, trunc):
            # sparse single-mover reward (step_autoreset semantics): -50 on
            # wall, +50 all-reached, else -(#unreached) = -1
            rew = jnp.where(wall > 0.5, -REWARD_SUCCESS,
                            jnp.where(reached > 0.5, REWARD_SUCCESS, -1.0))
            return rew, jnp.maximum(wall, reached), trunc

        if steps_per_launch > 1:
            planes, rew, term, trunc = _chunked_rollout(
                fused.raw_rollout, planes0, action_planes, seed,
                min(steps_per_launch, T), reward_from,
            )
        else:
            def body(carry, x):
                planes, t = carry
                a_t = x  # [2, rows, 128]
                outs = raw(planes, (a_t[0], a_t[1]), seed + t)
                new_planes = tuple(outs[:9])
                trunc_t = jnp.where(planes[8] + 1.0 >= max_steps, 1.0, 0.0)
                return (new_planes, t + 1), reward_from(outs[19], outs[20], trunc_t)

            (planes, _), (rew, term, trunc) = jax.lax.scan(
                body, (planes0, jnp.asarray(0, jnp.int32)), action_planes
            )

        def pair(i):
            return jnp.stack([planes[i].reshape(b), planes[i + 1].reshape(b)], -1).astype(dtype)

        act = pair(4)
        final = PlanningState(
            pos=pair(0)[:, None, :], vel=pair(2)[:, None, :],
            acc=(act * scale)[:, None, :],
            act=act[:, None, :] if config.learn_jerk else jnp.zeros_like(act)[:, None, :],
            goals=pair(6)[:, None, :],
            key=jax.vmap(lambda k: jax.random.split(k, 1)[0])(state.key),
            steps=planes[8].reshape(b).astype(jnp.int32),
        )
        T = rew.shape[0]
        final = jax.tree_util.tree_map(lambda x: x[:b0], final)
        return (final, rew.reshape(T, b)[:, :b0].astype(dtype),
                term.reshape(T, b)[:, :b0] > 0.5, trunc.reshape(T, b)[:, :b0] > 0.5)

    return rollout


def make_reactive_rollout(
    config: PlanningConfig, params: PlanningParams, policy_step, num_steps: int,
    interpret: bool = False, cand_k: int = 16, dense_reward: bool = False,
):
    """Plane-form rollout driven by a REACTIVE policy — the planning
    counterpart of ``pushing.make_reactive_rollout`` (see its docstring for
    the design and the documented RNG/first-obs differences vs the per-step
    path).  Single-mover fused configs only.

    ``policy_step(pol, key, obs_pm [6, B]) -> (action [2, B], aux)`` —
    PLANE-MAJOR on both sides (``ppo.apply_pm``): the features are the
    standard goal-env concat [vel, achieved, desired] stacked batch-last
    (the layout PPO trains on, tools/transfer_eval._obs_vec), assembled
    from the kernel's observation planes with zero per-step relayout.

    Returns ``rollout(state, pol, key, seed) -> (final PlanningState, traj,
    last_obs_vec)``; ``traj = (obs_vec, aux, reward, terminated, truncated,
    final_vec)``.  ``dense_reward=True`` gives the ``reward_mode='dense'``
    shaping (-distance; collision/success at ±50) from the pre-reset planes.
    """
    from gymnasium_planar_robotics_tpu.ops import pallas_step

    assert not config.learn_jerk, 'reactive rollout: acc mode only'
    assert config.num_movers == 1 and pallas_step.supports(config, params)
    fused = pallas_step.make_fused_planning_autoreset_cycles(
        config, params, interpret=interpret, cand_k=cand_k
    )
    raw = fused.raw_planes
    a_max = params.a_max
    thr = float(np.asarray(params.threshold_pos))
    max_steps = float(config.max_episode_steps)

    def features(vx, vy, agx, agy, gx, gy):
        # plane-major [6, B]: layout-free reshapes + an axis-0 concat
        return jnp.stack([c.reshape(-1) for c in (vx, vy, agx, agy, gx, gy)], axis=0)

    def rollout(state: PlanningState, pol, key, seed, policy_xs=None):
        b0 = state.pos.shape[0]
        state, _, b = _pad_rollout_batch(state, jnp.zeros((1, b0, 2), jnp.float32), b0)
        rows = b // 128
        dtype = state.pos.dtype
        seed = jnp.asarray(seed, jnp.int32)

        def plane(x, comp):
            return x.reshape(b, 2)[:, comp].reshape(rows, 128).astype(jnp.float32)

        planes0 = tuple(
            [plane(state.pos, 0), plane(state.pos, 1), plane(state.vel, 0), plane(state.vel, 1),
             plane(state.acc, 0), plane(state.acc, 1), plane(state.goals, 0), plane(state.goals, 1),
             state.steps.astype(jnp.float32).reshape(rows, 128)]
        )
        obs0 = (planes0[2], planes0[3], planes0[0], planes0[1])  # vel, achieved

        def body(carry, x):
            t, x_t = x
            planes, obs_pl = carry
            obs_vec = features(*obs_pl, planes[6], planes[7])
            # policy_xs (e.g. pre-drawn PPO exploration noise) replaces the
            # per-step fold_in+draw — one vectorized draw outside the scan
            # instead of T in-scan threefry calls (~1 us/step on v5e)
            k_t = x_t if policy_xs is not None else jax.random.fold_in(key, t)
            action, aux = policy_step(pol, k_t, obs_vec)
            action = jnp.clip(jnp.asarray(action, jnp.float32), -a_max, a_max)
            a_pl = (action[0].reshape(rows, 128), action[1].reshape(rows, 128))
            outs = raw(planes, a_pl, seed + t)
            new_planes = tuple(outs[:9])
            wall = outs[19]
            reached = outs[20]
            final_vec = features(outs[13], outs[14], outs[15], outs[16], planes[6], planes[7])
            trunc = planes[8] + 1.0 >= max_steps
            term = jnp.maximum(wall, reached) > 0.5
            if dense_reward:
                ddx = outs[15] - planes[6]
                ddy = outs[16] - planes[7]
                dist = jnp.sqrt(ddx * ddx + ddy * ddy)
                rew = jnp.where(wall > 0.5, -REWARD_SUCCESS,
                                jnp.where(reached > 0.5, REWARD_SUCCESS, -dist))
            else:
                rew = jnp.where(wall > 0.5, -REWARD_SUCCESS,
                                jnp.where(reached > 0.5, REWARD_SUCCESS, -1.0))
            new_obs = (outs[9], outs[10], outs[11], outs[12])
            out_t = (obs_vec, aux, rew.reshape(-1), term.reshape(-1), trunc.reshape(-1), final_vec)
            return (new_planes, new_obs), out_t

        ts = jnp.arange(num_steps, dtype=jnp.int32)
        (planes, obs_pl), traj = jax.lax.scan(
            body, (planes0, obs0), (ts, policy_xs if policy_xs is not None else ts)
        )
        last_obs_vec = features(*obs_pl, planes[6], planes[7])[:, :b0].T

        def pair(i):
            return jnp.stack([planes[i].reshape(b), planes[i + 1].reshape(b)], -1).astype(dtype)

        act = pair(4)
        scale = float(np.asarray(params.accel_scale).reshape(-1)[0])
        final = PlanningState(
            pos=pair(0)[:, None, :], vel=pair(2)[:, None, :],
            acc=(act * scale)[:, None, :],
            act=jnp.zeros_like(act)[:, None, :],
            goals=pair(6)[:, None, :],
            key=jax.vmap(lambda k: jax.random.split(k, 1)[0])(state.key),
            steps=planes[8].reshape(b).astype(jnp.int32),
        )
        final = jax.tree_util.tree_map(lambda x: x[:b0], final)
        obs_vec, aux, rew, term, trunc, final_vec = traj
        # one relayout per rollout: features leave the scan plane-major
        # [T, F, B], the PPO update consumes [T, B, F]; aux stays batch-last
        # every traj leaf leaves as [T, B, ...]: per-step aux is batch-LAST
        # (plane-major), so move its trailing batch axis to axis 1 — one
        # relayout per rollout, and a uniform P(None, 'data') sharding spec
        traj = (obs_vec[..., :b0].transpose(0, 2, 1),
                jax.tree_util.tree_map(lambda x: jnp.moveaxis(x[..., :b0], -1, 1), aux),
                rew[:, :b0].astype(dtype), term[:, :b0], trunc[:, :b0],
                final_vec[..., :b0].transpose(0, 2, 1))
        return final, traj, last_obs_vec

    return rollout


def _make_fused_rollout_multi(config, params, interpret: bool = False, cand_k: int = 16):
    """M-mover variant of ``make_fused_rollout`` over the row-blocked
    multi-mover kernel (shared-fate collisions, joint start/goal set
    resampling in-kernel)."""
    from gymnasium_planar_robotics_tpu.ops import pallas_step

    m = config.num_movers
    fused = pallas_step.make_fused_planning_multi_autoreset_cycles(
        config, params, interpret=interpret, cand_k=cand_k
    )
    raw = fused.raw_planes
    limit = params.j_max if config.learn_jerk else params.a_max
    scale_vec = np.asarray(params.accel_scale, np.float64).reshape(-1)
    max_steps = float(config.max_episode_steps)

    def rollout(state: PlanningState, actions: jnp.ndarray, seed):
        b = state.pos.shape[0]
        b0 = b
        actions = jnp.clip(jnp.asarray(actions, jnp.float32).reshape(-1, b0, m, 2), -limit, limit)
        state, actions, b = _pad_rollout_batch(state, actions, b0)
        rows = b // 128
        dtype = state.pos.dtype

        def planes_of(x):  # [B, M, 2] -> interleaved per-mover planes
            flat = x.reshape(b, m, 2)
            return [
                flat[:, i, comp].reshape(rows, 128).astype(jnp.float32)
                for i in range(m)
                for comp in (0, 1)
            ]

        a_in = state.act if config.learn_jerk else state.acc
        planes0 = tuple(
            planes_of(state.pos) + planes_of(state.vel) + planes_of(a_in) + planes_of(state.goals)
            + [state.steps.astype(jnp.float32).reshape(rows, 128)]
        )
        # [T, B, M, 2] -> [T, 2m, rows, 128] (mover-major, component-minor —
        # matching planes_of's interleaving)
        action_planes = actions.transpose(0, 2, 3, 1).reshape(-1, 2 * m, rows, 128)

        def body(carry, a_t):
            planes, t = carry
            outs = raw(planes, tuple(a_t[i] for i in range(2 * m)), seed + t)
            new_planes = tuple(outs[: 8 * m + 1])
            wall = outs[18 * m + 1]
            mover = outs[18 * m + 2]
            unreached = outs[18 * m + 3]
            collided = jnp.maximum(wall, mover) > 0.5
            reward = jnp.where(collided, -REWARD_SUCCESS,
                               jnp.where(unreached == 0.0, REWARD_SUCCESS, -unreached))
            term = collided | (unreached == 0.0)
            trunc = jnp.where(planes[8 * m] + 1.0 >= max_steps, 1.0, 0.0)
            return (new_planes, t + 1), (reward, jnp.where(term, 1.0, 0.0), trunc)

        (planes, _), (rew, term, trunc) = jax.lax.scan(
            body, (planes0, jnp.asarray(0, jnp.int32)), action_planes
        )

        def block(i0):  # 2m planes -> [B, M, 2]
            return jnp.stack(
                [jnp.stack([planes[i0 + 2 * i].reshape(b), planes[i0 + 2 * i + 1].reshape(b)], -1)
                 for i in range(m)], axis=1
            ).astype(dtype)

        act = block(4 * m)
        acc = act * jnp.asarray(scale_vec, dtype)[None, :, None]
        final = PlanningState(
            pos=block(0), vel=block(2 * m), acc=acc,
            act=act if config.learn_jerk else jnp.zeros_like(act),
            goals=block(6 * m),
            key=jax.vmap(lambda k: jax.random.split(k, 1)[0])(state.key),
            steps=planes[8 * m].reshape(b).astype(jnp.int32),
        )
        T = rew.shape[0]
        final = jax.tree_util.tree_map(lambda x: x[:b0], final)
        return (final, rew.reshape(T, b)[:, :b0].astype(dtype),
                term.reshape(T, b)[:, :b0] > 0.5, trunc.reshape(T, b)[:, :b0] > 0.5)

    return rollout


@partial(jax.jit, static_argnums=(0, 3))
def init_batch(config: PlanningConfig, params: PlanningParams, key: jax.Array, batch: int):
    """Vectorized reset for a batch of envs: returns batched state/obs/info.

    Jitted with static (config, batch): the vmapped bounded rejection sampler
    dispatched eagerly costs ~20 s of op-by-op batched while_loops on CPU vs
    a one-time ~5 s compile here (instant on repeat shapes)."""
    keys = jax.random.split(key, batch)
    return jax.vmap(partial(reset, config, params))(keys)


batched_step = jax.vmap(step, in_axes=(None, None, 0, 0))
batched_step_autoreset = jax.vmap(step_autoreset, in_axes=(None, None, 0, 0))
