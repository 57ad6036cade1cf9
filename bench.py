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

# NOTE: do not enable the persistent compilation cache here — loading cached
# executables through the tunneled 'axon' backend fails with INVALID_ARGUMENT
# and wedges the session (every subsequent transfer then fails too)


def _log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


BATCH = 4096
ROLLOUT_T = 512  # env-steps per jitted rollout call


def _fetch(x) -> None:
    """Force completion of the computation producing ``x`` by copying one
    output leaf to the host.  On the tunneled ``axon`` backend this is the
    ONLY reliable synchronization: ``jax.block_until_ready`` returns without
    waiting for device completion (measured round 5: a 512-step 4096-env
    rollout "became ready" in 0.15 ms; its true device time is 8.6 ms)."""
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0]))


def _chained_rate(call, steps_per_call: int, n_lo: int = 2, n_hi: int = 18,
                  reps: int = 3) -> float:
    """True device throughput of ``call`` (round-5 timing methodology).

    ``call()`` must run one jitted rollout whose inputs depend on the
    previous call's outputs (thread the carry through a closure), so a chain
    of calls executes serially on the device, and must return an output of
    that rollout.  The rate is the (n_hi - n_lo)-call SLOPE of wall time vs
    chain length with a single host fetch at the end of each chain: the
    host-side dispatch is asynchronous and a scalar fetch over the tunnel
    pays a ~25 ms round trip, so any single-chain timing mixes a large
    constant into the measurement — the slope cancels it exactly.  Earlier
    rounds timed blocks closed by ``jax.block_until_ready``, which on this
    backend does not wait (see ``_fetch``); those numbers under-reported the
    fast kernels by ~2x (fetch overhead counted as device time).  Median of
    ``reps`` repetitions; repetitions agree to <1% on an idle chip."""
    _fetch(call())  # warmup: compile + cold tunnel paths
    rates = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n_lo):
            r = call()
        _fetch(r)
        d_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(n_hi):
            r = call()
        _fetch(r)
        d_hi = time.perf_counter() - t0
        rates.append((n_hi - n_lo) * steps_per_call / (d_hi - d_lo))
    rates.sort()
    return rates[len(rates) // 2]

# reference CPU rates measured on this machine (BASELINE.md)
REF_PUSHING = 79.0
REF_PLANNING_1 = 134.0
REF_PLANNING_4 = 35.0


def _throughput(config, params, step_autoreset_fn, init_batch_fn, action_dim, batch):
    from gymnasium_planar_robotics_tpu.parallel import rollout as rollout_lib

    _log(f'bench: init {batch} envs on {jax.default_backend()}')
    state, obs, _ = jax.block_until_ready(init_batch_fn(config, params, jax.random.PRNGKey(0), batch))
    policy = rollout_lib.uniform_policy(action_dim, -10.0, 10.0)
    roll = rollout_lib.jit_rollout(config, params, step_autoreset_fn, policy, ROLLOUT_T)
    key = jax.random.PRNGKey(1)
    t_c = time.perf_counter()
    state, obs, key, _ = jax.block_until_ready(roll(state, obs, key))  # compile
    _log(f'bench: rollout compiled in {time.perf_counter() - t_c:.0f}s')
    box = [state, obs, key]

    def call():
        s, o, k, metrics = roll(*box)
        box[:] = [s, o, k]
        return metrics

    return _chained_rate(call, batch * ROLLOUT_T)


def bench_pushing(batch=BATCH, fused=True, n_mesh_devices=None, **env_kwargs):
    from gymnasium_planar_robotics_tpu.models import pushing

    config, params = pushing.make_pushing_env(std_noise=1e-5, dtype=jnp.float32, **env_kwargs)
    if not fused:
        return _throughput(config, params, pushing.step_autoreset, pushing.init_batch, 2, batch)

    state, obs, _ = jax.block_until_ready(pushing.init_batch(config, params, jax.random.PRNGKey(0), batch))
    if n_mesh_devices is None:
        step = pushing.make_fused_step_autoreset(config, params)
    else:
        from gymnasium_planar_robotics_tpu.parallel import sharding

        mesh = sharding.make_mesh(jax.devices()[:n_mesh_devices])
        step = sharding.make_sharded_fused_step(pushing, config, params, mesh)
        state = sharding.shard_batch(state, mesh)

    @jax.jit
    def roll(state, key):
        key, sub = jax.random.split(key)

        def body(carry, k):
            s, = carry
            a = jax.random.uniform(k, (batch, 2), jnp.float32, -10.0, 10.0)
            s, o, r, te, tr, i = step(s, a)
            return (s,), r.mean()

        (s,), rs = jax.lax.scan(body, (state,), jax.random.split(sub, ROLLOUT_T))
        return s, key, rs

    key = jax.random.PRNGKey(1)
    t_c = time.perf_counter()
    state, key, rs = jax.block_until_ready(roll(state, key))
    _log(f'bench: fused pushing compiled in {time.perf_counter() - t_c:.0f}s')
    box = [state, key]

    def call():
        s, k, rs = roll(*box)
        box[:] = [s, k]
        return rs

    return _chained_rate(call, batch * ROLLOUT_T)


def bench_planning(batch=BATCH, num_movers=1, layout=None):
    from gymnasium_planar_robotics_tpu.models import planning

    config, params = planning.make_planning_env(
        layout_tiles=np.ones((3, 3)) if layout is None else layout,
        num_movers=num_movers,
        std_noise=1e-5,
        dtype=jnp.float32,
    )
    return _throughput(config, params, planning.step_autoreset, planning.init_batch, num_movers * 2, batch)


def _scaling_worker(n_devices: int, batch: int) -> float:
    """Measure sharded planning throughput on an n-device CPU mesh (this
    process must be launched with the matching XLA device-count flag)."""
    from gymnasium_planar_robotics_tpu.models import planning
    from gymnasium_planar_robotics_tpu.parallel import rollout as rollout_lib, sharding

    config, params = planning.make_planning_env(np.ones((3, 3)), 1, std_noise=1e-5, dtype=jnp.float32)
    mesh = sharding.make_mesh(jax.devices()[:n_devices])
    state, obs, _ = planning.init_batch(config, params, jax.random.PRNGKey(0), batch)
    state = sharding.shard_batch(state, mesh)
    obs = sharding.shard_batch(obs, mesh)
    policy = rollout_lib.uniform_policy(2, -10.0, 10.0)
    roll = rollout_lib.jit_rollout(config, params, planning.step_autoreset, policy, 16, mesh=mesh)
    key = jax.random.PRNGKey(1)
    state, obs, key, _ = jax.block_until_ready(roll(state, obs, key))
    t0 = time.perf_counter()
    for _ in range(3):
        state, obs, key, metrics = roll(state, obs, key)
    jax.block_until_ready(metrics)
    return batch * 16 * 3 / (time.perf_counter() - t0)


def _run_scaling() -> None:
    """Weak-scaling sweep over a virtual CPU device mesh (multi-host proxy:
    batch per device held constant; efficiency = rate_N / (N * rate_1))."""
    import os
    import subprocess

    per_device = 2048
    # virtual devices share physical cores: past nproc the sweep measures
    # oversubscription, not sharding overhead — judge efficiency at <= nproc
    max_fair = min(8, os.cpu_count() or 8)
    rates = {}
    for n in (1, 2, 4, 8):
        env = dict(os.environ)
        env['XLA_FLAGS'] = f'--xla_force_host_platform_device_count={n}'
        env['GPRT_SCALING_N'] = str(n)
        env['GPRT_SCALING_B'] = str(per_device * n)
        out = subprocess.run(
            [sys.executable, __file__, '--scaling-inner'], env=env, capture_output=True, text=True
        )
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ''
        rates[n] = float(line) if line else float('nan')
        _log(f'scaling: {n} devices -> {rates[n]:.0f} env-steps/s')
    n_eff = max(k for k in rates if k <= max_fair)
    eff = rates[n_eff] / (n_eff * rates[1]) if rates[1] else float('nan')
    print(json.dumps({
        'metric': f'weak-scaling efficiency, {n_eff}-device CPU mesh (2048 envs/device; {max_fair} physical cores)',
        'value': round(eff, 3), 'unit': 'fraction', 'vs_baseline': round(eff / 0.8, 2),
    }))


def bench_planning_fused(batch=BATCH, num_movers=1, layout=None, n_mesh_devices=None, **env_kwargs):
    """Planning with the fused Pallas mega-kernel (whole autoreset step in one
    launch).  ``env_kwargs`` forwards to ``make_planning_env`` so jerk-mode
    (``learn_jerk=True``) and box-shape (``collision_params={'shape': 'box'}``)
    fused configs are benchable too.  With ``n_mesh_devices`` the kernel runs
    under shard_map over a device mesh (on this single-chip machine the
    1-device mesh proves the multi-chip dispatch keeps the fused rate)."""
    from gymnasium_planar_robotics_tpu.models import planning

    config, params = planning.make_planning_env(
        layout_tiles=np.ones((3, 3)) if layout is None else layout,
        num_movers=num_movers, std_noise=1e-5, dtype=jnp.float32, **env_kwargs,
    )
    state, obs, _ = jax.block_until_ready(planning.init_batch(config, params, jax.random.PRNGKey(0), batch))
    if n_mesh_devices is None:
        fused = planning.make_fused_step_autoreset(config, params)
    else:
        from gymnasium_planar_robotics_tpu.parallel import sharding

        mesh = sharding.make_mesh(jax.devices()[:n_mesh_devices])
        fused = sharding.make_sharded_fused_step(planning, config, params, mesh)
        state = sharding.shard_batch(state, mesh)
    a_lim = float(np.asarray(params.j_max if config.learn_jerk else params.a_max))

    @jax.jit
    def roll(state, key):
        key, sub = jax.random.split(key)

        def body(carry, k):
            s, = carry
            a = jax.random.uniform(k, (batch, config.num_movers * 2), jnp.float32, -a_lim, a_lim)
            s, o, r, te, tr, i = fused(s, a)
            return (s,), r.mean()

        (s,), rs = jax.lax.scan(body, (state,), jax.random.split(sub, ROLLOUT_T))
        return s, key, rs

    key = jax.random.PRNGKey(1)
    state, key, rs = jax.block_until_ready(roll(state, key))
    box = [state, key]

    def call():
        s, k, rs = roll(*box)
        box[:] = [s, k]
        return rs

    return _chained_rate(call, batch * ROLLOUT_T)


def bench_planning_rollout(batch=BATCH, num_movers=1, layout=None, **env_kwargs):
    """Plane-form K-step fused rollout (``planning.make_fused_rollout``):
    the env state stays in kernel plane layout across the scan, removing the
    ~30 µs/step of XLA pack/unpack glue the per-step path pays — the
    round-4 fix for the dispatch-bound small-batch regime, and ~1.8x on the
    4096-env headline too (actions precomputed: random/offline policies)."""
    from gymnasium_planar_robotics_tpu.models import planning

    config, params = planning.make_planning_env(
        layout_tiles=np.ones((3, 3)) if layout is None else layout,
        num_movers=num_movers, std_noise=1e-5, dtype=jnp.float32, **env_kwargs,
    )
    state, obs, _ = jax.block_until_ready(planning.init_batch(config, params, jax.random.PRNGKey(0), batch))
    roll_fn = planning.make_fused_rollout(config, params)
    a_lim = float(np.asarray(params.j_max if config.learn_jerk else params.a_max))
    adim = num_movers * 2

    @jax.jit
    def roll(state, key, seed):
        key, sub = jax.random.split(key)
        acts = jax.random.uniform(sub, (ROLLOUT_T, batch, adim), jnp.float32, -a_lim, a_lim)
        s, rew, te, tr = roll_fn(state, acts, seed)
        return s, key, rew.mean()

    key = jax.random.PRNGKey(1)
    state, key, rs = jax.block_until_ready(roll(state, key, 0))
    box = [state, key, 1]

    def call():
        s, k, seed = box
        s, k, rs = roll(s, k, seed)
        box[:] = [s, k, seed + ROLLOUT_T]
        return rs

    return _chained_rate(call, batch * ROLLOUT_T)


def bench_pushing_rollout(batch=BATCH, **env_kwargs):
    """Pushing plane-form K-step fused rollout (``pushing.make_fused_rollout``)
    — the PRIMARY metric family with the per-step XLA glue removed."""
    from gymnasium_planar_robotics_tpu.models import pushing

    config, params = pushing.make_pushing_env(std_noise=1e-5, dtype=jnp.float32, **env_kwargs)
    state, obs, _ = jax.block_until_ready(pushing.init_batch(config, params, jax.random.PRNGKey(0), batch))
    roll_fn = pushing.make_fused_rollout(config, params)
    a_lim = float(np.asarray(params.j_max if config.learn_jerk else params.a_max))

    @jax.jit
    def roll(state, key, seed):
        key, sub = jax.random.split(key)
        acts = jax.random.uniform(sub, (ROLLOUT_T, batch, 2), jnp.float32, -a_lim, a_lim)
        s, rew, te, tr = roll_fn(state, acts, seed)
        return s, key, rew.mean()

    key = jax.random.PRNGKey(1)
    state, key, rs = jax.block_until_ready(roll(state, key, 0))
    box = [state, key, 1]

    def call():
        s, k, seed = box
        s, k, rs = roll(s, k, seed)
        box[:] = [s, k, seed + ROLLOUT_T]
        return rs

    return _chained_rate(call, batch * ROLLOUT_T)


def bench_training_rollout(batch=BATCH, reactive=True, hidden=(256, 256)):
    """TRAINING rollout rate with a REACTIVE policy (round-5 VERDICT #3):
    the policy MLP (the transfer recipe's (256, 256) trunk) is evaluated
    every env step from the env's own observations.

    ``reactive=True``: the plane-form reactive rollout
    (``pushing.make_reactive_rollout`` — state stays in kernel plane layout,
    features assembled from observation planes).  ``reactive=False``: the
    per-step fused path (``make_fused_step_autoreset`` + obs-dict
    featurization per step) — what PPO/HER paid before round 5."""
    from gymnasium_planar_robotics_tpu.models import ppo, pushing

    config, params = pushing.make_pushing_env(std_noise=1e-5, dtype=jnp.float32)
    cfg = ppo.PPOConfig(obs_dim=12, action_dim=2, hidden=hidden, rollout_steps=ROLLOUT_T,
                        action_scale=10.0)
    pol = ppo.init_params(jax.random.PRNGKey(0), cfg)
    state, obs, _ = jax.block_until_ready(pushing.init_batch(config, params, jax.random.PRNGKey(1), batch))

    def policy_step(p, eps_t, obs_pm):
        # plane-major [12, B] -> [2, B] (ppo.apply_pm): zero per-step
        # relayout; exploration noise is pre-drawn for the whole rollout
        # (ppo.make_train_step_reactive does exactly this)
        mu, log_std, value = ppo.apply_pm(p, obs_pm)
        action = jnp.clip(mu + jnp.exp(log_std)[:, None] * eps_t,
                          -cfg.action_scale, cfg.action_scale)
        return action, value  # carry the value like a PPO rollout would

    if reactive:
        roll_fn = pushing.make_reactive_rollout(config, params, policy_step, ROLLOUT_T)

        @jax.jit
        def roll(state, pol, key, seed):
            key, sub = jax.random.split(key)
            eps = jax.random.normal(sub, (ROLLOUT_T, 2, batch), jnp.float32)
            s, traj, last = roll_fn(state, pol, sub, seed, policy_xs=eps)
            return s, key, traj[2].mean()
    else:
        fused = pushing.make_fused_step_autoreset(config, params)

        def _vec(obs):
            mp = obs['observation'][..., :2]
            ag, dg = obs['achieved_goal'], obs['desired_goal']
            return jnp.concatenate([obs['observation'], ag, dg, ag - mp, dg - ag], -1).astype(jnp.float32)

        @jax.jit
        def roll(state, pol, key, seed):
            key, sub = jax.random.split(key)
            vec0 = _vec({'observation': jnp.concatenate([state.pos, state.vel], -1),
                         'achieved_goal': state.obj_pos, 'desired_goal': state.goal})

            def body(carry, k):
                s, vec = carry
                action = ppo.sample_action(pol, vec, k, cfg.action_scale)[0]
                s, obs, rew, te, tr, info = fused(s, action)
                return (s, _vec(obs)), rew.mean()

            (s, _), rs = jax.lax.scan(body, (state, vec0), jax.random.split(sub, ROLLOUT_T))
            return s, key, rs.mean()

    key = jax.random.PRNGKey(2)
    state, key, rs = jax.block_until_ready(roll(state, pol, key, 0))
    box = [state, key, 1]

    def call():
        s, k, seed = box
        s, k, rs = roll(s, pol, k, seed)
        box[:] = [s, k, seed + ROLLOUT_T]
        return rs

    return _chained_rate(call, batch * ROLLOUT_T)


def bench_multiagent(batch=4096, num_agents=4):
    """BASELINE config 4: PettingZoo-style parallel multi-agent, batched.

    Measured round 3: at 4096 envs the per-agent view assembly costs 0.3%
    vs the bare 4-mover kernel (16.07 vs 16.12M under identical conditions);
    the round-2 'adapter overhead' was entirely the smaller 1024-env batch
    (the bare kernel itself runs 2.5x slower there — dispatch-bound)."""
    from gymnasium_planar_robotics_tpu.models import multi_agent, planning

    config, params = planning.make_planning_env(
        layout_tiles=np.ones((4, 4)), num_movers=num_agents, std_noise=1e-5, dtype=jnp.float32
    )
    state, obs, _ = jax.block_until_ready(planning.init_batch(config, params, jax.random.PRNGKey(0), batch))
    inner = multi_agent.make_batched_parallel_step(config, params, jit=False)

    @jax.jit
    def roll(state, key):
        key, sub = jax.random.split(key)
        def body(carry, k):
            s, = carry
            a = jax.random.uniform(k, (batch, num_agents, 2), jnp.float32, -10.0, 10.0)
            s, out = inner(s, a)
            return (s,), out.reward.mean()
        (s,), rs = jax.lax.scan(body, (state,), jax.random.split(sub, ROLLOUT_T))
        return s, key, rs

    key = jax.random.PRNGKey(1)
    state, key, rs = jax.block_until_ready(roll(state, key))  # compile
    box = [state, key]

    def call():
        s, k, rs = roll(*box)
        box[:] = [s, k]
        return rs

    return _chained_rate(call, batch * ROLLOUT_T)


def bench_mixed(batch_each=2048):
    """BASELINE config 5 shape: planning + pushing batches stepped inside ONE
    jitted program (what a mixed-suite learner consumes per iteration)."""
    from gymnasium_planar_robotics_tpu.models import planning, pushing

    pc, pp = planning.make_planning_env(np.ones((3, 3)), 1, std_noise=1e-5, dtype=jnp.float32)
    qc, qp = pushing.make_pushing_env(std_noise=1e-5, dtype=jnp.float32)
    ps, pobs, _ = planning.init_batch(pc, pp, jax.random.PRNGKey(0), batch_each)
    qs, qobs, _ = pushing.init_batch(qc, qp, jax.random.PRNGKey(1), batch_each)
    # both families' fused in-kernel-autoreset kernels inside ONE jitted scan
    p_step = planning.make_fused_step_autoreset(pc, pp)
    q_step = pushing.make_fused_step_autoreset(qc, qp)

    @jax.jit
    def roll(ps, qs, key):
        key, sub = jax.random.split(key)
        def body(carry, k):
            ps, qs = carry
            k1, k2 = jax.random.split(k)
            pa = jax.random.uniform(k1, (batch_each, 2), jnp.float32, -10.0, 10.0)
            qa = jax.random.uniform(k2, (batch_each, 2), jnp.float32, -10.0, 10.0)
            ps, _, pr, *_ = p_step(ps, pa)
            qs, _, qr, *_ = q_step(qs, qa)
            return (ps, qs), pr.mean() + qr.mean()
        (ps, qs), ms = jax.lax.scan(body, (ps, qs), jax.random.split(sub, ROLLOUT_T))
        return ps, qs, key, ms

    key = jax.random.PRNGKey(2)
    ps, qs, key, ms = jax.block_until_ready(roll(ps, qs, key))
    box = [ps, qs, key]

    def call():
        p_, q_, k_, ms = roll(*box)
        box[:] = [p_, q_, k_]
        return ms

    return _chained_rate(call, 2 * batch_each * ROLLOUT_T)


# ---------------------------------------------------------------------------
# roofline (round-5 VERDICT #4): empirical device peaks + analytic op counts
# ---------------------------------------------------------------------------

# Analytic per-ENV-STEP op counts for the headline kernels (one env-step =
# 40 physics cycles + the in-kernel autoreset epilogue).  Derivation in
# docs/performance.md#roofline; these are source-level counts of the kernel
# bodies (ops/pallas_step.py), accurate to ~±25% — good enough to classify
# the bound and size the ceiling, not for third-digit precision.
#   flops = adds/muls/fmas(=2)/compares/selects on f32 planes
#   transc = transcendental-class VPU ops (log, sqrt, sin, cos, exp, div/rsqrt)
#   bytes = HBM traffic per env-step (plane reads+writes; state stays in
#           VMEM within a launch, so traffic = launch I/O)
ROOFLINE_KERNELS = {
    # planning 1-mover plane-form rollout: per cycle ~ Box-Muller x2 (vel +
    # pose noise: 8 transc + 20 flops), clamp chain (~20 flops + 2 sqrt),
    # integrate (8), union-rect wall check (~15) => ~65 flops + 10 transc;
    # x40 cycles + autoreset epilogue (cand_k=16 candidate draws + checks,
    # ~450 flops + 35 transc) + obs noise (2 Box-Muller)
    'planning rollout (1 mover)': dict(flops=3050, transc=445, bytes=(11 + 12) * 4),
    # pushing adds the contact pass (~90 flops + 4 sqrt/div per cycle), the
    # object/floor/yaw updates (~60 flops + 3 div/sqrt) and the mover-z DOF
    # (~12 flops) => ~230 flops + 17 transc per cycle
    'pushing rollout': dict(flops=9650, transc=725, bytes=(21 + 36) * 4),
    # 4-mover: 4x the per-mover integrate/wall work + 6 pair SAT tests
    # (~70 flops each, box: 4-axis SAT) + joint reset sampling
    'planning 4-mover rollout': dict(flops=13100, transc=1700, bytes=(33 + 40) * 4),
}


def _microbench_peaks():
    """Empirical device peaks: VPU f32 FMA rate, transcendental rate, HBM
    streaming bandwidth — measured on the SAME chip/protocol as the kernels,
    so fraction-of-peak is apples-to-apples.  Each timed call runs tens of
    milliseconds of device work (the ~3 ms tunnel dispatch would otherwise
    dominate and the reading jittered 7x between runs), and the reported
    peak is the min-time of 5 individually blocked calls."""
    from jax.experimental import pallas as pl

    interp = jax.default_backend() == 'cpu'
    cheap = 64 if interp else 1  # CPU interpret mode only smoke-tests this
    R, L = 512, 128
    K_F = (1 << 20) // cheap  # FMA chain iterations (~137 Gflop/call on TPU)
    K_T = (1 << 15) // cheap  # Box-Muller-shaped iterations (~6.4 Gop/call)

    def fma_kern(x_ref, o_ref):
        x = x_ref[:]

        def body(i, acc):
            return acc * 1.0000001 + x

        o_ref[:] = jax.lax.fori_loop(0, K_F, body, x)

    def transc_kern(x_ref, o_ref):
        x = x_ref[:]

        def body(i, acc):
            # the kernels' actual transcendental mix (Box-Muller):
            # log + sqrt + cos per iteration, kept in (0, 1)
            u = acc * 0.49 + 0.5
            return jnp.cos(jnp.sqrt(-2.0 * jnp.log(u))) * 0.5 + 0.5

        o_ref[:] = jax.lax.fori_loop(0, K_T, body, x)

    def _interp_param():
        from gymnasium_planar_robotics_tpu.ops.pallas_step import _interpret_param
        return _interpret_param(interp)

    def peak_of(kern, ops_per_call):
        # chained calls (each input perturbed by the previous output) +
        # slope timing, exactly like the kernel benches: the tunnel caches
        # repeated identical executions and does not block on readiness
        f = jax.jit(lambda s: pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((R, L), jnp.float32),
            interpret=_interp_param())(x + s * 1e-12).sum())
        box = [jnp.float32(0.0)]

        def call():
            box[0] = f(box[0])
            return box[0]

        return _chained_rate(call, ops_per_call, n_lo=1, n_hi=6)

    x = jnp.full((R, L), 0.5, jnp.float32)
    vpu = peak_of(fma_kern, R * L * K_F * 2)  # fma = 2 flops
    transc = peak_of(transc_kern, R * L * K_T * 3)  # log+sqrt+cos

    # HBM streaming bandwidth: an array larger than VMEM multiplied K_B
    # times inside one jitted while-loop — every iteration is a full
    # HBM read+write pass (XLA cannot fuse across loop iterations), so one
    # dispatch covers K_B * 2 * |x| bytes of traffic
    n = (64 * 1024 * 1024) // cheap  # 256 MB f32
    K_B = 16

    @jax.jit
    def hbm_fn(y):
        y = jax.lax.fori_loop(0, K_B, lambda i, y: y * 1.0000001, y)
        return y, y[0]

    hbox = [jnp.ones((n,), jnp.float32)]

    def hbm_call():
        hbox[0], s = hbm_fn(hbox[0])
        return s

    bw = _chained_rate(hbm_call, K_B * 2 * n * 4, n_lo=1, n_hi=6)
    return dict(vpu_flops=vpu, transc_ops=transc, hbm_bw=bw)


def _run_roofline() -> None:
    peaks = _microbench_peaks()
    _log(f"roofline: measured peaks — VPU {peaks['vpu_flops'] / 1e12:.2f} Tflop/s f32, "
         f"transcendental {peaks['transc_ops'] / 1e9:.1f} Gop/s, HBM copy {peaks['hbm_bw'] / 1e9:.0f} GB/s")
    rates = {
        'planning rollout (1 mover)': bench_planning_rollout(4096),
        'pushing rollout': bench_pushing_rollout(4096),
        'planning 4-mover rollout': bench_planning_rollout(4096, 4, np.ones((4, 4))),
    }
    for name, rate in rates.items():
        c = ROOFLINE_KERNELS[name]
        ach_flops = rate * c['flops']
        ach_transc = rate * c['transc']
        ach_bw = rate * c['bytes']
        f_vpu = ach_flops / peaks['vpu_flops']
        f_tr = ach_transc / peaks['transc_ops']
        f_bw = ach_bw / peaks['hbm_bw']
        bound = max(('transcendental', f_tr), ('vpu-flops', f_vpu), ('hbm', f_bw), key=lambda kv: kv[1])
        # speed-of-light rate if ONLY the binding resource limited it
        sol = rate / bound[1]
        print(json.dumps({
            'metric': f'roofline {name}',
            'env_steps_per_s': round(rate, 0),
            'frac_vpu_flops': round(f_vpu, 3),
            'frac_transcendental': round(f_tr, 3),
            'frac_hbm': round(f_bw, 4),
            'bound': bound[0],
            'speed_of_light_env_steps_per_s': round(sol, 0),
        }))
    print(json.dumps({'metric': 'roofline peaks',
                      'vpu_f32_tflops': round(peaks['vpu_flops'] / 1e12, 2),
                      'transcendental_gops': round(peaks['transc_ops'] / 1e9, 1),
                      'hbm_copy_gbps': round(peaks['hbm_bw'] / 1e9, 0)}))


def main() -> None:
    import os

    if '--scaling-inner' in sys.argv:
        jax.config.update('jax_platforms', 'cpu')
        n = int(os.environ['GPRT_SCALING_N'])
        b = int(os.environ['GPRT_SCALING_B'])
        print(_scaling_worker(n, b))
        return
    if '--scaling' in sys.argv:
        _run_scaling()
        return
    if '--roofline' in sys.argv:
        _run_roofline()
        return
    if '--suite' in sys.argv:
        rows = [
            ('pushing 4096 envs', bench_pushing(4096), REF_PUSHING),
            ('pushing 4096 envs (plane-form fused rollout)', bench_pushing_rollout(4096), REF_PUSHING),
            ('pushing 4096 envs (fused, shard_map 1-device mesh)',
             bench_pushing(4096, n_mesh_devices=1), REF_PUSHING),
            ('pushing mesh+bumper 4096 envs (pallas fused)',
             bench_pushing(4096, mover_params={'shape': 'mesh', 'mesh': {'bumper_mass': 0.35}}), REF_PUSHING),
            ('planning 1-mover 4096 envs', bench_planning(4096, 1), REF_PLANNING_1),
            ('planning 1-mover 4096 envs (pallas fused)', bench_planning_fused(4096), REF_PLANNING_1),
            ('planning 1-mover 4096 envs (plane-form fused rollout)', bench_planning_rollout(4096), REF_PLANNING_1),
            ('planning 1-mover 256 envs (plane-form fused rollout)', bench_planning_rollout(256), REF_PLANNING_1),
            # round-5 rollout matrix completion (VERDICT #7): jerk + box on
            # the plane-form rollout path
            ('planning jerk-mode 4096 envs (plane-form fused rollout)',
             bench_planning_rollout(4096, learn_jerk=True), REF_PLANNING_1),
            ('planning box-shape 4096 envs (plane-form fused rollout)',
             bench_planning_rollout(4096, collision_params={'shape': 'box', 'size': np.array([0.09, 0.09])}),
             REF_PLANNING_1),
            # round-5 reactive training rollouts (VERDICT #3): policy MLP
            # evaluated every step from the env's own observations
            ('pushing TRAINING rollout 4096 envs (reactive policy, plane-form)',
             bench_training_rollout(4096, reactive=True), REF_PUSHING),
            ('pushing TRAINING rollout 4096 envs (reactive policy, per-step fused)',
             bench_training_rollout(4096, reactive=False), REF_PUSHING),
            ('planning 1-mover 4096 envs (fused, shard_map 1-device mesh)',
             bench_planning_fused(4096, n_mesh_devices=1), REF_PLANNING_1),
            ('planning jerk-mode 4096 envs (pallas fused)', bench_planning_fused(4096, learn_jerk=True), REF_PLANNING_1),
            ('planning box-shape 4096 envs (pallas fused)',
             bench_planning_fused(4096, collision_params={'shape': 'box', 'size': np.array([0.09, 0.09])}), REF_PLANNING_1),
            ('planning 4-mover 256 envs (pallas fused)', bench_planning_fused(256, 4, np.ones((4, 4))), REF_PLANNING_4),
            ('planning 4-mover 4096 envs (pallas fused)', bench_planning_fused(4096, 4, np.ones((4, 4))), REF_PLANNING_4),
            ('planning 4-mover 4096 envs (plane-form fused rollout)',
             bench_planning_rollout(4096, 4, np.ones((4, 4))), REF_PLANNING_4),
            ('planning 4-mover box-shape 4096 envs (pallas fused)',
             bench_planning_fused(4096, 4, np.ones((4, 4)),
                                  collision_params={'shape': 'box', 'size': np.array([0.09, 0.09])}), REF_PLANNING_4),
            ('multi-agent 4x4096 envs', bench_multiagent(4096, 4), REF_PLANNING_4),
            ('mixed planning+pushing 4096 envs', bench_mixed(2048), REF_PUSHING),
        ]
        for name, v, ref in rows:
            print(json.dumps({'metric': f'{name} env-steps/s per chip', 'value': round(v, 1),
                              'unit': 'env-steps/s', 'vs_baseline': round(v / ref, 2)}))
        return

    try:
        # plane-form fused rollout: the fastest correct pushing path (the
        # per-step fused path carries ~30us/step of XLA pack/unpack glue)
        value = bench_pushing_rollout()
        metric = f'pushing env-steps/s per chip ({BATCH} envs, 40 cycles, fused rollout)'
        ref = REF_PUSHING
    except Exception as e:
        _log(f'bench: rollout path failed ({type(e).__name__}: {str(e)[:120]}); falling back to per-step')
        try:
            value = bench_pushing()
            metric = f'pushing env-steps/s per chip ({BATCH} envs, 40 cycles)'
            ref = REF_PUSHING
        except Exception as e2:  # tunnel flakiness: report the planning config instead
            _log(f'bench: pushing path failed ({type(e2).__name__}: {str(e2)[:120]}); falling back to planning')
            value = bench_planning(BATCH)
            metric = f'planning env-steps/s per chip ({BATCH} envs, 1 mover, 40 cycles)'
            ref = REF_PLANNING_1
    print(
        json.dumps(
            {
                'metric': metric,
                'value': round(value, 1),
                'unit': 'env-steps/s',
                'vs_baseline': round(value / ref, 2),
            }
        )
    )


if __name__ == '__main__':
    main()
