"""Closed-loop policy transfer: train in the TPU engine, evaluate in the
reference MuJoCo envs.

The open-loop correctness evidence (fixed-action trajectory matches,
tests/test_planning_env.py / test_pushing_env.py) bounds per-step model
error; this harness proves the claim users actually need: a policy trained
entirely in this engine scores the same in the REFERENCE environment —
against the reference's own reward/termination logic
(/root/reference/gymnasium_planar_robotics/envs/planning/benchmark_planning_env.py:502-534,
/root/reference/gymnasium_planar_robotics/envs/manipulation/benchmark_pushing_env.py:499-527).
For pushing — where contact is tolerance-calibrated, not exact
(CALIBRATION.md) — the in-engine vs in-reference success gap is the direct
measurement of how much the residual contact error matters to RL.

Protocol
--------
- train PPO (dense shaping) on 1-mover planning and DDPG+HER on pushing,
  entirely in the batched engine (models/ppo.py, models/her.py);
- freeze the policy; evaluate DETERMINISTICALLY (no exploration noise):
  * in-engine: one jitted scan over `horizon` autoreset steps, latching each
    env's FIRST episode outcome (every env contributes exactly one episode);
  * in-reference: the plain Gymnasium loop over the reference env built with
    THE SAME kwargs, 50-step TimeLimit like the reference registry
    (reference __init__.py:28,37);
- success: planning = episode terminated at +50 (all goals reached);
  pushing = `info['is_success']` on the episode's final step (the object is
  required to be at the goal when the episode ends, reference
  benchmark_pushing_env.py:457-476), plus an any-step success diagnostic.

Run:
    PYTHONPATH=/root/repo python tools/transfer_eval.py \
        [--families planning pushing] [--episodes 200] [--write-md]

Writes TRANSFER.md (with --write-md) and prints one JSON line per family.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gymnasium_planar_robotics_tpu.models import her, planning, ppo, pushing  # noqa: E402

REFERENCE_PATH = '/root/reference'

# one source of truth for the env physics/task kwargs on BOTH sides
PLANNING_KW = dict(std_noise=1e-5, num_cycles=40, v_max=2.0, a_max=3.0, j_max=100.0, threshold_pos=0.1)
PUSHING_KW = dict(std_noise=1e-5, num_cycles=40, v_max=2.0, a_max=10.0, j_max=100.0, threshold_pos=0.05)
HORIZON = 50  # reference TimeLimit (reference __init__.py:28,37)


def _import_reference():
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import gymnasium_planar_robotics  # noqa: F401


def _obs_vec(obs):
    return jnp.concatenate(
        [obs['observation'], obs['achieved_goal'], obs['desired_goal']], axis=-1
    ).astype(jnp.float32)


# ---------------------------------------------------------------------------
# training (in-engine)
# ---------------------------------------------------------------------------


def train_planning(iters: int = 300, batch: int = 1024, seed: int = 0, log=print):
    """PPO with dense shaping on 1-mover planning; returns (policy_fn, cfg pair).

    The policy is evaluated on the SPARSE reference scoring — dense rewards
    are a training aid only (the reference trains SB3 agents on the sparse
    env, docs/train_agents.rst; shaping does not change the task optimum
    here, it just removes the exploration cliff at CI-scale budgets)."""
    config, params = planning.make_planning_env(
        np.ones((3, 3)), 1, dtype=jnp.float32, reward_mode='dense', **PLANNING_KW
    )
    cfg = ppo.PPOConfig(
        obs_dim=6, action_dim=2, hidden=(64, 64), rollout_steps=16,
        action_scale=PLANNING_KW['a_max'], learning_rate=1e-3, update_epochs=4,
    )
    pol = ppo.init_params(jax.random.PRNGKey(seed), cfg)
    train_step, opt = ppo.make_train_step(config, params, cfg, planning.step_autoreset)
    state, obs, _ = planning.init_batch(config, params, jax.random.PRNGKey(seed + 1), batch)
    runner = (state, _obs_vec(obs), pol, opt.init(pol), jax.random.PRNGKey(seed + 2))
    step = jax.jit(train_step)
    t0 = time.time()
    for i in range(iters):
        runner, m = step(runner)
        if log and (i % 50 == 0 or i == iters - 1):
            log(f'  ppo iter {i:4d}  reward {float(m["reward_mean"]):8.3f}  ({time.time() - t0:.0f}s)')
    pol = runner[2]

    a_max = PLANNING_KW['a_max']

    @jax.jit
    def policy(vec):  # deterministic: mean action, env-clipped
        return jnp.clip(ppo.apply(pol, vec)[0], -a_max, a_max)

    # evaluate on the SPARSE config (the reference scoring) — dense shaping
    # was a training aid only
    eval_config, eval_params = planning.make_planning_env(
        np.ones((3, 3)), 1, dtype=jnp.float32, reward_mode='sparse', **PLANNING_KW
    )
    return policy, (eval_config, eval_params)


def _pushing_vec(obs_part, achieved, desired):
    """Policy-internal featurization for pushing: the plain obs concat plus
    the relative offsets (object - mover, goal - object) the MLP would
    otherwise have to learn as subtractions.  A pure function of the obs
    dict, so it evaluates identically in the reference env.  (A normalized
    variant was probed in round 4 and scored slightly worse.)"""
    mover_pos = obs_part[..., :2]
    return jnp.concatenate(
        [obs_part, achieved, desired, achieved - mover_pos, desired - achieved], axis=-1
    ).astype(jnp.float32)


def train_pushing(iters: int = 12000, batch: int = 256, seed: int = 0, log=print):
    """DDPG+HER with replay on sparse pushing (the reference's own recipe for
    these envs — SB3 HerReplayBuffer, docs/train_agents.rst); returns
    (policy_fn, cfg pair).  Recipe selected by the round-4 probe sweep:
    full-episode rollout windows, 4M-transition replay, action-L2 regularizer
    (without which the DDPG actor diverges into wall-slamming)."""
    config, params = pushing.make_pushing_env(dtype=jnp.float32, **PUSHING_KW)
    cfg = her.HERConfig(
        # network input = _pushing_vec's 12 features (obs_dim counts the
        # non-goal part of the feature vector: 4 obs + 2 relative pairs)
        obs_dim=8, goal_dim=2, action_dim=2, hidden=(128, 128),
        action_scale=PUSHING_KW['a_max'], rollout_steps=HORIZON, relabel_prob=0.8,
        explore_std=0.2, explore_eps=0.3, update_steps=20, gamma=0.95,
        actor_lr=3e-4, replay_size=4_000_000, minibatch=4096, action_l2=1.0,
    )
    pol = her.init_params(jax.random.PRNGKey(seed), cfg)
    train_step, (a_opt, c_opt) = her.make_train_step(
        config, params, cfg, pushing.step_autoreset,
        lambda ach, des, mc, wc: pushing.compute_reward(params, ach, des, wc),
        lambda r: r == -50.0,
        vec_fn=_pushing_vec,
    )
    state, obs, _ = pushing.init_batch(config, params, jax.random.PRNGKey(seed + 1), batch)
    runner = (state, obs, pol, a_opt.init(pol['actor']), c_opt.init(pol['critic']),
              her.init_replay(cfg), jax.random.PRNGKey(seed + 2))
    step = jax.jit(train_step, donate_argnums=0)
    t0 = time.time()
    for i in range(iters):
        runner, m = step(runner)
        if log and (i % 100 == 0 or i == iters - 1):
            log(
                f'  her iter {i:5d}  ep-success {float(m["episode_success_rate"]):.3f}  '
                f'({time.time() - t0:.0f}s)'
            )
    pol = runner[2]
    scale = cfg.action_scale

    @jax.jit
    def policy(vec):  # vec is the plain 8-dim obs concat; featurize inside
        obs_part, ach, des = vec[..., :4], vec[..., 4:6], vec[..., 6:8]
        return her.actor_action(pol['actor'], _pushing_vec(obs_part, ach, des), scale)

    return policy, (config, params)


# ---------------------------------------------------------------------------
# evaluation
# ---------------------------------------------------------------------------


def train_pushing_ppo(iters: int = 30000, batch: int = 2048, seed: int = 0, log=print):
    """PPO with dense shaping on pushing — the round-5 strong recipe
    (~98% strict in-engine success at 30k iters; the round-4 plateau at ~26%
    was premature policy-std collapse, fixed by a small entropy bonus, plus
    a (256, 256) trunk — recipe lab: tools/train_push_strong.py).

    Shaping = object-to-goal distance + approach/retreat term
    (``pushing.reward_mode='dense'``); evaluated on the SPARSE reference
    scoring like the planning trainer — shaping is a training aid only."""
    config, params = pushing.make_pushing_env(dtype=jnp.float32, reward_mode='dense', **PUSHING_KW)
    cfg = ppo.PPOConfig(
        obs_dim=12, action_dim=2, hidden=(256, 256), rollout_steps=25,
        action_scale=PUSHING_KW['a_max'], learning_rate=3e-4, update_epochs=4,
        entropy_coef=3e-3,
    )

    def obs_to_vec(obs):
        return _pushing_vec(obs['observation'], obs['achieved_goal'], obs['desired_goal'])

    pol = ppo.init_params(jax.random.PRNGKey(seed), cfg)
    train_step, opt = ppo.make_train_step(
        config, params, cfg, pushing.step_autoreset, obs_to_vec=obs_to_vec
    )
    state, obs, _ = pushing.init_batch(config, params, jax.random.PRNGKey(seed + 1), batch)
    runner = (state, obs_to_vec(obs), pol, opt.init(pol), jax.random.PRNGKey(seed + 2))
    step = jax.jit(train_step)
    t0 = time.time()
    for i in range(iters):
        runner, m = step(runner)
        if log and (i % 500 == 0 or i == iters - 1):
            log(f'  ppo iter {i:5d}  shaped reward {float(m["reward_mean"]):8.3f}  ({time.time() - t0:.0f}s)')
    pol = runner[2]
    a_max = PUSHING_KW['a_max']

    @jax.jit
    def policy(vec):  # deterministic: mean action, env-clipped
        obs_part, ach, des = vec[..., :4], vec[..., 4:6], vec[..., 6:8]
        return jnp.clip(ppo.apply(pol, _pushing_vec(obs_part, ach, des))[0], -a_max, a_max)

    eval_config, eval_params = pushing.make_pushing_env(dtype=jnp.float32, **PUSHING_KW)
    return policy, (eval_config, eval_params)


def scripted_pursuit_policy():
    """Deterministic scripted pushing policy (no training): accelerate toward
    the stand-off point behind the object, brake near contact — the
    closed-loop probe of tools/calibrate_contact.py as a pure obs-vec
    function.  A contact-heavy policy with zero learner noise, so its
    engine-vs-reference success gap isolates the physics residual."""
    a_max = PUSHING_KW['a_max']

    @jax.jit
    def policy(vec):
        mover, mover_vel = vec[..., :2], vec[..., 2:4]
        obj, goal = vec[..., 4:6], vec[..., 6:8]
        to_goal = goal - obj
        d = jnp.linalg.norm(to_goal, axis=-1, keepdims=True)
        push_dir = to_goal / jnp.maximum(d, 1e-6)
        target = obj - 0.11 * push_dir
        acc = 60.0 * (target - mover) - 12.0 * mover_vel
        n = jnp.linalg.norm(acc, axis=-1, keepdims=True)
        return jnp.where(n <= a_max, acc, a_max * acc / jnp.maximum(n, 1e-9))

    config, params = pushing.make_pushing_env(dtype=jnp.float32, **PUSHING_KW)
    return policy, (config, params)


def eval_in_engine(model, config, params, policy_fn, episodes: int, seed: int = 100):
    """Batched deterministic eval: `episodes` envs, one jitted scan over the
    horizon, each env's FIRST episode outcome latched."""
    step = jax.vmap(model.step_autoreset, in_axes=(None, None, 0, 0))

    def body(carry, _):
        state, obs, done_l, succ_final, succ_any, ret = carry
        a = policy_fn(_obs_vec(obs))
        state, obs, rew, term, trunc, info = step(config, params, state, a)
        done_now = (term | trunc) & ~done_l
        succ_final = succ_final | (done_now & info['is_success'])
        succ_any = succ_any | (~done_l & info['is_success'])
        ret = ret + jnp.where(done_l, 0.0, rew.astype(jnp.float32))
        return (state, obs, done_l | term | trunc, succ_final, succ_any, ret), None

    @jax.jit
    def run(key):
        state, obs, _ = model.init_batch(config, params, key, episodes)
        z = jnp.zeros((episodes,), jnp.bool_)
        carry = (state, obs, z, z, z, jnp.zeros((episodes,), jnp.float32))
        (state, obs, done_l, succ_final, succ_any, ret), _ = jax.lax.scan(
            body, carry, None, length=HORIZON
        )
        return done_l, succ_final, succ_any, ret

    done, succ_final, succ_any, ret = map(np.asarray, run(jax.random.PRNGKey(seed)))
    assert done.all(), 'an episode outlived the horizon'
    return {
        'episodes': episodes,
        'success': float(succ_final.mean()),
        'success_any': float(succ_any.mean()),
        'return_mean': float(ret.mean()),
    }


class _ResetStall(Exception):
    pass


def _reset_with_timeout(env, seed: int, max_trials: int = 2000, log=print):
    """Reference `reset` with a stall guard.  The reference pushing env's
    object-start rejection loop is UNBOUNDED (benchmark_pushing_env.py:394-407)
    and becomes UNSATISFIABLE when the mover start lands near the center of
    the object sampling box (the whole box is then within `min_mo_dist` ~
    0.21 m of the mover while the box half-diagonal is only ~0.19 m) — about
    0.2% of resets hang forever (observed: 66,700+ trials on one seed).  Our
    engine's bounded sampler + stall-retry handles this by construction; for
    the reference we bound the loop by hooking the warning it emits every
    100 trials (gymnasium.logger.warn — signal-based timeouts are unreliable
    here: the TPU tunnel client masks SIGALRM) and move to an alternate
    seed, which is policy-independent and therefore fair."""
    from gymnasium import logger as gym_logger

    orig_warn = gym_logger.warn

    def guarded_warn(msg, *a, **kw):
        if 'No valid configuration found within' in str(msg):
            # the message carries the trial counter: 'within N trails'
            try:
                n = int(str(msg).split('within')[1].split('trails')[0].strip())
            except (IndexError, ValueError):
                n = max_trials
            if n >= max_trials:
                raise _ResetStall
            return  # suppress the per-100-trials spam below the bound
        return orig_warn(msg, *a, **kw)

    gym_logger.warn = guarded_warn
    try:
        for attempt in range(10):
            try:
                return env.reset(seed=seed + attempt * 1_000_003)
            except _ResetStall:
                log(f'  reference reset stalled (unsatisfiable sample, seed {seed + attempt * 1_000_003}); '
                    f'skipping to alternate seed')
    finally:
        gym_logger.warn = orig_warn
    raise RuntimeError('reference reset stalled on 10 consecutive seeds')


def eval_in_reference(family: str, policy_fn, episodes: int, seed: int = 100, log=print):
    """Sequential Gymnasium loop over the REFERENCE MuJoCo env (the scoring
    the policy would face in production)."""
    _import_reference()
    import gymnasium as gym

    if family == 'planning':
        from gymnasium_planar_robotics.envs.planning.benchmark_planning_env import BenchmarkPlanningEnv

        raw = BenchmarkPlanningEnv(
            layout_tiles=np.ones((3, 3)), num_movers=1, show_2D_plot=False,
            render_mode=None, **PLANNING_KW,
        )
    else:
        from gymnasium_planar_robotics.envs.manipulation.benchmark_pushing_env import BenchmarkPushingEnv

        raw = BenchmarkPushingEnv(render_mode=None, **PUSHING_KW)
    env = gym.wrappers.TimeLimit(raw, max_episode_steps=HORIZON)

    succ_final = succ_any = 0
    rets = []
    t0 = time.time()
    for ep in range(episodes):
        obs, info = _reset_with_timeout(env, seed + ep, log=log)
        ret, done, any_s, last_info = 0.0, False, False, {}
        while not done:
            vec = np.concatenate(
                [obs['observation'], obs['achieved_goal'], obs['desired_goal']]
            ).astype(np.float32)
            a = np.asarray(policy_fn(jnp.asarray(vec[None])))[0].astype(np.float64)
            obs, rew, term, trunc, last_info = env.step(a)
            ret += float(rew)
            any_s = any_s or bool(last_info.get('is_success', False))
            done = bool(term) or bool(trunc)
        succ_final += int(bool(last_info.get('is_success', False)))
        succ_any += int(any_s)
        rets.append(ret)
        if log and (ep + 1) % 50 == 0:
            log(f'  reference ep {ep + 1}/{episodes}  success so far {succ_final / (ep + 1):.3f}  ({time.time() - t0:.0f}s)')
    env.close()
    return {
        'episodes': episodes,
        'success': succ_final / episodes,
        'success_any': succ_any / episodes,
        'return_mean': float(np.mean(rets)),
    }


def run_family(family: str, episodes: int, train_iters: int | None, seed: int, log=print):
    if family == 'pushing-scripted':
        log(f'[{family}] scripted pursuit policy (no training)')
        policy, (config, params) = scripted_pursuit_policy()
        model = pushing
    elif family == 'planning':
        log(f'[{family}] training in-engine ...')
        policy, (config, params) = train_planning(iters=train_iters or 300, seed=seed, log=log)
        model = planning
    elif family == 'pushing-ppo':
        log(f'[{family}] training in-engine (PPO, dense shaping) ...')
        policy, (config, params) = train_pushing_ppo(iters=train_iters or 30000, seed=seed, log=log)
        model = pushing
    else:
        log(f'[{family}] training in-engine ...')
        policy, (config, params) = train_pushing(iters=train_iters or 12000, seed=seed, log=log)
        model = pushing
    log(f'[{family}] evaluating in-engine ({max(episodes, 512)} episodes) ...')
    eng = eval_in_engine(model, config, params, policy, max(episodes, 512), seed=seed + 100)
    log(f'[{family}] evaluating in REFERENCE MuJoCo ({episodes} episodes) ...')
    ref = eval_in_reference(
        'pushing' if family.startswith('pushing') else family, policy, episodes, seed=seed + 100, log=log
    )
    result = {
        'family': family,
        'engine': eng,
        'reference': ref,
        'success_gap': eng['success'] - ref['success'],
    }
    log(json.dumps(result))
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--families', nargs='+',
                    default=['planning', 'pushing-ppo', 'pushing', 'pushing-scripted'],
                    choices=['planning', 'pushing-ppo', 'pushing', 'pushing-scripted'])
    ap.add_argument('--episodes', type=int, default=200, help='reference-env episodes')
    ap.add_argument('--train-iters', type=int, default=None)
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--write-md', action='store_true')
    args = ap.parse_args()

    results = [run_family(f, args.episodes, args.train_iters, args.seed) for f in args.families]

    if args.write_md:
        lines = [
            '# TRANSFER — closed-loop policy transfer, engine -> reference',
            '',
            'Policies trained ENTIRELY in the TPU engine (`tools/transfer_eval.py`:',
            'PPO dense-shaped planning, PPO dense-shaped pushing (pushing-ppo),',
            'DDPG+HER sparse pushing, plus an untrained scripted pursuit probe),',
            'then frozen and evaluated deterministically in BOTH engines.',
            'Reference scoring:',
            '`benchmark_planning_env.py:502-534`, `benchmark_pushing_env.py:499-527`,',
            '50-step TimeLimit.  Success: planning = terminated at +50; pushing =',
            "`is_success` on the episode's final step.",
            '',
            f'Recorded: {time.strftime("%Y-%m-%d")} · backend `{jax.default_backend()}` · '
            f'seed {args.seed} · {args.episodes} reference episodes/family',
            '',
            '| family | engine success | reference success | gap | engine return | reference return |',
            '|---|---|---|---|---|---|',
        ]
        for r in results:
            lines.append(
                f'| {r["family"]} | {r["engine"]["success"]:.3f} (n={r["engine"]["episodes"]}) '
                f'| {r["reference"]["success"]:.3f} (n={r["reference"]["episodes"]}) '
                f'| {r["success_gap"]:+.3f} | {r["engine"]["return_mean"]:.1f} '
                f'| {r["reference"]["return_mean"]:.1f} |'
            )
        lines += [
            '',
            'Binomial noise at these sample sizes is ~±3-4 points (1σ); gaps inside',
            'that band mean the engine residual (contact tolerance included) is not',
            'RL-relevant for these tasks.  Reproduce: `PYTHONPATH=/root/repo python',
            f'tools/transfer_eval.py --episodes {args.episodes} --write-md`.',
            '',
        ]
        out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'TRANSFER.md')
        with open(out, 'w') as f:
            f.write('\n'.join(lines))
        print(f'wrote {out}')


if __name__ == '__main__':
    main()
