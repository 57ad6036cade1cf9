"""Round-5 strong-pushing-policy recipe lab: PPO (dense shaping) on the
batched engine with periodic STRICT evals (sparse reference scoring:
`is_success` on the final step) and failure-mode diagnostics.

    PYTHONPATH="/root/repo:$PYTHONPATH" python tools/train_push_strong.py \
        --iters 12000 --batch 2048 [--recipe baseline]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, '/root/repo')

from gymnasium_planar_robotics_tpu.models import ppo, pushing  # noqa: E402

PUSHING_KW = dict(std_noise=1e-5, num_cycles=40, v_max=2.0, a_max=10.0, j_max=100.0, threshold_pos=0.05)
HORIZON = 50


def _pushing_vec(obs_part, achieved, desired):
    mover_pos = obs_part[..., :2]
    return jnp.concatenate(
        [obs_part, achieved, desired, achieved - mover_pos, desired - achieved], axis=-1
    ).astype(jnp.float32)


def obs_to_vec(obs):
    return _pushing_vec(obs['observation'], obs['achieved_goal'], obs['desired_goal'])


def make_eval(eval_config, eval_params, episodes=1024, seed=100):
    """Strict eval + diagnostics: final-step success, any-step success, wall
    rate, and the final object-goal distance distribution."""
    step = jax.vmap(pushing.step_autoreset, in_axes=(None, None, 0, 0))

    def run(policy_params, policy_fn):
        def body(carry, _):
            state, obs, done_l, succ_f, succ_a, wall, dfin = carry
            a = policy_fn(policy_params, obs_to_vec(obs))
            state, obs, rew, term, trunc, info = step(eval_config, eval_params, state, a)
            done_now = (term | trunc) & ~done_l
            succ_f = succ_f | (done_now & info['is_success'])
            succ_a = succ_a | (~done_l & info['is_success'])
            wall = wall | (done_now & term)  # pushing terminates only on wall
            # final object-goal distance, latched at episode end (from the
            # pre-reset observation)
            fin = info['final_observation']
            d = jnp.linalg.norm(fin['achieved_goal'] - fin['desired_goal'], axis=-1)
            dfin = jnp.where(done_now, d, dfin)
            return (state, obs, done_l | term | trunc, succ_f, succ_a, wall, dfin), None

        @jax.jit
        def go(key):
            state, obs, _ = pushing.init_batch(eval_config, eval_params, key, episodes)
            z = jnp.zeros((episodes,), jnp.bool_)
            carry = (state, obs, z, z, z, z, jnp.full((episodes,), jnp.nan, jnp.float32))
            (state, obs, done_l, succ_f, succ_a, wall, dfin), _ = jax.lax.scan(
                body, carry, None, length=HORIZON)
            return done_l, succ_f, succ_a, wall, dfin

        done, sf, sa, wall, dfin = map(np.asarray, go(jax.random.PRNGKey(seed)))
        assert done.all()
        return dict(
            success=float(sf.mean()), success_any=float(sa.mean()),
            wall_rate=float(wall.mean()),
            dfin_med=float(np.nanmedian(dfin)), dfin_p90=float(np.nanquantile(dfin, 0.9)),
        )

    return run


def train(recipe: str, iters: int, batch: int, seed: int, eval_every: int, log=print):
    r = RECIPES[recipe]
    config, params = pushing.make_pushing_env(dtype=jnp.float32, reward_mode='dense', **PUSHING_KW)
    if r.get('env_tweak'):
        config, params = r['env_tweak'](config, params)
    cfg = ppo.PPOConfig(
        obs_dim=12, action_dim=2, hidden=r.get('hidden', (128, 128)),
        rollout_steps=r.get('rollout_steps', 25),
        action_scale=PUSHING_KW['a_max'], learning_rate=r.get('lr', 3e-4),
        update_epochs=r.get('update_epochs', 4), gamma=r.get('gamma', 0.99),
        entropy_coef=r.get('entropy_coef', 0.0),
    )
    pol = ppo.init_params(jax.random.PRNGKey(seed), cfg)
    train_step, opt = ppo.make_train_step(config, params, cfg, pushing.step_autoreset, obs_to_vec=obs_to_vec)
    state, obs, _ = pushing.init_batch(config, params, jax.random.PRNGKey(seed + 1), batch)
    runner = (state, obs_to_vec(obs), pol, opt.init(pol), jax.random.PRNGKey(seed + 2))
    step = jax.jit(train_step)

    eval_config, eval_params = pushing.make_pushing_env(dtype=jnp.float32, **PUSHING_KW)
    evaluate = make_eval(eval_config, eval_params)
    a_max = PUSHING_KW['a_max']

    @jax.jit
    def det_policy(pol, vec):
        return jnp.clip(ppo.apply(pol, vec)[0], -a_max, a_max)

    t0 = time.time()
    best = None
    for i in range(iters):
        runner, m = step(runner)
        if (i + 1) % eval_every == 0 or i == iters - 1:
            ev = evaluate(runner[2], det_policy)
            log(f'iter {i + 1:6d}  t={time.time() - t0:5.0f}s  shaped_r {float(m["reward_mean"]):7.3f}  '
                f'succ {ev["success"]:.3f}  any {ev["success_any"]:.3f}  wall {ev["wall_rate"]:.3f}  '
                f'dfin_med {ev["dfin_med"]:.3f}  p90 {ev["dfin_p90"]:.3f}')
            if best is None or ev['success'] > best[1]:
                best = (i + 1, ev['success'])
    log(f'best: iter {best[0]} success {best[1]:.3f}')
    return runner[2]


RECIPES = {
    'baseline': {},
    'long': dict(rollout_steps=50, gamma=0.995),
    'entropy': dict(entropy_coef=3e-3),
    'entropy_big': dict(entropy_coef=3e-3, hidden=(256, 256)),
    'big': dict(hidden=(256, 256)),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--recipe', default='baseline', choices=sorted(RECIPES))
    ap.add_argument('--iters', type=int, default=12000)
    ap.add_argument('--batch', type=int, default=2048)
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--eval-every', type=int, default=2000)
    args = ap.parse_args()
    print(json.dumps(vars(args)))
    train(args.recipe, args.iters, args.batch, args.seed, args.eval_every)


if __name__ == '__main__':
    main()
