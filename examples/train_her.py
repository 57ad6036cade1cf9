"""Train DDPG+HER on the SPARSE planning task — fully on-device.

The reference's documented recipe is SAC+HerReplayBuffer via
Stable-Baselines3 (`/root/reference/docs/train_agents.rst`); here the whole
pipeline — env rollout, future-strategy hindsight relabeling, critic/actor
updates — is one jitted program per iteration, with relabeled rewards
recomputed from collision flags exactly like the reference's batched
``compute_reward(achieved, desired, info)`` contract.

Usage:
    python examples/train_her.py [--batch 256] [--iters 250] [--relabel 0.8]
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

from gymnasium_planar_robotics_tpu.models import her, planning


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=256)
    ap.add_argument('--iters', type=int, default=250)
    ap.add_argument('--relabel', type=float, default=0.8, help='future-relabel probability (0 disables HER)')
    ap.add_argument('--seed', type=int, default=0)
    args = ap.parse_args()

    config, params = planning.make_planning_env(
        np.ones((3, 3)), 1, std_noise=1e-5, dtype=jnp.float32, a_max=3.0
    )
    assert config.reward_mode == 'sparse'

    cfg = her.HERConfig(
        obs_dim=2, goal_dim=2, action_dim=2, hidden=(64, 64),
        action_scale=3.0, rollout_steps=16, relabel_prob=args.relabel,
        explore_std=0.2, update_steps=8,
    )
    pol = her.init_params(jax.random.PRNGKey(args.seed), cfg)
    train_step, (a_opt, c_opt) = her.make_train_step(
        config, params, cfg, planning.step_autoreset,
        lambda ach, des, mc, wc: planning.compute_reward(config, params, ach, des, mc, wc),
        lambda r: jnp.abs(r) == 50.0,
    )
    state, obs, _ = planning.init_batch(config, params, jax.random.PRNGKey(args.seed + 1), args.batch)
    runner = (
        state, obs, pol,
        a_opt.init(pol['actor']), c_opt.init(pol['critic']),
        jax.random.PRNGKey(args.seed + 2),
    )
    step = jax.jit(train_step)

    t0 = time.time()
    for it in range(args.iters):
        runner, metrics = step(runner)
        if it % 25 == 0 or it == args.iters - 1:
            print(
                f'iter {it:4d}  episode_success={float(metrics["episode_success_rate"]):.3f}  '
                f'critic_loss={float(metrics["critic_loss"]):.4f}  '
                f'{args.batch * cfg.rollout_steps * (it + 1) / (time.time() - t0):,.0f} env-steps/s'
            )


if __name__ == '__main__':
    main()
