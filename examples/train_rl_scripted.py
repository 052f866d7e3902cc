#!/usr/bin/env python
"""DD-PPO learning demo: the real policy/update stack on the scripted world.

Trains the actual PointNavResNet actor-critic (ResNet18 + LSTM) with the
jitted PPO update on GPS-goal episodes (no VO — isolates the RL machinery)
and prints the reward/success trend.  The task is easy by construction
(greedy goal-following solves it), so a learning curve that climbs toward
solved is a correctness signal for rollout collection, GAE, the clipped
update, and the recurrent policy — end to end on the TPU.

Usage: python examples/train_rl_scripted.py [--updates 150] [--envs 8]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pointnav_vo_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np  # noqa: E402

import jax  # noqa: E402

from pointnav_vo_tpu.models.policy import PointNavActorCritic  # noqa: E402
from pointnav_vo_tpu.rl.envs import EnvConfig, make_scripted_vector_env  # noqa: E402
from pointnav_vo_tpu.rl.ppo import PPOConfig  # noqa: E402
from pointnav_vo_tpu.rl.trainer import DDPPOTrainer  # noqa: E402


class DepthGoalEnvs:
    """Expose only what the policy consumes."""

    def __init__(self, inner):
        self.inner = inner
        self.num_envs = inner.num_envs

    def reset(self):
        return self._f(self.inner.reset())

    def step(self, a):
        o, r, d, i = self.inner.step(a)
        return self._f(o), r, d, i

    @staticmethod
    def _f(o):
        return {k: o[k] for k in ("depth", "pointgoal_with_gps_compass")}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--updates", type=int, default=150)
    ap.add_argument("--envs", type=int, default=8)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--steps", type=int, default=64)
    args = ap.parse_args()

    env_cfg = EnvConfig(
        image_h=args.size, image_w=args.size, max_episode_steps=60,
        actuation_noise_multiplier=0.0, rgb_noise_intensity=0.0,
        depth_noise_multiplier=0.0, room_radius_range=(3.0, 5.0),
    )
    envs = DepthGoalEnvs(make_scripted_vector_env(env_cfg, args.envs, seed=0))
    import jax.numpy as jnp

    policy = PointNavActorCritic(image_size=(args.size, args.size),
                                 dtype=jnp.bfloat16)
    cfg = PPOConfig(num_steps=args.steps, num_mini_batch=2, ppo_epoch=2,
                    lr=2.5e-4, entropy_coef=0.01, use_normalized_advantage=True)
    trainer = DDPPOTrainer(model=policy, ppo_cfg=cfg, envs=envs,
                           rng=jax.random.PRNGKey(0),
                           total_updates=args.updates)

    for update in range(1, args.updates + 1):
        trainer.collect_rollout()
        stats = trainer.update_agent()
        if update % 10 == 0 or update == 1:
            r = float(np.mean(trainer.reward_window)) if trainer.reward_window else float("nan")
            print(f"update {update:4d}: mean_ep_reward {r:7.3f} | "
                  f"value_loss {stats['value_loss']:.4f} | "
                  f"entropy {stats['dist_entropy']:.3f} | steps {trainer.count_steps}")
    print("final mean episode reward:",
          float(np.mean(trainer.reward_window)))


if __name__ == "__main__":
    main()
