#!/usr/bin/env python
"""The full PointNav-VO loop, habitat-free: train VO -> navigate by VO alone.

This is the BASELINE.json config-3/4 shape end to end: train the three
action-conditioned VO experts on scripted-world frame pairs (stage 1 forward
+ joint left/right with the geometric-invariance loss), assemble the
ensemble, then run the evaluator where the agent's point-goal is
dead-reckoned through the TRAINED VO predictions only — no GPS, no ground
truth — and report navigation success/SPL plus VO error and drift.

Usage: python examples/end_to_end_scripted.py [--pairs 4000] [--epochs 6]
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pointnav_vo_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pointnav_vo_tpu.common import MOVE_FORWARD, TURN_LEFT, TURN_RIGHT  # noqa: E402
from pointnav_vo_tpu.rl.envs import EnvConfig, make_scripted_vector_env  # noqa: E402
from pointnav_vo_tpu.rl.eval import Evaluator  # noqa: E402
from pointnav_vo_tpu.vo.dataset import FramePairReader, generate_scripted_dataset  # noqa: E402
from pointnav_vo_tpu.vo.engine import VORegressionEngine, VOTrainConfig  # noqa: E402
from pointnav_vo_tpu.vo.ensemble import (  # noqa: E402
    VOEnsemble,
    VOInferenceConfig,
    stack_expert_variables,
)

# the evaluator's greedy goal-following policy (same rule the challenge agent
# test uses) — reads ONLY the VO-propagated polar goal
import flax.linen as nn  # noqa: E402
import numpy as np  # noqa: E402


class GreedyGoalPolicy(nn.Module):
    turn_angle_deg: float = 30.0
    success_distance: float = 0.36

    @property
    def num_packed_hidden(self):
        return 1

    def initial_hidden(self, num_envs):
        return jnp.zeros((1, num_envs, 1))

    @nn.compact
    def __call__(self, observations, hidden, prev_actions, masks, update_stats=False):
        goal = observations["pointgoal_with_gps_compass"]
        rho, neg_phi = goal[:, 0], goal[:, 1]
        bearing = -neg_phi
        half = np.radians(self.turn_angle_deg) / 2
        action = jnp.where(
            rho < self.success_distance, 0,
            jnp.where(jnp.abs(bearing) > half, jnp.where(bearing < 0, 2, 3), 1),
        )
        return jax.nn.one_hot(action, 4) * 100.0, jnp.zeros((goal.shape[0], 1)), hidden


def train_expert(icfg, tcfg, train_h5, eval_h5, s, label):
    act = tcfg.action_type
    geo = tcfg.geo_invariance_types
    tr = FramePairReader(train_h5, s, s, act_type=act, geo_invariance_types=geo)
    ev = FramePairReader(eval_h5, s, s, act_type=act, geo_invariance_types=geo)
    eng = VORegressionEngine(icfg, tcfg, tr, ev)
    print(f"[{label}] {len(tr)} train pairs")
    for _ in range(tcfg.epochs):
        stats = eng.train_epoch()
    final = eng.evaluate()
    print(f"[{label}] final eval abs (dx, dz, dyaw) = "
          f"({final['abs_diff_dx']:.4f}, {final['abs_diff_dz']:.4f}, "
          f"{final['abs_diff_dyaw']:.4f})")
    return eng.variables


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=4000)
    ap.add_argument("--eval-pairs", type=int, default=384)
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--size", type=int, default=96)
    ap.add_argument("--episodes", type=int, default=50)
    ap.add_argument("--envs", type=int, default=8)
    args = ap.parse_args()

    s = args.size
    env_cfg = EnvConfig(image_h=s, image_w=s, max_episode_steps=120,
                        actuation_noise_multiplier=0.5)
    workdir = tempfile.mkdtemp(prefix="vo_e2e_")
    train_h5 = os.path.join(workdir, "train.h5")
    eval_h5 = os.path.join(workdir, "eval.h5")
    print(f"generating {args.pairs}+{args.eval_pairs} pairs ...")
    generate_scripted_dataset(train_h5, args.pairs, env_cfg=env_cfg, seed=0)
    generate_scripted_dataset(eval_h5, args.eval_pairs, env_cfg=env_cfg, seed=99_999)

    icfg = VOInferenceConfig(vis_size_w=s, vis_size_h=s, dtype=jnp.bfloat16)
    fwd_vars = train_expert(
        icfg,
        VOTrainConfig(batch_size=args.batch, epochs=args.epochs,
                      action_type=MOVE_FORWARD, lr=2.5e-4),
        train_h5, eval_h5, s, "forward",
    )
    joint_vars = train_expert(
        icfg,
        VOTrainConfig(batch_size=args.batch, epochs=args.epochs,
                      action_type=(TURN_LEFT, TURN_RIGHT),
                      geo_invariance_types=("inverse_joint_train",), lr=1.5e-4),
        train_h5, eval_h5, s, "joint left/right",
    )

    # assemble the deployment ensemble: (forward, left, right)
    fwd = jax.tree.map(lambda x: x[0], fwd_vars)
    left = jax.tree.map(lambda x: x[0], joint_vars)
    right = jax.tree.map(lambda x: x[1], joint_vars)
    ensemble = VOEnsemble(icfg, stack_expert_variables([fwd, left, right]))

    print(f"\nnavigating {args.episodes} episodes by VO dead-reckoning alone ...")
    envs = make_scripted_vector_env(env_cfg, args.envs, seed=777)
    policy = GreedyGoalPolicy(turn_angle_deg=env_cfg.turn_angle_deg,
                              success_distance=env_cfg.success_distance)
    ev = Evaluator(model=policy, variables={"params": {}}, envs=envs,
                   vo_ensemble=ensemble, rng=jax.random.PRNGKey(3))
    agg = ev.run(args.episodes)
    print(f"success {agg['success']:.3f} | spl {agg['spl']:.3f} | "
          f"softspl {agg['softspl']:.3f} | dist_to_goal {agg['distance_to_goal']:.3f} m")
    print(f"vo_l2 {agg['vo_l2_mean']:.4f} | drift {agg.get('global_drift_mean', float('nan')):.4f} m | "
          f"steps {agg['total_env_steps']:.0f}")


if __name__ == "__main__":
    main()
