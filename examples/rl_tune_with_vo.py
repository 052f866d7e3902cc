#!/usr/bin/env python
"""The reference's full 4-stage pipeline, habitat-free: rl_tune_vo end to end.

Reproduces the reference's training story (TRAIN.md; ppo_trainer.py:206-239)
on the scripted world:

  1. train the three VO experts on frame pairs (stages 1-3 condensed);
  2. train a nav policy with GPS goals (the reference's `rl_no_tune`);
  3. evaluate that GPS-trained policy with the TRAINED VO supplying goals
     (the deployment condition: no GPS at test time);
  4. fine-tune the policy WITH the VO in the loop (`rl_tune_vo`,
     TUNE_WITH_VO) and re-evaluate under the same VO.

Reports success / SoftSPL / distance-to-goal for stage-3 vs stage-4 — the
tune-with-VO improvement the reference's headline table demonstrates
(README table: -0.9 SPL no-tune -> +1.1 tuned on Gibson val) — plus a
GPS-oracle row (same policy, ground-truth goal) that upper-bounds what any
VO can deliver, and writes the three-row ladder to `RL_TUNE_VO.json`.

Usage: python examples/rl_tune_with_vo.py [--pairs 3000] [--gps-updates 60]
       [--tune-updates 40] [--out RL_TUNE_VO.json]
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pointnav_vo_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pointnav_vo_tpu.common import MOVE_FORWARD, TURN_LEFT, TURN_RIGHT  # noqa: E402
from pointnav_vo_tpu.models.policy import PointNavActorCritic  # noqa: E402
from pointnav_vo_tpu.rl.envs import EnvConfig, make_scripted_vector_env  # noqa: E402
from pointnav_vo_tpu.rl.eval import Evaluator  # noqa: E402
from pointnav_vo_tpu.rl.ppo import PPOConfig  # noqa: E402
from pointnav_vo_tpu.rl.trainer import DDPPOTrainer  # noqa: E402
from pointnav_vo_tpu.vo.dataset import (  # noqa: E402
    FramePairReader,
    generate_scripted_dataset,
)
from pointnav_vo_tpu.vo.engine import VORegressionEngine, VOTrainConfig  # noqa: E402
from pointnav_vo_tpu.vo.ensemble import (  # noqa: E402
    VOEnsemble,
    VOInferenceConfig,
    stack_expert_variables,
)


def train_expert(icfg, tcfg, train_h5, s, label):
    reader = FramePairReader(train_h5, s, s, act_type=tcfg.action_type,
                             geo_invariance_types=tcfg.geo_invariance_types)
    eng = VORegressionEngine(icfg, tcfg, reader, None)
    print(f"[vo:{label}] {len(reader)} pairs x {tcfg.epochs} epochs",
          flush=True)
    for _ in range(tcfg.epochs):
        eng.train_epoch()
    return eng.variables


def evaluate(policy, variables, ensemble, env_cfg, episodes, seed):
    envs = make_scripted_vector_env(env_cfg, 8, seed=seed)
    ev = Evaluator(model=policy, variables=variables, envs=envs,
                   vo_ensemble=ensemble, rng=jax.random.PRNGKey(9))
    return ev.run(episodes)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=3000)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--gps-updates", type=int, default=60)
    ap.add_argument("--tune-updates", type=int, default=40)
    ap.add_argument("--episodes", type=int, default=48)
    ap.add_argument("--envs", type=int, default=8)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "RL_TUNE_VO.json"))
    args = ap.parse_args()
    s = args.size
    t_pipeline = time.perf_counter()

    env_cfg = EnvConfig(
        image_h=s, image_w=s, max_episode_steps=60,
        actuation_noise_multiplier=0.5, room_radius_range=(3.0, 5.0),
    )

    # ---- stage 1-3: VO experts -------------------------------------------
    workdir = tempfile.mkdtemp(prefix="tunevo_")
    train_h5 = os.path.join(workdir, "train.h5")
    print(f"generating {args.pairs} pairs at {s}x{s} ...", flush=True)
    generate_scripted_dataset(train_h5, args.pairs, env_cfg=env_cfg, seed=0)
    icfg = VOInferenceConfig(vis_size_w=s, vis_size_h=s, dtype=jnp.bfloat16)
    fwd_vars = train_expert(
        icfg, VOTrainConfig(batch_size=128, epochs=args.epochs,
                            action_type=MOVE_FORWARD, lr=2.5e-4),
        train_h5, s, "forward")
    joint_vars = train_expert(
        icfg, VOTrainConfig(batch_size=128, epochs=args.epochs,
                            action_type=(TURN_LEFT, TURN_RIGHT),
                            geo_invariance_types=("inverse_joint_train",),
                            lr=1.5e-4),
        train_h5, s, "joint left/right")
    ensemble = VOEnsemble(icfg, stack_expert_variables([
        jax.tree.map(lambda x: x[0], fwd_vars),
        jax.tree.map(lambda x: x[0], joint_vars),
        jax.tree.map(lambda x: x[1], joint_vars),
    ]))

    # ---- stage: GPS policy (rl_no_tune) ----------------------------------
    policy = PointNavActorCritic(image_size=(s, s), dtype=jnp.bfloat16)
    cfg = PPOConfig(num_steps=64, num_mini_batch=2, ppo_epoch=2, lr=2.5e-4,
                    entropy_coef=0.01, use_normalized_advantage=True)
    envs = make_scripted_vector_env(env_cfg, args.envs, seed=0)
    trainer = DDPPOTrainer(model=policy, ppo_cfg=cfg, envs=envs,
                           rng=jax.random.PRNGKey(0),
                           total_updates=args.gps_updates)
    print(f"\ntraining GPS policy: {args.gps_updates} updates ...", flush=True)
    for update in range(1, args.gps_updates + 1):
        trainer.collect_rollout()
        trainer.update_agent()
        if update % 10 == 0:
            r = (float(np.mean(trainer.reward_window))
                 if trainer.reward_window else float("nan"))
            print(f"  [gps {update:3d}] mean_ep_reward {r:7.3f}", flush=True)
    # DDPPOTrainer pops "params" out of .variables at init; rebuild the full
    # variables dict (same shape engines.py saves in its RL checkpoints)
    gps_variables = {"params": trainer.params, **trainer.variables}

    # ---- eval: GPS oracle (same policy, ground-truth goal sensor) --------
    # the quality upper bound: with vo_ensemble=None the Evaluator feeds the
    # policy the env's true pointgoal every step — the reference's
    # "VO nearly matches GPS" comparison needs this control row
    print("\nevaluating GPS-trained policy under GPS oracle ...", flush=True)
    gps_oracle = evaluate(policy, gps_variables, None, env_cfg,
                          args.episodes, seed=555)

    # ---- eval: GPS-trained policy under the trained VO -------------------
    print("\nevaluating GPS-trained policy under trained VO ...", flush=True)
    no_tune = evaluate(policy, gps_variables, ensemble, env_cfg,
                       args.episodes, seed=555)

    # ---- stage: tune with VO in the loop (rl_tune_vo) --------------------
    print(f"\ntuning with VO in the loop: {args.tune_updates} updates ...",
          flush=True)
    envs2 = make_scripted_vector_env(env_cfg, args.envs, seed=100)
    tuner = DDPPOTrainer(model=policy, ppo_cfg=cfg, envs=envs2,
                         rng=jax.random.PRNGKey(1), variables=gps_variables,
                         vo_ensemble=ensemble,
                         total_updates=args.tune_updates)
    for update in range(1, args.tune_updates + 1):
        tuner.collect_rollout()
        tuner.update_agent()
        if update % 10 == 0:
            r = (float(np.mean(tuner.reward_window))
                 if tuner.reward_window else float("nan"))
            print(f"  [tune {update:3d}] mean_ep_reward {r:7.3f}", flush=True)

    print("\nevaluating tuned policy under the same VO ...", flush=True)
    tuned = evaluate(policy, {"params": tuner.params, **tuner.variables},
                     ensemble, env_cfg, args.episodes, seed=555)

    keys = ("success", "softspl", "spl", "distance_to_goal", "vo_l2_mean")
    print("\n=== GPS oracle | rl_no_tune (VO-evaluated) | rl_tune_vo ===")
    for k in keys:
        o = gps_oracle.get(k, float("nan"))
        a, b = no_tune.get(k, float("nan")), tuned.get(k, float("nan"))
        print(f"  {k:18s}: {o:7.3f} | {a:7.3f} -> {b:7.3f}")

    out = {
        "protocol": ("3-row quality ladder, shared seeds/episodes: "
                     "(i) GPS-trained policy + GPS oracle goal, "
                     "(ii) same policy + trained-VO goal (rl_no_tune), "
                     "(iii) VO-in-the-loop fine-tuned policy + same VO "
                     "(rl_tune_vo) — reference TRAIN.md stage 4, "
                     "ppo_trainer.py:206-239"),
        "world": "scripted (habitat-free), PointNavActorCritic",
        "resolution": [s, s],
        "episodes": args.episodes,
        "envs": args.envs,
        "vo_pairs": args.pairs,
        "gps_updates": args.gps_updates,
        "tune_updates": args.tune_updates,
        "pipeline_wall_clock_min": (time.perf_counter() - t_pipeline) / 60,
        "gps_oracle": {k: float(v) for k, v in gps_oracle.items()},
        "no_tune": {k: float(v) for k, v in no_tune.items()},
        "tune_vo": {k: float(v) for k, v in tuned.items()},
        "tune_improvement": {
            k: float(tuned.get(k, float("nan")) - no_tune.get(k, float("nan")))
            for k in keys if k in tuned and k in no_tune
        },
        "gps_vs_vo_gap_after_tune": {
            k: float(gps_oracle.get(k, float("nan"))
                     - tuned.get(k, float("nan")))
            for k in ("success", "softspl", "spl") if k in tuned
        },
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
