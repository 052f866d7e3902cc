#!/usr/bin/env python
"""Trajectory visualization — the reference notebook's job as a script.

Counterpart of ``notebooks/vis_top_down_map.ipynb``: replay specific episodes
deterministically (``reset_to_episode``), drive them with the oracle goal
follower (optionally propagating goals through a trained VO ensemble), and
render the top-down trajectory map — ground-truth path, dead-reckoned VO
path, goal — to PNG per episode plus an optional evolving-map MP4.

Usage:
  python examples/vis_trajectory.py --episodes 0 3 7 --out /tmp/traj
  python examples/vis_trajectory.py --vo-ckpt ckpt.pkl --video
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pointnav_vo_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pointnav_vo_tpu.rl.envs import EnvConfig, ScriptedPointNavEnv  # noqa: E402
from pointnav_vo_tpu.vis.maps import draw_top_down_map, generate_video  # noqa: E402
from pointnav_vo_tpu.vo.dataset import oracle_goal_follower  # noqa: E402


def _load_vo(ckpt_path, size):
    import jax

    from pointnav_vo_tpu.common import VO_EXPERT_ACTIONS
    from pointnav_vo_tpu.io.checkpoint import load_checkpoint
    from pointnav_vo_tpu.vo.ensemble import VOEnsemble, VOInferenceConfig

    tree, meta = load_checkpoint(ckpt_path)
    icfg = VOInferenceConfig(vis_size_w=size, vis_size_h=size)
    variables = tree["variables"] if "variables" in tree else tree
    n_experts = jax.tree.leaves(variables)[0].shape[0]
    if n_experts != len(VO_EXPERT_ACTIONS):
        raise SystemExit(
            f"{ckpt_path} holds {n_experts} stacked expert(s) (a single-stage "
            f"training checkpoint); dead-reckoning needs the full "
            f"{len(VO_EXPERT_ACTIONS)}-expert ensemble — finish the 3-stage "
            "recipe (TRAIN.md) or pass a checkpoint whose VO.TRAIN.action_type "
            "covered forward+left+right."
        )
    return VOEnsemble(icfg, variables)


def run_episode(env, episode_id, follower, vo=None, rng=None):
    """Returns (gt_path, vo_path, goal, room_radius, steps)."""
    obs = env.reset_to_episode(episode_id)
    gt_path = [tuple(env.pos)]
    vo_path = [tuple(env.pos)]
    est = np.asarray([env.pos[0], env.pos[1]], np.float64)
    est_yaw = env.yaw
    prev_obs = obs
    steps = 0
    while True:
        action = follower(env, obs)
        if action == 0 or env.episode_over:
            break
        obs, _r, done, info = env.step(action)
        steps += 1
        gt_path.append(tuple(env.pos))
        if vo is not None:
            delta, _std, _ = vo.compute_local_delta_states_from_vo(
                jnp.asarray(prev_obs["rgb"][None]), jnp.asarray(prev_obs["depth"][None]),
                jnp.asarray(obs["rgb"][None]), jnp.asarray(obs["depth"][None]),
                np.asarray([action], np.int32),
            )
            dx, dz, dyaw = np.asarray(delta)[0]
        else:
            dx, dz, dyaw = info["gt_delta"]
        ca, sa = np.cos(est_yaw), np.sin(est_yaw)
        est = est + np.asarray([ca * dx + sa * dz, -sa * dx + ca * dz])
        est_yaw += dyaw
        vo_path.append((float(est[0]), float(est[1])))
        prev_obs = obs
        if done:
            break
    return gt_path, vo_path, np.asarray(env.goal), env.room_radius, steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--episodes", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--size", type=int, default=96)
    ap.add_argument("--out", default="trajectory_vis")
    ap.add_argument("--vo-ckpt", default=None,
                    help="native VO checkpoint: dead-reckon the drawn path "
                         "through the trained ensemble instead of GT deltas")
    ap.add_argument("--video", action="store_true",
                    help="also write an evolving-map mp4 per episode")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    env_cfg = EnvConfig(image_h=args.size, image_w=args.size)
    env = ScriptedPointNavEnv(env_cfg, seed=args.seed)
    follower = oracle_goal_follower(env_cfg.turn_angle_deg, env_cfg.success_distance)
    vo = _load_vo(args.vo_ckpt, args.size) if args.vo_ckpt else None

    for ep in args.episodes:
        gt_path, vo_path, goal, radius, steps = run_episode(env, ep, follower, vo)
        img = draw_top_down_map(gt_path, tuple(goal), radius)
        # overlay the dead-reckoned path in blue (identical to the GT path
        # when drawn from GT deltas; diverges with a trained VO ensemble)
        overlay = draw_top_down_map(vo_path, tuple(goal), radius)
        mask = (overlay != 255).any(-1) & (img == 255).all(-1)
        img[mask] = (40, 80, 220)
        try:
            import cv2

            cv2.imwrite(os.path.join(args.out, f"episode_{ep}.png"),
                        img[..., ::-1])
        except ImportError:
            np.save(os.path.join(args.out, f"episode_{ep}.npy"), img)
        final_err = float(np.hypot(gt_path[-1][0] - vo_path[-1][0],
                                   gt_path[-1][1] - vo_path[-1][1]))
        print(f"episode {ep}: {steps} steps, dist_to_goal="
              f"{env.dist_to_goal:.2f} m, dead-reckoning drift={final_err:.3f} m")
        if args.video:
            frames = [draw_top_down_map(gt_path[: i + 2], tuple(goal), radius)
                      for i in range(len(gt_path) - 1)]
            generate_video(frames, args.out, f"episode_{ep}_map", fps=5)


if __name__ == "__main__":
    main()
