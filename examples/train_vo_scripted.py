#!/usr/bin/env python
"""End-to-end VO training demo: generate data -> train stage 1 -> evaluate.

Runs the complete TRAIN.md stage-1 pipeline (forward-action model) without
habitat: the scripted world renders view-dependent depth/RGB, the oracle
harvests frame pairs into the reference HDF5 schema, and the engine trains
the full-size vo_cnn_rgb_d_dd_top_down on device.  Prints per-epoch losses
and the final per-delta absolute errors — dz error should fall well below
the 0.25 m step size (i.e. the model actually learns egomotion from pixels).

Usage: python examples/train_vo_scripted.py [--pairs 3000] [--epochs 8]
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pointnav_vo_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax.numpy as jnp  # noqa: E402

from pointnav_vo_tpu.common import MOVE_FORWARD  # noqa: E402
from pointnav_vo_tpu.rl.envs import EnvConfig  # noqa: E402
from pointnav_vo_tpu.vo.dataset import FramePairReader, generate_scripted_dataset  # noqa: E402
from pointnav_vo_tpu.vo.engine import VORegressionEngine, VOTrainConfig  # noqa: E402
from pointnav_vo_tpu.vo.ensemble import VOInferenceConfig  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=3000)
    ap.add_argument("--eval-pairs", type=int, default=512)
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--size", type=int, default=96, help="square obs size")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    s = args.size
    env_cfg = EnvConfig(image_h=s, image_w=s, max_episode_steps=80,
                        actuation_noise_multiplier=0.5)
    workdir = args.out or tempfile.mkdtemp(prefix="vo_scripted_")
    train_h5 = os.path.join(workdir, "train.h5")
    eval_h5 = os.path.join(workdir, "eval.h5")
    print(f"generating {args.pairs}+{args.eval_pairs} pairs into {workdir} ...")
    generate_scripted_dataset(train_h5, args.pairs, env_cfg=env_cfg, seed=0)
    generate_scripted_dataset(eval_h5, args.eval_pairs, env_cfg=env_cfg, seed=10_000)

    icfg = VOInferenceConfig(vis_size_w=s, vis_size_h=s, dtype=jnp.bfloat16)
    tcfg = VOTrainConfig(batch_size=args.batch, epochs=args.epochs,
                         action_type=MOVE_FORWARD, lr=2.5e-4, log_interval=5)
    train_reader = FramePairReader(train_h5, s, s, act_type=MOVE_FORWARD)
    eval_reader = FramePairReader(eval_h5, s, s, act_type=MOVE_FORWARD)
    print(f"train pairs (forward only): {len(train_reader)}, "
          f"eval: {len(eval_reader)}")

    engine = VORegressionEngine(icfg, tcfg, train_reader, eval_reader)
    base = engine.evaluate()
    print(f"untrained: abs_dz {base['abs_diff_dz']:.4f} m | "
          f"abs_dx {base['abs_diff_dx']:.4f} m | abs_dyaw {base['abs_diff_dyaw']:.4f} rad")
    for _ in range(args.epochs):
        stats = engine.train_epoch()
        ev = engine.evaluate()
        print(f"epoch {engine.epoch}: train_loss {stats['mean_total_loss']:.5f} "
              f"({stats['frame_pairs_per_s']:.0f} pairs/s) | eval abs_dz "
              f"{ev['abs_diff_dz']:.4f} abs_dx {ev['abs_diff_dx']:.4f} "
              f"abs_dyaw {ev['abs_diff_dyaw']:.4f}")
    final = engine.evaluate()
    improved = final["abs_diff_dz"] < 0.5 * base["abs_diff_dz"]
    print(f"dz error {base['abs_diff_dz']:.4f} -> {final['abs_diff_dz']:.4f} m "
          f"({'LEARNED' if improved else 'no clear learning'})")


if __name__ == "__main__":
    main()
