"""Experiment driver: config assembly -> seeding -> engine dispatch.

Counterpart of the reference's ``pointnav_vo/run.py:34-346`` and
``launch.py``.  The torch.distributed.launch wrapper disappears: JAX SPMD
sees all local devices in one process, and multi-host runs initialize
``jax.distributed`` (parallel/mesh.py) instead of a TCPStore rendezvous.

Behaviors preserved:
- ``--task-type {rl, vo} --run-type {train, eval} --exp-config ... --noise``
  with trailing ``KEY VALUE`` config overrides;
- noisy/noise-free dataset switching for VO (reference run.py:111-128);
- the run's identity encoded into the log-dir name (:139-260, abbreviated);
- full RNG seeding (:276-282);
- on eval, the engine name + config come from inside the checkpoint
  (:286-295).
"""

from __future__ import annotations

import argparse
import datetime
import os
import random

import numpy as np

import pointnav_vo_tpu.engines  # noqa: F401 — populates the registry
from pointnav_vo_tpu.config.defaults import get_rl_config, get_vo_config
from pointnav_vo_tpu.io.checkpoint import load_checkpoint
from pointnav_vo_tpu.utils import registry
from pointnav_vo_tpu.utils.logging import get_logger, update_config_log


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="PointNav-VO TPU experiment driver")
    p.add_argument("--task-type", choices=("rl", "vo"), required=True)
    p.add_argument("--run-type", choices=("train", "eval"), required=True)
    p.add_argument("--exp-config", type=str, default=None)
    p.add_argument("--noise", type=int, default=1)
    p.add_argument("--log-root", type=str, default="train_log")
    p.add_argument("--n-devices", type=int, default=None,
                   help="mesh size for data-parallel training (default: all)")
    p.add_argument("opts", nargs=argparse.REMAINDER,
                   help="trailing KEY VALUE config overrides")
    return p


def _log_dir_name(args, config) -> str:
    """Run identity in the directory name (reference run.py:139-260)."""
    stamp = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
    bits = [args.task_type, args.run_type, f"seed{config.SEED}"]
    if args.task_type == "vo":
        t = config.VO.TRAIN
        bits += [config.VO.MODEL.name, f"act{t.action_type}", f"bs{t.batch_size}",
                 f"lr{t.lr}"]
        if config.VO.GEOMETRY.invariance_types:
            bits.append("geo_inv")
    else:
        bits += [config.RL.Policy.name, f"envs{config.NUM_PROCESSES}",
                 f"lr{config.RL.PPO.lr}"]
        if config.RL.TUNE_WITH_VO:
            bits.append("tune_vo")
    bits.append("noisy" if args.noise else "no_noise")
    bits.append(stamp)
    return os.path.join(args.log_root, "-".join(str(b) for b in bits))


def run_exp(args) -> None:
    from pointnav_vo_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    logger = get_logger()
    paths = [args.exp_config] if args.exp_config else []
    opts = args.opts or []

    if args.task_type == "vo":
        config = get_vo_config(paths, opts)
        if not args.noise:
            # mirror the reference's noisy/clean dataset switch
            config.VO.DATASET.TRAIN_WITH_NOISE = config.VO.DATASET.get("TRAIN", "")
            config.VO.DATASET.EVAL_WITH_NOISE = config.VO.DATASET.get("EVAL", "")
    else:
        config = get_rl_config(paths, opts)

    config = update_config_log(config, args.run_type, _log_dir_name(args, config))

    random.seed(config.SEED)
    np.random.seed(config.SEED)

    engine_name = config.ENGINE_NAME
    if args.run_type == "eval" and config.EVAL.EVAL_WITH_CKPT:
        ckpt = config.EVAL.EVAL_CKPT_PATH
        if ckpt and os.path.isfile(ckpt) and not ckpt.endswith(".pth"):
            _, meta = load_checkpoint(ckpt)
            engine_name = meta.get("engine_name", engine_name)

    logger.info(f"engine: {engine_name}; log dir: {config.LOG_DIR}")

    mesh = None
    if args.n_devices and args.n_devices > 1:
        from pointnav_vo_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(args.n_devices)

    if args.task_type == "vo":
        engine_cls = registry.get_vo_engine(engine_name)
        engine = engine_cls(config, args.run_type, mesh=mesh)
    else:
        engine_cls = registry.get_trainer(engine_name)
        engine = engine_cls(config, args.run_type, noisy=bool(args.noise), mesh=mesh)

    if args.run_type == "train":
        engine.train()
    else:
        engine.eval()


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    run_exp(args)


if __name__ == "__main__":
    main()
