#!/usr/bin/env python
"""Launcher — formats and execs the experiment command.

Counterpart of the reference's ``launch.py:9-110``.  The
``torch.distributed.launch`` wrapper disappears: a JAX process drives every
local chip via SPMD, and multi-host runs initialize the JAX distributed
runtime (``pointnav_vo_tpu.parallel.mesh.init_distributed``) from
SLURM/coordinator env vars instead of spawning per-GPU processes.
"""

import argparse
import os
import sys

DEFAULT_CONFIGS = {
    "rl": "configs/rl/ddppo_pointnav.yaml",
    "vo": "configs/vo/vo_pointnav.yaml",
}


def main() -> None:
    p = argparse.ArgumentParser(description="PointNav-VO TPU launcher")
    p.add_argument("--task-type", choices=("rl", "vo"), required=True)
    p.add_argument("--run-type", choices=("train", "eval"), required=True)
    p.add_argument("--noise", type=int, default=1)
    p.add_argument("--exp-config", default=None)
    p.add_argument("--n-devices", type=int, default=None)
    p.add_argument("--log-root", default=None)
    p.add_argument("opts", nargs=argparse.REMAINDER)
    args = p.parse_args()

    exp_config = args.exp_config or DEFAULT_CONFIGS[args.task_type]
    cmd = [
        sys.executable, "-m", "pointnav_vo_tpu.run",
        "--task-type", args.task_type,
        "--run-type", args.run_type,
        "--noise", str(args.noise),
        "--exp-config", exp_config,
    ]
    if args.n_devices:
        cmd += ["--n-devices", str(args.n_devices)]
    if args.log_root:
        cmd += ["--log-root", args.log_root]
    cmd += args.opts
    print(" ".join(cmd))
    os.execv(sys.executable, cmd)


if __name__ == "__main__":
    main()
