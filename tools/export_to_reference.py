#!/usr/bin/env python3
"""Export a native checkpoint (``.pkl``) to a reference-loadable ``.pth``.

The reverse of passing a reference ``.pth`` to ``EVAL.EVAL_CKPT_PATH``:
weights trained with this framework on TPU deploy into the reference's own
torch stack (its eval sweep, its challenge-submission harness).  Containers
match the reference's loaders exactly — VO checkpoints emit the per-action
``model_states`` dict (vo_cnn_...engine.py:1425-1447, accepted by
base_trainer_with_vo.py:92-99), RL checkpoints the ``actor_critic.``-prefixed
``state_dict`` (ddppo_trainer.py:619-644).

Usage:
    python tools/export_to_reference.py <ckpt.pkl> <out.pth> [--kind vo|policy]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pointnav_vo_tpu.io.checkpoint import load_checkpoint  # noqa: E402
from pointnav_vo_tpu.io.torch_export import (
    save_policy_checkpoint_torch,
    save_vo_checkpoint_torch,
    unstack_expert_variables,
)

TURN_LEFT, TURN_RIGHT = 2, 3


def _expert_actions(action_type) -> tuple:
    # mirror of vo/engine.py::VOTrainConfig.expert_actions
    if isinstance(action_type, (tuple, list)):
        assert set(action_type) == {TURN_LEFT, TURN_RIGHT}, action_type
        return (TURN_LEFT, TURN_RIGHT)
    return (int(action_type),)


def export(ckpt_path: str, out_path: str, kind: str = "vo") -> dict:
    tree, meta = load_checkpoint(ckpt_path)
    if kind == "policy":
        extra = {k: v for k, v in tree.get("extra_variables", {}).items()
                 if k != "params"}
        variables = {"params": tree["params"], **extra}
        save_policy_checkpoint_torch(
            out_path, variables,
            extra={"update": meta.get("update", 0)} if meta else None)
        return {"kind": "policy", "out": out_path}
    stacked = tree["variables"]
    acts = _expert_actions(meta["train_config"]["action_type"])
    epoch = int(meta.get("epoch", 0))
    if acts == (-1,):
        # unified act-embed model -> flat "model_state" container
        save_vo_checkpoint_torch(out_path,
                                 unstack_expert_variables(stacked, 0),
                                 epoch=epoch)
    else:
        per = {act: unstack_expert_variables(stacked, i)
               for i, act in enumerate(acts)}
        save_vo_checkpoint_torch(out_path, per, epoch=epoch)
    return {"kind": "vo", "actions": list(acts), "epoch": epoch,
            "out": out_path}


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("ckpt", help="native checkpoint (.pkl)")
    ap.add_argument("out", help="output .pth path")
    ap.add_argument("--kind", choices=("vo", "policy"), default="vo")
    args = ap.parse_args()
    info = export(args.ckpt, args.out, args.kind)
    print(f"exported {info}")


if __name__ == "__main__":
    main()
