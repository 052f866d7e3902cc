"""PyTorch ``.pth`` -> JAX parameter conversion.

Maps the reference's state_dict layouts onto this package's flax trees so the
three published checkpoints (``act_forward.pth``, ``act_left_right_inv_joint.pth``,
``rl_tune_vo.pth`` — README.md:102-110) load with float-level parity:

- conv ``OIHW`` -> ``HWIO``; linear ``(out, in)`` -> ``(in, out)``;
- GroupNorm weight/bias -> scale/bias;
- ``RunningMeanAndVar`` buffers ``(1, C, 1, 1)`` -> ``(C,)`` in ``batch_stats``;
- torch LSTM/GRU matrices keep their ``(gates*H, in)`` layout (models/rnn.py
  computes ``x @ W.T`` exactly like torch);
- the flatten-order hazard (torch flattens NCHW) is neutralized in the models
  themselves (they transpose to NCHW before flattening), so fc weights need
  only the plain transpose.

Checkpoint container formats handled (SURVEY.md §5.4):
- VO: ``{"model_states": {act_idx: sd}}`` or ``{"model_state": sd}``
  (vo engine :1425-1447; loader base_trainer_with_vo.py:92-99);
- RL: ``{"state_dict": {"actor_critic.<k>": v}}`` (ddppo_trainer.py:619-644).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Tuple

import numpy as np


def _set(tree: dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO


def _dense(w: np.ndarray) -> np.ndarray:
    return np.transpose(w)


_GN_IDX = {"0": None, "1": "gn"}  # within a conv+gn Sequential
_CONVS_IDX = {"0": "conv1", "1": "gn1", "3": "conv2", "4": "gn2", "6": "conv3", "7": "gn3"}


def _backbone_path(parts, leaf) -> Tuple[Tuple[str, ...], str]:
    """Translate a reference backbone state_dict key into a flax path.

    Returns (path, kind) with kind in {"conv", "plain", "dense"}.
    ``parts`` is the key split after 'backbone.'.
    """
    if parts[0] == "conv1":
        if parts[1] == "0":
            return ("backbone", "conv1", "kernel"), "conv"
        return ("backbone", "gn1", "scale" if leaf == "weight" else "bias"), "plain"
    m = re.fullmatch(r"layer(\d+)", parts[0])
    assert m, f"unrecognized backbone key: {'.'.join(parts)}"
    block = f"layer{m.group(1)}_{parts[1]}"
    sub = parts[2]
    if sub == "convs":
        name = _CONVS_IDX[parts[3]]
        if name.startswith("conv"):
            return ("backbone", block, name, "kernel"), "conv"
        return ("backbone", block, name, "scale" if leaf == "weight" else "bias"), "plain"
    if sub == "downsample":
        if parts[3] == "0":
            return ("backbone", block, "down_conv", "kernel"), "conv"
        return ("backbone", block, "down_gn", "scale" if leaf == "weight" else "bias"), "plain"
    if sub == "se":
        fc = {"0": "fc1", "2": "fc2"}[parts[4]]
        kind = "dense" if leaf == "weight" else "plain"
        return ("backbone", block, "se", fc, "kernel" if leaf == "weight" else "bias"), kind
    raise KeyError(f"unrecognized backbone key: {'.'.join(parts)}")


_KIND_FN = {"conv": _conv, "dense": _dense, "plain": lambda v: v}


def _to_np(v: Any) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v, dtype=np.float32)


def convert_vo_state_dict(sd: Mapping[str, Any]) -> Dict[str, dict]:
    """Reference VO model state_dict -> {"params": ..., "batch_stats": ...}."""
    params: dict = {}
    stats: dict = {}
    for key, raw in sd.items():
        v = _to_np(raw)
        parts = key.split(".")
        leaf = parts[-1]
        if parts[0] == "visual_encoder":
            rest = parts[1:]
            if rest[0] == "running_mean_and_var":
                name = {"_mean": "mean", "_var": "var", "_count": "count"}[rest[1]]
                _set(stats, ("visual_encoder", "rmv", name), v.reshape(-1) if name != "count" else v.reshape(()))
            elif rest[0] == "backbone":
                path, kind = _backbone_path(rest[1:], leaf)
                _set(params, ("visual_encoder",) + path, _KIND_FN[kind](v))
            elif rest[0] == "compression":
                if rest[1] == "0":
                    _set(params, ("visual_encoder", "compression_conv", "kernel"), _conv(v))
                else:
                    _set(params, ("visual_encoder", "compression_gn",
                                  "scale" if leaf == "weight" else "bias"), v)
            else:
                raise KeyError(key)
        elif parts[0] == "visual_fc":
            _set(params, ("visual_fc", "kernel" if leaf == "weight" else "bias"),
                 _dense(v) if leaf == "weight" else v)
        elif parts[0] == "hidden_generator":
            _set(params, ("hidden_generator", "kernel" if leaf == "weight" else "bias"),
                 _dense(v) if leaf == "weight" else v)
        elif parts[0] == "output_head":
            _set(params, ("output_head", "kernel" if leaf == "weight" else "bias"),
                 _dense(v) if leaf == "weight" else v)
        elif parts[0] == "action_embedding":
            _set(params, ("action_embedding", "embedding"), v)
        elif parts[0] == "flatten":
            continue
        else:
            raise KeyError(f"unrecognized VO key: {key}")
    return {"params": params, "batch_stats": stats}


def convert_policy_state_dict(sd: Mapping[str, Any]) -> Dict[str, dict]:
    """Reference actor-critic state_dict -> {"params": ..., "batch_stats": ...}.

    Accepts keys with or without the ``actor_critic.`` prefix.
    """
    params: dict = {}
    stats: dict = {}
    for key, raw in sd.items():
        if key.startswith("actor_critic."):
            key = key[len("actor_critic."):]
        v = _to_np(raw)
        parts = key.split(".")
        leaf = parts[-1]
        if parts[0] == "net":
            rest = parts[1:]
            if rest[0] == "prev_action_embedding":
                _set(params, ("prev_action_embedding", "embedding"), v)
            elif rest[0] == "tgt_embeding":
                _set(params, ("tgt_embeding", "kernel" if leaf == "weight" else "bias"),
                     _dense(v) if leaf == "weight" else v)
            elif rest[0] == "visual_encoder":
                sub = rest[1:]
                if sub[0] == "running_mean_and_var":
                    name = {"_mean": "mean", "_var": "var", "_count": "count"}[sub[1]]
                    _set(stats, ("visual_encoder", "rmv", name),
                         v.reshape(-1) if name != "count" else v.reshape(()))
                elif sub[0] == "backbone":
                    path, kind = _backbone_path(sub[1:], leaf)
                    _set(params, ("visual_encoder",) + path, _KIND_FN[kind](v))
                elif sub[0] == "compression":
                    if sub[1] == "0":
                        _set(params, ("visual_encoder", "compression_conv", "kernel"), _conv(v))
                    else:
                        _set(params, ("visual_encoder", "compression_gn",
                                      "scale" if leaf == "weight" else "bias"), v)
                else:
                    raise KeyError(key)
            elif rest[0] == "visual_fc":
                _set(params, ("visual_fc", "kernel" if leaf == "weight" else "bias"),
                     _dense(v) if leaf == "weight" else v)
            elif rest[0] == "state_encoder":
                # rnn.weight_ih_l0 -> w_ih_l0 (kept untransposed; see models/rnn.py)
                nm = rest[2]
                nm = nm.replace("weight_", "w_").replace("bias_", "b_")
                _set(params, ("state_encoder", nm), v)
            else:
                raise KeyError(key)
        elif parts[0] == "action_distribution":
            _set(params, ("action_head", "kernel" if leaf == "weight" else "bias"),
                 _dense(v) if leaf == "weight" else v)
        elif parts[0] == "critic":
            _set(params, ("critic", "kernel" if leaf == "weight" else "bias"),
                 _dense(v) if leaf == "weight" else v)
        else:
            raise KeyError(f"unrecognized policy key: {key}")
    return {"params": params, "batch_stats": stats}


def load_torch_checkpoint(path: str) -> Any:
    """torch.load wrapper (lazy torch import; CPU map like the reference's
    resume path, ddppo_trainer.py:323-332)."""
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


def load_vo_checkpoint(path: str, act_idx: int | None = None) -> Dict[str, dict]:
    """Load a reference VO checkpoint file into flax variables.

    Handles both container layouts (base_trainer_with_vo.py:92-99).
    """
    ckpt = load_torch_checkpoint(path)
    if "model_state" in ckpt:
        sd = ckpt["model_state"]
    elif "model_states" in ckpt:
        assert act_idx is not None, "per-action checkpoint requires act_idx"
        sd = ckpt["model_states"][act_idx]
    else:
        sd = ckpt
    return convert_vo_state_dict(sd)


def load_policy_checkpoint(path: str) -> Dict[str, dict]:
    ckpt = load_torch_checkpoint(path)
    sd = ckpt.get("state_dict", ckpt)
    return convert_policy_state_dict(sd)
