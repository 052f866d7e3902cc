"""JAX -> PyTorch ``.pth`` export (exact inverse of ``io/torch_import``).

Completes the migration story in BOTH directions: weights trained with this
framework on TPU deploy straight into the reference's own torch stack.  The
emitted state dicts use the reference's exact key names and tensor layouts,
and the checkpoint containers match what the reference's loaders read:

- VO: ``{"model_states": {act_idx: sd}, "epoch": ...}`` or
  ``{"model_state": sd}`` — both accepted by the reference's pretrained-VO
  loader (base_trainer_with_vo.py:92-99) and resume path
  (vo_cnn_engine.py:40-49);
- RL: ``{"state_dict": {"actor_critic.<k>": tensor}}``
  (ddppo_trainer.py:619-644).

Layout inversions mirror ``torch_import``: conv ``HWIO -> OIHW``, linear
``(in, out) -> (out, in)``, GroupNorm ``scale``/``bias`` -> ``weight``/
``bias``, ``RunningMeanAndVar`` ``(C,)`` stats -> ``(1, C, 1, 1)`` buffers,
torch-layout RNN matrices pass through untouched (models/rnn.py stores them
exactly as torch does).
"""

from __future__ import annotations

from typing import Any, Dict, Iterator, Mapping, Tuple

import numpy as np


def _flatten(tree: Mapping[str, Any], prefix: Tuple[str, ...] = ()
             ) -> Iterator[Tuple[Tuple[str, ...], np.ndarray]]:
    for k in sorted(tree):
        v = tree[k]
        if isinstance(v, Mapping):
            yield from _flatten(v, prefix + (k,))
        else:
            yield prefix + (k,), np.asarray(v, dtype=np.float32)


def _conv_inv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (3, 2, 0, 1))  # HWIO -> OIHW


def _dense_inv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w)


_KIND_INV = {"conv": _conv_inv, "dense": _dense_inv, "plain": lambda v: v}

# inverse of torch_import._CONVS_IDX (position inside the block's
# ``convs`` Sequential: conv, gn, relu triplets)
_CONVS_IDX_INV = {"conv1": "0", "gn1": "1", "conv2": "3",
                  "gn2": "4", "conv3": "6", "gn3": "7"}
_SE_IDX_INV = {"fc1": "0", "fc2": "2"}


def _wb(leaf: str) -> str:
    return {"kernel": "weight", "scale": "weight", "bias": "bias"}[leaf]


def _backbone_ref_key(path: Tuple[str, ...]) -> Tuple[str, str]:
    """flax path under ``backbone`` -> (reference key suffix, kind)."""
    name, leaf = path[0], path[-1]
    if name == "conv1":
        return "conv1.0.weight", "conv"
    if name == "gn1":
        return f"conv1.1.{_wb(leaf)}", "plain"
    # blocks are named layer<L>_<B> on the flax side, layer<L>.<B> in torch
    layer, block = name.rsplit("_", 1)
    base = f"{layer}.{block}"
    sub = path[1]
    if sub in _CONVS_IDX_INV:
        idx = _CONVS_IDX_INV[sub]
        kind = "conv" if sub.startswith("conv") else "plain"
        return f"{base}.convs.{idx}.{_wb(leaf)}", kind
    if sub == "down_conv":
        return f"{base}.downsample.0.weight", "conv"
    if sub == "down_gn":
        return f"{base}.downsample.1.{_wb(leaf)}", "plain"
    if sub == "se":
        idx = _SE_IDX_INV[path[2]]
        kind = "dense" if leaf == "kernel" else "plain"
        return f"{base}.se.excite.{idx}.{_wb(leaf)}", kind
    raise KeyError(f"unrecognized backbone path: {'.'.join(path)}")


def _encoder_entries(rest: Tuple[str, ...], v: np.ndarray,
                     prefix: str) -> Tuple[str, np.ndarray]:
    """Shared visual-encoder export (VO + policy): backbone/compression."""
    leaf = rest[-1]
    if rest[0] == "backbone":
        key, kind = _backbone_ref_key(rest[1:])
        return f"{prefix}backbone.{key}", _KIND_INV[kind](v)
    if rest[0] == "compression_conv":
        return f"{prefix}compression.0.weight", _conv_inv(v)
    if rest[0] == "compression_gn":
        return f"{prefix}compression.1.{_wb(leaf)}", v
    raise KeyError(f"unrecognized visual_encoder path: {'.'.join(rest)}")


def _rmv_entries(stats: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    rmv = stats.get("visual_encoder", {}).get("rmv")
    if not rmv:
        return {}
    return {
        f"{prefix}running_mean_and_var._mean":
            np.asarray(rmv["mean"], np.float32).reshape(1, -1, 1, 1),
        f"{prefix}running_mean_and_var._var":
            np.asarray(rmv["var"], np.float32).reshape(1, -1, 1, 1),
        f"{prefix}running_mean_and_var._count":
            np.asarray(rmv["count"], np.float32).reshape(()),
    }


def export_vo_state_dict(variables: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Flax VO variables -> reference VO model state_dict (numpy values).

    Inverse of ``torch_import.convert_vo_state_dict``; key names match
    vo_cnn.py:216-227 / vo_cnn_act_embed.py:36-62.
    """
    sd: Dict[str, np.ndarray] = {}
    for path, v in _flatten(variables.get("params", {})):
        head, leaf = path[0], path[-1]
        if head == "visual_encoder":
            key, val = _encoder_entries(path[1:], v, "visual_encoder.")
            sd[key] = val
        elif head == "visual_fc":
            # Sequential(Flatten, Dropout, Linear, ReLU) -> Linear at 2
            sd[f"visual_fc.2.{_wb(leaf)}"] = _dense_inv(v) if leaf == "kernel" else v
        elif head == "hidden_generator":
            # Sequential(Dropout, Linear, ReLU) -> Linear at 1
            sd[f"hidden_generator.1.{_wb(leaf)}"] = (
                _dense_inv(v) if leaf == "kernel" else v)
        elif head == "output_head":
            # Sequential(Dropout, Linear) -> Linear at 1
            sd[f"output_head.1.{_wb(leaf)}"] = (
                _dense_inv(v) if leaf == "kernel" else v)
        elif head == "action_embedding":
            sd["action_embedding.weight"] = v
        else:
            raise KeyError(f"unrecognized VO param: {'.'.join(path)}")
    sd.update(_rmv_entries(variables.get("batch_stats", {}), "visual_encoder."))
    return sd


def export_policy_state_dict(variables: Mapping[str, Any],
                             prefix: str = "actor_critic.") -> Dict[str, np.ndarray]:
    """Flax actor-critic variables -> reference state_dict (numpy values).

    Inverse of ``torch_import.convert_policy_state_dict``; pass ``prefix=""``
    for the bare-module layout.
    """
    sd: Dict[str, np.ndarray] = {}
    for path, v in _flatten(variables.get("params", {})):
        head, leaf = path[0], path[-1]
        if head == "prev_action_embedding":
            sd[f"{prefix}net.prev_action_embedding.weight"] = v
        elif head == "tgt_embeding":
            sd[f"{prefix}net.tgt_embeding.{_wb(leaf)}"] = (
                _dense_inv(v) if leaf == "kernel" else v)
        elif head == "visual_encoder":
            key, val = _encoder_entries(path[1:], v, "net.visual_encoder.")
            sd[prefix + key] = val
        elif head == "visual_fc":
            # Sequential(Flatten, Linear, ReLU) -> Linear at 1
            sd[f"{prefix}net.visual_fc.1.{_wb(leaf)}"] = (
                _dense_inv(v) if leaf == "kernel" else v)
        elif head == "state_encoder":
            # w_ih_l0 -> rnn.weight_ih_l0 (torch layout kept, models/rnn.py)
            nm = path[1].replace("w_", "weight_").replace("b_", "bias_")
            sd[f"{prefix}net.state_encoder.rnn.{nm}"] = v
        elif head == "action_head":
            sd[f"{prefix}action_distribution.linear.{_wb(leaf)}"] = (
                _dense_inv(v) if leaf == "kernel" else v)
        elif head == "critic":
            sd[f"{prefix}critic.fc.{_wb(leaf)}"] = (
                _dense_inv(v) if leaf == "kernel" else v)
        else:
            raise KeyError(f"unrecognized policy param: {'.'.join(path)}")
    sd.update(_rmv_entries(variables.get("batch_stats", {}),
                           prefix + "net.visual_encoder."))
    return sd


def unstack_expert_variables(stacked: Mapping[str, Any], index: int) -> Dict:
    """Slice one expert out of ``stack_expert_variables`` output."""
    import jax

    return jax.tree.map(lambda x: np.asarray(x[index]), dict(stacked))


def _to_torch(sd: Mapping[str, np.ndarray]):
    import torch

    def conv(v: np.ndarray):
        a = np.ascontiguousarray(v)
        if not a.flags.writeable:  # torch warns on non-writable views
            a = a.copy()
        return torch.from_numpy(a)

    return {k: conv(v) for k, v in sd.items()}


def save_vo_checkpoint_torch(path: str, variables: Mapping[str, Any],
                             epoch: int = 0,
                             extra: Mapping[str, Any] | None = None) -> None:
    """Write a reference-loadable VO ``.pth``.

    ``variables`` is either one flax variables dict (-> ``model_state``) or
    ``{act_idx: variables}`` (-> the per-action ``model_states`` container of
    vo_cnn_...engine.py:1425-1447).
    """
    import torch

    if "params" in variables:
        ckpt: Dict[str, Any] = {"model_state": _to_torch(export_vo_state_dict(variables))}
    else:
        ckpt = {"model_states": {int(a): _to_torch(export_vo_state_dict(v))
                                 for a, v in variables.items()}}
    ckpt["epoch"] = epoch
    if extra:
        ckpt.update(extra)
    torch.save(ckpt, path)


def save_policy_checkpoint_torch(path: str, variables: Mapping[str, Any],
                                 extra: Mapping[str, Any] | None = None) -> None:
    """Write a reference-loadable RL ``.pth`` (``state_dict`` container with
    the ``actor_critic.`` prefix, ddppo_trainer.py:619-644)."""
    import torch

    ckpt: Dict[str, Any] = {"state_dict": _to_torch(export_policy_state_dict(variables))}
    if extra:
        ckpt.update(extra)
    torch.save(ckpt, path)
