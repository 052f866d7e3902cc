"""Native checkpointing: flax-serialized pytrees + full RNG/config state.

Counterpart of the reference's checkpoint contents (SURVEY.md §5.4):
VO checkpoints carry ``{epoch, config, model/optimizer states, all RNG
states}`` (vo engine :1425-1447); RL checkpoints carry ``{state_dict,
optimizer, lr scheduler, config, requeue_stats}`` (ddppo_trainer.py:619-644)
and eval *reads the config back out of the checkpoint* (run.py:286-295).

Format: a single msgpack file via flax.serialization (host-independent),
with non-array metadata pickled alongside.  Orbax is available in the image
for sharded multi-host checkpoints; this single-file path is what the
engines use by default (everything here fits in host RAM).
"""

from __future__ import annotations

import os
import pickle
import random
from typing import Any, Dict, Optional

import numpy as np

import jax
from flax import serialization


def rng_state_bundle() -> Dict[str, Any]:
    """Snapshot host RNG states (the reference saves random/np/torch states)."""
    return {
        "py_random": random.getstate(),
        "np_random": np.random.get_state(),
    }


def restore_rng_state(bundle: Dict[str, Any]) -> None:
    random.setstate(bundle["py_random"])
    np.random.set_state(bundle["np_random"])


def save_checkpoint(path: str, tree: Any, metadata: Optional[Dict] = None) -> None:
    """tree: any pytree of arrays (params/opt_state/batch_stats/...).
    metadata: picklable extras (config dict, epoch, rng states...)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    host_tree = jax.tree.map(np.asarray, tree)
    payload = {
        "tree": serialization.to_bytes(host_tree),
        "treedef_template": pickle.dumps(jax.tree.map(lambda x: (x.shape, str(x.dtype)), host_tree)),
        "metadata": pickle.dumps(metadata or {}),
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, path)  # atomic — survives preemption mid-save


def load_checkpoint(path: str, target: Any = None):
    """Returns (tree, metadata). If target is given, restores into its
    structure; otherwise returns the raw state dict-of-dicts."""
    if not os.path.isfile(path):
        raise FileNotFoundError(
            f"checkpoint not found: {path!r} — pass a .pkl written by this "
            "framework (EVAL.EVAL_CKPT_PATH / RESUME_STATE_FILE)")
    with open(path, "rb") as f:
        payload = pickle.load(f)
    metadata = pickle.loads(payload["metadata"])
    if target is not None:
        tree = serialization.from_bytes(target, payload["tree"])
    else:
        tree = serialization.msgpack_restore(payload["tree"])
    return tree, metadata


def latest_checkpoint(ckpt_dir: str, prefix: str = "ckpt_") -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    files = [f for f in os.listdir(ckpt_dir) if f.startswith(prefix)]
    if not files:
        return None
    files.sort(key=lambda f: os.path.getmtime(os.path.join(ckpt_dir, f)))
    return os.path.join(ckpt_dir, files[-1])
