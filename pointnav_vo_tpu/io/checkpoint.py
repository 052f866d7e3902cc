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
    host_tree = jax.tree.map(_host_copy, tree)
    _write_checkpoint(path, host_tree, metadata)


def _host_copy(x: Any) -> np.ndarray:
    """Materialize an OWNED host copy of an array.

    ``np.asarray`` on a jax.Array may return a zero-copy view on CPU
    backends; with donated train steps the underlying buffer can be
    clobbered by the next dispatched step before the (possibly async)
    serialization reads it.  ``np.array(..., copy=True)`` guarantees the
    snapshot is taken at save time on every backend.
    """
    return np.array(x, copy=True)


def _write_checkpoint(path: str, host_tree: Any, metadata: Optional[Dict]) -> None:
    """Serialize + atomically write an already-host-resident tree."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "tree": serialization.to_bytes(host_tree),
        "treedef_template": pickle.dumps(jax.tree.map(lambda x: (x.shape, str(x.dtype)), host_tree)),
        "metadata": pickle.dumps(metadata or {}),
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, path)  # atomic — survives preemption mid-save


class AsyncCheckpointWriter:
    """Overlap checkpoint serialization + disk IO with device compute.

    ``save()`` snapshots the pytree to host arrays ON THE CALLING THREAD
    (mandatory: the train steps donate ``variables``/``opt_state``, so the
    device buffers are invalid the moment the next step is dispatched —
    vo/engine.py:502, :541) and hands the msgpack encode + atomic write to
    a single FIFO worker thread.  For the ~150 MB three-expert VO state the
    synchronous part is one device->host copy; the serialization and disk
    write (the expensive half on the epoch boundary) run under the next
    epoch's compute.

    Errors surface on the next ``save()``/``wait()`` call rather than being
    swallowed (a silent checkpoint failure is the worst failure).  Call
    ``wait()`` before requeueing on preemption and at the end of training —
    the interrupted-state file must be durable before `scontrol requeue`
    (reference semantics: ddp_utils.py:58-110 saves synchronously).
    """

    def __init__(self) -> None:
        import queue
        import threading

        # Bounded: each queued item holds a full host snapshot (~150 MB for
        # the three-expert VO state).  With a slow disk and a small
        # CHECKPOINT_INTERVAL an unbounded queue grows host memory without
        # backpressure; maxsize=2 makes save() block when the writer falls
        # behind — still far cheaper than the fully synchronous path.
        self._q: "queue.Queue" = queue.Queue(maxsize=2)
        self._errors: list = []
        self._thread = threading.Thread(target=self._drain, daemon=True)
        self._thread.start()

    def _drain(self) -> None:
        while True:
            item = self._q.get()
            if item is None:
                self._q.task_done()
                return
            path, host_tree, metadata = item
            try:
                _write_checkpoint(path, host_tree, metadata)
            except Exception as e:  # surfaced on next save()/wait()
                self._errors.append(e)
            finally:
                self._q.task_done()

    def _raise_pending(self) -> None:
        if self._errors:
            raise RuntimeError(
                f"async checkpoint write failed: {self._errors[0]!r}"
            ) from self._errors.pop(0)

    def save(self, path: str, tree: Any, metadata: Optional[Dict] = None) -> None:
        self._raise_pending()
        host_tree = jax.tree.map(_host_copy, tree)  # owned snapshot (see class doc)
        self._q.put((path, host_tree, metadata))

    def wait(self) -> None:
        """Block until every enqueued checkpoint is durably on disk."""
        self._q.join()
        self._raise_pending()

    def drain_quietly(self) -> Optional[Exception]:
        """wait(), but return (not raise) any deferred write error.

        For the preemption path: a failed *periodic* checkpoint from an
        earlier epoch must not prevent saving the interrupted state and
        requeueing the job — the interrupted state is the one that matters
        for resumption.  Returns the first deferred error (if any) so the
        caller can log it.
        """
        self._q.join()
        if self._errors:
            return self._errors.pop(0)
        return None

    def close(self) -> None:
        self.wait()
        self._q.put(None)
        self._thread.join()

    def __enter__(self) -> "AsyncCheckpointWriter":
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        if exc_type is None:
            self.close()  # surface any deferred write error
        else:
            # already unwinding: drain what's queued so completed epochs'
            # checkpoints still land, but don't mask the in-flight exception
            self.drain_quietly()
            self._q.put(None)
            self._thread.join()


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
