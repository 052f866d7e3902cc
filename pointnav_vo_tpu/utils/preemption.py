"""Preemption / elastic-recovery lifecycle.

Counterpart of ``rl/ddppo/algo/ddp_utils.py:15-111`` mapped to the TPU
setting: SIGINT/SIGTERM/SIGUSR2 request a clean exit, SIGUSR1 requests a
requeue; training loops poll :func:`should_exit` each update, save a full
interrupted state (orbax/flax checkpoint + config + progress counters) and
call ``scontrol requeue`` under SLURM.  Checkpoint writes are atomic
(io/checkpoint.py uses write-to-temp + rename), so a preemption mid-save
never corrupts the resume state.
"""

from __future__ import annotations

import os
import signal
import subprocess
import threading
from typing import Any, Dict, Optional

EXIT = threading.Event()
REQUEUE = threading.Event()

INTERRUPTED_STATE_DIR = os.environ.get(
    "POINTNAV_VO_INTERRUPTED_DIR", os.path.expanduser("~/.interrupted_states")
)


def _clean_exit(signum, frame):
    EXIT.set()


def _requeue(signum, frame):
    EXIT.set()
    REQUEUE.set()


def install_signal_handlers() -> None:
    signal.signal(signal.SIGINT, _clean_exit)
    signal.signal(signal.SIGTERM, _clean_exit)
    if hasattr(signal, "SIGUSR2"):
        signal.signal(signal.SIGUSR2, _clean_exit)
    if hasattr(signal, "SIGUSR1"):
        signal.signal(signal.SIGUSR1, _requeue)


def should_exit() -> bool:
    return EXIT.is_set()


def interrupted_state_path() -> str:
    job = os.environ.get("SLURM_JOB_ID", "local")
    return os.path.join(INTERRUPTED_STATE_DIR, f"{job}.pkl")


def save_interrupted_state(tree: Any, metadata: Optional[Dict] = None) -> str:
    from pointnav_vo_tpu.io.checkpoint import save_checkpoint

    path = interrupted_state_path()
    save_checkpoint(path, tree, metadata)
    return path


def load_interrupted_state(target: Any = None):
    from pointnav_vo_tpu.io.checkpoint import load_checkpoint

    path = interrupted_state_path()
    if not os.path.isfile(path):
        return None
    return load_checkpoint(path, target)


def requeue_job() -> None:
    """`scontrol requeue` under SLURM (ddp_utils.py:97-110); no-op otherwise."""
    if not REQUEUE.is_set():
        return
    job = os.environ.get("SLURM_JOB_ID")
    if job and os.environ.get("SLURM_PROCID", "0") == "0":
        subprocess.run(["scontrol", "requeue", job], check=False)


def reset_for_tests() -> None:
    EXIT.clear()
    REQUEUE.clear()
