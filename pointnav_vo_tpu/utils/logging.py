"""Observability: TensorBoard wrapper, info-dict store, timing, logger.

Counterpart of the reference's ``utils/tensorboard_utils.py:14-64`` (null-
object TB writer), the joblib/LZ4 append-merge pickle metric store
(``vo_cnn_engine._save_dict`` :302-314, ``base_trainer._save_info_dict``
:427-439), and the wall-clock step-phase accounting (SURVEY.md §5.1).
On TPU the deep profiler is ``jax.profiler`` (see :func:`trace`).
"""

from __future__ import annotations

import contextlib
import json
import logging
import os
import pickle
import time
from typing import Any, Dict, Optional

import numpy as np


def get_logger(name: str = "pointnav_vo_tpu", log_file: Optional[str] = None) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        logger.setLevel(logging.INFO)
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter("%(asctime)s %(levelname)s %(message)s"))
        logger.addHandler(h)
    if log_file:
        os.makedirs(os.path.dirname(log_file) or ".", exist_ok=True)
        fh = logging.FileHandler(log_file)
        fh.setFormatter(logging.Formatter("%(asctime)s %(levelname)s %(message)s"))
        logger.addHandler(fh)
    return logger


class TensorboardWriter:
    """Null-object TB writer: no log dir (or no tensorboardX) -> no-ops."""

    def __init__(self, log_dir: Optional[str], flush_secs: int = 30):
        self.writer = None
        if log_dir:
            try:
                from tensorboardX import SummaryWriter

                os.makedirs(log_dir, exist_ok=True)
                self.writer = SummaryWriter(log_dir, flush_secs=flush_secs)
            except ImportError:
                pass

    def __enter__(self):
        return self

    def __exit__(self, *a):
        if self.writer:
            self.writer.close()

    def __getattr__(self, item):
        if self.writer:
            return getattr(self.writer, item)
        return lambda *a, **k: None

    def add_video_from_np_images(self, name, step, images, fps=10):
        if not self.writer:
            return
        frames = np.stack(images)[None].transpose(0, 1, 4, 2, 3)
        self.writer.add_video(name, frames, global_step=step, fps=fps)


def save_info_dict(info: Dict[str, Any], path: str) -> None:
    """Append-merge pickle store: repeated calls extend list-valued keys."""
    merged = info
    if os.path.isfile(path):
        with open(path, "rb") as f:
            merged = pickle.load(f)
        for k, v in info.items():
            if k in merged and isinstance(merged[k], list):
                merged[k].extend(v if isinstance(v, list) else [v])
            else:
                merged[k] = v
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(merged, f)


def append_jsonl(record: Dict[str, Any], path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "a") as f:
        f.write(json.dumps(record, default=float) + "\n")


class Timing(dict):
    """Accumulating phase timer: ``with timing.span('env'): ...``"""

    @contextlib.contextmanager
    def span(self, key: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self[key] = self.get(key, 0.0) + time.perf_counter() - t0


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """jax.profiler trace scope (replaces CUDA_LAUNCH_BLOCKING timing)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def update_config_log(config, run_type: str, log_dir: str):
    """Create LOG/INFO/CKPT/TB/VIDEO dirs and point the config at them
    (reference utils/config_utils.py:7-22)."""
    config.defrost()
    config.LOG_DIR = log_dir
    config.LOG_FILE = os.path.join(log_dir, f"{run_type}.log")
    config.INFO_DIR = os.path.join(log_dir, "infos")
    config.CHECKPOINT_FOLDER = os.path.join(log_dir, "checkpoints")
    config.TENSORBOARD_DIR = os.path.join(log_dir, "tb")
    config.VIDEO_DIR = os.path.join(log_dir, "videos")
    for d in (config.LOG_DIR, config.INFO_DIR, config.CHECKPOINT_FOLDER,
              config.TENSORBOARD_DIR, config.VIDEO_DIR):
        os.makedirs(d, exist_ok=True)
    config.freeze()
    return config
