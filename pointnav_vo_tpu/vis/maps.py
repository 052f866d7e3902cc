"""Trajectory/map visualization + video generation.

Counterpart of the reference's vis stack (``vis/utils.py:32-210`` top-down map
drawing, ``utils/misc_utils.py:199-238`` generate_video, and the
ModifiedTopDownMap measure's drawn map).  The scripted world is a circular
room, so the map renders analytically; with habitat attached, its own
top-down-map measure plugs into the same ``generate_video`` sink.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

AGENT_COLOR = (40, 80, 220)
GOAL_COLOR = (30, 180, 60)
PATH_COLOR = (220, 120, 40)
WALL_COLOR = (60, 60, 60)


def draw_top_down_map(
    trajectory: Sequence[Tuple[float, float]],
    goal: Tuple[float, float],
    room_radius: float,
    size: int = 256,
) -> np.ndarray:
    """Render a trajectory in the circular scripted world to an RGB image."""
    img = np.full((size, size, 3), 255, np.uint8)
    scale = (size / 2 - 4) / room_radius
    c = size // 2

    def to_px(p):
        return int(c + p[0] * scale), int(c + p[1] * scale)

    yy, xx = np.mgrid[0:size, 0:size]
    rr = np.sqrt((xx - c) ** 2 + (yy - c) ** 2)
    ring = np.abs(rr - room_radius * scale) < 1.5
    img[ring] = WALL_COLOR

    pts = [to_px(p) for p in trajectory]
    for (x0, y0), (x1, y1) in zip(pts[:-1], pts[1:]):
        n = max(abs(x1 - x0), abs(y1 - y0), 1)
        for t in np.linspace(0, 1, 2 * n + 1):
            x = int(round(x0 + t * (x1 - x0)))
            y = int(round(y0 + t * (y1 - y0)))
            if 0 <= x < size and 0 <= y < size:
                img[y, x] = PATH_COLOR

    for p, color, r in ((goal, GOAL_COLOR, 4), (trajectory[-1], AGENT_COLOR, 3)):
        x, y = to_px(p)
        disk = (xx - x) ** 2 + (yy - y) ** 2 <= r * r
        img[disk] = color
    return img


def generate_video(
    frames: List[np.ndarray],
    video_dir: Optional[str],
    video_name: str,
    fps: int = 10,
    tb_writer=None,
    tb_step: int = 0,
) -> Optional[str]:
    """Write frames to disk (mp4 via cv2) and/or TensorBoard
    (misc_utils.py:199-238 semantics: empty video_dir -> TB only)."""
    path = None
    if video_dir:
        import cv2

        os.makedirs(video_dir, exist_ok=True)
        path = os.path.join(video_dir, f"{video_name}.mp4")
        h, w = frames[0].shape[:2]
        writer = cv2.VideoWriter(
            path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
        )
        for f in frames:
            writer.write(np.ascontiguousarray(f[..., ::-1].astype(np.uint8)))
        writer.release()
    if tb_writer is not None:
        tb_writer.add_video_from_np_images(
            f"video/{video_name}", tb_step, [f.astype(np.uint8) for f in frames], fps=fps
        )
    return path


def save_ranked_error_images(
    records: List[dict],
    out_dir: str,
    top_k: int = 20,
    key: str = "vo_l2",
) -> List[str]:
    """Dump the worst-k prediction contexts as PNGs + a manifest
    (base_trainer.py:155-291 ranked-error post-processing)."""
    import cv2
    import json

    os.makedirs(out_dir, exist_ok=True)
    ranked = sorted(records, key=lambda r: -r[key])[:top_k]
    paths = []
    manifest = []
    for rank, rec in enumerate(ranked):
        img = np.concatenate([rec["prev_rgb"], rec["cur_rgb"]], axis=1)
        p = os.path.join(out_dir, f"rank{rank:03d}_{key}{rec[key]:.4f}.png")
        cv2.imwrite(p, img[..., ::-1].astype(np.uint8))
        paths.append(p)
        manifest.append({k: float(v) if np.isscalar(v) else None
                         for k, v in rec.items() if k not in ("prev_rgb", "cur_rgb")}
                        | {key: float(rec[key]), "path": p})
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return paths
