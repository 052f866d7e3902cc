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


UNEXPLORED_COLOR = (92, 92, 92)
EXPLORED_COLOR = (222, 222, 222)


class TrajectoryMapRenderer:
    """Incremental top-down trajectory map for eval videos — both backends.

    The reference composites a drawn map (agent sprite, visited path, fog of
    war) next to the rgb frame in its eval videos
    (vis/modified_measurement.py:308-379 drawing, vis/utils.py:32-163 map
    construction, utils/misc_utils.py:199-238 frame assembly).  Its map comes
    from the simulator's pathfinder; here the map is reconstructed from the
    per-step ``agent_pos``/``agent_yaw``/``goal_world`` stream that the
    scripted AND habitat envs both expose, so one renderer serves both.

    Bounds are fixed at episode start from the (start, goal) box plus margin
    (the reference's map is likewise fixed per scene); fog of war is painted
    incrementally — one visibility disk per step, not a per-frame O(pixels x
    path) pass.
    """

    def __init__(self, start, goal, size: int = 256, fog_radius: float = 1.5,
                 margin: float = 2.0):
        self.size = size
        s = np.asarray([start[0], start[-1]], np.float64)
        g = np.asarray([goal[0], goal[-1]], np.float64)
        lo = np.minimum(s, g) - margin
        hi = np.maximum(s, g) + margin
        self.center = (lo + hi) / 2
        extent = float(max(hi[0] - lo[0], hi[1] - lo[1]))
        self.scale = (size - 8) / max(extent, 1e-6)
        self.fog = np.zeros((size, size), bool)
        self._fog_px = max(2, int(round(fog_radius * self.scale)))
        self.traj_px: List[Tuple[int, int]] = []
        self.goal_px = self._to_px(g)
        self.yaw = 0.0

    def _to_px(self, p) -> Tuple[int, int]:
        c = self.size // 2
        x = int(round(c + (p[0] - self.center[0]) * self.scale))
        y = int(round(c + (p[1] - self.center[1]) * self.scale))
        return (int(np.clip(x, 0, self.size - 1)),
                int(np.clip(y, 0, self.size - 1)))

    def add(self, pos, yaw: float) -> None:
        """Record one step: world position [x, (y,) z] + yaw about +y."""
        px = self._to_px(np.asarray([pos[0], pos[-1]], np.float64))
        self.traj_px.append(px)
        self.yaw = float(yaw)
        # reveal a visibility disk around the agent (fog of war)
        r = self._fog_px
        x, y = px
        x0, x1 = max(0, x - r), min(self.size, x + r + 1)
        y0, y1 = max(0, y - r), min(self.size, y + r + 1)
        yy, xx = np.mgrid[y0:y1, x0:x1]
        self.fog[y0:y1, x0:x1] |= (xx - x) ** 2 + (yy - y) ** 2 <= r * r

    def render(self) -> np.ndarray:
        size = self.size
        img = np.empty((size, size, 3), np.uint8)
        img[...] = UNEXPLORED_COLOR
        img[self.fog] = EXPLORED_COLOR

        pts = self.traj_px
        for (x0, y0), (x1, y1) in zip(pts[:-1], pts[1:]):
            n = max(abs(x1 - x0), abs(y1 - y0), 1)
            for t in np.linspace(0, 1, 2 * n + 1):
                x = int(round(x0 + t * (x1 - x0)))
                y = int(round(y0 + t * (y1 - y0)))
                img[y, x] = PATH_COLOR

        yy, xx = np.mgrid[0:size, 0:size]
        gx, gy = self.goal_px
        img[(xx - gx) ** 2 + (yy - gy) ** 2 <= 16] = GOAL_COLOR

        if pts:
            # oriented agent triangle: habitat convention, forward = -z ->
            # world heading (-sin yaw, -cos yaw) (the reference rotates its
            # agent sprite by the same yaw, modified_measurement.py:360-372)
            ax, ay = pts[-1]
            hx, hz = -np.sin(self.yaw), -np.cos(self.yaw)
            tip = np.asarray([ax + 6 * hx, ay + 6 * hz])
            left = np.asarray([ax - 3 * hx - 3 * hz, ay - 3 * hz + 3 * hx])
            right = np.asarray([ax - 3 * hx + 3 * hz, ay - 3 * hz - 3 * hx])
            tri = np.stack([tip, left, right])
            # point-in-triangle via sign tests on a local window
            x0 = int(max(0, tri[:, 0].min() - 1)); x1 = int(min(size, tri[:, 0].max() + 2))
            y0 = int(max(0, tri[:, 1].min() - 1)); y1 = int(min(size, tri[:, 1].max() + 2))
            if x1 > x0 and y1 > y0:
                wy, wx = np.mgrid[y0:y1, x0:x1]
                def edge(a, b):
                    return ((b[0] - a[0]) * (wy - a[1])
                            - (b[1] - a[1]) * (wx - a[0]))
                e0, e1, e2 = edge(tri[0], tri[1]), edge(tri[1], tri[2]), edge(tri[2], tri[0])
                inside = ((e0 >= 0) & (e1 >= 0) & (e2 >= 0)) | (
                    (e0 <= 0) & (e1 <= 0) & (e2 <= 0))
                img[y0:y1, x0:x1][inside] = AGENT_COLOR
        return img


def compose_map_frame(rgb: np.ndarray, map_img: np.ndarray) -> np.ndarray:
    """Composite [rgb | top-down map] side by side — the reference's eval
    video frame layout (misc_utils.py:199-238).  The map is nearest-neighbor
    resized to the rgb height."""
    h = rgb.shape[0]
    src = map_img.shape[0]
    idx = (np.arange(h) * src) // h
    resized = map_img[idx][:, (np.arange(h) * map_img.shape[1]) // h]
    sep = np.full((h, 2, 3), 255, np.uint8)
    return np.concatenate([rgb.astype(np.uint8), sep, resized], axis=1)


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
