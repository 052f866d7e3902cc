"""Classical (non-learned) VO backend — the paper's baseline comparison.

The reference ships the geometry for an essential-matrix / rigid-alignment
classical VO (``utils/geometry_utils.py:220-274`` Kabsch, :831-865 essential
matrix) but its runtime dispatch raises ``NotImplementedError`` for any
``VO.VO_TYPE`` other than ``REGRESS`` (base_trainer_with_vo.py:311-313); the
paper's learned-vs-classical table was produced offline.  Here the classical
estimator is a first-class backend: :func:`make_classical_vo_fn` returns a
``vo_fn(prev_obs, new_obs, actions, infos) -> (delta, std)`` that plugs into
the same hook the Evaluator/DDPPOTrainer already expose, so the comparison
is reproducible end to end (``VO.VO_TYPE: CLASSICAL`` in the eval config).

Method: ORB keypoints matched between the previous and current rgb frames
are unprojected through their depth maps to 3D camera-frame point sets; the
relative pose is the least-squares rigid transform between them
(depth-scaled 3D-3D alignment — no essential-matrix scale ambiguity).  The
SVD alignment is the repo's JAX Kabsch (:func:`ops.classical_vo.
rigid_transform_3d`); feature detection/matching are inherently
data-dependent host work and stay on the CPU (cv2), exactly like the
reference's RANSAC helpers.  When matching fails (textureless view, too few
inliers) the estimate falls back to the commanded action's nominal motion —
the dead-reckoning prior the paper's baseline also degrades to.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from pointnav_vo_tpu.common import MOVE_FORWARD, TURN_LEFT, TURN_RIGHT


def unproject_depth(
    pix: np.ndarray,
    depth_norm: np.ndarray,
    hfov_deg: float,
    min_depth: float,
    max_depth: float,
) -> np.ndarray:
    """Pinhole unprojection of pixel coords through a normalized depth map.

    pix: [N, 2] (x, y) pixel coordinates; depth_norm: [H, W] in [0, 1]
    (habitat's normalized depth; meters = min + v * (max - min)).
    Returns [3, N] camera-frame points (x right, y down, z BACKWARD — the
    camera looks along -z, habitat convention).
    """
    h, w = depth_norm.shape
    fx = (w / 2.0) / np.tan(np.radians(hfov_deg) / 2.0)
    # square pixels: fy == fx (the reference renders with vfov derived from
    # hfov and the aspect ratio)
    xs = pix[:, 0].astype(np.int64).clip(0, w - 1)
    ys = pix[:, 1].astype(np.int64).clip(0, h - 1)
    z = min_depth + depth_norm[ys, xs] * (max_depth - min_depth)
    x = (pix[:, 0] - w / 2.0) / fx * z
    y = (pix[:, 1] - h / 2.0) / fx * z
    # camera looks -z: a point at depth z sits at z_cam = -z; x right stays,
    # y flips (pixel y grows downward, world y grows up)
    return np.stack([x, -y, -z], axis=0)


def delta_from_matches(pts_prev: np.ndarray, pts_cur: np.ndarray) -> np.ndarray:
    """[dx, dz, dyaw] of the current camera pose in the previous camera's
    frame from matched 3D point sets ([3, N] each, same physical points).

    World-fixed points satisfy p_prev = R_rel @ p_cur + t_rel where
    (R_rel, t_rel) place the current camera in the previous frame — so one
    Kabsch solve (ops/classical_vo.rigid_transform_3d, the reference's
    rigid_transform_3D geometry_utils.py:220-274) gives the pose; dyaw reads
    off the y-rotation component.
    """
    from pointnav_vo_tpu.ops.classical_vo import rigid_transform_3d

    r, t = rigid_transform_3d(pts_cur, pts_prev)
    r = np.asarray(r)
    t = np.asarray(t)
    dyaw = float(np.arctan2(r[0, 2], r[0, 0]))
    return np.asarray([t[0], t[2], dyaw], np.float32)


def action_prior(
    action: int, forward_step: float = 0.25, turn_angle_deg: float = 30.0
) -> np.ndarray:
    """Nominal motion of the commanded action — the fallback estimate when
    feature matching fails (and the trivial dead-reckoning baseline)."""
    if action == MOVE_FORWARD:
        return np.asarray([0.0, -forward_step, 0.0], np.float32)
    if action == TURN_LEFT:
        return np.asarray([0.0, 0.0, np.radians(turn_angle_deg)], np.float32)
    if action == TURN_RIGHT:
        return np.asarray([0.0, 0.0, -np.radians(turn_angle_deg)], np.float32)
    return np.zeros(3, np.float32)


def _match_orb(prev_rgb: np.ndarray, cur_rgb: np.ndarray,
               n_features: int, ratio: float):
    import cv2

    orb = cv2.ORB_create(nfeatures=n_features)
    g0 = cv2.cvtColor(prev_rgb.astype(np.uint8), cv2.COLOR_RGB2GRAY)
    g1 = cv2.cvtColor(cur_rgb.astype(np.uint8), cv2.COLOR_RGB2GRAY)
    k0, d0 = orb.detectAndCompute(g0, None)
    k1, d1 = orb.detectAndCompute(g1, None)
    if d0 is None or d1 is None or len(k0) < 8 or len(k1) < 8:
        return None
    matcher = cv2.BFMatcher(cv2.NORM_HAMMING)
    knn = matcher.knnMatch(d0, d1, k=2)
    good = [m for pair in knn if len(pair) == 2
            for m, n in [pair] if m.distance < ratio * n.distance]
    if len(good) < 8:
        return None
    p0 = np.asarray([k0[m.queryIdx].pt for m in good], np.float64)
    p1 = np.asarray([k1[m.trainIdx].pt for m in good], np.float64)
    return p0, p1


def make_classical_vo_fn(
    hfov_deg: float = 70.0,
    min_depth: float = 0.1,
    max_depth: float = 10.0,
    forward_step: float = 0.25,
    turn_angle_deg: float = 30.0,
    n_features: int = 500,
    ratio: float = 0.75,
    max_residual: float = 0.25,
):
    """Build the classical vo_fn for the Evaluator/trainer ``vo_fn`` hook.

    ``max_residual``: mean 3D alignment residual (meters) above which the
    match set is declared unreliable and the action prior is used instead
    (the RANSAC-style gate of the reference's essential-matrix helper,
    geometry_utils.py:831-865, adapted to the 3D-3D formulation).
    Returns (delta [N, 3], std [N, 3]) — std is the per-axis residual-based
    uncertainty (0 on prior fallback).
    """

    def vo_fn(prev_obs: Dict, new_obs: Dict, actions, infos) -> Tuple:
        import jax.numpy as jnp

        prev_rgb = np.asarray(prev_obs["rgb"])
        cur_rgb = np.asarray(new_obs["rgb"])
        prev_depth = np.asarray(prev_obs["depth"])[..., 0]
        cur_depth = np.asarray(new_obs["depth"])[..., 0]
        acts = np.asarray(actions).reshape(-1)
        n = prev_rgb.shape[0]
        deltas = np.zeros((n, 3), np.float32)
        stds = np.zeros((n, 3), np.float32)
        for i in range(n):
            est: Optional[np.ndarray] = None
            matched = _match_orb(prev_rgb[i], cur_rgb[i], n_features, ratio)
            if matched is not None:
                from pointnav_vo_tpu.ops.classical_vo import rigid_transform_3d

                p0, p1 = matched
                pts_prev = unproject_depth(p0, prev_depth[i], hfov_deg,
                                           min_depth, max_depth)
                pts_cur = unproject_depth(p1, cur_depth[i], hfov_deg,
                                          min_depth, max_depth)
                r, t = (np.asarray(a) for a in
                        rigid_transform_3d(pts_cur, pts_prev))
                cand = np.asarray(
                    [t[0], t[2], np.arctan2(r[0, 2], r[0, 0])], np.float32)
                # alignment residual gate (the RANSAC-style acceptance of the
                # reference's essential-matrix helper, adapted to 3D-3D)
                resid = r @ pts_cur + t[:, None] - pts_prev
                mean_resid = float(np.linalg.norm(resid, axis=0).mean())
                if mean_resid <= max_residual and np.isfinite(cand).all():
                    est = cand
                    stds[i] = np.abs(resid).mean(axis=1)
            if est is None:
                est = action_prior(int(acts[i]), forward_step, turn_angle_deg)
            deltas[i] = est
        return jnp.asarray(deltas), jnp.asarray(stds)

    return vo_fn
