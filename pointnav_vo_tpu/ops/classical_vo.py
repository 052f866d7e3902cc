"""Classical-VO support ops: Kabsch alignment + relative transforms.

Counterpart of the reference's classical-baseline support code
(``utils/geometry_utils.py:220-274`` rigid_transform_3D, :740-792 relative
transforms, :831-865 essential-matrix pose).  The SVD alignment and relative
transforms are pure JAX; the essential-matrix path wraps OpenCV's RANSAC on
the host (import-gated) since it is inherently data-dependent CPU search.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from pointnav_vo_tpu.ops.rotation import matrix_to_euler_angles


def rigid_transform_3d(a: jax.Array, b: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Least-squares rigid transform R, t with b ~ R @ a + t (Kabsch).

    a, b: [3, N] point sets.  Reflections are corrected by flipping the last
    singular direction (reference geometry_utils.py:263-272).
    """
    ca = jnp.mean(a, axis=1, keepdims=True)
    cb = jnp.mean(b, axis=1, keepdims=True)
    h = (a - ca) @ (b - cb).T
    u, _s, vt = jnp.linalg.svd(h)
    d = jnp.sign(jnp.linalg.det(vt.T @ u.T))
    flip = jnp.diag(jnp.asarray([1.0, 1.0, 1.0])).at[2, 2].set(d)
    r = vt.T @ flip @ u.T
    t = -r @ ca + cb
    return r, t[:, 0]


def get_relative_transform(transform1: jax.Array, transform2: jax.Array):
    """Relative transform between two [3|4, 4] poses:
    [R_12 | t_12] = [R1^-1 R2 | R1^-1 (t2 - t1)] with euler angles
    (reference geometry_utils.py:740-759)."""
    r1, t1 = transform1[:3, :3], transform1[:3, 3]
    r2, t2 = transform2[:3, :3], transform2[:3, 3]
    rel_r = r1.T @ r2
    rel_t = r1.T @ (t2 - t1)
    rel_euler = matrix_to_euler_angles(rel_r, "XYZ")
    return rel_euler, rel_t, rel_r


def validate_rot_mat(r: jax.Array, eps: float = 1e-6) -> jax.Array:
    ortho = jnp.linalg.norm(jnp.eye(3) - r.T @ r) < eps
    posdet = jnp.abs(jnp.linalg.det(r) - 1.0) < eps
    return ortho & posdet


def estimate_pose_by_essential_mat(
    kpts0, kpts1, intrinsics, thresh: float = 1.0, conf: float = 0.99999
) -> Optional[list]:
    """RANSAC essential-matrix pose from keypoint matches (host-side cv2,
    reference geometry_utils.py:831-865)."""
    import numpy as np

    if kpts0.shape[0] < 5:
        return None
    import cv2

    e, mask = cv2.findEssentialMat(
        np.asarray(kpts0, np.float32), np.asarray(kpts1, np.float32),
        np.asarray(intrinsics, np.float64), threshold=thresh, prob=conf,
        method=cv2.RANSAC,
    )
    if e is None:
        return None
    best = []
    best_inliers = 0
    for chunk in np.split(e, e.shape[0] // 3):
        n, r, t, m = cv2.recoverPose(
            chunk, np.asarray(kpts0, np.float32), np.asarray(kpts1, np.float32),
            np.asarray(intrinsics, np.float64), mask=mask.copy(),
        )
        if n > best_inliers:
            best_inliers = n
            best = [(n, r, t[:, 0], m)]
        elif n == best_inliers:
            best.append((n, r, t[:, 0], m))
    return best


def rel_pose_coord_to_camera_change(r_cur_rel_prev: jax.Array, t_cur_rel_prev: jax.Array):
    """Coordinate-basis change -> camera motion (geometry_utils.py:868-883)."""
    r = r_cur_rel_prev.T
    t = -r @ t_cur_rel_prev.reshape(3, 1)
    return r, t
