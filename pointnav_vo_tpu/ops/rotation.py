"""Rotation representation conversions (quaternion / matrix / euler / 6d).

Counterpart of the reference's vendored pytorch3d ``utils/rotation_utils.py``
(:39-593) — the main VO path consumes only ``matrix_to_euler_angles``
(geometry_utils.py:787), the rest support the paper's classical-VO baselines.
Pure JAX, batched over leading dims.  Quaternions here are **[x, y, z, w]**
(the package-wide habitat convention; pytorch3d uses wxyz — converted at the
boundary if ever needed).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quaternion_to_matrix(q: jax.Array) -> jax.Array:
    """[..., 4] (xyzw) -> [..., 3, 3]."""
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    n = x * x + y * y + z * z + w * w
    s = 2.0 / jnp.maximum(n, 1e-30)
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    m = jnp.stack(
        [
            1.0 - (yy + zz), xy - wz, xz + wy,
            xy + wz, 1.0 - (xx + zz), yz - wx,
            xz - wy, yz + wx, 1.0 - (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quaternion(m: jax.Array) -> jax.Array:
    """[..., 3, 3] -> [..., 4] (xyzw). Shepperd's method: build all four
    candidate quaternions and select the numerically dominant one per element
    (branch-free; a per-component copysign shortcut is only valid when w
    dominates)."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tw = 1.0 + m00 + m11 + m22
    tx = 1.0 + m00 - m11 - m22
    ty = 1.0 - m00 + m11 - m22
    tz = 1.0 - m00 - m11 + m22

    def safe_sqrt(v):
        return jnp.sqrt(jnp.maximum(v, 1e-30))

    # candidate quaternions, each scaled by 2*sqrt(dominant trace combination)
    cand = jnp.stack(
        [
            jnp.stack([tx, m10 + m01, m02 + m20, m21 - m12], -1),
            jnp.stack([m10 + m01, ty, m21 + m12, m02 - m20], -1),
            jnp.stack([m02 + m20, m21 + m12, tz, m10 - m01], -1),
            jnp.stack([m21 - m12, m02 - m20, m10 - m01, tw], -1),
        ],
        axis=-2,
    )  # [..., case, xyzw] where case i has dominant component i
    mags = jnp.stack([tx, ty, tz, tw], -1)
    case = jnp.argmax(mags, axis=-1)
    denom = 2.0 * safe_sqrt(jnp.take_along_axis(mags, case[..., None], -1))
    q = jnp.take_along_axis(cand, case[..., None, None], axis=-2)[..., 0, :] / denom
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


_AXIS_IDX = {"X": 0, "Y": 1, "Z": 2}


def _axis_angle_matrix(axis: str, angle: jax.Array) -> jax.Array:
    c, s = jnp.cos(angle), jnp.sin(angle)
    one, zero = jnp.ones_like(angle), jnp.zeros_like(angle)
    if axis == "X":
        rows = [one, zero, zero, zero, c, -s, zero, s, c]
    elif axis == "Y":
        rows = [c, zero, s, zero, one, zero, -s, zero, c]
    else:
        rows = [c, -s, zero, s, c, zero, zero, zero, one]
    return jnp.stack(rows, axis=-1).reshape(angle.shape + (3, 3))


def euler_angles_to_matrix(euler: jax.Array, convention: str = "XYZ") -> jax.Array:
    """[..., 3] -> [..., 3, 3] (pytorch3d extrinsic-compose semantics:
    R = R(c0, e0) @ R(c1, e1) @ R(c2, e2))."""
    ms = [
        _axis_angle_matrix(c, euler[..., i]) for i, c in enumerate(convention)
    ]
    return ms[0] @ ms[1] @ ms[2]


def _angle_from_tan(axis: str, other_axis: str, data: jax.Array,
                    horizontal: bool, tait_bryan: bool) -> jax.Array:
    """Extract an outer euler angle from one matrix row/column (the
    pytorch3d parity rules, reference rotation_utils.py vendored code)."""
    i1, i2 = {"X": (2, 1), "Y": (0, 2), "Z": (1, 0)}[axis]
    if horizontal:
        i2, i1 = i1, i2
    even = (axis + other_axis) in ("XY", "YZ", "ZX")
    if horizontal == even:
        return jnp.arctan2(data[..., i1], data[..., i2])
    if tait_bryan:
        return jnp.arctan2(-data[..., i2], data[..., i1])
    return jnp.arctan2(data[..., i2], -data[..., i1])


def matrix_to_euler_angles(m: jax.Array, convention: str = "XYZ") -> jax.Array:
    """[..., 3, 3] -> [..., 3], inverse of :func:`euler_angles_to_matrix`.

    The one conversion the VO path uses (reference geometry_utils.py:787).
    """
    i0, i2 = _AXIS_IDX[convention[0]], _AXIS_IDX[convention[2]]
    tait_bryan = i0 != i2
    if tait_bryan:
        central = jnp.arcsin(
            jnp.clip(m[..., i0, i2] * (-1.0 if (i0 - i2) in (-1, 2) else 1.0), -1, 1)
        )
    else:
        central = jnp.arccos(jnp.clip(m[..., i0, i0], -1, 1))

    o0 = _angle_from_tan(convention[0], convention[1], m[..., i2], False, tait_bryan)
    o2 = _angle_from_tan(convention[2], convention[1], m[..., i0, :], True, tait_bryan)
    return jnp.stack([o0, central, o2], axis=-1)


def axis_angle_to_quaternion(axis_angle: jax.Array) -> jax.Array:
    """[..., 3] rotation vector -> [..., 4] xyzw."""
    angle = jnp.linalg.norm(axis_angle, axis=-1, keepdims=True)
    half = 0.5 * angle
    small = angle < 1e-6
    sinc = jnp.where(small, 0.5 - angle * angle / 48.0, jnp.sin(half) / jnp.maximum(angle, 1e-30))
    xyz = axis_angle * sinc
    w = jnp.cos(half)
    return jnp.concatenate([xyz, w], axis=-1)


def quaternion_to_axis_angle(q: jax.Array) -> jax.Array:
    xyz = q[..., :3]
    w = q[..., 3:4]
    n = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(n, jnp.abs(w))
    sign = jnp.sign(w)
    scale = jnp.where(n < 1e-12, 2.0 * sign, sign * angle / jnp.maximum(n, 1e-30))
    return xyz * scale


def matrix_to_rotation_6d(m: jax.Array) -> jax.Array:
    """[..., 3, 3] -> [..., 6]: first two rows (Zhou et al. continuity rep)."""
    return m[..., :2, :].reshape(m.shape[:-2] + (6,))


def rotation_6d_to_matrix(d6: jax.Array) -> jax.Array:
    a1 = d6[..., :3]
    a2 = d6[..., 3:]
    b1 = a1 / jnp.linalg.norm(a1, axis=-1, keepdims=True)
    b2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = b2 / jnp.linalg.norm(b2, axis=-1, keepdims=True)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)
