"""SE(2)/quaternion geometry for VO dead-reckoning — pure JAX, batched, jittable.

Re-implements the math of the reference's ``pointnav_vo/utils/geometry_utils.py``
(quaternion delta poses at :33-55, global-state integration at :69-99, goal
propagation at :115-144, polar inversion at :147-183) as vectorized JAX
functions.  All functions accept arbitrary leading batch dimensions and are
safe to call inside ``jax.jit`` — this is what lets the per-env Python goal
update loop of the reference (``rl/ppo/ppo_trainer.py:206-239``) collapse into
one fused device call over all envs.

Conventions (identical to Habitat / the reference):
- quaternions are ``[..., 4]`` arrays in **[x, y, z, w]** order;
- positions are ``[..., 3]`` arrays ``[x, y, z]`` with -z forward, +y up;
- a local SE(2) delta is ``[..., 3]`` = ``[dx, dz, dyaw]`` where dyaw is a
  rotation about +y.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# --------------------------------------------------------------------------
# quaternion primitives  ([x, y, z, w] layout)
# --------------------------------------------------------------------------


def quat_multiply(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Hamilton product q1 * q2 for [x, y, z, w] quaternions."""
    x1, y1, z1, w1 = jnp.moveaxis(q1, -1, 0)
    x2, y2, z2, w2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def quat_conjugate(q: jax.Array) -> jax.Array:
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_inverse(q: jax.Array) -> jax.Array:
    """Inverse of a (possibly non-unit) quaternion."""
    sq = jnp.sum(q * q, axis=-1, keepdims=True)
    return quat_conjugate(q) / jnp.maximum(sq, 1e-30)


def quat_rotate_vector(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector(s) v by quaternion(s) q: v' = q v q^{-1}.

    Uses the expanded Rodrigues form (two cross products) — cheaper than two
    Hamilton products and exactly equivalent for unit quaternions.
    """
    xyz = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(xyz, v)
    return v + w * t + jnp.cross(xyz, t)


def quat_from_yaw(dyaw: jax.Array) -> jax.Array:
    """Quaternion for a rotation of `dyaw` radians about +y ([x,y,z,w]).

    Matches `quat_from_angle_axis(theta, [0,1,0])` in the reference
    (geometry_utils.py:58-66).
    """
    half = 0.5 * dyaw
    z = jnp.zeros_like(dyaw)
    return jnp.stack([z, jnp.sin(half), z, jnp.cos(half)], axis=-1)


def yaw_from_quat(q: jax.Array) -> jax.Array:
    """Extract yaw via `2 * arctan2(q_y, q_w)`.

    This is exactly how the reference's dataset derives the regression target
    (regression_geo_invariance_iter_dataset.py:277-285).
    """
    return 2.0 * jnp.arctan2(q[..., 1], q[..., 3])


# --------------------------------------------------------------------------
# SE(3)/SE(2) state deltas
# --------------------------------------------------------------------------


def agent_state_target2ref(
    ref_rot: jax.Array, ref_pos: jax.Array, tgt_rot: jax.Array, tgt_pos: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Express the target agent state in the reference agent's local frame.

    delta_rot = ref_rot^{-1} * tgt_rot
    delta_pos = ref_rot^{-1} . (tgt_pos - ref_pos)

    Mirror of `modified_agent_state_target2ref` (geometry_utils.py:33-55).
    """
    inv_ref = quat_inverse(ref_rot)
    delta_rot = quat_multiply(inv_ref, tgt_rot)
    delta_pos = quat_rotate_vector(inv_ref, tgt_pos - ref_pos)
    return delta_rot, delta_pos


def delta_state_from_poses(
    ref_rot: jax.Array, ref_pos: jax.Array, tgt_rot: jax.Array, tgt_pos: jax.Array
) -> jax.Array:
    """[dx, dz, dyaw] regression target from two global poses.

    Combines `modified_agent_state_target2ref` with the dataset's
    delta extraction (delta_pos -> (x, z), delta_rot -> 2*atan2(qy, qw)).
    """
    delta_rot, delta_pos = agent_state_target2ref(ref_rot, ref_pos, tgt_rot, tgt_pos)
    return jnp.stack(
        [delta_pos[..., 0], delta_pos[..., 2], yaw_from_quat(delta_rot)], axis=-1
    )


def compute_global_state(
    prev_rot: jax.Array, prev_pos: jax.Array, delta: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Integrate a local [dx, dz, dyaw] delta into a global pose.

    v2 = v1 + q1 . [dx, 0, dz];  q2 = q1 * quat_from_yaw(dyaw)
    Mirror of `compute_global_state` (geometry_utils.py:69-99).
    """
    dx = delta[..., 0]
    dz = delta[..., 1]
    dyaw = delta[..., 2]
    local_pos = jnp.stack([dx, jnp.zeros_like(dx), dz], axis=-1)
    cur_pos = prev_pos + quat_rotate_vector(prev_rot, local_pos)
    cur_rot = quat_multiply(prev_rot, quat_from_yaw(dyaw))
    return cur_rot, cur_pos


def cartesian_to_polar(x: jax.Array, y: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(rho, phi) with phi = atan2(y, x) — habitat's convention."""
    return jnp.sqrt(x * x + y * y), jnp.arctan2(y, x)


def compute_goal_pos(prev_goal: jax.Array, delta: jax.Array) -> dict:
    """Propagate a point-goal (cartesian, agent-local) through an SE(2) delta.

    g' = q_dyaw^{-1} . (g - [dx, 0, dz]);   polar = [rho, -phi] with
    (rho, phi) = cartesian_to_polar(-g'_z, g'_x).

    Mirror of `compute_goal_pos` (geometry_utils.py:115-144) — the single
    most important function for VO-based navigation: it keeps the goal
    estimate alive without GPS by dead-reckoning through VO deltas.
    """
    dx = delta[..., 0]
    dz = delta[..., 1]
    dyaw = delta[..., 2]
    local_pos = jnp.stack([dx, jnp.zeros_like(dx), dz], axis=-1)
    cur_goal = quat_rotate_vector(quat_inverse(quat_from_yaw(dyaw)), prev_goal - local_pos)
    rho, phi = cartesian_to_polar(-cur_goal[..., 2], cur_goal[..., 0])
    return {"cartesian": cur_goal, "polar": jnp.stack([rho, -phi], axis=-1)}


def pointgoal_polar2cartesian(polar: jax.Array) -> jax.Array:
    """Invert habitat's pointgoal polar encoding back to agent-local cartesian.

    The sensor emits [rho, -phi] with (rho, phi) = cartesian_to_polar(-z, x),
    so x = rho*sin(phi), z = -rho*cos(phi).  Closed form of the reference's
    `pointgoal_polar2catesian` (geometry_utils.py:147-183) without its
    tan-based singularity at phi == 0.
    """
    rho = polar[..., 0]
    phi = -polar[..., 1]
    x = rho * jnp.sin(phi)
    z = -rho * jnp.cos(phi)
    return jnp.stack([x, jnp.zeros_like(x), z], axis=-1)


def get_polar_angle(rot: jax.Array) -> jax.Array:
    """Agent heading in map coordinates (geometry_utils.py:102-112)."""
    heading = quat_rotate_vector(
        quat_inverse(rot), jnp.asarray([0.0, 0.0, -1.0], dtype=rot.dtype)
    )
    _, phi = cartesian_to_polar(-heading[..., 2], heading[..., 0])
    return phi - jnp.pi / 2.0
