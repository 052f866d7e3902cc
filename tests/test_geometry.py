"""Golden-value tests for ops.geometry against scipy.spatial.transform.

Covers the reference invariants listed in SURVEY.md §4: target2ref /
compute_global_state / compute_goal_pos round-trips and the polar inversion.
"""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

import jax.numpy as jnp

from pointnav_vo_tpu.ops import geometry as geo


def _rand_quat(rng, n=()):
    q = rng.normal(size=n + (4,))
    return (q / np.linalg.norm(q, axis=-1, keepdims=True)).astype(np.float64)


def test_quat_multiply_and_rotate_match_scipy():
    rng = np.random.default_rng(0)
    q1 = _rand_quat(rng, (32,))
    q2 = _rand_quat(rng, (32,))
    v = rng.normal(size=(32, 3))

    got_mul = np.asarray(geo.quat_multiply(jnp.asarray(q1), jnp.asarray(q2)))
    want_mul = (R.from_quat(q1) * R.from_quat(q2)).as_quat()
    # quaternion double cover: q and -q are the same rotation
    sign = np.sign(np.sum(got_mul * want_mul, axis=-1, keepdims=True))
    np.testing.assert_allclose(got_mul, sign * want_mul, atol=1e-6)

    got_rot = np.asarray(geo.quat_rotate_vector(jnp.asarray(q1), jnp.asarray(v)))
    want_rot = R.from_quat(q1).apply(v)
    np.testing.assert_allclose(got_rot, want_rot, atol=1e-6)


def test_target2ref_then_integrate_roundtrip():
    """target2ref -> (dx, dz, dyaw) -> compute_global_state recovers the pose.

    This is the core dead-reckoning consistency the whole system relies on
    (reference: modified_agent_state_target2ref + compute_global_state).
    Restricted to yaw-only rotations, which is the actual navigation setting
    (agent rotates about +y only).
    """
    rng = np.random.default_rng(1)
    n = 64
    yaw_prev = rng.uniform(-np.pi, np.pi, size=n)
    dyaw = rng.uniform(-0.6, 0.6, size=n)
    prev_rot = np.stack(
        [np.zeros(n), np.sin(yaw_prev / 2), np.zeros(n), np.cos(yaw_prev / 2)], axis=-1
    )
    cur_rot_np = np.stack(
        [
            np.zeros(n),
            np.sin((yaw_prev + dyaw) / 2),
            np.zeros(n),
            np.cos((yaw_prev + dyaw) / 2),
        ],
        axis=-1,
    )
    prev_pos = rng.normal(size=(n, 3))
    cur_pos = prev_pos + rng.normal(scale=0.3, size=(n, 3)) * np.asarray([1.0, 0.0, 1.0])

    delta = geo.delta_state_from_poses(
        jnp.asarray(prev_rot), jnp.asarray(prev_pos), jnp.asarray(cur_rot_np), jnp.asarray(cur_pos)
    )
    np.testing.assert_allclose(np.asarray(delta)[:, 2], dyaw, atol=1e-5)

    rec_rot, rec_pos = geo.compute_global_state(
        jnp.asarray(prev_rot), jnp.asarray(prev_pos), delta
    )
    np.testing.assert_allclose(np.asarray(rec_pos), cur_pos, atol=1e-5)
    got = np.asarray(rec_rot)
    sign = np.sign(np.sum(got * cur_rot_np, axis=-1, keepdims=True))
    np.testing.assert_allclose(got, sign * cur_rot_np, atol=1e-5)


def test_compute_goal_pos_reaches_goal():
    """Propagating the goal by the agent's own delta drives rho to zero when
    the agent steps exactly onto the goal."""
    goal = jnp.asarray([1.0, 0.0, -2.0])  # 2m ahead, 1m right
    # Move straight to the goal in the local frame: dx=1, dz=-2, dyaw=0
    out = geo.compute_goal_pos(goal, jnp.asarray([1.0, -2.0, 0.0]))
    np.testing.assert_allclose(np.asarray(out["polar"])[0], 0.0, atol=1e-6)


def test_compute_goal_pos_pure_rotation():
    """Rotating left by yaw spins the goal right by the same angle."""
    goal = jnp.asarray([0.0, 0.0, -1.0])  # dead ahead, 1m
    yaw = 0.3
    out = geo.compute_goal_pos(goal, jnp.asarray([0.0, 0.0, yaw]))
    polar = np.asarray(out["polar"])
    np.testing.assert_allclose(polar[0], 1.0, atol=1e-6)
    # habitat polar is [rho, -phi]; turning left (+yaw) puts the goal to the
    # agent's right (phi = +yaw), so the sensor reads -yaw
    np.testing.assert_allclose(polar[1], -yaw, atol=1e-6)


def test_polar_cartesian_roundtrip():
    rng = np.random.default_rng(2)
    cart = rng.normal(size=(64, 3)) * np.asarray([1.0, 0.0, 1.0])
    rho, phi = geo.cartesian_to_polar(
        jnp.asarray(-cart[:, 2]), jnp.asarray(cart[:, 0])
    )
    polar = jnp.stack([rho, -phi], axis=-1)
    rec = np.asarray(geo.pointgoal_polar2cartesian(polar))
    np.testing.assert_allclose(rec, cart, atol=1e-6)


def test_goal_update_matches_global_state_dead_reckoning():
    """Goal propagated per-step equals goal recomputed from the dead-reckoned
    global pose — the invariant behind ppo_trainer.py's drift accounting."""
    rng = np.random.default_rng(3)
    steps = 20
    goal_world = np.asarray([2.0, 0.0, -3.0])
    rot = jnp.asarray([0.0, 0.0, 0.0, 1.0])
    pos = jnp.zeros(3)
    goal_local = jnp.asarray(goal_world)
    for _ in range(steps):
        delta = jnp.asarray(rng.uniform(-0.2, 0.2, size=3))
        goal_local = geo.compute_goal_pos(goal_local, delta)["cartesian"]
        rot, pos = geo.compute_global_state(rot, pos, delta)
    # goal in the agent's current frame, computed from the global pose
    want = geo.quat_rotate_vector(geo.quat_inverse(rot), jnp.asarray(goal_world) - pos)
    np.testing.assert_allclose(np.asarray(goal_local), np.asarray(want), atol=1e-4)


@pytest.mark.parametrize("yaw", [0.5, -1.2])
def test_get_polar_angle_yaw_identity(yaw):
    q = jnp.asarray([0.0, np.sin(yaw / 2), 0.0, np.cos(yaw / 2)], dtype=jnp.float32)
    got = float(geo.get_polar_angle(q))
    # R_y(-yaw) applied to (0,0,-1) gives (sin yaw, 0, -cos yaw), so
    # phi = atan2(sin yaw, cos yaw) = yaw, then the -pi/2 map flip
    want = yaw - np.pi / 2
    # both live on the circle
    np.testing.assert_allclose(
        np.angle(np.exp(1j * got)), np.angle(np.exp(1j * want)), atol=1e-5
    )
