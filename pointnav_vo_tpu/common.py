"""Shared constants (counterpart of the reference's vo/common/common_vars.py)."""

import numpy as np

EPSILON = 1e-8

# Habitat discrete actions
STOP = 0
MOVE_FORWARD = 1
TURN_LEFT = 2
TURN_RIGHT = 3
N_ACTS = 4
UNIFIED = -1

ACT_IDX2NAME = {UNIFIED: "unified", MOVE_FORWARD: "forward", TURN_LEFT: "left", TURN_RIGHT: "right"}
ACT_NAME2IDX = {"forward": MOVE_FORWARD, "left": TURN_LEFT, "right": TURN_RIGHT, "all": UNIFIED}

# order of the stacked VO expert axis (vo/ensemble.py): action -> expert slot
VO_EXPERT_ACTIONS = (MOVE_FORWARD, TURN_LEFT, TURN_RIGHT)

# frame-pair sample orientations (dataset inverse augmentation)
CUR_REL_TO_PREV = 0
PREV_REL_TO_CUR = 1
DATA_TYPE_ID2STR = {CUR_REL_TO_PREV: "cur_rel_to_prev", PREV_REL_TO_CUR: "prev_rel_to_cur"}

# noise-free action deltas [dx, dz, dyaw] (TURN_ANGLE default 10 deg in the
# reference's table; the Challenge-2020 task uses 30 deg — see configs)
NO_NOISE_DELTAS = {
    MOVE_FORWARD: [0.0, -0.25, 0.0],
    TURN_LEFT: [0.0, 0.0, float(np.radians(10))],
    TURN_RIGHT: [0.0, 0.0, float(-np.radians(10))],
}

# -- host-numpy quaternion helpers ([x, y, z, w] layout, batched) -----------
# Single home for the pose-delta convention shared by dataset generation
# (vo/dataset.py) and the habitat adapter (rl/envs.py); the jax twins live in
# ops/geometry.py.


def quat_inverse(q: np.ndarray) -> np.ndarray:
    return q * np.asarray([-1, -1, -1, 1.0]) / np.sum(q * q, -1, keepdims=True)


def quat_multiply(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x1, y1, z1, w1 = np.moveaxis(a, -1, 0)
    x2, y2, z2, w2 = np.moveaxis(b, -1, 0)
    return np.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        -1,
    )


def quat_rotate(q: np.ndarray, v: np.ndarray) -> np.ndarray:
    xyz, w = q[..., :3], q[..., 3:4]
    t = 2.0 * np.cross(xyz, v)
    return v + w * t + np.cross(xyz, t)


def quat_canonical(q: np.ndarray) -> np.ndarray:
    """Pick the w>=0 representative of the double cover, so single-step delta
    yaws land in [-pi, pi] instead of picking up +-2*pi ghosts when the two
    global rotations straddle hemispheres."""
    return q * np.where(q[..., 3:4] < 0, -1.0, 1.0)


DEFAULT_LOSS_WEIGHTS = {"dx": 1.0, "dz": 1.0, "dyaw": 1.0}
DEFAULT_DELTA_TYPES = ("dx", "dz", "dyaw")
DELTA_DIM = 3
EVAL_BATCHSIZE = 64
