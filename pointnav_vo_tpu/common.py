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

DEFAULT_LOSS_WEIGHTS = {"dx": 1.0, "dz": 1.0, "dyaw": 1.0}
DEFAULT_DELTA_TYPES = ("dx", "dz", "dyaw")
DELTA_DIM = 3
EVAL_BATCHSIZE = 64
