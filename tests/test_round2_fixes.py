"""Round-2 regression tests: RL whitening-stats persistence.

An rgb policy (normalize_visual_inputs=True) carries RunningMeanAndVar
buffers; they must (a) actually update during rollout collection and
(b) survive the native checkpoint round-trip (the reference's torch
state_dict carries them implicitly).
"""

import numpy as np

import jax
import jax.numpy as jnp

from pointnav_vo_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from pointnav_vo_tpu.models.policy import PointNavActorCritic
from pointnav_vo_tpu.rl.trainer import act_step_update_stats

from _utils import fast_init


def _count_leaves(stats):
    flat = jax.tree_util.tree_flatten_with_path(stats)[0]
    return [v for p, v in flat if "count" in jax.tree_util.keystr(p)]


def test_rgb_policy_whitening_stats_update_and_checkpoint(tmp_path):
    model = PointNavActorCritic(
        vis_types=("rgb", "depth"), image_size=(16, 16), hidden_size=32,
        normalize_visual_inputs=True,
    )
    rng = np.random.default_rng(0)
    obs = {
        "rgb": jnp.asarray(rng.uniform(0, 255, (2, 16, 16, 3)), jnp.float32),
        "depth": jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 1)), jnp.float32),
        "pointgoal_with_gps_compass": jnp.ones((2, 2)),
    }
    hidden = model.initial_hidden(2)
    prev = jnp.zeros((2, 1), jnp.int32)
    masks = jnp.ones((2, 1))
    variables = fast_init(model, obs, hidden, prev, masks)
    assert variables.get("batch_stats"), "rgb policy must carry whitening buffers"
    variables["batch_stats"] = jax.tree.map(jnp.zeros_like, variables["batch_stats"])

    _v, _a, _lp, _h, new_stats = act_step_update_stats(
        model, variables, obs, hidden, prev, masks, jax.random.PRNGKey(0)
    )
    counts = _count_leaves(new_stats)
    assert counts and all(float(c) == 2.0 for c in counts), counts

    # checkpoint round-trip keeps the buffers (engines.py save/restore layout)
    path = str(tmp_path / "ckpt_0.pkl")
    save_checkpoint(
        path,
        {"params": variables["params"],
         "extra_variables": {"batch_stats": new_stats}},
    )
    tree, _ = load_checkpoint(path)
    restored = {"params": tree["params"], **tree.get("extra_variables", {})}
    assert "batch_stats" in restored
    for a, b in zip(jax.tree.leaves(new_stats),
                    jax.tree.leaves(restored["batch_stats"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
