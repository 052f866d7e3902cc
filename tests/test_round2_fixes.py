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


def test_rgb_policy_full_ppo_update_runs(tmp_path):
    """Review finding: the PPO update must receive the whitening batch_stats
    (extra variables) or flax raises ScopeCollectionNotFound — train an rgb
    policy end to end for one collect+update."""
    from pointnav_vo_tpu.rl.envs import EnvConfig, make_scripted_vector_env
    from pointnav_vo_tpu.rl.ppo import PPOConfig
    from pointnav_vo_tpu.rl.trainer import DDPPOTrainer

    env_cfg = EnvConfig(image_h=16, image_w=16, max_episode_steps=8)
    envs = make_scripted_vector_env(env_cfg, num_envs=2, seed=0)
    model = PointNavActorCritic(
        vis_types=("rgb", "depth"), image_size=(16, 16), hidden_size=32,
        num_recurrent_layers=1, normalize_visual_inputs=True,
    )
    obs0 = envs.reset()
    variables = fast_init(
        model, {k: jnp.asarray(v[:1]) for k, v in obs0.items()},
        model.initial_hidden(1), jnp.zeros((1, 1), jnp.int32), jnp.zeros((1, 1)),
    )
    envs = make_scripted_vector_env(env_cfg, num_envs=2, seed=0)
    trainer = DDPPOTrainer(model=model, ppo_cfg=PPOConfig(num_steps=4,
                                                          num_mini_batch=2,
                                                          hidden_size=32),
                           envs=envs, rng=jax.random.PRNGKey(0),
                           variables=variables)
    assert trainer.variables.get("batch_stats"), "rgb policy must carry stats"
    trainer.collect_rollout()
    stats = trainer.update_agent()
    assert np.isfinite(stats["value_loss"]) and np.isfinite(stats["action_loss"])


def test_resume_from_pre_upgrade_state_file(tmp_path):
    """Review finding: a RESUME_STATE_FILE written before extra_variables
    existed (params+opt_state only) must still resume."""
    import os

    from pointnav_vo_tpu import engines
    from pointnav_vo_tpu.config.defaults import get_rl_config

    cfg = get_rl_config(opts=[
        "NUM_UPDATES", "1", "NUM_PROCESSES", "2",
        "RL.PPO.num_steps", "3", "RL.PPO.num_mini_batch", "1",
        "TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.HEIGHT", "8",
        "TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.WIDTH", "8",
        "TASK_CONFIG.SIMULATOR.RGB_SENSOR.HEIGHT", "8",
        "TASK_CONFIG.SIMULATOR.RGB_SENSOR.WIDTH", "8",
        "TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS", "6",
        "CHECKPOINT_INTERVAL", "1000", "LOG_INTERVAL", "1000",
    ])
    for key in ("LOG_DIR", "LOG_FILE", "INFO_DIR", "CHECKPOINT_FOLDER",
                "TENSORBOARD_DIR"):
        cfg[key] = str(tmp_path / key.lower())
        os.makedirs(cfg[key], exist_ok=True)
    cfg.LOG_FILE = str(tmp_path / "log.txt")

    # write an OLD-format interrupted state: params + opt_state only
    eng = engines.PPOEngine(cfg, run_type="train", noisy=False)
    envs = eng._make_envs()
    from pointnav_vo_tpu.rl.ppo import make_optimizer

    obs0 = envs.reset()
    variables = eng.model.init(
        jax.random.PRNGKey(0), {k: jnp.asarray(v[:1]) for k, v in obs0.items()},
        eng.model.initial_hidden(1), jnp.zeros((1, 1), jnp.int32),
        jnp.zeros((1, 1)),
    )
    params = variables["params"]
    tx = make_optimizer(eng.ppo_cfg, 1)
    old_state = str(tmp_path / "old_resume.pkl")
    save_checkpoint(old_state, {"params": params, "opt_state": tx.init(params)},
                    metadata={"update": 0, "count_steps": 0})

    cfg.RESUME_TRAIN = True
    cfg.RESUME_STATE_FILE = old_state
    eng2 = engines.PPOEngine(cfg, run_type="train", noisy=False)
    trainer = eng2.train()  # must not raise on the old template
    assert trainer.count_steps > 0
