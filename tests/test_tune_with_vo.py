"""RL training with VO in the loop (TUNE_WITH_VO) through the full driver."""

import os

import numpy as np

import jax
import jax.numpy as jnp


def test_training_goals_track_gt_under_perfect_vo():
    """During rollout collection with VO-propagated goals, a perfect VO
    (gt_delta oracle through the trainer's vo_fn hook) keeps the goal the
    policy trains on equal to the env's GPS sensor — the TUNE_WITH_VO
    integration feeds the policy correct goals, so learning reduces to the
    (separately tested) GPS-goal PPO case."""
    from pointnav_vo_tpu.rl.envs import EnvConfig, make_scripted_vector_env
    from pointnav_vo_tpu.rl.ppo import PPOConfig
    from pointnav_vo_tpu.rl.trainer import DDPPOTrainer
    from test_rl import TinyActorCritic
    from _utils import fast_init

    env_cfg = EnvConfig(image_h=4, image_w=4, max_episode_steps=9,
                        actuation_noise_multiplier=0.0, rgb_noise_intensity=0.0,
                        depth_noise_multiplier=0.0)
    envs = make_scripted_vector_env(env_cfg, num_envs=3, seed=1)
    cfg = PPOConfig(num_steps=12, num_mini_batch=2, hidden_size=16)
    model = TinyActorCritic()
    obs0 = envs.reset()
    variables = fast_init(
        model, {k: jnp.asarray(v) for k, v in obs0.items()},
        model.initial_hidden(3), jnp.zeros((3, 1), jnp.int32), jnp.zeros((3, 1)),
    )
    envs = make_scripted_vector_env(env_cfg, num_envs=3, seed=1)

    gps_trace = []

    def perfect_vo(prev_obs, new_obs, actions_np, infos):
        gps_trace.append(np.asarray(new_obs["pointgoal_with_gps_compass"]))
        return jnp.stack([jnp.asarray(i["gt_delta"]) for i in infos])

    trainer = DDPPOTrainer(model=model, ppo_cfg=cfg, envs=envs,
                           rng=jax.random.PRNGKey(0), variables=variables,
                           vo_fn=perfect_vo)
    trainer.collect_rollout()
    stats = trainer.update_agent()
    assert np.isfinite(stats["value_loss"])

    # the goal observation stored in the rollout (what the policy sees) is
    # the VO-propagated one; under perfect VO it matches the GPS sensor of
    # live steps (post-done rows re-seed from the sensor by construction)
    stored = np.asarray(trainer.rollouts.observations["pointgoal_with_gps_compass"])
    for t, gps in enumerate(gps_trace):
        np.testing.assert_allclose(stored[t + 1], gps, atol=2e-2,
                                   err_msg=f"step {t}")


def test_rl_train_tune_with_vo(tmp_path):
    from pointnav_vo_tpu.run import main

    log_root = str(tmp_path / "logs")
    overrides = [
        "NUM_UPDATES", "1", "NUM_PROCESSES", "2",
        "RL.PPO.num_steps", "3", "RL.PPO.num_mini_batch", "2",
        "RL.TUNE_WITH_VO", "True", "VO.USE_VO_MODEL", "True",
        # untrained ensemble path (no pretrained ckpts in CI)
        "VO.REGRESS_MODEL.pretrained", "False",
        "VO.VIS_SIZE_W", "32", "VO.VIS_SIZE_H", "32",
        "TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.HEIGHT", "32",
        "TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.WIDTH", "32",
        "TASK_CONFIG.SIMULATOR.RGB_SENSOR.HEIGHT", "32",
        "TASK_CONFIG.SIMULATOR.RGB_SENSOR.WIDTH", "32",
        "TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS", "10",
        "CHECKPOINT_INTERVAL", "1", "LOG_INTERVAL", "1",
    ]
    main(["--task-type", "rl", "--run-type", "train", "--log-root", log_root,
          "--noise", "0"] + overrides)
    run_dir = os.path.join(log_root, os.listdir(log_root)[0])
    assert "tune_vo" in run_dir
    assert os.listdir(os.path.join(run_dir, "checkpoints"))
