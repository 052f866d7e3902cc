"""Driver + config + registry smoke tests: end-to-end through run.py."""

import os

import numpy as np
import pytest

from pointnav_vo_tpu.config.defaults import get_rl_config, get_vo_config
from pointnav_vo_tpu.utils.config import Config
from pointnav_vo_tpu.vo.dataset import generate_scripted_dataset
from pointnav_vo_tpu.rl.envs import EnvConfig


def test_config_merge_and_freeze():
    c = get_rl_config(["configs/rl/ddppo_pointnav.yaml"])
    assert c.ENGINE_NAME == "efficient_ddppo"
    assert c.RL.PPO.lr == 1.0e-4
    assert c.VO.REGRESS_MODEL.name == "vo_cnn_rgb_d_dd_top_down"
    c.freeze()
    with pytest.raises(AttributeError):
        c.SEED = 2
    c.defrost()
    c.merge_from_list(["RL.PPO.lr", "0.001", "NUM_PROCESSES", "4"])
    assert c.RL.PPO.lr == 0.001 and c.NUM_PROCESSES == 4


def test_registry_population():
    import pointnav_vo_tpu.engines  # noqa: F401
    from pointnav_vo_tpu.utils import registry

    assert "efficient_ddppo" in registry.names("trainer")
    assert "ppo" in registry.names("trainer")
    assert "resnet_rnn_policy" in registry.names("policy")
    assert "NavRLEnv" in registry.names("env")
    assert "vo_cnn_rgb_d_dd_top_down" in registry.names("vo_model")
    assert "vo_cnn_regression_geo_invariance_engine" in registry.names("vo_engine")


def test_run_vo_train_then_eval(tmp_path):
    """Full driver path: generate data -> train 1 epoch -> eval from ckpt."""
    from pointnav_vo_tpu.run import main

    data = str(tmp_path / "data.h5")
    generate_scripted_dataset(
        data, 40, env_cfg=EnvConfig(image_h=32, image_w=32, max_episode_steps=40),
        seed=0,
    )
    log_root = str(tmp_path / "logs")
    overrides = [
        "VO.VIS_SIZE_W", "32", "VO.VIS_SIZE_H", "32",
        "VO.TRAIN.batch_size", "8", "VO.TRAIN.epochs", "1",
        "VO.TRAIN.action_type", "1",
        "VO.DATASET.TRAIN_WITH_NOISE", data,
        "VO.DATASET.EVAL_WITH_NOISE", data,
        "LOG_INTERVAL", "1",
    ]
    main(["--task-type", "vo", "--run-type", "train", "--log-root", log_root]
         + overrides)

    # find the checkpoint the train run produced
    run_dirs = os.listdir(log_root)
    assert len(run_dirs) == 1
    ckpt_dir = os.path.join(log_root, run_dirs[0], "checkpoints")
    ckpts = os.listdir(ckpt_dir)
    assert ckpts, "train run wrote no checkpoint"
    ckpt = os.path.join(ckpt_dir, ckpts[0])

    main(["--task-type", "vo", "--run-type", "eval", "--log-root", log_root,
          "EVAL.EVAL_CKPT_PATH", ckpt, "VO.DATASET.EVAL_WITH_NOISE", data])


def test_run_rl_train_smoke(tmp_path):
    from pointnav_vo_tpu.run import main

    log_root = str(tmp_path / "logs")
    overrides = [
        "NUM_UPDATES", "1", "NUM_PROCESSES", "2",
        "RL.PPO.num_steps", "4", "RL.PPO.num_mini_batch", "2",
        "RL.TUNE_WITH_VO", "False", "VO.USE_VO_MODEL", "False",
        "TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.HEIGHT", "32",
        "TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.WIDTH", "32",
        "TASK_CONFIG.SIMULATOR.RGB_SENSOR.HEIGHT", "32",
        "TASK_CONFIG.SIMULATOR.RGB_SENSOR.WIDTH", "32",
        "TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS", "20",
        "CHECKPOINT_INTERVAL", "1", "LOG_INTERVAL", "1",
    ]
    main(["--task-type", "rl", "--run-type", "train", "--log-root", log_root,
          "--noise", "0"] + overrides)
    run_dirs = os.listdir(log_root)
    ckpt_dir = os.path.join(log_root, run_dirs[0], "checkpoints")
    assert os.listdir(ckpt_dir)
