"""RL training with VO in the loop (TUNE_WITH_VO) through the full driver."""

import os


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
