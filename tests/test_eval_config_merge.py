"""Eval-config merge parity: eval_opts > ckpt_opts > eval_cfg > ckpt_cfg
(reference _setup_eval_config, base_trainer.py:319-356)."""

import numpy as np

from pointnav_vo_tpu import engines
from pointnav_vo_tpu.config.defaults import get_rl_config
from pointnav_vo_tpu.io.checkpoint import save_checkpoint


def _save_ckpt(tmp_path, cfg):
    path = str(tmp_path / "ckpt_0.pkl")
    save_checkpoint(path, {"params": {"w": np.zeros(1)}},
                    metadata={"full_config": cfg.to_dict()})
    return path


def test_four_level_merge_priority(tmp_path):
    # ckpt config: trained with custom entropy (via CLI opts) + lr (via cfg)
    train_cfg = get_rl_config(opts=[
        "RL.PPO.entropy_coef", "0.05",   # ckpt_opts
        "RL.PPO.lr", "0.001",            # ckpt_opts (later beaten by eval_opts)
    ])
    train_cfg.NUM_UPDATES = 777          # ckpt_cfg only (no opts)
    ckpt = _save_ckpt(tmp_path, train_cfg)

    eval_cfg = get_rl_config(opts=["RL.PPO.lr", "0.002"])  # eval_opts
    eng = engines.EfficientDDPPOEngine(eval_cfg, run_type="eval")
    merged = eng._merged_eval_config(ckpt)

    # eval_opts beat ckpt_opts
    assert merged.RL.PPO.lr == 0.002
    # ckpt_opts beat eval_cfg (eval run passed no entropy override)
    assert merged.RL.PPO.entropy_coef == 0.05
    # eval_cfg beats ckpt_cfg (plain key set only in the ckpt config tree)
    assert merged.NUM_UPDATES == eval_cfg.NUM_UPDATES != 777


def test_merge_never_evals_on_train_split(tmp_path):
    train_cfg = get_rl_config()
    train_cfg.TASK_CONFIG.DATASET.SPLIT = "train"
    ckpt = _save_ckpt(tmp_path, train_cfg)

    eval_cfg = get_rl_config()
    eval_cfg.TASK_CONFIG.DATASET.SPLIT = "train"
    eng = engines.EfficientDDPPOEngine(eval_cfg, run_type="eval")
    merged = eng._merged_eval_config(ckpt)
    assert merged.TASK_CONFIG.DATASET.SPLIT == "val"


def test_merge_without_stored_config_returns_live(tmp_path):
    path = str(tmp_path / "ckpt_1.pkl")
    save_checkpoint(path, {"params": {"w": np.zeros(1)}}, metadata={})
    eval_cfg = get_rl_config()
    eng = engines.EfficientDDPPOEngine(eval_cfg, run_type="eval")
    assert eng._merged_eval_config(path) is eval_cfg


def test_outdated_ckpt_opts_are_skipped(tmp_path):
    train_cfg = get_rl_config()
    train_cfg.CMD_TRAILING_OPTS = ["SOME.REMOVED.KEY", "1"]
    ckpt = _save_ckpt(tmp_path, train_cfg)
    eval_cfg = get_rl_config(opts=["RL.PPO.lr", "0.003"])
    eng = engines.EfficientDDPPOEngine(eval_cfg, run_type="eval")
    merged = eng._merged_eval_config(ckpt)
    assert merged.RL.PPO.lr == 0.003
