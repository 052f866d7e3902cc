"""Crash-resume machinery of the 994-episode quality ladder.

The ladder run (examples/eval_994_ladder.py) survives TPU-tunnel deaths by
checkpointing policy training host-side every 10 updates and resuming from
the .part file.  These tests pin the round-trip: a trainer restored from a
part checkpoint carries bit-identical params/opt-state/rng and continues
from the recorded update, and a stage whose start already equals its
target runs zero further updates (so relaunches are idempotent).

Reference counterpart: the reference resumes interrupted DD-PPO jobs from
requeued state dicts (ppo_trainer.py:242-266 / train() restore path); the
ladder's .part file is the same idea for the scripted-world pipeline.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "examples"))

from pointnav_vo_tpu.models.policy import PointNavActorCritic
from pointnav_vo_tpu.rl.envs import EnvConfig, make_scripted_vector_env
from pointnav_vo_tpu.rl.ppo import PPOConfig
from pointnav_vo_tpu.rl.trainer import DDPPOTrainer

from eval_994_ladder import _restore_part, _save_part, _train_stage  # noqa: E402


def _tiny_trainer(seed=0):
    cfg = EnvConfig(image_h=32, image_w=32, max_episode_steps=12,
                    actuation_noise_multiplier=0.0, rgb_noise_intensity=0.0,
                    depth_noise_multiplier=0.0)
    envs = make_scripted_vector_env(cfg, 2, seed=7)
    policy = PointNavActorCritic(
        n_actions=4, vis_types=("depth",), image_size=(32, 32),
        hidden_size=64, num_recurrent_layers=1, rnn_type="LSTM",
        backbone="resnet18")
    pcfg = PPOConfig(num_steps=8, num_mini_batch=1, ppo_epoch=1, lr=2.5e-4,
                     hidden_size=64)
    return envs, DDPPOTrainer(model=policy, ppo_cfg=pcfg, envs=envs,
                              rng=jax.random.PRNGKey(seed), total_updates=6)


def test_part_checkpoint_round_trip(tmp_path):
    part = str(tmp_path / "pol.part")
    envs, tr = _tiny_trainer()
    try:
        trend = []
        _train_stage("gps", tr, 2, 0, trend, None, 0.0, 0.0)
        _save_part(part, "gps", 2, tr, trend, 12.5)

        envs2, tr2 = _tiny_trainer(seed=99)  # different init on purpose
        try:
            import pickle

            with open(part, "rb") as f:
                ck = pickle.load(f)
            assert ck["stage"] == "gps" and ck["update"] == 2
            assert ck["t_accum"] == 12.5 and ck["reward_trend"] == trend
            _restore_part(tr2, ck)
            jax.tree.map(
                lambda a, b: np.testing.assert_array_equal(
                    np.asarray(a), np.asarray(b)),
                tr.params, tr2.params)
            jax.tree.map(
                lambda a, b: np.testing.assert_array_equal(
                    np.asarray(a), np.asarray(b)),
                tr.opt_state, tr2.opt_state)
            np.testing.assert_array_equal(np.asarray(tr.rng),
                                          np.asarray(tr2.rng))
            assert tr2.update_idx == tr.update_idx
        finally:
            envs2.close()
    finally:
        envs.close()


def test_completed_stage_resume_is_noop(tmp_path):
    envs, tr = _tiny_trainer()
    try:
        _train_stage("gps", tr, 1, 0, [], None, 0.0, 0.0)
        before = jax.tree.map(lambda x: np.asarray(x).copy(), tr.params)
        # start == n_updates: a relaunch after the stage finished must not
        # train further (range is empty) — params unchanged
        _train_stage("gps", tr, 1, 1, [], None, 0.0, 0.0)
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
            tr.params, before)
        assert tr.update_idx == 1
    finally:
        envs.close()


def test_watchdog_exits_3_on_stall():
    """The stall watchdog hard-exits(3) when no beat() arrives — the outer
    retry loop keys on that exit code to relaunch-and-resume."""
    import subprocess

    code = (
        "import sys; sys.path.insert(0, %r);\n"
        "import time\n"
        "from eval_994_ladder import start_watchdog, beat\n"
        "beat(); start_watchdog(1)\n"
        "time.sleep(60)\n"  # never beats again; watchdog polls every 30 s
        "sys.exit(0)\n" % os.path.join(REPO, "examples")
    )
    proc = subprocess.run([sys.executable, "-c", code], timeout=120,
                          capture_output=True, text=True)
    assert proc.returncode == 3, proc.stdout + proc.stderr
    assert "WATCHDOG" in proc.stdout
