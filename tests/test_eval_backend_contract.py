"""Backend contract: Evaluator.run works over EVERY ENV_BACKEND.

The r4 payload-format change (`number_of_episodes` riding the shm payload)
broke the Evaluator-over-ShmVectorEnv path because `Evaluator.run` queried
episode counts before `reset()` (ADVICE r4 high).  These tests drive a short
`Evaluator.run` over a FRESH instance of each backend — in-process sync loop,
shm process workers, fake-habitat adapter — so the next payload/interface
change cannot silently break one of them (VERDICT r4 item 1).

Also pins the reference stuck-counter semantics (ppo_trainer.py:924-930,
984-998): collision-gated, ground-truth-delta-exact-zero, per-episode.
"""

import sys

import numpy as np
import pytest

import flax.linen as nn
import jax.numpy as jnp

import fake_habitat

from pointnav_vo_tpu.config.defaults import get_rl_config
from pointnav_vo_tpu.native.shm_env import ShmVectorEnv
from pointnav_vo_tpu.rl.envs import (
    EnvConfig,
    ScriptedPointNavEnv,
    VectorEnv,
    make_habitat_vector_env,
)
from pointnav_vo_tpu.rl.eval import Evaluator


@pytest.fixture
def habitat_stub(monkeypatch):
    monkeypatch.setitem(sys.modules, "habitat", fake_habitat)
    return fake_habitat


class ForwardOnlyPolicy(nn.Module):
    """Always MOVE_FORWARD: drives the agent into the wall, so collision
    steps (and hence the collision-gated stuck counters) are guaranteed."""

    @property
    def num_packed_hidden(self):
        return 1

    def initial_hidden(self, num_envs):
        return jnp.zeros((1, num_envs, 1))

    @nn.compact
    def __call__(self, observations, hidden, prev_actions, masks,
                 update_stats=False):
        n = observations["pointgoal_with_gps_compass"].shape[0]
        logits = jnp.tile(jnp.asarray([0.0, 100.0, 0.0, 0.0]), (n, 1))
        return logits, jnp.zeros((n, 1)), hidden


def _env_cfg(max_steps=16):
    # noise-free so sync and shm trajectories are bit-comparable modulo the
    # float32 payload cast
    return EnvConfig(
        image_h=4, image_w=4, max_episode_steps=max_steps,
        actuation_noise_multiplier=0.0, rgb_noise_intensity=0.0,
        depth_noise_multiplier=0.0,
    )


def _evaluate(envs, num_episodes=4):
    ev = Evaluator(model=ForwardOnlyPolicy(), variables={"params": {}},
                   envs=envs)
    try:
        agg = ev.run(num_episodes=num_episodes)
    finally:
        close = getattr(envs, "close", None)
        if close:
            close()
    return agg, ev.results


def _agg_key(agg):
    return {k: round(float(v), 4) for k, v in agg.items()
            if not k.startswith("time_")}


def test_eval_contract_sync_vs_shm_identical():
    """A fresh ShmVectorEnv must survive Evaluator.run end to end (the r4
    regression crashed at the pre-reset number_of_episodes query), and the
    aggregates must match the in-process sync backend bit-for-bit modulo the
    float32 payload cast — same scripted worlds, same seeds, same policy."""
    cfg = _env_cfg()
    sync_envs = VectorEnv([
        (lambda s=s: ScriptedPointNavEnv(cfg, seed=s)) for s in (7, 8)
    ])
    agg_sync, res_sync = _evaluate(sync_envs)

    shm_envs = ShmVectorEnv(cfg, 2, seed=7)
    agg_shm, res_shm = _evaluate(shm_envs)

    assert _agg_key(agg_sync) == _agg_key(agg_shm)
    assert [r.steps for r in res_sync] == [r.steps for r in res_shm]
    assert ([(r.dx_stuck, r.dz_stuck, r.both_stuck) for r in res_sync]
            == [(r.dx_stuck, r.dz_stuck, r.both_stuck) for r in res_shm])


def test_eval_contract_fake_habitat_sync(habitat_stub):
    """Evaluator.run over the habitat adapter (fake-backed, serial fan-out):
    finite number_of_episodes budgets, dataset-level episode keys, and the
    collision/is_collision info plumb through get_metrics()."""
    cfg = get_rl_config()
    cfg.NUM_PROCESSES = 2
    for sensor in ("DEPTH_SENSOR", "RGB_SENSOR"):
        cfg.TASK_CONFIG.SIMULATOR[sensor].HEIGHT = 8
        cfg.TASK_CONFIG.SIMULATOR[sensor].WIDTH = 8
    cfg.TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS = 16
    envs = make_habitat_vector_env(cfg, 2, seed=5, backend="sync")
    agg, results = _evaluate(envs, num_episodes=4)
    assert agg["episodes"] == 4
    for key in ("stuck_dx", "stuck_dz", "stuck_both"):
        assert key in agg


def test_shm_number_of_episodes_pre_reset_safe():
    """The exact r4 crash: querying number_of_episodes on a FRESH farm.
    It must answer (popping the first payload), and a later reset() must
    still return the startup observation."""
    envs = ShmVectorEnv(_env_cfg(), 2, seed=3)
    try:
        counts = envs.number_of_episodes()
        assert counts == [None, None]  # scripted world: unbounded
        obs = envs.reset()
        assert obs["rgb"].shape == (2, 4, 4, 3)
        # reset() remains once-only
        with pytest.raises(AssertionError):
            envs.reset()
    finally:
        envs.close()


def test_stuck_counters_reference_semantics():
    """Collision-gated, GT-delta-exact-zero, per-episode — NOT the old
    VO-near-zero proxy.  A forward-only policy in a small room pins the
    agent to the wall: once it first collides it keeps colliding with
    dx == dz == 0.0 exactly, so every collision step counts in all three
    counters (dx/dz independent, both when both — reference flags are not
    mutually exclusive, ppo_trainer.py:984-998)."""
    cfg = _env_cfg(max_steps=24)
    env = ScriptedPointNavEnv(cfg, seed=9)
    envs = VectorEnv([lambda: ScriptedPointNavEnv(cfg, seed=9)])
    agg, results = _evaluate(envs, num_episodes=1)

    # ground truth via a raw env replay with the same seed + action stream
    env.reset()
    expected = {"dx": 0, "dz": 0, "both": 0}
    while True:
        obs, r, done, info = env.step(1)  # MOVE_FORWARD
        if done:
            break  # reference counts only episode-CONTINUE steps
        if info["collisions"]["is_collision"]:
            g = info["gt_delta"]
            dx0, dz0 = float(g[0]) == 0.0, float(g[1]) == 0.0
            expected["dx"] += dx0
            expected["dz"] += dz0
            expected["both"] += dx0 and dz0
    assert expected["both"] > 0, "test world must produce collisions"
    (res,) = results
    assert (res.dx_stuck, res.dz_stuck, res.both_stuck) == (
        expected["dx"], expected["dz"], expected["both"])
    assert agg["stuck_dx"] == expected["dx"]
    assert agg["stuck_dz"] == expected["dz"]
    assert agg["stuck_both"] == expected["both"]
    # stuck counts are a strict subset of collision steps
    assert res.dx_stuck <= res.collisions
