"""Exact-episode-set eval protocol (VERDICT r3 item 1).

The reference evaluates each val episode exactly once, pausing envs whose
episode iterators are exhausted (ppo_trainer.py:635-672, 1004-1072;
base_trainer.py:383-425).  The Evaluator expresses the same protocol with
TPU-friendly static shapes: fixed per-env budgets + masking.  These tests
pin the semantics the reference's protocol guarantees and completion-order
counting violates:

- with deliberately SKEWED episode lengths, the counted set is each env's
  first budget-i episodes — identical aggregate to a serial per-env run —
  not whichever episodes happened to finish first;
- counted episode keys are distinct, and a cycling iterator trips the
  duplicate assertion;
- quota waterfill honors per-env availability and clamps to the total
  (ppo_trainer.py:639-646).
"""

import numpy as np
import pytest

import flax.linen as nn
import jax.numpy as jnp

from pointnav_vo_tpu.rl.envs import EnvConfig, ScriptedPointNavEnv, VectorEnv
from pointnav_vo_tpu.rl.eval import Evaluator, episode_budgets


class ForwardOnlyPolicy(nn.Module):
    """Never stops: every episode runs to its env's max_episode_steps, so
    episode length is controlled per env by config — the skew generator."""

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


def _cfg(max_steps: int) -> EnvConfig:
    return EnvConfig(
        image_h=4, image_w=4, max_episode_steps=max_steps,
        actuation_noise_multiplier=0.0, rgb_noise_intensity=0.0,
        depth_noise_multiplier=0.0,
    )


def _run(env_specs, num_episodes):
    """env_specs: list of (max_steps, seed)."""
    envs = VectorEnv([
        (lambda m=m, s=s: ScriptedPointNavEnv(_cfg(m), seed=s))
        for m, s in env_specs
    ])
    ev = Evaluator(model=ForwardOnlyPolicy(), variables={"params": {}},
                   envs=envs)
    agg = ev.run(num_episodes=num_episodes)
    return agg, ev.results


def test_skewed_lengths_match_serial_exact_set():
    """2 fast envs (5-step episodes) + 1 slow env (60-step): completion-order
    counting would fill the quota entirely from the fast envs; the exact-set
    protocol must count each env's first budget-i episodes — bit-identical
    to running each env serially on its own."""
    specs = [(5, 10), (5, 11), (60, 12)]
    num_episodes = 6  # budgets [2, 2, 2]
    agg, results = _run(specs, num_episodes)

    assert agg["episodes"] == num_episodes
    # the slow env's episodes are in the set (60-step lengths present):
    # under completion-order counting all 6 would have steps == 5
    steps_sorted = sorted(r.steps for r in results)
    assert steps_sorted == [5, 5, 5, 5, 60, 60]
    # every counted episode is one of each env's FIRST two — consecutive
    # ids from each env's start (the constructor burns id 0, the
    # evaluator's reset() starts every env at id 1)
    assert sorted(r.episode_id for r in results) == [1, 1, 1, 2, 2, 2]
    # steps accounting covers exactly the counted episodes
    assert agg["total_env_steps"] == sum(r.steps for r in results)

    # serial ground truth: each env evaluated alone with its own budget —
    # the per-row-independent policy makes trajectories identical
    serial = []
    for m, s in specs:
        _, rs = _run([(m, s)], 2)
        serial.extend(rs)

    def key(r):
        return (r.steps, round(r.reward, 6), r.success, round(r.spl, 6),
                round(r.distance_to_goal, 6))

    assert sorted(map(key, results)) == sorted(map(key, serial))
    assert np.isclose(agg["reward"], np.mean([r.reward for r in serial]))
    assert np.isclose(agg["distance_to_goal"],
                      np.mean([r.distance_to_goal for r in serial]))


def test_uneven_budget_split():
    """num_episodes not divisible by num_envs: earlier envs get the extra
    episodes, later envs stop at the base share."""
    agg, results = _run([(4, 1), (4, 2), (4, 3)], 4)  # budgets [2, 1, 1]
    assert agg["episodes"] == 4
    assert sorted(r.episode_id for r in results) == [1, 1, 1, 2]


class _CyclingEnvs:
    """Fake vector env whose single env re-serves the same dataset episode
    forever — the exact-set assert must trip instead of double-counting."""

    num_envs = 1

    def reset(self):
        return {"pointgoal_with_gps_compass": np.zeros((1, 2), np.float32)}

    def step(self, actions):
        obs = self.reset()
        info = {
            "distance_to_goal": 1.0, "success": 0.0, "spl": 0.0,
            "softspl": 0.0, "collisions": {"count": 0},
            "episode_key": ("sceneA", "0"),
        }
        return obs, np.zeros(1, np.float32), np.ones(1, bool), [info]


def test_cycling_iterator_trips_distinctness_assert():
    # a real RuntimeError, not assert: survives python -O and carries
    # budget context for the multi-hour-eval post-mortem (ADVICE r4)
    ev = Evaluator(model=ForwardOnlyPolicy(), variables={"params": {}},
                   envs=_CyclingEnvs())
    with pytest.raises(RuntimeError, match="finished twice"):
        ev.run(num_episodes=2)


def test_budget_waterfill_and_clamp():
    # even split, remainder to the earliest envs
    assert episode_budgets(6, 4)[0] == [2, 2, 1, 1]
    # per-env availability caps the fill; unbounded envs absorb the rest
    budgets, n = episode_budgets(5, 4, [1, None, 2, 0])
    assert budgets == [1, 2, 2, 0] and n == 5
    # quota above total availability clamps (ppo_trainer.py:639-646)
    budgets, n = episode_budgets(10, 2, [3, 2])
    assert budgets == [3, 2] and n == 5
