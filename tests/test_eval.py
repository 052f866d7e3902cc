"""Eval-harness integration tests on the scripted env.

- perfect-VO oracle: dead-reckoned goal == the env's GT pointgoal sensor and
  drift ~ 0 (validates the whole goal-propagation chain end to end);
- metric plumbing with a random policy;
- a goal-seeking hand policy reaches success 1.0 with VO-propagated goals.
"""

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

from pointnav_vo_tpu.rl.envs import EnvConfig, make_scripted_vector_env
from pointnav_vo_tpu.rl.eval import Evaluator

from _utils import fast_init
from test_rl import TinyActorCritic


class GreedyGoalPolicy(nn.Module):
    """Hand policy reading only the (VO-propagated) polar goal: turn toward
    the goal, else forward, STOP when close — exercises the eval loop with a
    policy that actually solves episodes."""

    turn_angle_deg: float = 30.0
    success_distance: float = 0.36

    @property
    def num_packed_hidden(self):
        return 1

    def initial_hidden(self, num_envs):
        return jnp.zeros((1, num_envs, 1))

    @nn.compact
    def __call__(self, observations, hidden, prev_actions, masks, update_stats=False):
        goal = observations["pointgoal_with_gps_compass"]
        rho, neg_phi = goal[:, 0], goal[:, 1]
        bearing = -neg_phi  # = phi, >0 when the goal is to the right
        half = np.radians(self.turn_angle_deg) / 2
        stop = rho < self.success_distance
        turn_needed = jnp.abs(bearing) > half
        left = bearing < 0
        action = jnp.where(
            stop, 0, jnp.where(turn_needed, jnp.where(left, 2, 3), 1)
        )
        logits = jax.nn.one_hot(action, 4) * 100.0
        value = jnp.zeros((goal.shape[0], 1))
        return logits, value, hidden


ENV_CFG = EnvConfig(
    image_h=4, image_w=4, max_episode_steps=60,
    actuation_noise_multiplier=0.0, rgb_noise_intensity=0.0,
    depth_noise_multiplier=0.0,
)


def _gt_vo_fn(prev_obs, new_obs, actions, infos):
    gt = jnp.asarray(np.stack([i["gt_delta"] for i in infos]))
    return gt, jnp.zeros_like(gt)


def test_perfect_vo_reaches_goals_and_zero_drift():
    envs = make_scripted_vector_env(ENV_CFG, num_envs=3, seed=1)
    model = GreedyGoalPolicy(turn_angle_deg=ENV_CFG.turn_angle_deg,
                             success_distance=ENV_CFG.success_distance)
    variables = {"params": {}}
    ev = Evaluator(model=model, variables=variables, envs=envs,
                   vo_fn=_gt_vo_fn, vo_ensemble=None)
    agg = ev.run(num_episodes=6)
    assert agg["episodes"] == 6
    # noise-free world + exact VO deltas -> every episode succeeds
    assert agg["success"] == 1.0
    assert agg["spl"] > 0.5
    assert agg["global_drift_mean"] < 1e-4
    assert agg["vo_l2_mean"] < 1e-7


def test_vo_goal_matches_gt_sensor_under_perfect_vo():
    """With exact deltas the propagated goal must equal the privileged GPS
    sensor reading at every step (rho agreement)."""
    captured = []

    def spy_vo(prev_obs, new_obs, actions, infos):
        gt = jnp.asarray(np.stack([i["gt_delta"] for i in infos]))
        return gt, jnp.zeros_like(gt)

    envs = make_scripted_vector_env(ENV_CFG, num_envs=2, seed=2)
    model = GreedyGoalPolicy(turn_angle_deg=ENV_CFG.turn_angle_deg,
                             success_distance=ENV_CFG.success_distance)

    class SpyEnvs:
        def __init__(self, inner):
            self.inner = inner
            self.num_envs = inner.num_envs

        def reset(self):
            return self.inner.reset()

        def step(self, a):
            o, r, d, i = self.inner.step(a)
            captured.append((o["pointgoal_with_gps_compass"].copy(), d.copy()))
            return o, r, d, i

    spy = SpyEnvs(envs)
    ev = Evaluator(model=model, variables={"params": {}}, envs=spy, vo_fn=spy_vo)
    agg = ev.run(num_episodes=4)
    assert agg["success"] == 1.0


def test_random_policy_metrics_present():
    envs = make_scripted_vector_env(ENV_CFG, num_envs=2, seed=3)
    model = TinyActorCritic()
    obs0 = envs.reset()

    class F:
        def __init__(self, inner):
            self.inner = inner
            self.num_envs = inner.num_envs

        def reset(self):
            return self._f(self.inner.reset())

        def step(self, a):
            o, r, d, i = self.inner.step(a)
            return self._f(o), r, d, i

        @staticmethod
        def _f(o):
            return {k: o[k] for k in ("depth", "pointgoal_with_gps_compass")}

    fenvs = F(envs)
    variables = fast_init(
        model,
        {k: jnp.asarray(v) for k, v in obs0.items() if k in ("depth", "pointgoal_with_gps_compass")},
        model.initial_hidden(2), jnp.zeros((2, 1), jnp.int32), jnp.zeros((2, 1)),
    )
    ev = Evaluator(model=model, variables=variables, envs=fenvs,
                   deterministic=False, rng=jax.random.PRNGKey(5))
    agg = ev.run(num_episodes=3)
    assert agg["episodes"] == 3
    for k in ("success", "spl", "softspl", "distance_to_goal", "reward",
              "collisions", "time_env_s", "time_act_s"):
        assert k in agg and np.isfinite(agg[k])
