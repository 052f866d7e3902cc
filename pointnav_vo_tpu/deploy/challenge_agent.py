"""Deployment agent — the Habitat-Challenge-2020 submission surface.

Counterpart of ``challenge_2020/challenge2020_agent.py:41-521``: a
``habitat.Agent``-shaped object (``reset()`` / ``act(observations) ->
{"action": id}``) that owns the policy and the VO ensemble and maintains the
dead-reckoned point-goal itself, because the challenge task exposes only the
episode-start ``pointgoal`` (no GPS/compass).

Behavioral parity:
- on the first step of an episode the polar ``pointgoal`` reading converts to
  cartesian (:427-434) and the policy acts on it directly;
- every later step propagates the goal through the VO delta predicted from
  the (prev, cur) observation pair and the previous action (:311-394);
- once the policy emits STOP it stays STOP for the episode (:424-473);
- det/rnd VO modes as configured.

When habitat is installed, pass this agent to ``habitat.Challenge.submit``;
it is also directly drivable against any env exposing rgb/depth/pointgoal
observations (see tests/test_challenge_agent.py).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from pointnav_vo_tpu.common import STOP
from pointnav_vo_tpu.ops import geometry as geo
from pointnav_vo_tpu.rl.trainer import act_step, propagate_goal


class PointNavVOAgent:
    def __init__(
        self,
        *,
        policy_model,
        policy_variables: Dict,
        vo_ensemble=None,
        vo_fn=None,
        deterministic: bool = True,
        goal_sensor: str = "pointgoal",
        rng: Optional[jax.Array] = None,
    ):
        self.model = policy_model
        self.variables = policy_variables
        self.vo = vo_ensemble
        self.vo_fn = vo_fn
        self.deterministic = deterministic
        self.goal_sensor = goal_sensor
        self.rng = rng if rng is not None else jax.random.PRNGKey(0)
        self.reset()

    def reset(self) -> None:
        self._hidden = self.model.initial_hidden(1)
        self._prev_action = jnp.zeros((1, 1), jnp.int32)
        self._mask = jnp.zeros((1, 1))
        self._prev_obs = None
        self._feats = None  # cached frame features (det steady-state path)
        self._goal_cart = None
        self._stopped = False

    def _goal_polar(self, goal_cart: jax.Array) -> jax.Array:
        rho, phi = geo.cartesian_to_polar(-goal_cart[..., 2], goal_cart[..., 0])
        return jnp.stack([rho, -phi], axis=-1)

    def act(self, observations: Dict[str, np.ndarray]) -> Dict[str, int]:
        if self._stopped:
            return {"action": STOP}

        rgb = jnp.asarray(observations["rgb"], jnp.float32)[None]
        depth = jnp.asarray(observations["depth"], jnp.float32)[None]

        if self._prev_obs is None:
            # episode start: seed the goal from the raw pointgoal reading
            polar = jnp.asarray(observations[self.goal_sensor], jnp.float32)[None]
            self._goal_cart = geo.pointgoal_polar2cartesian(polar)
        else:
            prev_rgb, prev_depth = self._prev_obs
            if self.vo_fn is not None:
                delta, _std = self.vo_fn(prev_rgb, prev_depth, rgb, depth,
                                         self._prev_action[:, 0], observations)
            elif self.vo.cfg.mode == "det":
                # steady-state det path: each frame preprocessed once per
                # episode, cur features cached for the next step
                from pointnav_vo_tpu.vo.ensemble import frame_features

                if self._feats is None:
                    self._feats = frame_features(prev_rgb, prev_depth, self.vo.cfg)
                delta, self._feats = self.vo.predict_step_cached(
                    self._feats, rgb, depth, np.asarray(self._prev_action[:, 0]),
                )
            else:
                self.rng, sub = jax.random.split(self.rng)
                delta, _std, _ = self.vo.compute_local_delta_states_from_vo(
                    prev_rgb, prev_depth, rgb, depth, self._prev_action[:, 0],
                    rng=sub,
                )
            self._goal_cart, _ = propagate_goal(
                self._goal_cart, delta, jnp.zeros((1, 1)),
                self._goal_polar(self._goal_cart),
            )

        policy_obs = {
            "depth": depth,
            "rgb": rgb,
            "pointgoal_with_gps_compass": self._goal_polar(self._goal_cart),
        }
        self.rng, sub = jax.random.split(self.rng)
        _v, action, _lp, self._hidden = act_step(
            self.model, self.variables, policy_obs, self._hidden,
            self._prev_action, self._mask, sub, deterministic=self.deterministic,
        )
        self._prev_obs = (rgb, depth)
        self._prev_action = action
        self._mask = jnp.ones((1, 1))

        act_id = int(action[0, 0])
        if act_id == STOP:
            self._stopped = True
        return {"action": act_id}


def submit_to_challenge(agent: PointNavVOAgent, phase: str = "local") -> None:
    """EvalAI submission hook (challenge2020_agent.py:511-517); needs habitat."""
    import habitat  # noqa: F401 — import-gated external dependency

    challenge = habitat.Challenge(eval_remote=(phase == "remote"))
    challenge.submit(agent)
