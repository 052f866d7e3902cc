"""DD-PPO trainer: host env loop + fully jitted act / goal-update / PPO steps.

Counterpart of the reference's ``rl/ddppo/algo/ddppo_trainer.py:180-482`` and
``rl/ppo/ppo_trainer.py:169-314``, redesigned for TPU (SURVEY.md §3.2, §7):

- ``_collect_rollout_step``'s per-env Python VO loop (ppo_trainer.py:206-239
  — batch-1 VO forwards per env!) becomes ONE jitted call per step batching
  all envs: policy act + VO delta + ``compute_goal_pos`` fused on device.
- DDP + NCCL (ddppo.py) becomes ``shard_map`` over a 1-axis mesh: rollouts
  shard on the env axis, params replicate, gradients ``pmean`` on ICI.
- The straggler PrefixStore counter (ddppo_trainer.py:192, 411-419) is
  dropped: rollouts are fixed-T and SPMD-lockstep.
- TUNE_WITH_VO (ddppo_trainer.py:224-254): when a VO ensemble is supplied,
  the point-goal observation the policy sees is dead-reckoned through VO
  instead of read from the (privileged) GPS sensor; episode resets re-seed
  the goal from the new episode's first sensor reading.
"""

from __future__ import annotations

import functools
import time
from collections import deque
from typing import Any, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from pointnav_vo_tpu.models.policy import action_log_prob, mode_action, sample_action
from pointnav_vo_tpu.ops import geometry as geo
from pointnav_vo_tpu.parallel.mesh import DATA_AXIS, rollout_pspec
from pointnav_vo_tpu.rl import rollout as rollout_lib
from pointnav_vo_tpu.rl.ppo import PPOConfig, make_optimizer, ppo_update

try:  # jax >= 0.4.35 exposes shard_map at top level
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


@functools.partial(jax.jit, static_argnames=("model", "deterministic"))
def act_step(model, variables, observations, hidden, prev_actions, masks, rng,
             deterministic: bool = False):
    """One batched policy step: logits -> action sample/mode + logp + value."""
    logits, value, new_hidden = model.apply(
        variables, observations, hidden, prev_actions, masks
    )
    action = mode_action(logits) if deterministic else sample_action(rng, logits)
    logp = action_log_prob(logits, action)
    return value, action.astype(jnp.int32), logp, new_hidden


@functools.partial(jax.jit, static_argnames=("model", "deterministic"))
def act_step_update_stats(model, variables, observations, hidden, prev_actions,
                          masks, rng, deterministic: bool = False):
    """act_step that also folds the batch into the policy's RunningMeanAndVar
    whitening buffers — the analogue of the reference's train-mode forward
    during rollout collection (rgb policies with normalize_visual_inputs)."""
    (logits, value, new_hidden), mut = model.apply(
        variables, observations, hidden, prev_actions, masks,
        update_stats=True, mutable=["batch_stats"],
    )
    action = mode_action(logits) if deterministic else sample_action(rng, logits)
    logp = action_log_prob(logits, action)
    return value, action.astype(jnp.int32), logp, new_hidden, mut["batch_stats"]


@functools.partial(jax.jit, static_argnames=())
def propagate_goal(goal_cart, delta, reset_mask, sensor_polar):
    """Dead-reckon the goal through a VO delta; re-seed on episode reset.

    Mirrors the per-step goal overwrite (ppo_trainer.py:206-239 train /
    :723-891 eval) but batched over envs on device.
    reset_mask: [N, 1] 1.0 where the env just started a new episode.
    """
    prop = geo.compute_goal_pos(goal_cart, delta)
    seeded_cart = geo.pointgoal_polar2cartesian(sensor_polar)
    new_cart = jnp.where(reset_mask > 0, seeded_cart, prop["cartesian"])
    rho, phi = geo.cartesian_to_polar(-new_cart[..., 2], new_cart[..., 0])
    new_polar = jnp.stack([rho, -phi], axis=-1)
    return new_cart, new_polar


class DDPPOTrainer:
    """Synchronous data-parallel PPO with optional VO-in-the-loop."""

    def __init__(
        self,
        *,
        model,
        ppo_cfg: PPOConfig,
        envs,
        rng: jax.Array,
        variables: Optional[Dict] = None,
        vo_ensemble=None,
        vo_fn=None,
        mesh=None,
        total_updates: Optional[int] = None,
        reward_window_size: int = 50,
    ):
        self.model = model
        self.cfg = ppo_cfg
        self.envs = envs
        self.vo = vo_ensemble
        # external delta source f(prev_obs, new_obs, actions_np, infos) ->
        # delta [N, 3] — the hook for classical VO (ops/classical_vo) or
        # test oracles; mirrors Evaluator's vo_fn
        self.vo_fn = vo_fn
        self.mesh = mesh
        self.rng = rng
        self.total_updates = total_updates

        obs0 = envs.reset()
        self._last_obs = {k: jnp.asarray(v) for k, v in obs0.items()}
        n = envs.num_envs

        if variables is None:
            self.rng, init_rng = jax.random.split(self.rng)
            dummy = {k: v[:1] for k, v in self._last_obs.items()}
            variables = self.model.init(
                init_rng, dummy, self.model.initial_hidden(1),
                jnp.zeros((1, 1), jnp.int32), jnp.zeros((1, 1)),
            )
        self.variables = dict(variables)
        self.params = self.variables.pop("params")

        self.tx = make_optimizer(ppo_cfg, total_updates)
        self.opt_state = self.tx.init(self.params)

        self.hidden = self.model.initial_hidden(n)
        self.prev_actions = jnp.zeros((n, 1), jnp.int32)
        self.masks = jnp.zeros((n, 1))

        if self.vo is not None or self.vo_fn is not None:
            sensor = self._last_obs["pointgoal_with_gps_compass"]
            self.goal_cart = geo.pointgoal_polar2cartesian(sensor)
            self._last_obs = dict(self._last_obs)
            # policy sees the VO-propagated goal, never the GPS sensor
            self._last_obs["pointgoal_with_gps_compass"] = sensor

        obs_shapes = {k: tuple(v.shape[1:]) for k, v in self._last_obs.items()}
        self.rollouts = rollout_lib.RolloutStorage.create(
            ppo_cfg.num_steps, n, obs_shapes,
            self.model.num_packed_hidden, ppo_cfg.hidden_size,
        )
        self.rollouts = self.rollouts.replace(
            observations={
                k: self.rollouts.observations[k].at[0].set(v)
                for k, v in self._last_obs.items()
            }
        )

        self._sharded_update = self._build_update()
        self.reward_window = deque(maxlen=reward_window_size)
        self.episode_reward = np.zeros(n)
        self.count_steps = 0
        self.update_idx = 0
        self.timing = {"env": 0.0, "act": 0.0, "vo": 0.0, "update": 0.0}

    # -- update step ---------------------------------------------------------

    def _build_update(self):
        model, cfg, tx = self.model, self.cfg, self.tx
        # whitening/batch_stats collections (rgb policies) ride along as
        # extra variables: frozen during the update (they advance during
        # rollout collection via act_step_update_stats), but the forward
        # needs them or flax raises ScopeCollectionNotFound
        if self.mesh is None:
            def update(params, opt_state, rollouts, rng, clip, extra):
                return ppo_update(model, cfg, tx, params, opt_state, rollouts, rng,
                                  clip_param=clip, extra_variables=extra)
            return jax.jit(update)

        mesh = self.mesh
        r_spec = rollout_pspec(self.rollouts)

        def local_update(params, opt_state, rollouts, rng, clip, extra):
            rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
            return ppo_update(
                model, cfg, tx, params, opt_state, rollouts, rng,
                clip_param=clip, axis_name=DATA_AXIS, extra_variables=extra,
            )

        return jax.jit(
            shard_map(
                local_update,
                mesh=mesh,
                in_specs=(P(), P(), r_spec, P(), P(), P()),
                out_specs=(P(), P(), P()),
                check_vma=False,
            )
        )

    # -- rollout collection ----------------------------------------------------

    def _vo_update_goal(self, prev_obs, new_obs, actions, actions_np, dones,
                        infos=None):
        t0 = time.perf_counter()
        if self.vo_fn is not None:
            delta = self.vo_fn(prev_obs, new_obs, actions_np, infos)
        elif self.vo.cfg.mode == "det":
            cur_rgb = jnp.asarray(new_obs["rgb"])
            cur_depth = jnp.asarray(new_obs["depth"])
            # steady-state det path: the previous frame's features are the
            # last step's cache (each frame preprocessed once per rollout;
            # auto-reset keeps the cache valid across episode ends) and each
            # sample runs only its own expert — same math as the full
            # recompute, ~half the preprocess + 1/3 the forward FLOPs
            from pointnav_vo_tpu.vo.ensemble import frame_features

            if getattr(self, "_vo_feats", None) is None:
                self._vo_feats = frame_features(
                    prev_obs["rgb"], prev_obs["depth"], self.vo.cfg)
            delta, self._vo_feats = self.vo.predict_step_cached(
                self._vo_feats, cur_rgb, cur_depth, actions_np)
        else:
            delta, _std, _ = self.vo.compute_local_delta_states_from_vo(
                prev_obs["rgb"], prev_obs["depth"],
                jnp.asarray(new_obs["rgb"]), jnp.asarray(new_obs["depth"]),
                actions[:, 0],
            )
        reset = jnp.asarray(dones.astype(np.float32))[:, None]
        sensor = jnp.asarray(new_obs["pointgoal_with_gps_compass"])
        self.goal_cart, polar = propagate_goal(self.goal_cart, delta, reset, sensor)
        self.timing["vo"] += time.perf_counter() - t0
        return polar

    def collect_rollout(self):
        cfg = self.cfg
        rollouts = self.rollouts
        for step in range(cfg.num_steps):
            t0 = time.perf_counter()
            self.rng, act_rng = jax.random.split(self.rng)
            variables = dict(self.variables)
            variables["params"] = self.params
            if self.variables.get("batch_stats"):
                value, action, logp, new_hidden, new_stats = act_step_update_stats(
                    self.model, variables, self._last_obs, self.hidden,
                    self.prev_actions, self.masks, act_rng,
                )
                self.variables["batch_stats"] = new_stats
            else:
                value, action, logp, new_hidden = act_step(
                    self.model, variables, self._last_obs, self.hidden,
                    self.prev_actions, self.masks, act_rng,
                )
            actions_np = np.asarray(action[:, 0])
            self.timing["act"] += time.perf_counter() - t0

            t0 = time.perf_counter()
            obs, rewards, dones, infos = self.envs.step(actions_np)
            self.timing["env"] += time.perf_counter() - t0

            self.episode_reward += rewards
            for i, d in enumerate(dones):
                if d:
                    self.reward_window.append(self.episode_reward[i])
                    self.episode_reward[i] = 0.0

            new_obs = {k: jnp.asarray(v) for k, v in obs.items()}
            if self.vo is not None or self.vo_fn is not None:
                polar = self._vo_update_goal(self._last_obs, obs, action,
                                             actions_np, dones, infos)
                new_obs["pointgoal_with_gps_compass"] = polar

            masks = jnp.asarray(1.0 - dones.astype(np.float32))[:, None]
            rollouts = rollout_lib.insert_step(
                rollouts, jnp.asarray(step), new_obs, new_hidden,
                action, logp, value, jnp.asarray(rewards)[:, None], masks,
            )
            self._last_obs = new_obs
            self.hidden = new_hidden
            self.prev_actions = action
            self.masks = masks
            self.count_steps += len(dones)
        self.rollouts = rollouts

    def update_agent(self):
        t0 = time.perf_counter()
        variables = dict(self.variables)
        variables["params"] = self.params
        next_value, _, _, _ = act_step(
            self.model, variables, self._last_obs, self.hidden,
            self.prev_actions, self.masks, jax.random.PRNGKey(0),
            deterministic=True,
        )
        rollouts = rollout_lib.compute_returns(
            self.rollouts, next_value, self.cfg.use_gae, self.cfg.gamma, self.cfg.tau
        )
        self.rng, up_rng = jax.random.split(self.rng)
        clip = self.cfg.clip_param
        if getattr(self.cfg, "use_linear_clip_decay", False) and self.total_updates:
            # LambdaLR(linear_decay) on the clip parameter (reference train loop)
            clip = clip * max(0.0, 1.0 - self.update_idx / self.total_updates)
        self.params, self.opt_state, stats = self._sharded_update(
            self.params, self.opt_state, rollouts, up_rng, jnp.asarray(clip),
            self.variables,
        )
        self.rollouts = rollout_lib.after_update(rollouts)
        self.timing["update"] += time.perf_counter() - t0
        self.update_idx += 1
        return jax.tree.map(float, stats)

    def train(self, num_updates: int, log_fn=None):
        """The outer loop (ddppo_trainer.py:350-480, simplified)."""
        history = []
        for _ in range(num_updates):
            self.collect_rollout()
            stats = self.update_agent()
            stats["mean_episode_reward"] = (
                float(np.mean(self.reward_window)) if self.reward_window else 0.0
            )
            stats["count_steps"] = self.count_steps
            history.append(stats)
            if log_fn:
                log_fn(self.update_idx, stats, dict(self.timing))
        return history
