"""Rollout storage as an immutable device pytree + GAE via lax.scan.

Counterpart of the reference's ``rl/common/rollout_storage.py:12-225``.
Differences by design (TPU-first):

- storage is a ``flax.struct`` pytree of [T+1, N, ...] device arrays; inserts
  are jitted functional updates (donated buffers make them in-place on TPU);
- GAE (:102-120 in the reference) is a reversed ``lax.scan`` instead of a
  Python loop — one fused kernel over the whole rollout;
- the recurrent minibatch generator (:122-211) becomes an index-gather inside
  the jitted PPO update (rl/ppo.py), so no host roundtrips during the update.

Rollouts are fixed-length T (synchronous across the data-parallel mesh). The
reference's early-truncation support existed for DD-PPO straggler preemption
(ddppo_trainer.py:411-419), which a synchronous TPU mesh does not need — env
stepping is host-side and the update step is a lockstep SPMD program.
"""

from __future__ import annotations

import functools
from typing import Dict

import flax.struct
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class RolloutStorage:
    observations: Dict[str, jax.Array]  # each [T+1, N, ...]
    hidden_states: jax.Array  # [T+1, L_pack, N, H]
    rewards: jax.Array  # [T, N, 1]
    value_preds: jax.Array  # [T+1, N, 1]
    returns: jax.Array  # [T+1, N, 1]
    action_log_probs: jax.Array  # [T, N, 1]
    actions: jax.Array  # [T, N, 1] int32
    prev_actions: jax.Array  # [T+1, N, 1] int32
    masks: jax.Array  # [T+1, N, 1]

    @property
    def num_steps(self) -> int:
        return self.rewards.shape[0]

    @property
    def num_envs(self) -> int:
        return self.rewards.shape[1]

    @classmethod
    def create(cls, num_steps: int, num_envs: int, obs_shapes: Dict[str, tuple],
               num_packed_hidden: int, hidden_size: int,
               obs_dtypes: Dict[str, jnp.dtype] | None = None) -> "RolloutStorage":
        obs_dtypes = obs_dtypes or {}
        obs = {
            k: jnp.zeros((num_steps + 1, num_envs) + tuple(s),
                         obs_dtypes.get(k, jnp.float32))
            for k, s in obs_shapes.items()
        }
        return cls(
            observations=obs,
            hidden_states=jnp.zeros((num_steps + 1, num_packed_hidden, num_envs, hidden_size)),
            rewards=jnp.zeros((num_steps, num_envs, 1)),
            value_preds=jnp.zeros((num_steps + 1, num_envs, 1)),
            returns=jnp.zeros((num_steps + 1, num_envs, 1)),
            action_log_probs=jnp.zeros((num_steps, num_envs, 1)),
            actions=jnp.zeros((num_steps, num_envs, 1), jnp.int32),
            prev_actions=jnp.zeros((num_steps + 1, num_envs, 1), jnp.int32),
            masks=jnp.zeros((num_steps + 1, num_envs, 1)),
        )


@functools.partial(jax.jit, donate_argnames=("storage",))
def insert_step(
    storage: RolloutStorage,
    step: jax.Array,
    observations: Dict[str, jax.Array],
    hidden_states: jax.Array,
    actions: jax.Array,
    action_log_probs: jax.Array,
    value_preds: jax.Array,
    rewards: jax.Array,
    masks: jax.Array,
) -> RolloutStorage:
    """Functional insert (reference insert(), :71-91)."""
    obs = {
        k: storage.observations[k].at[step + 1].set(v.astype(storage.observations[k].dtype))
        for k, v in observations.items()
    }
    return storage.replace(
        observations=obs,
        hidden_states=storage.hidden_states.at[step + 1].set(hidden_states),
        actions=storage.actions.at[step].set(actions),
        prev_actions=storage.prev_actions.at[step + 1].set(actions),
        action_log_probs=storage.action_log_probs.at[step].set(action_log_probs),
        value_preds=storage.value_preds.at[step].set(value_preds),
        rewards=storage.rewards.at[step].set(rewards),
        masks=storage.masks.at[step + 1].set(masks),
    )


@functools.partial(jax.jit, donate_argnames=("storage",))
def after_update(storage: RolloutStorage) -> RolloutStorage:
    """Roll the last step to slot 0 (reference after_update(), :93-100)."""
    t = storage.num_steps
    return storage.replace(
        observations={k: v.at[0].set(v[t]) for k, v in storage.observations.items()},
        hidden_states=storage.hidden_states.at[0].set(storage.hidden_states[t]),
        masks=storage.masks.at[0].set(storage.masks[t]),
        prev_actions=storage.prev_actions.at[0].set(storage.prev_actions[t]),
    )


@functools.partial(jax.jit, static_argnames=("use_gae", "gamma", "tau"))
def compute_returns(
    storage: RolloutStorage,
    next_value: jax.Array,
    use_gae: bool = True,
    gamma: float = 0.99,
    tau: float = 0.95,
) -> RolloutStorage:
    """GAE / discounted returns as a reversed scan (reference :102-120)."""
    t = storage.num_steps
    if use_gae:
        value_preds = storage.value_preds.at[t].set(next_value)

        def scan_fn(gae, inp):
            reward, v_t, v_tp1, mask_tp1 = inp
            delta = reward + gamma * v_tp1 * mask_tp1 - v_t
            gae = delta + gamma * tau * mask_tp1 * gae
            return gae, gae + v_t

        _, returns = jax.lax.scan(
            scan_fn,
            jnp.zeros_like(next_value),
            (storage.rewards, value_preds[:-1], value_preds[1:], storage.masks[1:]),
            reverse=True,
        )
        return storage.replace(
            value_preds=value_preds,
            returns=storage.returns.at[:t].set(returns),
        )

    def scan_fn(ret, inp):
        reward, mask_tp1 = inp
        ret = ret * gamma * mask_tp1 + reward
        return ret, ret

    _, returns = jax.lax.scan(
        scan_fn, next_value, (storage.rewards, storage.masks[1:]), reverse=True
    )
    return storage.replace(
        returns=storage.returns.at[:t].set(returns).at[t].set(next_value)
    )
