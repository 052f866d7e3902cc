"""Clipped PPO as one jitted SPMD update — DD-PPO without DDP.

Functional counterpart of the reference's ``rl/ppo/ppo.py:14-158`` plus the
distributed machinery of ``rl/ddppo/algo/ddppo.py:18-97``:

- advantage normalization (:55-60) with the distributed mean/var
  (ddppo.py:18-42) expressed as ``psum`` of (sum, sumsq, count) over the mesh
  axis — the two NCCL all_reduces become XLA collectives inside the program;
- the recurrent minibatch generator (rollout_storage.py:122-211) becomes an
  env-axis permutation + gather inside the jitted update;
- DDP gradient averaging (ddppo.py:69-90) becomes ``pmean(grads)``;
- grad clip (global norm, ppo.py:154-155) via optax.

The entire update (all ppo epochs x minibatches) is a single jitted function:
launch once per rollout, zero host synchronization inside.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from pointnav_vo_tpu.models.policy import action_log_prob, entropy
from pointnav_vo_tpu.rl.rollout import RolloutStorage

EPS_PPO = 1e-5


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    """Mirrors RL.PPO of configs/rl/ddppo_pointnav.yaml:56-76."""

    clip_param: float = 0.2
    ppo_epoch: int = 1
    num_mini_batch: int = 2
    value_loss_coef: float = 0.5
    entropy_coef: float = 0.01
    lr: float = 2.5e-4
    eps: float = 1e-5
    max_grad_norm: float = 0.2
    num_steps: int = 128
    use_gae: bool = True
    gamma: float = 0.99
    tau: float = 0.95
    use_clipped_value_loss: bool = True
    use_normalized_advantage: bool = False
    use_linear_lr_decay: bool = False
    use_linear_clip_decay: bool = False
    hidden_size: int = 512
    reward_window_size: int = 50


def make_optimizer(cfg: PPOConfig, total_updates: Optional[int] = None):
    """clip-by-global-norm -> Adam, with optional linear lr decay
    (reference: LambdaLR(linear_decay), ppo_trainer.py train loop)."""
    if cfg.use_linear_lr_decay and total_updates:
        lr = optax.linear_schedule(cfg.lr, 0.0, total_updates)
    else:
        lr = cfg.lr
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adam(learning_rate=lr, eps=cfg.eps),
    )


def distributed_mean_and_var(x: jax.Array, axis_name: Optional[str]) -> Tuple[jax.Array, jax.Array]:
    """Mean/var over all elements on all devices (ddppo.py:18-42)."""
    s = jnp.sum(x)
    sq = jnp.sum(x * x)
    n = jnp.asarray(x.size, jnp.float32)
    if axis_name is not None:
        s = jax.lax.psum(s, axis_name)
        sq = jax.lax.psum(sq, axis_name)
        n = jax.lax.psum(n, axis_name)
    mean = s / n
    var = sq / n - mean * mean
    return mean, var


def _gather_env_slice(rollouts: RolloutStorage, idx: jax.Array):
    """Select env columns `idx` from every [.., N, ..] rollout array."""
    t = rollouts.num_steps
    obs = {k: v[:t][:, idx] for k, v in rollouts.observations.items()}
    return (
        obs,
        rollouts.hidden_states[0][:, idx],  # [L, n_mb, H]
        rollouts.actions[:, idx],
        rollouts.prev_actions[:t][:, idx],
        rollouts.value_preds[:t][:, idx],
        rollouts.returns[:t][:, idx],
        rollouts.masks[:t][:, idx],
        rollouts.action_log_probs[:, idx],
    )


@functools.partial(
    jax.jit, static_argnames=("model", "cfg", "tx", "axis_name")
)
def ppo_update(
    model,
    cfg: PPOConfig,
    tx,
    params: Dict,
    opt_state,
    rollouts: RolloutStorage,
    rng: jax.Array,
    clip_param: Optional[jax.Array] = None,
    axis_name: Optional[str] = None,
    extra_variables: Optional[Dict] = None,
):
    """One full PPO update. Returns (params, opt_state, stats).

    stats = {value_loss, action_loss, dist_entropy} averaged over minibatches
    (and over the mesh axis when axis_name is set), matching the reference's
    reporting (ppo.py:136-146, ddppo_trainer.py:439-448).
    """
    clip = cfg.clip_param if clip_param is None else clip_param
    advantages = rollouts.returns[:-1] - rollouts.value_preds[:-1]
    if cfg.use_normalized_advantage:
        mean, var = distributed_mean_and_var(advantages, axis_name)
        advantages = (advantages - mean) / (jnp.sqrt(var) + EPS_PPO)

    n_envs = rollouts.num_envs
    n_per_mb = n_envs // cfg.num_mini_batch
    assert n_per_mb > 0, "need at least num_mini_batch envs"

    def loss_fn(p, mb):
        obs, h0, actions, prev_actions, old_values, returns, masks, old_logp, adv = mb
        variables = dict(extra_variables or {})
        variables["params"] = p
        logits, values, _ = model.apply(variables, obs, h0, prev_actions, masks)
        tn = logits.shape[0]
        flat_actions = actions.reshape(tn, 1)
        logp = action_log_prob(logits, flat_actions)
        ent = jnp.mean(entropy(logits))

        ratio = jnp.exp(logp - old_logp.reshape(tn, 1))
        adv_f = adv.reshape(tn, 1)
        surr1 = ratio * adv_f
        surr2 = jnp.clip(ratio, 1.0 - clip, 1.0 + clip) * adv_f
        action_loss = -jnp.mean(jnp.minimum(surr1, surr2))

        ret_f = returns.reshape(tn, 1)
        if cfg.use_clipped_value_loss:
            old_v = old_values.reshape(tn, 1)
            v_clip = old_v + jnp.clip(values - old_v, -clip, clip)
            v_losses = (values - ret_f) ** 2
            v_losses_clip = (v_clip - ret_f) ** 2
            value_loss = 0.5 * jnp.mean(jnp.maximum(v_losses, v_losses_clip))
        else:
            value_loss = 0.5 * jnp.mean((ret_f - values) ** 2)

        total = value_loss * cfg.value_loss_coef + action_loss - ent * cfg.entropy_coef
        return total, (value_loss, action_loss, ent)

    grad_fn = jax.grad(loss_fn, has_aux=True)

    def run_minibatch(carry, idx):
        params, opt_state = carry
        mb = _gather_env_slice(rollouts, idx) + (advantages[:, idx],)
        grads, (v_l, a_l, ent) = grad_fn(params, mb)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), jnp.stack([v_l, a_l, ent])

    stats_acc = jnp.zeros(3)
    for _ in range(cfg.ppo_epoch):
        rng, sub = jax.random.split(rng)
        perm = jax.random.permutation(sub, n_envs)
        mb_idx = perm[: n_per_mb * cfg.num_mini_batch].reshape(cfg.num_mini_batch, n_per_mb)
        (params, opt_state), stats = jax.lax.scan(
            run_minibatch, (params, opt_state), mb_idx
        )
        stats_acc = stats_acc + jnp.sum(stats, axis=0)

    stats_acc = stats_acc / (cfg.ppo_epoch * cfg.num_mini_batch)
    if axis_name is not None:
        stats_acc = jax.lax.pmean(stats_acc, axis_name)
    stats = {"value_loss": stats_acc[0], "action_loss": stats_acc[1],
             "dist_entropy": stats_acc[2]}
    return params, opt_state, stats
