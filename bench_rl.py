#!/usr/bin/env python
"""Benchmark: full PPO update throughput on one chip.

One reference-shaped DD-PPO update (``rl/ppo.py::ppo_update``: distributed
advantage normalization, recurrent scan evaluation of the whole rollout,
clipped surrogate + clipped value loss, Adam) on the deployed
``PointNavResNetPolicy`` (depth 341x192, resnet18 + 2-layer LSTM) over a
T=128 rollout — the reference's rollout length (ddppo_pointnav.yaml:62) —
with 16 envs per chip (the reference runs 2 per GPU rank,
ddppo_pointnav.yaml:64; a v5e chip takes a wider batch).

The update is timed per dispatch with a host read gating each step (the
tunnel-safe protocol); at ~2k frames per update the per-dispatch RTT of the
dev tunnel is amortized below ~10%.

The reference publishes no DD-PPO fps, so ``vs_baseline`` is null.
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import numpy as np

T = int(os.environ.get("BENCH_RL_T", 128))
N_ENVS = int(os.environ.get("BENCH_RL_ENVS", 16))
WARMUP = 2
ITERS = 5


def main() -> None:
    from pointnav_vo_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from pointnav_vo_tpu.models.policy import PointNavActorCritic
    from pointnav_vo_tpu.rl.ppo import PPOConfig, make_optimizer, ppo_update
    from pointnav_vo_tpu.rl.rollout import RolloutStorage, compute_returns

    rng = np.random.default_rng(0)
    model = PointNavActorCritic()
    h, w = model.image_size
    obs_shapes = {"depth": (h, w, 1), "pointgoal_with_gps_compass": (2,)}
    storage = RolloutStorage.create(T, N_ENVS, obs_shapes,
                                    model.num_packed_hidden, model.hidden_size)
    storage = storage.replace(
        observations={
            "depth": jnp.asarray(
                rng.uniform(size=(T + 1, N_ENVS, h, w, 1)), jnp.float32),
            "pointgoal_with_gps_compass": jnp.asarray(
                rng.normal(size=(T + 1, N_ENVS, 2)), jnp.float32),
        },
        rewards=jnp.asarray(rng.normal(size=(T, N_ENVS, 1)), jnp.float32),
        actions=jnp.asarray(rng.integers(0, 4, (T, N_ENVS, 1)), jnp.int32),
        prev_actions=jnp.asarray(rng.integers(0, 4, (T + 1, N_ENVS, 1)), jnp.int32),
        masks=jnp.asarray(rng.uniform(size=(T + 1, N_ENVS, 1)) > 0.05, jnp.float32),
        value_preds=jnp.asarray(rng.normal(size=(T + 1, N_ENVS, 1)), jnp.float32),
        action_log_probs=jnp.asarray(
            np.log(rng.uniform(0.1, 0.9, (T, N_ENVS, 1))), jnp.float32),
    )
    storage = compute_returns(storage, storage.value_preds[T], True, 0.99, 0.95)

    # reference PPO hyperparameters (ddppo_pointnav.yaml:57-66)
    cfg = PPOConfig(ppo_epoch=1, num_mini_batch=2, lr=2.5e-4,
                    use_normalized_advantage=True)
    tx = make_optimizer(cfg)

    obs0 = {k: storage.observations[k][0] for k in obs_shapes}
    shapes = jax.eval_shape(lambda: model.init(
        jax.random.PRNGKey(0), obs0, model.initial_hidden(N_ENVS),
        storage.prev_actions[0], storage.masks[0]))
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype) + 0.01, shapes)
    params = variables["params"]
    opt_state = tx.init(params)

    key = jax.random.PRNGKey(0)
    for _ in range(WARMUP):
        key, sub = jax.random.split(key)
        params, opt_state, stats = ppo_update(
            model, cfg, tx, params, opt_state, storage, sub)
        assert np.isfinite(float(stats["value_loss"]))

    t0 = time.perf_counter()
    for _ in range(ITERS):
        key, sub = jax.random.split(key)
        params, opt_state, stats = ppo_update(
            model, cfg, tx, params, opt_state, storage, sub)
        assert np.isfinite(float(stats["value_loss"]))
    dt = (time.perf_counter() - t0) / ITERS

    frames = T * N_ENVS
    print(json.dumps({
        "metric": "rl_ppo_update_frames_per_sec_per_chip",
        "value": round(frames / dt, 2),
        "unit": (f"frames/s (T={T} rollout x {N_ENVS} envs, depth 341x192 "
                 "resnet18+LSTM policy, 1 epoch x 2 minibatches, recurrent "
                 "scan evaluation + clipped losses + adam; "
                 f"{dt * 1e3:.0f} ms/update)"),
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
