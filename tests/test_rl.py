"""RL stack tests: GAE vs numpy, PPO update semantics, DP-sharded == single."""

import numpy as np
import pytest

import flax.linen as nn
import jax
import jax.numpy as jnp

from pointnav_vo_tpu.models.rnn import RNNStateEncoder
from pointnav_vo_tpu.parallel.mesh import make_mesh
from pointnav_vo_tpu.rl.ppo import PPOConfig, make_optimizer, ppo_update
from pointnav_vo_tpu.rl.rollout import (
    RolloutStorage,
    after_update,
    compute_returns,
    insert_step,
)
from pointnav_vo_tpu.rl.trainer import DDPPOTrainer
from pointnav_vo_tpu.rl.envs import EnvConfig, make_scripted_vector_env

from _utils import fast_init


class TinyActorCritic(nn.Module):
    """Minimal policy with the trainer interface — fast to compile on CPU."""

    n_actions: int = 4
    hidden_size: int = 16

    @property
    def num_packed_hidden(self):
        return 1

    def initial_hidden(self, num_envs):
        return jnp.zeros((1, num_envs, self.hidden_size))

    @nn.compact
    def __call__(self, observations, hidden, prev_actions, masks, update_stats=False):
        seq = prev_actions.ndim == 3
        if seq:
            t, n = prev_actions.shape[:2]
            obs = {k: v.reshape((t * n,) + v.shape[2:]) for k, v in observations.items()}
            flat_masks = masks.reshape(t * n, 1)
        else:
            obs, flat_masks = observations, masks
        x = obs["depth"].reshape(obs["depth"].shape[0], -1)
        x = jnp.concatenate([x, obs["pointgoal_with_gps_compass"]], axis=-1)
        x = nn.relu(nn.Dense(self.hidden_size)(x))
        rnn = RNNStateEncoder(self.hidden_size, self.hidden_size, rnn_type="GRU",
                              name="state_encoder")
        if seq:
            x, hidden = rnn(x.reshape(t, n, -1), hidden, flat_masks.reshape(t, n, 1))
            x = x.reshape(t * n, -1)
        else:
            x, hidden = rnn(x, hidden, flat_masks)
        return nn.Dense(self.n_actions)(x), nn.Dense(1)(x), hidden


def _np_gae(rewards, values, masks, gamma, tau):
    t = rewards.shape[0]
    returns = np.zeros_like(rewards)
    gae = 0.0
    for i in reversed(range(t)):
        delta = rewards[i] + gamma * values[i + 1] * masks[i + 1] - values[i]
        gae = delta + gamma * tau * masks[i + 1] * gae
        returns[i] = gae + values[i]
    return returns


def _mk_storage(t=6, n=4, obs_dim=3):
    return RolloutStorage.create(t, n, {"x": (obs_dim,)}, 1, 8)


def test_gae_matches_numpy():
    rng = np.random.default_rng(0)
    t, n = 6, 4
    storage = _mk_storage(t, n)
    rewards = rng.normal(size=(t, n, 1)).astype(np.float32)
    values = rng.normal(size=(t + 1, n, 1)).astype(np.float32)
    masks = (rng.uniform(size=(t + 1, n, 1)) > 0.2).astype(np.float32)
    storage = storage.replace(
        rewards=jnp.asarray(rewards),
        value_preds=jnp.asarray(values),
        masks=jnp.asarray(masks),
    )
    out = compute_returns(storage, jnp.asarray(values[t]), True, 0.99, 0.95)
    want = _np_gae(rewards, values, masks, 0.99, 0.95)
    np.testing.assert_allclose(np.asarray(out.returns[:t]), want, atol=1e-5)


def test_discounted_returns_no_gae():
    rng = np.random.default_rng(1)
    t, n = 5, 2
    storage = _mk_storage(t, n)
    rewards = rng.normal(size=(t, n, 1)).astype(np.float32)
    masks = np.ones((t + 1, n, 1), np.float32)
    next_v = rng.normal(size=(n, 1)).astype(np.float32)
    storage = storage.replace(rewards=jnp.asarray(rewards), masks=jnp.asarray(masks))
    out = compute_returns(storage, jnp.asarray(next_v), False, 0.9, 0.95)
    want = np.zeros((t + 1, n, 1), np.float32)
    want[t] = next_v
    for i in reversed(range(t)):
        want[i] = want[i + 1] * 0.9 + rewards[i]
    np.testing.assert_allclose(np.asarray(out.returns), want, atol=1e-5)


def test_insert_and_after_update_roll():
    t, n = 3, 2
    storage = _mk_storage(t, n)
    obs = {"x": jnp.ones((n, 3)) * 7}
    storage = insert_step(
        storage, jnp.asarray(t - 1), obs, jnp.ones((1, n, 8)),
        jnp.ones((n, 1), jnp.int32) * 2, jnp.zeros((n, 1)), jnp.zeros((n, 1)),
        jnp.ones((n, 1)), jnp.ones((n, 1)) * 0.5,
    )
    rolled = after_update(storage)
    np.testing.assert_array_equal(np.asarray(rolled.observations["x"][0]), 7.0)
    np.testing.assert_array_equal(np.asarray(rolled.masks[0]), 0.5)
    np.testing.assert_array_equal(np.asarray(rolled.prev_actions[0]), 2)


def _make_rollouts_and_model(t=8, n_envs=8, seed=0):
    rng = np.random.default_rng(seed)
    model = TinyActorCritic()
    obs_shapes = {"depth": (4, 4, 1), "pointgoal_with_gps_compass": (2,)}
    storage = RolloutStorage.create(t, n_envs, obs_shapes, 1, 16)
    storage = storage.replace(
        observations={
            "depth": jnp.asarray(rng.uniform(size=(t + 1, n_envs, 4, 4, 1)), jnp.float32),
            "pointgoal_with_gps_compass": jnp.asarray(
                rng.normal(size=(t + 1, n_envs, 2)), jnp.float32
            ),
        },
        rewards=jnp.asarray(rng.normal(size=(t, n_envs, 1)), jnp.float32),
        actions=jnp.asarray(rng.integers(0, 4, size=(t, n_envs, 1)), jnp.int32),
        prev_actions=jnp.asarray(rng.integers(0, 4, size=(t + 1, n_envs, 1)), jnp.int32),
        masks=jnp.asarray((rng.uniform(size=(t + 1, n_envs, 1)) > 0.15), jnp.float32),
        value_preds=jnp.asarray(rng.normal(size=(t + 1, n_envs, 1)), jnp.float32),
        action_log_probs=jnp.asarray(np.log(rng.uniform(0.1, 0.9, size=(t, n_envs, 1))), jnp.float32),
    )
    storage = compute_returns(storage, storage.value_preds[t], True, 0.99, 0.95)
    obs0 = {k: storage.observations[k][0] for k in obs_shapes}
    variables = fast_init(model, obs0, model.initial_hidden(n_envs),
                          storage.prev_actions[0], storage.masks[0])
    return model, storage, variables["params"]


def test_ppo_update_runs_and_improves_surrogate():
    cfg = PPOConfig(num_mini_batch=2, ppo_epoch=2, use_normalized_advantage=True, lr=1e-3)
    model, storage, params = _make_rollouts_and_model()
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)
    p1, o1, stats = ppo_update(model, cfg, tx, params, opt_state, storage,
                               jax.random.PRNGKey(0))
    assert np.isfinite(stats["value_loss"]) and np.isfinite(stats["action_loss"])
    # params actually moved
    moved = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(jnp.sum(jnp.abs(a - b))), params, p1),
    )
    assert moved > 0


def test_sharded_update_matches_single_device():
    """psum/pmean DP update == single-device update on the full batch
    (SURVEY.md §4 item 4 — the check the reference never had for DDP)."""
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P
    from pointnav_vo_tpu.parallel.mesh import DATA_AXIS, rollout_pspec

    assert jax.device_count() >= 4, "conftest must provide 8 CPU devices"
    cfg = PPOConfig(num_mini_batch=1, ppo_epoch=1, use_normalized_advantage=True)
    model, storage, params = _make_rollouts_and_model(n_envs=8)
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)
    rng = jax.random.PRNGKey(1)

    p_single, _, s_single = ppo_update(model, cfg, tx, params, opt_state, storage, rng)

    mesh = make_mesh(4)
    r_spec = rollout_pspec(storage)

    def local_update(params, opt_state, rollouts, r):
        return ppo_update(model, cfg, tx, params, opt_state, rollouts, r,
                          axis_name=DATA_AXIS)

    sharded = jax.jit(
        shard_map(local_update, mesh=mesh, in_specs=(P(), P(), r_spec, P()),
                  out_specs=(P(), P(), P()), check_vma=False)
    )
    p_shard, _, s_shard = sharded(params, opt_state, storage, rng)

    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5),
        p_single, p_shard,
    )
    np.testing.assert_allclose(
        float(s_single["action_loss"]), float(s_shard["action_loss"]), atol=1e-5
    )


def test_trainer_end_to_end_scripted_env():
    """Two full PPO updates on the scripted env with the tiny policy."""
    env_cfg = EnvConfig(image_h=4, image_w=4, max_episode_steps=12,
                        actuation_noise_multiplier=0.0, rgb_noise_intensity=0.0,
                        depth_noise_multiplier=0.0)
    envs = make_scripted_vector_env(env_cfg, num_envs=4, seed=0)
    cfg = PPOConfig(num_steps=8, num_mini_batch=2, hidden_size=16)
    model = TinyActorCritic()
    obs0 = envs.reset()
    variables = fast_init(
        model,
        {k: jnp.asarray(v) for k, v in obs0.items() if k in ("depth", "pointgoal_with_gps_compass")},
        model.initial_hidden(4), jnp.zeros((4, 1), jnp.int32), jnp.zeros((4, 1)),
    )

    class _FilteredEnvs:
        """Expose only the keys the tiny policy consumes."""

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

    trainer = DDPPOTrainer(
        model=model, ppo_cfg=cfg, envs=_FilteredEnvs(envs),
        rng=jax.random.PRNGKey(0), variables=variables,
    )
    history = trainer.train(num_updates=2)
    assert len(history) == 2
    for h in history:
        assert np.isfinite(h["value_loss"])
        assert np.isfinite(h["action_loss"])
    assert trainer.count_steps == 2 * 8 * 4
