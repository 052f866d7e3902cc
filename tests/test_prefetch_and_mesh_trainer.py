"""Prefetching loader semantics + DDPPO trainer over a device mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pointnav_vo_tpu.parallel.mesh import make_mesh
from pointnav_vo_tpu.rl.envs import EnvConfig, make_scripted_vector_env
from pointnav_vo_tpu.rl.ppo import PPOConfig
from pointnav_vo_tpu.rl.trainer import DDPPOTrainer
from pointnav_vo_tpu.vo.dataset import PrefetchingLoader

from _utils import fast_init
from test_rl import TinyActorCritic


def test_prefetching_loader_preserves_order_and_errors():
    items = list(range(20))
    loader = PrefetchingLoader(lambda: iter(items), depth=3)
    assert list(loader) == items
    # reusable (fresh iterator each pass)
    assert list(loader) == items

    def boom():
        yield 1
        raise RuntimeError("reader died")

    with pytest.raises(RuntimeError, match="reader died"):
        list(PrefetchingLoader(boom))


def test_trainer_with_mesh_runs():
    """Data-parallel PPO update over a 4-device mesh inside the trainer."""
    env_cfg = EnvConfig(image_h=4, image_w=4, max_episode_steps=12,
                        actuation_noise_multiplier=0.0, rgb_noise_intensity=0.0,
                        depth_noise_multiplier=0.0)
    envs = make_scripted_vector_env(env_cfg, num_envs=8, seed=0)
    cfg = PPOConfig(num_steps=4, num_mini_batch=1, hidden_size=16,
                    use_normalized_advantage=True)
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

    variables = fast_init(
        model,
        {k: jnp.asarray(v) for k, v in obs0.items() if k in ("depth", "pointgoal_with_gps_compass")},
        model.initial_hidden(8), jnp.zeros((8, 1), jnp.int32), jnp.zeros((8, 1)),
    )
    trainer = DDPPOTrainer(
        model=model, ppo_cfg=cfg, envs=F(envs), rng=jax.random.PRNGKey(0),
        variables=variables, mesh=make_mesh(4),
    )
    history = trainer.train(num_updates=2)
    assert all(np.isfinite(h["value_loss"]) for h in history)
