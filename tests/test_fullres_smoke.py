"""Full-resolution flagship-path smoke (VERDICT r1 item 9): the real
vo_cnn_rgb_d_dd_top_down ensemble + resnet18 LSTM policy at the
Challenge-2020 341x192 resolution, driven a few steps through the Evaluator
in both the fused mega-step and the two-dispatch paths.  Slow (full-res
compile) but closes the gap between 4x4-pixel harness tests and the real
deployed shapes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pointnav_vo_tpu.models.policy import PointNavActorCritic
from pointnav_vo_tpu.rl.envs import EnvConfig, make_scripted_vector_env
from pointnav_vo_tpu.rl.eval import Evaluator
from pointnav_vo_tpu.vo.ensemble import (
    VOEnsemble,
    VOInferenceConfig,
    stack_expert_variables,
)

from _utils import fast_init

W, H = 341, 192


@pytest.mark.slow
def test_fullres_eval_fused_and_unfused():
    cfg = VOInferenceConfig(vis_size_w=W, vis_size_h=H)
    vo_model = cfg.make_model()
    dummy = {
        "rgb": jnp.zeros((1, H, W, 6)),
        "depth": jnp.zeros((1, H, W, 2)),
        "discretized_depth": jnp.zeros((1, H, W, 20)),
        "top_down_view": jnp.zeros((1, H, W, 2)),
    }
    per = [fast_init(vo_model, dummy, train=False, seed=i) for i in range(3)]
    policy = PointNavActorCritic(
        n_actions=4, vis_types=("depth",), image_size=(H, W), hidden_size=512,
        num_recurrent_layers=2, rnn_type="LSTM", backbone="resnet18",
    )
    obs1 = {
        "rgb": jnp.zeros((1, H, W, 3)), "depth": jnp.zeros((1, H, W, 1)),
        "pointgoal_with_gps_compass": jnp.zeros((1, 2)),
    }
    pvars = fast_init(policy, obs1, policy.initial_hidden(1),
                      jnp.zeros((1, 1), jnp.int32), jnp.zeros((1, 1)), seed=7)

    env_cfg = EnvConfig(image_h=H, image_w=W, max_episode_steps=4)
    results = {}
    for fused in (True, False):
        ens = VOEnsemble(cfg, stack_expert_variables(per))
        envs = make_scripted_vector_env(env_cfg, num_envs=2, seed=3)
        ev = Evaluator(model=policy, variables=pvars, envs=envs,
                       vo_ensemble=ens, rng=jax.random.PRNGKey(0), fused=fused)
        results[fused] = ev.run(num_episodes=2)
    for key in ("success", "distance_to_goal", "total_env_steps", "vo_l2_mean"):
        np.testing.assert_allclose(results[True][key], results[False][key],
                                   rtol=1e-3, err_msg=key)
    assert np.isfinite(results[True]["vo_l2_mean"])
