"""End-to-end eval with the 'rnd' dropout-ensemble uncertainty mode."""

import numpy as np

import jax

from pointnav_vo_tpu.rl.envs import EnvConfig, make_scripted_vector_env
from pointnav_vo_tpu.rl.eval import Evaluator
from pointnav_vo_tpu.vo.ensemble import VOEnsemble, VOInferenceConfig, stack_expert_variables

from _utils import fast_init
from test_eval import GreedyGoalPolicy


def test_eval_with_rnd_mode_reports_pred_std():
    cfg = VOInferenceConfig(vis_size_w=32, vis_size_h=32, mode="rnd", rnd_mode_n=3)
    model = cfg.make_model()
    dummy = {
        "rgb": np.zeros((1, 32, 32, 6), np.float32),
        "depth": np.zeros((1, 32, 32, 2), np.float32),
        "discretized_depth": np.zeros((1, 32, 32, 20), np.float32),
        "top_down_view": np.zeros((1, 32, 32, 2), np.float32),
    }
    import jax.numpy as jnp

    dummy = {k: jnp.asarray(v) for k, v in dummy.items()}
    per = [fast_init(model, dummy, train=False, seed=i) for i in range(3)]
    ens = VOEnsemble(cfg, stack_expert_variables(per))

    env_cfg = EnvConfig(image_h=32, image_w=32, max_episode_steps=15,
                        actuation_noise_multiplier=0.0, rgb_noise_intensity=0.0,
                        depth_noise_multiplier=0.0)
    aggs = {}
    for fused in (True, False):
        envs = make_scripted_vector_env(env_cfg, num_envs=2, seed=0)
        policy = GreedyGoalPolicy(turn_angle_deg=env_cfg.turn_angle_deg,
                                  success_distance=env_cfg.success_distance)
        ev = Evaluator(model=policy, variables={"params": {}}, envs=envs,
                       vo_ensemble=ens, rng=jax.random.PRNGKey(1), fused=fused)
        aggs[fused] = ev.run(num_episodes=2)
    agg = aggs[True]
    # untrained VO -> goals drift, but the uncertainty plumbing must report
    assert "vo_pred_std_mean" in agg
    assert agg["vo_pred_std_mean"] > 0.0
    assert np.isfinite(agg["vo_l2_mean"])
    # the fused mega-step consumes the dropout rng exactly like the
    # two-dispatch path -> bit-equal trajectories and uncertainties
    for key in ("success", "spl", "distance_to_goal", "total_env_steps",
                "vo_l2_mean", "vo_pred_std_mean"):
        np.testing.assert_allclose(aggs[True][key], aggs[False][key],
                                   rtol=1e-6, err_msg=key)
