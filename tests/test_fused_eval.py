"""Fused VO+act mega-step == the two-dispatch path (deterministic eval)."""

import numpy as np

import jax
import jax.numpy as jnp

from pointnav_vo_tpu.rl.envs import EnvConfig, make_scripted_vector_env
from pointnav_vo_tpu.rl.eval import Evaluator
from pointnav_vo_tpu.vo.ensemble import VOEnsemble, VOInferenceConfig, stack_expert_variables

from _utils import fast_init
from test_eval import GreedyGoalPolicy


def _setup(seed, num_envs=2):
    cfg = VOInferenceConfig(vis_size_w=32, vis_size_h=32)
    model = cfg.make_model()
    dummy = {
        "rgb": jnp.zeros((1, 32, 32, 6)),
        "depth": jnp.zeros((1, 32, 32, 2)),
        "discretized_depth": jnp.zeros((1, 32, 32, 20)),
        "top_down_view": jnp.zeros((1, 32, 32, 2)),
    }
    per = [fast_init(model, dummy, train=False, seed=i) for i in range(3)]
    ens = VOEnsemble(cfg, stack_expert_variables(per))
    env_cfg = EnvConfig(image_h=32, image_w=32, max_episode_steps=12,
                        actuation_noise_multiplier=0.0, rgb_noise_intensity=0.0,
                        depth_noise_multiplier=0.0)
    envs = make_scripted_vector_env(env_cfg, num_envs=num_envs, seed=seed)
    policy = GreedyGoalPolicy(turn_angle_deg=env_cfg.turn_angle_deg,
                              success_distance=env_cfg.success_distance)
    return ens, envs, policy


def test_fused_matches_unfused():
    results = {}
    for fused in (True, False):
        ens, envs, policy = _setup(seed=5)
        ev = Evaluator(model=policy, variables={"params": {}}, envs=envs,
                       vo_ensemble=ens, rng=jax.random.PRNGKey(0), fused=fused)
        results[fused] = ev.run(num_episodes=3)
    for key in ("success", "spl", "distance_to_goal", "total_env_steps"):
        np.testing.assert_allclose(results[True][key], results[False][key],
                                   atol=1e-5, err_msg=key)
    np.testing.assert_allclose(results[True]["vo_l2_mean"],
                               results[False]["vo_l2_mean"], rtol=1e-4)
    # drift integrates IN-PROGRAM on the fused path (one dispatch/step) and
    # on the host via _integrate_global on the unfused path — both must
    # produce the same dead-reckoning diagnostic
    np.testing.assert_allclose(results[True]["global_drift_mean"],
                               results[False]["global_drift_mean"], rtol=1e-4)


def test_mesh_sharded_eval_matches_single_device():
    """Episode-sharded evaluation over the 8-virtual-device mesh == the
    unsharded run (envs on the data axis, params replicated; VERDICT r1
    item 3)."""
    from pointnav_vo_tpu.parallel.mesh import make_mesh

    results = {}
    for mesh in (None, make_mesh(8)):
        ens, envs, policy = _setup(seed=9, num_envs=8)
        ev = Evaluator(model=policy, variables={"params": {}}, envs=envs,
                       vo_ensemble=ens, rng=jax.random.PRNGKey(0), mesh=mesh)
        results[mesh is None] = ev.run(num_episodes=8)
    for key in ("success", "spl", "distance_to_goal", "total_env_steps",
                "vo_l2_mean"):
        np.testing.assert_allclose(results[True][key], results[False][key],
                                   rtol=1e-4, err_msg=key)


def test_mesh_sharded_eval_skewed_budgets_waterfill():
    """The FULL exact-episode-set protocol under sharding (VERDICT r4
    item 6): finite per-env availability forces waterfill redistribution,
    uneven budgets make envs deactivate at different steps (masking over a
    static sharded batch), and the distinct-key accounting runs across
    shard boundaries.  Aggregates must match the single-device run."""
    from pointnav_vo_tpu.parallel.mesh import make_mesh

    results = {}
    for mesh in (None, make_mesh(8)):
        ens, envs, policy = _setup(seed=13, num_envs=8)
        # envs 0-2 report only ONE available episode each: their quota
        # waterfills onto the unbounded envs, so budgets skew (1,1,1,3,3,
        # 3,2,2-ish) and the first three mask out early in the run
        for e in envs.envs[:3]:
            e.number_of_episodes = 1
        ev = Evaluator(model=policy, variables={"params": {}}, envs=envs,
                       vo_ensemble=ens, rng=jax.random.PRNGKey(0), mesh=mesh)
        results[mesh is None] = ev.run(num_episodes=14)
    assert results[True]["episodes"] == 14
    for key in ("episodes", "success", "spl", "distance_to_goal",
                "total_env_steps", "vo_l2_mean"):
        np.testing.assert_allclose(results[True][key], results[False][key],
                                   rtol=1e-4, err_msg=key)


def test_async_env_overlap_matches_sync(monkeypatch):
    """PNVO_EVAL_ASYNC=1 (step_async/step_wait overlap) must produce the
    SAME trajectories and aggregates as the default synchronous protocol —
    the correctness half of the measured 994-episode A/B
    (EVAL_994_async.json vs EVAL_994.json)."""
    results = {}
    for async_flag in ("0", "1"):
        monkeypatch.setenv("PNVO_EVAL_ASYNC", async_flag)
        ens, envs, policy = _setup(seed=7, num_envs=3)
        ev = Evaluator(model=policy, variables={"params": {}}, envs=envs,
                       vo_ensemble=ens, rng=jax.random.PRNGKey(0), fused=True)
        results[async_flag] = ev.run(num_episodes=6)
        envs.close()
    for key in ("episodes", "success", "spl", "distance_to_goal",
                "total_env_steps", "vo_l2_mean", "global_drift_mean"):
        np.testing.assert_allclose(results["1"][key], results["0"][key],
                                   rtol=0, atol=0, err_msg=key)
