"""Classical-VO backend: depth-scaled 3D-3D alignment math + the end-to-end
``VO.VO_TYPE: CLASSICAL`` path through the Evaluator's vo_fn hook (the
paper's learned-vs-classical baseline, reproducible in-framework — the
reference ships only the geometry, geometry_utils.py:831-865)."""

import numpy as np
import pytest

from pointnav_vo_tpu.common import MOVE_FORWARD, TURN_LEFT, TURN_RIGHT
from pointnav_vo_tpu.vo.classical import (
    action_prior,
    delta_from_matches,
    make_classical_vo_fn,
    unproject_depth,
)


def _rot_y(theta):
    c, s = np.cos(theta), np.sin(theta)
    return np.asarray([[c, 0, s], [0, 1, 0], [-s, 0, c]])


@pytest.mark.parametrize("delta", [
    (0.0, -0.25, 0.0),                  # forward step
    (0.0, 0.0, np.radians(30.0)),       # left turn
    (0.0, 0.0, -np.radians(30.0)),      # right turn
    (0.03, -0.22, np.radians(-4.0)),    # noisy mixed motion
])
def test_delta_from_matches_recovers_known_motion(delta):
    """Known (dx, dz, dyaw) -> synthetic matched point sets -> recovered."""
    dx, dz, dyaw = delta
    rng = np.random.default_rng(0)
    pts_prev = rng.uniform(-2, 2, (3, 40))
    pts_prev[2] -= 3.0  # in front of the camera (looking -z)
    r = _rot_y(dyaw)
    t = np.asarray([dx, 0.0, dz])
    # p_prev = R p_cur + t  =>  p_cur = R^T (p_prev - t)
    pts_cur = r.T @ (pts_prev - t[:, None])
    got = delta_from_matches(pts_prev, pts_cur)
    np.testing.assert_allclose(got, [dx, dz, dyaw], atol=1e-5)


def test_unproject_center_pixel():
    """The principal-axis pixel unprojects to (0, 0, -depth_m)."""
    h, w = 64, 96
    depth = np.full((h, w), 0.5, np.float32)  # 0.1 + 0.5*9.9 = 5.05 m
    pts = unproject_depth(np.asarray([[w / 2.0, h / 2.0]]), depth,
                          hfov_deg=70.0, min_depth=0.1, max_depth=10.0)
    np.testing.assert_allclose(pts[:, 0], [0.0, 0.0, -5.05], atol=1e-5)


def test_action_prior_signs():
    np.testing.assert_allclose(action_prior(MOVE_FORWARD), [0, -0.25, 0])
    assert action_prior(TURN_LEFT)[2] > 0 > action_prior(TURN_RIGHT)[2]


def test_classical_vo_fn_shapes_and_fallback():
    """Textureless frames -> prior fallback with correct shapes/values."""
    n, h, w = 3, 32, 32
    obs = {
        "rgb": np.zeros((n, h, w, 3), np.float32),
        "depth": np.full((n, h, w, 1), 0.5, np.float32),
    }
    vo_fn = make_classical_vo_fn()
    actions = np.asarray([[MOVE_FORWARD], [TURN_LEFT], [TURN_RIGHT]])
    delta, std = vo_fn(obs, obs, actions, [{}] * n)
    delta = np.asarray(delta)
    np.testing.assert_allclose(delta[0], [0, -0.25, 0], atol=1e-6)
    assert delta[1, 2] > 0 > delta[2, 2]
    assert np.asarray(std).shape == (n, 3)


def test_classical_backend_through_evaluator():
    """End-to-end: Evaluator with the classical vo_fn navigates the
    noise-free scripted world (prior fallback == exact motion there)."""
    import jax

    from pointnav_vo_tpu.rl.envs import EnvConfig, make_scripted_vector_env
    from pointnav_vo_tpu.rl.eval import Evaluator
    from test_eval import GreedyGoalPolicy

    cfg = EnvConfig(image_h=16, image_w=16, max_episode_steps=60,
                    actuation_noise_multiplier=0.0, rgb_noise_intensity=0.0,
                    depth_noise_multiplier=0.0)
    envs = make_scripted_vector_env(cfg, num_envs=2, seed=0)
    model = GreedyGoalPolicy(turn_angle_deg=cfg.turn_angle_deg,
                             success_distance=cfg.success_distance)
    vo_fn = make_classical_vo_fn(forward_step=cfg.forward_step,
                                 turn_angle_deg=cfg.turn_angle_deg,
                                 min_depth=cfg.min_depth,
                                 max_depth=cfg.max_depth)
    ev = Evaluator(model=model, variables={"params": {}}, envs=envs,
                   vo_fn=vo_fn, rng=jax.random.PRNGKey(0))
    agg = ev.run(num_episodes=3)
    assert agg["episodes"] == 3
    assert agg["success"] == 1.0  # exact priors in the noise-free world
    assert agg["vo_l2_mean"] < 1e-4


def test_classical_engine_config_dispatch():
    """VO_TYPE CLASSICAL builds a vo_fn and no ensemble."""
    from pointnav_vo_tpu.config.defaults import get_rl_config
    from pointnav_vo_tpu.engines import _build_classical_vo_fn, _build_vo_ensemble

    cfg = get_rl_config()
    cfg.VO.USE_VO_MODEL = True
    cfg.VO.VO_TYPE = "CLASSICAL"
    assert _build_vo_ensemble(cfg) is None
    assert callable(_build_classical_vo_fn(cfg))
