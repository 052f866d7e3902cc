"""Challenge-agent integration: VO-propagated goal drives episodes to success."""

import numpy as np

import jax.numpy as jnp

from pointnav_vo_tpu.deploy.challenge_agent import PointNavVOAgent
from pointnav_vo_tpu.rl.envs import EnvConfig, ScriptedPointNavEnv

from test_eval import GreedyGoalPolicy

ENV_CFG = EnvConfig(
    image_h=4, image_w=4, max_episode_steps=80,
    actuation_noise_multiplier=0.0, rgb_noise_intensity=0.0,
    depth_noise_multiplier=0.0,
)


def test_agent_stop_latch_and_success():
    env = ScriptedPointNavEnv(ENV_CFG, seed=0)
    model = GreedyGoalPolicy(turn_angle_deg=ENV_CFG.turn_angle_deg,
                             success_distance=ENV_CFG.success_distance)

    last_gt = {"delta": np.zeros(3, np.float32)}

    def gt_vo(prev_rgb, prev_depth, rgb, depth, prev_action, observations):
        d = jnp.asarray(last_gt["delta"])[None]
        return d, jnp.zeros_like(d)

    agent = PointNavVOAgent(
        policy_model=model, policy_variables={"params": {}},
        vo_fn=gt_vo, goal_sensor="pointgoal_with_gps_compass",
    )

    successes = 0
    for ep in range(3):
        obs = env.reset()
        agent.reset()
        last_gt["delta"] = np.zeros(3, np.float32)
        done = False
        info = {}
        while not done:
            out = agent.act(obs)
            obs, _r, done, info = env.step(out["action"])
            last_gt["delta"] = info["gt_delta"]
        successes += info["success"]
        # STOP latch: after stopping the agent keeps emitting STOP
        if out["action"] == 0:
            assert agent.act(obs)["action"] == 0
    assert successes == 3
