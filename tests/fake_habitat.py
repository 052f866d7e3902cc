"""A stub ``habitat`` package exposing the exact API surface HabitatNavEnv
consumes (the contract of reference env_utils.py:16-98): ``get_config``,
``make_dataset``, ``Env`` with seed/reset/step/episode_over/get_metrics/sim.
The simulation core is the scripted PointNav world, so the adapter's derived
quantities (reward shaping, GT deltas from agent states) can be checked
against the core's ground truth.
"""

from __future__ import annotations

import numpy as np

from pointnav_vo_tpu.config.defaults import get_task_config
from pointnav_vo_tpu.rl.envs import EnvConfig, ScriptedPointNavEnv

ALL_SCENES = ["Adrian", "Albertville", "Anaheim", "Andover"]


class _Quat:
    """np.quaternion stand-in (attribute layout w/x/y/z)."""

    def __init__(self, x, y, z, w):
        self.x, self.y, self.z, self.w = x, y, z, w


class _AgentState:
    def __init__(self, position, rotation):
        self.position = position
        self.rotation = rotation


class _Sim:
    def __init__(self, core: ScriptedPointNavEnv):
        self._core = core

    def get_agent_state(self) -> _AgentState:
        e = self._core
        pos = np.asarray([e.pos[0], 0.0, e.pos[1]], np.float64)
        half = e.yaw / 2.0
        return _AgentState(pos, _Quat(0.0, np.sin(half), 0.0, np.cos(half)))


class _Dataset:
    def __init__(self, scenes):
        self.scenes = list(scenes)

    def get_scenes_to_load(self, cfg):
        return list(self.scenes)


def make_dataset(dataset_type, config=None):
    if config is not None:
        scenes = list(config.get("CONTENT_SCENES", ALL_SCENES))
        if "*" in scenes:
            scenes = ALL_SCENES
        return _Dataset(scenes)
    return _Dataset(ALL_SCENES)


# Contract-test knob: model a habitat build whose config schema REJECTS
# unknown keys (yacs new_allowed=False) and ships WITHOUT the Challenge
# noise nodes — the adapter must then refuse to run rather than silently
# evaluate noise-free (rl/envs.py NOISE_CRITICAL_KEYS tripwire).
STRICT_NO_NOISE = False


def get_config(config_paths=None, opts=None):
    c = get_task_config()
    c.DATASET.CONTENT_SCENES = ["*"]
    if STRICT_NO_NOISE:
        from pointnav_vo_tpu.utils.config import Config

        d = c.to_dict()
        sim = d["SIMULATOR"]
        sim.pop("NOISE_MODEL", None)
        sim.pop("ACTION_SPACE_CONFIG", None)
        sim["RGB_SENSOR"].pop("NOISE_MODEL", None)
        sim["RGB_SENSOR"].pop("NOISE_MODEL_KWARGS", None)
        sim["DEPTH_SENSOR"].pop("NOISE_MODEL", None)
        strict = Config(d)

        def lock(node):  # reject unknown keys from here on
            object.__setattr__(node, "_new_allowed", False)
            for v in node.values():
                if isinstance(v, Config):
                    lock(v)

        lock(strict)
        return strict
    return c


class Env:
    """habitat.Env stand-in over the scripted world."""

    def __init__(self, config, dataset=None):
        self.config = config
        self.dataset = dataset
        sim = config.SIMULATOR
        self._core = ScriptedPointNavEnv(
            EnvConfig(
                image_h=sim.DEPTH_SENSOR.HEIGHT,
                image_w=sim.DEPTH_SENSOR.WIDTH,
                max_episode_steps=config.ENVIRONMENT.MAX_EPISODE_STEPS,
                success_distance=config.TASK.SUCCESS_DISTANCE,
            ),
            seed=int(config.SEED),
        )
        self.sim = _Sim(self._core)
        self._metrics = {}
        self._last_core_reward = 0.0

    def seed(self, s):
        self._seed = s

    @property
    def current_episode(self):
        class _Goal:
            position = np.asarray(
                [self._core.goal[0], 0.0, self._core.goal[1]], np.float32
            )

        class _Episode:
            goals = [_Goal()]
            # real habitat episodes carry a dataset identity — the exact-set
            # eval protocol keys counted episodes by (scene_id, episode_id),
            # so the fake must make them distinct per scene partition too
            scene_id = (self.config.DATASET.CONTENT_SCENES or ["scene0"])[0]
            episode_id = str(self._core._episode_id)

        return _Episode()

    @property
    def episode_over(self) -> bool:
        return self._core.episode_over

    def get_metrics(self):
        return dict(self._metrics)

    def _obs(self, obs):
        return {
            "rgb": obs["rgb"].astype(np.uint8),
            "depth": obs["depth"],
            "pointgoal_with_gps_compass": obs["pointgoal_with_gps_compass"],
        }

    def reset(self):
        obs = self._core.reset()
        self._metrics = {
            "distance_to_goal": self._core.dist_to_goal,
            "success": 0.0,
            "spl": 0.0,
            "softspl": 0.0,
            "collisions": {"count": 0},
        }
        return self._obs(obs)

    def step(self, action):
        obs, reward, done, info = self._core.step(int(action))
        self._metrics = {
            k: info[k] for k in ("distance_to_goal", "success", "spl", "softspl")
        }
        self._metrics["collisions"] = info["collisions"]
        self._last_core_reward = reward
        self._last_core_info = info
        return self._obs(obs)
