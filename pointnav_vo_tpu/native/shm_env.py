"""Process-parallel vector env over the native shm rings.

The habitat-sim analogue of the reference's ``habitat.VectorEnv`` fan-out
(env_utils.py:74-98), rebuilt on the C++ SPSC rings (native/shm_ring.cpp):
each worker process steps one env and writes a fixed-layout float32 payload
(observations + reward/done + metrics) straight into shared memory; the
trainer pops all N payloads into preallocated batch arrays — one memcpy per
env per step, no pickling.  Exposes the same interface as
``rl/envs.VectorEnv`` so trainers/evaluators are backend-agnostic.

Worker envs are pluggable: pass ``env_factory`` as a ``"module:callable"``
spec (resolved *inside* the worker process, so heavyweight simulators like
habitat-sim are imported only in their own process — the reference does the
same by constructing habitat.Env inside each VectorEnv worker,
env_utils.py:96-98).  The factory signature is ``f(cfg, seed, **kwargs)`` and
must return an object with the scripted-env duck type: ``reset() -> obs``,
``step(a) -> (obs, reward, done, info)`` with rgb/depth/pointgoal obs.
"""

from __future__ import annotations

import importlib
import multiprocessing as mp
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from pointnav_vo_tpu.native import ShmRing
from pointnav_vo_tpu.rl.envs import EnvConfig

_N_META = 24  # pointgoal 2 + reward, done, success, spl, softspl, dist,
# collisions + gt_delta 3 + agent_pos_episodic 3 + agent_yaw + agent_pos 3
# + goal_world 3 (world pose + goal feed the drift diagnostics and the
# top-down-map video overlay — without them the shm backend silently lost
# both) + episodes_available (the worker env's number_of_episodes, -1 for
# unbounded — episode_budgets must see finite availability on dataset-backed
# workers like the habitat adapter or the exact-set protocol over-budgets)
# + is_collision (this-step collision flag — the reference's stuck counters
# are gated on it, ppo_trainer.py:985-998)


def _payload_floats(cfg: EnvConfig) -> int:
    return cfg.image_h * cfg.image_w * 4 + _N_META


def _encode(buf: np.ndarray, cfg: EnvConfig, obs, reward, done, info,
            n_eps: Optional[int] = None) -> None:
    hw = cfg.image_h * cfg.image_w
    buf[: hw * 3] = obs["rgb"].reshape(-1)
    buf[hw * 3 : hw * 4] = obs["depth"].reshape(-1)
    m = buf[hw * 4 :]
    m[0:2] = obs["pointgoal_with_gps_compass"]
    m[2] = reward
    m[3] = float(done)
    m[4] = info.get("success", 0.0)
    m[5] = info.get("spl", 0.0)
    m[6] = info.get("softspl", 0.0)
    m[7] = info.get("distance_to_goal", 0.0)
    m[8] = float(info.get("collisions", {"count": 0})["count"])
    m[9:12] = info.get("gt_delta", np.zeros(3, np.float32))
    m[12:15] = info.get("agent_pos_episodic", np.zeros(3, np.float32))
    m[15] = info.get("agent_yaw", 0.0)
    m[16:19] = info.get("agent_pos", np.zeros(3, np.float32))
    m[19:22] = info.get("goal_world", np.zeros(3, np.float32))
    m[22] = -1.0 if n_eps is None else float(n_eps)
    m[23] = float(info.get("collisions", {}).get("is_collision", 0))


def resolve_env_factory(spec: str):
    """Resolve a ``"module:callable"`` env-factory spec to the callable."""
    mod_name, _, attr = spec.partition(":")
    if not attr:
        raise ValueError(f"env factory spec must be 'module:callable', got {spec!r}")
    return getattr(importlib.import_module(mod_name), attr)


DEFAULT_ENV_FACTORY = "pointnav_vo_tpu.rl.envs:ScriptedPointNavEnv"


def _worker_main(prefix: str, idx: int, cfg: EnvConfig, seed: int,
                 env_factory: str = DEFAULT_ENV_FACTORY,
                 factory_kwargs: Optional[dict] = None) -> None:
    act_ring = ShmRing(f"{prefix}_a{idx}")
    obs_ring = ShmRing(f"{prefix}_o{idx}")
    env = resolve_env_factory(env_factory)(cfg, seed=seed, **(factory_kwargs or {}))
    buf = np.zeros(_payload_floats(cfg), np.float32)
    act = np.zeros(1, np.float32)
    n_eps = getattr(env, "number_of_episodes", None)

    obs = env.reset()
    _encode(buf, cfg, obs, 0.0, False, {}, n_eps)
    obs_ring.push(buf)
    try:
        while True:
            act_ring.pop_into(act, timeout_ms=600000)
            a = int(act[0])
            if a < 0:
                break
            obs, reward, done, info = env.step(a)
            if done:
                obs = env.reset()
            _encode(buf, cfg, obs, reward, done, info, n_eps)
            obs_ring.push(buf)
    finally:
        act_ring.close()
        obs_ring.close()


class ShmVectorEnv:
    """Drop-in VectorEnv with process workers + shm transport."""

    def __init__(self, cfg: EnvConfig, num_envs: int, seed: int = 0, slots: int = 4,
                 env_factory: str = DEFAULT_ENV_FACTORY,
                 factory_kwargs: Optional[dict] = None):
        # fail fast in the parent on a bad spec (workers would die silently)
        resolve_env_factory(env_factory)
        self.cfg = cfg
        self.num_envs = num_envs
        self._prefix = f"/pnvo_{os.getpid()}_{id(self) & 0xFFFF}"
        n_floats = _payload_floats(cfg)
        self._payload = np.zeros((num_envs, n_floats), np.float32)
        self._act = np.zeros(1, np.float32)

        self._act_rings = [
            ShmRing(f"{self._prefix}_a{i}", slots, 8, create=True)
            for i in range(num_envs)
        ]
        self._obs_rings = [
            ShmRing(f"{self._prefix}_o{i}", slots, n_floats * 4, create=True)
            for i in range(num_envs)
        ]
        if isinstance(factory_kwargs, (list, tuple)):
            assert len(factory_kwargs) == num_envs, "one kwargs dict per worker"
            per_kwargs = list(factory_kwargs)
        else:
            per_kwargs = [factory_kwargs] * num_envs
        ctx = mp.get_context("fork")
        self._procs = [
            ctx.Process(target=_worker_main,
                        args=(self._prefix, i, cfg, seed + i, env_factory,
                              per_kwargs[i]),
                        daemon=True)
            for i in range(num_envs)
        ]
        for p in self._procs:
            p.start()
        self._first = True
        self._reset_called = False
        # host-side episode counters (workers auto-reset; a done transition
        # means the worker moved on to its next episode)
        self._episode_ids = [0] * num_envs

    def current_episodes(self) -> List[int]:
        return list(self._episode_ids)

    def number_of_episodes(self) -> List[Optional[int]]:
        """Interface parity with VectorEnv.number_of_episodes: each worker
        reports its env's own ``number_of_episodes`` in the payload (-1 =
        unbounded, e.g. the scripted world); dataset-backed factories like
        the habitat adapter report their finite count so the exact-set eval
        protocol budgets correctly on this backend too.

        Pre-reset-safe: the counts ride the first worker payload, so if the
        caller asks before ``reset()`` we pop that payload here and let the
        later ``reset()`` decode it (habitat ``VectorEnv.number_of_episodes``
        works pre-reset, ppo_trainer.py:635-646 relies on that order — the
        r4 assert here broke every fresh-farm eval)."""
        self._pop_first_payload()
        vals = self._payload[:, self.cfg.image_h * self.cfg.image_w * 4 + 22]
        return [None if v < 0 else int(v) for v in vals]

    def _decode(self) -> tuple:
        cfg = self.cfg
        hw = cfg.image_h * cfg.image_w
        rgb = self._payload[:, : hw * 3].reshape(self.num_envs, cfg.image_h, cfg.image_w, 3)
        depth = self._payload[:, hw * 3 : hw * 4].reshape(
            self.num_envs, cfg.image_h, cfg.image_w, 1
        )
        m = self._payload[:, hw * 4 :]
        obs = {
            "rgb": rgb.copy(),
            "depth": depth.copy(),
            "pointgoal_with_gps_compass": m[:, 0:2].copy(),
        }
        rewards = m[:, 2].copy()
        dones = m[:, 3] > 0.5
        infos = [
            {
                "success": float(m[i, 4]),
                "spl": float(m[i, 5]),
                "softspl": float(m[i, 6]),
                "distance_to_goal": float(m[i, 7]),
                "collisions": {"count": int(m[i, 8]),
                               "is_collision": int(m[i, 23] > 0.5)},
                "gt_delta": m[i, 9:12].copy(),
                "agent_pos_episodic": m[i, 12:15].copy(),
                "agent_yaw": float(m[i, 15]),
                "agent_pos": m[i, 16:19].copy(),
                "goal_world": m[i, 19:22].copy(),
            }
            for i in range(self.num_envs)
        ]
        return obs, rewards, dones, infos

    def _pop_first_payload(self) -> None:
        """Collect each worker's startup payload into ``self._payload``.

        Idempotent.  Worker construction can take minutes (habitat scene
        loads), but a worker that DIES during startup must surface in
        seconds — poll in short slices and check process liveness between
        them."""
        if not self._first:
            return
        for i, ring in enumerate(self._obs_rings):
            deadline = 600.0
            while True:
                try:
                    ring.pop_into(self._payload[i], timeout_ms=5000)
                    break
                except TimeoutError as e:
                    deadline -= 5.0
                    if deadline <= 0:
                        self._check_workers(e)
                        raise
                    if not self._procs[i].is_alive():
                        self._check_workers(e)
        self._first = False

    def reset(self) -> Dict[str, np.ndarray]:
        assert not self._reset_called, "shm workers auto-reset; call reset() once"
        self._pop_first_payload()
        self._reset_called = True
        obs, _, _, _ = self._decode()
        return obs

    def _check_workers(self, cause: Exception) -> None:
        """Turn a ring timeout into a diagnosable worker-death report."""
        dead = [(i, p.exitcode) for i, p in enumerate(self._procs)
                if not p.is_alive()]
        if dead:
            raise RuntimeError(
                f"shm env worker(s) died: {dead} (index, exitcode) — see the "
                "worker process stderr; a habitat worker typically dies on "
                "scene-load errors or missing datasets"
            ) from cause
        raise cause

    def step_async(self, actions: Sequence[int]) -> None:
        """Push actions to the workers and return immediately — the env
        farm simulates while the caller does host work (the Evaluator's
        per-step diagnostics ride here).  One outstanding step at most:
        ``step_wait`` must be called before the next ``step_async``.  A
        dangling async step at loop exit is harmless — the un-popped obs
        occupies one of the ring's slots and ``close()`` still proceeds."""
        for ring, a in zip(self._act_rings, actions):
            self._act[0] = float(a)
            ring.push(self._act)

    def step_wait(self):
        try:
            for i, ring in enumerate(self._obs_rings):
                ring.pop_into(self._payload[i])
        except TimeoutError as e:
            self._check_workers(e)
        out = self._decode()
        for i, done in enumerate(out[2]):
            if done:
                self._episode_ids[i] += 1
        return out

    def step(self, actions: Sequence[int]):
        self.step_async(actions)
        return self.step_wait()

    def close(self) -> None:
        for ring in self._act_rings:
            try:
                self._act[0] = -1.0
                ring.push(self._act, timeout_ms=1000)
            except Exception:
                pass
        for p in self._procs:
            p.join(timeout=5)
            if p.is_alive():
                p.terminate()
        for ring in self._act_rings + self._obs_rings:
            ring.close()
