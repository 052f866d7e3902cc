"""Native shm ring + process vector env tests."""

import numpy as np
import pytest

from pointnav_vo_tpu.rl.envs import EnvConfig, make_scripted_vector_env


def test_ring_roundtrip_and_order():
    from pointnav_vo_tpu.native import ShmRing

    ring = ShmRing("/pnvo_test_ring", slots=4, slot_bytes=64, create=True)
    try:
        reader = ShmRing("/pnvo_test_ring")
        for i in range(10):
            ring.push(np.full(16, i, np.float32))
            out = np.zeros(16, np.float32)
            reader.pop_into(out)
            np.testing.assert_array_equal(out, i)
        # fill to capacity, drain in order
        for i in range(4):
            ring.push(np.full(16, 100 + i, np.float32))
        assert reader.size() == 4
        for i in range(4):
            out = np.zeros(16, np.float32)
            reader.pop_into(out)
            assert out[0] == 100 + i
        with pytest.raises(TimeoutError):
            reader.pop_into(np.zeros(16, np.float32), timeout_ms=50)
    finally:
        ring.close()


def test_shm_worker_death_is_reported():
    """A dead worker surfaces as a diagnosable RuntimeError (with index and
    exitcode), not a bare 10 s ring timeout."""
    from pointnav_vo_tpu.native.shm_env import ShmVectorEnv

    cfg = EnvConfig(image_h=4, image_w=4, max_episode_steps=10)
    shm = ShmVectorEnv(cfg, num_envs=2, seed=1)
    try:
        shm.reset()
        shm._procs[1].kill()  # SIGKILL: immune to scheduling lag under load
        shm._procs[1].join(timeout=30)
        assert not shm._procs[1].is_alive()
        with pytest.raises(RuntimeError, match=r"worker\(s\) died.*\(1,"):
            shm.step([1, 1])
    finally:
        shm.close()


def test_shm_step_async_split_matches_step_and_tolerates_dangling():
    """step_async+step_wait == step, and a dangling async step (pushed but
    never collected — the Evaluator's loop-exit case) must not deadlock
    close()."""
    from pointnav_vo_tpu.native.shm_env import ShmVectorEnv

    cfg = EnvConfig(image_h=8, image_w=8, max_episode_steps=10)
    a = ShmVectorEnv(cfg, num_envs=2, seed=11)
    b = ShmVectorEnv(cfg, num_envs=2, seed=11)
    try:
        a.reset()
        b.reset()
        rng = np.random.default_rng(3)
        for _ in range(8):
            actions = rng.integers(1, 4, size=2)
            o_a, r_a, d_a, i_a = a.step(actions)
            b.step_async(actions)
            o_b, r_b, d_b, i_b = b.step_wait()
            np.testing.assert_allclose(r_b, r_a, atol=1e-6)
            np.testing.assert_array_equal(d_b, d_a)
            for k in o_a:
                np.testing.assert_allclose(o_b[k], o_a[k], atol=1e-6, err_msg=k)
        # dangling step: push without collecting, then close
        b.step_async([1, 1])
    finally:
        a.close()
        b.close()


def test_shm_vector_env_matches_inprocess():
    """Same seeds + same actions -> shm-process env == in-process env."""
    from pointnav_vo_tpu.native.shm_env import ShmVectorEnv

    cfg = EnvConfig(image_h=8, image_w=8, max_episode_steps=10)
    ref = make_scripted_vector_env(cfg, num_envs=2, seed=7)
    shm = ShmVectorEnv(cfg, num_envs=2, seed=7)
    try:
        obs_ref = ref.reset()
        obs_shm = shm.reset()
        for k in obs_ref:
            np.testing.assert_allclose(obs_shm[k], obs_ref[k], atol=1e-6, err_msg=k)

        rng = np.random.default_rng(0)
        for _ in range(12):
            actions = rng.integers(1, 4, size=2)
            o_ref, r_ref, d_ref, i_ref = ref.step(actions)
            o_shm, r_shm, d_shm, i_shm = shm.step(actions)
            np.testing.assert_allclose(r_shm, r_ref, atol=1e-5)
            np.testing.assert_array_equal(d_shm, d_ref)
            for k in o_ref:
                np.testing.assert_allclose(o_shm[k], o_ref[k], atol=1e-5, err_msg=k)
            for a, b in zip(i_shm, i_ref):
                np.testing.assert_allclose(a["gt_delta"], b["gt_delta"], atol=1e-6)
                assert a["collisions"]["count"] == b["collisions"]["count"]
    finally:
        shm.close()
