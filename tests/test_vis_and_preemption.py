"""Tests for visualization utilities and the preemption lifecycle."""

import os
import signal

import numpy as np

from pointnav_vo_tpu.utils import preemption
from pointnav_vo_tpu.vis.maps import (
    draw_top_down_map,
    generate_video,
    save_ranked_error_images,
)


def test_draw_top_down_map():
    traj = [(0.0, 0.0), (0.5, 0.2), (1.0, 0.8)]
    img = draw_top_down_map(traj, goal=(1.2, 1.0), room_radius=3.0, size=128)
    assert img.shape == (128, 128, 3)
    # path, goal, and wall pixels actually drawn
    assert (img == (220, 120, 40)).all(-1).any()
    assert (img == (30, 180, 60)).all(-1).any()
    assert (img == (60, 60, 60)).all(-1).any()


def test_generate_video(tmp_path):
    frames = [np.full((32, 48, 3), i * 20, np.uint8) for i in range(8)]
    path = generate_video(frames, str(tmp_path), "ep0", fps=5)
    assert path and os.path.isfile(path) and os.path.getsize(path) > 0


def test_save_ranked_error_images(tmp_path):
    rng = np.random.default_rng(0)
    recs = [
        {
            "vo_l2": float(i) / 10,
            "prev_rgb": rng.uniform(0, 255, (16, 16, 3)),
            "cur_rgb": rng.uniform(0, 255, (16, 16, 3)),
            "episode": i,
        }
        for i in range(6)
    ]
    paths = save_ranked_error_images(recs, str(tmp_path / "ranked"), top_k=3)
    assert len(paths) == 3
    assert "0.5000" in paths[0]  # worst first
    assert os.path.isfile(tmp_path / "ranked" / "manifest.json")


def test_preemption_flags_and_state(tmp_path, monkeypatch):
    monkeypatch.setattr(preemption, "INTERRUPTED_STATE_DIR", str(tmp_path))
    preemption.reset_for_tests()
    preemption.install_signal_handlers()
    assert not preemption.should_exit()
    os.kill(os.getpid(), signal.SIGUSR1)
    assert preemption.should_exit()
    assert preemption.REQUEUE.is_set()

    path = preemption.save_interrupted_state(
        {"x": np.ones(3)}, metadata={"update": 7}
    )
    assert os.path.isfile(path)
    tree, meta = preemption.load_interrupted_state()
    np.testing.assert_array_equal(tree["x"], np.ones(3))
    assert meta["update"] == 7
    preemption.reset_for_tests()


def test_trajectory_map_renderer_and_compose():
    """Top-down map overlay: fog of war accumulates, path/goal/agent drawn,
    composed frame is [rgb | map] at rgb height (reference eval-video
    layout, misc_utils.py:199-238)."""
    import numpy as np

    from pointnav_vo_tpu.vis.maps import (
        AGENT_COLOR,
        GOAL_COLOR,
        TrajectoryMapRenderer,
        compose_map_frame,
    )

    r = TrajectoryMapRenderer(start=[0.0, 0.0, 0.0], goal=[2.0, 0.0, 2.0],
                              size=128)
    fog0 = r.fog.sum()
    assert fog0 == 0
    for i in range(8):
        r.add([0.25 * i, 0.0, 0.25 * i], yaw=0.3)
    img = r.render()
    assert img.shape == (128, 128, 3)
    assert r.fog.sum() > 0  # fog revealed along the path
    # goal disk and agent triangle present
    assert (img == np.array(GOAL_COLOR, np.uint8)).all(-1).any()
    assert (img == np.array(AGENT_COLOR, np.uint8)).all(-1).any()

    rgb = np.zeros((32, 48, 3), np.uint8)
    frame = compose_map_frame(rgb, img)
    assert frame.shape == (32, 48 + 2 + 32, 3)
    assert frame.dtype == np.uint8
