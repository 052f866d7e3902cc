"""Dataset-generation CLI (pointnav_vo_tpu/vo/generate_datasets.py) vs the
reference generate_datasets.py:561-687 argument surface."""

import glob
import gzip
import json
import sys

import h5py
import numpy as np

from pointnav_vo_tpu.vo.dataset import FramePairReader
from pointnav_vo_tpu.vo.generate_datasets import main, scene_list_v1, scene_list_v2


def _tiny_task_yaml(tmp_path):
    p = tmp_path / "task.yaml"
    p.write_text(
        "SIMULATOR:\n"
        "  RGB_SENSOR: {WIDTH: 64, HEIGHT: 36}\n"
        "  DEPTH_SENSOR: {WIDTH: 64, HEIGHT: 36}\n"
        "ENVIRONMENT: {MAX_EPISODE_STEPS: 50}\n"
    )
    return str(p)


def test_cli_scripted_end_to_end(tmp_path):
    save = tmp_path / "ds"
    main([
        "--config_f", _tiny_task_yaml(tmp_path),
        "--save_dir", str(save),
        "--backend", "scripted",
        "--act_type", "-1", "--rnd_p", "1.0",
        "--N_list", "30", "10", "--name_list", "train", "val",
        "--vis_size_w", "64", "--vis_size_h", "36",
        "--obs_transform", "none",
    ])
    # reference output naming: {name}_{N}.h5 (generate_datasets.py:527)
    train_f = save / "train_30.h5"
    val_f = save / "val_10.h5"
    assert train_f.exists() and val_f.exists()

    r = FramePairReader(str(train_f), vis_size_w=64, vis_size_h=36)
    assert r.num_samples() == 30
    batch = next(iter(r.iter_batches(batch_size=30)))
    assert batch.cur_rgb.shape == (30, 36, 64, 3)


def test_cli_act_type_filter(tmp_path):
    save = tmp_path / "ds"
    main([
        "--config_f", _tiny_task_yaml(tmp_path),
        "--save_dir", str(save),
        "--backend", "scripted",
        "--act_type", "2",
        "--N_list", "12", "--name_list", "train",
        "--vis_size_w", "64", "--vis_size_h", "36",
    ])
    with h5py.File(save / "train_12.h5", "r") as f:
        acts = np.concatenate([f[k]["actions"][()] for k in f])
    assert len(acts) == 12
    assert (acts == 2).all()  # only TURN_LEFT pairs saved


def test_cli_parallel_shards(tmp_path):
    save = tmp_path / "ds"
    main([
        "--config_f", _tiny_task_yaml(tmp_path),
        "--save_dir", str(save),
        "--backend", "scripted", "--workers", "2",
        "--N_list", "20", "--name_list", "train",
        "--vis_size_w", "64", "--vis_size_h", "36",
    ])
    shards = sorted(glob.glob(str(save / "train_20.w*.h5")))
    assert len(shards) == 2
    r = FramePairReader(shards, vis_size_w=64, vis_size_h=36)
    assert r.num_samples() == 20


def test_cli_resize_crop_transform(tmp_path):
    save = tmp_path / "ds"
    main([
        "--config_f", _tiny_task_yaml(tmp_path),  # sensor renders 64x36
        "--save_dir", str(save),
        "--backend", "scripted",
        "--N_list", "6", "--name_list", "train",
        "--vis_size_w", "32", "--vis_size_h", "24",
        "--obs_transform", "resize_crop",  # saved images land at 32x24
    ])
    r = FramePairReader(str(save / "train_6.h5"), vis_size_w=32, vis_size_h=24)
    batch = next(iter(r.iter_batches(batch_size=6)))
    assert batch.cur_rgb.shape == (6, 24, 32, 3)
    assert batch.cur_depth.shape == (6, 24, 32, 1)


def test_scene_list_resolution(tmp_path):
    content = tmp_path / "content"
    content.mkdir()
    for s in ["Cross", "Adrian", "Beach"]:
        (content / f"{s}.json.gz").write_bytes(b"")
    assert scene_list_v2(str(content)) == ["Adrian", "Beach", "Cross"]

    v1 = tmp_path / "val.json.gz"
    eps = {"episodes": [
        {"scene_id": "data/scene/Zed.glb"},
        {"scene_id": "data/scene/Arkansaw.glb"},
        {"scene_id": "data/scene/Zed.glb"},
    ]}
    with gzip.open(v1, "wt") as f:
        f.write(json.dumps(eps))
    assert scene_list_v1(str(v1)) == ["Arkansaw", "Zed"]


def test_cli_habitat_backend_with_fake_habitat(tmp_path, monkeypatch):
    """--backend habitat drives the HabitatNavEnv adapter; the follower is
    overridden via --follower (module:callable spec) since the fake habitat
    module ships no ShortestPathFollower."""
    from tests import fake_habitat

    monkeypatch.setitem(sys.modules, "habitat", fake_habitat)

    save = tmp_path / "ds"
    main([
        "--config_f", _tiny_task_yaml(tmp_path),
        "--save_dir", str(save),
        "--backend", "habitat",
        "--N_list", "8", "--name_list", "train",
        "--vis_size_w", "64", "--vis_size_h", "36",
        "--follower", "pointnav_vo_tpu.vo.dataset:oracle_follower_factory",
    ])
    r = FramePairReader(str(save / "train_8.h5"), vis_size_w=64, vis_size_h=36)
    assert r.num_samples() == 8
