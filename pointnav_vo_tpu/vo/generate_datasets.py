"""Dataset-generation CLI with the reference's argument surface.

Mirrors ``pointnav_vo/vo/dataset/generate_datasets.py:561-687`` (the
command documented in the reference TRAIN.md): scene-list resolution for
Gibson v1/v2 splits, the ``act_type`` save filter, the Bernoulli ``rnd_p``
keep probability, per-split sizes/names, the Resizer / ResizeCenterCropper
observation transformers, and the ``{name}_{N}.h5`` output naming — driving
this package's pluggable generator (:func:`pointnav_vo_tpu.vo.dataset.
generate_dataset`) instead of a hard habitat dependency:

- ``--backend habitat`` rolls habitat envs behind the
  :class:`~pointnav_vo_tpu.rl.envs.HabitatNavEnv` adapter with habitat's
  ShortestPathFollower (the reference's follower,
  generate_datasets.py:115-121);
- ``--backend scripted`` (default when habitat is absent) uses the bundled
  scripted PointNav world + oracle follower, writing the identical schema —
  the whole TRAIN.md pipeline stays runnable without habitat-sim;
- ``--workers N`` fans generation over N processes writing
  ``{name}_{N}.w{i}.h5`` shards (the in-repo analogue of the reference's
  SLURM array fan-out); the shard set reads as one dataset through
  FramePairReader's glob/list support.

Example (reference TRAIN.md command, one-for-one; ``--config_f`` optional —
the bundled task defaults ARE the Challenge-2020 task config)::

    python -m pointnav_vo_tpu.vo.generate_datasets \
        --train_scene_dir dataset/habitat_datasets/pointnav/gibson/v2/train/content \
        --val_scene_dir dataset/habitat_datasets/pointnav/gibson/v2/val/content \
        --save_dir dataset/vo_dataset \
        --data_version v2 --vis_size_w 341 --vis_size_h 192 \
        --obs_transform none --act_type -1 --rnd_p 1.0 \
        --N_list 1000000 50000 --name_list train val
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
from typing import List, Optional

import numpy as np


def scene_list_v2(content_dir: str) -> List[str]:
    """Scene names from a v2 split's ``content/*.json.gz`` directory
    (generate_datasets.py:636-641, 653-657)."""
    files = glob.glob(os.path.join(content_dir, "*.json.gz"))
    return sorted(os.path.basename(f).split(".")[0] for f in files)


def scene_list_v1(val_json_gz: str) -> List[str]:
    """Scene names recovered from a v1 monolithic ``val.json.gz`` episode
    file (generate_datasets.py:642-652)."""
    with gzip.open(val_json_gz, "rt") as f:
        episodes = json.loads(f.read())["episodes"]
    out: List[str] = []
    for ep in episodes:
        name = os.path.basename(ep["scene_id"]).split(".")[0]
        if name not in out:
            out.append(name)
    return sorted(out)


def make_obs_transform(kind: str, vis_w: int, vis_h: int):
    """Host-side per-image transform with the reference transformer
    semantics (Resizer / ResizeCenterCropper, misc_utils.py) — same math as
    the device path (ops/transforms.py), applied to [H, W, C] numpy."""
    if kind in (None, "none"):
        return None
    from pointnav_vo_tpu.ops.transforms import apply_obs_transform

    def tf(img: np.ndarray) -> np.ndarray:
        return np.asarray(apply_obs_transform(img, kind, (vis_w, vis_h)))

    return tf


def habitat_spf_follower(env):
    """ShortestPathFollower over the HabitatNavEnv adapter — the
    reference's data-collection policy (generate_datasets.py:115-121).
    Returns a follower callable; 0 (STOP) signals episode done."""
    from habitat.tasks.nav.shortest_path_follower import ShortestPathFollower

    hab = env._env
    sim = getattr(hab, "sim", None) or getattr(hab, "_sim")
    goal_radius = None
    if getattr(hab, "episodes", None):
        goal_radius = hab.episodes[0].goals[0].radius
    if goal_radius is None:
        goal_radius = env.cfg.forward_step
    follower = ShortestPathFollower(sim, goal_radius, False)

    def f(env, obs):
        goal = env._env.current_episode.goals[0].position
        action = follower.get_next_action(goal)
        return 0 if action is None else int(action)

    return f


def _resolve_spec(spec: str):
    """Resolve a ``module:callable`` spec (same convention as the shm env
    worker factories, native/shm_env.py)."""
    import importlib

    mod, _, name = spec.partition(":")
    return getattr(importlib.import_module(mod), name)


def _env_cfg_from_task(task, vis_w: int, vis_h: int, native_size: bool):
    """EnvConfig for the generator from a task-config tree.  With
    ``native_size`` (obs_transform=none) the env renders at the requested
    vis size directly, as the reference's challenge yaml does."""
    from pointnav_vo_tpu.rl.envs import EnvConfig

    sim = task.SIMULATOR
    return EnvConfig(
        image_h=vis_h if native_size else sim.DEPTH_SENSOR.HEIGHT,
        image_w=vis_w if native_size else sim.DEPTH_SENSOR.WIDTH,
        hfov_deg=sim.DEPTH_SENSOR.HFOV,
        min_depth=sim.DEPTH_SENSOR.MIN_DEPTH,
        max_depth=sim.DEPTH_SENSOR.MAX_DEPTH,
        forward_step=sim.get("FORWARD_STEP_SIZE", 0.25),
        turn_angle_deg=sim.TURN_ANGLE,
        max_episode_steps=task.ENVIRONMENT.MAX_EPISODE_STEPS,
        success_distance=task.TASK.SUCCESS_DISTANCE,
        actuation_noise_multiplier=sim.NOISE_MODEL.NOISE_MULTIPLIER,
        rgb_noise_intensity=sim.RGB_SENSOR.NOISE_MODEL_KWARGS.intensity_constant,
    )


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Generate VO frame-pair HDF5 datasets "
                    "(reference generate_datasets.py CLI surface)")
    p.add_argument("--config_f", type=str, default=None,
                   help="task config yaml (defaults to the bundled "
                        "Challenge-2020 task config)")
    p.add_argument("--save_dir", type=str, required=True)
    p.add_argument("--act_type", type=int, default=-1,
                   help="-1 saves all actions; 1/2/3 saves only that action")
    p.add_argument("--rnd_p", type=float, default=1.0,
                   help="Bernoulli keep probability per step pair")
    p.add_argument("--N_list", nargs="+", type=int, required=True)
    p.add_argument("--name_list", nargs="+", type=str, required=True,
                   choices=["train", "val"])
    p.add_argument("--data_version", type=str, default="v2",
                   choices=["v1", "v2"])
    p.add_argument("--train_scene_dir", type=str, default=None)
    p.add_argument("--val_scene_dir", type=str, default=None)
    p.add_argument("--vis_size_w", type=int, default=341)
    p.add_argument("--vis_size_h", type=int, default=192)
    p.add_argument("--obs_transform", type=str, default="none",
                   choices=["none", "resize", "resize_crop"])
    # TPU-framework extensions
    p.add_argument("--backend", type=str, default="auto",
                   choices=["auto", "scripted", "habitat"])
    p.add_argument("--workers", type=int, default=1,
                   help=">1 fans generation over processes, one shard file "
                        "each ({name}_{N}.w{i}.h5)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--follower", type=str, default=None,
                   help="module:callable follower factory override")
    return p


def generate_split(name: str, n: int, args, task, scenes: Optional[List[str]]) -> List[str]:
    """Generate one split; returns the file list written."""
    from pointnav_vo_tpu.vo.dataset import (
        generate_dataset,
        generate_dataset_parallel,
    )

    backend = args.backend
    if backend == "auto":
        try:
            import habitat  # noqa: F401
            backend = "habitat"
        except ImportError:
            backend = "scripted"

    env_cfg = _env_cfg_from_task(task, args.vis_size_w, args.vis_size_h,
                                 native_size=args.obs_transform == "none")
    obs_tf = make_obs_transform(args.obs_transform, args.vis_size_w,
                                args.vis_size_h)
    valid = None if args.act_type == -1 else (args.act_type,)

    env_factory = None
    follower_factory = None
    factory_kwargs = None
    if backend == "habitat":
        from pointnav_vo_tpu.rl.envs import HabitatNavEnv, split_scenes

        task_dict = task.to_dict()
        task_dict.setdefault("DATASET", {})["SPLIT"] = name
        if args.obs_transform == "none":
            # render at the save resolution directly (the challenge yaml's
            # own sensor setting); resize/resize_crop keep the sensor size
            # from config_f and transform on save
            for sensor in ("RGB_SENSOR", "DEPTH_SENSOR"):
                task_dict["SIMULATOR"][sensor]["WIDTH"] = args.vis_size_w
                task_dict["SIMULATOR"][sensor]["HEIGHT"] = args.vis_size_h
        env_factory = HabitatNavEnv
        follower_factory = habitat_spf_follower
        n_workers = max(1, args.workers)
        splits = (split_scenes(scenes, n_workers)
                  if scenes else [None] * n_workers)
        factory_kwargs = [
            {"task_config": task_dict, "content_scenes": splits[i]}
            for i in range(n_workers)
        ]
    if args.follower:
        follower_factory = _resolve_spec(args.follower)

    out = os.path.join(args.save_dir, f"{name}_{n}.h5")
    if args.workers > 1:
        prefix = out[:-3]  # strip .h5; shards are {prefix}.w{i}.h5
        if env_factory is not None and factory_kwargs is not None:
            paths = generate_dataset_parallel(
                prefix, n, args.workers, env_factory=env_factory,
                follower_factory=follower_factory, env_cfg=env_cfg,
                rnd_p=args.rnd_p, seed=args.seed, valid_actions=valid,
                obs_transform=obs_tf, factory_kwargs=factory_kwargs)
        else:
            paths = generate_dataset_parallel(
                prefix, n, args.workers, env_cfg=env_cfg,
                rnd_p=args.rnd_p, seed=args.seed, valid_actions=valid,
                obs_transform=obs_tf)
        return paths

    ef = env_factory
    if ef is not None and factory_kwargs is not None:
        kw = factory_kwargs[0]
        ef = lambda cfg, seed: env_factory(cfg, seed=seed, **kw)  # noqa: E731
    generate_dataset(out, n, env_factory=ef,
                     follower_factory=follower_factory, env_cfg=env_cfg,
                     rnd_p=args.rnd_p, seed=args.seed, valid_actions=valid,
                     obs_transform=obs_tf)
    return [out]


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    assert len(args.N_list) == len(args.name_list), \
        "--N_list and --name_list must pair up"

    from pointnav_vo_tpu.config.defaults import get_task_config

    task = get_task_config(args.config_f)

    os.makedirs(args.save_dir, exist_ok=True)

    for name, n in zip(args.name_list, args.N_list):
        scenes: Optional[List[str]] = None
        if name == "train" and args.train_scene_dir:
            scenes = scene_list_v2(args.train_scene_dir)
        elif name == "val" and args.val_scene_dir:
            scenes = (scene_list_v2(args.val_scene_dir)
                      if args.data_version == "v2"
                      else scene_list_v1(args.val_scene_dir))
        if scenes is not None:
            print(f"{name}: {len(scenes)} scenes")
        paths = generate_split(name, n, args, task, scenes)
        print(f"{name}: wrote {n} entries -> {paths}")


if __name__ == "__main__":
    main()
