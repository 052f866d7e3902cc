"""VO frame-pair datasets: reference-compatible HDF5 reader + generator.

Two responsibilities, both host-side (decode + shuffle only — the heavy
per-sample preprocessing the reference does in 20 DataLoader worker
processes, i.e. depth discretization + top-down projection
(regression_geo_invariance_iter_dataset.py:205-452), moves ON DEVICE into
the jitted train step; see vo/engine.py):

1. :class:`FramePairReader` — streams the reference's chunked HDF5 schema
   (``chunk_{k}`` groups; generate_datasets.py:145-199, 252): rgb uint8
   flattened, depth float16 flattened, global poses, delta pos/rot.  Reads
   datasets produced by the reference's generator unmodified (460 GB of
   them, TRAIN.md:21).  Implements per-action filtering, partial-data
   splits, chunk-level sharding across data-parallel hosts, and the
   **inverse augmentation** (swap the frames of a turn sample, flip the
   action, recompute the delta from global states —
   regression_geo_invariance_iter_dataset.py:342-420).
2. :func:`generate_scripted_dataset` — rolls an oracle policy through the
   habitat-free scripted env (rl/envs.py) and writes the SAME schema; a
   stand-in for ``generate_datasets.py`` when habitat-sim isn't available
   (it lets the whole TRAIN.md pipeline run end-to-end in CI).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import h5py
import numpy as np

from pointnav_vo_tpu.common import (
    CUR_REL_TO_PREV,
    MOVE_FORWARD,
    PREV_REL_TO_CUR,
    TURN_LEFT,
    TURN_RIGHT,
)

CHUNK_SIZE = 256


# -- numpy quaternion helpers (host-side; [x, y, z, w]) ----------------------


# quaternion helpers live in common.py (shared with the habitat adapter)
from pointnav_vo_tpu.common import (  # noqa: E402
    quat_canonical as _q_canonical,
    quat_inverse as _q_inv,
    quat_multiply as _q_mul,
    quat_rotate as _q_rot,
)


def inverse_delta_from_global(prev_rot, prev_pos, cur_rot, cur_pos) -> np.ndarray:
    """[.., 3] = (dx, dz, dyaw) of *prev relative to cur* (the swapped-frame
    regression target, dataset:389-420)."""
    inv = _q_inv(cur_rot)
    d_rot = _q_canonical(_q_mul(inv, prev_rot))
    d_pos = _q_rot(inv, prev_pos - cur_pos)
    dyaw = 2.0 * np.arctan2(d_rot[..., 1], d_rot[..., 3])
    return np.stack([d_pos[..., 0], d_pos[..., 2], dyaw], -1).astype(np.float32)


@dataclasses.dataclass
class FramePairBatch:
    """One host batch of raw frame pairs (device preprocessing downstream)."""

    prev_rgb: np.ndarray  # [B, H, W, 3] uint8 ([B/2] when twins_packed)
    cur_rgb: np.ndarray
    prev_depth: np.ndarray  # [B, H, W, 1] f16/f32 native ([B/2] when twins_packed)
    cur_depth: np.ndarray
    actions: np.ndarray  # [B] int32 (after inverse-augment flip)
    gt_delta: np.ndarray  # [B, 3] float32 (dx, dz, dyaw)
    data_types: np.ndarray  # [B] int32 CUR_REL_TO_PREV / PREV_REL_TO_CUR
    dz_regress_mask: np.ndarray  # [B] float32
    chunk_idx: np.ndarray  # [B] int32 provenance (engine:624-658 dumps)
    entry_idx: np.ndarray  # [B] int32
    # joint-stage batches of adjacent (primary, swapped) twins carry each
    # frame pair's pixels ONCE at entry level ([B/2] rows); the device
    # expands them (preprocess_obs_pairs_twins).  Sample-level fields
    # (actions, gt_delta, ...) always have B rows.
    twins_packed: bool = False


def _depth_native(arr: np.ndarray, h: int, w: int) -> np.ndarray:
    """Reshape a flat depth column to [N, h, w, 1], keeping f16/f32 native
    (f64 downcasts — no dataset stores meaningful f64 depth precision)."""
    if arr.dtype not in (np.float16, np.float32):
        arr = arr.astype(np.float32)
    return arr.reshape(-1, h, w, 1)


def unpack_twins(batch: "FramePairBatch") -> "FramePairBatch":
    """Expand a twin-packed batch back to sample-level pixel arrays
    (sample 2k = entry k, sample 2k+1 = entry k with prev/cur swapped)."""
    if not batch.twins_packed:
        return batch

    def interleave(a, b):
        return np.stack([a, b], axis=1).reshape((-1,) + a.shape[1:])

    return dataclasses.replace(
        batch,
        prev_rgb=interleave(batch.prev_rgb, batch.cur_rgb),
        cur_rgb=interleave(batch.cur_rgb, batch.prev_rgb),
        prev_depth=interleave(batch.prev_depth, batch.cur_depth),
        cur_depth=interleave(batch.cur_depth, batch.prev_depth),
        twins_packed=False,
    )


def resolve_dataset_paths(path) -> List[str]:
    """Normalize a dataset spec to a sorted file list: a single path, a
    list/tuple, a comma-separated string, or a glob pattern."""
    if isinstance(path, (list, tuple)):
        out = [str(p) for p in path]
    elif "," in str(path):
        out = [p.strip() for p in str(path).split(",") if p.strip()]
    elif any(ch in str(path) for ch in "*?["):
        import glob

        out = sorted(glob.glob(str(path)))
        if not out:
            raise FileNotFoundError(f"dataset glob matched nothing: {path}")
    else:
        out = [str(path)]
    return out


class FramePairReader:
    """Chunked HDF5 reader with inverse augmentation and chunk sharding.

    ``path`` may be a single file, a list of files, a comma-separated list,
    or a glob pattern — the reference generates its 1M-pair datasets as many
    per-job files (one SLURM array task each, generate_datasets.py); reading
    them as one logical dataset needs no merge step.
    """

    def __init__(
        self,
        path,
        vis_size_w: int,
        vis_size_h: int,
        act_type=-1,
        geo_invariance_types: Sequence[str] = (),
        partial_data_n_splits: int = 1,
        shard_index: int = 0,
        num_shards: int = 1,
    ):
        self.paths = resolve_dataset_paths(path)
        self.path = self.paths[0]  # back-compat attribute
        self.w, self.h = vis_size_w, vis_size_h
        self.act_type = act_type
        self.geo_types = tuple(geo_invariance_types)
        self.n_splits = partial_data_n_splits
        chunks = []
        self._len = 0
        for pth in self.paths:
            with h5py.File(pth, "r") as f:
                keys = sorted(f.keys(), key=lambda k: int(k.split("_")[-1]))
                chunks.extend((pth, k) for k in keys)
        self.chunks = chunks[shard_index::num_shards]
        for pth, k in self.chunks:
            with h5py.File(pth, "r") as f:
                self._len += self._valid_indices(f[k]).size

    def _valid_indices(self, grp) -> np.ndarray:
        actions = grp["actions"][()]
        if isinstance(self.act_type, (list, tuple)):
            assert set(self.act_type) == {TURN_LEFT, TURN_RIGHT}
            mask = (actions == TURN_LEFT) | (actions == TURN_RIGHT)
        elif self.act_type == -1:
            mask = np.ones_like(actions, bool)
        else:
            mask = actions == self.act_type
        idx = np.flatnonzero(mask)
        if self.n_splits > 1:
            idx = idx[:: self.n_splits]
        return idx

    def __len__(self) -> int:
        """Number of primary (non-augmented) samples."""
        return self._len

    def _count_samples(self, actions: np.ndarray) -> int:
        """Samples one chunk yields — mirrors :meth:`_chunk_samples` exactly
        (actions-only, no image decode)."""
        inv_requested = (
            "inverse_data_augment_only" in self.geo_types
            or "inverse_joint_train" in self.geo_types
        )
        joint = "inverse_joint_train" in self.geo_types
        n = 0
        for a in actions:
            a = int(a)
            primary = (
                self.act_type == -1
                or (isinstance(self.act_type, int) and a == self.act_type)
                or joint
            )
            if primary:
                n += 1
            if inv_requested and a != MOVE_FORWARD and self.act_type != -1:
                if joint or a != self.act_type:
                    n += 1
        return n

    def num_samples(self) -> int:
        """Exact number of samples one epoch yields (primaries + inverse-
        augmented twins) — the eval-count tripwire of reference
        engine:1131-1142 needs this as the expected total."""
        total = 0
        for pth, key in self.chunks:
            with h5py.File(pth, "r") as f:
                grp = f[key]
                idx = self._valid_indices(grp)
                total += self._count_samples(grp["actions"][()][idx])
        return total

    def _decode_chunk(self, grp) -> Dict[str, np.ndarray]:
        h, w = self.h, self.w
        return {
            "actions": grp["actions"][()].astype(np.int32),
            "prev_rgb": grp["prev_rgbs"][()].reshape(-1, h, w, 3),
            "cur_rgb": grp["cur_rgbs"][()].reshape(-1, h, w, 3),
            # depth keeps its on-disk dtype (the generator stores float16,
            # dataset_generate_utils.py layout): it ships to device as-is and
            # frame_features upcasts there — f16->f32 is exact, so values
            # match the old host-upcast path bit-for-bit at 28% fewer
            # host->device bytes per batch
            "prev_depth": _depth_native(grp["prev_depths"][()], h, w),
            "cur_depth": _depth_native(grp["cur_depths"][()], h, w),
            "delta_pos": grp["delta_positions"][()].astype(np.float32),
            "delta_rot": grp["delta_rotations"][()].astype(np.float32),
            "prev_gpos": grp["prev_global_positions"][()].astype(np.float64),
            "prev_grot": grp["prev_global_rotations"][()].astype(np.float64),
            "cur_gpos": grp["cur_global_positions"][()].astype(np.float64),
            "cur_grot": grp["cur_global_rotations"][()].astype(np.float64),
        }

    def _chunk_samples(self, data: Dict[str, np.ndarray], idx: np.ndarray,
                       chunk_i: int) -> List[Tuple]:
        """Expand valid indices into (possibly augmented) sample descriptors:
        (entry, swapped?, action, delta)."""
        out = []
        actions = data["actions"]
        dyaw = 2.0 * np.arctan2(data["delta_rot"][:, 1], data["delta_rot"][:, 3])
        deltas = np.stack(
            [data["delta_pos"][:, 0], data["delta_pos"][:, 2], dyaw], -1
        ).astype(np.float32)
        inv_requested = (
            "inverse_data_augment_only" in self.geo_types
            or "inverse_joint_train" in self.geo_types
        )
        joint = "inverse_joint_train" in self.geo_types
        for i in idx:
            a = int(actions[i])
            primary = (
                self.act_type == -1
                or (isinstance(self.act_type, int) and a == self.act_type)
                or joint
            )
            if primary:
                out.append((i, False, a, deltas[i]))
            if inv_requested and a != MOVE_FORWARD and self.act_type != -1:
                if joint or a != self.act_type:
                    flipped = TURN_RIGHT if a == TURN_LEFT else TURN_LEFT
                    inv_delta = inverse_delta_from_global(
                        data["prev_grot"][i], data["prev_gpos"][i],
                        data["cur_grot"][i], data["cur_gpos"][i],
                    )
                    out.append((i, True, flipped, inv_delta))
        return out

    def iter_batches(
        self,
        batch_size: int,
        rng: Optional[np.random.Generator] = None,
        drop_last: bool = False,
    ) -> Iterator[FramePairBatch]:
        """One epoch. Chunks are loaded whole into RAM, samples shuffled
        within each chunk (reference worker behavior, dataset:454-524)."""
        chunk_order = list(range(len(self.chunks)))
        if rng is not None:
            rng.shuffle(chunk_order)
        pending: List[Tuple[int, Dict, Tuple]] = []
        files: Dict[str, "h5py.File"] = {}
        try:
            for ci in chunk_order:
                pth, key = self.chunks[ci]
                if pth not in files:
                    files[pth] = h5py.File(pth, "r")
                grp = files[pth][key]
                data = self._decode_chunk(grp)
                idx = self._valid_indices(grp)
                if rng is not None:
                    # shuffle entries, not expanded samples: a sample and its
                    # inverse-augmented twin must stay adjacent for the
                    # geo-invariance pairing (engine:367-374 alternating layout)
                    idx = rng.permutation(idx)
                samples = self._chunk_samples(data, idx, ci)
                for s in samples:
                    pending.append((ci, data, s))
                    if len(pending) == batch_size:
                        yield self._assemble(pending)
                        pending = []
            if pending and not drop_last:
                yield self._assemble(pending)
        finally:
            for f in files.values():
                f.close()

    @staticmethod
    def _is_twin_layout(items) -> bool:
        """True when the batch is entirely adjacent (primary, swapped) twins
        of the same entry — the joint-stage layout that can ship entry-level
        pixels once (FramePairBatch.twins_packed)."""
        if len(items) % 2:
            return False
        for k in range(0, len(items), 2):
            ci0, _, (i0, sw0, _, _) = items[k]
            ci1, _, (i1, sw1, _, _) = items[k + 1]
            if sw0 or not sw1 or ci0 != ci1 or i0 != i1:
                return False
        return True

    @staticmethod
    def _assemble(items) -> FramePairBatch:
        prev_rgb, cur_rgb, prev_d, cur_d = [], [], [], []
        acts, deltas, dtypes, chunk_is, entry_is = [], [], [], [], []
        twins_packed = FramePairReader._is_twin_layout(items)
        for ci, data, (i, swapped, a, delta) in items:
            if twins_packed:
                # pixels appended once per ENTRY (on the primary visit);
                # metadata stays sample-level below
                if not swapped:
                    prev_rgb.append(data["prev_rgb"][i])
                    cur_rgb.append(data["cur_rgb"][i])
                    prev_d.append(data["prev_depth"][i])
                    cur_d.append(data["cur_depth"][i])
                dtypes.append(PREV_REL_TO_CUR if swapped else CUR_REL_TO_PREV)
            elif swapped:
                prev_rgb.append(data["cur_rgb"][i])
                cur_rgb.append(data["prev_rgb"][i])
                prev_d.append(data["cur_depth"][i])
                cur_d.append(data["prev_depth"][i])
                dtypes.append(PREV_REL_TO_CUR)
            else:
                prev_rgb.append(data["prev_rgb"][i])
                cur_rgb.append(data["cur_rgb"][i])
                prev_d.append(data["prev_depth"][i])
                cur_d.append(data["cur_depth"][i])
                dtypes.append(CUR_REL_TO_PREV)
            acts.append(a)
            deltas.append(delta)
            chunk_is.append(ci)
            entry_is.append(i)
        return FramePairBatch(
            prev_rgb=np.stack(prev_rgb),
            cur_rgb=np.stack(cur_rgb),
            prev_depth=np.stack(prev_d),
            cur_depth=np.stack(cur_d),
            actions=np.asarray(acts, np.int32),
            gt_delta=np.stack(deltas).astype(np.float32),
            data_types=np.asarray(dtypes, np.int32),
            dz_regress_mask=np.ones(len(acts), np.float32),
            chunk_idx=np.asarray(chunk_is, np.int32),
            entry_idx=np.asarray(entry_is, np.int32),
            twins_packed=twins_packed,
        )


class PrefetchingLoader:
    """Background-thread prefetch over any batch iterator.

    Plays the role of the reference's 20 DataLoader worker processes
    (engine:32-33) in the TPU design: since the heavy per-sample math moved
    on device, the host only needs to hide HDF5 decode latency behind device
    compute.  h5py releases the GIL during reads, so a thread (plus the C++
    shm ring for multi-process scaling, pointnav_vo_tpu/native) is the right
    tool — no fork, no tensor fd-sharing gymnastics (the reference's
    fast_collate_func essay, dataset:572-616).
    """

    def __init__(self, make_iter, depth: int = 4):
        self._make_iter = make_iter
        self._depth = depth

    def __iter__(self):
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=self._depth)
        _END = object()
        err = []

        def feed():
            try:
                for item in self._make_iter():
                    q.put(item)
            except Exception as e:  # surface in the consumer thread
                err.append(e)
            finally:
                q.put(_END)

        t = threading.Thread(target=feed, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is _END:
                break
            yield item
        t.join()
        if err:
            raise err[0]


# ---------------------------------------------------------------------------
# Scripted dataset generation (habitat-free stand-in for generate_datasets.py)
# ---------------------------------------------------------------------------


def _yaw_to_quat(yaw: float) -> np.ndarray:
    return np.asarray([0.0, np.sin(yaw / 2), 0.0, np.cos(yaw / 2)], np.float64)


def oracle_goal_follower(turn_angle_deg: float, success_distance: float):
    """Default follower: turn toward the goal until roughly facing it, else
    move forward; STOP within success distance — the ShortestPathFollower
    analogue for obstacle-free worlds (generate_datasets.py:397-412 uses
    habitat's geodesic follower).  Signature: f(env, obs) -> action."""
    turn_rad = np.radians(turn_angle_deg)

    def follower(env, obs) -> int:
        bearing = -obs["pointgoal_with_gps_compass"][1]
        if env.dist_to_goal < success_distance:
            return 0
        if abs(bearing) > turn_rad / 2:
            return TURN_LEFT if bearing < 0 else TURN_RIGHT
        return MOVE_FORWARD

    return follower


def oracle_follower_factory(env):
    """``follower_factory``-shaped wrapper over :func:`oracle_goal_follower`
    (reads the geometry knobs off the env's own config) — usable as a
    ``module:callable`` spec for the generation CLI's ``--follower``."""
    return oracle_goal_follower(env.cfg.turn_angle_deg,
                                env.cfg.success_distance)


def generate_dataset(
    path: str,
    n_entries: int,
    env_factory=None,
    follower_factory=None,
    env_cfg=None,
    rnd_p: float = 1.0,
    seed: int = 0,
    valid_actions: Optional[Sequence[int]] = None,
    obs_transform=None,
) -> int:
    """Roll a follower policy through an env, save reference-schema HDF5
    (generate_datasets.py:32-687).

    Pluggable like the reference's habitat pipeline:
    - ``env_factory(env_cfg, seed) -> env`` exposing the scripted duck type
      (reset/step) plus pose accessors ``global_pose()``/``goal_position()``
      and ``dist_to_goal`` — ScriptedPointNavEnv (default) and the habitat
      adapter HabitatNavEnv (rl/envs.py) both qualify;
    - ``follower_factory(env) -> f(env, obs) -> action`` with 0 meaning
      "episode done, reset" — default :func:`oracle_goal_follower`; a habitat
      ShortestPathFollower wraps in directly.

    ``valid_actions`` restricts which step pairs are SAVED (the follower
    still takes whatever action it wants) — the reference's ``act_type``
    filter, generate_datasets.py:535-538.  ``obs_transform(obs_hwc) ->
    obs_hwc`` is applied to each saved rgb/depth image (the reference's
    Resizer / ResizeCenterCropper hook, generate_datasets.py:663-670).

    Returns the number of entries written.
    """
    from pointnav_vo_tpu.rl.envs import EnvConfig, ScriptedPointNavEnv

    env_cfg = env_cfg or EnvConfig()
    rng = np.random.default_rng(seed)
    env = (env_factory or ScriptedPointNavEnv)(env_cfg, seed=seed)
    if follower_factory is not None:
        follower = follower_factory(env)
    else:
        follower = oracle_goal_follower(env_cfg.turn_angle_deg,
                                        env_cfg.success_distance)

    _tf = obs_transform if obs_transform is not None else (lambda x: x)
    buf: List[Dict] = []
    written = 0
    chunk_cnt = 0

    with h5py.File(path, "w") as f:

        def flush():
            nonlocal chunk_cnt, buf
            if not buf:
                return
            grp = f.create_group(f"chunk_{chunk_cnt}")
            cols = {k: np.stack([b[k] for b in buf]) for k in buf[0]}
            for k, v in cols.items():
                # images LZF-compressed like the reference
                # (generate_datasets.py:238-252); scalars stored raw
                comp = "lzf" if k.endswith(("rgbs", "depths")) else None
                grp.create_dataset(k, data=v, compression=comp)
            chunk_cnt += 1
            buf = []

        obs = env.reset()
        new_episode = True
        while written < n_entries:
            action = int(follower(env, obs))
            if action == 0:
                obs = env.reset()
                new_episode = True
                continue

            prev_gpos, prev_grot = env.global_pose()
            p_obs = obs
            nobs, _r, done, info = env.step(action)
            cur_gpos, cur_grot = env.global_pose()
            keep = ((valid_actions is None or action in valid_actions)
                    and rng.uniform() < rnd_p)
            if keep:
                # delta of cur relative to prev (dataset target convention)
                inv = _q_inv(prev_grot)
                d_rot = _q_canonical(_q_mul(inv, cur_grot))
                d_pos = _q_rot(inv, cur_gpos - prev_gpos)
                prev_yaw = 2.0 * np.arctan2(prev_grot[1], prev_grot[3])
                cur_yaw = 2.0 * np.arctan2(cur_grot[1], cur_grot[3])
                buf.append({
                    "new_episodes": np.uint8(new_episode),
                    "actions": np.uint8(action),
                    "collisions": np.uint8(info["collisions"]["count"] > 0),
                    "episode_start_positions": np.zeros(3, np.float32),
                    "episode_start_rotations": np.zeros(4, np.float32),
                    "episode_goal_positions": env.goal_position(),
                    "prev_rgbs": _tf(p_obs["rgb"]).astype(np.uint8).reshape(-1),
                    "cur_rgbs": _tf(nobs["rgb"]).astype(np.uint8).reshape(-1),
                    "prev_depths": _tf(p_obs["depth"]).astype(np.float16).reshape(-1),
                    "cur_depths": _tf(nobs["depth"]).astype(np.float16).reshape(-1),
                    "prev_point_goal_vecs": p_obs["pointgoal_with_gps_compass"],
                    "cur_point_goal_vecs": nobs["pointgoal_with_gps_compass"],
                    "prev_episodic_gpses": np.zeros(2, np.float32),
                    "cur_episodic_gpses": np.zeros(2, np.float32),
                    "prev_episodic_compasses": np.asarray([prev_yaw], np.float32),
                    "cur_episodic_compasses": np.asarray([cur_yaw], np.float32),
                    "prev_global_positions": prev_gpos.astype(np.float32),
                    "cur_global_positions": cur_gpos.astype(np.float32),
                    "prev_global_rotations": prev_grot.astype(np.float32),
                    "cur_global_rotations": cur_grot.astype(np.float32),
                    "delta_positions": d_pos.astype(np.float32),
                    "delta_rotations": np.asarray(d_rot, np.float32),
                })
                written += 1
                if len(buf) == CHUNK_SIZE:
                    flush()
            new_episode = False
            obs = nobs
            if done:
                obs = env.reset()
                new_episode = True
        flush()
    return written


def generate_scripted_dataset(path: str, n_entries: int, env_cfg=None,
                              rnd_p: float = 1.0, seed: int = 0) -> int:
    """Scripted-world generation (default env + oracle follower)."""
    return generate_dataset(path, n_entries, env_cfg=env_cfg, rnd_p=rnd_p,
                            seed=seed)


def generate_dataset_parallel(
    path_prefix: str,
    n_entries: int,
    n_workers: int,
    env_factory=None,
    follower_factory=None,
    env_cfg=None,
    rnd_p: float = 1.0,
    seed: int = 0,
    valid_actions: Optional[Sequence[int]] = None,
    obs_transform=None,
    factory_kwargs: Optional[List[Dict]] = None,
) -> List[str]:
    """Fan dataset generation over worker processes, one file each — the
    in-process analogue of the reference's SLURM array jobs
    (generate_datasets.py + its sbatch wrappers).  Each worker rolls its own
    env (seeded ``seed + 1000 * i``) and writes ``{prefix}.w{i}.h5``; the
    returned file list (or ``{prefix}.w*.h5``) reads as ONE dataset through
    FramePairReader.  ``factory_kwargs``, if given, is one extra kwargs dict
    per worker forwarded to ``env_factory`` (scene splits, task config).
    """
    import multiprocessing as mp

    per = [n_entries // n_workers] * n_workers
    per[-1] += n_entries - sum(per)
    paths = [f"{path_prefix}.w{i}.h5" for i in range(n_workers)]

    def _run(i):
        ef = env_factory
        if ef is not None and factory_kwargs is not None:
            base, kw = env_factory, factory_kwargs[i]
            ef = lambda cfg, seed: base(cfg, seed=seed, **kw)  # noqa: E731
        generate_dataset(paths[i], per[i], env_factory=ef,
                         follower_factory=follower_factory, env_cfg=env_cfg,
                         rnd_p=rnd_p, seed=seed + 1000 * i,
                         valid_actions=valid_actions,
                         obs_transform=obs_transform)

    ctx = mp.get_context("fork")
    procs = [ctx.Process(target=_run, args=(i,)) for i in range(n_workers)]
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    if any(p.exitcode != 0 for p in procs):
        bad = [i for i, p in enumerate(procs) if p.exitcode != 0]
        raise RuntimeError(f"dataset workers failed: {bad}")
    return paths
