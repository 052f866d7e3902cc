"""Process-parallel HDF5 decode reader (shm-ring transport) contracts."""

import numpy as np
import pytest

from pointnav_vo_tpu.rl.envs import EnvConfig
from pointnav_vo_tpu.vo.dataset import FramePairReader, generate_scripted_dataset
from pointnav_vo_tpu.vo.parallel_reader import ParallelDecodeReader

ENV_CFG = EnvConfig(image_h=24, image_w=32, max_episode_steps=40)


@pytest.fixture(scope="module")
def dataset_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pdec") / "train.h5")
    generate_scripted_dataset(path, 120, env_cfg=ENV_CFG, seed=3)
    return path


def _kwargs(path):
    return dict(path=path, vis_size_w=32, vis_size_h=24, act_type=-1)


def _sample_keys(batches):
    """Multiset of per-sample identities (action, delta) across batches."""
    out = []
    for b in batches:
        for i in range(b.actions.shape[0]):
            out.append((int(b.actions[i]), tuple(np.round(b.gt_delta[i], 5))))
    return sorted(out)


def test_parallel_matches_serial_sample_multiset(dataset_path):
    """2 decode workers deliver exactly the serial reader's samples (order
    may differ — the reference DataLoader's worker semantics)."""
    serial = FramePairReader(**_kwargs(dataset_path))
    par = ParallelDecodeReader(_kwargs(dataset_path), num_workers=2)

    s_batches = list(serial.iter_batches(16, rng=np.random.default_rng(0)))
    p_batches = list(par.iter_batches(16, rng=np.random.default_rng(0)))
    assert _sample_keys(p_batches) == _sample_keys(s_batches)

    # unshuffled epochs too (rng=None), and re-iterable for a second epoch
    p2 = list(par.iter_batches(16))
    assert _sample_keys(p2) == _sample_keys(list(serial.iter_batches(16)))


def test_parallel_twin_adjacency_preserved(dataset_path):
    """Joint-stage (primary, swapped) twins never straddle worker or batch
    boundaries — each worker runs the full serial pairing over its chunks."""
    kwargs = dict(_kwargs(dataset_path), act_type=[2, 3],
                  geo_invariance_types=("inverse_joint_train",))
    par = ParallelDecodeReader(kwargs, num_workers=2)
    batches = list(par.iter_batches(8, rng=np.random.default_rng(1),
                                    drop_last=True))
    assert batches, "expected at least one joint batch"
    for b in batches:
        acts = np.asarray(b.actions).reshape(-1)
        dtypes = np.asarray(b.data_types).reshape(-1)
        assert len(acts) % 2 == 0
        # alternating (primary, swapped) layout: data_types 0,1,0,1,...
        assert (dtypes[0::2] == 0).all() and (dtypes[1::2] == 1).all()


def test_parallel_metadata_delegation(dataset_path):
    serial = FramePairReader(**_kwargs(dataset_path))
    par = ParallelDecodeReader(_kwargs(dataset_path), num_workers=3)
    assert par.num_samples() == serial.num_samples()
    assert len(par.chunks) == len(serial.chunks)


def test_worker_shard_composition(dataset_path):
    """Worker sharding composes with an engine-level host shard: the union
    of all workers' chunk slices is exactly the host shard's chunks."""
    base = dict(_kwargs(dataset_path), shard_index=0, num_shards=1)
    par = ParallelDecodeReader(base, num_workers=2)
    w0 = FramePairReader(**par._worker_kwargs(0))
    w1 = FramePairReader(**par._worker_kwargs(1))
    assert sorted(w0.chunks + w1.chunks) == sorted(par._serial.chunks)
    assert not (set(w0.chunks) & set(w1.chunks))


def test_worker_death_raises_not_empty_stream(dataset_path, tmp_path):
    """A worker that dies must surface as an error with its exit code, not
    masquerade as an empty epoch (the end marker is pushed only on clean
    completion)."""
    bad = str(tmp_path / "missing.h5")
    par = ParallelDecodeReader(dict(_kwargs(dataset_path)), num_workers=1)
    par._kwargs["path"] = bad  # workers will fail to open it
    with pytest.raises(RuntimeError, match="decode worker 0 died"):
        list(par.iter_batches(8))
