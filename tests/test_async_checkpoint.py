"""AsyncCheckpointWriter: durability, round-trip equality, error surfacing.

The reference saves checkpoints synchronously inside the epoch loop
(vo_cnn_regression_geo_invariance_engine.py:963-1018); here the serialize +
write overlap the next epoch's compute, so these tests pin the contract the
engines rely on: wait() means durable-on-disk, contents equal the sync path,
and a failed write raises instead of vanishing.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from pointnav_vo_tpu.io.checkpoint import (
    AsyncCheckpointWriter,
    load_checkpoint,
    save_checkpoint,
)


def _tree(seed: int):
    rng = np.random.default_rng(seed)
    return {
        "params": {"w": jnp.asarray(rng.normal(size=(8, 8)), jnp.float32),
                   "b": jnp.asarray(rng.normal(size=(8,)), jnp.float32)},
        "step": jnp.asarray(seed, jnp.int32),
    }


def test_async_save_matches_sync(tmp_path):
    tree = _tree(0)
    sync_path = str(tmp_path / "sync.pkl")
    async_path = str(tmp_path / "async.pkl")
    save_checkpoint(sync_path, tree, metadata={"epoch": 3})

    w = AsyncCheckpointWriter()
    w.save(async_path, tree, metadata={"epoch": 3})
    w.close()

    t_sync, m_sync = load_checkpoint(sync_path)
    t_async, m_async = load_checkpoint(async_path)
    assert m_sync == m_async == {"epoch": 3}
    np.testing.assert_array_equal(t_sync["params"]["w"], t_async["params"]["w"])
    np.testing.assert_array_equal(t_sync["step"], t_async["step"])


def test_wait_means_durable_and_fifo(tmp_path):
    w = AsyncCheckpointWriter()
    paths = [str(tmp_path / f"ckpt_{i}.pkl") for i in range(4)]
    for i, p in enumerate(paths):
        w.save(p, _tree(i), metadata={"i": i})
    w.wait()
    for i, p in enumerate(paths):
        assert os.path.isfile(p)
        assert not os.path.exists(p + ".tmp")  # atomic rename completed
        tree, meta = load_checkpoint(p)
        assert meta["i"] == i
        assert int(np.asarray(tree["step"])) == i
    w.close()


def test_snapshot_taken_at_save_time(tmp_path):
    """The caller may donate/overwrite its arrays right after save() —
    the written file must hold the values at save() time."""
    w = AsyncCheckpointWriter()
    tree = {"x": jnp.arange(4, dtype=jnp.float32)}
    p = str(tmp_path / "snap.pkl")
    w.save(p, tree)
    tree["x"] = jnp.zeros(4, jnp.float32)  # caller moves on
    w.close()
    loaded, _ = load_checkpoint(p)
    np.testing.assert_array_equal(np.asarray(loaded["x"]),
                                  np.arange(4, dtype=np.float32))


def test_write_error_surfaces(tmp_path):
    w = AsyncCheckpointWriter()
    bad_dir = tmp_path / "not_a_dir"
    bad_dir.write_text("file, not directory")
    w.save(str(bad_dir / "ckpt.pkl"), _tree(0))
    with pytest.raises(RuntimeError, match="async checkpoint write failed"):
        w.wait()
    # the writer stays usable after an error is surfaced
    ok = str(tmp_path / "ok.pkl")
    w.save(ok, _tree(1))
    w.close()
    assert os.path.isfile(ok)
