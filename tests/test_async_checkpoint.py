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


def test_snapshot_survives_buffer_donation(tmp_path):
    """Regression for the backend-dependent np.asarray zero-copy hazard:
    donate the SAME device buffer to a jitted step right after save() (the
    engines' actual pattern — vo/engine.py donates variables/opt_state).
    On CPU backends np.asarray(jax.Array) can alias device memory, so
    without an owned copy the async writer would serialize the clobbered
    buffer.  save() must hold values from save() time regardless."""
    import jax

    clobber_donated = jax.jit(lambda x: x * 0.0 - 7.0, donate_argnums=0)

    w = AsyncCheckpointWriter()
    x = jnp.arange(16, dtype=jnp.float32) + 1.0
    p = str(tmp_path / "donated.pkl")
    w.save(p, {"x": x})
    y = clobber_donated(x)  # x's buffer is donated and overwritten
    jax.block_until_ready(y)
    w.close()
    loaded, _ = load_checkpoint(p)
    np.testing.assert_array_equal(
        np.asarray(loaded["x"]), np.arange(16, dtype=np.float32) + 1.0)


def test_context_manager_drains_on_exception(tmp_path):
    """An exception in the train loop must not abandon queued checkpoints
    (engines.py wraps its loops in `with AsyncCheckpointWriter()`)."""
    p = str(tmp_path / "ckpt_last.pkl")
    with pytest.raises(ValueError, match="boom"):
        with AsyncCheckpointWriter() as w:
            w.save(p, _tree(5), metadata={"i": 5})
            raise ValueError("boom")
    assert os.path.isfile(p)
    _, meta = load_checkpoint(p)
    assert meta["i"] == 5


def test_drain_quietly_returns_error(tmp_path):
    """Preemption path: a failed periodic write is returned, not raised,
    so the interrupted-state save + requeue still run (engines.py)."""
    w = AsyncCheckpointWriter()
    bad_dir = tmp_path / "not_a_dir"
    bad_dir.write_text("file, not directory")
    w.save(str(bad_dir / "ckpt.pkl"), _tree(0))
    err = w.drain_quietly()
    assert isinstance(err, Exception)
    w.close()  # error was consumed; close() must not re-raise


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
