"""Process-parallel HDF5 decode over the native shm rings.

The TPU rebuild moved the reference's per-sample preprocessing math
(one-hot depth, top-down projection — its 20 DataLoader workers' job,
vo_cnn_regression_geo_invariance_engine.py:32-33) onto the device, leaving
the host only HDF5 chunk decode (LZF + reshape).  That decode cannot scale
with threads — libhdf5 serializes everything behind a global lock — so
scaling it means processes, exactly like the reference's DataLoader.

:class:`ParallelDecodeReader` wraps a :class:`FramePairReader` constructor:
``num_workers`` processes each own a static slice of the chunk list
(``chunks[w::W]`` composed with any engine-level host shard — the same
static per-worker chunk partition as the reference's
``regression_geo_invariance_iter_dataset.py:143-151``), decode and assemble
batches independently, and ship pickled ``FramePairBatch`` frames through
the C++ SPSC shm rings (``native/shm_ring.cpp``) — one memcpy into shared
memory and one out, no pipe writes.  The consumer interleaves workers
round-robin, so the epoch stream is deterministic given the epoch rng.

Epoch semantics vs the serial reader: the same multiset of samples with the
same twin adjacency, but a different (equally seeded-random) order — the
chunk-to-worker assignment is static across epochs while each worker
reshuffles its own chunks per epoch, matching the reference DataLoader's
worker semantics.  Use for TRAINING; evaluation keeps the serial reader
(its exact-count and ordering contracts are tested against it).
"""

from __future__ import annotations

import multiprocessing as mp
import os
import pickle
from typing import Iterator, Optional

import numpy as np

from pointnav_vo_tpu.vo.dataset import FramePairBatch, FramePairReader

_END_TIMEOUT_MS = 500  # per-poll wait; liveness is checked between polls


def _slot_bytes(batch_size: int, h: int, w: int) -> int:
    """Upper bound on one pickled FramePairBatch: u8 rgb pairs + f16 depth
    pairs + f32 metadata + pickle framing."""
    per_sample = 10 * h * w + 256
    return batch_size * per_sample + (1 << 20)


def _decode_worker(prefix: str, widx: int, reader_kwargs: dict,
                   batch_size: int, epoch_seed: Optional[int],
                   drop_last: bool) -> None:
    from pointnav_vo_tpu.native import ShmRing

    lring = ShmRing(f"{prefix}_l{widx}")
    dring = ShmRing(f"{prefix}_d{widx}")
    reader = FramePairReader(**reader_kwargs)
    rng = (np.random.default_rng([epoch_seed, widx])
           if epoch_seed is not None else None)
    ln = np.zeros(1, np.uint64)
    for batch in reader.iter_batches(batch_size, rng=rng,
                                     drop_last=drop_last):
        blob = pickle.dumps(batch, protocol=5)
        dring.push(blob, timeout_ms=600_000)
        ln[0] = len(blob)
        lring.push(ln, timeout_ms=600_000)
    # end-of-stream marker ONLY on clean completion: a worker that dies must
    # NOT look like an empty stream — the consumer's liveness poll turns the
    # missing marker into a RuntimeError with the exit code
    ln[0] = 0
    lring.push(ln, timeout_ms=600_000)
    lring.close()
    dring.close()


class ParallelDecodeReader:
    """Drop-in ``iter_batches`` provider backed by decode worker processes.

    ``reader_kwargs`` are :class:`FramePairReader` constructor arguments
    (shard_index/num_shards may already carry a multi-host shard — worker
    sharding composes with it).
    """

    def __init__(self, reader_kwargs: dict, num_workers: int,
                 ring_slots: int = 2):
        assert num_workers >= 1
        self._kwargs = dict(reader_kwargs)
        self._w = num_workers
        self._slots = ring_slots
        # serial twin for metadata surfaces (len, num_samples, chunk list)
        self._serial = FramePairReader(**reader_kwargs)

    def __getattr__(self, name):
        # delegate metadata (num_samples(), paths, chunks, ...) to the
        # serial twin; iteration is overridden below
        return getattr(self._serial, name)

    def _worker_kwargs(self, widx: int) -> dict:
        kw = dict(self._kwargs)
        s = kw.get("shard_index", 0)
        n = kw.get("num_shards", 1)
        # chunks[s::n][w::W] == chunks[s + w*n :: n*W]
        kw["shard_index"] = s + widx * n
        kw["num_shards"] = n * self._w
        return kw

    def iter_batches(
        self,
        batch_size: int,
        rng: Optional[np.random.Generator] = None,
        drop_last: bool = False,
    ) -> Iterator[FramePairBatch]:
        from pointnav_vo_tpu.native import ShmRing

        import uuid

        epoch_seed = None if rng is None else int(rng.integers(2 ** 31 - 1))
        # uuid, not a seeded RNG: two readers in one process under a fixed
        # global seed must not collide on shm segment names
        prefix = f"pnvdec_{os.getpid()}_{uuid.uuid4().hex[:8]}"
        h, w = self._kwargs["vis_size_h"], self._kwargs["vis_size_w"]
        slot = _slot_bytes(batch_size, h, w)
        rings, procs = [], []
        ctx = mp.get_context("spawn")
        try:
            for i in range(self._w):
                lring = ShmRing(f"{prefix}_l{i}", slots=self._slots + 1,
                                slot_bytes=8, create=True)
                dring = ShmRing(f"{prefix}_d{i}", slots=self._slots,
                                slot_bytes=slot, create=True)
                rings.append((lring, dring))
            for i in range(self._w):
                p = ctx.Process(
                    target=_decode_worker,
                    args=(prefix, i, self._worker_kwargs(i), batch_size,
                          epoch_seed, drop_last),
                    daemon=True,
                )
                p.start()
                procs.append(p)

            live = list(range(self._w))
            ln = np.zeros(1, np.uint64)
            while live:
                for i in list(live):
                    lring, dring = rings[i]
                    while True:
                        try:
                            lring.pop_into(ln, timeout_ms=_END_TIMEOUT_MS)
                            break
                        except TimeoutError:
                            if not procs[i].is_alive():
                                raise RuntimeError(
                                    f"decode worker {i} died (exit code "
                                    f"{procs[i].exitcode}) before finishing "
                                    "its chunk slice") from None
                    n = int(ln[0])
                    if n == 0:
                        live.remove(i)
                        continue
                    buf = np.empty(n, np.uint8)
                    dring.pop_into(buf, timeout_ms=600_000)
                    yield pickle.loads(buf.tobytes())
        finally:
            for p in procs:
                if p.is_alive():
                    p.terminate()
                p.join(timeout=5)
            for lring, dring in rings:
                # close() on the creating side also unlinks the shm segment
                lring.close()
                dring.close()
