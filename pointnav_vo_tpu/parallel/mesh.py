"""Device mesh + sharding helpers — the NCCL/DDP replacement.

The reference's distributed layer (``rl/ddppo/algo/ddp_utils.py:117-161``
TCPStore rendezvous, ``ddppo.py`` DDP wrapper + all_reduces) maps onto JAX
SPMD (SURVEY.md §5.8):

- rendezvous            -> ``jax.distributed.initialize`` (multi-host) /
                            nothing (single host, all local devices visible);
- DDP grad all-reduce   -> ``pmean(grads)`` inside the jitted update;
- stats all_reduce      -> ``psum`` of (sum, sumsq, count);
- PrefixStore straggler counter -> unnecessary: rollouts are fixed-T and the
  update is a lockstep SPMD program over the mesh.

One mesh axis ("data") is all this workload needs — there is no tensor/
pipeline/sequence parallelism in PointNav-VO (SURVEY.md §2.8); batch and env
axes shard across chips, parameters replicate.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def slurm_first_host(nodelist: str) -> str:
    """First hostname of a (possibly compressed) SLURM nodelist.

    SLURM compresses allocations as ``nid[001-004]`` or
    ``gpu[1,3-5]-rack,cpu7``; the coordinator must be the first *expanded*
    host (``nid001``), not the literal prefix (``nid``).  The reference
    shells out to ``scontrol show hostnames`` for this (ddp_utils.py:117-161);
    here the bracket grammar is expanded directly — commas inside brackets
    are range separators, outside they separate hosts."""
    import re

    depth = 0
    first = []
    for ch in nodelist:
        if ch == "[":
            depth += 1
        elif ch == "]":
            depth -= 1
        elif ch == "," and depth == 0:
            break
        first.append(ch)

    def expand(m):
        # first element of the bracket list; a range "001-004" keeps its
        # zero-padded lower bound
        return m.group(1).split(",")[0].split("-")[0]

    return re.sub(r"\[([^\]]*)\]", expand, "".join(first))


def init_distributed() -> None:
    """Multi-host rendezvous (the init_distrib_slurm analogue,
    ddp_utils.py:117-161): coordinator/rank/world-size from SLURM_* or
    JAX_COORDINATOR_* env vars; single-host is a no-op (all local devices
    are already visible)."""
    import os

    if os.environ.get("SLURM_NTASKS", "1") == "1" and "JAX_COORDINATOR_ADDRESS" not in os.environ:
        return
    coordinator = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator is None:
        nodelist = os.environ.get("SLURM_STEP_NODELIST", "localhost")
        coordinator = slurm_first_host(nodelist) + ":8476"
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=int(os.environ.get("SLURM_NTASKS", 1)),
        process_id=int(os.environ.get("SLURM_PROCID", 0)),
    )


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, batch_axis: int = 0) -> NamedSharding:
    spec = [None] * (batch_axis + 1)
    spec[batch_axis] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def shard_batch(tree, mesh: Mesh, batch_axis: int = 0):
    """Place every array in the tree with its batch axis split over the mesh."""
    sh = batch_sharding(mesh, batch_axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def replicate(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def rollout_pspec(rollouts):
    """PartitionSpecs sharding the env axis of a RolloutStorage pytree.

    Rollout arrays are [T(+1), N, ...] except hidden_states [T+1, L, N, H].
    """
    def spec(path, x):
        names = [getattr(p, "name", None) for p in path]
        if "hidden_states" in names:
            return P(None, None, DATA_AXIS)
        return P(None, DATA_AXIS)

    return jax.tree_util.tree_map_with_path(spec, rollouts)
