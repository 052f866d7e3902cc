"""Child process for the real 2-process jax.distributed integration test.

Run by tests/test_multihost_init.py::test_real_two_process_rendezvous via
subprocess with SLURM_NTASKS / SLURM_PROCID / JAX_COORDINATOR_ADDRESS set.
Each process owns 2 virtual CPU devices; the pair forms one 4-device global
mesh, runs a psum and one sharded VO train step, and prints machine-checked
lines the parent asserts on.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402


def main():
    from pointnav_vo_tpu.parallel.mesh import DATA_AXIS, init_distributed, make_mesh

    init_distributed()
    assert jax.process_count() == 2, jax.process_count()
    rank = jax.process_index()
    assert jax.device_count() == 4, jax.device_count()
    print(f"RENDEZVOUS rank={rank} procs={jax.process_count()} "
          f"devices={jax.device_count()}", flush=True)

    mesh = make_mesh()

    # ---- 1) psum across the 4-device global mesh -------------------------
    # each process contributes rank+1 per local device: global sum = 6
    local = np.full((2,), rank + 1.0, np.float32)
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(DATA_AXIS)), local, (4,))
    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr)
    # replicated output: every process reads its own addressable copy
    total = float(np.asarray(total.addressable_data(0)))
    print(f"PSUM rank={rank} total={total}", flush=True)
    assert total == 6.0, total

    # ---- 2) one sharded VO train step, all ranks must agree --------------
    from pointnav_vo_tpu.common import TURN_LEFT, TURN_RIGHT
    from pointnav_vo_tpu.vo.engine import VORegressionEngine, VOTrainConfig
    from pointnav_vo_tpu.vo.ensemble import VOInferenceConfig

    h = w = 32
    batch = 8  # two samples per global device (twin-adjacent pair layout)
    icfg = VOInferenceConfig(vis_size_w=w, vis_size_h=h)
    tcfg = VOTrainConfig(batch_size=batch, epochs=1,
                         action_type=(TURN_LEFT, TURN_RIGHT),
                         geo_invariance_types=("inverse_joint_train",),
                         lr=1.5e-4)
    model = icfg.make_model()
    dummy = {
        "rgb": jnp.zeros((1, h, w, 6)), "depth": jnp.zeros((1, h, w, 2)),
        "discretized_depth": jnp.zeros((1, h, w, 20)),
        "top_down_view": jnp.zeros((1, h, w, 2)),
    }
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), dummy, train=False))
    one = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype) + 0.01, shapes)
    engine = VORegressionEngine(icfg, tcfg, mesh=mesh,
                                init_variables_per_expert=[one, one])

    # identical global batch on every rank (seeded), sharded by local rows
    rng = np.random.default_rng(0)
    sh = NamedSharding(mesh, P(DATA_AXIS))

    def shard(x):
        x = np.asarray(x)
        lo = rank * (batch // 2)
        return jax.make_array_from_process_local_data(
            sh, np.ascontiguousarray(x[lo:lo + batch // 2]), x.shape)

    arrs = {
        "prev_rgb": shard(rng.uniform(0, 255, (batch, h, w, 3)).astype(np.float32)),
        "cur_rgb": shard(rng.uniform(0, 255, (batch, h, w, 3)).astype(np.float32)),
        "prev_depth": shard(rng.uniform(0, 1, (batch, h, w, 1)).astype(np.float32)),
        "cur_depth": shard(rng.uniform(0, 1, (batch, h, w, 1)).astype(np.float32)),
        "actions": shard(np.tile([TURN_LEFT, TURN_RIGHT],
                                 batch // 2).astype(np.int32)),
        "gt_delta": shard(rng.normal(0, 0.1, (batch, 3)).astype(np.float32)),
        "data_types": shard(np.tile([0, 1], batch // 2).astype(np.int32)),
        "dz_mask": shard(np.ones(batch, np.float32)),
        "valid": shard(np.ones(batch, np.float32)),
    }
    variables, opt_state, metrics = engine._train_step(
        engine.variables, engine.opt_state, arrs, jax.random.PRNGKey(0))
    jax.block_until_ready(variables)
    tl = metrics["total_loss"]
    shards = (tl.addressable_shards if hasattr(tl, "addressable_shards")
              else [tl])
    local = np.float32(np.mean([np.asarray(getattr(s, "data", s))
                                for s in shards]))
    # host-side allgather: every rank sees every rank's loss
    losses = np.asarray(
        jax.experimental.multihost_utils.process_allgather(local))
    print(f"TRAINSTEP rank={rank} losses={losses.tolist()}", flush=True)
    assert np.isfinite(losses).all(), losses
    # pmean'd grads + psum'd stats: every rank must hold the identical loss
    assert np.allclose(losses, losses[0]), losses
    print(f"DONE rank={rank} loss={float(losses[0]):.6f}", flush=True)


if __name__ == "__main__":
    import jax.experimental.multihost_utils  # noqa: F401

    main()
