#!/usr/bin/env python
"""Benchmark: VO *training* throughput on one chip (joint turn stage).

Measures the full jitted update — fused preprocess + stacked turn experts
(left/right) + grouped regression + geo-invariance inverse loss + Adam — at
the Challenge-2020 resolution (341x192), the economics of the reference's
epoch loop (vo_cnn_regression_geo_invariance_engine.py:809-1018).

vs_baseline: the reference trains this stage on a single 2080Ti at ~100
pairs/s (README "~1 day/100 epochs with 4 GPUs" at 1M pairs -> ~460
pairs/s/4 GPUs, TRAIN.md); we use 115 pairs/s/GPU as the per-device estimate.

Default batch 256 (the per-step fixed costs dominate at the reference's
128: 1548 -> 2713 -> 3132 pairs/s at 128/256/512 on one v5e chip; large-
batch training uses the standard linear lr scaling).  The reference recipe
(1M pairs x 150 epochs, joint stage) completes in ~13-17 h on ONE chip at
these rates, vs ~a day on 4 GPUs for the reference.

Prints ONE JSON line and (with --save) writes bench_train.json.
"""

import argparse
import json
import time

import numpy as np

REFERENCE_TRAIN_PAIRS_PER_SEC = 115.0
BATCH = 256
WARMUP = 2
ITERS = 8


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=BATCH)
    p.add_argument("--iters", type=int, default=ITERS)
    p.add_argument("--precision", choices=("fp32", "bf16"), default="bf16",
                   help="bf16 = mixed precision (bf16 activations/convs, "
                        "fp32 params+adam), the documented fast mode; fp32 "
                        "matches reference numerics")
    p.add_argument("--save", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from pointnav_vo_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    from pointnav_vo_tpu.common import TURN_LEFT, TURN_RIGHT
    from pointnav_vo_tpu.vo.engine import VORegressionEngine, VOTrainConfig
    from pointnav_vo_tpu.vo.ensemble import VOInferenceConfig

    batch = args.batch
    icfg = VOInferenceConfig(
        dtype=(jnp.bfloat16 if args.precision == "bf16" else jnp.float32))
    tcfg = VOTrainConfig(
        batch_size=batch, epochs=1, action_type=(TURN_LEFT, TURN_RIGHT),
        geo_invariance_types=("inverse_joint_train",), lr=1.5e-4,
    )
    h, w = icfg.vis_size_h, icfg.vis_size_w

    model = icfg.make_model()
    dummy = {
        "rgb": jnp.zeros((1, h, w, 6)),
        "depth": jnp.zeros((1, h, w, 2)),
        "discretized_depth": jnp.zeros((1, h, w, 20)),
        "top_down_view": jnp.zeros((1, h, w, 2)),
    }
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), dummy,
                                               train=False))
    one = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype) + 0.01, shapes)
    engine = VORegressionEngine(icfg, tcfg, init_variables_per_expert=[one, one])

    rng = np.random.default_rng(0)
    arrs = {
        "prev_rgb": jnp.asarray(rng.uniform(0, 255, (batch, h, w, 3)), jnp.float32),
        "cur_rgb": jnp.asarray(rng.uniform(0, 255, (batch, h, w, 3)), jnp.float32),
        "prev_depth": jnp.asarray(rng.uniform(0, 1, (batch, h, w, 1)), jnp.float32),
        "cur_depth": jnp.asarray(rng.uniform(0, 1, (batch, h, w, 1)), jnp.float32),
        "actions": jnp.asarray(np.tile([TURN_LEFT, TURN_RIGHT], batch // 2), jnp.int32),
        "gt_delta": jnp.asarray(rng.normal(0, 0.1, (batch, 3)), jnp.float32),
        "data_types": jnp.asarray(np.tile([0, 1], batch // 2), jnp.int32),
        "dz_mask": jnp.ones((batch,), jnp.float32),
        "valid": jnp.ones((batch,), jnp.float32),
    }

    # joint-stage bucketed fast path: each expert's fwd+bwd touches only its
    # own half of the batch (exact B/2 occupancy from the twin layout)
    for j, act in enumerate((TURN_LEFT, TURN_RIGHT)):
        pos = np.flatnonzero(np.asarray(arrs["actions"]) == act).astype(np.int32)
        assert len(pos) == batch // 2
        arrs[f"bucket_idx_{j}"] = jnp.asarray(pos)

    variables, opt_state = engine.variables, engine.opt_state

    def step(variables, opt_state, key):
        return engine._train_step(variables, opt_state, arrs, key)

    key = jax.random.PRNGKey(0)
    for _ in range(WARMUP):
        key, sub = jax.random.split(key)
        variables, opt_state, metrics = step(variables, opt_state, sub)
        # host read gates the tunneled runtime (ack-early guard)
        assert np.isfinite(float(jnp.asarray(metrics["total_loss"]).mean()))

    t0 = time.perf_counter()
    for _ in range(args.iters):
        key, sub = jax.random.split(key)
        variables, opt_state, metrics = step(variables, opt_state, sub)
        assert np.isfinite(float(jnp.asarray(metrics["total_loss"]).mean()))
    dt = time.perf_counter() - t0

    pairs_per_sec = batch * args.iters / dt
    result = {
        "metric": "vo_train_pairs_per_sec_per_chip",
        "value": round(pairs_per_sec, 2),
        "unit": f"frame-pairs/s (batch {batch}, 341x192, {args.precision}, "
                "joint turn stage: fused preprocess + 2 stacked experts + "
                "geo-invariance + adam)",
        "vs_baseline": round(pairs_per_sec / REFERENCE_TRAIN_PAIRS_PER_SEC, 2),
    }
    print(json.dumps(result))
    if args.save:
        with open("bench_train.json", "w") as f:
            json.dump(result, f)


if __name__ == "__main__":
    main()
