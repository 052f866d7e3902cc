#!/usr/bin/env python
"""Decompose the steady-state det VO step cost on the real chip.

Times, at the bench configuration (batch 512, 341x192, bf16, 70%-forward
mix), each stage of `_vo_step_cached` in isolation:

  1. frame_features_packed  (cast + discretize + top-down + pack)
  2.   ... top_down_view_batch alone (matmul and pallas impls)
  3. bucket selection (one-hot einsum per bucket) on the packed pair
  4. expert forwards on pre-selected rows (no selection)
  5. the full fused step (reference point)

Each timing runs ITERS dispatch-chained steps with one host sync at the end
(same protocol as bench.py).  Iterations are separated with
``lax.optimization_barrier`` and every stage output is fully consumed
(jnp.sum) — without both, XLA CSEs the identical iterations into one and
dead-code-eliminates everything not feeding the single element read, and the
"timings" measure nothing.  Run from the repo root:
python examples/profile_vo_step.py
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", 512))
ITERS = int(os.environ.get("BENCH_ITERS", 8))


def timed(name, fn, *args):
    float(fn(*args))  # warmup/compile; host read — block_until_ready can
    t0 = time.perf_counter()  # ack early through the tunneled runtime
    float(fn(*args))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:45s} {dt*1e3:8.2f} ms/step  ({BATCH/dt:8.0f} img-or-pairs/s)")
    return dt


def main():
    from pointnav_vo_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    from pointnav_vo_tpu.vo.ensemble import (
        VOEnsemble,
        VOInferenceConfig,
        bucket_expert_indices_static,
        frame_features_packed,
        select_rows_onehot,
        stack_expert_variables,
    )
    from pointnav_vo_tpu.ops.topdown import TopDownParams, top_down_view_batch

    cfg = VOInferenceConfig(dtype=jnp.bfloat16)
    model = cfg.make_model()
    h, w = cfg.vis_size_h, cfg.vis_size_w

    rng = np.random.default_rng(0)
    cur_rgb = jnp.asarray(rng.uniform(0, 255, (BATCH, h, w, 3)), jnp.float32)
    cur_depth = jnp.asarray(rng.uniform(0, 1, (BATCH, h, w, 1)), jnp.float32)
    actions = np.where(rng.uniform(size=BATCH) < 0.7, 1,
                       rng.integers(2, 4, BATCH)).astype(np.int32)

    dummy = {
        "rgb": jnp.zeros((1, h, w, 6)),
        "depth": jnp.zeros((1, h, w, 2)),
        "discretized_depth": jnp.zeros((1, h, w, 20)),
        "top_down_view": jnp.zeros((1, h, w, 2)),
    }
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), dummy, train=False))
    one = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype) + 0.01, shapes)
    ensemble = VOEnsemble(cfg, stack_expert_variables([one, one, one]))

    feats = frame_features_packed(cur_rgb, cur_depth, cfg)
    buckets, order = bucket_expert_indices_static(actions, BATCH)
    order = jnp.asarray(order)

    barrier = jax.lax.optimization_barrier

    # 1. packed per-frame preprocess
    @jax.jit
    def chain_pre(rgb, depth):
        acc = jnp.zeros((), jnp.float32)
        for _ in range(ITERS):
            f = frame_features_packed(rgb, depth, cfg)
            acc = acc + jnp.sum(f.astype(jnp.float32))
            rgb, depth, acc = barrier((rgb, depth, acc))
        return acc

    timed("frame_features_packed (full preprocess)", chain_pre, cur_rgb, cur_depth)

    # 2. top-down alone, both impls
    d2 = cur_depth[..., 0]
    for impl in ("pallas", "matmul"):
        @jax.jit
        def chain_td(depth, impl=impl):
            acc = jnp.zeros((), jnp.float32)
            for _ in range(ITERS):
                v = top_down_view_batch(depth, cfg.topdown_params, impl)
                acc = acc + jnp.sum(v)
                depth, acc = barrier((depth, acc))
            return acc

        timed(f"top_down_view_batch[{impl}]", chain_td, d2)

    # 3. bucket selection alone on the packed [B,H,W,30] pair.  NOTE: in the
    # real fused program each per-bucket selection fuses into its expert's
    # stem conv; standalone it must materialize [C,H,W,30] to HBM, so this
    # row is an upper bound on the selection's marginal cost.
    pair = jnp.concatenate([feats, feats], axis=-1)

    @jax.jit
    def chain_sel(pair):
        acc = jnp.zeros((), jnp.float32)
        for _ in range(ITERS):
            for idx in buckets:
                if idx.shape[0] == 0:
                    continue
                sub = select_rows_onehot(pair, idx, BATCH)
                acc = acc + jnp.sum(sub.astype(jnp.float32))
            pair, acc = barrier((pair, acc))
        return acc

    timed("bucket selection (one-hot einsums)", chain_sel, pair)

    # 4. expert forwards on pre-selected contiguous rows (no selection cost)
    subs = [pair[: idx.shape[0]] for idx in buckets if idx.shape[0]]

    @jax.jit
    def chain_fwd(subs):
        acc = jnp.zeros((), jnp.float32)
        for _ in range(ITERS):
            for j, sub in enumerate(subs):
                params_e = jax.tree.map(lambda x: x[j], ensemble.variables)
                pred = model.apply(params_e, sub, train=False)
                acc = acc + jnp.sum(pred).astype(jnp.float32)
            subs = barrier(subs)

        return acc

    timed("expert forwards (pre-sliced rows)", chain_fwd, subs)

    # 5. full fused step
    def chain_full(n, feats):
        acc = jnp.zeros((), jnp.float32)
        for _ in range(n):
            delta, feats = ensemble.predict_step_cached(
                feats, cur_rgb, cur_depth, actions)
            acc = acc + jnp.sum(delta).astype(jnp.float32)
        return float(acc), feats

    # predict_step_cached donates its feats argument — thread the returned
    # cache forward or the timed call reads a deleted buffer
    _, feats = chain_full(2, feats)
    t0 = time.perf_counter()
    chain_full(ITERS, feats)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{'FULL fused step (predict_step_cached)':45s} {dt*1e3:8.2f} ms/step  ({BATCH/dt:8.0f} pairs/s)")


if __name__ == "__main__":
    main()
