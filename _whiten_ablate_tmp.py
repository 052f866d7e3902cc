"""Ablation: predict_step_cached with RunningMeanAndVar skipped entirely.

Measures the whitening affine's real in-context cost in the fused det step.
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from pointnav_vo_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from pointnav_vo_tpu.vo.ensemble import (
    VOEnsemble, VOInferenceConfig, stack_expert_variables, frame_features,
)

BATCH = 512
ITERS = 16

if os.environ.get("ABLATE_WHITEN") == "1":
    from pointnav_vo_tpu.models.running_mean_var import RunningMeanAndVar

    def _skip(self, x, update_stats=False, stats_mask=None):
        return x.astype(self.dtype)

    RunningMeanAndVar.__call__ = _skip
    print("whitening: SKIPPED", flush=True)
else:
    print("whitening: normal", flush=True)

cfg = VOInferenceConfig(dtype=jnp.bfloat16)
model = cfg.make_model()
h, w = cfg.vis_size_h, cfg.vis_size_w
rng = np.random.default_rng(0)
prev_rgb = jnp.asarray(rng.uniform(0, 255, (BATCH, h, w, 3)), jnp.float32)
cur_rgb = jnp.asarray(rng.uniform(0, 255, (BATCH, h, w, 3)), jnp.float32)
prev_depth = jnp.asarray(rng.uniform(0, 1, (BATCH, h, w, 1)), jnp.float32)
cur_depth = jnp.asarray(rng.uniform(0, 1, (BATCH, h, w, 1)), jnp.float32)
actions = np.where(rng.uniform(size=BATCH) < 0.7, 1,
                   rng.integers(2, 4, BATCH)).astype(np.int32)

dummy = {
    "rgb": prev_rgb[:1].repeat(2, -1)[..., :6],
    "depth": jnp.concatenate([prev_depth[:1], cur_depth[:1]], -1),
    "discretized_depth": jnp.zeros((1, h, w, 20)),
    "top_down_view": jnp.zeros((1, h, w, 2)),
}
shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), dummy, train=False))
one = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype) + 0.01, shapes)
ensemble = VOEnsemble(cfg, stack_expert_variables([one, one, one]))

feats = ensemble.predict_step_cached(
    frame_features(prev_rgb, prev_depth, cfg), cur_rgb, cur_depth, actions)[1]


def chain(n, feats):
    acc = 0.0
    for _ in range(n):
        delta, feats = ensemble.predict_step_cached(feats, cur_rgb, cur_depth, actions)
        acc = acc + jnp.sum(delta)
    return float(acc), feats


_, feats = chain(2, feats)
t0 = time.perf_counter()
chain(ITERS, feats)
dt = (time.perf_counter() - t0) / ITERS
print(f"full fused step: {dt*1e3:8.2f} ms/step ({BATCH/dt:8.0f} pairs/s)", flush=True)
