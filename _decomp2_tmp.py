"""Round 2 of the forward decomposition: full model, bucket sizes, ablations."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from pointnav_vo_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import flax.linen as nn

from pointnav_vo_tpu.vo.ensemble import VOInferenceConfig
from pointnav_vo_tpu.models.vo_cnn import make_vo_model

ITERS = 8
cfg = VOInferenceConfig(dtype=jnp.bfloat16)
h, w = cfg.vis_size_h, cfg.vis_size_w
rng = np.random.default_rng(0)
barrier = jax.lax.optimization_barrier


def timed(name, apply_fn, params, x):
    @jax.jit
    def chain(params, x):
        acc = jnp.zeros((), jnp.float32)
        for _ in range(ITERS):
            y = apply_fn(params, x)
            acc = acc + jnp.sum(y.astype(jnp.float32))
            x, acc = barrier((x, acc))
        return acc

    float(chain(params, x))
    t0 = time.perf_counter()
    float(chain(params, x))
    dt = (time.perf_counter() - t0) / ITERS
    c = x.shape[0]
    print(f"{name:42s} {dt * 1e3:8.2f} ms  ({c / dt:7.0f} rows/s)", flush=True)
    return dt


def init_params(model, x):
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x, train=False))
    return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype) + 0.01, shapes)


model = cfg.make_model()
x384 = jnp.asarray(rng.uniform(0, 1, (384, h, w, 30)), jnp.bfloat16)
x128 = x384[:128]
p = init_params(model, x384[:1])

timed("full model C=384", lambda p_, s: model.apply(p_, s, train=False), p, x384)
timed("full model C=128", lambda p_, s: model.apply(p_, s, train=False), p, x128)

# no-whitening ablation (fresh init: no rmv variables)
m_nw = make_vo_model(
    cfg.model_name, observation_space=cfg.observation_space,
    observation_size=(cfg.vis_size_w, cfg.vis_size_h),
    hidden_size=cfg.hidden_size, backbone=cfg.backbone,
    normalize_visual_inputs=False,
    discretized_depth_channels=cfg.discretized_depth_channels,
    dropout_p=cfg.dropout_p, dtype=jnp.bfloat16)
p_nw = init_params(m_nw, x384[:1])
timed("full model C=384, whitening OFF", lambda p_, s: m_nw.apply(p_, s, train=False), p_nw, x384)

# GN -> identity ablation
orig = nn.GroupNorm.__call__
nn.GroupNorm.__call__ = lambda self, xx, **kw: xx
try:
    p_gn = init_params(model, x384[:1])
    timed("full model C=384, GN OFF", lambda p_, s: model.apply(p_, s, train=False), p_gn, x384)
finally:
    nn.GroupNorm.__call__ = orig

# 3-bucket real composition: 384 + 128 + 128 in one program
@jax.jit
def chain3(p_, a, b, c):
    acc = jnp.zeros((), jnp.float32)
    for _ in range(ITERS):
        for s in (a, b, c):
            acc = acc + jnp.sum(model.apply(p_, s, train=False))
        a, b, c, acc = barrier((a, b, c, acc))
    return acc


float(chain3(p, x384, x128, x128))
t0 = time.perf_counter()
float(chain3(p, x384, x128, x128))
dt = (time.perf_counter() - t0) / ITERS
print(f"{'3-bucket program (384+128+128)':42s} {dt * 1e3:8.2f} ms  ({512 / dt:7.0f} pairs/s-equiv)", flush=True)
