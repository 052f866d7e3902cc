"""Decompose the VO expert forward on the TPU: cumulative prefixes + GN ablation.

Timing protocol: ITERS optimization_barrier-chained iterations, every output
consumed via jnp.sum, one host read at the end (tunnel-safe).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from pointnav_vo_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import flax.linen as nn

from pointnav_vo_tpu.models import resnet as resnet_lib
from pointnav_vo_tpu.models.running_mean_var import RunningMeanAndVar
from pointnav_vo_tpu.vo.ensemble import VOInferenceConfig

C = 384
ITERS = 8
cfg = VOInferenceConfig(dtype=jnp.bfloat16)
h, w = cfg.vis_size_h, cfg.vis_size_w
rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.uniform(0, 1, (C, h, w, 30)), jnp.bfloat16)
barrier = jax.lax.optimization_barrier


def timed(name, module, x):
    shapes = jax.eval_shape(lambda: module.init(jax.random.PRNGKey(0), x))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype) + 0.01, shapes)

    @jax.jit
    def chain(params, x):
        acc = jnp.zeros((), jnp.float32)
        for _ in range(ITERS):
            y = module.apply(params, x)
            acc = acc + jnp.sum(y.astype(jnp.float32))
            x, acc = barrier((x, acc))
        return acc

    float(chain(params, x))  # compile + warmup
    t0 = time.perf_counter()
    float(chain(params, x))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:38s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


class Prefix(nn.Module):
    """whitening -> stem -> first `stages` resnet stages (18-layout)."""

    stages: int = 0
    whiten: bool = True
    stem: bool = True

    @nn.compact
    def __call__(self, x):
        if self.whiten:
            x = RunningMeanAndVar(30, dtype=jnp.bfloat16, name="rmv")(
                x, update_stats=False)
        if not self.stem:
            return x
        layers = tuple(2 if s < self.stages else 0 for s in range(4))
        bb = resnet_lib.GNResNet(base_planes=32, ngroups=16, block="basic",
                                 layers=layers, dtype=jnp.bfloat16,
                                 name="backbone")
        return bb(x)


timed("whitening only", Prefix(stages=0, stem=False), x0)
timed("+ stem/gn/relu/maxpool", Prefix(stages=0), x0)
timed("+ stage1 (32ch)", Prefix(stages=1), x0)
timed("+ stage2 (64ch)", Prefix(stages=2), x0)
timed("+ stage3 (128ch)", Prefix(stages=3), x0)
timed("+ stage4 (256ch)", Prefix(stages=4), x0)

model = cfg.make_model()
full = lambda: None


class Full(nn.Module):
    @nn.compact
    def __call__(self, x):
        return model.clone()(x, train=False)


timed("full model (head incl.)", Full(), x0)

# GN ablation: identity GroupNorm (keeps conv structure, drops the
# two-pass normalization) -- measures the GN share of the forward
orig = nn.GroupNorm.__call__
nn.GroupNorm.__call__ = lambda self, x, **kw: x
try:
    timed("full model, GN -> identity", Full(), x0)
finally:
    nn.GroupNorm.__call__ = orig

# relu+maxpool-only stem ablation is meaningless; instead: f32 input read
x_f32 = x0.astype(jnp.float32)
timed("full model (f32 input feed)", Full(), x_f32)
