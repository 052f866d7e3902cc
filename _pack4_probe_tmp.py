"""Probe: pack G images per binning dot (M = G*192) to kill MXU tile padding."""
import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pointnav_vo_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from pointnav_vo_tpu.ops.topdown import TopDownParams, pixel_bins
from pointnav_vo_tpu.ops.topdown_pallas import bin_counts_pallas

B = 512
G = int(os.environ.get("PROBE_G", 4))
CHUNK = int(os.environ.get("PROBE_CHUNK", 2048))
params = TopDownParams()
h, w = params.vis_size_h, params.vis_size_w
rng = np.random.default_rng(0)
depth = jnp.asarray(rng.uniform(0, 1, (B, h, w)), jnp.float32)
ITERS = 8
barrier = jax.lax.optimization_barrier


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _make_kernel(h, w, p_pad, g):
    n_chunks = p_pad // CHUNK

    def kernel(pr_ref, pc_ref, out_ref, acc_ref):
        acc_ref[...] = jnp.zeros((g * h, w), jnp.int32)
        for i in range(n_chunks):
            # points of the g images are concatenated per chunk; pr already
            # carries the +img*h row offset
            pr = pr_ref[0, i, :].reshape(1, CHUNK)
            pc = pc_ref[0, i, :].reshape(1, CHUNK)
            ohr = (
                jax.lax.broadcasted_iota(jnp.int32, (g * h, CHUNK), 0) == pr
            ).astype(jnp.int8)
            ohc = (
                jax.lax.broadcasted_iota(jnp.int32, (w, CHUNK), 0) == pc
            ).astype(jnp.int8)
            acc_ref[...] += jax.lax.dot_general(
                ohr, ohc,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        out_ref[0] = acc_ref[...].astype(jnp.float32)

    return kernel


@functools.partial(jax.jit, static_argnames=("h", "w", "g"))
def bin_counts_packed(pix_r, pix_c, keep, h, w, g):
    b = pix_r.shape[0]
    assert b % g == 0
    p = pix_r.shape[1] * pix_r.shape[2]
    pr = jnp.where(keep, pix_r, -1).reshape(b // g, g, p)
    pr = pr + (jnp.arange(g) * h)[None, :, None]  # -1 pads stay out of range
    pr = pr.reshape(b // g, g * p)
    pc = pix_c.reshape(b // g, g * p)
    p_pad = _round_up(g * p, CHUNK)
    pad = [(0, 0), (0, p_pad - g * p)]
    n_chunks = p_pad // CHUNK
    pr = jnp.pad(pr, pad, constant_values=-999).reshape(b // g, n_chunks, CHUNK)
    pc = jnp.pad(pc, pad, constant_values=-1).reshape(b // g, n_chunks, CHUNK)
    out = pl.pallas_call(
        _make_kernel(h, w, p_pad, g),
        out_shape=jax.ShapeDtypeStruct((b // g, g * h, w), jnp.float32),
        grid=(b // g,),
        in_specs=[
            pl.BlockSpec((1, n_chunks, CHUNK), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_chunks, CHUNK), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, g * h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((g * h, w), jnp.int32)],
    )(pr, pc)
    return out.reshape(b, h, w)


bins = jax.jit(jax.vmap(lambda d: pixel_bins(d, params)))
pr, pc, keep = jax.block_until_ready(bins(depth))

c_ref = bin_counts_pallas(pr[:8], pc[:8], keep[:8], h, w)
c_pk = bin_counts_packed(pr[:8], pc[:8], keep[:8], h, w, G)
np.testing.assert_array_equal(np.asarray(c_pk), np.asarray(c_ref))
print(f"packed G={G} == reference counts: OK", flush=True)


def timed(name, fn, *extra):
    @functools.partial(jax.jit, static_argnames=())
    def chain(pr, pc, keep):
        acc = jnp.zeros((), jnp.float32)
        for _ in range(ITERS):
            c = fn(pr, pc, keep, h, w, *extra)
            acc = acc + jnp.sum(c)
            pr, pc, keep, acc = barrier((pr, pc, keep, acc))
        return acc

    float(chain(pr, pc, keep))
    t0 = time.perf_counter()
    float(chain(pr, pc, keep))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:38s} {dt * 1e3:8.2f} ms  ({B / dt:7.0f} img/s)", flush=True)


timed("int8 per-image (current)", bin_counts_pallas)
timed(f"int8 packed G={G}", bin_counts_packed, G)
