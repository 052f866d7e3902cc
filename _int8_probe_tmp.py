"""Probe: int8 MXU binning inside the pallas top-down kernel (v5e 2x int8 rate)."""
import functools
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
params = TopDownParams()
h, w = params.vis_size_h, params.vis_size_w
rng = np.random.default_rng(0)
depth = jnp.asarray(rng.uniform(0, 1, (B, h, w)), jnp.float32)
ITERS = 8
barrier = jax.lax.optimization_barrier
import os
CHUNK = int(os.environ.get("PROBE_CHUNK", 4096))


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _make_kernel_i8(h, w, p_pad):
    n_chunks = p_pad // CHUNK

    def kernel(pr_ref, pc_ref, out_ref, acc_ref):
        acc_ref[...] = jnp.zeros((h, w), jnp.int32)
        for i in range(n_chunks):
            pr = pr_ref[0, i, :].reshape(1, CHUNK)
            pc = pc_ref[0, i, :].reshape(1, CHUNK)
            ohr = (
                jax.lax.broadcasted_iota(jnp.int32, (h, CHUNK), 0) == pr
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


@functools.partial(jax.jit, static_argnames=("h", "w"))
def bin_counts_pallas_i8(pix_r, pix_c, keep, h, w):
    b = pix_r.shape[0]
    p = pix_r.shape[1] * pix_r.shape[2]
    p_pad = _round_up(p, CHUNK)
    pr = jnp.where(keep, pix_r, -1).reshape(b, p)
    pc = pix_c.reshape(b, p)
    pad = [(0, 0), (0, p_pad - p)]
    n_chunks = p_pad // CHUNK
    pr = jnp.pad(pr, pad, constant_values=-1).reshape(b, n_chunks, CHUNK)
    pc = jnp.pad(pc, pad, constant_values=-1).reshape(b, n_chunks, CHUNK)
    return pl.pallas_call(
        _make_kernel_i8(h, w, p_pad),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n_chunks, CHUNK), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_chunks, CHUNK), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((h, w), jnp.int32)],
    )(pr, pc)


bins = jax.jit(jax.vmap(lambda d: pixel_bins(d, params)))
pr, pc, keep = bins(depth)
pr, pc, keep = jax.block_until_ready((pr, pc, keep))

# correctness
c_ref = bin_counts_pallas(pr[:4], pc[:4], keep[:4], h, w)
c_i8 = bin_counts_pallas_i8(pr[:4], pc[:4], keep[:4], h, w)
np.testing.assert_array_equal(np.asarray(c_i8), np.asarray(c_ref))
print("int8 == bf16 pallas counts: OK", flush=True)


def timed(name, fn):
    @jax.jit
    def chain(pr, pc, keep):
        acc = jnp.zeros((), jnp.float32)
        for _ in range(ITERS):
            c = fn(pr, pc, keep, h, w)
            acc = acc + jnp.sum(c)
            pr, pc, keep, acc = barrier((pr, pc, keep, acc))
        return acc

    float(chain(pr, pc, keep))
    t0 = time.perf_counter()
    float(chain(pr, pc, keep))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:38s} {dt * 1e3:8.2f} ms  ({B / dt:7.0f} img/s)", flush=True)


timed("pallas bf16 binning (current)", bin_counts_pallas)
timed("pallas int8 binning", bin_counts_pallas_i8)
