"""Pallas TPU kernel: top-down point binning with VMEM-resident one-hots.

The matmul formulation in ops/topdown.py materializes the per-point one-hot
matrices in HBM (~70 MB per image pair at 341x192) — the binning becomes
HBM-bandwidth-bound.  This kernel streams point chunks through VMEM: for each
chunk of candidate points it builds the [H, chunk] / [W, chunk] one-hots
with broadcasted_iota comparisons (VPU) and accumulates
``counts += ohr @ ohc^T`` on the MXU into a VMEM scratch accumulator.  The
one-hots never exist outside VMEM, cutting the op's HBM traffic to the
[P] int32 bin indices plus the [H, W] output.

The one-hots and the contraction are **int8 -> int32**: the binning matmul is
the op's FLOP bill (P x H x W ~ 2.2 Tops per 512-image batch) and v5e's MXU
runs int8 at 2x the bf16 rate.  Counts are exact in any of these dtypes (0/1
operands, integer accumulation far below 2^24 / 2^31); measured on v5e at
batch 512: 19.9 ms (bf16) -> 13.2 ms (int8).  Invalid points carry bin index
-1, which matches no one-hot row.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 2048


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _make_kernel(h: int, w: int, p_pad: int):
    n_chunks = p_pad // CHUNK

    def kernel(pr_ref, pc_ref, out_ref, acc_ref):
        acc_ref[...] = jnp.zeros((h, w), jnp.int32)
        for i in range(n_chunks):
            pr = pr_ref[0, i, :].reshape(1, CHUNK)  # [1, CHUNK]
            pc = pc_ref[0, i, :].reshape(1, CHUNK)
            ohr = (
                jax.lax.broadcasted_iota(jnp.int32, (h, CHUNK), 0) == pr
            ).astype(jnp.int8)  # [H, CHUNK]
            ohc = (
                jax.lax.broadcasted_iota(jnp.int32, (w, CHUNK), 0) == pc
            ).astype(jnp.int8)  # [W, CHUNK]
            acc_ref[...] += jax.lax.dot_general(
                ohr, ohc,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        out_ref[0] = acc_ref[...].astype(jnp.float32)

    return kernel


@functools.partial(jax.jit, static_argnames=("h", "w", "interpret"))
def bin_counts_pallas(
    pix_r: jax.Array,  # [B, band, W_in] int32
    pix_c: jax.Array,
    keep: jax.Array,  # [B, band, W_in] bool
    h: int,
    w: int,
    interpret: bool = False,
) -> jax.Array:
    """[B, h, w] float32 counts."""
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
        _make_kernel(h, w, p_pad),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n_chunks, CHUNK), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_chunks, CHUNK), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((h, w), jnp.int32)],
        interpret=interpret,
    )(pr, pc)
