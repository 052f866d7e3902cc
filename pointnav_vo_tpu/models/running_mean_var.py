"""Per-channel running input whitening (functional flax port).

Mirrors the reference ``model_utils/running_mean_and_var.py:13-63``: batch
statistics are per-sample spatial means averaged over the batch, merged into
the running buffers with Chan's parallel-variance formula, and the stddev is
floored at 0.1 (var floored at 1e-2).

TPU-native twist: the reference's ``torch.distributed.all_reduce`` of the
batch stats (:27-38) becomes a ``jax.lax.psum`` over the data-parallel mesh
axis when ``axis_name`` is set — the collective is part of the jitted graph
and rides ICI instead of NCCL.

State lives in the ``batch_stats`` flax collection: {mean[C], var[C], count[]}.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class RunningMeanAndVar(nn.Module):
    channels: int
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, update_stats: bool = False,
                 stats_mask: Optional[jax.Array] = None) -> jax.Array:
        """x: [B, H, W, C]. ``stats_mask`` [B] restricts which samples feed the
        running statistics (used when several stacked experts share a batch
        but must only learn stats from their own action's samples — the
        reference's per-action sub-batch forward, engine:569-588)."""
        mean = self.variable("batch_stats", "mean", jnp.zeros, (self.channels,))
        var = self.variable("batch_stats", "var", jnp.zeros, (self.channels,))
        count = self.variable("batch_stats", "count", jnp.zeros, ())

        if update_stats:
            # ONE fused pass over x: per-sample spatial sums of (x-c) and
            # (x-c)^2 with c = the running mean (a buffer, known before the
            # read), then var = E[(x-c)^2] - d^2 with d = E[x-c] — the
            # shifted-data variance identity, algebraically equal to the
            # two-pass E[(x-new_mean)^2] and numerically safe because c
            # tracks the data mean.  The previous two-pass form materialized
            # an f32 copy of x and re-read it for the centered square
            # (measured ~2.2 ms/expert of the joint train step at batch 256,
            # 341x192; one-pass: ~0.9 ms).  Also one psum instead of three.
            m = jnp.ones(x.shape[0]) if stats_mask is None else stats_mask.astype(jnp.float32)
            c = mean.value  # [C]
            xs = x.astype(jnp.float32) - c
            s1 = jnp.sum(jnp.mean(xs, axis=(1, 2)) * m[:, None], axis=0)  # [C]
            s2 = jnp.sum(jnp.mean(xs * xs, axis=(1, 2)) * m[:, None], axis=0)
            new_count = jnp.sum(m)
            if self.axis_name is not None:
                s1, s2, new_count = jax.lax.psum(
                    (s1, s2, new_count), self.axis_name)
            new_count = jnp.maximum(new_count, 1e-6)
            d = s1 / new_count
            new_mean = c + d
            new_var = s2 / new_count - d * d

            old_count = count.value
            tot = old_count + new_count
            m2 = (
                var.value * old_count
                + new_var * new_count
                + (new_mean - mean.value) ** 2 * old_count * new_count / tot
            )
            var.value = m2 / tot
            mean.value = (old_count * mean.value + new_count * new_mean) / tot
            count.value = tot

        stdev = jnp.sqrt(jnp.maximum(var.value, 1e-2))
        return ((x.astype(jnp.float32) - mean.value) / stdev).astype(self.dtype)
