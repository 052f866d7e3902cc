"""Pallas binning kernel == matmul binning (interpret mode on CPU)."""

import numpy as np

import jax.numpy as jnp

from pointnav_vo_tpu.ops.topdown import TopDownParams, top_down_counts, top_down_view_batch


def test_pallas_interpret_matches_matmul():
    rng = np.random.default_rng(0)
    p = TopDownParams(vis_size_h=64, vis_size_w=96)
    depth = np.zeros((64, 96), np.float32)
    depth[5:60, 3:90] = rng.uniform(0, 1, (55, 87)).astype(np.float32)

    want = np.asarray(top_down_counts(jnp.asarray(depth), p, impl="matmul"))
    got = np.asarray(top_down_counts(jnp.asarray(depth), p, impl="pallas_interpret"))
    np.testing.assert_array_equal(got, want)


def test_pallas_interpret_batch_views():
    rng = np.random.default_rng(1)
    p = TopDownParams(vis_size_h=48, vis_size_w=64)
    batch = rng.uniform(0, 1, (3, 48, 64)).astype(np.float32)
    want = np.asarray(top_down_view_batch(jnp.asarray(batch), p, impl="matmul"))
    got = np.asarray(top_down_view_batch(jnp.asarray(batch), p, impl="pallas_interpret"))
    np.testing.assert_array_equal(got, want)
