"""Tests for depth discretization and the cv2-matched Gaussian blur."""

import cv2
import numpy as np

import jax.numpy as jnp

from pointnav_vo_tpu.ops.depth import discretize_depth, gaussian_blur_3x3


def test_discretize_depth_partition_exactness():
    """Every pixel lands in exactly one bin — the reference's own assert
    (regression_iter_dataset.py:66-68)."""
    rng = np.random.default_rng(0)
    d = rng.uniform(0.0, 1.0, size=(4, 24, 31)).astype(np.float32)
    # include the boundary values explicitly
    d[0, 0, :10] = np.linspace(0.0, 1.0, 10)
    oh = np.asarray(discretize_depth(jnp.asarray(d), 10))
    assert oh.shape == (4, 24, 31, 10)
    np.testing.assert_array_equal(oh.sum(-1), np.ones_like(d))


def test_discretize_depth_bin_boundaries():
    """Bin i covers [i/10, (i+1)/10), last bin closed at 1.0."""
    vals = jnp.asarray([0.0, 0.09999, 0.1, 0.999, 1.0, 0.5])
    oh = np.asarray(discretize_depth(vals, 10))
    np.testing.assert_array_equal(np.argmax(oh, -1), [0, 0, 1, 9, 9, 5])


def test_gaussian_blur_matches_cv2_border_isolated():
    rng = np.random.default_rng(1)
    img = rng.uniform(size=(48, 72)).astype(np.float32)
    want = cv2.GaussianBlur(img, (3, 3), sigmaX=0, sigmaY=0, borderType=cv2.BORDER_ISOLATED)
    got = np.asarray(gaussian_blur_3x3(jnp.asarray(img)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_gaussian_blur_crop_equivalence():
    """Blurring the full zero-bordered image == blurring the stripped crop,
    at in-crop pixels (the masking argument used by ops.topdown)."""
    rng = np.random.default_rng(2)
    img = np.zeros((40, 50), np.float32)
    img[7:30, 5:44] = rng.uniform(0.1, 1.0, size=(23, 39)).astype(np.float32)
    crop = img[7:30, 5:44]
    want = cv2.GaussianBlur(crop, (3, 3), sigmaX=0, sigmaY=0, borderType=cv2.BORDER_ISOLATED)
    full = np.asarray(gaussian_blur_3x3(jnp.asarray(img)))
    np.testing.assert_allclose(full[7:30, 5:44], want, atol=1e-6)
