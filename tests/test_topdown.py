"""Top-down projection vs an independent numpy/cv2 oracle.

The oracle re-derives the reference algorithm (geometry_utils.py:277-488)
from its definition: strip all-zero borders, cv2-blur the crop, unproject the
+/-50-row band around the crop's vertical center through intrinsics built
with the hfov-in-degrees quirk, count points per output pixel, normalize.
"""

import cv2
import numpy as np

import jax.numpy as jnp

from pointnav_vo_tpu.ops.topdown import (
    TopDownParams,
    top_down_counts,
    top_down_view,
    top_down_view_batch,
)


def oracle_top_down(depth, p: TopDownParams, return_counts=False):
    h, w = p.vis_size_h, p.vis_size_w
    rows = np.flatnonzero(depth.sum(1) > 0)
    cols = np.flatnonzero(depth.sum(0) > 0)
    if rows.size == 0:
        return np.zeros((h, w), np.float32)
    r0, r1, c0, c1 = rows[0], rows[-1], cols[0], cols[-1]
    crop = depth[r0 : r1 + 1, c0 : c1 + 1].astype(np.float32)
    blur = cv2.GaussianBlur(crop, (3, 3), sigmaX=0, sigmaY=0, borderType=cv2.BORDER_ISOLATED)
    if blur.ndim == 1:
        blur = blur[None] if crop.shape[0] == 1 else blur[:, None]

    ch = crop.shape[0]
    if p.flag_center_crop:
        center = int(np.ceil(ch / 2))
        lo, hi = max(0, center - p.rows_around_center), min(ch, center + p.rows_around_center)
    else:
        lo, hi = 0, min(2 * p.rows_around_center, ch)
    band = blur[lo:hi, :]

    f = (w / 2.0) / np.tan(p.hfov_rad / 2.0)
    u0 = w / 2.0
    cc, _rr = np.meshgrid(np.arange(crop.shape[1]) + c0, np.arange(hi - lo))
    td = band * (p.max_depth - p.min_depth) + p.min_depth
    x = (cc + 0.5 - u0) / f * td

    xb = (w - 0.5 - u0) / f * p.max_depth
    ndc_x = (x - (-xb)) / (2 * xb * 1.01)
    ndc_d = (td - p.min_depth) / ((p.max_depth - p.min_depth) * 1.01)
    pr = (h - np.ceil(h * ndc_d)).astype(np.int64).ravel()
    pc = np.floor(w * ndc_x).astype(np.int64).ravel()
    ok = (pr >= 0) & (pr < h) & (pc >= 0) & (pc < w)
    cnt = np.zeros((h, w), np.float32)
    np.add.at(cnt, (pr[ok], pc[ok]), 1.0)
    if return_counts:
        return cnt
    m = cnt.max()
    return np.minimum(cnt / m, 1.0) if m > 0 else cnt


def _params(h=64, w=96):
    return TopDownParams(vis_size_h=h, vis_size_w=w)


def _compare(depth, p, max_moved_points=3):
    """Compare raw counts: float32-vs-float64 rounding at a bin edge may move
    a point to a neighboring cell (which rescales the normalized view via the
    max-count denominator), so budget a few moved points, not cell values."""
    got = np.asarray(top_down_counts(jnp.asarray(depth), p))
    want = oracle_top_down(depth, p, return_counts=True)
    moved = np.abs(got - want).sum() / 2  # each moved point changes two cells
    assert moved <= max_moved_points, f"{moved} points moved cells"
    # and the normalized view is self-consistent
    view = np.asarray(top_down_view(jnp.asarray(depth), p))
    m = got.max()
    if m > 0:
        np.testing.assert_allclose(view, np.minimum(got / m, 1.0), atol=1e-6)


def test_topdown_random_depth():
    rng = np.random.default_rng(0)
    p = _params()
    depth = rng.uniform(0, 1, size=(p.vis_size_h, p.vis_size_w)).astype(np.float32)
    _compare(depth, p)


def test_topdown_zero_border_and_holes():
    rng = np.random.default_rng(1)
    p = _params()
    depth = np.zeros((p.vis_size_h, p.vis_size_w), np.float32)
    depth[9:50, 7:80] = rng.uniform(0, 1, size=(41, 73)).astype(np.float32)
    depth[20:25, :] = 0.0  # interior all-zero rows stay inside the crop
    _compare(depth, p)


def test_topdown_all_zero():
    p = _params()
    depth = np.zeros((p.vis_size_h, p.vis_size_w), np.float32)
    got = np.asarray(top_down_view(jnp.asarray(depth), p))
    np.testing.assert_array_equal(got, 0.0)


def test_topdown_challenge_resolution():
    """Full 341x192 Challenge-2020 geometry with the hfov=70-'radians' quirk."""
    rng = np.random.default_rng(2)
    p = TopDownParams(vis_size_h=192, vis_size_w=341)
    depth = rng.uniform(0, 1, size=(192, 341)).astype(np.float32)
    depth[:15] = 0
    depth[:, -9:] = 0
    _compare(depth, p)


def test_topdown_batch_matches_single():
    rng = np.random.default_rng(3)
    p = _params(48, 64)
    batch = rng.uniform(0, 1, size=(5, 48, 64)).astype(np.float32)
    got = np.asarray(top_down_view_batch(jnp.asarray(batch), p))
    for i in range(5):
        single = np.asarray(top_down_view(jnp.asarray(batch[i]), p))
        np.testing.assert_array_equal(got[i], single)
