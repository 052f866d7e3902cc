"""Egocentric top-down projection of a depth map — static-shaped and jittable.

Re-derivation of the reference's ``NormalizedDepth2TopDownViewHabitat``
(``pointnav_vo/utils/geometry_utils.py:277-488`` numpy / :491-721 torch):
strip all-zero border rows/cols, 3x3 Gaussian-blur the crop, unproject pixels
around the horizontal midline through the pinhole intrinsics, bin the (x,
forward) point cloud into an HxW count grid, and normalize by the max count.

TPU-first reformulation (everything static-shaped, one fused XLA program):

- The data-dependent border strip becomes *masking*: we blur the full image
  with zero padding (bit-equal to blurring the crop with BORDER_ISOLATED,
  because the stripped rows/cols are all-zero — see ``ops.depth``), and mark
  each pixel valid iff it falls inside the crop and inside the +/-50-row
  selection window around the crop's vertical center.
- The per-point ``np.unique`` count becomes a scatter-add
  (``zeros.at[flat_idx].add(1)``) with invalid points dropped — XLA lowers
  this to a single scatter.

Parity quirks preserved deliberately (do NOT "fix" them — the published
checkpoints bake them in):

- ``hfov`` is consumed as *radians* but every reference call site passes the
  HFOV in **degrees** (70) — i.e. the intrinsics use ``tan(35 rad)``
  (geometry_utils.py:343-349; call sites: vo engine :179,
  base_trainer_with_vo.py:125, challenge2020_agent.py:271).
- Zero-depth pixels inside the selection window still unproject (to a point
  at ``min_depth``) and are counted, exactly as in the reference.
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp

from pointnav_vo_tpu.ops.depth import gaussian_blur_3x3

_EPSILON = 0.01  # reference geometry_utils.py:289


@dataclasses.dataclass(frozen=True)
class TopDownParams:
    """Static projection parameters (reference ctor geometry_utils.py:278-300)."""

    min_depth: float = 0.1
    max_depth: float = 10.0
    vis_size_h: int = 192
    vis_size_w: int = 341
    # NOTE: the reference passes HFOV in degrees into a radians slot; keep the
    # raw number to stay checkpoint-compatible.
    hfov_rad: float = 70.0
    rows_around_center: int = 50
    flag_center_crop: bool = True

    @property
    def focal(self) -> float:
        return (self.vis_size_w / 2.0) / math.tan(self.hfov_rad / 2.0)

    @property
    def x_bound(self) -> float:
        """Half-width of the x range at max_depth (geometry_utils.py:351-355)."""
        u0 = self.vis_size_w / 2.0
        return (self.vis_size_w - 0.5 - u0) / self.focal * self.max_depth


def _crop_bounds(mask_any: jax.Array) -> tuple[jax.Array, jax.Array]:
    """First/last True index of a 1-D boolean mask (all-zero -> (0, -1))."""
    n = mask_any.shape[0]
    idx = jnp.arange(n)
    first = jnp.min(jnp.where(mask_any, idx, n))
    last = jnp.max(jnp.where(mask_any, idx, -1))
    return first, last


def pixel_bins(depth: jax.Array, params: TopDownParams = TopDownParams()):
    """Per-candidate-point output bins: (pix_r, pix_c, keep), each [band, W].

    The candidate set is bounded statically by the <=2*rows_around_center
    selection band, extracted with a dynamic_slice whose validity masking
    preserves the reference's exact data-dependent crop semantics.
    """
    h, w = params.vis_size_h, params.vis_size_w
    assert depth.shape == (h, w), f"expected {(h, w)}, got {depth.shape}"
    depth = depth.astype(jnp.float32)

    row_has = jnp.sum(depth, axis=1) > 0
    col_has = jnp.sum(depth, axis=0) > 0
    min_row, max_row = _crop_bounds(row_has)
    min_col, max_col = _crop_bounds(col_has)
    nonempty = jnp.any(row_has)

    blurred = gaussian_blur_3x3(depth)

    crop_h = max_row - min_row + 1
    if params.flag_center_crop:
        # rows around ceil(crop_h / 2) (geometry_utils.py:384-392)
        center = (crop_h + 1) // 2
        sel_lo = jnp.maximum(0, center - params.rows_around_center)
        sel_hi = jnp.minimum(crop_h, center + params.rows_around_center)
    else:
        sel_lo = jnp.zeros((), jnp.int32)
        sel_hi = jnp.minimum(2 * params.rows_around_center, crop_h)

    # static-size row band guaranteed to cover [min_row+sel_lo, min_row+sel_hi)
    band = min(2 * params.rows_around_center, h)
    start = jnp.clip(min_row + sel_lo, 0, h - band)
    band_depth = jax.lax.dynamic_slice(blurred, (start, 0), (band, w))

    band_rows = start + jnp.arange(band)[:, None]  # original row ids [band, 1]
    cols = jnp.arange(w)[None, :]
    crop_row = band_rows - min_row
    valid = (
        (crop_row >= sel_lo)
        & (crop_row < sel_hi)
        & (cols >= min_col)
        & (cols <= max_col)
        & nonempty
    )

    # Unproject: only x (right) and true depth (forward) matter for binning
    # (coords_3d[:2] after the [0, 2, 1] reorder, geometry_utils.py:425, 324).
    true_depth = band_depth * (params.max_depth - params.min_depth) + params.min_depth
    u0 = params.vis_size_w / 2.0
    x = (cols.astype(jnp.float32) + 0.5 - u0) / params.focal * true_depth

    # NDC + pixelization (geometry_utils.py:438-463).
    min_x = -params.x_bound
    x_range = 2.0 * params.x_bound
    ndc_x = (x - min_x) / (x_range * (1.0 + _EPSILON))
    ndc_d = (true_depth - params.min_depth) / (
        (params.max_depth - params.min_depth) * (1.0 + _EPSILON)
    )
    pix_r = (h - jnp.ceil(h * ndc_d)).astype(jnp.int32)
    pix_c = jnp.floor(w * ndc_x).astype(jnp.int32)
    keep = valid & (pix_r >= 0) & (pix_r < h) & (pix_c >= 0) & (pix_c < w)
    return pix_r, pix_c, keep


@functools.partial(jax.jit, static_argnames=("params", "impl"))
def top_down_counts(
    depth: jax.Array,
    params: TopDownParams = TopDownParams(),
    impl: str = "matmul",
) -> jax.Array:
    """Raw per-cell point counts [H, W] before normalization.

    TPU formulation: instead of a scatter-add (slow to compile and to run on
    TPU), binning is two one-hot comparisons and ONE contraction on the MXU:
    ``count[r, c] = sum_p onehot_r[p, r] * onehot_c[p, c]``.  0/1 values are
    exact in bf16 and integer sums < 2^24 are exact in the f32 accumulator,
    so counts are bit-exact.

    impl: "matmul" builds the one-hots in HBM and issues one dot;
    "pallas" streams point chunks through VMEM so the one-hots never touch
    HBM (ops/topdown_pallas.py); "pallas_interpret" for CPU testing.
    """
    h, w = params.vis_size_h, params.vis_size_w
    pix_r, pix_c, keep = pixel_bins(depth, params)

    if impl.startswith("pallas"):
        from pointnav_vo_tpu.ops.topdown_pallas import bin_counts_pallas

        return bin_counts_pallas(
            pix_r[None], pix_c[None], keep[None], h, w,
            interpret=(impl == "pallas_interpret"),
        )[0]

    band = pix_r.shape[0]
    p = band * w
    oh_r = (
        (pix_r.reshape(p, 1) == jnp.arange(h)[None, :]) & keep.reshape(p, 1)
    ).astype(jnp.bfloat16)
    oh_c = (pix_c.reshape(p, 1) == jnp.arange(w)[None, :]).astype(jnp.bfloat16)
    counts = jax.lax.dot_general(
        oh_r, oh_c,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return counts


def default_impl() -> str:
    """Pick the binning implementation for the current backend at trace time.

    Overridable via POINTNAV_TOPDOWN_IMPL (matmul | pallas | pallas_interpret).
    Standalone, the pallas kernel beats the matmul formulation (~10.3k vs
    ~8.3k img/s on v5e); inside the big fused eval program the difference is
    within noise, so either is a fine default on TPU.
    """
    import os

    forced = os.environ.get("POINTNAV_TOPDOWN_IMPL")
    if forced:
        return forced
    return "pallas" if jax.default_backend() == "tpu" else "matmul"


@functools.partial(jax.jit, static_argnames=("params", "impl"))
def top_down_view(depth: jax.Array, params: TopDownParams = TopDownParams(),
                  impl: str = "matmul") -> jax.Array:
    """Project one normalized depth map [H, W] to a top-down view [H, W].

    Returns float32 in [0, 1].  Use :func:`top_down_view_batch` for batches.
    """
    counts = top_down_counts(depth, params, impl)
    bound = jnp.max(counts)
    return jnp.where(bound > 0, jnp.minimum(counts / jnp.maximum(bound, 1.0), 1.0), 0.0)


@functools.partial(jax.jit, static_argnames=("params", "impl"))
def top_down_view_batch(depth: jax.Array, params: TopDownParams = TopDownParams(),
                        impl: str | None = None) -> jax.Array:
    """Batched projection: [..., H, W] -> [..., H, W]."""
    impl = impl or default_impl()
    batch_shape = depth.shape[:-2]
    flat = depth.reshape((-1,) + depth.shape[-2:])
    if impl.startswith("pallas"):
        from pointnav_vo_tpu.ops.topdown_pallas import bin_counts_pallas

        pix_r, pix_c, keep = jax.vmap(lambda d: pixel_bins(d, params))(flat)
        counts = bin_counts_pallas(
            pix_r, pix_c, keep, params.vis_size_h, params.vis_size_w,
            interpret=(impl == "pallas_interpret"),
        )
        bound = jnp.max(counts, axis=(-2, -1), keepdims=True)
        out = jnp.where(
            bound > 0, jnp.minimum(counts / jnp.maximum(bound, 1.0), 1.0), 0.0
        )
    else:
        out = jax.vmap(lambda d: top_down_view(d, params, impl))(flat)
    return out.reshape(batch_shape + depth.shape[-2:])
