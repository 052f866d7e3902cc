"""Observation resize/crop transforms — exact area interpolation as matmuls.

Replaces the reference's obs transformers (``utils/misc_utils.py``:
``ResizeCenterCropper`` :81-121, ``Resizer`` :330-366, ``NearestResizer``
:420-427, ``image_resize_shortest_edge`` area-interp :241-288, ``center_crop``
:291-318).

TPU design note: torch's ``mode="area"`` interpolation is adaptive box
averaging.  For static shapes that is a *linear* map per axis, so we bake the
bin-average weights into two small matrices and evaluate the resize as two
matmuls (``R @ img @ C^T``) — exact numerics, and it rides the MXU instead of
a gather.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _area_weights(n_in: int, n_out: int) -> np.ndarray:
    """[n_out, n_in] adaptive box-average weights (torch area semantics:
    bin i = [floor(i*n_in/n_out), ceil((i+1)*n_in/n_out)))."""
    w = np.zeros((n_out, n_in), np.float32)
    for i in range(n_out):
        lo = (i * n_in) // n_out
        hi = -((-(i + 1) * n_in) // n_out)  # ceil
        w[i, lo:hi] = 1.0 / (hi - lo)
    return w


def resize_area(img: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """Area-resize [..., H, W, C] to [..., out_h, out_w, C]."""
    h, w = img.shape[-3], img.shape[-2]
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return img
    rw = jnp.asarray(_area_weights(h, oh))
    cw = jnp.asarray(_area_weights(w, ow))
    x = jnp.einsum("oh,...hwc->...owc", rw, img.astype(jnp.float32))
    x = jnp.einsum("pw,...owc->...opc", cw, x)
    return x.astype(img.dtype)


def resize_nearest(img: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """Nearest-neighbor resize (torch F.interpolate 'nearest' index rule)."""
    h, w = img.shape[-3], img.shape[-2]
    oh, ow = out_hw
    ri = (np.arange(oh) * h // oh).astype(np.int32)
    ci = (np.arange(ow) * w // ow).astype(np.int32)
    return img[..., ri, :, :][..., :, ci, :]


def center_crop(img: jax.Array, size_wh: Tuple[int, int]) -> jax.Array:
    """Center crop [..., H, W, C] to (crop_w, crop_h) — reference arg order."""
    cropx, cropy = size_wh
    h, w = img.shape[-3], img.shape[-2]
    startx = w // 2 - cropx // 2
    starty = h // 2 - cropy // 2
    return img[..., starty : starty + cropy, startx : startx + cropx, :]


def _shortest_edge_hw(h: int, w: int, size: int) -> Tuple[int, int]:
    scale = size / min(h, w)
    return int(h * scale), int(w * scale)


def resize_shortest_edge(img: jax.Array, size: int) -> jax.Array:
    h, w = img.shape[-3], img.shape[-2]
    return resize_area(img, _shortest_edge_hw(h, w, size))


def apply_obs_transform(img: jax.Array, kind: str, size_wh: Tuple[int, int]) -> jax.Array:
    """Dispatch matching VO.OBS_TRANSFORM / RL.OBS_TRANSFORM config values."""
    if kind in (None, "none"):
        return img
    if kind == "resize":
        return resize_shortest_edge(img, min(size_wh))
    if kind == "resize_crop":
        return center_crop(resize_shortest_edge(img, max(size_wh)), size_wh)
    if kind == "resize_nearest":
        h, w = img.shape[-3], img.shape[-2]
        return resize_nearest(img, _shortest_edge_hw(h, w, min(size_wh)))
    raise ValueError(f"unknown obs transform {kind!r}")
