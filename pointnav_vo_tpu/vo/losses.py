"""VO regression losses: per-delta weighted MSE + geometric-invariance terms.

Rebuild of the reference's loss layer:

- per-delta weighted MSE with abs/relative diagnostics
  (``vo/engine/vo_cnn_engine.py:135-198``);
- loss-weight computation (:200-228).  NOTE: the reference's non-fixed branch
  is buggy — it plugs ``dxs`` into all three exponents (:216-223) — and is
  never exercised (``loss_weight_fixed: True`` in configs/vo/vo_pointnav.yaml:41).
  We implement the *intended* semantics (each delta type against its own
  noise-free value) and keep the fixed branch bit-identical;
- the geometric-invariance inverse loss
  (``vo_cnn_regression_geo_invariance_engine.py:367-449``): for a
  (frame-pair, swapped-frame-pair) prediction pair, rotation must invert
  (``(dyaw_f + dyaw_b)^2``) and position must satisfy
  ``p_b = -R(dyaw_b) p_f`` in the left-handed top-down frame, with dz
  unconstrained for MOVE_FORWARD.

All functions take an optional ``valid`` mask so padded (static-shape) TPU
batches reduce exactly like the reference's unpadded batches.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from pointnav_vo_tpu.common import EPSILON, MOVE_FORWARD, NO_NOISE_DELTAS

DELTA_NAMES = ("dx", "dz", "dyaw")


def _masked_mean(x: jax.Array, mask: Optional[jax.Array], axis=None) -> jax.Array:
    if mask is None:
        return jnp.mean(x, axis=axis)
    num = jnp.sum(x * mask, axis=axis)
    den = jnp.maximum(jnp.sum(mask, axis=axis), 1.0)
    return num / den


def compute_loss_weights(
    actions: jax.Array,
    gt_deltas: jax.Array,
    multiplier: Dict[str, float],
    fixed: bool = True,
) -> jax.Array:
    """[B, 3] per-sample per-delta loss weights (vo_cnn_engine.py:200-228)."""
    mult = jnp.asarray([multiplier[k] for k in DELTA_NAMES], jnp.float32)
    if fixed:
        return jnp.broadcast_to(mult, gt_deltas.shape)
    table = jnp.asarray(
        [NO_NOISE_DELTAS.get(a, [0.0, 0.0, 0.0]) for a in range(4)], jnp.float32
    )
    no_noise = table[actions.astype(jnp.int32)]
    return jnp.exp(mult * jnp.abs(no_noise - gt_deltas))


def weighted_mse_with_diagnostics(
    pred: jax.Array,
    gt: jax.Array,
    weights: jax.Array,
    dz_regress_mask: Optional[jax.Array] = None,
    valid: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Per-delta weighted MSE (summed over dx/dz/dyaw) + diagnostics.

    pred, gt, weights: [B, 3]; dz_regress_mask, valid: [B] or None.
    Matches the reference's three separate ``_compute_loss`` calls
    (vo_cnn_engine.py:147-196) fused into one vectorized reduction.
    Diagnostics arrays are [3] in (dx, dz, dyaw) order.
    """
    diffs = (gt - pred) ** 2  # [B, 3]
    col_mask = jnp.ones_like(diffs)
    if dz_regress_mask is not None:
        col_mask = col_mask.at[:, 1].set(dz_regress_mask)
    if valid is not None:
        col_mask = col_mask * valid[:, None]

    # loss: reference takes a plain mean over the batch per delta type (dz
    # rows are zeroed by the mask but still counted — :174), so use
    # valid-row count as denominator, not the dz-mask count.
    denom = jnp.maximum(
        jnp.sum(valid[:, None] * jnp.ones_like(diffs), 0) if valid is not None
        else jnp.asarray(float(diffs.shape[0])),
        1.0,
    )
    dz_col = jnp.ones_like(diffs)
    if dz_regress_mask is not None:
        dz_col = dz_col.at[:, 1].set(dz_regress_mask)
    if valid is not None:
        dz_col = dz_col * valid[:, None]
    loss_per_delta = jnp.sum(diffs * weights * dz_col, axis=0) / denom
    loss = jnp.sum(loss_per_delta)

    # diagnostics use the dz-filtered rows (vo_cnn_engine.py:175-185)
    abs_diff = _masked_mean(jnp.sqrt(jax.lax.stop_gradient(diffs)), col_mask, axis=0)
    target_mag = _masked_mean(jnp.abs(gt), col_mask, axis=0) + EPSILON
    diagnostics = {
        "abs_diff": abs_diff,
        "target_magnitude": target_mag,
        "relative_diff": abs_diff / target_mag,
    }
    return loss, diagnostics


def geo_invariance_inverse_loss(
    pred_cur_rel_to_prev: jax.Array,
    pred_prev_rel_to_cur: jax.Array,
    actions: jax.Array,
    valid: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Inverse-consistency loss over prediction pairs.

    pred_*: [P, 3] predictions for a frame pair and its swapped version;
    actions: [P] original (cur_rel_to_prev) action ids.
    Returns (loss, abs_diff_rot [], abs_diff_pos [2]).

    Mirrors ``_compute_geo_invariance_inverse_loss`` (engine:367-449) with the
    alternating-layout bookkeeping replaced by explicit pairing.
    """
    fwd, bwd = pred_cur_rel_to_prev, pred_prev_rel_to_cur
    rot_diffs = (fwd[:, 2] + bwd[:, 2]) ** 2  # [P]
    loss_rot = _masked_mean(rot_diffs, valid)
    abs_rot = _masked_mean(jnp.sqrt(jax.lax.stop_gradient(rot_diffs)), valid)

    # left-handed 2D rotation by bwd yaw (habitat: -z forward — engine:399-417)
    cy = jnp.cos(bwd[:, 2])
    sy = jnp.sin(bwd[:, 2])
    rot = jnp.stack(
        [jnp.stack([cy, sy], -1), jnp.stack([-sy, cy], -1)], axis=-2
    )  # [P, 2, 2]
    pred_pos_bwd = jnp.einsum("pij,pj->pi", rot, fwd[:, :2])
    pos_diffs = (bwd[:, :2] + pred_pos_bwd) ** 2  # [P, 2]

    # dz unconstrained for MOVE_FORWARD (engine:429-441)
    fwd_mask = (actions.astype(jnp.int32) == MOVE_FORWARD)
    pos_diffs = pos_diffs * jnp.stack(
        [jnp.ones_like(cy), jnp.where(fwd_mask, 0.0, 1.0)], axis=-1
    )
    vmask2 = None if valid is None else valid[:, None] * jnp.ones_like(pos_diffs)
    loss_pos = _masked_mean(pos_diffs, vmask2)
    abs_pos = _masked_mean(
        jnp.sqrt(jax.lax.stop_gradient(pos_diffs)),
        None if valid is None else valid[:, None],
        axis=0,
    )

    return loss_rot + loss_pos, abs_rot, abs_pos
