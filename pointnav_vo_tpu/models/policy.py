"""Navigation actor-critic policies (flax.linen, NHWC).

Rebuild of the reference's policy stack:

- :class:`PointNavActorCritic` — the deployed ``resnet_rnn_policy``
  (``rl/policies/resnet_policy.py:25-282``): depth-only GroupNorm-ResNet18
  encoder with an avg-pool-2 pre-downsample, goal encoded as
  ``[rho, cos(-phi), sin(-phi)] -> Dense(32)``, 32-d prev-action embedding
  with the +1 shift and done-masking, 2-layer LSTM (hidden 512), categorical
  action head (orthogonal gain 0.01) and a linear critic
  (``rl/policies/policy.py:14-94``).
- :class:`PointNavBaselineActorCritic` — the SimpleCNN+GRU baseline
  (``rl/ppo/policy.py:82-163``, ``model_utils/visual_encoders/simple_cnn.py``).

Both handle single-step ([N, ...]) and sequence ([T, N, ...]) inputs in one
``__call__`` (the sequence path drives the scan-based RNN for the PPO update).
Action sampling/entropy live in pure functions below so the module stays
deterministic; sampling rng is explicit.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from pointnav_vo_tpu.models import resnet as resnet_lib
from pointnav_vo_tpu.models.rnn import RNNStateEncoder
from pointnav_vo_tpu.models.running_mean_var import RunningMeanAndVar

GOAL_POLAR_DIM = 2
PREV_ACTION_EMBED_DIM = 32
GOAL_EMBED_DIM = 32


def _flatten_chw(x: jax.Array) -> jax.Array:
    return x.transpose(0, 3, 1, 2).reshape(x.shape[0], -1)


class PolicyResNetEncoder(nn.Module):
    """Visual trunk: avg-pool/2 -> (whitening) -> backbone -> compression.

    Mirror of resnet_policy.py:61-174 with NHWC layout.
    """

    vis_types: Tuple[str, ...] = ("depth",)
    image_size: Tuple[int, int] = (192, 341)  # (H, W) of the raw observation
    baseplanes: int = 32
    backbone: str = "resnet18"
    normalize_visual_inputs: bool = False
    after_compression_flat_size: int = 2048
    update_stats_axis: Any = None
    dtype: Any = jnp.float32

    @property
    def input_channels(self) -> int:
        return (3 if "rgb" in self.vis_types else 0) + (
            1 if "depth" in self.vis_types else 0
        )

    @property
    def output_shape(self) -> Tuple[int, int, int]:
        # spatial size is halved by the avg-pool before the 1/32 backbone
        # (resnet_policy.py:84-92, 168)
        h, w = self.image_size
        fh = math.ceil((h // 2) / 32)
        fw = math.ceil((w // 2) / 32)
        ch = int(round(self.after_compression_flat_size / (fw * fh)))
        return (ch, fh, fw)

    @nn.compact
    def __call__(self, observations: Dict[str, jax.Array], update_stats: bool = False):
        parts = []
        if "rgb" in self.vis_types:
            parts.append(observations["rgb"].astype(self.dtype) / 255.0)
        if "depth" in self.vis_types:
            parts.append(observations["depth"].astype(self.dtype))
        x = jnp.concatenate(parts, axis=-1)
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        if self.normalize_visual_inputs:
            x = RunningMeanAndVar(
                self.input_channels, axis_name=self.update_stats_axis,
                dtype=self.dtype, name="rmv",
            )(x, update_stats=update_stats)
        backbone = resnet_lib.BACKBONES[self.backbone](
            base_planes=self.baseplanes, ngroups=self.baseplanes // 2, dtype=self.dtype
        )
        x = backbone.copy(name="backbone")(x)
        ch = self.output_shape[0]
        x = nn.Conv(ch, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                    name="compression_conv")(x)
        x = nn.GroupNorm(num_groups=1, dtype=self.dtype, name="compression_gn")(x)
        return nn.relu(x)


class SimpleCNNEncoder(nn.Module):
    """3-conv baseline encoder (simple_cnn.py:10-160), valid padding."""

    vis_types: Tuple[str, ...] = ("rgb", "depth")
    output_size: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, observations: Dict[str, jax.Array]):
        parts = []
        if "rgb" in self.vis_types and "rgb" in observations:
            parts.append(observations["rgb"].astype(self.dtype) / 255.0)
        if "depth" in self.vis_types and "depth" in observations:
            parts.append(observations["depth"].astype(self.dtype))
        x = jnp.concatenate(parts, axis=-1)
        x = nn.Conv(32, (8, 8), strides=(4, 4), padding="VALID", dtype=self.dtype,
                    name="conv1")(x)
        x = nn.relu(x)
        x = nn.Conv(64, (4, 4), strides=(2, 2), padding="VALID", dtype=self.dtype,
                    name="conv2")(x)
        x = nn.relu(x)
        x = nn.Conv(32, (3, 3), strides=(1, 1), padding="VALID", dtype=self.dtype,
                    name="conv3")(x)
        x = _flatten_chw(x)
        x = nn.Dense(self.output_size, dtype=self.dtype, name="fc")(x)
        return nn.relu(x)


def _maybe_flatten_time(tree):
    """[T, N, ...] -> ([T*N, ...], (T, N)) for the visual trunk."""

    def flat(x):
        return x.reshape((-1,) + x.shape[2:])

    return jax.tree.map(flat, tree)


class PointNavActorCritic(nn.Module):
    """The deployed resnet_rnn_policy as one functional module.

    Returns (logits [B, n_actions], value [B, 1], hidden') where B = N for
    single-step inputs and T*N for sequences.
    """

    n_actions: int = 4
    vis_types: Tuple[str, ...] = ("depth",)
    image_size: Tuple[int, int] = (192, 341)
    hidden_size: int = 512
    num_recurrent_layers: int = 2
    rnn_type: str = "LSTM"
    backbone: str = "resnet18"
    baseplanes: int = 32
    normalize_visual_inputs: bool = False
    update_stats_axis: Any = None
    dtype: Any = jnp.float32

    @property
    def num_packed_hidden(self) -> int:
        return self.num_recurrent_layers * (2 if self.rnn_type == "LSTM" else 1)

    def initial_hidden(self, num_envs: int) -> jax.Array:
        return jnp.zeros((self.num_packed_hidden, num_envs, self.hidden_size))

    @nn.compact
    def __call__(
        self,
        observations: Dict[str, jax.Array],
        hidden: jax.Array,
        prev_actions: jax.Array,
        masks: jax.Array,
        update_stats: bool = False,
    ):
        seq = prev_actions.ndim == 3  # [T, N, 1]
        if seq:
            t, n = prev_actions.shape[:2]
            flat_obs = _maybe_flatten_time(observations)
            flat_prev = prev_actions.reshape(t * n, 1)
            flat_masks = masks.reshape(t * n, 1)
        else:
            flat_obs, flat_prev, flat_masks = observations, prev_actions, masks

        feats = []
        if "visual_features" in flat_obs:
            vis = flat_obs["visual_features"]
        else:
            vis = PolicyResNetEncoder(
                vis_types=self.vis_types,
                image_size=self.image_size,
                baseplanes=self.baseplanes,
                backbone=self.backbone,
                normalize_visual_inputs=self.normalize_visual_inputs,
                update_stats_axis=self.update_stats_axis,
                dtype=self.dtype,
                name="visual_encoder",
            )(flat_obs, update_stats=update_stats)
            vis = _flatten_chw(vis)
        vis = nn.Dense(self.hidden_size, dtype=self.dtype, name="visual_fc")(vis)
        feats.append(nn.relu(vis))

        goal = flat_obs["pointgoal_with_gps_compass"].astype(self.dtype)
        goal3 = jnp.stack(
            [goal[:, 0], jnp.cos(-goal[:, 1]), jnp.sin(-goal[:, 1])], axis=-1
        )
        feats.append(nn.Dense(GOAL_EMBED_DIM, dtype=self.dtype, name="tgt_embeding")(goal3))

        # +1 shift so action "none" (episode start, masked to 0) has its own row
        # (resnet_policy.py:198, 274-276)
        prev_idx = ((flat_prev.astype(jnp.float32) + 1.0) * flat_masks).astype(jnp.int32)
        feats.append(
            nn.Embed(self.n_actions + 1, PREV_ACTION_EMBED_DIM, dtype=self.dtype,
                     name="prev_action_embedding")(prev_idx[:, 0])
        )

        x = jnp.concatenate(feats, axis=-1)
        rnn = RNNStateEncoder(
            input_size=self.hidden_size + GOAL_EMBED_DIM + PREV_ACTION_EMBED_DIM,
            hidden_size=self.hidden_size,
            num_layers=self.num_recurrent_layers,
            rnn_type=self.rnn_type,
            dtype=self.dtype,
            name="state_encoder",
        )
        if seq:
            x = x.reshape(t, n, -1)
            m = flat_masks.reshape(t, n, 1)
            x, hidden = rnn(x, hidden, m)
            x = x.reshape(t * n, -1)
        else:
            x, hidden = rnn(x, hidden, flat_masks)

        logits = nn.Dense(
            self.n_actions, dtype=self.dtype, name="action_head",
            kernel_init=nn.initializers.orthogonal(scale=0.01),
            bias_init=nn.initializers.zeros,
        )(x)
        value = nn.Dense(
            1, dtype=self.dtype, name="critic",
            kernel_init=nn.initializers.orthogonal(),
            bias_init=nn.initializers.zeros,
        )(x)
        return logits.astype(jnp.float32), value.astype(jnp.float32), hidden


class PointNavBaselineActorCritic(nn.Module):
    """SimpleCNN + GRU baseline policy (rl/ppo/policy.py:82-163)."""

    n_actions: int = 4
    vis_types: Tuple[str, ...] = ("rgb", "depth")
    hidden_size: int = 512
    n_input_goal: int = GOAL_POLAR_DIM
    dtype: Any = jnp.float32

    @property
    def num_packed_hidden(self) -> int:
        return 1

    def initial_hidden(self, num_envs: int) -> jax.Array:
        return jnp.zeros((1, num_envs, self.hidden_size))

    @nn.compact
    def __call__(self, observations, hidden, prev_actions, masks, update_stats=False):
        seq = prev_actions.ndim == 3
        if seq:
            t, n = prev_actions.shape[:2]
            flat_obs = _maybe_flatten_time(observations)
            flat_masks = masks.reshape(t * n, 1)
        else:
            flat_obs, flat_masks = observations, masks

        vis = SimpleCNNEncoder(
            vis_types=self.vis_types, output_size=self.hidden_size,
            dtype=self.dtype, name="visual_encoder",
        )(flat_obs)
        goal = flat_obs["pointgoal_with_gps_compass"].astype(self.dtype)
        x = jnp.concatenate([vis, goal], axis=-1)

        rnn = RNNStateEncoder(
            input_size=self.hidden_size + self.n_input_goal,
            hidden_size=self.hidden_size,
            num_layers=1,
            rnn_type="GRU",
            dtype=self.dtype,
            name="state_encoder",
        )
        if seq:
            x = x.reshape(t, n, -1)
            m = flat_masks.reshape(t, n, 1)
            x, hidden = rnn(x, hidden, m)
            x = x.reshape(t * n, -1)
        else:
            x, hidden = rnn(x, hidden, flat_masks)

        logits = nn.Dense(
            self.n_actions, dtype=self.dtype, name="action_head",
            kernel_init=nn.initializers.orthogonal(scale=0.01),
            bias_init=nn.initializers.zeros,
        )(x)
        value = nn.Dense(
            1, dtype=self.dtype, name="critic",
            kernel_init=nn.initializers.orthogonal(),
            bias_init=nn.initializers.zeros,
        )(x)
        return logits.astype(jnp.float32), value.astype(jnp.float32), hidden


# ---------------------------------------------------------------------------
# Pure categorical-distribution helpers (CustomFixedCategorical,
# misc_utils.py:50-78, re-expressed functionally)
# ---------------------------------------------------------------------------


def sample_action(rng: jax.Array, logits: jax.Array) -> jax.Array:
    return jax.random.categorical(rng, logits, axis=-1)[:, None]


def mode_action(logits: jax.Array) -> jax.Array:
    return jnp.argmax(logits, axis=-1)[:, None]


def action_log_prob(logits: jax.Array, actions: jax.Array) -> jax.Array:
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.take_along_axis(logp, actions.astype(jnp.int32), axis=-1)


def entropy(logits: jax.Array) -> jax.Array:
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.sum(jnp.exp(logp) * logp, axis=-1)
