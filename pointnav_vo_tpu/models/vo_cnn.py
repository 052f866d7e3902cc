"""Visual-odometry CNN family (flax.linen, NHWC) + model registry.

Functional rebuild of the reference VO models
(``pointnav_vo/vo/models/vo_cnn.py:16-561`` and ``vo_cnn_act_embed.py:17-112``):
a GroupNorm-ResNet encoder over channel-concatenated observation *pairs*, a
3x3 "compression" conv head to ~2048 flat features, a dropout+linear trunk to
``hidden_size``, and a dropout+linear SE(2)-delta regression head.

Parity-critical details preserved:
- channel interleave order ``[prev_rgb, prev_depth, prev_dd, prev_top_down,
  cur_rgb, cur_depth, cur_dd, cur_top_down]`` (reference vo_cnn.py:169-174);
- RGB divided by 255 inside the forward (vo_cnn.py:118);
- flatten in torch CHW order (we transpose NHWC->NCHW before reshaping) so
  imported ``.pth`` fc weights apply verbatim;
- compression channels = round(2048 / (ceil(H/32) * ceil(W/32)))
  (vo_cnn.py:76-101).

All ten registered reference variants are constructible through
:func:`make_vo_model`; dropout ensembling for the "rnd" uncertainty mode is
driven from outside via rng keys (see ``vo/ensemble.py``).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from pointnav_vo_tpu.models import resnet as resnet_lib
from pointnav_vo_tpu.models.running_mean_var import RunningMeanAndVar

# Per-pair channel counts (reference vo/common/common_vars.py:52-56).
RGB_PAIR_CHANNEL = 6
DEPTH_PAIR_CHANNEL = 2
TOP_DOWN_VIEW_PAIR_CHANNEL = 2
EMBED_DIM = 32
N_ACTS = 4
DELTA_DIM = 3  # [dx, dz, dyaw]


def _pair_split(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    c = x.shape[-1] // 2
    return x[..., :c], x[..., c:]


class VOEncoder(nn.Module):
    """Observation-pair encoder: whitening -> backbone -> compression conv."""

    observation_space: Tuple[str, ...]
    observation_size: Tuple[int, int]  # (W, H), matching the reference ctor
    baseplanes: int = 32
    backbone: str = "resnet18"
    normalize_visual_inputs: bool = True
    after_compression_flat_size: int = 2048
    discretized_depth_channels: int = 0
    update_stats_axis: Any = None
    dtype: Any = jnp.float32

    @property
    def input_channels(self) -> int:
        c = 0
        if "rgb" in self.observation_space:
            c += RGB_PAIR_CHANNEL
        if "depth" in self.observation_space:
            c += DEPTH_PAIR_CHANNEL
        if "discretized_depth" in self.observation_space:
            c += 2 * self.discretized_depth_channels
        if "top_down_view" in self.observation_space:
            c += TOP_DOWN_VIEW_PAIR_CHANNEL
        assert c > 0, "visual odometry must not be blind"
        return c

    @property
    def output_shape(self) -> Tuple[int, int, int]:
        """(C, H, W) of the compressed feature map, torch-ordered."""
        w, h = self.observation_size
        fw = math.ceil(w / 32)
        fh = math.ceil(h / 32)
        ch = int(round(self.after_compression_flat_size / (fw * fh)))
        return (ch, fh, fw)

    @nn.compact
    def __call__(self, obs_pairs, update_stats: bool = False,
                 stats_mask=None):
        if not isinstance(obs_pairs, dict):
            # packed stem input [B, H, W, input_channels]: already in stem
            # order (prev blocks then cur blocks, rgb pre-scaled 1/255 — see
            # ensemble.frame_features_packed).  Equal to the dict path to
            # 1 ulp; lets the det bucketed eval path ship one selected array
            # straight in, with no per-key dict assembly.
            x = obs_pairs.astype(self.dtype)
            assert x.shape[-1] == self.input_channels, (
                f"packed stem input has {x.shape[-1]} channels, "
                f"expected {self.input_channels}")
            return self._head(x, update_stats, stats_mask)
        prev_parts, cur_parts = [], []
        if "rgb" in self.observation_space:
            p, c = _pair_split(obs_pairs["rgb"].astype(self.dtype) / 255.0)
            prev_parts.append(p)
            cur_parts.append(c)
        if "depth" in self.observation_space:
            p, c = _pair_split(obs_pairs["depth"].astype(self.dtype))
            prev_parts.append(p)
            cur_parts.append(c)
        if "discretized_depth" in self.observation_space:
            p, c = _pair_split(obs_pairs["discretized_depth"].astype(self.dtype))
            prev_parts.append(p)
            cur_parts.append(c)
        if "top_down_view" in self.observation_space:
            p, c = _pair_split(obs_pairs["top_down_view"].astype(self.dtype))
            prev_parts.append(p)
            cur_parts.append(c)
        x = jnp.concatenate(prev_parts + cur_parts, axis=-1)
        return self._head(x, update_stats, stats_mask)

    def _head(self, x: jax.Array, update_stats: bool, stats_mask):
        if self.normalize_visual_inputs:
            x = RunningMeanAndVar(
                self.input_channels, axis_name=self.update_stats_axis,
                dtype=self.dtype, name="rmv",
            )(x, update_stats=update_stats, stats_mask=stats_mask)

        backbone = resnet_lib.BACKBONES[self.backbone](
            base_planes=self.baseplanes, ngroups=self.baseplanes // 2, dtype=self.dtype
        )
        x = backbone.copy(name="backbone")(x)

        ch = self.output_shape[0]
        x = nn.Conv(ch, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                    name="compression_conv")(x)
        x = nn.GroupNorm(num_groups=1, dtype=self.dtype, name="compression_gn")(x)
        return nn.relu(x)


def _flatten_chw(x: jax.Array) -> jax.Array:
    """NHWC -> flat in torch CHW order (checkpoint-compatible)."""
    return x.transpose(0, 3, 1, 2).reshape(x.shape[0], -1)


class VOCNN(nn.Module):
    """Encoder + dropout/linear trunk + delta-pose head (vo_cnn.py:182-233)."""

    observation_space: Tuple[str, ...]
    observation_size: Tuple[int, int]
    hidden_size: int = 512
    baseplanes: int = 32
    backbone: str = "resnet18"
    normalize_visual_inputs: bool = True
    output_dim: int = DELTA_DIM
    dropout_p: float = 0.2
    after_compression_flat_size: int = 2048
    discretized_depth_channels: int = 0
    update_stats_axis: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obs_pairs, train: bool = False, update_stats: bool = False,
                 stats_mask=None):
        x = VOEncoder(
            observation_space=self.observation_space,
            observation_size=self.observation_size,
            baseplanes=self.baseplanes,
            backbone=self.backbone,
            normalize_visual_inputs=self.normalize_visual_inputs,
            after_compression_flat_size=self.after_compression_flat_size,
            discretized_depth_channels=self.discretized_depth_channels,
            update_stats_axis=self.update_stats_axis,
            dtype=self.dtype,
            name="visual_encoder",
        )(obs_pairs, update_stats=update_stats, stats_mask=stats_mask)
        x = _flatten_chw(x)
        x = nn.Dropout(self.dropout_p, deterministic=not train)(x)
        x = nn.Dense(self.hidden_size, dtype=self.dtype, name="visual_fc")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_p, deterministic=not train)(x)
        x = nn.Dense(
            self.output_dim, dtype=self.dtype, name="output_head",
            kernel_init=nn.initializers.orthogonal(),
            bias_init=nn.initializers.zeros,
        )(x)
        return x.astype(jnp.float32)


class VOCNNActEmbed(nn.Module):
    """Unified model with a 32-d action embedding (vo_cnn_act_embed.py:17-76)."""

    observation_space: Tuple[str, ...]
    observation_size: Tuple[int, int]
    hidden_size: int = 512
    baseplanes: int = 32
    backbone: str = "resnet18"
    normalize_visual_inputs: bool = True
    output_dim: int = DELTA_DIM
    dropout_p: float = 0.2
    after_compression_flat_size: int = 2048
    discretized_depth_channels: int = 0
    n_acts: int = N_ACTS
    update_stats_axis: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obs_pairs, actions, train: bool = False, update_stats: bool = False,
                 stats_mask=None):
        act_embed = nn.Embed(self.n_acts + 1, EMBED_DIM, dtype=self.dtype,
                             name="action_embedding")(actions)
        x = VOEncoder(
            observation_space=self.observation_space,
            observation_size=self.observation_size,
            baseplanes=self.baseplanes,
            backbone=self.backbone,
            normalize_visual_inputs=self.normalize_visual_inputs,
            after_compression_flat_size=self.after_compression_flat_size,
            discretized_depth_channels=self.discretized_depth_channels,
            update_stats_axis=self.update_stats_axis,
            dtype=self.dtype,
            name="visual_encoder",
        )(obs_pairs, update_stats=update_stats, stats_mask=stats_mask)
        x = jnp.concatenate([_flatten_chw(x), act_embed], axis=-1)
        x = nn.Dropout(self.dropout_p, deterministic=not train)(x)
        x = nn.Dense(self.hidden_size, dtype=self.dtype, name="hidden_generator")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_p, deterministic=not train)(x)
        x = nn.Dense(
            self.output_dim, dtype=self.dtype, name="output_head",
            kernel_init=nn.initializers.orthogonal(),
            bias_init=nn.initializers.zeros,
        )(x)
        return x.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Model zoo — the ten reference-registered variants (vo_cnn.py:236-561,
# vo_cnn_act_embed.py:17-112) expressed as constructor specs.
# ---------------------------------------------------------------------------

_VARIANTS: Dict[str, dict] = {
    "vo_cnn": dict(requires=("rgb", "depth"), forbids=("discretized_depth", "top_down_view")),
    "vo_cnn_rgb": dict(requires=("rgb",), forbids=("depth", "discretized_depth", "top_down_view")),
    "vo_cnn_wider": dict(requires=("rgb", "depth"), forbids=("discretized_depth", "top_down_view"), baseplanes_mult=2),
    "vo_cnn_deeper": dict(requires=("rgb", "depth"), forbids=("discretized_depth", "top_down_view"), backbone="resnet101"),
    "vo_cnn_rgb_d_dd": dict(requires=("rgb", "depth", "discretized_depth"), forbids=("top_down_view",)),
    "vo_cnn_rgb_d_top_down": dict(requires=("rgb", "depth", "top_down_view"), forbids=("discretized_depth",)),
    "vo_cnn_rgb_dd_top_down": dict(requires=("rgb", "discretized_depth", "top_down_view"), forbids=("depth",)),
    "vo_cnn_d_dd_top_down": dict(requires=("depth", "discretized_depth", "top_down_view"), forbids=("rgb",)),
    "vo_cnn_rgb_d_dd_top_down": dict(requires=("rgb", "depth", "discretized_depth", "top_down_view"), forbids=()),
    # legacy alias (vo_cnn.py:557-561)
    "vo_cnn_discretize_depth_top_down": dict(requires=("rgb", "depth", "discretized_depth", "top_down_view"), forbids=()),
    "vo_cnn_act_embed": dict(requires=("rgb", "depth"), forbids=("discretized_depth", "top_down_view"), act_embed=True),
    "vo_cnn_wider_act_embed": dict(requires=("rgb", "depth"), forbids=("discretized_depth", "top_down_view"), act_embed=True, baseplanes_mult=2),
}

VO_MODEL_NAMES = tuple(_VARIANTS)


def make_vo_model(
    name: str,
    *,
    observation_space: Sequence[str],
    observation_size: Tuple[int, int],
    hidden_size: int = 512,
    backbone: str = "resnet18",
    baseplanes: int = 32,
    normalize_visual_inputs: bool = True,
    output_dim: int = DELTA_DIM,
    dropout_p: float = 0.2,
    discretized_depth_channels: int = 10,
    update_stats_axis: Any = None,
    dtype: Any = jnp.float32,
):
    """Instantiate a registered VO model variant by reference name."""
    spec = _VARIANTS[name]
    obs = tuple(observation_space)
    for k in spec["requires"]:
        assert k in obs, f"{name} requires {k!r} in observation_space, got {obs}"
    for k in spec["forbids"]:
        assert k not in obs, f"{name} forbids {k!r} in observation_space, got {obs}"
    backbone = spec.get("backbone", backbone)
    baseplanes = baseplanes * spec.get("baseplanes_mult", 1)
    dd = discretized_depth_channels if "discretized_depth" in obs else 0
    cls = VOCNNActEmbed if spec.get("act_embed") else VOCNN
    return cls(
        observation_space=obs,
        observation_size=tuple(observation_size),
        hidden_size=hidden_size,
        baseplanes=baseplanes,
        backbone=backbone,
        normalize_visual_inputs=normalize_visual_inputs,
        output_dim=output_dim,
        dropout_p=dropout_p,
        discretized_depth_channels=dd,
        update_stats_axis=update_stats_axis,
        dtype=dtype,
    )
