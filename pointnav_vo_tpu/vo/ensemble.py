"""Action-conditioned VO ensemble — stacked experts, fused preprocessing.

This is the TPU-native replacement for the reference's public VO API
``BaseRLTrainerWithVO._compute_local_delta_states_from_vo``
(``rl/common/base_trainer_with_vo.py:169-314``).  Design changes vs the
reference (SURVEY.md §7):

- The per-action ``nn.Module`` dict (one model per action, indexed in a
  Python loop, batch size 1 per env) becomes **one set of stacked parameters
  with a leading expert axis** [A=3, ...].  A mixed-action batch of N envs is
  evaluated by vmapping the model over the expert axis and gathering each
  sample's row by its action — one XLA call, everything batched.
- Depth discretization, the top-down projection, the optional resize
  transform, and the CNN forward fuse into a single jitted function
  (:func:`preprocess_obs_pairs` + :meth:`VOEnsemble.predict`); the reference
  runs these per env in Python with cv2 on the CPU (its #1 eval bottleneck,
  SURVEY.md §3.3).
- The "rnd" uncertainty mode (``rnd_mode_n`` sequential dropout passes,
  base_trainer_with_vo.py:295-308) becomes a vmap over dropout rng keys —
  K passes in one program.  NOTE: the reference's ``.train()`` call also lets
  the RunningMeanAndVar buffers drift during eval (a side effect of torch
  module modes); we keep the whitening statistics frozen, which is the
  intended semantics.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from pointnav_vo_tpu.common import VO_EXPERT_ACTIONS
from pointnav_vo_tpu.models.vo_cnn import make_vo_model
from pointnav_vo_tpu.ops.depth import discretize_depth
from pointnav_vo_tpu.ops.topdown import TopDownParams, top_down_view_batch
from pointnav_vo_tpu.ops.transforms import apply_obs_transform


@dataclasses.dataclass(frozen=True)
class VOInferenceConfig:
    """Static configuration of the VO inference path (mirrors the
    VO.REGRESS_MODEL + sensor nodes of configs/rl/ddppo_pointnav.yaml:94-129)."""

    model_name: str = "vo_cnn_rgb_d_dd_top_down"
    observation_space: Tuple[str, ...] = ("rgb", "depth", "discretized_depth", "top_down_view")
    vis_size_w: int = 341
    vis_size_h: int = 192
    hidden_size: int = 512
    backbone: str = "resnet18"
    discretized_depth_channels: int = 10
    dropout_p: float = 0.2
    obs_transform: str = "none"
    min_depth: float = 0.1
    max_depth: float = 10.0
    hfov: float = 70.0  # consumed as "radians" — the reference's quirk
    mode: str = "det"  # "det" | "rnd"
    rnd_mode_n: int = 10
    dtype: Any = jnp.float32

    @property
    def topdown_params(self) -> TopDownParams:
        return TopDownParams(
            min_depth=self.min_depth,
            max_depth=self.max_depth,
            vis_size_h=self.vis_size_h,
            vis_size_w=self.vis_size_w,
            hfov_rad=self.hfov,
        )

    def make_model(self):
        return make_vo_model(
            self.model_name,
            observation_space=self.observation_space,
            observation_size=(self.vis_size_w, self.vis_size_h),
            hidden_size=self.hidden_size,
            backbone=self.backbone,
            normalize_visual_inputs=True,  # always on (base_trainer_with_vo.py:76)
            dropout_p=self.dropout_p,
            discretized_depth_channels=self.discretized_depth_channels,
            dtype=self.dtype,
        )


@functools.partial(jax.jit, static_argnames=("cfg",))
def preprocess_obs_pairs(
    prev_rgb: jax.Array,
    prev_depth: jax.Array,
    cur_rgb: jax.Array,
    cur_depth: jax.Array,
    cfg: VOInferenceConfig,
) -> Dict[str, jax.Array]:
    """Batched observation-pair assembly (base_trainer_with_vo.py:169-269).

    Inputs: rgb [B, H, W, 3] (0..255 float), depth [B, H, W, 1] (normalized).
    Output dict has the pair channels the VO models expect:
    rgb [B,H,W,6], depth [B,H,W,2], discretized_depth [B,H,W,2*dd],
    top_down_view [B,H,W,2].
    """
    rgb_pair = jnp.concatenate([prev_rgb, cur_rgb], axis=-1).astype(jnp.float32)
    depth_pair = jnp.concatenate([prev_depth, cur_depth], axis=-1).astype(jnp.float32)

    if cfg.obs_transform != "none":
        stacked = jnp.concatenate([rgb_pair, depth_pair], axis=-1)
        stacked = apply_obs_transform(stacked, cfg.obs_transform,
                                      (cfg.vis_size_w, cfg.vis_size_h))
        rgb_pair, depth_pair = stacked[..., :6], stacked[..., 6:]

    obs: Dict[str, jax.Array] = {}
    if "rgb" in cfg.observation_space:
        obs["rgb"] = rgb_pair
    if "depth" in cfg.observation_space:
        obs["depth"] = depth_pair
    if "discretized_depth" in cfg.observation_space:
        dd_prev = discretize_depth(depth_pair[..., 0], cfg.discretized_depth_channels)
        dd_cur = discretize_depth(depth_pair[..., 1], cfg.discretized_depth_channels)
        obs["discretized_depth"] = jnp.concatenate([dd_prev, dd_cur], axis=-1)
    if "top_down_view" in cfg.observation_space:
        td_prev = top_down_view_batch(depth_pair[..., 0], cfg.topdown_params)
        td_cur = top_down_view_batch(depth_pair[..., 1], cfg.topdown_params)
        obs["top_down_view"] = jnp.stack([td_prev, td_cur], axis=-1)
    return obs


def stack_expert_variables(variables_by_action: Sequence[Dict]) -> Dict:
    """Stack per-action model variables along a new leading expert axis.

    Order must follow :data:`common.VO_EXPERT_ACTIONS` = (forward, left, right).
    """
    assert len(variables_by_action) == len(VO_EXPERT_ACTIONS)
    return jax.tree.map(lambda *xs: jnp.stack(xs), *variables_by_action)


class VOEnsemble:
    """Stacked per-action VO experts with a single jitted predict path."""

    def __init__(self, cfg: VOInferenceConfig, stacked_variables: Dict):
        self.cfg = cfg
        self.model = cfg.make_model()
        self.variables = stacked_variables

    @classmethod
    def from_torch_checkpoints(cls, cfg: VOInferenceConfig, ckpt_paths: Dict[str, str]):
        """Load {"forward": path, "left": path, "right": path} .pth files
        (config layout of ddppo_pointnav.yaml:123-129)."""
        from pointnav_vo_tpu.common import ACT_NAME2IDX
        from pointnav_vo_tpu.io.torch_import import load_vo_checkpoint

        per_action = [
            load_vo_checkpoint(ckpt_paths[name], act_idx=ACT_NAME2IDX[name])
            for name in ("forward", "left", "right")
        ]
        return cls(cfg, stack_expert_variables(per_action))

    def predict(
        self,
        obs_pairs: Dict[str, jax.Array],
        actions: jax.Array,
        rng: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        """(delta [B, 3], std [B, 3]) for a mixed-action batch.

        actions: [B] habitat action ids (1=fwd, 2=left, 3=right).
        """
        return _predict(self.model, self.cfg, self.variables, obs_pairs, actions, rng)

    def compute_local_delta_states_from_vo(
        self, prev_rgb, prev_depth, cur_rgb, cur_depth, actions, rng=None
    ):
        """The reference's public API, batched over all envs and fully fused
        (preprocess + forward + uncertainty in one XLA program)."""
        obs = preprocess_obs_pairs(prev_rgb, prev_depth, cur_rgb, cur_depth, self.cfg)
        delta, std = self.predict(obs, actions, rng)
        extra = {"ego_top_down_view": obs.get("top_down_view")}
        return delta, std, extra


@functools.partial(jax.jit, static_argnames=("model", "cfg"))
def _predict(model, cfg, variables, obs_pairs, actions, rng):
    expert_idx = jnp.clip(actions.astype(jnp.int32) - 1, 0, len(VO_EXPERT_ACTIONS) - 1)

    if cfg.mode == "det":
        # all experts over the full batch in one vmapped call, then gather
        preds = jax.vmap(
            lambda v: model.apply(v, obs_pairs, train=False)
        )(variables)  # [A, B, 3]
        delta = jnp.take_along_axis(preds, expert_idx[None, :, None], axis=0)[0]
        return delta, jnp.zeros_like(delta)

    assert cfg.mode == "rnd", cfg.mode
    assert rng is not None, "rnd mode needs a dropout rng"
    keys = jax.random.split(rng, cfg.rnd_mode_n)

    def one_pass(key):
        preds = jax.vmap(
            lambda v: model.apply(v, obs_pairs, train=True, rngs={"dropout": key})
        )(variables)
        return jnp.take_along_axis(preds, expert_idx[None, :, None], axis=0)[0]

    samples = jax.vmap(one_pass)(keys)  # [K, B, 3]
    return jnp.mean(samples, axis=0), jnp.std(samples, axis=0)
