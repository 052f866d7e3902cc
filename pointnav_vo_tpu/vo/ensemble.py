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
    # "native": the packed feature cache is stored in ``dtype``.
    # "int8": the cache is quantized to int8 (values are all in [0, 1]:
    # rgb/255, normalized depth, one-hot dd bins, normalized top-down
    # counts — scale 127), halving cache HBM traffic; the per-bucket
    # selection einsum runs s8 x s8 -> s32 and dequantizes into the stem.
    # Lossy (~1/127 quantization on depth/top-down); opt-in.
    cache_dtype: str = "native"

    @property
    def topdown_params(self) -> TopDownParams:
        return TopDownParams(
            min_depth=self.min_depth,
            max_depth=self.max_depth,
            vis_size_h=self.vis_size_h,
            vis_size_w=self.vis_size_w,
            hfov_rad=self.hfov,
        )

    def make_model(self, update_stats_axis=None):
        """``update_stats_axis``: mesh axis name for training under
        shard_map — RunningMeanAndVar whitening statistics psum across it
        (the reference all_reduces these stats under DDP); inference and
        single-chip training leave it None."""
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
            update_stats_axis=update_stats_axis,
        )


@functools.partial(jax.jit, static_argnames=("cfg",))
def frame_features(rgb: jax.Array, depth: jax.Array,
                   cfg: VOInferenceConfig) -> Dict[str, jax.Array]:
    """Per-FRAME observation channels: rgb [B,H,W,3], depth [B,H,W,1],
    discretized_depth [B,H,W,dd], top_down_view [B,H,W,1].

    Split out of the pair assembly so the eval loop preprocesses every frame
    exactly once: the current frame of step t is the previous frame of step
    t+1 and its (expensive) top-down projection + depth discretization are
    reused instead of recomputed — half the preprocess work of the
    recompute-both design (the reference recomputes both frames per step,
    base_trainer_with_vo.py:169-269).
    """
    rgb = rgb.astype(jnp.float32)
    depth = depth.astype(jnp.float32)
    if cfg.obs_transform != "none":
        stacked = jnp.concatenate([rgb, depth], axis=-1)
        stacked = apply_obs_transform(stacked, cfg.obs_transform,
                                      (cfg.vis_size_w, cfg.vis_size_h))
        rgb, depth = stacked[..., :3], stacked[..., 3:]

    feats: Dict[str, jax.Array] = {}
    if "rgb" in cfg.observation_space:
        feats["rgb"] = rgb
    if "depth" in cfg.observation_space:
        feats["depth"] = depth
    if "discretized_depth" in cfg.observation_space:
        feats["discretized_depth"] = discretize_depth(
            depth[..., 0], cfg.discretized_depth_channels)
    if "top_down_view" in cfg.observation_space:
        feats["top_down_view"] = top_down_view_batch(
            depth[..., 0], cfg.topdown_params)[..., None]
    if cfg.dtype != jnp.float32:
        # reduced-precision mode: emit the network-input channels in the
        # model's compute dtype — halves the HBM traffic between preprocess
        # and the conv stem, the eval path's bandwidth bottleneck.  (fp32
        # mode stays bit-exact; all parity tests run there.)
        feats = {k: v.astype(cfg.dtype) for k, v in feats.items()}
    return feats


def pair_from_features(prev_feats: Dict[str, jax.Array],
                       cur_feats: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    """Assemble the (prev, cur) channel-concatenated pair the models expect."""
    return {k: jnp.concatenate([prev_feats[k], cur_feats[k]], axis=-1)
            for k in prev_feats}


def preprocess_obs_pairs_twins(
    prev_rgb: jax.Array,
    prev_depth: jax.Array,
    cur_rgb: jax.Array,
    cur_depth: jax.Array,
    cfg: VOInferenceConfig,
) -> Dict[str, jax.Array]:
    """Entry-level twin expansion for the joint geo-invariance stage.

    The joint stage's batches alternate (primary, swapped) samples built
    from the SAME frame pair (engine:367-374 layout), so the host ships each
    entry's pixels once ([E=B/2] arrays) and the device expands: sample 2k is
    pair(f_prev[k], f_cur[k]), sample 2k+1 is pair(f_cur[k], f_prev[k]).
    Frame features (depth discretization, top-down projection) are computed
    once per FRAME instead of once per sample — half the preprocess FLOPs of
    :func:`preprocess_obs_pairs` on the expanded batch, and half the
    host->device bytes.  Values are identical to the unpacked path.
    """
    fp = frame_features(prev_rgb, prev_depth, cfg)
    fc = frame_features(cur_rgb, cur_depth, cfg)
    out = {}
    for k in fp:
        primary = jnp.concatenate([fp[k], fc[k]], axis=-1)
        swapped = jnp.concatenate([fc[k], fp[k]], axis=-1)
        out[k] = jnp.stack([primary, swapped], axis=1).reshape(
            (primary.shape[0] * 2,) + primary.shape[1:])
    return out


@functools.partial(jax.jit, static_argnames=("cfg",))
def preprocess_obs_pairs_twins_packed(
    prev_rgb: jax.Array,
    prev_depth: jax.Array,
    cur_rgb: jax.Array,
    cur_depth: jax.Array,
    cfg: VOInferenceConfig,
) -> jax.Array:
    """:func:`preprocess_obs_pairs_twins` emitting the PACKED stem block
    ([B, H, W, 2*C_frame] in the encoder's stem channel order) instead of the
    per-key dict — same twin expansion (sample 2k = (f_prev[k], f_cur[k]),
    sample 2k+1 swapped), equal to the dict path to 1 ulp.  The bucketed
    joint train step selects this single array per expert bucket (one one-hot
    einsum instead of four) exactly like the det eval path."""
    fp = frame_features_packed(prev_rgb, prev_depth, cfg)
    fc = frame_features_packed(cur_rgb, cur_depth, cfg)
    primary = jnp.concatenate([fp, fc], axis=-1)
    swapped = jnp.concatenate([fc, fp], axis=-1)
    return jnp.stack([primary, swapped], axis=1).reshape(
        (primary.shape[0] * 2,) + primary.shape[1:])


@functools.partial(jax.jit, static_argnames=("cfg",))
def preprocess_obs_pairs_packed(
    prev_rgb: jax.Array,
    prev_depth: jax.Array,
    cur_rgb: jax.Array,
    cur_depth: jax.Array,
    cfg: VOInferenceConfig,
) -> jax.Array:
    """:func:`preprocess_obs_pairs` emitting the packed stem block."""
    return jnp.concatenate(
        [frame_features_packed(prev_rgb, prev_depth, cfg),
         frame_features_packed(cur_rgb, cur_depth, cfg)], axis=-1)


# stem channel order of the VO encoder (vo_cnn.py:88-106): per frame, the
# blocks are rgb/255, depth, discretized_depth, top_down_view; the stem input
# x is concat(prev blocks, cur blocks)
_PACK_ORDER = ("rgb", "depth", "discretized_depth", "top_down_view")


def pack_frame_features(feats: Dict[str, jax.Array], cfg) -> jax.Array:
    """Pack per-frame features into ONE [B, H, W, C] block in the model's
    stem channel order, rgb pre-scaled by 1/255.

    With ``cfg.cache_dtype == "int8"`` the block is quantized to int8
    (scale 127; every channel lives in [0, 1]) — the feature CACHE then
    costs half the HBM bytes of bf16 per selection-einsum read."""
    parts = []
    for k in _PACK_ORDER:
        if k in feats:
            v = feats[k].astype(cfg.dtype)
            if k == "rgb":
                v = v / 255.0
            parts.append(v)
    pack = jnp.concatenate(parts, axis=-1)
    if getattr(cfg, "cache_dtype", "native") == "int8":
        pack = jnp.clip(jnp.round(pack.astype(jnp.float32) * 127.0),
                        0, 127).astype(jnp.int8)
    return pack


@functools.partial(jax.jit, static_argnames=("cfg",))
def frame_features_packed(rgb: jax.Array, depth: jax.Array, cfg) -> jax.Array:
    """Per-frame packed stem block: ``concat(prev_pack, cur_pack)`` IS the
    encoder's stem input x (same elementwise ops and concat order as the
    dict path — vo_cnn.py:88-106; equal to 1 ulp, XLA may strength-reduce
    the /255 differently across programs).

    The det bucketed path selects this single packed array per bucket — one
    MXU one-hot einsum instead of four per-key einsums (measured ~45%
    cheaper selection at batch 512 on v5e: 50.7 -> 28 ms) — and the encoder
    consumes it directly, skipping the dict assembly entirely."""
    return pack_frame_features(frame_features(rgb, depth, cfg), cfg)


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
    return pair_from_features(frame_features(prev_rgb, prev_depth, cfg),
                              frame_features(cur_rgb, cur_depth, cfg))


def bucket_expert_indices_static(actions_np, batch: int) -> Tuple:
    """Expert buckets with a small, bounded set of compile signatures.

    Each bucket's capacity is its occupancy rounded UP to a multiple of
    ceil(B/4), and experts are assigned to buckets by descending occupancy —
    so the sorted capacity tuple is drawn from ~a dozen possibilities
    regardless of the action mix (the power-of-two scheme churned a fresh
    XLA compile per exact-mix signature in live eval loops — measured
    ~3 s/step amortized at batch 32 on this box; the persistent compile
    cache amortizes the bounded set across runs).  Total forward rows:
    1.0-1.5B typical vs the all-experts path's 3B, and empty buckets cost
    nothing (zero capacity here, lax.cond skip at runtime for
    padded-but-empty ones).

    Returns (bucket_idx tuple, expert_ids int32 [n_experts]) — expert_ids[j]
    is the (traced) expert whose parameters bucket j runs.
    """
    import numpy as np

    n_exp = len(VO_EXPERT_ACTIONS)
    acts = np.asarray(actions_np).astype(np.int32).reshape(-1)
    expert_idx = np.clip(acts - 1, 0, n_exp - 1)
    counts = np.bincount(expert_idx, minlength=n_exp)
    order = np.argsort(-counts, kind="stable").astype(np.int32)
    quantum = max(1, -(-batch // 4))
    out = []
    for e in order:
        pos = np.nonzero(expert_idx == e)[0].astype(np.int32)
        cap = min(batch, -(-len(pos) // quantum) * quantum)
        idx = np.full(cap, batch, np.int32)
        idx[: len(pos)] = pos
        out.append(idx)
    return tuple(out), order


def select_rows_onehot(v: jax.Array, idx: jax.Array, batch: int) -> jax.Array:
    """Select rows ``v[idx]`` as a 0/1 one-hot matmul.

    A plain dynamic gather of image-batch rows lowers catastrophically on
    TPU (~434 ms for 256 rows of a [512,192,341,30] batch vs ~4 ms as a
    matmul, measured on v5e).  fp32 0/1 selectors are exact (one nonzero
    product per output); bf16 values select exactly through a bf16 selector
    with an f32 accumulator in one MXU pass.  A pad index == batch falls
    outside one_hot's class range, giving an all-zero selector row -> pad
    outputs are zeros (callers scatter them to a dropped overflow row).
    """
    sel = jax.nn.one_hot(idx, batch, dtype=jnp.float32)  # [C, B]
    if v.dtype == jnp.int8:
        # int8 cache path: s8 x s8 -> s32 on the MXU, exact (0/1 selector,
        # one nonzero product per output); caller dequantizes
        return jnp.einsum(
            "cb,b...->c...", sel.astype(jnp.int8), v,
            preferred_element_type=jnp.int32,
        ).astype(jnp.int8)
    if v.dtype == jnp.bfloat16:
        return jnp.einsum(
            "cb,b...->c...", sel.astype(jnp.bfloat16), v,
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
    return jnp.einsum("cb,b...->c...", sel, v,
                      precision=jax.lax.Precision.HIGHEST)


def bucket_expert_indices_static_sharded(actions_np, batch: int,
                                         n_shards: int) -> Tuple:
    """Per-SHARD local expert buckets for mesh-sharded det eval.

    :func:`bucket_expert_indices_static` applied within each shard: every
    shard buckets its own B/n_shards samples with its OWN occupancy-sorted
    expert order, and slot j's capacity is the max over shards of slot-j
    occupancy (quantized to multiples of ceil(B_loc/4) — the same bounded
    compile-signature argument).  Returns
    (bucket_idx tuple of [n_shards*cap_j] int32 LOCAL indices concatenated in
    shard order, expert_ids [n_shards, n_experts] int32); both shard
    P(DATA_AXIS) so each device receives exactly its own rows — the
    mesh-sharded analogue of the train-side scheme
    (vo/engine.py::_attach_train_buckets)."""
    import numpy as np

    n_exp = len(VO_EXPERT_ACTIONS)
    acts = np.asarray(actions_np).astype(np.int32).reshape(-1)
    assert batch % n_shards == 0, (batch, n_shards)
    b_loc = batch // n_shards
    expert_idx = np.clip(acts - 1, 0, n_exp - 1).reshape(n_shards, b_loc)
    quantum = max(1, -(-b_loc // 4))
    orders = np.zeros((n_shards, n_exp), np.int32)
    pos_lists = [[None] * n_shards for _ in range(n_exp)]  # [slot][shard]
    occ = np.zeros((n_shards, n_exp), np.int64)
    for s in range(n_shards):
        counts = np.bincount(expert_idx[s], minlength=n_exp)
        order = np.argsort(-counts, kind="stable").astype(np.int32)
        orders[s] = order
        for j, e in enumerate(order):
            pos = np.nonzero(expert_idx[s] == e)[0].astype(np.int32)
            pos_lists[j][s] = pos
            occ[s, j] = len(pos)
    out = []
    for j in range(n_exp):
        top = int(occ[:, j].max())
        cap = min(b_loc, -(-top // quantum) * quantum) if top else 0
        chunks = []
        for s in range(n_shards):
            idx = np.full(cap, b_loc, np.int32)
            pos = pos_lists[j][s]
            idx[: len(pos)] = pos
            chunks.append(idx)
        out.append(np.concatenate(chunks) if cap else np.zeros(0, np.int32))
    return tuple(out), orders


def _det_bucketed(model, cfg, variables, obs_pairs, bucket_idx,
                  expert_ids=None):
    """Det-mode forward where each sample visits only its own expert.

    ``bucket_idx``: per-bucket index arrays (capacities are static via the
    array shapes). Skipping an empty bucket is Python control flow on a
    static shape — legal under jit.  Without ``expert_ids`` bucket j runs
    expert j; with it, bucket j runs the traced ``expert_ids[j]``
    (:func:`bucket_expert_indices_static`'s occupancy-sorted assignment).

    ``obs_pairs`` may be the per-key dict OR a packed stem-order array
    (:func:`frame_features_packed` pairs) — the packed form selects each
    bucket with ONE one-hot einsum and feeds the encoder directly."""
    packed = not isinstance(obs_pairs, dict)
    batch = (obs_pairs.shape[0] if packed
             else next(iter(obs_pairs.values())).shape[0])
    out = jnp.zeros((batch + 1, 3), jnp.float32)
    # NOTE: fusing the k per-bucket selections into one concatenated-index
    # einsum (one source read instead of k) was measured SLOWER at batch 512
    # (81 vs 64 ms/step, re-confirmed on the packed path).  The device trace
    # explains why: each per-bucket selection fuses the whitening affine AND
    # the layout change into its write, emitting the stem input directly in
    # the conv-friendly layout ({0,2,3,1}); the one big einsum writes the
    # default layout and every slice then pays a separate transpose copy.
    # Two further trace-guided restructurings also measured SLOWER and were
    # reverted: selecting the (prev, cur) 15-channel halves separately to
    # skip the [B, H, W, 30] pair assembly (~5.7 ms of copies) breaks that
    # same select+whiten+layout fusion because the whitening then sits after
    # a channel concat (7.9k -> 7.7k pairs/s); applying the whitening affine
    # per half next to each einsum restores the fusion but the six narrow
    # 15-channel selects plus new layout copies on the halves cost more than
    # the assembly saved (7.9k -> 6.9k, device total 60.6 -> 68.7 ms).
    # Two more measured losers (A/B on v5e, batch 512, 70/15/15 mix, vs the
    # 7403 pairs/s baseline of this exact code):
    #   - a graduated capacity ladder (turn buckets 128 -> 96 rows): 7217.
    #     Fewer rows, but 96 is a worse conv batch tile than 128; padding on
    #     the ceil(B/4) grid is effectively free.
    #   - grouping the two same-capacity turn buckets into one vmapped
    #     forward over stacked expert params: 6997.  The grouped select is
    #     one big einsum again (the HBM-materialization failure above), and
    #     vmap's extra leading dim worsens every downstream tile.
    for j, idx in enumerate(bucket_idx):
        if idx.shape[0] == 0:
            continue
        e = j if expert_ids is None else expert_ids[j]

        def run_bucket(idx=idx, e=e):
            if packed:
                sub = select_rows_onehot(obs_pairs, idx, batch)
                if sub.dtype == jnp.int8:  # dequantize the int8 cache
                    sub = sub.astype(cfg.dtype) * jnp.asarray(
                        1.0 / 127.0, cfg.dtype)
            else:
                sub = {k: select_rows_onehot(v, idx, batch)
                       for k, v in obs_pairs.items()}
            params_e = jax.tree.map(lambda x: x[e], variables)
            pred = model.apply(params_e, sub, train=False)  # [C_e, 3]
            return pred.astype(jnp.float32)

        # runtime-skip a bucket with no real samples (static capacities mean
        # an all-one-action batch leaves the other buckets fully padded):
        # cond lowers to real control flow on TPU, so the empty branches cost
        # nothing but the predicate
        pred = jax.lax.cond(
            jnp.any(idx < batch),
            run_bucket,
            lambda: jnp.zeros((idx.shape[0], 3), jnp.float32),
        )
        out = out.at[idx].set(pred)
    return out[:batch]


_predict_det_bucketed = functools.partial(jax.jit, static_argnames=("model", "cfg"))(
    _det_bucketed
)


def _predict_det_bucketed_sharded(model, cfg, variables, obs_pairs, bucket_idx,
                                  expert_ids, mesh):
    """Mesh-sharded det forward: each device runs only its own shard's
    buckets (VERDICT r2 #1 — reclaims the ~3x det FLOP saving multi-chip).

    ``bucket_idx``/``expert_ids`` come from
    :func:`bucket_expert_indices_static_sharded`: local indices per shard,
    concatenated in shard order, so P(DATA_AXIS) hands each device its own
    slice and the whole selection/scatter stays shard-local — zero
    collectives (per-env work is independent)."""
    from jax.sharding import PartitionSpec as P

    from pointnav_vo_tpu.parallel.mesh import DATA_AXIS

    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    def local(variables, obs, expert_ids, *buckets):
        return _det_bucketed(model, cfg, variables, obs, buckets,
                             expert_ids[0])

    in_specs = (P(), P(DATA_AXIS), P(DATA_AXIS)) + tuple(
        P(DATA_AXIS) for _ in bucket_idx
    )
    fn = shard_map(local, mesh=mesh, in_specs=in_specs,
                   out_specs=P(DATA_AXIS), check_vma=False)
    return fn(variables, obs_pairs, expert_ids, *bucket_idx)


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

        In det mode with *host* actions (numpy — always the case on the eval
        path, which just synced actions to step the envs) each sample runs
        only its own expert via static per-expert buckets; device actions or
        rnd mode use the all-experts + gather program.

        rnd mode deliberately does NOT bucket (measured on v5e, B=256,
        rnd_mode_n=10: all-experts 35.8 ms vs bucketed own-expert 40.3 ms).
        The reference's dropout sits only on the FC trunk
        (vo_cnn.py:213-219), so XLA hoists the key-independent conv backbone
        out of the K-pass vmap — the all-experts program runs each backbone
        exactly once as one well-batched [3, B] conv stack, while bucketing
        pays per-bucket selection einsums and small-cap convs to save
        backbone rows that were already cheap.  The reference's per-sample
        own-expert loop (base_trainer_with_vo.py:295-308) is the right
        dispatch for its batch-1 GPU pipeline, not for this one.
        """
        import numpy as np

        if self.cfg.mode == "det" and isinstance(actions, np.ndarray):
            batch = int(next(iter(obs_pairs.values())).shape[0])
            # static occupancy-sorted capacities: the jitted program's
            # signature set is bounded regardless of the action mix (the
            # power-of-two variant recompiled per exact mix in live loops)
            buckets, order = bucket_expert_indices_static(actions, batch)
            delta = _predict_det_bucketed(
                self.model, self.cfg, self.variables, obs_pairs, buckets,
                jnp.asarray(order),
            )
            return delta, jnp.zeros_like(delta)
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

    def predict_step_cached(self, prev_feats, cur_rgb, cur_depth, actions_np):
        """Steady-state per-step det inference: preprocess only the NEW frame
        (the previous frame's features are the last call's return), pair with
        the cache, run each sample's own expert — one dispatch.

        Returns (delta, cur_feats); feed ``cur_feats`` back on the next call.
        This is the per-step unit of work on the eval path (the fused
        mega-step in rl/eval.py embeds the same computation).  Buckets use
        the static occupancy-sorted capacities, so the jitted step compiles
        exactly once per (model, batch) regardless of the action mix.
        """
        import numpy as np

        assert self.cfg.mode == "det"
        batch = int(cur_rgb.shape[0])
        buckets, order = bucket_expert_indices_static(
            np.asarray(actions_np), batch)
        if isinstance(prev_feats, dict):
            # legacy dict cache (frame_features): pack OUTSIDE the donated
            # step — four dict buffers can never alias the packed output, so
            # donating them only emitted "donated buffers were not usable"
            # warnings on the first call (VERDICT r4 item 9); normalizing
            # here keeps the steady-state donation always usable
            prev_feats = pack_frame_features(prev_feats, self.cfg)
        return _vo_step_cached(self.model, self.cfg, self.variables,
                               prev_feats, cur_rgb, cur_depth, buckets,
                               jnp.asarray(order))


@functools.partial(jax.jit, static_argnames=("model", "cfg"),
                   donate_argnames=("prev_feats",))
def _vo_step_cached(model, cfg, variables, prev_feats, cur_rgb, cur_depth,
                    bucket_idx, expert_ids):
    # prev_feats is donated: the caller always replaces its cache with the
    # returned cur_feats (same shape/dtype — the PACKED stem block; dict
    # caches are packed by the caller before entry), so XLA reuses the
    # buffer every step and no unusable-donation warning can fire.
    cur_feats = frame_features_packed(cur_rgb, cur_depth, cfg)
    obs = jnp.concatenate([prev_feats, cur_feats], axis=-1)
    delta = _det_bucketed(model, cfg, variables, obs, bucket_idx, expert_ids)
    return delta, cur_feats


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
