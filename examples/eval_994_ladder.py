#!/usr/bin/env python
"""The 994-episode quality ladder: trained policy, GPS oracle, VO, greedy.

The reference's headline workload is `rl_tune_vo.pth` + the trained VO over
994 Gibson-val episodes (README.md:84); its headline *claim* is that
VO-supplied goals nearly match GPS goals.  `EVAL_994.json` measured the
wall-clock of that protocol shape with a scripted greedy controller — this
script measures the REAL deployment condition and its controls, as one
artifact whose rows share the episode set, env seeds, VO weights, and caps:

  oracle_gps  — trained PointNavActorCritic + ground-truth goal sensor
                (the quality upper bound: separates VO drift from
                controller limits)
  policy_vo   — the SAME policy + trained det VO goals (the deployment
                condition, the reference's actual workload shape; the
                30-minute north-star row)
  greedy_vo   — the scripted greedy controller + the same VO (continuity
                with EVAL_994.json — same seeds, so with a shared
                --vo-cache this row reproduces that artifact bit-for-bit)
  policy_vo_rnd — (fewer episodes) the policy under the rnd-mode
                dropout-ensemble VO (rnd_mode_n=10,
                base_trainer_with_vo.py:295-308): the uncertainty path's
                first at-scale measurement (wall-clock + vo_pred_std)

Pipeline: train 3 VO experts at full 341x192 (cacheable), GPS-train the
policy (cacheable), optionally VO-tune it, then run the rows over a
32-process shm env farm.  Writes EVAL_994_LADDER.json.

Usage:
  python examples/eval_994_ladder.py \
      --vo-cache /tmp/vo994.pkl --policy-cache /tmp/pol994.pkl
  python examples/eval_994_ladder.py --episodes 64 --envs 8 \
      --gps-updates 20 --pairs 800        # smoke
"""

import argparse
import faulthandler
import json
import os
import pickle
import signal
import sys
import threading
import time

faulthandler.register(signal.SIGUSR1)
faulthandler.dump_traceback_later(1800, repeat=True)

# ---------------------------------------------------------------------------
# Stall watchdog: the dev box reaches the TPU through a network tunnel; if
# the tunnel's far side restarts, an in-flight device read blocks FOREVER
# (the axon client does not reconnect) and the device-resident training
# state is gone.  A stalled run can't recover in-process, so: heartbeat on
# every unit of forward progress, and if none arrives for --watchdog
# seconds, dump stacks and hard-exit(3) so an outer retry loop relaunches
# us — the VO cache, policy checkpoint, and completed-row journal below
# make the relaunch resume rather than restart.
# ---------------------------------------------------------------------------
_HB = [time.monotonic()]


def beat():
    _HB[0] = time.monotonic()


def start_watchdog(stale_s):
    if stale_s <= 0:
        return

    def _watch():
        while True:
            time.sleep(30)
            idle = time.monotonic() - _HB[0]
            if idle > stale_s:
                print(f"\nWATCHDOG: no progress for {idle:.0f}s "
                      f"(limit {stale_s}); device tunnel presumed dead — "
                      "exiting 3 for the retry loop", flush=True)
                faulthandler.dump_traceback()
                sys.stdout.flush()
                os._exit(3)

    threading.Thread(target=_watch, daemon=True).start()

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "examples"))

from pointnav_vo_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from eval_994 import GreedyGoalPolicy, train_expert  # noqa: E402
from pointnav_vo_tpu.common import MOVE_FORWARD, TURN_LEFT, TURN_RIGHT  # noqa: E402
from pointnav_vo_tpu.models.policy import PointNavActorCritic  # noqa: E402
from pointnav_vo_tpu.native.shm_env import ShmVectorEnv  # noqa: E402
from pointnav_vo_tpu.rl.envs import EnvConfig, make_scripted_vector_env  # noqa: E402
from pointnav_vo_tpu.rl.eval import Evaluator  # noqa: E402
from pointnav_vo_tpu.rl.ppo import PPOConfig  # noqa: E402
from pointnav_vo_tpu.rl.trainer import DDPPOTrainer  # noqa: E402
from pointnav_vo_tpu.vo.dataset import generate_scripted_dataset  # noqa: E402
from pointnav_vo_tpu.vo.engine import VOTrainConfig  # noqa: E402
from pointnav_vo_tpu.vo.ensemble import (  # noqa: E402
    VOEnsemble,
    VOInferenceConfig,
    stack_expert_variables,
)

REFERENCE_EVAL_MIN = 4.5 * 60  # reference README.md:84


class DepthGoalEnvs:
    """Training-time obs filter: the resnet_rnn_policy consumes depth +
    pointgoal only (ddppo_pointnav.yaml visual_types), so don't burn rollout
    HBM on rgb rows during the GPS stage."""

    def __init__(self, inner):
        self.inner = inner
        self.num_envs = inner.num_envs

    def reset(self):
        return self._f(self.inner.reset())

    def step(self, a):
        o, r, d, i = self.inner.step(a)
        return self._f(o), r, d, i

    def close(self):
        self.inner.close()

    @staticmethod
    def _f(o):
        return {k: o[k] for k in ("depth", "pointgoal_with_gps_compass")}


def train_vo(args, env_cfg, icfg):
    if args.vo_cache and os.path.isfile(args.vo_cache):
        with open(args.vo_cache, "rb") as f:
            c = pickle.load(f)
        print(f"loaded trained VO experts from {args.vo_cache}", flush=True)
        # accept eval_994.py caches too (t_data/t_train instead of t_vo)
        t_vo = c.get("t_vo", c.get("t_data", 0.0) + c.get("t_train", 0.0))
        return c["fwd_vars"], c["joint_vars"], t_vo
    import tempfile

    h, w = env_cfg.image_h, env_cfg.image_w
    t0 = time.perf_counter()
    workdir = tempfile.mkdtemp(prefix="ladder_vo_")
    train_h5 = os.path.join(workdir, "train.h5")
    eval_h5 = os.path.join(workdir, "eval.h5")
    print(f"generating {args.pairs}+{args.eval_pairs} pairs at {w}x{h} ...",
          flush=True)
    generate_scripted_dataset(train_h5, args.pairs, env_cfg=env_cfg, seed=0)
    generate_scripted_dataset(eval_h5, args.eval_pairs, env_cfg=env_cfg,
                              seed=99_999)
    fwd_vars, _ = train_expert(
        icfg, VOTrainConfig(batch_size=args.batch, epochs=args.epochs,
                            action_type=MOVE_FORWARD, lr=2.5e-4),
        train_h5, eval_h5, w, h, "forward")
    joint_vars, _ = train_expert(
        icfg, VOTrainConfig(batch_size=args.batch, epochs=args.epochs,
                            action_type=(TURN_LEFT, TURN_RIGHT),
                            geo_invariance_types=("inverse_joint_train",),
                            lr=1.5e-4),
        train_h5, eval_h5, w, h, "joint left/right")
    t_vo = time.perf_counter() - t0
    if args.vo_cache:
        with open(args.vo_cache, "wb") as f:
            pickle.dump({"fwd_vars": jax.tree.map(np.asarray, fwd_vars),
                         "joint_vars": jax.tree.map(np.asarray, joint_vars),
                         "t_vo": t_vo}, f)
        print(f"cached VO experts to {args.vo_cache}", flush=True)
    return fwd_vars, joint_vars, t_vo


def _save_part(path, stage, update, trainer, reward_trend, t_accum):
    """Atomic mid-training checkpoint (host-side numpy — survives the
    device tunnel dying, which destroys every device buffer)."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump({
            "stage": stage, "update": update,
            "params": jax.tree.map(np.asarray, trainer.params),
            "variables": jax.tree.map(np.asarray, trainer.variables),
            "opt_state": jax.tree.map(np.asarray, trainer.opt_state),
            "rng": np.asarray(trainer.rng),
            "update_idx": trainer.update_idx,
            "reward_trend": reward_trend, "t_accum": t_accum,
        }, f)
    os.replace(tmp, path)


def _restore_part(trainer, ck):
    trainer.params = jax.tree.map(jnp.asarray, ck["params"])
    trainer.variables = jax.tree.map(jnp.asarray, ck["variables"])
    trainer.opt_state = jax.tree.map(jnp.asarray, ck["opt_state"])
    trainer.rng = jnp.asarray(ck["rng"])
    trainer.update_idx = ck["update_idx"]


def _train_stage(stage, trainer, n_updates, start, reward_trend, part,
                 t_prev, t0):
    tag = "gps" if stage == "gps" else "tune"
    for update in range(start + 1, n_updates + 1):
        trainer.collect_rollout()
        trainer.update_agent()
        beat()
        if update % 10 == 0 or update == 1:
            r = (float(np.mean(trainer.reward_window))
                 if trainer.reward_window else float("nan"))
            reward_trend.append({"update": update, "stage": stage,
                                 "mean_ep_reward": r})
            print(f"  [{tag} {update:3d}] mean_ep_reward {r:7.3f}",
                  flush=True)
        if part and update % 10 == 0:
            _save_part(part, stage, update, trainer, reward_trend,
                       t_prev + time.perf_counter() - t0)


def train_policy(args, env_cfg, ensemble):
    """GPS-train PointNavActorCritic at full resolution, then (optionally)
    fine-tune it with the trained VO in the loop (TRAIN.md stage 4).
    Checkpoints every 10 updates to <policy_cache>.part and resumes from it,
    so a tunnel death costs at most 10 updates."""
    if args.policy_cache and os.path.isfile(args.policy_cache):
        with open(args.policy_cache, "rb") as f:
            c = pickle.load(f)
        print(f"loaded trained policy from {args.policy_cache}", flush=True)
        return c["variables"], c["t_policy"], c["reward_trend"]

    part = (args.policy_cache + ".part") if args.policy_cache else None
    ck = None
    if part and os.path.isfile(part):
        with open(part, "rb") as f:
            ck = pickle.load(f)
        print(f"resuming policy training: stage={ck['stage']} "
              f"update={ck['update']} from {part}", flush=True)

    h, w = env_cfg.image_h, env_cfg.image_w
    policy = make_policy(env_cfg)
    pcfg = PPOConfig(num_steps=args.num_steps, num_mini_batch=2, ppo_epoch=2,
                     lr=2.5e-4, entropy_coef=0.01,
                     use_normalized_advantage=True)
    # shorter training episodes: denser episode turnover per rollout
    train_cfg = EnvConfig(
        image_h=h, image_w=w, max_episode_steps=60,
        actuation_noise_multiplier=env_cfg.actuation_noise_multiplier,
        room_radius_range=(3.0, 5.0),
    )
    t0 = time.perf_counter()
    t_prev = ck["t_accum"] if ck else 0.0
    reward_trend = list(ck["reward_trend"]) if ck else []

    if ck and ck["stage"] in ("gps_done", "tune_vo"):
        variables = {"params": jax.tree.map(jnp.asarray, ck["params"]),
                     **jax.tree.map(jnp.asarray, ck["variables"])}
    else:
        envs = DepthGoalEnvs(
            make_scripted_vector_env(train_cfg, args.train_envs, seed=0))
        trainer = DDPPOTrainer(model=policy, ppo_cfg=pcfg, envs=envs,
                               rng=jax.random.PRNGKey(0),
                               total_updates=args.gps_updates)
        start = 0
        if ck and ck["stage"] == "gps":
            _restore_part(trainer, ck)
            start = ck["update"]
        print(f"\nGPS-training the policy: {args.gps_updates} updates x "
              f"{args.num_steps} steps x {args.train_envs} envs at {w}x{h} "
              f"(from update {start}) ...", flush=True)
        _train_stage("gps", trainer, args.gps_updates, start, reward_trend,
                     part, t_prev, t0)
        variables = {"params": trainer.params, **trainer.variables}
        if part:
            _save_part(part, "gps_done", 0, trainer, reward_trend,
                       t_prev + time.perf_counter() - t0)
        envs.close()

    if args.tune_updates > 0:
        # VO-in-the-loop fine-tune (rl_tune_vo): the policy trains on the
        # goals the deployment condition will actually feed it
        envs2 = make_scripted_vector_env(train_cfg, args.train_envs, seed=100)
        tuner = DDPPOTrainer(model=policy, ppo_cfg=pcfg, envs=envs2,
                             rng=jax.random.PRNGKey(1), variables=variables,
                             vo_ensemble=ensemble,
                             total_updates=args.tune_updates)
        start = 0
        if ck and ck["stage"] == "tune_vo":
            _restore_part(tuner, ck)
            start = ck["update"]
        print(f"\nVO-tuning the policy: {args.tune_updates} updates "
              f"(from update {start}) ...", flush=True)
        _train_stage("tune_vo", tuner, args.tune_updates, start,
                     reward_trend, part, t_prev, t0)
        variables = {"params": tuner.params, **tuner.variables}
        envs2.close()

    t_policy = t_prev + time.perf_counter() - t0
    if args.policy_cache:
        with open(args.policy_cache, "wb") as f:
            pickle.dump({"variables": jax.tree.map(np.asarray, variables),
                         "t_policy": t_policy,
                         "reward_trend": reward_trend}, f)
        print(f"cached trained policy to {args.policy_cache}", flush=True)
        if part and os.path.isfile(part):
            os.remove(part)
    return variables, t_policy, reward_trend


def make_policy(env_cfg):
    return PointNavActorCritic(
        image_size=(env_cfg.image_h, env_cfg.image_w), dtype=jnp.bfloat16)


def make_ensemble(icfg, fwd_vars, joint_vars):
    return VOEnsemble(icfg, stack_expert_variables([
        jax.tree.map(lambda x: x[0], fwd_vars),
        jax.tree.map(lambda x: x[0], joint_vars),
        jax.tree.map(lambda x: x[1], joint_vars),
    ]))


def run_row(name, *, model, variables, ensemble, env_cfg, envs_n, episodes,
            rng_seed=3, env_seed=777):
    """One ladder row over a FRESH shm env farm (identical seeds per row)."""
    envs = ShmVectorEnv(env_cfg, envs_n, seed=env_seed)
    try:
        ev = Evaluator(model=model, variables=variables, envs=envs,
                       vo_ensemble=ensemble, rng=jax.random.PRNGKey(rng_seed))
        t0 = time.perf_counter()

        def progress(k, r):
            beat()
            if k % 100 == 0 or k == episodes:
                el = time.perf_counter() - t0
                print(f"  [{name}] {k}/{episodes} | {el/60:.1f} min | "
                      f"proj {el / k * episodes / 60:.1f} min", flush=True)

        print(f"\n[{name}] evaluating {episodes} episodes over {envs_n} shm "
              f"envs ...", flush=True)
        agg = ev.run(episodes, log_fn=progress)
        wall_min = (time.perf_counter() - t0) / 60
    finally:
        envs.close()
    row = {
        "wall_clock_min": wall_min,
        "metrics": {k: float(v) for k, v in agg.items()},
    }
    # per-episode distributions (the rnd row's vo_pred_std is the point of
    # VERDICT r4 item 7; steps/drift contextualize every row)
    for field in ("vo_pred_std_mean", "drift_mean", "steps"):
        vals = np.asarray([getattr(r, field) for r in ev.results], np.float64)
        vals = vals[np.isfinite(vals)]
        if vals.size:
            row[f"{field}_pcts"] = {
                p: float(np.percentile(vals, p)) for p in (5, 25, 50, 75, 95)
            }
    print(f"[{name}] {wall_min:.1f} min | success "
          f"{agg['success']:.3f} | softspl {agg['softspl']:.3f} | spl "
          f"{agg['spl']:.3f} | dist {agg['distance_to_goal']:.3f}",
          flush=True)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--episodes", type=int, default=994)
    ap.add_argument("--rnd-episodes", type=int, default=256,
                    help="episodes for the rnd-mode row (0 skips it)")
    ap.add_argument("--envs", type=int, default=32)
    ap.add_argument("--pairs", type=int, default=6000)
    ap.add_argument("--eval-pairs", type=int, default=384)
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--gps-updates", type=int, default=150)
    ap.add_argument("--tune-updates", type=int, default=40)
    ap.add_argument("--train-envs", type=int, default=16)
    ap.add_argument("--num-steps", type=int, default=64)
    ap.add_argument("--max-episode-steps", type=int, default=120)
    ap.add_argument("--skip-greedy", action="store_true")
    ap.add_argument("--vo-cache", default=None)
    ap.add_argument("--policy-cache", default=None)
    ap.add_argument("--out", default=os.path.join(REPO, "EVAL_994_LADDER.json"))
    ap.add_argument("--watchdog", type=int, default=1200,
                    help="exit(3) if no progress for this many seconds "
                         "(0 disables); an outer retry loop resumes from "
                         "the caches/journal")
    args = ap.parse_args()

    env_cfg = EnvConfig(max_episode_steps=args.max_episode_steps,
                        actuation_noise_multiplier=0.5)
    h, w = env_cfg.image_h, env_cfg.image_w
    icfg = VOInferenceConfig(vis_size_w=w, vis_size_h=h, dtype=jnp.bfloat16)

    fwd_vars, joint_vars, t_vo = train_vo(args, env_cfg, icfg)
    ensemble = make_ensemble(icfg, fwd_vars, joint_vars)
    # the watchdog arms only after the (device-free, cache-satisfiable)
    # dataset stage: a long scripted-world render must not trip it
    start_watchdog(args.watchdog)
    beat()
    variables, t_policy, reward_trend = train_policy(args, env_cfg, ensemble)
    policy = make_policy(env_cfg)

    # per-row journal: completed rows survive a watchdog exit / relaunch
    journal = args.out + ".rows.json"
    rows = {}
    if os.path.isfile(journal):
        with open(journal) as f:
            rows = json.load(f)
        print(f"journal: {sorted(rows)} rows already done", flush=True)

    def do_row(name, **kw):
        if name in rows:
            return
        beat()
        rows[name] = run_row(name, **kw)
        with open(journal + ".tmp", "w") as f:
            json.dump(rows, f)
        os.replace(journal + ".tmp", journal)

    # deployment condition FIRST: the north-star row measures cold, like the
    # reference's run (its VO+policy never benefit from a prior row's cache)
    do_row("policy_vo", model=policy, variables=variables,
           ensemble=make_ensemble(icfg, fwd_vars, joint_vars),
           env_cfg=env_cfg, envs_n=args.envs, episodes=args.episodes)
    do_row("oracle_gps", model=policy, variables=variables, ensemble=None,
           env_cfg=env_cfg, envs_n=args.envs, episodes=args.episodes)
    if not args.skip_greedy:
        greedy = GreedyGoalPolicy(turn_angle_deg=env_cfg.turn_angle_deg,
                                  success_distance=env_cfg.success_distance)
        do_row("greedy_vo", model=greedy, variables={"params": {}},
               ensemble=make_ensemble(icfg, fwd_vars, joint_vars),
               env_cfg=env_cfg, envs_n=args.envs, episodes=args.episodes)
    if args.rnd_episodes > 0:
        icfg_rnd = VOInferenceConfig(vis_size_w=w, vis_size_h=h,
                                     dtype=jnp.bfloat16, mode="rnd",
                                     rnd_mode_n=10)
        do_row("policy_vo_rnd", model=policy, variables=variables,
               ensemble=make_ensemble(icfg_rnd, fwd_vars, joint_vars),
               env_cfg=env_cfg, envs_n=args.envs, episodes=args.rnd_episodes)

    pv, og = rows["policy_vo"]["metrics"], rows["oracle_gps"]["metrics"]
    out = {
        "protocol": ("exact-episode-set quality ladder; rows share episode "
                     "set (env farm seed 777), VO weights, policy weights, "
                     f"{args.max_episode_steps}-step cap, actuation noise "
                     "0.5, scripted world, 341x192"),
        "episodes": args.episodes,
        "envs": args.envs,
        "resolution": [h, w],
        "policy": ("PointNavActorCritic resnet18+LSTMx2, GPS-trained "
                   f"{args.gps_updates} updates then VO-tuned "
                   f"{args.tune_updates} (TRAIN.md stages; "
                   "rl_tune_with_vo pipeline)"),
        "vo": f"3 trained experts, {args.pairs} pairs x {args.epochs} epochs, bf16",
        "train_cost_s": {"vo": t_vo, "policy": t_policy},
        "reward_trend": reward_trend,
        "rows": rows,
        "gps_vs_vo_gap": {
            k: float(og[k] - pv[k]) for k in ("success", "softspl", "spl")
        },
        "north_star": {
            "policy_vo_wall_clock_min": rows["policy_vo"]["wall_clock_min"],
            "target_min": 30.0,
            "vs_reference_min": REFERENCE_EVAL_MIN,
            "speedup_vs_reference": (
                REFERENCE_EVAL_MIN / rows["policy_vo"]["wall_clock_min"]),
        },
        "host_caveat": ("dev box drives the TPU through a network tunnel; "
                        "per-step host->device shipping dominates the wall "
                        "clock and disappears on a production host with "
                        "local PCIe"),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    if os.path.isfile(journal):
        os.remove(journal)
    print(f"\nwrote {args.out}")
    print(f"north star: policy_vo {rows['policy_vo']['wall_clock_min']:.1f} "
          f"min (target 30) | GPS-vs-VO success gap "
          f"{out['gps_vs_vo_gap']['success']:+.3f}")


if __name__ == "__main__":
    main()
