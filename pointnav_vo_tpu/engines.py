"""Config-driven engine adapters — the registry-visible trainer objects.

These bridge the yacs-style config trees (config/defaults.py) onto the
functional library (vo/engine.py, rl/trainer.py, rl/eval.py), replicating the
reference's engine surface:

- ``vo_cnn_regression_geo_invariance_engine`` (reference
  vo/engine/vo_cnn_regression_geo_invariance_engine.py) — supervised VO
  training/eval with checkpoint-resume and eval-config-from-checkpoint;
- ``efficient_ddppo`` / ``ppo`` (reference rl/ddppo/algo/ddppo_trainer.py,
  rl/ppo/ppo_trainer.py) — PPO training over vectorized envs with optional
  VO-in-the-loop, and the checkpoint-sweep eval driver.

Environment backend: the habitat simulator is an external CPU dependency; by
default the scripted PointNav world (rl/envs.py) stands in, and
``make_habitat_vector_env`` plugs real habitat behind the same interface.
"""

from __future__ import annotations

import os
import pickle
import time
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from pointnav_vo_tpu.common import ACT_NAME2IDX
from pointnav_vo_tpu.io.checkpoint import load_checkpoint
from pointnav_vo_tpu.io.torch_import import load_vo_checkpoint
from pointnav_vo_tpu.models.policy import PointNavActorCritic, PointNavBaselineActorCritic
from pointnav_vo_tpu.rl.envs import (
    env_config_from_task,
    make_habitat_vector_env,
    make_scripted_vector_env,
)
from pointnav_vo_tpu.rl.eval import Evaluator
from pointnav_vo_tpu.rl.ppo import PPOConfig
from pointnav_vo_tpu.rl.trainer import DDPPOTrainer
from pointnav_vo_tpu.utils import registry
from pointnav_vo_tpu.utils.config import Config
from pointnav_vo_tpu.utils.logging import (
    TensorboardWriter,
    append_jsonl,
    get_logger,
    save_info_dict,
)
from pointnav_vo_tpu.vo.dataset import FramePairReader
from pointnav_vo_tpu.vo.engine import VORegressionEngine, VOTrainConfig
from pointnav_vo_tpu.vo.ensemble import VOEnsemble, VOInferenceConfig, stack_expert_variables


# ---------------------------------------------------------------------------
# policies / envs registration
# ---------------------------------------------------------------------------


@registry.register_policy(name="resnet_rnn_policy")
def make_resnet_rnn_policy(config: Config):
    rl = config.RL
    task = config.TASK_CONFIG
    return PointNavActorCritic(
        n_actions=4,
        vis_types=tuple(rl.Policy.visual_types),
        image_size=(task.SIMULATOR.DEPTH_SENSOR.HEIGHT, task.SIMULATOR.DEPTH_SENSOR.WIDTH),
        hidden_size=rl.PPO.hidden_size,
        num_recurrent_layers=rl.Policy.num_recurrent_layers,
        rnn_type=rl.Policy.rnn_backbone,
        backbone=rl.Policy.visual_backbone,
        normalize_visual_inputs="rgb" in rl.Policy.visual_types,
    )


@registry.register_policy(name="pointnav_baseline_policy")
def make_baseline_policy(config: Config):
    return PointNavBaselineActorCritic(
        n_actions=4, hidden_size=config.RL.PPO.hidden_size
    )


@registry.register_env(name="NavRLEnv")
def make_nav_rl_env(config: Config, num_envs: int, seed: int = 0, noisy: bool = True):
    """PointNav vector env configured from the task tree.  ``ENV_BACKEND``
    selects the fan-out (construct_envs analogue, env_utils.py:38-98):
    "sync" loops scripted envs in-process, "shm" forks scripted process
    workers over the native rings, "habitat" forks habitat-sim workers."""
    backend = config.get("ENV_BACKEND", "sync")
    if backend == "habitat":
        return make_habitat_vector_env(config, num_envs, seed=seed, noisy=noisy)
    env_cfg = env_config_from_task(config, noisy=noisy, seed=seed)
    if backend == "shm":
        from pointnav_vo_tpu.native.shm_env import ShmVectorEnv

        return ShmVectorEnv(env_cfg, num_envs, seed=seed)
    if backend != "sync":
        raise ValueError(f"unknown ENV_BACKEND {backend!r} (sync | shm | habitat)")
    return make_scripted_vector_env(env_cfg, num_envs, seed=seed)


# ---------------------------------------------------------------------------
# VO engine adapter
# ---------------------------------------------------------------------------


def vo_inference_config_from(config: Config, model_node: Config,
                             precision: str = "fp32") -> VOInferenceConfig:
    sim = config.TASK_CONFIG.SIMULATOR
    precision = model_node.get("precision", precision)
    return VOInferenceConfig(
        dtype=(jnp.bfloat16 if precision == "bf16" else jnp.float32),
        model_name=model_node.name,
        observation_space=tuple(model_node.visual_type),
        vis_size_w=config.VO.VIS_SIZE_W,
        vis_size_h=config.VO.VIS_SIZE_H,
        hidden_size=model_node.hidden_size,
        backbone=model_node.visual_backbone,
        discretized_depth_channels=model_node.discretized_depth_channels,
        dropout_p=model_node.dropout_p,
        obs_transform=config.VO.get("OBS_TRANSFORM", "none"),
        min_depth=sim.DEPTH_SENSOR.MIN_DEPTH,
        max_depth=sim.DEPTH_SENSOR.MAX_DEPTH,
        hfov=sim.DEPTH_SENSOR.HFOV,  # degrees-as-radians quirk preserved
        mode=model_node.get("mode", "det"),
        rnd_mode_n=model_node.get("rnd_mode_n", 10),
    )


@registry.register_vo_engine(name="vo_cnn_regression_geo_invariance_engine")
class VOGeoInvarianceEngine:
    """Config-facing wrapper around VORegressionEngine (reference engine)."""

    def __init__(self, config: Config, run_type: str = "train", verbose: bool = True,
                 mesh=None):
        self.mesh = mesh
        self.logger = get_logger(log_file=config.get("LOG_FILE"))
        # eval / resume read config back out of the checkpoint
        # (reference vo_cnn_engine.py:40-62)
        self._resume_meta = None
        if run_type == "train" and config.RESUME_TRAIN:
            _, meta = load_checkpoint(config.RESUME_STATE_FILE)
            stored = Config(meta["full_config"])
            stored.RESUME_TRAIN = True
            stored.RESUME_STATE_FILE = config.RESUME_STATE_FILE
            stored.VO.TRAIN.epochs = config.VO.TRAIN.epochs
            config = stored
            self._resume_meta = meta
        if "eval" in run_type and config.EVAL.EVAL_WITH_CKPT:
            _, meta = load_checkpoint(config.EVAL.EVAL_CKPT_PATH)
            stored = Config(meta["full_config"])
            stored.RESUME_TRAIN = False
            stored.EVAL = config.EVAL
            stored.VO.EVAL = config.VO.EVAL
            stored.VO.DATASET = config.VO.DATASET
            self._eval_ckpt = config.EVAL.EVAL_CKPT_PATH
            config = stored

        self.config = config
        self.run_type = run_type
        vo = config.VO
        act_type = vo.TRAIN.action_type
        if isinstance(act_type, list):
            act_type = tuple(act_type)
        geo_types = tuple(vo.GEOMETRY.invariance_types)

        # VO.TRAIN.precision: "bf16" -> mixed precision (bf16 compute on the
        # MXU, fp32 params/optimizer) — a documented fast mode; default fp32
        # matches the reference numerics
        self.icfg = vo_inference_config_from(
            config, vo.MODEL, precision=vo.TRAIN.get("precision", "fp32"))
        self.tcfg = VOTrainConfig(
            lr=vo.TRAIN.lr,
            eps=vo.TRAIN.eps,
            weight_decay=vo.TRAIN.weight_decay,
            batch_size=vo.TRAIN.batch_size,
            epochs=vo.TRAIN.epochs,
            loss_weight_fixed=vo.TRAIN.loss_weight_fixed,
            loss_weight_multiplier=tuple(vo.TRAIN.loss_weight_multiplier.items()),
            action_type=act_type,
            geo_invariance_types=geo_types,
            loss_inv_weight=vo.GEOMETRY.loss_inv_weight,
            log_interval=config.LOG_INTERVAL,
            seed=config.SEED,
            debug=vo.get("debug", 0),
            log_grad=vo.TRAIN.get("log_grad", False),
        )

        def reader(path, shard_by_process=False):
            if not path:
                return None
            # multi-host training shards the dataset at chunk granularity
            # across processes (the analogue of the reference's per-worker
            # chunk sharding, regression_geo_invariance_iter_dataset.py:
            # 143-151); eval stays unsharded — evaluate() aggregates on the
            # host with no cross-host reduction, so every host must see the
            # full eval set for identical metrics
            shard_index, num_shards = 0, 1
            if shard_by_process:
                shard_index = jax.process_index()
                num_shards = jax.process_count()
            kwargs = dict(
                path=path, vis_size_w=vo.VIS_SIZE_W, vis_size_h=vo.VIS_SIZE_H,
                act_type=act_type, geo_invariance_types=geo_types,
                partial_data_n_splits=vo.DATASET.PARTIAL_DATA_N_SPLITS,
                shard_index=shard_index, num_shards=num_shards,
            )
            workers = int(vo.TRAIN.get("decode_workers", 0))
            if shard_by_process and workers > 0:
                # process-parallel chunk decode for the TRAIN loop (the
                # reference's DataLoader num_workers); eval keeps the serial
                # reader and its exact-count/ordering contracts
                from pointnav_vo_tpu.vo.parallel_reader import (
                    ParallelDecodeReader,
                )

                return ParallelDecodeReader(kwargs, num_workers=workers)
            return FramePairReader(**kwargs)

        train_path = vo.DATASET.get("TRAIN_WITH_NOISE") or vo.DATASET.get("TRAIN")
        eval_path = vo.DATASET.get("EVAL_WITH_NOISE") or vo.DATASET.get("EVAL")
        init_per_expert = None
        if vo.MODEL.pretrained and vo.MODEL.pretrained_ckpt:
            init_per_expert = [
                load_vo_checkpoint(vo.MODEL.pretrained_ckpt[name], ACT_NAME2IDX[name])
                for name in ("forward", "left", "right")
                if name in vo.MODEL.pretrained_ckpt
            ]
        self.engine = VORegressionEngine(
            self.icfg, self.tcfg,
            train_reader=(reader(train_path, shard_by_process=True)
                          if run_type == "train" else None),
            eval_reader=reader(eval_path),
            mesh=mesh,
            log_dir=config.get("LOG_DIR"),
            init_variables_per_expert=init_per_expert,
        )
        if self._resume_meta is not None:
            self.engine.load_ckpt(config.RESUME_STATE_FILE)
        if "eval" in run_type and config.EVAL.EVAL_WITH_CKPT:
            self.engine.load_ckpt(self._eval_ckpt)

    def _save_ckpt(self, epoch: int, writer=None) -> None:
        path = os.path.join(self.config.CHECKPOINT_FOLDER, f"ckpt_epoch_{epoch}.pkl")
        self.engine.save_ckpt(
            path, extra_metadata={"full_config": self.config.to_dict()},
            writer=writer,
        )

    def train(self):
        from pointnav_vo_tpu.io.checkpoint import AsyncCheckpointWriter
        from pointnav_vo_tpu.utils import preemption

        preemption.install_signal_handlers()
        cfg = self.config
        # epoch checkpoints serialize + hit disk under the NEXT epoch's
        # compute; wait() before any requeue/return makes them durable
        with AsyncCheckpointWriter() as ckpt_writer, \
                TensorboardWriter(cfg.get("TENSORBOARD_DIR")) as tb:
            while self.engine.epoch < self.tcfg.epochs:
                if preemption.should_exit():
                    # full resumable state + requeue (ddp_utils.py:58-110).
                    # A deferred write error from an earlier periodic ckpt
                    # must not block the interrupted-state save + requeue.
                    err = ckpt_writer.drain_quietly()
                    if err is not None:
                        self.logger.error(
                            f"earlier async checkpoint write failed: {err!r}")
                    self.engine.save_ckpt(preemption.interrupted_state_path())
                    preemption.requeue_job()
                    self.logger.info("preempted: interrupted state saved")
                    return
                stats = self.engine.train_epoch()
                if self.engine.eval_reader is not None:
                    stats.update({f"eval_{k}": v for k, v in self.engine.evaluate().items()})
                epoch = self.engine.epoch
                for k, v in stats.items():
                    if np.isscalar(v) or (hasattr(v, "ndim") and v.ndim == 0):
                        tb.add_scalar(f"train/{k}", float(v), epoch)
                if self.tcfg.log_grad and tb.writer is not None:
                    # per-parameter gradient histograms (reference _log_grad,
                    # vo_cnn_engine.py:230-262), one backward pass per epoch
                    import jax as _jax

                    for path, leaf in _jax.tree_util.tree_flatten_with_path(
                            self.engine.grad_snapshot())[0]:
                        name = "/".join(str(getattr(p, "key", p)) for p in path)
                        tb.add_histogram(f"grad/{name}", np.asarray(leaf), epoch)
                if tb.writer is not None and cfg.VO.TRAIN.get("log_imgs", True):
                    # first-sample preprocessed channels (engine:1364-1423)
                    obs0 = self.engine.obs_snapshot()
                    if "rgb" in obs0:
                        tb.add_image("prev_obs/rgb", obs0["rgb"][..., :3] / 255.0,
                                     epoch, dataformats="HWC")
                        tb.add_image("cur_obs/rgb", obs0["rgb"][..., 3:] / 255.0,
                                     epoch, dataformats="HWC")
                    if "depth" in obs0:
                        tb.add_image("prev_obs/depth", obs0["depth"][..., 0],
                                     epoch, dataformats="HW")
                        tb.add_image("cur_obs/depth", obs0["depth"][..., 1],
                                     epoch, dataformats="HW")
                    if "top_down_view" in obs0:
                        tb.add_image("prev_obs/top_down_view",
                                     obs0["top_down_view"][..., 0], epoch,
                                     dataformats="HW")
                        tb.add_image("cur_obs/top_down_view",
                                     obs0["top_down_view"][..., 1], epoch,
                                     dataformats="HW")
                append_jsonl({"epoch": epoch, **{k: v for k, v in stats.items()
                                                 if np.isscalar(v)}},
                             os.path.join(cfg.INFO_DIR, "train_infos.jsonl"))
                save_info_dict({k: [v] for k, v in stats.items() if np.isscalar(v)},
                               os.path.join(cfg.INFO_DIR, "train_regression_info.p"))
                self._save_ckpt(epoch, writer=ckpt_writer)
                self.logger.info(f"epoch {epoch}: loss={stats.get('mean_total_loss'):.5f} "
                                 f"fps={stats.get('frame_pairs_per_s'):.1f}")

    def eval(self):
        save = None
        if self.config.VO.EVAL.save_pred:
            save = os.path.join(self.config.INFO_DIR, "delta_gt_pred.p")
        metrics = self.engine.evaluate(save_pred_path=save)
        save_info_dict({k: [v] for k, v in metrics.items()},
                       os.path.join(self.config.INFO_DIR, "eval_regression_info.p"))
        self.logger.info(f"VO eval: {metrics}")
        return metrics


# ---------------------------------------------------------------------------
# RL trainer adapters
# ---------------------------------------------------------------------------


def _build_classical_vo_fn(config: Config):
    """vo_fn for ``VO.VO_TYPE: CLASSICAL`` — the paper's non-learned
    baseline as a first-class backend (the reference ships only the
    geometry, geometry_utils.py:831-865, and raises NotImplementedError at
    dispatch, base_trainer_with_vo.py:311-313)."""
    from pointnav_vo_tpu.vo.classical import make_classical_vo_fn

    sim = config.TASK_CONFIG.SIMULATOR
    return make_classical_vo_fn(
        hfov_deg=sim.DEPTH_SENSOR.HFOV,
        min_depth=sim.DEPTH_SENSOR.MIN_DEPTH,
        max_depth=sim.DEPTH_SENSOR.MAX_DEPTH,
        forward_step=sim.get("FORWARD_STEP_SIZE", 0.25),
        turn_angle_deg=sim.TURN_ANGLE,
    )


def _build_vo_ensemble(config: Config) -> Optional[VOEnsemble]:
    vo = config.VO
    if not vo.get("USE_VO_MODEL", False):
        return None
    if vo.get("VO_TYPE", "REGRESS") != "REGRESS":
        return None  # classical backend rides the vo_fn hook instead
    icfg = vo_inference_config_from(config, vo.REGRESS_MODEL)
    node = vo.REGRESS_MODEL
    if node.pretrained and node.all_pretrained_ckpt:
        paths = node.all_pretrained_ckpt[node.pretrained_type]
        if all(str(p).endswith(".pth") for p in paths.values()):
            return VOEnsemble.from_torch_checkpoints(icfg, paths)
        # native checkpoints: one file with stacked expert variables
        model = icfg.make_model()
        per = []
        for name in ("forward", "left", "right"):
            tree, _ = load_checkpoint(paths[name])
            per.append(tree["variables"] if "variables" in tree else tree)
        return VOEnsemble(icfg, stack_expert_variables(per))
    # untrained ensemble (e.g. smoke tests)
    model = icfg.make_model()
    h, w = icfg.vis_size_h, icfg.vis_size_w
    dummy = {
        "rgb": jnp.zeros((1, h, w, 6)), "depth": jnp.zeros((1, h, w, 2)),
        "discretized_depth": jnp.zeros((1, h, w, 2 * icfg.discretized_depth_channels)),
        "top_down_view": jnp.zeros((1, h, w, 2)),
    }
    per = [model.init(jax.random.PRNGKey(i), dummy, train=False) for i in range(3)]
    return VOEnsemble(icfg, stack_expert_variables(per))


class _BaseRLEngine:
    def __init__(self, config: Config, run_type: str = "train",
                 noisy: bool = True, mesh=None):
        self.config = config
        self.run_type = run_type
        self.noisy = noisy
        self.mesh = mesh
        self.logger = get_logger(log_file=config.get("LOG_FILE"))
        self.model = registry.get_policy(config.RL.Policy.name)(config)
        self.ppo_cfg = PPOConfig(
            clip_param=config.RL.PPO.clip_param,
            ppo_epoch=config.RL.PPO.ppo_epoch,
            num_mini_batch=config.RL.PPO.num_mini_batch,
            value_loss_coef=config.RL.PPO.value_loss_coef,
            entropy_coef=config.RL.PPO.entropy_coef,
            lr=config.RL.PPO.lr,
            eps=config.RL.PPO.eps,
            max_grad_norm=config.RL.PPO.max_grad_norm,
            num_steps=config.RL.PPO.num_steps,
            use_gae=config.RL.PPO.use_gae,
            gamma=config.RL.PPO.gamma,
            tau=config.RL.PPO.tau,
            use_linear_lr_decay=config.RL.PPO.use_linear_lr_decay,
            use_normalized_advantage=config.RL.PPO.use_normalized_advantage,
            hidden_size=config.RL.PPO.hidden_size,
            reward_window_size=config.RL.PPO.reward_window_size,
        )

    def _make_envs(self):
        return registry.get_env(self.config.ENV_NAME)(
            self.config, self.config.NUM_PROCESSES,
            seed=self.config.SEED, noisy=self.noisy,
        )

    def train(self):
        cfg = self.config
        envs = self._make_envs()
        # always release the env fan-out: the shm backend forks
        # NUM_PROCESSES workers + shm segments per call and daemonized
        # children only die at interpreter exit — a leak under sweeps
        try:
            return self._train_with_envs(cfg, envs)
        finally:
            envs.close()

    def _train_with_envs(self, cfg, envs):
        vo = _build_vo_ensemble(cfg) if cfg.RL.TUNE_WITH_VO else None
        trainer = DDPPOTrainer(
            model=self.model, ppo_cfg=self.ppo_cfg, envs=envs,
            rng=jax.random.PRNGKey(cfg.SEED), vo_ensemble=vo, mesh=self.mesh,
            total_updates=cfg.NUM_UPDATES,
            reward_window_size=self.ppo_cfg.reward_window_size,
        )
        start_update = 0
        if cfg.RESUME_TRAIN and os.path.isfile(cfg.RESUME_STATE_FILE):
            # resume from an interrupted/periodic checkpoint
            # (ddppo_trainer.py:323-391 requeue_stats path)
            try:
                tree, meta = load_checkpoint(
                    cfg.RESUME_STATE_FILE,
                    {"params": trainer.params, "opt_state": trainer.opt_state,
                     "extra_variables": trainer.variables},
                )
            except ValueError:
                # pre-upgrade state file without extra_variables: restore
                # params/opt only, keep the fresh whitening buffers
                tree, meta = load_checkpoint(
                    cfg.RESUME_STATE_FILE,
                    {"params": trainer.params, "opt_state": trainer.opt_state},
                )
            trainer.params = tree["params"]
            trainer.opt_state = tree["opt_state"]
            trainer.variables = dict(tree.get("extra_variables", trainer.variables))
            start_update = int(meta.get("update", 0))
            trainer.count_steps = int(meta.get("count_steps", 0))
            trainer.update_idx = start_update
            self.logger.info(f"resumed from {cfg.RESUME_STATE_FILE} @ update {start_update}")
        from pointnav_vo_tpu.io.checkpoint import AsyncCheckpointWriter
        from pointnav_vo_tpu.utils import preemption

        preemption.install_signal_handlers()
        with AsyncCheckpointWriter() as ckpt_writer, \
                TensorboardWriter(cfg.get("TENSORBOARD_DIR")) as tb:
            for update in range(start_update, cfg.NUM_UPDATES):
                if preemption.should_exit():
                    err = ckpt_writer.drain_quietly()
                    if err is not None:
                        self.logger.error(
                            f"earlier async checkpoint write failed: {err!r}")
                    preemption.save_interrupted_state(
                        {"params": trainer.params, "opt_state": trainer.opt_state,
                         "extra_variables": trainer.variables},
                        metadata={"full_config": cfg.to_dict(), "update": update,
                                  "count_steps": trainer.count_steps},
                    )
                    preemption.requeue_job()
                    self.logger.info("preempted: interrupted state saved")
                    return trainer
                trainer.collect_rollout()
                stats = trainer.update_agent()
                if update % cfg.LOG_INTERVAL == 0:
                    for k, v in stats.items():
                        tb.add_scalar(f"train/{k}", float(v), update)
                    tb.add_scalar("Simulation/FPS",
                                  trainer.count_steps / max(sum(trainer.timing.values()), 1e-9),
                                  update)
                    self.logger.info(f"update {update}: {stats} timing={trainer.timing}")
                if update % cfg.CHECKPOINT_INTERVAL == 0:
                    path = os.path.join(
                        cfg.CHECKPOINT_FOLDER,
                        f"ckpt_{update // cfg.CHECKPOINT_INTERVAL}.update_{update}."
                        f"frames_{trainer.count_steps}.pkl",
                    )
                    ckpt_writer.save(
                        path,
                        # full variables: params + whitening batch_stats etc,
                        # so rgb policies restore their RunningMeanAndVar
                        # buffers (torch state_dict parity)
                        {"params": trainer.params, "opt_state": trainer.opt_state,
                         "extra_variables": trainer.variables},
                        metadata={
                            "full_config": cfg.to_dict(),
                            "engine_name": cfg.ENGINE_NAME,
                            "update": update,
                            "count_steps": trainer.count_steps,
                        },
                    )
        return trainer

    def eval(self, ckpt_path: Optional[str] = None, num_episodes: Optional[int] = None):
        """Single checkpoint or a full sweep over a checkpoint folder
        (reference BaseRLTrainer.eval, base_trainer.py:76-153)."""
        cfg = self.config
        ckpt_path = ckpt_path or cfg.EVAL.EVAL_CKPT_PATH
        if ckpt_path and os.path.isdir(ckpt_path):
            import time as _time

            results = {}
            # eval-during-training: keep polling the folder for checkpoints
            # the trainer hasn't written yet until WAIT_FOR_CKPTS of them
            # have been evaluated (base_trainer.py:76-153's companion-eval
            # driver); 0 = one-shot sweep of what exists now
            target = int(cfg.EVAL.get("WAIT_FOR_CKPTS", 0) or 0)
            poll_s = float(cfg.EVAL.get("CKPT_POLL_INTERVAL_S", 2.0))
            # staleness guard (ADVICE r4): if the training job dies before
            # producing `target` checkpoints, don't poll forever — give up
            # after this long with zero new checkpoints (0 = wait forever)
            stale_timeout_s = float(
                cfg.EVAL.get("CKPT_STALE_TIMEOUT_S", 3600.0))
            last_progress_t = _time.monotonic()
            # f -> (mtime, size, attempts): a file that keeps failing while
            # its bytes stay put is corrupt, not mid-write — give up on it
            # after a few stable retries or the poll loop livelocks forever
            fail_state: Dict[str, tuple] = {}
            abandoned: set = set()
            while True:
                # only real checkpoints: a leftover .tmp from an interrupted
                # atomic save or a stray log must not abort the whole sweep
                files = [
                    f for f in os.listdir(ckpt_path)
                    if f.startswith("ckpt") and f.endswith((".pkl", ".pth"))
                    and f not in results and f not in abandoned
                ]
                for f in sorted(files, key=lambda f: os.path.getmtime(
                        os.path.join(ckpt_path, f))):
                    p = os.path.join(ckpt_path, f)
                    try:
                        results[f] = self._eval_checkpoint(p, num_episodes)
                        fail_state.pop(f, None)
                    except (OSError, pickle.UnpicklingError, EOFError) as e:
                        # unreadable now but possibly mid-write: retry on the
                        # next poll rather than marking it done
                        results.pop(f, None)
                        try:
                            st = os.stat(p)
                            sig = (st.st_mtime, st.st_size)
                        except OSError:
                            continue  # deleted between listdir and stat
                        prev = fail_state.get(f)
                        attempts = prev[2] + 1 if prev and prev[:2] == sig else 1
                        fail_state[f] = (*sig, attempts)
                        if attempts >= 3:
                            abandoned.add(f)
                            self.logger.error(
                                f"abandoning unreadable checkpoint {p} after "
                                f"{attempts} retries with stable mtime/size: {e}")
                        else:
                            self.logger.warning(
                                f"skipping unreadable checkpoint {p} (retry "
                                f"{attempts}): {e}")
                # abandoned files count toward the exit condition so one
                # corrupt checkpoint can't stall the companion-eval forever
                done_count = len(results) + len(abandoned)
                if done_count >= target or target <= 0:
                    break
                if files:
                    last_progress_t = _time.monotonic()
                elif (stale_timeout_s > 0
                      and _time.monotonic() - last_progress_t > stale_timeout_s):
                    self.logger.error(
                        f"giving up on checkpoint folder {ckpt_path}: no new "
                        f"checkpoints for {stale_timeout_s:.0f}s with "
                        f"{done_count}/{target} evaluated — is the training "
                        "job alive? (EVAL.CKPT_STALE_TIMEOUT_S; 0 disables)")
                    break
                _time.sleep(poll_s)
            return results
        return self._eval_checkpoint(ckpt_path, num_episodes)

    def _merged_eval_config(self, ckpt_path: Optional[str]) -> Config:
        """Reference _setup_eval_config merge priority
        ``eval_opts > ckpt_opts > eval_cfg > ckpt_cfg``
        (base_trainer.py:319-356): start from the checkpoint's stored config,
        overlay the live eval config, then replay the checkpoint's stored CLI
        trailing opts, then the live run's trailing opts; finally never eval
        on the train split."""
        cfg = self.config
        if not (ckpt_path and os.path.isfile(ckpt_path) and not ckpt_path.endswith(".pth")):
            return cfg
        _, meta = load_checkpoint(ckpt_path)
        if "full_config" not in meta:
            return cfg
        merged = Config(meta["full_config"])                    # ckpt_cfg
        ckpt_opts = list(merged.get("CMD_TRAILING_OPTS", []) or [])
        merged.merge_from_dict(cfg.to_dict())                   # eval_cfg
        try:
            merged.merge_from_list(ckpt_opts)                   # ckpt_opts
        except (KeyError, ValueError):
            pass  # stored opts reference outdated keys: skip, like the ref
        merged.merge_from_list(list(cfg.get("CMD_TRAILING_OPTS", []) or []))
        if merged.TASK_CONFIG.DATASET.SPLIT == "train":
            merged.TASK_CONFIG.DATASET.SPLIT = "val"
        return merged

    def _eval_checkpoint(self, ckpt_path: Optional[str], num_episodes: Optional[int] = None):
        cfg = self._merged_eval_config(ckpt_path)
        envs = self._make_envs()
        # fresh envs per checkpoint; close them or a sweep over K
        # checkpoints leaks K x NUM_PROCESSES shm workers
        try:
            return self._eval_ckpt_with_envs(cfg, ckpt_path, num_episodes, envs)
        finally:
            envs.close()

    def _eval_ckpt_with_envs(self, cfg, ckpt_path, num_episodes, envs):
        variables = None
        if ckpt_path and os.path.isfile(ckpt_path):
            if ckpt_path.endswith(".pth"):
                from pointnav_vo_tpu.io.torch_import import load_policy_checkpoint

                loaded = load_policy_checkpoint(ckpt_path)
                variables = {"params": loaded["params"]}
                if loaded["batch_stats"]:
                    variables["batch_stats"] = loaded["batch_stats"]
            else:
                tree, _ = load_checkpoint(ckpt_path)
                variables = {"params": tree["params"],
                             **tree.get("extra_variables", {})}
        if variables is None:
            obs0 = envs.reset()
            dummy = {k: jnp.asarray(v[:1]) for k, v in obs0.items()}
            variables = self.model.init(
                jax.random.PRNGKey(0), dummy, self.model.initial_hidden(1),
                jnp.zeros((1, 1), jnp.int32), jnp.zeros((1, 1)),
            )

        vo = _build_vo_ensemble(cfg)
        vo_fn = None
        if (cfg.VO.get("USE_VO_MODEL", False)
                and cfg.VO.get("VO_TYPE", "REGRESS") == "CLASSICAL"):
            vo_fn = _build_classical_vo_fn(cfg)
        evaluator = Evaluator(
            model=self.model, variables=variables, envs=envs, vo_ensemble=vo,
            vo_fn=vo_fn,
            deterministic=True, rng=jax.random.PRNGKey(cfg.SEED),
            mesh=self.mesh,
        )
        n = num_episodes or (cfg.EVAL.TEST_EPISODE_COUNT
                             if cfg.EVAL.TEST_EPISODE_COUNT > 0 else 100)
        video_episodes = 3 if ("disk" in cfg.get("VIDEO_OPTION", [])) else 0
        ranked_dir = (os.path.join(cfg.INFO_DIR, "ranked_imgs")
                      if cfg.EVAL.get("SAVE_RANKED_IMGS") else None)
        t0 = time.perf_counter()
        metrics = evaluator.run(
            n,
            video_dir=cfg.get("VIDEO_DIR") if video_episodes else None,
            video_episodes=video_episodes,
            ranked_img_dir=ranked_dir,
            rank_top_k=cfg.EVAL.get("RANK_TOP_K", 20),
        )
        metrics["wall_clock_s"] = time.perf_counter() - t0
        save_info_dict({k: [v] for k, v in metrics.items()},
                       os.path.join(cfg.INFO_DIR, "eval_infos.p"))
        # per-episode result list next to the aggregates — the reference
        # persists current_episode_result as {ckpt}.infos.p per checkpoint
        # (base_trainer.py:139-148), the raw material for ranked
        # post-processing and offline analysis
        import dataclasses as _dc

        per_episode = [_dc.asdict(r) for r in evaluator.results]
        stem = (os.path.splitext(os.path.basename(ckpt_path))[0]
                if ckpt_path else "eval")
        with open(os.path.join(cfg.INFO_DIR, f"{stem}.infos.p"), "wb") as f:
            pickle.dump(per_episode, f)
        self.logger.info(f"eval: {metrics}")
        return metrics


@registry.register_trainer(name="efficient_ddppo")
class EfficientDDPPOEngine(_BaseRLEngine):
    pass


@registry.register_trainer(name="ppo")
class PPOEngine(_BaseRLEngine):
    pass


# VO model namespace: expose the zoo through the registry like the reference
from pointnav_vo_tpu.models.vo_cnn import VO_MODEL_NAMES, make_vo_model  # noqa: E402

for _name in VO_MODEL_NAMES:
    registry.register_vo_model(name=_name)(
        (lambda n: (lambda **kw: make_vo_model(n, **kw)))(_name)
    )
