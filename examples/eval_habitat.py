#!/usr/bin/env python
"""One command from a habitat install to the reference's 994-episode eval.

The reference's Reproduce section (README.md:69-100) evaluates the published
checkpoints on the 994 Gibson-val episodes in ~4.5 h.  This script is the
same run on this framework: habitat-sim process workers feed the shm rings,
the policy + 3-expert VO run as one fused TPU mega-step per env batch, and
the exact-episode-set protocol counts precisely the dataset's episodes.

Preflight checks (fail fast with actionable messages, not 20 minutes into
scene loads): habitat import, Gibson data layout, published-checkpoint
presence + convertibility (io/torch_import round-trips each .pth).  See
docs/HABITAT_RUNBOOK.md for the install + data checklist.

Usage (defaults reproduce the reference exactly):
  python examples/eval_habitat.py                       # rl_tune_vo.pth, 994 eps
  python examples/eval_habitat.py --no-tune             # rl_no_tune.pth row
  python examples/eval_habitat.py --episodes 50 --envs 4  # smoke
  python examples/eval_habitat.py --preflight-only      # checks, no eval

This box has no habitat-sim, so this script has only ever run to the end of
--preflight-only here; the eval path it drives is the same Evaluator/engine
code the scripted-world and fake-habitat contract tests cover
(tests/test_eval_backend_contract.py, tests/test_habitat_adapter.py).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE_EVAL_MIN = 4.5 * 60  # reference README.md:84


def preflight(args) -> dict:
    """Verify every external dependency of the run; return a report dict."""
    report = {}

    # 1. habitat import (the adapter consumes get_config/Env/make_dataset)
    try:
        import habitat  # noqa: F401

        report["habitat"] = getattr(habitat, "__version__", "unknown")
    except ImportError as e:
        raise SystemExit(
            f"habitat-lab is not importable ({e}).\n"
            "Install habitat-sim + habitat-lab per docs/HABITAT_RUNBOOK.md "
            "step 1 (the reference pins habitat-lab 0.1.5 / "
            "habitat-sim 0.1.5 with the noise models built in).")

    # 2. Gibson PointNav v2 val split where the DATASET config points
    data_path = args.data_path.format(split=args.split)
    if not os.path.isfile(data_path):
        raise SystemExit(
            f"dataset file missing: {data_path}\n"
            "Expected the Gibson PointNav v2 layout of reference "
            "README.md:44-66 (dataset/pointnav/gibson/v2/val/val.json.gz). "
            "See docs/HABITAT_RUNBOOK.md step 2.")
    report["dataset"] = data_path
    scene_dir = args.scene_dir
    if scene_dir and not os.path.isdir(scene_dir):
        raise SystemExit(
            f"scene directory missing: {scene_dir} (Gibson .glb scenes; "
            "HABITAT_RUNBOOK.md step 2)")

    # 3. published checkpoints: present AND convertible (shape-checked
    #    against this framework's modules, not just unpicklable)
    from pointnav_vo_tpu.io.torch_import import (
        load_policy_checkpoint,
        load_vo_checkpoint,
    )

    rl_ckpt = args.rl_ckpt
    if not os.path.isfile(rl_ckpt):
        raise SystemExit(
            f"RL checkpoint missing: {rl_ckpt}\n"
            "Download pretrained_ckpts from the reference README.md:70 "
            "drive link (HABITAT_RUNBOOK.md step 3).")
    loaded = load_policy_checkpoint(rl_ckpt)
    report["rl_ckpt"] = {"path": rl_ckpt,
                         "params": sum(x.size for x in _leaves(loaded["params"]))}
    from pointnav_vo_tpu.common import MOVE_FORWARD, TURN_LEFT, TURN_RIGHT

    # published containers key model_states by action id
    # (base_trainer_with_vo.py:92-99): act_forward.pth -> {1},
    # act_left_right_inv_joint.pth -> {2, 3}
    for name, path, indices in (
            ("forward", args.vo_forward_ckpt, (MOVE_FORWARD,)),
            ("left_right", args.vo_turn_ckpt, (TURN_LEFT, TURN_RIGHT))):
        if not os.path.isfile(path):
            raise SystemExit(f"VO checkpoint missing: {path} "
                             "(HABITAT_RUNBOOK.md step 3)")
        for idx in indices:
            vo = load_vo_checkpoint(path, act_idx=idx)
            report.setdefault("vo_ckpts", {})[f"{name}[{idx}]"] = {
                "path": path,
                "params": sum(x.size for x in _leaves(vo["params"])),
            }

    # 4. one TPU (or whatever jax backend is present) answers
    import jax

    report["jax_devices"] = [str(d) for d in jax.devices()]
    return report


def _leaves(tree):
    import jax

    return jax.tree.leaves(tree)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--episodes", type=int, default=994,
                    help="994 = the full Gibson-val set (reference README:84)")
    ap.add_argument("--envs", type=int, default=16,
                    help="habitat-sim process workers (each ~1.5 GB RSS; "
                         "size to the host)")
    ap.add_argument("--split", default="val")
    ap.add_argument("--data-path", default=(
        "dataset/habitat_datasets/pointnav/gibson/v2/{split}/{split}.json.gz"))
    ap.add_argument("--scene-dir", default="dataset/Gibson",
                    help="SCENES_DIR: episode scene_ids (gibson/<Scene>.glb) "
                         "resolve relative to this")
    ap.add_argument("--rl-ckpt",
                    default="pretrained_ckpts/rl/tune_vo/rl_tune_vo.pth")
    ap.add_argument("--no-tune", action="store_true",
                    help="evaluate rl_no_tune.pth instead (the reference "
                         "table's untuned row)")
    ap.add_argument("--vo-forward-ckpt",
                    default="pretrained_ckpts/vo/act_forward.pth")
    ap.add_argument("--vo-turn-ckpt",
                    default="pretrained_ckpts/vo/act_left_right_inv_joint.pth")
    ap.add_argument("--mode", choices=("det", "rnd"), default="det",
                    help="rnd = the reference's rnd_mode_n=10 dropout "
                         "uncertainty ensemble (ddppo_pointnav.yaml:119)")
    ap.add_argument("--noise", type=int, default=1,
                    help="Challenge-2020 actuation/RGB/depth noise (the "
                         "reference's --noise 1)")
    ap.add_argument("--video", action="store_true")
    ap.add_argument("--preflight-only", action="store_true")
    ap.add_argument("--out", default=os.path.join(REPO, "EVAL_HABITAT.json"))
    args = ap.parse_args()
    if args.no_tune:
        args.rl_ckpt = "pretrained_ckpts/rl/no_tune/rl_no_tune.pth"

    # before the first jax touch (preflight probes jax.devices()): the
    # compile cache + the PNVO_FORCE_CPU escape hatch both live here
    from pointnav_vo_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    report = preflight(args)
    print("preflight ok:", json.dumps(report, indent=2, default=str),
          flush=True)
    if args.preflight_only:
        return

    from pointnav_vo_tpu.config.defaults import get_rl_config
    from pointnav_vo_tpu.utils import registry
    import pointnav_vo_tpu.engines  # noqa: F401 — populates the registry

    # the stock RL eval config with the habitat backend + this run's paths;
    # every other knob (Challenge-2020 noise, sensors at 341x192, VO model
    # zoo settings) already carries the reference values
    cfg = get_rl_config(
        [os.path.join(REPO, "configs/rl/ddppo_pointnav.yaml")],
        [
            "ENV_BACKEND", "habitat",
            "NUM_PROCESSES", str(args.envs),
            "EVAL.TEST_EPISODE_COUNT", str(args.episodes),
            "EVAL.EVAL_CKPT_PATH", args.rl_ckpt,
            "VO.REGRESS_MODEL.mode", args.mode,
            "VO.REGRESS_MODEL.all_pretrained_ckpt."
            "rgb_d_dd_top_down_inv_joint.forward", args.vo_forward_ckpt,
            "VO.REGRESS_MODEL.all_pretrained_ckpt."
            "rgb_d_dd_top_down_inv_joint.left", args.vo_turn_ckpt,
            "VO.REGRESS_MODEL.all_pretrained_ckpt."
            "rgb_d_dd_top_down_inv_joint.right", args.vo_turn_ckpt,
            "TASK_CONFIG.DATASET.DATA_PATH", args.data_path,
            "TASK_CONFIG.DATASET.SPLIT", args.split,
            "TASK_CONFIG.DATASET.SCENES_DIR", args.scene_dir,
        ] + (["VIDEO_OPTION", "['disk']"] if args.video else []),
    )
    engine_cls = registry.get_trainer(cfg.ENGINE_NAME)
    engine = engine_cls(cfg, run_type="eval", noisy=bool(args.noise))

    t0 = time.perf_counter()
    metrics = engine.eval(ckpt_path=args.rl_ckpt,
                          num_episodes=args.episodes)
    wall_min = (time.perf_counter() - t0) / 60

    out = {
        "protocol": "reference Reproduce run (README.md:69-100): published "
                    "checkpoints, Gibson-val, Challenge-2020 noise",
        "episodes": args.episodes,
        "envs": args.envs,
        "rl_ckpt": args.rl_ckpt,
        "vo_mode": args.mode,
        "noise": bool(args.noise),
        "wall_clock_min": wall_min,
        "vs_reference_min": REFERENCE_EVAL_MIN,
        "metrics": {k: float(v) for k, v in metrics.items()},
        "preflight": report,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2, default=str)
    print(f"\n{args.episodes} episodes in {wall_min:.1f} min "
          f"({REFERENCE_EVAL_MIN / max(wall_min, 1e-9):.1f}x vs reference)")
    print(f"success {metrics.get('success', float('nan')):.3f} | "
          f"spl {metrics.get('spl', float('nan')):.3f} | "
          f"softspl {metrics.get('softspl', float('nan')):.3f}")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
