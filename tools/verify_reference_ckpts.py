#!/usr/bin/env python
"""Verify the reference's published checkpoints convert and match exactly.

The reference ships three artifacts (reference README.md:70-81):
  pretrained_ckpts/vo/act_forward.pth            (model_states[1] container)
  pretrained_ckpts/vo/act_left_right_inv_joint.pth (model_states[2]/[3])
  pretrained_ckpts/rl/.../rl_tune_vo.pth         (state_dict container)

For each file that exists this tool:
  1. converts it with io/torch_import (both container layouts,
     base_trainer_with_vo.py:92-99);
  2. runs fixed seeded inputs through our flax forward;
  3. if a reference clone is available (--reference-root, default
     $POINTNAV_VO_REFERENCE_ROOT or /root/reference), loads the same weights
     into reference-shaped torch modules and asserts the outputs match to
     float tolerance — the end-to-end guarantee that the published weights
     produce identical VO deltas / policy logits in this framework.

Missing files SKIP gracefully.  ``--self-test`` synthesizes random
reference-shaped .pth files in both container layouts and runs the full
pipeline against them — committed proof the tool works without the
(undistributable) published weights.

A JSON report is written to --report (default PARITY_CKPTS.json).

Usage:
  python tools/verify_reference_ckpts.py \
      --act-forward pretrained_ckpts/vo/act_forward.pth \
      --act-left-right pretrained_ckpts/vo/act_left_right_inv_joint.pth \
      --rl-tune-vo pretrained_ckpts/rl/tune_vo/rl_tune_vo.pth
  python tools/verify_reference_ckpts.py --self-test
"""

import argparse
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import numpy as np  # noqa: E402

VO_OBS_SPACE = ("rgb", "depth", "discretized_depth", "top_down_view")
W, H = 341, 192
ATOL = 5e-4  # float32 conv stacks at full res, torch-CPU vs XLA


def _fixed_vo_obs(batch=2, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "rgb": rng.uniform(0, 255, (batch, H, W, 6)).astype(np.float32),
        "depth": rng.uniform(0, 1, (batch, H, W, 2)).astype(np.float32),
        "discretized_depth": rng.integers(0, 2, (batch, H, W, 20)).astype(np.float32),
        "top_down_view": rng.uniform(0, 1, (batch, H, W, 2)).astype(np.float32),
    }


def _fixed_policy_obs(batch=2, seed=1):
    rng = np.random.default_rng(seed)
    return {
        "depth": rng.uniform(0, 1, (batch, H, W, 1)).astype(np.float32),
        "pointgoal_with_gps_compass": rng.normal(size=(batch, 2)).astype(np.float32),
    }


def _torch_oracles(reference_root):
    """Reference-shaped torch modules, or None when no clone is available."""
    if not os.path.isdir(os.path.join(reference_root, "pointnav_vo")):
        return None
    os.environ["POINTNAV_VO_REFERENCE_ROOT"] = reference_root
    sys.path.insert(0, os.path.join(_REPO, "tests"))
    import _torch_ref

    return _torch_ref


def _flax_vo_forward(variables, obs):
    import jax
    import jax.numpy as jnp

    from pointnav_vo_tpu.models.vo_cnn import make_vo_model

    model = make_vo_model(
        "vo_cnn_rgb_d_dd_top_down", observation_space=VO_OBS_SPACE,
        observation_size=(W, H), discretized_depth_channels=10,
    )
    out = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jax.tree.map(jnp.asarray, obs), train=False)
    return np.asarray(out)


def verify_vo(path, act_indices, oracle_mod, results):
    """act_indices: {expert_name: model_states index} for this file."""
    from pointnav_vo_tpu.io.torch_import import (
        load_torch_checkpoint,
        load_vo_checkpoint,
    )

    name = os.path.basename(path)
    if not os.path.isfile(path):
        results[name] = {"status": "SKIP", "reason": "file not found"}
        print(f"SKIP {name}: not found")
        return
    obs = _fixed_vo_obs()
    entry = {"status": "PASS", "experts": {}}
    for expert, idx in act_indices.items():
        variables = load_vo_checkpoint(path, act_idx=idx)
        ours = _flax_vo_forward(variables, obs)
        rec = {"delta_sample0": ours[0].tolist()}
        if oracle_mod is not None:
            import torch

            tm = oracle_mod.TorchVOModel(VO_OBS_SPACE, (W, H), dd_channels=10)
            ckpt = load_torch_checkpoint(path)
            sd = (ckpt["model_states"][idx] if "model_states" in ckpt
                  else ckpt.get("model_state", ckpt))
            tm.load_state_dict(sd)
            tm.eval()
            with torch.no_grad():
                want = tm({k: torch.tensor(v) for k, v in obs.items()}).numpy()
            diff = float(np.abs(ours - want).max())
            rec["torch_max_abs_diff"] = diff
            rec["torch_match"] = bool(diff < ATOL)
            if diff >= ATOL:
                entry["status"] = "FAIL"
        entry["experts"][expert] = rec
    results[name] = entry
    print(f"{entry['status']} {name}: " + ", ".join(
        f"{e}[{r.get('torch_max_abs_diff', 'no-oracle')}]"
        for e, r in entry["experts"].items()))


def verify_policy(path, oracle_mod, results):
    from pointnav_vo_tpu.io.torch_import import (
        load_policy_checkpoint,
        load_torch_checkpoint,
    )

    name = os.path.basename(path)
    if not os.path.isfile(path):
        results[name] = {"status": "SKIP", "reason": "file not found"}
        print(f"SKIP {name}: not found")
        return
    import jax
    import jax.numpy as jnp

    from pointnav_vo_tpu.models.policy import PointNavActorCritic

    variables = load_policy_checkpoint(path)
    model = PointNavActorCritic(image_size=(H, W))
    obs = _fixed_policy_obs()
    n = obs["depth"].shape[0]
    hidden = np.random.default_rng(2).normal(
        size=(4, n, 512)).astype(np.float32)
    prev = np.zeros((n, 1), np.int32)
    masks = np.ones((n, 1), np.float32)
    logits, value, new_h = model.apply(
        {"params": variables["params"]}, jax.tree.map(jnp.asarray, obs),
        jnp.asarray(hidden), jnp.asarray(prev), jnp.asarray(masks))
    entry = {"status": "PASS", "logits_sample0": np.asarray(logits)[0].tolist()}
    if oracle_mod is not None:
        import torch

        tm = oracle_mod.TorchActorCritic((H, W))
        ckpt = load_torch_checkpoint(path)
        sd = ckpt.get("state_dict", ckpt)
        # the published RL checkpoints prefix module names with "actor_critic."
        sd = {k.split("actor_critic.", 1)[-1]: v for k, v in sd.items()}
        tm.load_state_dict(sd, strict=False)
        tm.eval()
        with torch.no_grad():
            want_l, want_v, want_h = tm(
                {k: torch.tensor(v) for k, v in obs.items()},
                torch.tensor(hidden), torch.tensor(prev.astype(np.int64)),
                torch.tensor(masks))
        diff = max(float(np.abs(np.asarray(logits) - want_l.numpy()).max()),
                   float(np.abs(np.asarray(value) - want_v.numpy()).max()),
                   float(np.abs(np.asarray(new_h) - want_h.numpy()).max()))
        entry["torch_max_abs_diff"] = diff
        entry["torch_match"] = bool(diff < ATOL)
        if diff >= ATOL:
            entry["status"] = "FAIL"
    results[name] = entry
    print(f"{entry['status']} {name}: "
          f"{entry.get('torch_max_abs_diff', 'no-oracle')}")


def make_self_test_files(oracle_mod, outdir):
    """Random reference-shaped weights saved in the PUBLISHED container
    layouts (model_states list for VO, state_dict for RL)."""
    import torch

    os.makedirs(outdir, exist_ok=True)
    torch.manual_seed(0)
    paths = {}
    # act_forward.pth: model_states indexed by action id (forward == 1)
    models = {i: oracle_mod.TorchVOModel(VO_OBS_SPACE, (W, H), dd_channels=10)
              for i in (1, 2, 3)}
    fwd = os.path.join(outdir, "act_forward.pth")
    torch.save({"model_states": {1: models[1].state_dict()}}, fwd)
    paths["act_forward"] = fwd
    lr = os.path.join(outdir, "act_left_right_inv_joint.pth")
    torch.save({"model_states": {2: models[2].state_dict(),
                                 3: models[3].state_dict()}}, lr)
    paths["act_left_right"] = lr
    pol = oracle_mod.TorchActorCritic((H, W))
    rl = os.path.join(outdir, "rl_tune_vo.pth")
    torch.save({"state_dict": {f"actor_critic.{k}": v
                               for k, v in pol.state_dict().items()}}, rl)
    paths["rl_tune_vo"] = rl
    return paths


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--act-forward", default="pretrained_ckpts/vo/act_forward.pth")
    ap.add_argument("--act-left-right",
                    default="pretrained_ckpts/vo/act_left_right_inv_joint.pth")
    ap.add_argument("--rl-tune-vo",
                    default="pretrained_ckpts/rl/tune_vo/rl_tune_vo.pth")
    ap.add_argument("--reference-root",
                    default=os.environ.get("POINTNAV_VO_REFERENCE_ROOT",
                                           "/root/reference"))
    ap.add_argument("--report", default=os.path.join(_REPO, "PARITY_CKPTS.json"))
    ap.add_argument("--self-test", action="store_true")
    ap.add_argument("--device", action="store_true",
                    help="run the flax forwards on the default accelerator; "
                         "by default the tool pins jax to CPU — parity is a "
                         "numerics check, the torch oracle is CPU, and this "
                         "avoids contending with training jobs for the chip")
    args = ap.parse_args()

    if not args.device:
        import jax

        # the axon TPU plugin ignores JAX_PLATFORMS; force via config
        jax.config.update("jax_platforms", "cpu")

    oracle_mod = _torch_oracles(args.reference_root)
    if oracle_mod is None:
        print(f"note: no reference clone at {args.reference_root} — "
              "converting + forward-checking only, no torch comparison")

    if args.self_test:
        assert oracle_mod is not None, "--self-test needs --reference-root"
        import tempfile

        paths = make_self_test_files(oracle_mod, tempfile.mkdtemp("ckpt_st"))
        args.act_forward = paths["act_forward"]
        args.act_left_right = paths["act_left_right"]
        args.rl_tune_vo = paths["rl_tune_vo"]

    results = {"mode": "self-test" if args.self_test else "published",
               "atol": ATOL, "files": {}}
    verify_vo(args.act_forward, {"forward": 1}, oracle_mod, results["files"])
    verify_vo(args.act_left_right, {"left": 2, "right": 3}, oracle_mod,
              results["files"])
    verify_policy(args.rl_tune_vo, oracle_mod, results["files"])

    statuses = [v["status"] for v in results["files"].values()]
    results["overall"] = ("FAIL" if "FAIL" in statuses
                          else "PASS" if "PASS" in statuses else "SKIP")
    with open(args.report, "w") as f:
        json.dump(results, f, indent=2)
    print(f"overall: {results['overall']} -> {args.report}")
    return 1 if results["overall"] == "FAIL" else 0


if __name__ == "__main__":
    sys.exit(main())
