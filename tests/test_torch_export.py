"""JAX -> torch export parity (io/torch_export == inverse of io/torch_import).

Guarantees the reverse migration path: weights trained with this framework
load into the reference's own torch modules with ``strict=True`` and produce
the same outputs (SURVEY.md §5.4; containers per vo_cnn_...engine.py:1425-1447
and ddppo_trainer.py:619-644).
"""

import os

import numpy as np
import torch

import jax
import jax.numpy as jnp

from pointnav_vo_tpu.io.torch_export import (
    export_policy_state_dict,
    export_vo_state_dict,
    save_policy_checkpoint_torch,
    save_vo_checkpoint_torch,
)
from pointnav_vo_tpu.io.torch_import import (
    convert_policy_state_dict,
    convert_vo_state_dict,
    load_policy_checkpoint,
    load_vo_checkpoint,
)
from pointnav_vo_tpu.models.policy import PointNavActorCritic
from pointnav_vo_tpu.models.vo_cnn import make_vo_model

from _torch_ref import TorchActorCritic, TorchVOModel
from _utils import fast_init

OBS_SPACE = ("rgb", "depth", "discretized_depth", "top_down_view")
W, H = 96, 64


def _rand_obs(rng, batch=2):
    return {
        "rgb": rng.uniform(0, 255, size=(batch, H, W, 6)).astype(np.float32),
        "depth": rng.uniform(0, 1, size=(batch, H, W, 2)).astype(np.float32),
        "discretized_depth": rng.integers(0, 2, size=(batch, H, W, 20)).astype(np.float32),
        "top_down_view": rng.uniform(0, 1, size=(batch, H, W, 2)).astype(np.float32),
    }


def _assert_sd_equal(got, want):
    assert set(got) == set(want), (
        f"missing: {set(want) - set(got)}; extra: {set(got) - set(want)}")
    for k in want:
        np.testing.assert_array_equal(np.asarray(got[k]),
                                      want[k].detach().numpy(), err_msg=k)


def test_vo_export_is_exact_inverse_of_import():
    """torch sd -> import -> export reproduces every key bit-for-bit,
    including the SE/ResNeXt/bottleneck key paths."""
    for backbone in ("resnet18", "se_resneXt50"):
        tm = TorchVOModel(OBS_SPACE, (W, H), backbone=backbone)
        sd = tm.state_dict()
        _assert_sd_equal(export_vo_state_dict(convert_vo_state_dict(sd)), sd)


def test_policy_export_is_exact_inverse_of_import():
    tm = TorchActorCritic((H, W))
    sd = {f"actor_critic.{k}": v for k, v in tm.state_dict().items()}
    got = export_policy_state_dict(convert_policy_state_dict(sd))
    _assert_sd_equal(got, {k: v for k, v in sd.items()})


def test_vo_export_strict_load_and_forward_parity(tmp_path):
    """flax-init weights -> .pth -> reference module (strict=True) -> same
    deltas as the flax forward; container round-trips through the importer."""
    rng = np.random.default_rng(3)
    model = make_vo_model(
        "vo_cnn_rgb_d_dd_top_down",
        observation_space=OBS_SPACE,
        observation_size=(W, H),
        discretized_depth_channels=10,
    )
    obs = _rand_obs(rng)
    variables = fast_init(model, jax.tree.map(jnp.asarray, obs),
                          train=False, seed=3)
    # make the whitening stats realistic (positive variance)
    stats = jax.tree.map(np.asarray, variables["batch_stats"])
    stats["visual_encoder"]["rmv"]["var"] = rng.uniform(
        0.5, 2.0, size=stats["visual_encoder"]["rmv"]["var"].shape
    ).astype(np.float32)
    variables = {"params": variables["params"], "batch_stats": stats}

    tm = TorchVOModel(OBS_SPACE, (W, H), dd_channels=10)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_vo_state_dict(variables).items()}
    tm.load_state_dict(sd, strict=True)
    tm.eval()
    with torch.no_grad():
        want = tm({k: torch.tensor(v) for k, v in obs.items()}).numpy()
    got = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jax.tree.map(jnp.asarray, obs), train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)

    # per-action container (engine:1425-1447) round-trips via the importer
    path = str(tmp_path / "vo_export.pth")
    save_vo_checkpoint_torch(path, {1: variables, 2: variables}, epoch=7)
    back = load_vo_checkpoint(path, act_idx=1)
    flat_a = {".".join(str(p) for p in k): v for k, v in
              jax.tree_util.tree_flatten_with_path(
                  jax.tree.map(np.asarray, dict(variables)))[0]}
    flat_b = {".".join(str(p) for p in k): v for k, v in
              jax.tree_util.tree_flatten_with_path(back)[0]}
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(flat_a[k], flat_b[k], err_msg=k)


def test_export_cli_roundtrip(tmp_path):
    """tools/export_to_reference.py: native engine .pkl -> reference .pth,
    readable back through the importer (both VO joint-stage and RL kinds)."""
    import subprocess
    import sys

    from pointnav_vo_tpu.io.checkpoint import save_checkpoint

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cli = os.path.join(repo, "tools", "export_to_reference.py")
    rng = np.random.default_rng(5)

    # -- VO: a 2-expert joint-stage (left/right) checkpoint ----------------
    model = make_vo_model(
        "vo_cnn_rgb_d_dd_top_down", observation_space=OBS_SPACE,
        observation_size=(W, H), discretized_depth_channels=10)
    obs = jax.tree.map(jnp.asarray, _rand_obs(rng, batch=1))
    v_left = fast_init(model, obs, train=False, seed=10)
    v_right = fast_init(model, obs, train=False, seed=11)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), dict(v_left), dict(v_right))
    vo_pkl = str(tmp_path / "vo_native.pkl")
    save_checkpoint(vo_pkl, {"variables": stacked, "opt_state": {}},
                    metadata={"epoch": 3, "train_config": {"action_type": [2, 3]}})
    vo_pth = str(tmp_path / "vo_ref.pth")
    out = subprocess.run([sys.executable, cli, vo_pkl, vo_pth, "--kind", "vo"],
                         capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stdout + out.stderr
    back = load_vo_checkpoint(vo_pth, act_idx=3)  # TURN_RIGHT = expert 1
    want = jax.tree.map(np.asarray, dict(v_right))
    flat_a = jax.tree_util.tree_leaves_with_path(want)
    flat_b = dict((".".join(map(str, k)), v)
                  for k, v in jax.tree_util.tree_leaves_with_path(back))
    for k, v in flat_a:
        np.testing.assert_array_equal(flat_b[".".join(map(str, k))], v)

    # -- RL: engines.py RL checkpoint layout -------------------------------
    pol = PointNavActorCritic(image_size=(H, W))
    obs_p = {
        "depth": jnp.asarray(rng.uniform(0, 1, size=(1, H, W, 1)), jnp.float32),
        "pointgoal_with_gps_compass": jnp.asarray(rng.normal(size=(1, 2)), jnp.float32),
    }
    variables = fast_init(pol, obs_p, jnp.zeros((4, 1, 512)),
                          jnp.zeros((1, 1), jnp.int32), jnp.ones((1, 1)), seed=12)
    rl_pkl = str(tmp_path / "rl_native.pkl")
    save_checkpoint(
        rl_pkl,
        {"params": variables["params"], "opt_state": {},
         "extra_variables": dict(variables)},
        metadata={"update": 5})
    rl_pth = str(tmp_path / "rl_ref.pth")
    out = subprocess.run([sys.executable, cli, rl_pkl, rl_pth, "--kind", "policy"],
                         capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stdout + out.stderr
    back = load_policy_checkpoint(rl_pth)
    flat_a = jax.tree_util.tree_leaves_with_path(
        jax.tree.map(np.asarray, variables["params"]))
    flat_b = dict((".".join(map(str, k)), v)
                  for k, v in jax.tree_util.tree_leaves_with_path(back["params"]))
    for k, v in flat_a:
        np.testing.assert_array_equal(flat_b[".".join(map(str, k))], v)


def test_policy_export_strict_load_and_forward_parity(tmp_path):
    rng = np.random.default_rng(4)
    n = 2
    obs = {
        "depth": rng.uniform(0, 1, size=(n, H, W, 1)).astype(np.float32),
        "pointgoal_with_gps_compass": rng.normal(size=(n, 2)).astype(np.float32),
    }
    prev = rng.integers(0, 4, size=(n, 1)).astype(np.int64)
    masks = np.ones((n, 1), np.float32)
    h0 = rng.normal(size=(4, n, 512)).astype(np.float32)

    model = PointNavActorCritic(image_size=(H, W))
    variables = fast_init(
        model, jax.tree.map(jnp.asarray, obs), jnp.asarray(h0),
        jnp.asarray(prev.astype(np.int32)), jnp.asarray(masks), seed=4)

    tm = TorchActorCritic((H, W))
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_policy_state_dict(variables, prefix="").items()}
    tm.load_state_dict(sd, strict=True)
    tm.eval()
    with torch.no_grad():
        want_logits, want_value, _ = tm(
            {k: torch.tensor(v) for k, v in obs.items()},
            torch.tensor(h0), torch.tensor(prev), torch.tensor(masks))
    got_logits, got_value, _ = model.apply(
        {"params": variables["params"]},
        jax.tree.map(jnp.asarray, obs), jnp.asarray(h0),
        jnp.asarray(prev.astype(np.int32)), jnp.asarray(masks))
    np.testing.assert_allclose(np.asarray(got_logits), want_logits.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_value), want_value.numpy(), atol=2e-4)

    # RL container (ddppo_trainer.py:619-644) round-trips via the importer
    path = str(tmp_path / "rl_export.pth")
    save_policy_checkpoint_torch(path, variables)
    back = load_policy_checkpoint(path)
    flat_a = {".".join(str(p) for p in k): v for k, v in
              jax.tree_util.tree_flatten_with_path(jax.tree.map(np.asarray, variables["params"]))[0]}
    flat_b = {".".join(str(p) for p in k): v for k, v in
              jax.tree_util.tree_flatten_with_path(back["params"])[0]}
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(flat_a[k], flat_b[k], err_msg=k)
