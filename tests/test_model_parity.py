"""Checkpoint-parity tests: flax models vs the reference torch modules.

Random-initialized reference torch models are exported via state_dict,
converted with io/torch_import, and the flax forward must match float32-level
(SURVEY.md §4 item 2 — this is what guarantees the published .pth checkpoints
produce identical VO deltas / policy logits).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from pointnav_vo_tpu.io.torch_import import (
    convert_policy_state_dict,
    convert_vo_state_dict,
)
from pointnav_vo_tpu.models.rnn import RNNStateEncoder
from pointnav_vo_tpu.models.policy import PointNavActorCritic
from pointnav_vo_tpu.models.vo_cnn import make_vo_model

from _torch_ref import TorchActorCritic, TorchVOModel, ref_rnn

OBS_SPACE = ("rgb", "depth", "discretized_depth", "top_down_view")
W, H = 96, 64  # small but shape-generic (ceil division exercised: 96/32=3, 64/32=2)


def _rand_obs(rng, batch=2):
    return {
        "rgb": rng.uniform(0, 255, size=(batch, H, W, 6)).astype(np.float32),
        "depth": rng.uniform(0, 1, size=(batch, H, W, 2)).astype(np.float32),
        "discretized_depth": rng.integers(0, 2, size=(batch, H, W, 20)).astype(np.float32),
        "top_down_view": rng.uniform(0, 1, size=(batch, H, W, 2)).astype(np.float32),
    }


def _seed_rmv(torch_model, rng):
    rmv = torch_model.visual_encoder.running_mean_and_var
    c = rmv._mean.shape[1]
    rmv._mean.copy_(torch.tensor(rng.normal(size=(1, c, 1, 1)), dtype=torch.float32))
    rmv._var.copy_(torch.tensor(rng.uniform(0.5, 2.0, size=(1, c, 1, 1)), dtype=torch.float32))
    rmv._count.copy_(torch.tensor(100.0))


def test_vo_cnn_rgb_d_dd_top_down_parity():
    rng = np.random.default_rng(0)
    tm = TorchVOModel(OBS_SPACE, (W, H), dd_channels=10)
    with torch.no_grad():
        _seed_rmv(tm, rng)
    tm.eval()

    obs = _rand_obs(rng)
    with torch.no_grad():
        want = tm({k: torch.tensor(v) for k, v in obs.items()}).numpy()

    model = make_vo_model(
        "vo_cnn_rgb_d_dd_top_down",
        observation_space=OBS_SPACE,
        observation_size=(W, H),
        discretized_depth_channels=10,
    )
    variables = convert_vo_state_dict(tm.state_dict())
    got = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jax.tree.map(jnp.asarray, obs),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


@pytest.mark.parametrize("rnn_type", ["LSTM", "GRU"])
def test_rnn_state_encoder_parity(rnn_type):
    """Scan-based per-step masking == the reference's has_zeros chunking."""
    rng = np.random.default_rng(1)
    t_steps, n, d, hdim, layers = 7, 3, 5, 8, 2
    ref = ref_rnn.RNNStateEncoder(d, hdim, num_layers=layers, rnn_type=rnn_type)

    x = rng.normal(size=(t_steps, n, d)).astype(np.float32)
    masks = (rng.uniform(size=(t_steps, n, 1)) > 0.3).astype(np.float32)
    masks[0] = 0.0  # reference assumes t=0 resets
    pack = layers * (2 if rnn_type == "LSTM" else 1)
    h0 = rng.normal(size=(pack, n, hdim)).astype(np.float32)

    with torch.no_grad():
        want_seq, want_h = ref.seq_forward(
            torch.tensor(x.reshape(t_steps * n, d)),
            torch.tensor(h0),
            torch.tensor(masks.reshape(t_steps * n, 1)),
        )

    model = RNNStateEncoder(input_size=d, hidden_size=hdim, num_layers=layers,
                            rnn_type=rnn_type)
    params = {}
    for key, val in ref.state_dict().items():
        name = key.split(".")[-1].replace("weight_", "w_").replace("bias_", "b_")
        params[name] = jnp.asarray(val.numpy())
    got_seq, got_h = model.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(h0), jnp.asarray(masks)
    )
    np.testing.assert_allclose(
        np.asarray(got_seq).reshape(t_steps * n, hdim), want_seq.numpy(), atol=5e-5
    )
    np.testing.assert_allclose(np.asarray(got_h), want_h.numpy(), atol=5e-5)

    # single-step parity
    with torch.no_grad():
        want_1, want_h1 = ref.single_forward(
            torch.tensor(x[0]), torch.tensor(h0), torch.tensor(masks[1])
        )
    got_1, got_h1 = model.apply(
        {"params": params}, jnp.asarray(x[0]), jnp.asarray(h0), jnp.asarray(masks[1])
    )
    np.testing.assert_allclose(np.asarray(got_1), want_1.numpy(), atol=5e-5)
    np.testing.assert_allclose(np.asarray(got_h1), want_h1.numpy(), atol=5e-5)


def test_policy_parity_single_and_seq():
    rng = np.random.default_rng(2)
    tm = TorchActorCritic((H, W))
    tm.eval()

    n = 3
    obs = {
        "depth": rng.uniform(0, 1, size=(n, H, W, 1)).astype(np.float32),
        "pointgoal_with_gps_compass": rng.normal(size=(n, 2)).astype(np.float32),
    }
    prev = rng.integers(0, 4, size=(n, 1)).astype(np.int64)
    masks = (rng.uniform(size=(n, 1)) > 0.3).astype(np.float32)
    h0 = rng.normal(size=(4, n, 512)).astype(np.float32)

    with torch.no_grad():
        want_logits, want_value, want_h = tm(
            {k: torch.tensor(v) for k, v in obs.items()},
            torch.tensor(h0), torch.tensor(prev), torch.tensor(masks),
        )

    model = PointNavActorCritic(image_size=(H, W))
    variables = convert_policy_state_dict(tm.state_dict())
    got_logits, got_value, got_h = model.apply(
        {"params": variables["params"]},
        jax.tree.map(jnp.asarray, obs),
        jnp.asarray(h0),
        jnp.asarray(prev.astype(np.int32)),
        jnp.asarray(masks),
    )
    np.testing.assert_allclose(np.asarray(got_logits), want_logits.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_value), want_value.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_h), want_h.numpy(), atol=2e-4)

    # sequence path (the PPO-update direction)
    t_steps = 4
    seq_obs = {
        "depth": rng.uniform(0, 1, size=(t_steps, n, H, W, 1)).astype(np.float32),
        "pointgoal_with_gps_compass": rng.normal(size=(t_steps, n, 2)).astype(np.float32),
    }
    seq_prev = rng.integers(0, 4, size=(t_steps, n, 1)).astype(np.int64)
    seq_masks = (rng.uniform(size=(t_steps, n, 1)) > 0.3).astype(np.float32)
    seq_masks[0] = 0.0

    with torch.no_grad():
        feat, th = tm.net(
            {k: torch.tensor(v.reshape((t_steps * n,) + v.shape[2:])) for k, v in seq_obs.items()},
            torch.tensor(h0),
            torch.tensor(seq_prev.reshape(t_steps * n, 1)),
            torch.tensor(seq_masks.reshape(t_steps * n, 1)),
        )
        want_logits = tm.action_distribution(feat).numpy()

    got_logits, _, got_h = model.apply(
        {"params": variables["params"]},
        jax.tree.map(jnp.asarray, seq_obs),
        jnp.asarray(h0),
        jnp.asarray(seq_prev.astype(np.int32)),
        jnp.asarray(seq_masks),
    )
    np.testing.assert_allclose(np.asarray(got_logits), want_logits, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_h), th.numpy(), atol=2e-4)


@pytest.mark.slow
def test_vo_cnn_full_resolution_parity():
    """Deployed 341x192 resolution (VERDICT r3 item 7): padding/pooling edge
    effects differ from the 96x64 cases above (341 is not a multiple of 32 —
    ceil-division feature maps, asymmetric SAME padding), so the flagship VO
    model's float parity is asserted at the size eval actually runs."""
    rng = np.random.default_rng(10)
    fw, fh = 341, 192
    tm = TorchVOModel(OBS_SPACE, (fw, fh), dd_channels=10)
    with torch.no_grad():
        _seed_rmv(tm, rng)
    tm.eval()

    obs = {
        "rgb": rng.uniform(0, 255, size=(1, fh, fw, 6)).astype(np.float32),
        "depth": rng.uniform(0, 1, size=(1, fh, fw, 2)).astype(np.float32),
        "discretized_depth": rng.integers(0, 2, size=(1, fh, fw, 20)).astype(np.float32),
        "top_down_view": rng.uniform(0, 1, size=(1, fh, fw, 2)).astype(np.float32),
    }
    with torch.no_grad():
        want = tm({k: torch.tensor(v) for k, v in obs.items()}).numpy()

    model = make_vo_model(
        "vo_cnn_rgb_d_dd_top_down",
        observation_space=OBS_SPACE,
        observation_size=(fw, fh),
        discretized_depth_channels=10,
    )
    variables = convert_vo_state_dict(tm.state_dict())
    got = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jax.tree.map(jnp.asarray, obs),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4)


@pytest.mark.slow
def test_policy_full_resolution_parity():
    """341x192 policy parity: the avg-pool/2 front end gives odd 170x96
    intermediate maps — the resolution eval runs, never covered at 96x64."""
    rng = np.random.default_rng(11)
    fw, fh = 341, 192
    tm = TorchActorCritic((fh, fw))
    tm.eval()

    obs = {
        "depth": rng.uniform(0, 1, size=(1, fh, fw, 1)).astype(np.float32),
        "pointgoal_with_gps_compass": rng.normal(size=(1, 2)).astype(np.float32),
    }
    prev = np.zeros((1, 1), np.int64)
    masks = np.ones((1, 1), np.float32)
    h0 = rng.normal(size=(4, 1, 512)).astype(np.float32)

    with torch.no_grad():
        want_logits, want_value, want_h = tm(
            {k: torch.tensor(v) for k, v in obs.items()},
            torch.tensor(h0), torch.tensor(prev), torch.tensor(masks),
        )

    model = PointNavActorCritic(image_size=(fh, fw))
    variables = convert_policy_state_dict(tm.state_dict())
    got_logits, got_value, got_h = model.apply(
        {"params": variables["params"]},
        jax.tree.map(jnp.asarray, obs),
        jnp.asarray(h0),
        jnp.asarray(prev.astype(np.int32)),
        jnp.asarray(masks),
    )
    np.testing.assert_allclose(np.asarray(got_logits), want_logits.numpy(), atol=5e-4)
    np.testing.assert_allclose(np.asarray(got_value), want_value.numpy(), atol=5e-4)
    np.testing.assert_allclose(np.asarray(got_h), want_h.numpy(), atol=5e-4)
