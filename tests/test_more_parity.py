"""Extended parity: backbone variants, act-embed VO model, area resize,
RunningMeanAndVar training-mode statistics."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from pointnav_vo_tpu.io.torch_import import convert_vo_state_dict, _backbone_path, _KIND_FN, _set
from pointnav_vo_tpu.models import resnet as resnet_lib
from pointnav_vo_tpu.models.running_mean_var import RunningMeanAndVar
from pointnav_vo_tpu.models.vo_cnn import VOCNNActEmbed
from pointnav_vo_tpu.ops.transforms import center_crop, resize_area, resize_nearest

from _torch_ref import ref_resnet, ref_rmv, TorchVOEncoder


@pytest.mark.parametrize("name", ["resnet50", "resneXt50", "se_resnet50"])
def test_backbone_variant_parity(name):
    tm = getattr(ref_resnet, name)(5, 32, 16)
    tm.eval()
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 64, 96, 5)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.tensor(x).permute(0, 3, 1, 2)).numpy()

    model = resnet_lib.BACKBONES[name](base_planes=32, ngroups=16)
    params = {}
    for key, val in tm.state_dict().items():
        path, kind = _backbone_path(key.split("."), key.split(".")[-1])
        _set(params, path[1:], _KIND_FN[kind](val.numpy()))
    got = model.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=2e-3
    )


def test_act_embed_vo_model_parity():
    """vo_cnn_act_embed: unified model with 32-d action embedding."""
    import torch.nn as nn

    class TorchActEmbed(nn.Module):
        def __init__(self):
            super().__init__()
            self.action_embedding = nn.Embedding(5, 32)
            self.visual_encoder = TorchVOEncoder(("rgb", "depth"), (96, 64))
            flat = int(np.prod(self.visual_encoder.output_shape))
            self.hidden_generator = nn.Sequential(
                nn.Dropout(0.2), nn.Linear(flat + 32, 512), nn.ReLU(True))
            self.output_head = nn.Sequential(nn.Dropout(0.2), nn.Linear(512, 3))

        def forward(self, obs, actions):
            emb = self.action_embedding(actions)
            feats = self.visual_encoder(obs).flatten(1)
            return self.output_head(self.hidden_generator(torch.cat([feats, emb], 1)))

    tm = TorchActEmbed()
    tm.eval()
    with torch.no_grad():
        rmv = tm.visual_encoder.running_mean_and_var
        rmv._var.fill_(1.0)
        rmv._count.fill_(10.0)

    rng = np.random.default_rng(1)
    obs = {
        "rgb": rng.uniform(0, 255, (2, 64, 96, 6)).astype(np.float32),
        "depth": rng.uniform(0, 1, (2, 64, 96, 2)).astype(np.float32),
    }
    actions = np.asarray([1, 3])
    with torch.no_grad():
        want = tm({k: torch.tensor(v) for k, v in obs.items()},
                  torch.tensor(actions)).numpy()

    model = VOCNNActEmbed(observation_space=("rgb", "depth"),
                          observation_size=(96, 64))
    variables = convert_vo_state_dict(tm.state_dict())
    got = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jax.tree.map(jnp.asarray, obs), jnp.asarray(actions), train=False,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_resize_area_matches_torch_interpolate():
    rng = np.random.default_rng(2)
    img = rng.uniform(size=(2, 37, 53, 3)).astype(np.float32)
    for out_hw in [(19, 27), (10, 10), (37, 53)]:
        want = F.interpolate(
            torch.tensor(img).permute(0, 3, 1, 2), size=out_hw, mode="area"
        ).permute(0, 2, 3, 1).numpy()
        got = np.asarray(resize_area(jnp.asarray(img), out_hw))
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_resize_nearest_matches_torch():
    rng = np.random.default_rng(3)
    img = rng.uniform(size=(1, 20, 30, 2)).astype(np.float32)
    want = F.interpolate(torch.tensor(img).permute(0, 3, 1, 2), size=(11, 17),
                         mode="nearest").permute(0, 2, 3, 1).numpy()
    got = np.asarray(resize_nearest(jnp.asarray(img), (11, 17)))
    np.testing.assert_allclose(got, want)


def test_center_crop_matches_reference_rule():
    rng = np.random.default_rng(4)
    img = rng.uniform(size=(1, 21, 33, 1)).astype(np.float32)
    got = np.asarray(center_crop(jnp.asarray(img), (16, 10)))  # (w, h)
    startx, starty = 33 // 2 - 8, 21 // 2 - 5
    np.testing.assert_array_equal(
        got, img[:, starty : starty + 10, startx : startx + 16, :]
    )


def test_running_mean_var_training_updates_match_torch():
    """Chan-merge running stats across two training batches == reference."""
    tm = ref_rmv.RunningMeanAndVar(3)
    tm.train()
    rng = np.random.default_rng(5)
    b1 = rng.normal(1.0, 2.0, (4, 8, 8, 3)).astype(np.float32)
    b2 = rng.normal(-1.0, 0.5, (4, 8, 8, 3)).astype(np.float32)
    with torch.no_grad():
        out1_t = tm(torch.tensor(b1).permute(0, 3, 1, 2)).numpy()
        out2_t = tm(torch.tensor(b2).permute(0, 3, 1, 2)).numpy()

    model = RunningMeanAndVar(3)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    out1, mut = model.apply(variables, jnp.asarray(b1), update_stats=True,
                            mutable=["batch_stats"])
    out2, mut = model.apply({"batch_stats": mut["batch_stats"], "params": {}},
                            jnp.asarray(b2), update_stats=True,
                            mutable=["batch_stats"])
    np.testing.assert_allclose(
        np.asarray(out1).transpose(0, 3, 1, 2), out1_t, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out2).transpose(0, 3, 1, 2), out2_t, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["mean"]),
        tm._mean.numpy().reshape(-1), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["var"]),
        tm._var.numpy().reshape(-1), atol=1e-6)
