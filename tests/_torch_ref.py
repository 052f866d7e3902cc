"""Test-only PyTorch oracle models.

Loads the reference's standalone torch modules (resnet, rnn_state_encoder,
running_mean_and_var — the only ones importable without habitat) directly from
/root/reference and wires them into reference-shaped wrapper modules whose
state_dict keys match the published checkpoints.  Used purely as numerical
oracles for checkpoint-parity tests (SURVEY.md §4 item 2).
"""

import importlib.util
import sys

import numpy as np
import torch
import torch.nn as nn

import os

# tools/verify_reference_ckpts.py reuses these oracles against a
# user-supplied clone of the reference repo
_REF = os.path.join(os.environ.get("POINTNAV_VO_REFERENCE_ROOT",
                                   "/root/reference"), "pointnav_vo")


def _load(name, rel):
    spec = importlib.util.spec_from_file_location(name, f"{_REF}/{rel}")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


ref_resnet = _load("ref_resnet", "model_utils/visual_encoders/resnet.py")
ref_rnn = _load("ref_rnn", "model_utils/rnns/rnn_state_encoder.py")
ref_rmv = _load("ref_rmv", "model_utils/running_mean_and_var.py")


class TorchVOEncoder(nn.Module):
    """Reference-shaped VO encoder (keys: running_mean_and_var / backbone /
    compression.{0,1})."""

    def __init__(self, obs_space, obs_size_wh, baseplanes=32, backbone="resnet18",
                 dd_channels=10, flat_size=2048):
        super().__init__()
        self.obs_space = obs_space
        c = 0
        if "rgb" in obs_space:
            c += 6
        if "depth" in obs_space:
            c += 2
        if "discretized_depth" in obs_space:
            c += 2 * dd_channels
        if "top_down_view" in obs_space:
            c += 2
        self.in_channels = c
        self.running_mean_and_var = ref_rmv.RunningMeanAndVar(c)
        self.backbone = getattr(ref_resnet, backbone)(c, baseplanes, baseplanes // 2)
        w, h = obs_size_wh
        fw = int(np.ceil(w / 32))
        fh = int(np.ceil(h / 32))
        nch = int(round(flat_size / (fw * fh)))
        self.compression = nn.Sequential(
            nn.Conv2d(self.backbone.final_channels, nch, 3, padding=1, bias=False),
            nn.GroupNorm(1, nch),
            nn.ReLU(True),
        )
        self.output_shape = (nch, fh, fw)

    def forward(self, obs):
        prev, cur = [], []
        for key, norm in [("rgb", 255.0), ("depth", 1.0),
                          ("discretized_depth", 1.0), ("top_down_view", 1.0)]:
            if key in self.obs_space:
                x = obs[key].permute(0, 3, 1, 2) / norm
                half = x.shape[1] // 2
                prev.append(x[:, :half])
                cur.append(x[:, half:])
        x = torch.cat(prev + cur, dim=1)
        x = self.running_mean_and_var(x)
        x = self.backbone(x)
        return self.compression(x)


class TorchVOModel(nn.Module):
    def __init__(self, obs_space, obs_size_wh, hidden=512, out_dim=3, **kw):
        super().__init__()
        self.visual_encoder = TorchVOEncoder(obs_space, obs_size_wh, **kw)
        flat = int(np.prod(self.visual_encoder.output_shape))
        self.visual_fc = nn.Sequential(
            nn.Flatten(), nn.Dropout(0.2), nn.Linear(flat, hidden), nn.ReLU(True)
        )
        self.output_head = nn.Sequential(nn.Dropout(0.2), nn.Linear(hidden, out_dim))

    def forward(self, obs):
        return self.output_head(self.visual_fc(self.visual_encoder(obs)))


class TorchPolicyEncoder(nn.Module):
    """Reference-shaped policy visual encoder (resnet_policy.py:61-174)."""

    def __init__(self, image_size_hw, vis_types=("depth",), baseplanes=32,
                 backbone="resnet18"):
        super().__init__()
        c = (3 if "rgb" in vis_types else 0) + (1 if "depth" in vis_types else 0)
        self.vis_types = vis_types
        self.backbone = getattr(ref_resnet, backbone)(c, baseplanes, baseplanes // 2)
        h, w = image_size_hw
        fh = int(np.ceil((h // 2) / 32))
        fw = int(np.ceil((w // 2) / 32))
        nch = int(round(2048 / (fw * fh)))
        self.compression = nn.Sequential(
            nn.Conv2d(self.backbone.final_channels, nch, 3, padding=1, bias=False),
            nn.GroupNorm(1, nch),
            nn.ReLU(True),
        )
        self.output_shape = (nch, fh, fw)

    def forward(self, obs):
        parts = []
        if "rgb" in self.vis_types:
            parts.append(obs["rgb"].permute(0, 3, 1, 2) / 255.0)
        if "depth" in self.vis_types:
            parts.append(obs["depth"].permute(0, 3, 1, 2))
        x = torch.cat(parts, dim=1)
        x = torch.nn.functional.avg_pool2d(x, 2)
        x = self.backbone(x)
        return self.compression(x)


class TorchPolicyNet(nn.Module):
    def __init__(self, image_size_hw, n_actions=4, hidden=512, vis_types=("depth",)):
        super().__init__()
        self.prev_action_embedding = nn.Embedding(n_actions + 1, 32)
        self.tgt_embeding = nn.Linear(3, 32)
        self.visual_encoder = TorchPolicyEncoder(image_size_hw, vis_types)
        flat = int(np.prod(self.visual_encoder.output_shape))
        self.visual_fc = nn.Sequential(nn.Flatten(), nn.Linear(flat, hidden), nn.ReLU(True))
        self.state_encoder = ref_rnn.RNNStateEncoder(hidden + 64, hidden, num_layers=2,
                                                     rnn_type="LSTM")

    def forward(self, obs, hidden, prev_actions, masks):
        x = [self.visual_fc(self.visual_encoder(obs))]
        goal = obs["pointgoal_with_gps_compass"]
        goal3 = torch.stack([goal[:, 0], torch.cos(-goal[:, 1]), torch.sin(-goal[:, 1])], -1)
        x.append(self.tgt_embeding(goal3))
        prev = self.prev_action_embedding(((prev_actions.float() + 1) * masks).long().squeeze(-1))
        x.append(prev)
        x = torch.cat(x, dim=1)
        return self.state_encoder(x, hidden, masks)


class TorchActorCritic(nn.Module):
    def __init__(self, image_size_hw, n_actions=4, hidden=512):
        super().__init__()
        self.net = TorchPolicyNet(image_size_hw, n_actions, hidden)

        class _Cat(nn.Module):
            def __init__(self):
                super().__init__()
                self.linear = nn.Linear(hidden, n_actions)

            def forward(self, x):
                return self.linear(x)

        class _Critic(nn.Module):
            def __init__(self):
                super().__init__()
                self.fc = nn.Linear(hidden, 1)

            def forward(self, x):
                return self.fc(x)

        self.action_distribution = _Cat()
        self.critic = _Critic()

    def forward(self, obs, hidden, prev_actions, masks):
        feat, hidden = self.net(obs, hidden, prev_actions, masks)
        return self.action_distribution(feat), self.critic(feat), hidden
