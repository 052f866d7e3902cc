"""examples/eval_habitat.py preflight: the first-run kit stays trustworthy.

The habitat eval can only be exercised on a habitat-equipped host
(docs/HABITAT_RUNBOOK.md); what CAN be pinned here is the preflight that
gates it — each dependency check fires in order with an actionable message
naming its runbook step, and a fully-provisioned layout (fake habitat,
dataset files, reference-shaped .pth checkpoints from the verify tool's
self-test generator) passes with a complete report including the converted
checkpoints' parameter counts.
"""

import argparse
import importlib.util
import os
import sys

import pytest

import fake_habitat

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def eval_habitat():
    return _load(os.path.join(REPO, "examples", "eval_habitat.py"),
                 "eval_habitat")


@pytest.fixture(scope="module")
def ckpt_layout(tmp_path_factory):
    """pretrained_ckpts/ + dataset/ in the reference layout, with
    reference-shaped random .pth files (the verify tool's self-test
    containers: model_states for VO, actor_critic.-prefixed state_dict
    for RL)."""
    root = tmp_path_factory.mktemp("habitat_layout")
    vrc = _load(os.path.join(REPO, "tools", "verify_reference_ckpts.py"),
                "verify_reference_ckpts")
    oracles = vrc._torch_oracles(os.path.join(os.sep, "root", "reference"))
    if oracles is None:  # no reference clone: skip, like the tool does
        pytest.skip("no reference clone for torch oracles")
    ckdir = root / "pretrained_ckpts"
    paths = vrc.make_self_test_files(oracles, str(ckdir))
    layout = {
        "rl": paths["rl_tune_vo"],
        "vo_fwd": paths["act_forward"],
        "vo_lr": paths["act_left_right"],
    }
    data = root / "dataset" / "habitat_datasets" / "pointnav/gibson/v2/val"
    data.mkdir(parents=True)
    (data / "val.json.gz").write_bytes(b"\x1f\x8b")
    (root / "dataset" / "Gibson").mkdir()
    return root, layout


def _args(root, layout, **over):
    d = dict(
        data_path=str(root / "dataset/habitat_datasets/pointnav/gibson/v2/"
                             "{split}/{split}.json.gz"),
        split="val",
        scene_dir=str(root / "dataset" / "Gibson"),
        rl_ckpt=str(layout["rl"]),
        vo_forward_ckpt=str(layout["vo_fwd"]),
        vo_turn_ckpt=str(layout["vo_lr"]),
    )
    d.update(over)
    return argparse.Namespace(**d)


def test_preflight_passes_on_full_layout(eval_habitat, ckpt_layout,
                                         monkeypatch):
    monkeypatch.setitem(sys.modules, "habitat", fake_habitat)
    root, layout = ckpt_layout
    report = eval_habitat.preflight(_args(root, layout))
    assert report["dataset"].endswith("val.json.gz")
    # all three experts converted via published action-id keys
    # (forward=1, left=2, right=3), with real param counts
    assert report["vo_ckpts"]["forward[1]"]["params"] > 1_000_000
    assert report["vo_ckpts"]["left_right[2]"]["params"] > 1_000_000
    assert report["vo_ckpts"]["left_right[3]"]["params"] > 1_000_000
    assert report["rl_ckpt"]["params"] > 1_000_000
    assert report["jax_devices"]


@pytest.mark.parametrize("breaker,expect", [
    ("habitat", "step 1"),
    ("dataset", "step 2"),
    ("rl_ckpt", "step 3"),
    ("vo_ckpt", "step 3"),
])
def test_preflight_failures_name_runbook_steps(eval_habitat, ckpt_layout,
                                               monkeypatch, breaker, expect):
    root, layout = ckpt_layout
    if breaker != "habitat":
        monkeypatch.setitem(sys.modules, "habitat", fake_habitat)
    else:
        monkeypatch.setitem(sys.modules, "habitat", None)  # import fails
    args = _args(root, layout)
    if breaker == "dataset":
        args.data_path = str(root / "nope/{split}.json.gz")
    elif breaker == "rl_ckpt":
        args.rl_ckpt = str(root / "nope.pth")
    elif breaker == "vo_ckpt":
        args.vo_forward_ckpt = str(root / "nope.pth")
    with pytest.raises(SystemExit) as e:
        eval_habitat.preflight(args)
    assert "HABITAT_RUNBOOK" in str(e.value) and expect in str(e.value)
