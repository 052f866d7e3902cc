"""tools/verify_reference_ckpts.py stays working (VERDICT r3 item 5).

The published .pth files can't ship with the repo, so the committed
evidence is the tool's --self-test: reference-shaped random weights saved
in the PUBLISHED container layouts (model_states dict for VO,
actor_critic.-prefixed state_dict for RL), converted, forwarded, and
compared against the torch oracles.
"""

import json
import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_ckpt_tool_self_test(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    report = tmp_path / "report.json"
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "tools/verify_reference_ckpts.py"),
         "--self-test", "--report", str(report)],
        capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stdout + out.stderr
    rep = json.loads(report.read_text())
    assert rep["overall"] == "PASS", rep
    files = rep["files"]
    assert files["act_forward.pth"]["experts"]["forward"]["torch_match"]
    assert files["act_left_right_inv_joint.pth"]["experts"]["left"]["torch_match"]
    assert files["act_left_right_inv_joint.pth"]["experts"]["right"]["torch_match"]
    assert files["rl_tune_vo.pth"]["torch_match"]


def test_ckpt_tool_skips_missing(tmp_path):
    """No checkpoints on disk -> graceful SKIP report, exit 0."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    report = tmp_path / "report.json"
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "tools/verify_reference_ckpts.py"),
         "--act-forward", str(tmp_path / "missing1.pth"),
         "--act-left-right", str(tmp_path / "missing2.pth"),
         "--rl-tune-vo", str(tmp_path / "missing3.pth"),
         "--report", str(report)],
        capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stdout + out.stderr
    rep = json.loads(report.read_text())
    assert rep["overall"] == "SKIP"
    assert all(v["status"] == "SKIP" for v in rep["files"].values())
