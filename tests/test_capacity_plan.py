"""Capacity planner (tools/capacity_plan.py): chips-for-load arithmetic on
the measured serving cost model.

TPU-native deliverable with no reference analogue (the reference ships a
one-shot eager inference.py); the planner turns the measured quadratic
cost curves (COST_ANCHORS.json) + batch-amortization model into operator
answers (QPS/streams per chip, chips for a target load).
"""

import importlib.util
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from unitspeech_tpu.infer.bucket_cost import FIXED_MS, frame_cost_curve
from unitspeech_tpu.ops.masking import default_frame_buckets

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_tool():
    spec = importlib.util.spec_from_file_location(
        "capacity_plan", os.path.join(REPO, "tools", "capacity_plan.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_plan_arithmetic_and_batching():
    """Batching amortizes only the FIXED dispatch floor; more batch ->
    cheaper rows -> more QPS; utilization scales linearly."""
    tool = _load_tool()
    ladder = default_frame_buckets(4096)
    curve = frame_cost_curve("dpm2:cs2", 16)
    lengths = np.full(64, 340.0)
    p1 = tool.plan(lengths, curve, ladder, batch=1, utilization=1.0)
    p8 = tool.plan(lengths, curve, ladder, batch=8, utilization=1.0)
    # single bucket + insurance on tight traffic
    assert p1["window"][0] == 344 and p1["overflow_pct"] == 0.0
    # batch=1 pays the full FIXED floor: eta * mean_single exactly
    assert p1["mean_proc_ms_batched"] == pytest.approx(
        tool.ETA_BATCH * p1["mean_proc_ms_single"], abs=0.1)
    # batch=8 saves 7/8 of FIXED per row
    want = tool.ETA_BATCH * (p1["mean_proc_ms_single"] - FIXED_MS
                             + FIXED_MS / 8)
    assert p8["mean_proc_ms_batched"] == pytest.approx(want, abs=0.1)
    assert p8["qps_per_chip"] > p1["qps_per_chip"]
    # utilization is a straight discount
    p_half = tool.plan(lengths, curve, ladder, batch=8, utilization=0.5)
    assert p_half["qps_per_chip"] == pytest.approx(
        p8["qps_per_chip"] * 0.5, abs=0.01)
    # streams = qps * mean speech seconds
    assert p8["streams_per_chip"] == pytest.approx(
        round(p8["qps_per_chip"] * p8["mean_speech_s"], 1), abs=0.1)


def test_plan_sanity_vs_measured_daemon_throughput():
    """On bench-like traffic (tight ~344-frame band, production fast mode)
    the planner's per-chip streams should land NEAR BUT BELOW the measured
    daemon number (31.4x realtime/chip at 8 clients, ROADMAP r4s4) — the
    default utilization is deliberately conservative."""
    tool = _load_tool()
    ladder = default_frame_buckets(4096)
    curve = frame_cost_curve("dpm2:cs2", 16)
    rng = np.random.default_rng(0)
    lengths = rng.uniform(330, 355, 128)
    p = tool.plan(lengths, curve, ladder, batch=4)
    assert 15.0 < p["streams_per_chip"] < 31.4


def test_capacity_cli_json(tmp_path):
    """End-to-end CLI: lengths in, one JSON line out, chips arithmetic
    consistent both directions."""
    path = tmp_path / "lens.txt"
    rng = np.random.default_rng(2)
    path.write_text("\n".join(
        f"{x:.0f}" for x in rng.uniform(200, 400, 50)))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "capacity_plan.py"),
         "--lengths", str(path), "--preset", "dpm2_16_cs2",
         "--target-qps", "10", "--chips", "2", "--json"],
        capture_output=True, text=True, timeout=600, cwd=REPO,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert out.returncode == 0, out.stderr
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["chips_needed"] >= 1
    assert res["sustainable_qps"] == pytest.approx(
        2 * res["qps_per_chip"], rel=1e-3)
    # the target is actually covered by the recommended chip count
    assert res["chips_needed"] * res["qps_per_chip"] >= 10.0


def test_stats_tokens_shift_absolute_costs(tmp_path):
    """A /stats snapshot's recent_tokens shifts the absolute cost via the
    measured token curve (long tokens -> costlier requests -> fewer QPS)."""
    tool = _load_tool()
    base = {"recent_frames": [300, 320, 340, 360]}
    small = tmp_path / "small.json"
    small.write_text(json.dumps({**base, "recent_tokens": [20, 30, 25, 28]}))
    big = tmp_path / "big.json"
    big.write_text(json.dumps({**base,
                               "recent_tokens": [900, 950, 800, 1000]}))

    def run(snap):
        out = subprocess.run(
            [sys.executable,
             os.path.join(REPO, "tools", "capacity_plan.py"),
             "--stats", str(snap), "--json"],
            capture_output=True, text=True, timeout=600, cwd=REPO,
            env={**os.environ, "JAX_PLATFORMS": "cpu"},
        )
        assert out.returncode == 0, out.stderr
        return json.loads(out.stdout.strip().splitlines()[-1])

    r_small, r_big = run(small), run(big)
    assert r_big["mean_proc_ms_single"] > r_small["mean_proc_ms_single"]
    assert r_big["qps_per_chip"] < r_small["qps_per_chip"]
