"""Serving bucket-window cost model (unitspeech_tpu/infer/bucket_cost.py)
and the offline analyzer (tools/analyze_buckets.py).

TPU-native concern with no reference analogue: the reference pads
per-sample and re-traces per utterance (/root/reference/inference.py),
while bucket-switch serving must pick a small precompiled window of frame
buckets whose padding/overflow tradeoff depends on the traffic's length
distribution and the measured per-request cost constants.
"""

import importlib.util
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from unitspeech_tpu.infer.bucket_cost import (
    BASE_MS,
    CURVES,
    FIXED_MS,
    PRESETS,
    SYNC_MS,
    enumerate_windows,
    frame_cost_curve,
    optimal_window,
    preset_per_frame_ms,
    token_cost_ms,
    window_cost,
)
from unitspeech_tpu.ops.masking import (
    choose_bucket,
    default_frame_buckets,
    fix_len_compatibility,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_tool():
    spec = importlib.util.spec_from_file_location(
        "analyze_buckets", os.path.join(REPO, "tools", "analyze_buckets.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_preset_per_frame_ms_anchors_and_scaling():
    # exact at the measured anchors
    assert preset_per_frame_ms("ddpm", 50) == pytest.approx(PRESETS["ddpm50"])
    assert preset_per_frame_ms("dpm2", 16) == pytest.approx(PRESETS["dpm2_16"])
    assert preset_per_frame_ms("dpm2", 25) == pytest.approx(PRESETS["dpm2_25"])
    assert preset_per_frame_ms("dpm2:cs2", 16) == pytest.approx(
        PRESETS["dpm2_16_cs2"]
    )
    # linear in steps from the nearest anchor
    assert preset_per_frame_ms("dpm2", 10) == pytest.approx(
        PRESETS["dpm2_16"] / 16 * 10
    )
    assert preset_per_frame_ms("ddpm", 500) == pytest.approx(
        PRESETS["ddpm50"] * 10
    )
    # unknown sampler combos fall back to the ddpm per-step slope
    assert preset_per_frame_ms("mystery", 10) == pytest.approx(
        PRESETS["ddpm50"] / 50 * 10
    )


def test_frame_cost_curve_modes_and_scaling():
    """The measured quadratic curves: exact at the two measured modes,
    frame terms and the per-step share of c0 scale linearly in steps, and
    unmeasured sampler specs scale the production curve by the PRESETS
    relative-work ratio."""
    c = frame_cost_curve("dpm2:cs2", 16)
    assert c == pytest.approx(CURVES["dpm2_16_cs2"])
    assert frame_cost_curve("ddpm", 50) == pytest.approx(CURVES["ddpm50"])
    assert frame_cost_curve("dpm2", 16) == pytest.approx(CURVES["dpm2_16"])
    assert frame_cost_curve("dpm2", 25) == pytest.approx(CURVES["dpm2_25"])
    # steps scaling: frame terms double, the per-request BASE floor doesn't
    c32 = frame_cost_curve("dpm2:cs2", 32)
    assert c32[1] == pytest.approx(2 * c[1])
    assert c32[2] == pytest.approx(2 * c[2])
    assert c32[0] == pytest.approx(BASE_MS + 2 * (c[0] - BASE_MS))
    # stride-1 dpm2 at other step counts scales from the NEAREST anchor
    f20 = frame_cost_curve("dpm2", 20)
    assert f20[1] == pytest.approx(CURVES["dpm2_16"][1] * 20 / 16)
    f28 = frame_cost_curve("dpm2", 28)
    assert f28[1] == pytest.approx(CURVES["dpm2_25"][1] * 28 / 25)
    # unmeasured combo: the production curve scaled by the preset ratio
    f = frame_cost_curve("mystery", 10)
    r = preset_per_frame_ms("mystery", 10) / PRESETS["dpm2_16_cs2"]
    assert f[1] == pytest.approx(c[1] * r)
    assert f[2] == pytest.approx(c[2] * r)


def test_token_cost_anchor_and_monotone():
    assert token_cost_ms(256) == pytest.approx(0.0)
    assert token_cost_ms(64) < 0.0 < token_cost_ms(1024)
    # superlinear: the 256->1024 slope exceeds the 64->256 slope
    s_lo = (token_cost_ms(256) - token_cost_ms(64)) / (256 - 64)
    s_hi = (token_cost_ms(1024) - token_cost_ms(256)) / (1024 - 256)
    assert s_hi > s_lo > 0.0


def test_curve_matches_measured_anchors():
    """The hardcoded curves reproduce every COST_ANCHORS.json measurement
    (the on-chip frame/token anchor sweep) within the fit-residual + chip
    variance envelope. Rechecked rows (warm-cache re-measurements of
    suspect points) override originals at the same operating point."""
    path = os.path.join(REPO, "COST_ANCHORS.json")
    if not os.path.exists(path):
        pytest.skip("COST_ANCHORS.json not present")
    with open(path) as f:
        data = json.load(f)
    rows = {}
    for r in data["rows"]:
        key = (r["sampler"], r["steps"], r["tok_bucket"], r["frames"])
        if r.get("recheck") or key not in rows:
            rows[key] = r["ms"]
    assert len(rows) >= 6
    for (sampler, steps, tokb, frames), ms in rows.items():
        c0, c1, c2 = frame_cost_curve(sampler, steps)
        model = c0 + c1 * frames + c2 * frames * frames \
            + token_cost_ms(tokb)
        assert model == pytest.approx(ms, rel=0.10), (
            sampler, steps, tokb, frames, ms, model)


def test_window_cost_accepts_curve():
    """window_cost prices branches on the quadratic curve when given a
    (c0, c1, c2) tuple, including both dispatches of the overflow path."""
    ladder = default_frame_buckets(4096)
    curve = (50.0, 0.1, 1e-4)

    def p(b):
        return 50.0 + 0.1 * b + 1e-4 * b * b

    row = window_cost(np.array([300.0]), (344,), curve, ladder)
    assert row["mean_proc_ms"] == pytest.approx(p(344), abs=0.01)
    fb = choose_bucket(fix_len_compatibility(900, 3), ladder)
    row2 = window_cost(np.array([900.0]), (344,), curve, ladder)
    assert row2["mean_proc_ms"] == pytest.approx(
        p(344) + SYNC_MS + p(fb), abs=0.01)
    # the token delta is a constant per dispatch: once in-window, twice
    # (wasted run + fallback) on overflow
    t = 7.5
    r3 = window_cost(np.array([300.0]), (344,), curve, ladder, tok_ms=t)
    assert r3["mean_proc_ms"] == pytest.approx(p(344) + t, abs=0.01)
    r4 = window_cost(np.array([900.0]), (344,), curve, ladder, tok_ms=t)
    assert r4["mean_proc_ms"] == pytest.approx(
        p(344) + SYNC_MS + p(fb) + 2 * t, abs=0.01)


def test_window_cost_in_window_and_overflow():
    ladder = default_frame_buckets(4096)
    pf = 1.0
    # everything fits the single 344 bucket exactly
    row = window_cost(np.array([300.0, 344.0, 100.0]), (344,), pf, ladder)
    assert row["overflow_pct"] == 0.0
    assert row["mean_proc_ms"] == pytest.approx(FIXED_MS + pf * 344, abs=0.01)
    # one overflow: wasted top run + exact fallback at its ladder bucket
    over = 900.0
    fb = choose_bucket(fix_len_compatibility(int(over), 3), ladder)
    row2 = window_cost(np.array([over]), (344,), pf, ladder)
    assert row2["overflow_pct"] == 100.0
    want = (FIXED_MS + pf * 344) + (FIXED_MS + SYNC_MS + pf * fb)
    assert row2["mean_proc_ms"] == pytest.approx(want, abs=0.01)
    # the wasted top-bucket run is counted as padding waste
    assert row2["padding_waste_pct"] > 0


def test_enumerate_windows_pruned_and_bounded():
    ladder = default_frame_buckets(2048)
    lengths = np.concatenate([np.full(10, 340.0), [500.0]])
    wins = enumerate_windows(lengths, ladder, max_branches=3)
    med = fix_len_compatibility(340, 3)
    lo_b = fix_len_compatibility(340, 3)
    hi_b = choose_bucket(fix_len_compatibility(500, 3), ladder)
    headroom = [b for b in ladder if b > hi_b][0]
    for w in wins:
        assert 1 <= len(w) <= 3
        assert w[-1] >= med  # top must cover the median
        assert tuple(sorted(w)) == w and len(set(w)) == len(w)
        # span pruning: no dead branches below the smallest request, at
        # most one ladder step of headroom past the largest
        assert w[0] >= lo_b and w[-1] <= headroom
    # non-contiguous subsets are candidates (skip a middle ladder bucket)
    assert any(
        len(w) == 2 and ladder.index(w[1]) - ladder.index(w[0]) > 1
        for w in wins
    )


def test_optimal_window_tight_traffic_is_single_bucket():
    """All-same-length traffic: the optimum is the one bucket that fits —
    any extra branch or larger top only adds padded frames."""
    ladder = default_frame_buckets(4096)
    lengths = np.full(50, 340.0)
    win, row = optimal_window(lengths, ladder, per_frame_ms=1.0)
    b = choose_bucket(fix_len_compatibility(340, 3), ladder)
    assert win == (b,)
    assert row["overflow_pct"] == 0.0
    assert row["mean_proc_ms"] == pytest.approx(FIXED_MS + b, abs=0.01)


def test_cost_policy_beats_quantile_on_long_tail():
    """The measured finding that motivated policy='cost': on long-tail
    traffic the quantile heuristic keeps the LARGEST buckets, so the short
    majority pads up to tail-sized branches; the cost optimum serves the
    majority on small buckets and eats rare overflows."""
    tool = _load_tool()
    rng = np.random.default_rng(0)
    short = rng.uniform(100, 200, 900)  # 90% of traffic
    tail = rng.uniform(1200, 1400, 100)  # 10% long tail
    lengths = np.concatenate([short, tail])
    ladder = default_frame_buckets(4096)
    pf = PRESETS["ddpm50"]

    pol = tool.policy_window(lengths, ladder, max_branches=3)
    pol_row = window_cost(lengths, pol, pf, ladder)
    win, best_row = optimal_window(lengths, ladder, pf, max_branches=3)
    # optimal is a genuine improvement, not a tie
    assert best_row["mean_proc_ms"] < 0.9 * pol_row["mean_proc_ms"]
    # bimodal traffic: the optimum serves BOTH modes — small branches for
    # the short majority plus a tail branch, which no contiguous ladder
    # span can do; check the window actually skips ladder rungs
    assert win[0] <= choose_bucket(250, ladder)
    assert win[-1] >= 1200
    # and by construction no enumerated window beats it
    for w in enumerate_windows(lengths, ladder, 3):
        assert (
            best_row["mean_proc_ms"]
            <= window_cost(lengths, w, pf, ladder)["mean_proc_ms"] + 1e-9
        )


def test_optimal_window_rejects_empty():
    with pytest.raises(ValueError):
        optimal_window(np.array([]), default_frame_buckets(512), 1.0)


def test_optimal_window_headroom_insurance():
    """headroom appends ladder steps above the optimal top without ever
    hurting observed traffic: the cost row is <= the bare optimum's (extra
    branches can only convert overflow into in-window padding)."""
    ladder = default_frame_buckets(4096)
    lengths = np.full(40, 340.0)
    bare, bare_row = optimal_window(lengths, ladder, 1.0)
    ins, ins_row = optimal_window(lengths, ladder, 1.0, headroom=1)
    assert ins[: len(bare)] == bare and len(ins) == len(bare) + 1
    assert ins[-1] == [b for b in ladder if b > bare[-1]][0]
    assert ins_row["mean_proc_ms"] <= bare_row["mean_proc_ms"] + 1e-9
    # at the ladder top there is nothing above: headroom is a no-op
    top, _ = optimal_window(np.full(4, float(ladder[-1])), ladder, 1.0,
                            headroom=1)
    assert top[-1] == ladder[-1]


def test_analyze_buckets_cli_json():
    """The offline tool end-to-end: lengths file in, one JSON line out,
    with the policy-vs-best comparison populated."""
    import tempfile

    rng = np.random.default_rng(1)
    lengths = np.concatenate(
        [rng.uniform(120, 220, 200), rng.uniform(900, 1100, 20)]
    )
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write("\n".join(f"{x:.1f}" for x in lengths))
        path = f.name
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "analyze_buckets.py"),
             "--lengths", path, "--preset", "dpm2_16_cs2", "--json"],
            capture_output=True, text=True, timeout=600,
            cwd=REPO, env={**os.environ, "JAX_PLATFORMS": "cpu"},
        )
        assert out.returncode == 0, out.stderr
        res = json.loads(out.stdout.strip().splitlines()[-1])
        assert res["n_requests"] == len(lengths)
        assert res["best"]["mean_proc_ms"] <= res["policy"]["mean_proc_ms"]
        assert res["policy_gap_pct"] >= 0.0
        assert 1 <= res["best"]["branches"] <= 3
    finally:
        os.unlink(path)


def test_stats_snapshot_input(tmp_path):
    """--stats mode consumes a serve.py /stats snapshot's recent_frames."""
    tool = _load_tool()
    snap = tmp_path / "stats.json"
    snap.write_text(json.dumps({"recent_frames": [100, 150, 200, 344]}))

    class A:
        stats = str(snap)
        lengths = seconds = None

    got = tool.load_lengths(A())
    np.testing.assert_array_equal(got, [100.0, 150.0, 200.0, 344.0])
    # no recent_tokens in this snapshot -> no token-axis data
    assert tool.load_tokens(A()) is None
    # with recent_tokens, the served token counts come through
    snap.write_text(json.dumps({"recent_frames": [100, 200],
                                "recent_tokens": [40, 600]}))
    np.testing.assert_array_equal(tool.load_tokens(A()), [40.0, 600.0])
    # and an empty snapshot is a clear error
    snap.write_text(json.dumps({"recent_frames": []}))
    with pytest.raises(SystemExit):
        tool.load_lengths(A())
