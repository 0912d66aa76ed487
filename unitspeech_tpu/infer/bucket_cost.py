"""Measured cost model for the serving frame-bucket window.

Bucket-switch serving (infer/tts.py `_synthesize_bucket_switch`) pads every
request onto one of a small set of precompiled frame buckets (`lax.switch`
branches). Which window of ladder buckets to compile is a cost tradeoff:

  in-window request:  proc = FIXED + per_frame * padded_bucket
  overflow request:   proc = (FIXED + per_frame * top_bucket)   wasted run
                           + (FIXED + SYNC + per_frame * exact_bucket)

with the constants measured on one v5e through the axon tunnel (ROADMAP.md
"switch-vs-forced residual decomposed at steps=1"): FIXED ~= 61 ms is the
per-request floor (H2D + D2H + dispatch + 1-step tail), SYNC ~= 25 ms is
the exact path's extra host length sync, and per_frame comes from the
measured forced RTF of the sampler mode in use.

This module is the single source of truth for that model; it is consumed
by `Synthesizer.make_switch_buckets(policy="cost")` (live serving, fed by
the duration calibrator's observed lengths) and by
`tools/analyze_buckets.py` (offline, fed by a corpus file or a /stats
snapshot). Everything here is host-side numpy — no jax.

The reference has no analogue: it pads per-sample and re-traces
(/root/reference/inference.py runs eagerly per utterance), so bucket
policy is a TPU-native concern.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

from ..ops.masking import choose_bucket, fix_len_compatibility

# Per-request cost constants, measured on one v5e via the axon tunnel
# (bench.py --steps 1 decomposition, ROADMAP.md r4 ledger).
FIXED_MS = 61.0  # per-request floor: H2D + D2H + dispatch + 1-step tail
SYNC_MS = 25.0   # exact path's extra dispatch + host length sync

# per_frame_ms presets derived from measured forced RTF at 344 frames
# (hop 256 / sr 22050 -> 3.994 s speech): (rtf * 3994 - FIXED) / 344.
PRESETS = {
    # 50-step DDPM, dual CFG, int8 deep convs (rtf_forced ~0.0957)
    "ddpm50": 0.933,
    # dpm2@25 (rtf ~0.0548)
    "dpm2_25": 0.459,
    # dpm2@16 (rtf ~0.0388)
    "dpm2_16": 0.273,
    # recommended production fast mode dpm2@16:cs2 (rtf ~0.0337)
    "dpm2_16_cs2": 0.214,
}


def preset_per_frame_ms(sampler: str = "ddpm", steps: int = 50) -> float:
    """Per-padded-frame device cost (ms) for a sampler spec ("ddpm",
    "dpm2", "dpm2:cs2", ...) at `steps`, scaled linearly in steps from the
    nearest measured anchor. Good to ~10% across the measured ladder —
    plenty for window ranking, where candidate costs differ by 2x steps."""
    base, _, stride_s = sampler.partition(":cs")
    stride = int(stride_s) if stride_s else 1
    # (base, stride) -> [(steps, per_frame_ms)] measured anchors
    anchors = {
        ("ddpm", 1): [(50, PRESETS["ddpm50"])],
        ("dpm2", 1): [(16, PRESETS["dpm2_16"]), (25, PRESETS["dpm2_25"])],
        ("dpm2", 2): [(16, PRESETS["dpm2_16_cs2"])],
    }
    rows = anchors.get((base, stride))
    if rows is None:
        # unknown combo: fall back to the per-step slope of plain ddpm
        return PRESETS["ddpm50"] / 50.0 * steps
    a_steps, a_cost = min(rows, key=lambda r: abs(r[0] - steps))
    return a_cost / a_steps * steps


def window_cost(
    lengths: np.ndarray,
    window: Sequence[int],
    per_frame_ms: float,
    ladder: Sequence[int],
    num_down: int = 3,
) -> Dict[str, object]:
    """Expected per-request proc cost (ms) of serving `lengths` (mel frames,
    pre-rounding) on a bucket `window`, plus padding/overflow stats."""
    lengths = np.asarray(lengths, np.float64)
    window = tuple(sorted(int(b) for b in window))
    top = window[-1]
    padded = np.empty_like(lengths)
    cost = np.empty_like(lengths)
    n_over = 0
    for i, length in enumerate(lengths):
        need = fix_len_compatibility(int(np.ceil(length)), num_down)
        if need <= top:
            b = choose_bucket(need, window)
            padded[i] = b
            cost[i] = FIXED_MS + per_frame_ms * b
        else:
            # overflow: wasted padded sampler run at the top branch, then
            # the exact-path fallback at the global-ladder bucket
            n_over += 1
            b = choose_bucket(need, ladder)
            padded[i] = top + b
            cost[i] = (FIXED_MS + per_frame_ms * top) + (
                FIXED_MS + SYNC_MS + per_frame_ms * b
            )
    # `padded` counts the overflow's wasted top-bucket run as waste
    waste = float(padded.sum() / lengths.sum() - 1.0)
    return {
        "window": list(window),
        "branches": len(window),
        "overflow_pct": round(100.0 * n_over / len(lengths), 2),
        "padding_waste_pct": round(100.0 * waste, 2),
        "mean_proc_ms": round(float(cost.mean()), 2),
        "p95_proc_ms": round(float(np.percentile(cost, 95)), 2),
    }


def enumerate_windows(
    lengths: np.ndarray,
    ladder: Sequence[int],
    max_branches: int,
    num_down: int = 3,
) -> List[Tuple[int, ...]]:
    """Every contiguous ladder span of 1..max_branches buckets whose top
    covers at least the traffic median (narrower tops drown in overflow)."""
    ladder = tuple(ladder)
    med = fix_len_compatibility(int(np.median(lengths)), num_down)
    out: List[Tuple[int, ...]] = []
    for hi_i in range(len(ladder)):
        if ladder[hi_i] < med:
            continue
        for n in range(1, max_branches + 1):
            lo_i = hi_i - n + 1
            if lo_i < 0:
                continue
            out.append(ladder[lo_i : hi_i + 1])
    return out

def optimal_window(
    lengths: Sequence[float],
    ladder: Sequence[int],
    per_frame_ms: float,
    max_branches: int = 3,
    num_down: int = 3,
) -> Tuple[Tuple[int, ...], Dict[str, object]]:
    """The contiguous ladder window (<= max_branches branches) minimizing
    expected per-request cost on the observed `lengths`. Returns
    (window, cost_row). O(len(ladder) * max_branches) window candidates,
    each scored in one vectorized-ish pass — fine for serving startup."""
    lengths = np.asarray(lengths, np.float64)
    if lengths.size == 0:
        raise ValueError("optimal_window needs at least one observed length")
    best_w: Tuple[int, ...] | None = None
    best_row: Dict[str, object] | None = None
    for w in enumerate_windows(lengths, ladder, max_branches, num_down):
        row = window_cost(lengths, w, per_frame_ms, ladder, num_down)
        if best_row is None or row["mean_proc_ms"] < best_row["mean_proc_ms"]:
            best_w, best_row = w, row
    assert best_w is not None and best_row is not None
    return best_w, best_row
