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


def _needs(lengths: np.ndarray, num_down: int) -> np.ndarray:
    """Vectorized fix_len_compatibility: frame needs rounded up to the
    U-Net's 2**num_down granularity."""
    m = 2 ** num_down
    return (np.ceil(np.ceil(np.asarray(lengths, np.float64)) / m) * m
            ).astype(np.int64)


def _bucket(length: int, ladder: Sequence[int]) -> int:
    """Smallest ladder bucket >= length (ops.masking.choose_bucket
    semantics, re-stated here so this module stays numpy-only); beyond the
    ladder, the 2**3-rounded length itself."""
    for b in ladder:
        if b >= length:
            return int(b)
    return int(-(-length // 8) * 8)


def quantile_window(
    lengths: Sequence[float],
    ladder: Sequence[int],
    lo_q: float = 0.05,
    hi_q: float = 1.0,
    max_branches: int = 3,
    num_down: int = 3,
) -> Tuple[int, ...]:
    """The quantile bucket-window heuristic (the serving default,
    Synthesizer.make_switch_buckets policy="quantile", which delegates
    here): every ladder bucket between ~P(lo_q) and ~P(hi_q) of the
    observed lengths plus one ladder step of headroom, keeping the LARGEST
    max_branches. Cheap and near-optimal on tight distributions; on
    long-tail traffic prefer `optimal_window` (measured 2.31x faster on
    chip, BUCKET_AB.json). `lengths` are post-length_scale mel frames."""
    lengths = np.asarray(lengths, np.float64)
    if lengths.size == 0:
        raise ValueError("quantile_window needs at least one length")
    m = 2 ** num_down
    lo = float(np.quantile(lengths, lo_q))
    hi = float(np.quantile(lengths, hi_q))
    lo_b = _bucket(int(-(-int(lo) // m) * m), ladder)
    hi_b = _bucket(int(-(-int(np.ceil(hi)) // m) * m), ladder)
    # one ladder step of headroom above the observed hi_q: an overflow
    # costs ~2x (wasted sampler + fallback dispatch) while the extra
    # branch only costs compile time, so err on covering the tail
    above = [b for b in ladder if b > hi_b]
    if above:
        hi_b = above[0]
    window = [b for b in ladder if lo_b <= b <= hi_b]
    if not window:
        window = [hi_b]
    return tuple(window[-max_branches:])


def window_cost(
    lengths: np.ndarray,
    window: Sequence[int],
    per_frame_ms: float,
    ladder: Sequence[int],
    num_down: int = 3,
) -> Dict[str, object]:
    """Expected per-request proc cost (ms) of serving `lengths` (mel frames,
    pre-rounding) on a bucket `window`, plus padding/overflow stats.
    Vectorized (one searchsorted per array) so enumerating ~1e3 candidate
    windows over a 4096-entry /stats ring stays sub-second."""
    lengths = np.asarray(lengths, np.float64)
    win = np.asarray(sorted(int(b) for b in window), np.int64)
    top = int(win[-1])
    need = _needs(lengths, num_down)
    over = need > top
    # in-window: smallest branch >= need (choose_bucket semantics)
    in_b = win[np.minimum(np.searchsorted(win, need), len(win) - 1)]
    in_cost = FIXED_MS + per_frame_ms * in_b
    # overflow: wasted padded sampler run at the top branch, then the
    # exact-path fallback at the global-ladder bucket (beyond the ladder,
    # choose_bucket falls back to the rounded length itself)
    lad = np.asarray(ladder, np.int64)
    fb = np.where(
        need > lad[-1], need,
        lad[np.minimum(np.searchsorted(lad, need), len(lad) - 1)],
    )
    ov_cost = (FIXED_MS + per_frame_ms * top) + (
        FIXED_MS + SYNC_MS + per_frame_ms * fb
    )
    cost = np.where(over, ov_cost, in_cost)
    # overflow's wasted top-bucket run counts as padding waste
    padded = np.where(over, top + fb, in_b).astype(np.float64)
    waste = float(padded.sum() / lengths.sum() - 1.0)
    return {
        "window": [int(b) for b in win],
        "branches": len(win),
        "overflow_pct": round(100.0 * float(over.mean()), 2),
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
    """Candidate windows: every ascending subset of 1..max_branches ladder
    buckets within the traffic's span whose top covers at least the traffic
    median (narrower tops drown in overflow). Windows need NOT be
    contiguous ladder spans — a lax.switch executable accepts any ascending
    bucket tuple, and on bimodal traffic {short-bucket, tail-bucket} beats
    every contiguous span. The span pruning (no branch below the smallest
    request's bucket — it would never be chosen — and at most one ladder
    step of headroom past the largest) keeps the subset count ~1e3 for a
    typical 20-bucket traffic span at max_branches=3."""
    from itertools import combinations

    need = _needs(lengths, num_down)
    med = int(_needs([float(np.median(lengths))], num_down)[0])
    lo, hi = int(need.min()), int(need.max())
    cands = [int(b) for b in ladder if b >= lo]
    n_cover = sum(1 for b in cands if b < hi) + 1  # first bucket >= hi ...
    cands = cands[: n_cover + 1]  # ... plus one ladder step of headroom
    out: List[Tuple[int, ...]] = []
    for n in range(1, max_branches + 1):
        for c in combinations(cands, n):
            if c[-1] >= med:
                out.append(c)
    return out

def optimal_window(
    lengths: Sequence[float],
    ladder: Sequence[int],
    per_frame_ms: float,
    max_branches: int = 3,
    num_down: int = 3,
    headroom: int = 0,
) -> Tuple[Tuple[int, ...], Dict[str, object]]:
    """The ascending bucket subset (<= max_branches branches, see
    enumerate_windows) minimizing expected per-request cost on the
    observed `lengths`. Returns (window, cost_row). ~1e3 candidates x one
    vectorized cost pass each — sub-second at serving startup.

    headroom: EXTRA ladder steps appended above the optimal top (the
    serving policies pass 1). The optimum is fit to observed traffic only;
    an unseen length one frame past the top pays the ~2x overflow penalty,
    while an insurance branch costs compile time and never increases any
    observed request's cost (it can only convert observed overflow into
    in-window padding). Branch count may thus reach max_branches +
    headroom."""
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
    if headroom > 0:
        above = [int(b) for b in ladder if b > best_w[-1]][:headroom]
        if above:
            best_w = best_w + tuple(above)
            best_row = window_cost(lengths, best_w, per_frame_ms, ladder,
                                   num_down)
    return best_w, best_row
