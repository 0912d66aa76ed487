"""Measured cost model for the serving frame-bucket window.

Bucket-switch serving (infer/tts.py `_synthesize_bucket_switch`) pads every
request onto one of a small set of precompiled frame buckets (`lax.switch`
branches). Which window of ladder buckets to compile is a cost tradeoff:

  in-window request:  proc = proc_ms(padded_bucket)
  overflow request:   proc = proc_ms(top_bucket)                wasted run
                           + SYNC + proc_ms(exact_bucket)    exact fallback

with proc_ms either the measured QUADRATIC curve per sampler mode
(frame_cost_curve: c0 + c1*b + c2*b^2, fitted from the COST_ANCHORS.json
frame/token sweep — the U-Net's attention is O(frames^2), so a pure
per-frame price understates tail-sized branches by ~35%, BUCKET_AB.json)
or the legacy linear model FIXED + per_frame * b (any scalar passed where
a curve is accepted). Constants measured on one v5e through the axon
tunnel (ROADMAP.md "switch-vs-forced residual decomposed at steps=1"):
FIXED ~= 61 ms is the per-request floor (H2D + D2H + dispatch + 1-step
tail), SYNC ~= 25 ms is the exact path's extra host length sync.

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
# Since the r4s6 anchor sweep these serve two roles: the LEGACY linear
# model (scalar `per_frame_ms` accepted everywhere below) and the relative
# sampler-work table that scales the measured quadratic curves onto
# unmeasured sampler modes (frame_cost_curve fallback).
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

# Measured quadratic frame-cost curves (COST_ANCHORS.json, fitted by
# tools/refit_cost_model.py): proc_ms(b) = c0 + c1*b + c2*b^2 for a forced
# single-dispatch synthesis at frame bucket b and token bucket 256, on one
# v5e via the axon tunnel. The r4s5 on-chip A/B (BUCKET_AB.json) showed the
# linear model understating tail-sized branches 33-39%: the U-Net's
# attention term is O(frames^2) and the encoder's token cost was folded
# into the per-frame price. These curves reproduce every measured anchor
# (see test_bucket_cost.test_curve_matches_measured_anchors).
CURVES = {
    # production fast mode dpm2@16:cs2 (frame sweep 216/344/696/1256,
    # LSQ fit, residuals <= 7.8%)
    "dpm2_16_cs2": (104.74, 0.07749, 1.525e-4),
    # parity headline ddpm@50 (shared-shape fit on its 344/1256 anchors;
    # sampler-work scale 3.46x the fast mode)
    "ddpm50": (241.58, 0.26783, 5.272e-4),
    # stride-1 dpm2 modes (shared-shape on 344/1256 anchors; scales 1.54x
    # and 1.93x — CFG delta caching saves ~35% of dpm2@16's sampler work)
    "dpm2_16": (100.96, 0.11932, 2.348e-4),
    "dpm2_25": (133.35, 0.14934, 2.939e-4),
}

# Encoder-side token cost E(tok) = t1*tok + t2*tok^2 (self-attention and
# MAS are O(tok^2)); measured from the tok {64, 256, 1024} sweep at fixed
# 344 frames. The CURVES constants are anchored at token bucket 256;
# token_cost_ms() returns the delta vs that anchor.
TOKEN_CURVE = (0.02418, 7.745e-5)
_TOK_REF = 256


def _e_tok(tok: float) -> float:
    return TOKEN_CURVE[0] * tok + TOKEN_CURVE[1] * tok * tok


def token_cost_ms(tok_bucket: int) -> float:
    """Per-request encoder cost delta (ms) of serving at `tok_bucket`
    vs the curves' 256-token anchor. Independent of the frame window, so
    it never changes a window RANKING — add it when absolute latency
    numbers matter (offline analysis, capacity planning)."""
    return _e_tok(float(tok_bucket)) - _e_tok(float(_TOK_REF))


# Per-request floor at the token anchor: tunnel/dispatch FIXED plus the
# encoder at tok256. The remainder of a curve's c0 is per-sampler-step
# constant work (time embedding, schedule, scan overhead), which scales
# with step count in frame_cost_curve.
BASE_MS = FIXED_MS + _e_tok(_TOK_REF)


def frame_cost_curve(sampler: str = "ddpm", steps: int = 50):
    """(c0, c1, c2) quadratic frame-cost curve for a sampler spec at
    `steps`, from the measured anchors: exact for the four measured modes
    (dpm2:cs2@16, ddpm@50, dpm2@16, dpm2@25 — frame terms and the
    per-step share of c0 scaled linearly in steps from the nearest
    anchor); other sampler specs scale the production curve by the
    PRESETS relative-work ratio. Pass the result anywhere a scalar
    `per_frame_ms` is accepted (window_cost / optimal_window /
    make_switch_buckets)."""
    base, _, stride_s = sampler.partition(":cs")
    stride = int(stride_s) if stride_s else 1
    refs = {("dpm2", 2): [("dpm2_16_cs2", 16)],
            ("ddpm", 1): [("ddpm50", 50)],
            ("dpm2", 1): [("dpm2_16", 16), ("dpm2_25", 25)]}.get(
        (base, stride))
    if refs is None:
        c0, c1, c2 = CURVES["dpm2_16_cs2"]
        r = preset_per_frame_ms(sampler, steps) / PRESETS["dpm2_16_cs2"]
    else:
        name, ref_steps = min(refs, key=lambda nr: abs(nr[1] - steps))
        c0, c1, c2 = CURVES[name]
        r = steps / ref_steps
    return (BASE_MS + (c0 - BASE_MS) * r, c1 * r, c2 * r)


def _proc_ms(frames, cost):
    """Vectorized per-request cost at padded frame count(s) `frames`.
    `cost` is either a (c0, c1, c2) curve (frame_cost_curve) or a scalar
    per-frame price (the legacy linear model FIXED + per_frame * b)."""
    b = np.asarray(frames, np.float64)
    if isinstance(cost, (tuple, list)):
        c0, c1, c2 = (float(c) for c in cost)
        return c0 + c1 * b + c2 * b * b
    return FIXED_MS + float(cost) * b


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
    per_frame_ms,
    ladder: Sequence[int],
    num_down: int = 3,
    tok_ms: float = 0.0,
) -> Dict[str, object]:
    """Expected per-request proc cost (ms) of serving `lengths` (mel frames,
    pre-rounding) on a bucket `window`, plus padding/overflow stats.
    Vectorized (one searchsorted per array) so enumerating ~1e3 candidate
    windows over a 4096-entry /stats ring stays sub-second.

    per_frame_ms: a (c0, c1, c2) curve from `frame_cost_curve` (the
    measured quadratic model — use this for absolute numbers and tail-heavy
    ranking) or a scalar per-frame price (the legacy linear model).
    tok_ms: optional per-request token-cost delta (token_cost_ms) — a
    constant offset for absolute reporting, never affects ranking."""
    lengths = np.asarray(lengths, np.float64)
    win = np.asarray(sorted(int(b) for b in window), np.int64)
    top = int(win[-1])
    need = _needs(lengths, num_down)
    over = need > top
    # in-window: smallest branch >= need (choose_bucket semantics)
    in_b = win[np.minimum(np.searchsorted(win, need), len(win) - 1)]
    in_cost = _proc_ms(in_b, per_frame_ms) + tok_ms
    # overflow: wasted padded sampler run at the top branch, then the
    # exact-path fallback at the global-ladder bucket (beyond the ladder,
    # choose_bucket falls back to the rounded length itself)
    lad = np.asarray(ladder, np.int64)
    fb = np.where(
        need > lad[-1], need,
        lad[np.minimum(np.searchsorted(lad, need), len(lad) - 1)],
    )
    # (the fallback re-runs the whole pipeline, so the token delta — like
    # the encoder cost inside c0 — is paid once per dispatch)
    ov_cost = _proc_ms(top, per_frame_ms) + SYNC_MS + _proc_ms(
        fb, per_frame_ms) + 2.0 * tok_ms
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
    per_frame_ms,
    max_branches: int = 3,
    num_down: int = 3,
    headroom: int = 0,
) -> Tuple[Tuple[int, ...], Dict[str, object]]:
    """The ascending bucket subset (<= max_branches branches, see
    enumerate_windows) minimizing expected per-request cost on the
    observed `lengths`. Returns (window, cost_row). ~1e3 candidates x one
    vectorized cost pass each — sub-second at serving startup.
    `per_frame_ms`: a frame_cost_curve tuple (preferred — the measured
    quadratic model prices tail branches correctly) or a legacy scalar.

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
