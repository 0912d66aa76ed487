"""Offline bucket-window policy analysis on a corpus length distribution.

Closes the ROADMAP debt item "bucket-ladder tuning: measure padding waste
on a real corpus length distribution". The serving deployment pads every
request onto a precompiled frame-bucket window (infer/tts.py
make_switch_buckets); this tool evaluates candidate windows AGAINST YOUR
OWN traffic instead of the built-in quantile heuristic, using the cost
model measured on the v5e (ROADMAP.md ledgers):

  proc(request) = curve(padded_frames)                       (in window)
  proc(overflow) = curve(top_bucket)                         (wasted run)
                 + SYNC + curve(ladder(L))                   (exact fallback)

with curve(b) = c0 + c1*b + c2*b^2 the measured per-mode quadratic cost
curve (infer/bucket_cost.frame_cost_curve, fitted from the on-chip anchor
sweep COST_ANCHORS.json — attention makes cost superlinear in frames, so
a flat per-frame price understates tail branches ~35%) and SYNC ~= 25 ms
the exact path's host length sync (bench.py --steps 1 decomposition). The
window policy this validates was itself measured from both sides on-chip:
[344,384,432] serves at 0.104 vs 0.142 for a no-headroom [344] (ROADMAP
bucket-window entries) — this tool generalizes that A/B to any traffic.

Input lengths (mel frames per request), one of:
  --lengths FILE      one frame count per line (or a JSON list)
  --stats FILE        a serve.py /stats snapshot containing recent_frames
  --seconds FILE      speech seconds per line (converted via hop/sr)

Usage:
  python tools/analyze_buckets.py --lengths corpus_frames.txt \
      --preset dpm2_16_cs2 --max-branches 3 --top 8

The reference has no analogue: it pads per-sample and re-traces
(/root/reference/inference.py runs eagerly per utterance), so bucket
policy is a TPU-native concern.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from unitspeech_tpu.infer.bucket_cost import (  # noqa: E402
    PRESETS,
    enumerate_windows,
    frame_cost_curve,
    quantile_window,
    token_cost_ms,
    window_cost,
)

# preset name -> the (sampler, steps) spec frame_cost_curve understands
PRESET_SPECS = {
    "ddpm50": ("ddpm", 50),
    "dpm2_25": ("dpm2", 25),
    "dpm2_16": ("dpm2", 16),
    "dpm2_16_cs2": ("dpm2:cs2", 16),
}
from unitspeech_tpu.ops.masking import (  # noqa: E402
    choose_bucket,
    default_frame_buckets,
)

# the Synthesizer's default encoder-side padding ladder (infer/tts.py)
TOKEN_LADDER = tuple(2 ** i for i in range(4, 11))


def load_lengths(args) -> np.ndarray:
    if args.stats:
        with open(args.stats) as f:
            snap = json.load(f)
        frames = snap.get("recent_frames")
        if not frames:
            raise SystemExit("stats snapshot has no recent_frames "
                             "(daemon too old or no traffic yet)")
        return np.asarray(frames, np.float64)
    if args.filelist:
        # reference-format filelist ("path|transcript|spk"): phonemize each
        # transcript (espeak if present, else the built-in rule G2P) and
        # model frames ~= tokens * frames-per-token — the same linear
        # surrogate the serving calibrator fits, good enough for WINDOW
        # ranking, which only needs the distribution's shape
        from unitspeech_tpu import text as text_frontend

        ph = text_frontend.get_phonemizer(args.language, fallback=True)
        if ph is None:
            raise SystemExit(f"no phonemizer/G2P for {args.language!r}")
        toks = []
        with open(args.filelist, encoding="utf-8") as f:
            for ln in f:
                parts = ln.rstrip("\n").split("|")
                if len(parts) >= 2 and parts[1].strip():
                    toks.append(
                        len(text_frontend.text_to_sequence(parts[1], ph))
                    )
        if not toks:
            raise SystemExit("filelist has no 'path|transcript' lines")
        return np.asarray(toks, np.float64) * args.frames_per_token
    path = args.lengths or args.seconds
    with open(path) as f:
        text = f.read().strip()
    if text.startswith("["):
        vals = np.asarray(json.loads(text), np.float64)
    else:
        vals = np.asarray([float(x) for x in text.split()], np.float64)
    if args.seconds:
        vals = vals * args.sr / args.hop
    return vals


def load_tokens(args) -> "np.ndarray | None":
    """Served per-request token counts, available only from a /stats
    snapshot's recent_tokens ring (the daemon records them alongside
    recent_frames). None for the other input modes."""
    if args.stats:
        with open(args.stats) as f:
            snap = json.load(f)
        toks = snap.get("recent_tokens")
        if toks:
            return np.asarray(toks, np.float64)
    return None


# the make_switch_buckets(policy="quantile") heuristic, shared with the
# live serving path (single source of truth in infer/bucket_cost.py)
policy_window = quantile_window


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--lengths", help="frame counts, one per line or JSON")
    src.add_argument("--stats", help="serve.py /stats snapshot (JSON file)")
    src.add_argument("--seconds", help="speech seconds, one per line")
    src.add_argument("--filelist", help="reference-format filelist "
                                        "(path|transcript|spk): transcripts "
                                        "are phonemized and frames modeled "
                                        "as tokens * --frames-per-token")
    ap.add_argument("--language", default="en-us",
                    help="phonemizer language for --filelist")
    ap.add_argument("--frames-per-token", type=float, default=2.46,
                    help="linear frames~tokens surrogate for --filelist "
                         "(2.46 = the published model's 344 frames / 140 "
                         "tokens operating point, BASELINE.md protocol)")
    ap.add_argument("--preset", default="ddpm50", choices=sorted(PRESETS),
                    help="sampler cost preset (selects the measured "
                         "quadratic cost curve)")
    ap.add_argument("--per-frame-ms", type=float, default=None,
                    help="override with a flat per-padded-frame price "
                         "(the legacy linear model)")
    ap.add_argument("--tok-bucket", type=int, default=256,
                    help="typical token bucket of the traffic — shifts "
                         "absolute costs by the measured encoder token "
                         "curve (never changes window ranking)")
    ap.add_argument("--max-branches", type=int, default=3,
                    help="lax.switch branch budget (compile time scales "
                         "with it; production default 3)")
    ap.add_argument("--ladder-max", type=int, default=4096)
    ap.add_argument("--hop", type=int, default=256)
    ap.add_argument("--sr", type=int, default=22050)
    ap.add_argument("--top", type=int, default=8, help="rows to print")
    ap.add_argument("--json", action="store_true", help="one JSON line")
    args = ap.parse_args()

    lengths = load_lengths(args)
    per_frame = args.per_frame_ms or frame_cost_curve(
        *PRESET_SPECS[args.preset])
    tok_ms = token_cost_ms(args.tok_bucket) if args.per_frame_ms is None \
        else 0.0
    tok_counts = load_tokens(args)
    if tok_counts is not None and args.per_frame_ms is None:
        # a /stats snapshot carries the SERVED token distribution — use
        # its mean bucketed encoder delta instead of the --tok-bucket knob
        tok_ms = float(np.mean([token_cost_ms(choose_bucket(int(t),
                                                            TOKEN_LADDER))
                                for t in tok_counts]))
    ladder = default_frame_buckets(args.ladder_max)

    rows = [window_cost(lengths, w, per_frame, ladder, tok_ms=tok_ms)
            for w in enumerate_windows(lengths, ladder, args.max_branches)]
    rows.sort(key=lambda r: r["mean_proc_ms"])
    pol = policy_window(lengths, ladder, max_branches=args.max_branches)
    pol_row = window_cost(lengths, pol, per_frame, ladder, tok_ms=tok_ms)

    speech_ms = float(lengths.mean()) * args.hop / args.sr * 1000.0
    result = {
        "n_requests": int(len(lengths)),
        "frames_p50": float(np.median(lengths)),
        "frames_p95": float(np.percentile(lengths, 95)),
        "preset": args.preset,
        "per_frame_ms": per_frame,
        "best": {**rows[0], "expected_rtf":
                 round(rows[0]["mean_proc_ms"] / speech_ms, 4)},
        "policy": {**pol_row, "expected_rtf":
                   round(pol_row["mean_proc_ms"] / speech_ms, 4)},
        "policy_gap_pct": round(100.0 * (pol_row["mean_proc_ms"] /
                                         rows[0]["mean_proc_ms"] - 1.0), 2),
    }
    if args.json:
        print(json.dumps(result))
        return

    cost_desc = (f"{per_frame} ms/frame linear" if args.per_frame_ms
                 else "measured quadratic curve "
                      + str(tuple(round(c, 5) for c in per_frame)))
    print(f"{len(lengths)} requests | frames p50 {result['frames_p50']:.0f} "
          f"p95 {result['frames_p95']:.0f} max {lengths.max():.0f} | "
          f"preset {args.preset} ({cost_desc})")
    print(f"{'window':>28} {'ovfl%':>6} {'waste%':>7} "
          f"{'mean ms':>8} {'p95 ms':>8} {'RTF':>7}")
    for r in rows[:args.top]:
        mark = " <- quantile" if tuple(r["window"]) == pol else ""
        print(f"{str(r['window']):>28} {r['overflow_pct']:>6} "
              f"{r['padding_waste_pct']:>7} {r['mean_proc_ms']:>8} "
              f"{r['p95_proc_ms']:>8} "
              f"{r['mean_proc_ms'] / speech_ms:>7.4f}{mark}")
    if tuple(pol_row["window"]) not in [tuple(r["window"]) for r in
                                        rows[:args.top]]:
        r = pol_row
        print(f"{str(r['window']):>28} {r['overflow_pct']:>6} "
              f"{r['padding_waste_pct']:>7} {r['mean_proc_ms']:>8} "
              f"{r['p95_proc_ms']:>8} "
              f"{r['mean_proc_ms'] / speech_ms:>7.4f} <- quantile")
    print(f"the quantile heuristic's window {list(pol)} is within "
          f"{result['policy_gap_pct']}% of the best enumerated window "
          f"(the serving default, policy='cost', picks the best)")


if __name__ == "__main__":
    main()
