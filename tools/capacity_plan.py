"""Capacity planning for a TPU serving deployment from the measured cost
model.

Answers the two operator questions the measured constants make tractable:

  * "How many chips do I need for this traffic at this load?"
    (--target-qps or --target-streams)
  * "What load can N chips sustain?"  (--chips)

The per-request device cost comes from the same measured model serving
uses (infer/bucket_cost.py: quadratic frame curves + token cost, fitted
from the on-chip anchor sweep COST_ANCHORS.json, predictions within ~5%
of measured serving — BUCKET_AB.json). Batching amortizes the FIXED
per-dispatch floor across rows (the dynamic batcher packs same-spec
requests into one dispatch):

  per_row_ms(B) ~= eta * [device_ms(bucket) + FIXED/B]

with device_ms = curve(bucket) - FIXED and eta = 1.0: the model needs no
fudge — measured batch-8 forced synthesis (docs/SERVING.md: 0.086
RTF/utt at ddpm@50) matches curve(344) amortized 8 ways (0.0858) within
0.3%, a cross-check of the whole refit (rows in a batch share one
H2D+dispatch but pad to a common frame bucket, which the window cost
already prices). Throughput discounts a utilization factor (default
0.75) for closed-loop arrival raggedness: the measured 8-client daemon
run sustained 31.4x realtime/chip ~= 0.84 of the saturated batch-4
bound, ROADMAP r4s4 ledger.

Traffic inputs are shared with tools/analyze_buckets.py (--lengths /
--stats / --seconds / --filelist). Host-side numpy only — no TPU use.

Usage:
  python tools/capacity_plan.py --filelist train.txt --preset dpm2_16_cs2 \
      --target-qps 20
  python tools/capacity_plan.py --stats stats.json --chips 4 --json

The reference has no serving story at all (one-shot eager inference.py),
so this is a TPU-native deliverable with no reference analogue.
"""

from __future__ import annotations

import argparse
import json
import math
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from unitspeech_tpu.infer.bucket_cost import (  # noqa: E402
    FIXED_MS,
    frame_cost_curve,
    optimal_window,
    token_cost_ms,
    window_cost,
)
from unitspeech_tpu.ops.masking import (  # noqa: E402
    choose_bucket,
    default_frame_buckets,
)
from tools.analyze_buckets import (  # noqa: E402
    PRESET_SPECS,
    TOKEN_LADDER,
    load_lengths,
    load_tokens,
)

# batch-overhead factor: measured batch-8 per-utt RTF / the shared-dispatch
# model's prediction (see module docstring; 0.086 measured vs 0.0858
# modeled at ddpm@50 -> no correction needed)
ETA_BATCH = 1.0
# closed-loop utilization: measured daemon throughput / saturated bound
DEFAULT_UTILIZATION = 0.75


def plan(
    lengths: np.ndarray,
    curve,
    ladder,
    batch: int = 4,
    max_branches: int = 3,
    num_down: int = 3,
    tok_ms: float = 0.0,
    utilization: float = DEFAULT_UTILIZATION,
    hop: int = 256,
    sr: int = 22050,
):
    """Per-chip capacity for `lengths` traffic under the cost `curve`.

    Returns a dict with the recommended window, mean per-request device
    cost at the given effective batch size, per-chip sustainable QPS and
    concurrent realtime streams."""
    lengths = np.asarray(lengths, np.float64)
    window, row = optimal_window(lengths, ladder, curve,
                                 max_branches=max_branches,
                                 num_down=num_down, headroom=1)
    row = window_cost(lengths, window, curve, ladder, num_down,
                      tok_ms=tok_ms)
    mean_single_ms = float(row["mean_proc_ms"])
    # batching shares one dispatch across rows: device part stays, FIXED
    # splits B ways; eta covers the measured residual
    b = max(int(batch), 1)
    mean_batched_ms = ETA_BATCH * (mean_single_ms - FIXED_MS + FIXED_MS / b)
    speech_s = float(lengths.mean()) * hop / sr
    # one chip serializes dispatches: capacity = requests whose device time
    # fits in a wall-clock second, discounted for arrival raggedness
    qps_chip = utilization * 1000.0 / mean_batched_ms
    streams_chip = qps_chip * speech_s  # concurrent realtime streams
    return {
        "window": list(window),
        "overflow_pct": row["overflow_pct"],
        "mean_speech_s": round(speech_s, 3),
        "mean_proc_ms_single": round(mean_single_ms, 1),
        "mean_proc_ms_batched": round(mean_batched_ms, 1),
        "effective_batch": b,
        "utilization": utilization,
        "qps_per_chip": round(qps_chip, 2),
        "streams_per_chip": round(streams_chip, 1),
    }


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--lengths")
    src.add_argument("--stats")
    src.add_argument("--seconds")
    src.add_argument("--filelist")
    ap.add_argument("--language", default="en-us")
    ap.add_argument("--frames-per-token", type=float, default=2.46)
    ap.add_argument("--preset", default="dpm2_16_cs2",
                    choices=sorted(PRESET_SPECS),
                    help="sampler mode (the production fast default)")
    ap.add_argument("--batch", type=int, default=4,
                    help="effective dispatch batch size (the measured "
                         "ladder guidance: 4-8 for interactive traffic)")
    ap.add_argument("--max-branches", type=int, default=3)
    ap.add_argument("--utilization", type=float,
                    default=DEFAULT_UTILIZATION,
                    help="fraction of saturated throughput a closed-loop "
                         "deployment sustains (measured ~0.75-0.8)")
    ap.add_argument("--tok-bucket", type=int, default=256,
                    help="typical token bucket (overridden by a --stats "
                         "snapshot's recent_tokens)")
    ap.add_argument("--target-qps", type=float, default=None)
    ap.add_argument("--target-streams", type=float, default=None,
                    help="concurrent realtime listener streams to sustain")
    ap.add_argument("--chips", type=int, default=None,
                    help="instead of a target: report what N chips sustain")
    ap.add_argument("--ladder-max", type=int, default=4096)
    ap.add_argument("--hop", type=int, default=256)
    ap.add_argument("--sr", type=int, default=22050)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    lengths = load_lengths(args)
    curve = frame_cost_curve(*PRESET_SPECS[args.preset])
    tok_ms = token_cost_ms(args.tok_bucket)
    toks = load_tokens(args)
    if toks is not None:
        tok_ms = float(np.mean([token_cost_ms(choose_bucket(int(t),
                                                            TOKEN_LADDER))
                                for t in toks]))
    ladder = default_frame_buckets(args.ladder_max)
    cap = plan(lengths, curve, ladder, batch=args.batch,
               max_branches=args.max_branches, tok_ms=tok_ms,
               utilization=args.utilization, hop=args.hop, sr=args.sr,
               num_down=3)

    result = {"preset": args.preset, "n_requests": int(len(lengths)), **cap}
    if args.target_qps is not None:
        result["target_qps"] = args.target_qps
        result["chips_needed"] = math.ceil(args.target_qps
                                           / cap["qps_per_chip"])
    if args.target_streams is not None:
        result["target_streams"] = args.target_streams
        result["chips_needed_streams"] = math.ceil(
            args.target_streams / cap["streams_per_chip"])
    if args.chips is not None:
        result["chips"] = args.chips
        result["sustainable_qps"] = round(args.chips * cap["qps_per_chip"],
                                          2)
        result["sustainable_streams"] = round(
            args.chips * cap["streams_per_chip"], 1)

    if args.json:
        print(json.dumps(result))
        return
    print(f"traffic: {result['n_requests']} requests, mean speech "
          f"{cap['mean_speech_s']} s | preset {args.preset} | window "
          f"{cap['window']} (overflow {cap['overflow_pct']}%)")
    print(f"per-request device cost: {cap['mean_proc_ms_single']} ms solo, "
          f"{cap['mean_proc_ms_batched']} ms/row at batch "
          f"{cap['effective_batch']}")
    print(f"per chip at {cap['utilization']:.0%} utilization: "
          f"{cap['qps_per_chip']} QPS = {cap['streams_per_chip']} "
          f"concurrent realtime streams")
    for k in ("chips_needed", "chips_needed_streams", "sustainable_qps",
              "sustainable_streams"):
        if k in result:
            print(f"{k}: {result[k]}")


if __name__ == "__main__":
    main()
