#!/usr/bin/env python
"""Capture a device-side per-op profile of the full serving pipeline.

The axon platform emits standard xplane/chrome traces with per-HLO events on
the TPU timeline (pid named /device:TPU:*), so this is the ground truth for
where a synthesis call's time goes — per-block microbenches on this chip
have ~10% run-to-run variance, the aggregated trace does not.

Usage:  python tools/profile_pipeline.py [--frames 344] [--top 40]
Prints one line per HLO op name aggregated over the traced call, descending
total duration, plus a coarse bucket summary (conv/matmul, pallas kernels,
elementwise fusions, copies, infeed...).
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def aggregate(trace_dir: str):
    paths = glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise SystemExit(f"no trace under {trace_dir}")
    path = max(paths, key=os.path.getmtime)
    d = json.load(gzip.open(path))
    evs = d.get("traceEvents", [])
    tpu_pids = {
        e["pid"]
        for e in evs
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in e["args"].get("name", "")
    }
    tot = collections.Counter()
    cnt = collections.Counter()
    for e in evs:
        if e.get("ph") == "X" and e["pid"] in tpu_pids:
            tot[e["name"]] += e.get("dur", 0)
            cnt[e["name"]] += 1
    return tot, cnt


BUCKETS = (
    ("pallas", lambda n: "custom" in n or "tpu_custom_call" in n or "pallas" in n),
    ("conv/dot", lambda n: "convolution" in n or "dot" in n or "conv" in n),
    ("copy/transpose", lambda n: "copy" in n or "transpose" in n or "bitcast" in n),
    ("dynamic-slice/update", lambda n: "dynamic" in n),
    ("reduce", lambda n: "reduce" in n),
    ("rng", lambda n: "rng" in n or "threefry" in n),
    ("fusion/elementwise", lambda n: "fusion" in n),
)


def bucket(name: str) -> str:
    for b, pred in BUCKETS:
        if pred(name):
            return b
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=344)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--trace-dir", default="/tmp/pipeline_trace")
    ap.add_argument("--parse-only", action="store_true",
                    help="just re-parse an existing trace dir")
    ap.add_argument("--no-int8", dest="int8", action="store_false",
                    default=True,
                    help="profile the bf16 estimator instead of the int8 "
                         "serving default")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--sampler", default="ddpm",
                    help="sampler spec to profile (e.g. 'dpm2:cs2' to "
                         "attribute the fast serving mode)")
    args = ap.parse_args()

    if not args.parse_only:
        import jax
        import numpy as np

        from unitspeech_tpu.utils.profiling import trace

        sys.argv = [sys.argv[0]]
        import bench

        synth = bench.build(smoke=False, use_int8=args.int8)
        rng = np.random.default_rng(0)
        tokens_np = rng.integers(1, 179, (1, 140)).astype(np.int32)
        key = jax.random.PRNGKey(42)

        def run():
            wav, _sr = synth(
                list(tokens_np[0]), key, _forced_total_frames=args.frames,
                diffusion_steps=args.steps, sampler=args.sampler,
                text_gradient_scale=1.0, spk_gradient_scale=1.0,
            )
            return np.asarray(wav)

        print("# warmup/compile...", flush=True)
        run()
        run()
        print("# tracing...", flush=True)
        with trace(args.trace_dir):
            run()

    tot, cnt = aggregate(args.trace_dir)
    total_us = sum(tot.values())
    print(f"total device us: {total_us}")
    bsum = collections.Counter()
    for n, us in tot.items():
        bsum[bucket(n)] += us
    for b, us in bsum.most_common():
        print(f"  {b:22s} {us/1e3:8.2f} ms  ({100*us/max(total_us,1):.1f}%)")
    print()
    for n, us in tot.most_common(args.top):
        print(f"{us/1e3:9.3f} ms  x{cnt[n]:<5d} {n[:110]}")


if __name__ == "__main__":
    main()
