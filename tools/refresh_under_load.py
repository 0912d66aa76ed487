"""Measure a live bucket-window refresh UNDER LOAD on the serving daemon.

Scenario (the traffic-drift story, docs/SERVING.md "Live window refresh"):
a daemon comes up with a stale window — here deliberately tail-sized
([~1256, ~1408], e.g. calibrated on long-form traffic) — while actual
live traffic is ~344-frame conversational requests that all pad to the
oversized bottom branch. K closed-loop clients drive steady load; midway,
an admin POSTs /refresh_window {"policy": "cost"}: the daemon re-derives
the window from its served-length ring, compiles the new executables on
the admin thread while the dispatcher keeps serving on the stale window,
and hot-swaps. The tool reports request p50/p95 in three phases (before /
during / after the refresh) and the refresh wall time — both the VALUE of
the correction (after vs before) and its COST (during vs before, the
compile sharing the chip and the 1-core host).

Writes REFRESH_LOAD.json. Real chip:  python tools/refresh_under_load.py
CPU smoke:                            python tools/refresh_under_load.py --smoke

The reference has no serving layer at all (inference.py is a one-shot
CLI), let alone window management; this is TPU-native serving machinery.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
import threading
import time
import urllib.request

import numpy as np


def _load_bench():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(root, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true", help="tiny config, CPU")
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--sampler", default="dpm2:cs2")
    ap.add_argument("--frames", type=int, default=344,
                    help="actual live-traffic frame target")
    ap.add_argument("--warmup-requests", type=int, default=24,
                    help="steady-state requests before the refresh fires")
    ap.add_argument("--tail-requests", type=int, default=24,
                    help="requests measured after the refresh completes")
    args = ap.parse_args()

    bench = _load_bench()
    import jax

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
        args.steps, args.sampler, args.frames = 2, "ddpm", 48
        args.warmup_requests = args.tail_requests = 8
        args.clients = 3

    import dataclasses as dc

    from unitspeech_tpu.infer.calibration import DurationCalibrator
    from unitspeech_tpu.serve import build_batcher, make_http_server

    synth = bench.build(args.smoke, use_int8=not args.smoke)
    n_vocab = synth.models.cfg.text_encoder.n_vocab
    n_tok = 12 if args.smoke else 140
    rng = np.random.default_rng(1)
    reqs = [list(int(t) for t in rng.integers(1, n_vocab - 1, (n_tok,)))
            for _ in range(16)]

    cal = DurationCalibrator(n_vocab=n_vocab, min_samples=4)
    synth = dc.replace(synth, calibrator=cal)
    synth.calibrate(reqs)
    med = float(np.median(np.asarray(cal._totals[:16])))
    lscale = max(args.frames / med, 1e-3)

    # the STALE window: what a cost derivation would pick for traffic ~4x
    # longer than what actually arrives (e.g. yesterday's long-form load)
    from unitspeech_tpu.infer.bucket_cost import (frame_cost_curve,
                                                  optimal_window)

    stale_lengths = np.full(64, args.frames * 4.0)
    stale, _ = optimal_window(stale_lengths, synth.frame_buckets,
                              frame_cost_curve("dpm2:cs2", 16),
                              max_branches=2,
                              num_down=synth.models.cfg.decoder
                              .num_downsamplings, headroom=1)
    synth = dc.replace(synth, switch_buckets=stale)
    print(f"# stale window {list(stale)} for ~{args.frames}-frame traffic",
          file=sys.stderr, flush=True)

    batcher = build_batcher(
        synth, calibration_texts=None, max_batch=4,
        max_wait_ms=40.0, warmup_token_lengths=(n_tok,),
        default_steps=args.steps, default_sampler=args.sampler,
        length_scale=lscale, batch_ladder=(1, 4),
    )
    srv = make_http_server(batcher, port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"

    rows, lock, stop = [], threading.Lock(), threading.Event()

    def client(cid: int):
        i = 0
        while not stop.is_set():
            body = json.dumps({"token_ids": reqs[(cid + i) % len(reqs)]}
                              ).encode()
            t0 = time.perf_counter()
            try:
                with urllib.request.urlopen(urllib.request.Request(
                    f"{base}/synthesize", data=body,
                    headers={"Content-Type": "application/json"},
                ), timeout=600) as r:
                    r.read()
            except Exception:
                if stop.is_set():
                    return
                raise
            t1 = time.perf_counter()
            with lock:
                rows.append((t0, t1))
            i += 1

    threads = [threading.Thread(target=client, args=(c,), daemon=True)
               for c in range(args.clients)]
    for t in threads:
        t.start()

    def served() -> int:
        with lock:
            return len(rows)

    while served() < args.warmup_requests:
        time.sleep(0.2)

    # the admin correction, timed: compiles happen on THIS thread's request
    t_ref0 = time.perf_counter()
    req = urllib.request.Request(
        f"{base}/refresh_window",
        json.dumps({"policy": "cost", "min_samples": 8}).encode(),
        {"Content-Type": "application/json"})
    decision = json.loads(urllib.request.urlopen(req, timeout=3600).read())
    t_ref1 = time.perf_counter()
    print(f"# refresh {t_ref1 - t_ref0:.1f}s -> {decision}",
          file=sys.stderr, flush=True)

    after_start = served()
    while served() < after_start + args.tail_requests:
        time.sleep(0.2)
    stop.set()
    # one sacrificial request per client unblocks anything mid-POST
    time.sleep(0.5)
    srv.shutdown()
    batcher.shutdown()

    with lock:
        snap = list(rows)
    before = [t1 - t0 for t0, t1 in snap if t1 <= t_ref0]
    during = [t1 - t0 for t0, t1 in snap
              if t1 > t_ref0 and t0 < t_ref1]
    after = [t1 - t0 for t0, t1 in snap if t0 >= t_ref1]

    def pct(v, q):
        return round(float(np.percentile(v, q)), 3) if v else None

    out = {
        "metric": "refresh_under_load",
        "smoke": args.smoke,
        "sampler": args.sampler, "steps": args.steps,
        "clients": args.clients,
        "stale_window": list(stale),
        "decision": decision,
        "refresh_s": round(t_ref1 - t_ref0, 1),
        "n_before": len(before), "n_during": len(during),
        "n_after": len(after),
        "p50_before_s": pct(before, 50), "p95_before_s": pct(before, 95),
        "p50_during_s": pct(during, 50), "p95_during_s": pct(during, 95),
        "p50_after_s": pct(after, 50), "p95_after_s": pct(after, 95),
    }
    if out["p50_before_s"] and out["p50_after_s"]:
        out["p50_speedup"] = round(out["p50_before_s"] / out["p50_after_s"],
                                   2)
    path = ("REFRESH_LOAD.json" if not args.smoke
            else "/tmp/REFRESH_LOAD_smoke.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
