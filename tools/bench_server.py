"""Closed-loop load benchmark for the serving daemon (unitspeech_tpu/serve.py).

K client threads POST open-text requests to the HTTP front-end back-to-back;
the dynamic batcher packs concurrent requests into batched bucket-switch
dispatches. Reports aggregate throughput (speech seconds synthesized per
wall-clock second per chip) and request latency percentiles — the numbers a
capacity plan needs, complementing bench.py's single-request RTF.

Usage (real chip):   python tools/bench_server.py --clients 8 --requests 48
Smoke (CPU):         python tools/bench_server.py --smoke --clients 3 --requests 6

Prints ONE JSON line:
  {"metric": "server_throughput", "value": <x realtime/chip>, ...}
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
import wave


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
    ap.add_argument("--requests", type=int, default=48, help="total requests")
    ap.add_argument("--max-batch", type=int, default=4)
    ap.add_argument("--batch-ladder", default=None,
                    help="comma list ending at max-batch (fewer compiles)")
    ap.add_argument("--max-wait-ms", type=float, default=40.0)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--sampler", default="ddpm",
                    help="sampler spec ('ddpm'/'dpm2', optional ':cs<k>')")
    ap.add_argument("--frames", type=int, default=344,
                    help="target mean synthesized frames (baseline protocol)")
    ap.add_argument("--ttfa-sentences", type=int, default=0,
                    help="also measure the streaming endpoint: one long "
                         "text of N sentences, report time-to-first-audio "
                         "vs total")
    args = ap.parse_args()

    bench = _load_bench()
    import jax  # noqa: E402  (after bench enables the compile cache)

    if args.smoke:
        # the axon plugin ignores JAX_PLATFORMS; force CPU before any
        # device use (same rationale as bench.py --smoke)
        jax.config.update("jax_platforms", "cpu")
    print(json.dumps(run_bench(args, bench)))


def run_bench(args, bench=None, synth=None):
    """Build (or take) a synthesizer, bring up the daemon, drive it with
    closed-loop clients, and return the result dict. bench.py's extras call
    this with the already-built serving synthesizer so the measured serving
    config is exactly the headline one."""
    if bench is None and synth is None:
        bench = _load_bench()  # only needed to BUILD a synthesizer
    import numpy as np

    from unitspeech_tpu.serve import build_batcher, make_http_server

    if synth is None:
        synth = bench.build(args.smoke, use_int8=not args.smoke)
    n_vocab = synth.models.cfg.text_encoder.n_vocab
    n_tok = 12 if args.smoke else 140
    rng = np.random.default_rng(1)
    reqs = [list(int(t) for t in rng.integers(1, n_vocab - 1, (n_tok,)))
            for _ in range(max(args.requests, 16))]

    # length_scale tuned so mean synthesized speech matches the baseline
    # protocol (~3.98 s at 344 frames), exactly like bench.py's serving modes
    from unitspeech_tpu.infer.calibration import DurationCalibrator
    import dataclasses as dc

    cal = DurationCalibrator(n_vocab=n_vocab, min_samples=4)
    synth = dc.replace(synth, calibrator=cal)
    synth.calibrate(reqs[:16])
    med = float(np.median(np.asarray(cal._totals[:16])))
    frames = args.frames if not args.smoke else 48
    lscale = max(frames / med, 1e-3)

    window = synth.make_switch_buckets(length_scale=lscale)
    synth = dc.replace(synth, switch_buckets=window)
    ladder = ([int(b) for b in args.batch_ladder.split(",")]
              if args.batch_ladder else None)
    batcher = build_batcher(
        synth, calibration_texts=None,  # calibrator already fed above
        max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
        warmup_token_lengths=(n_tok,), default_steps=args.steps,
        default_sampler=args.sampler, length_scale=lscale,
        batch_ladder=ladder,
    )
    srv = make_http_server(
        batcher, port=0,
        # deterministic char->id frontend (test_serve.py convention) so the
        # streaming TTFA probe can exercise the text/split path
        text_to_ids=lambda s: [1 + (ord(c) % (n_vocab - 2))
                               for c in s.strip() or "a"],
    )
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}/synthesize"

    latencies, speech, lock = [], [], threading.Lock()
    if args.requests < args.clients:
        raise SystemExit(
            f"--requests {args.requests} < --clients {args.clients}: every "
            "client must send at least one request"
        )
    # distribute the remainder so exactly args.requests are sent
    base, extra = divmod(args.requests, args.clients)
    per_client = [base + (1 if c < extra else 0) for c in range(args.clients)]
    offsets = [sum(per_client[:c]) for c in range(args.clients)]

    def client(cid: int):
        for i in range(per_client[cid]):
            body = json.dumps(
                {"token_ids": reqs[(offsets[cid] + i) % len(reqs)]}
            ).encode()
            t0 = time.perf_counter()
            for attempt in range(3):
                try:
                    with urllib.request.urlopen(
                        urllib.request.Request(
                            url, data=body,
                            headers={"Content-Type": "application/json"},
                        ), timeout=600,
                    ) as r:
                        blob = r.read()
                    break
                except ConnectionError:
                    # transient connect/reset under a thundering herd: retry
                    # (latency still accounted from t0, so retries penalize
                    # the measurement rather than silently dropping load)
                    if attempt == 2:
                        raise
                    time.sleep(0.05 * (attempt + 1))
            dt = time.perf_counter() - t0
            with wave.open(__import__("io").BytesIO(blob)) as w:
                s = w.getnframes() / w.getframerate()
            with lock:
                latencies.append(dt)
                speech.append(s)

    threads = [threading.Thread(target=client, args=(c,))
               for c in range(args.clients)]
    t_start = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t_start

    # streaming TTFA probe: one long text on the QUIET daemon, so the
    # number is the mode's intrinsic first-chunk latency (solo dispatch),
    # not a load artifact
    ttfa = None
    if getattr(args, "ttfa_sentences", 0):
        n_sent = int(args.ttfa_sentences)
        word = "abcdef"
        n_words = max((n_tok + 1) // (len(word) + 1), 1)
        sent = " ".join(word for _ in range(n_words)) + "."
        body = json.dumps(
            {"text": " ".join(sent for _ in range(n_sent)), "stream": True}
        ).encode()
        t0 = time.perf_counter()
        with urllib.request.urlopen(
            urllib.request.Request(
                url, data=body,
                headers={"Content-Type": "application/json"},
            ), timeout=600,
        ) as r:
            head = r.read(45)  # WAV header + first PCM byte of chunk 0
            t_first = time.perf_counter() - t0
            rest = r.read()
            t_total = time.perf_counter() - t0
        import struct

        sr = struct.unpack("<I", head[24:28])[0]
        ttfa = {
            "stream_sentences": n_sent,
            "stream_ttfa_s": round(t_first, 3),
            "stream_total_s": round(t_total, 3),
            "stream_speech_s": round(
                (len(head) - 44 + len(rest)) / 2 / sr, 2
            ),
        }

    srv.shutdown()
    batcher.shutdown()

    lat = np.asarray(latencies)
    total_speech = float(np.sum(speech))
    result = {
        "metric": "server_throughput",
        "value": round(total_speech / wall, 3),
        "unit": "x_realtime_per_chip",
        "clients": args.clients,
        "requests": len(latencies),
        "steps": args.steps,
        "sampler": args.sampler,
        "max_batch": args.max_batch,
        "max_wait_ms": args.max_wait_ms,
        "wall_s": round(wall, 2),
        "speech_s": round(total_speech, 2),
        "aggregate_rtf": round(wall / total_speech, 5),
        "p50_latency_s": round(float(np.percentile(lat, 50)), 3),
        "p95_latency_s": round(float(np.percentile(lat, 95)), 3),
        "switch_buckets": list(batcher.synth.switch_buckets),
        "batch_sizes": batcher.stats.batch_sizes,
    }
    if ttfa:
        result.update(ttfa)
    return result


if __name__ == "__main__":
    main()
