#!/usr/bin/env python
"""Measure per-bucket serving cost anchors on the chip.

The bucket-window cost model (infer/bucket_cost.py) is linear:
proc(b) = FIXED + per_frame * b, with per_frame anchored at ONE operating
point (344 frames / 140 tokens). The on-chip A/B (BUCKET_AB.json) showed
both windows measuring ~33-39% ABOVE that line, growing with branch size —
the line omits the encoder's token cost and any superlinear frame terms.
This tool measures the actual anchors:

  * a FRAME sweep at fixed 140 tokens: forced single-dispatch synthesis
    (the bench.py rtf_forced protocol — whole pipeline, one executable)
    at exact frame buckets 216 / 344 / 696 / 1256
  * a TOKEN sweep at fixed 344 frames: token buckets 64 / 256 / 1024
  * both for the production fast mode dpm2:cs2@16, plus ddpm@50 at
    344 / 1256 for the cross-sampler shape check

Each point: 1 compile + warm run, then the median of 5 timed materialized
runs. Writes COST_ANCHORS.json for the model refit.

Run on the real TPU (background; ~6-8 full-size compiles):
    python tools/cost_anchors.py
Re-measure suspect points against a warm compile cache (appends rows
tagged "recheck" to the existing COST_ANCHORS.json):
    python tools/cost_anchors.py --recheck 216 344
Extend the sweep with more sampler modes at the 344/1256 cross-check
frames (appends rows; refit_cost_model.py fits them shared-shape):
    python tools/cost_anchors.py --extend dpm2:16 dpm2:25
CPU smoke:  python tools/cost_anchors.py --smoke
"""
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import json
import os
import time

import numpy as np

SMOKE = False
REPEATS = 5


def _load_bench():
    import importlib.util

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(root, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def time_point(synth, n_tok, frames, sampler, steps):
    """Median ms of a forced single-dispatch synthesis at this operating
    point (warm first; np.asarray materializes through the tunnel)."""
    import jax

    rng = np.random.default_rng(0)
    n_vocab = synth.models.cfg.text_encoder.n_vocab
    toks = list(int(t) for t in rng.integers(1, n_vocab - 1, (n_tok,)))
    kw = dict(diffusion_steps=steps, sampler=sampler,
              _forced_total_frames=frames,
              text_gradient_scale=1.0, spk_gradient_scale=1.0)
    np.asarray(synth(toks, jax.random.PRNGKey(99), **kw)[0])  # compile+warm
    times = []
    for i in range(REPEATS):
        t0 = time.perf_counter()
        wav, _sr = synth(toks, jax.random.PRNGKey(i), **kw)
        np.asarray(wav)
        times.append((time.perf_counter() - t0) * 1000.0)
    return float(np.median(times))


def _recheck(frames_list):
    """Re-time given frame buckets (production mode, tok256) against the
    now-warm compile cache and append "recheck"-tagged rows — used to
    separate first-point warm-up artifacts from real anchor shape (the
    initial sweep's very first point measured ~40% above the fit of the
    later points)."""
    bench = _load_bench()
    synth = bench.build(False, use_int8=True)
    with open("COST_ANCHORS.json") as f:
        out = json.load(f)
    for frames in frames_list:
        ms = time_point(synth, 140, frames, "dpm2:cs2", 16)
        out["rows"].append({"sampler": "dpm2:cs2", "steps": 16,
                            "tok_bucket": 256, "frames": frames,
                            "ms": round(ms, 1), "recheck": True})
        print(f"# recheck dpm2:cs2@16 tok256 f{frames}: {ms:.1f} ms",
              file=sys.stderr, flush=True)
    with open("COST_ANCHORS.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


def _extend(specs):
    """Time extra sampler modes at the 344/1256 cross-check frames
    (tok256) and append their rows — two points per mode is what the
    shared-shape fit (tools/refit_cost_model.py) needs. specs like
    "dpm2:16" (sampler "dpm2", steps 16) or "dpm2:cs2:16"."""
    bench = _load_bench()
    synth = bench.build(False, use_int8=True)
    with open("COST_ANCHORS.json") as f:
        out = json.load(f)
    for spec in specs:
        sampler, _, steps_s = spec.rpartition(":")
        steps = int(steps_s)
        for frames in (344, 1256):
            ms = time_point(synth, 140, frames, sampler, steps)
            out["rows"].append({"sampler": sampler, "steps": steps,
                                "tok_bucket": 256, "frames": frames,
                                "ms": round(ms, 1)})
            print(f"# {sampler}@{steps} tok256 f{frames}: {ms:.1f} ms",
                  file=sys.stderr, flush=True)
    with open("COST_ANCHORS.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


def main():
    global SMOKE, REPEATS
    if "--smoke" in sys.argv:
        SMOKE = True
        REPEATS = 3
        import jax

        jax.config.update("jax_platforms", "cpu")
    if "--recheck" in sys.argv:
        i = sys.argv.index("--recheck")
        _recheck([int(x) for x in sys.argv[i + 1:]])
        return
    if "--extend" in sys.argv:
        i = sys.argv.index("--extend")
        _extend(sys.argv[i + 1:])
        return

    bench = _load_bench()
    import jax

    synth = bench.build(SMOKE, use_int8=not SMOKE)
    tokb = sorted(synth.token_buckets)

    if SMOKE:
        frame_sweep = [(12, f) for f in (48, 96)]
        tok_sweep = [(4, 48), (30, 48)]
        configs = [("ddpm", 2)]
        cross = []
    else:
        # (n_tok, frames): exact frame buckets so forced == bucket size
        frame_sweep = [(140, f) for f in (216, 344, 696, 1256)]
        tok_sweep = [(48, 344), (600, 344)]  # buckets 64 and 1024
        configs = [("dpm2:cs2", 16)]
        cross = [("ddpm", 50, 344), ("ddpm", 50, 1256)]

    rows = []
    for sampler, steps in configs:
        for n_tok, frames in frame_sweep + tok_sweep:
            ms = time_point(synth, n_tok, frames, sampler, steps)
            tb = next(b for b in tokb if b >= n_tok)
            rows.append({"sampler": sampler, "steps": steps,
                         "tok_bucket": tb, "frames": frames,
                         "ms": round(ms, 1)})
            print(f"# {sampler}@{steps} tok{tb} f{frames}: {ms:.1f} ms",
                  file=sys.stderr, flush=True)
    for sampler, steps, frames in cross:
        ms = time_point(synth, 140, frames, sampler, steps)
        rows.append({"sampler": sampler, "steps": steps,
                     "tok_bucket": 256, "frames": frames,
                     "ms": round(ms, 1)})
        print(f"# {sampler}@{steps} tok256 f{frames}: {ms:.1f} ms",
              file=sys.stderr, flush=True)

    out = {"smoke": SMOKE, "repeats": REPEATS,
           "device": jax.devices()[0].platform, "rows": rows}
    path = "COST_ANCHORS.json" if not SMOKE else "/tmp/COST_ANCHORS_smoke.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
