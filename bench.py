"""Benchmark: RTF of 50-step adaptive TTS synthesis (the reference's headline
number — BASELINE.md: 0.9224 RTF on one DGX GPU, CFG 1.0/1.0, mean speech
3.98 s over 500 utterances).

Measures the full on-device pipeline at reference size: text encoder (6-layer
transformer, 192ch) -> duration predictor -> alignment -> 50-step lax.scan
reverse diffusion with dual CFG (3x-batched U-Net, dim 128, mults 1/2/4/8) ->
BigVGAN 22 kHz vocoder. Durations are pinned so the synthesized length is a
fixed 344 frames (~3.99 s at 86.13 fps), matching the baseline's mean speech
duration; weights are randomly initialized (timing is weight-independent).

Prints ONE JSON line:
  {"metric": "rtf_50step_synthesis", "value": <rtf>, "unit": "rtf",
   "vs_baseline": <0.9224 / rtf>}   (vs_baseline > 1 means faster than ref)
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_RTF = 0.9224  # BASELINE.md row 1
SR = 22050
HOP = 256


def build(smoke: bool, use_pallas: bool = True, use_pallas_resnet: bool = True,
          use_int8: bool = False):
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
    )
    return Synthesizer(models)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true", help="tiny config, CPU-friendly")
    ap.add_argument("--frames", type=int, default=344, help="synthesized mel frames")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--batch", type=int, default=1,
                    help="utterances per batched synthesis (throughput mode)")
    ap.add_argument("--no-cfg", action="store_true",
                    help="guidance scales 0 (BASELINE config 1)")
    ap.add_argument("--int8", action="store_true",
                    help="int8 estimator convs — deep flat matmuls AND the "
                         "early-stage fused Pallas kernels (opt-in, ~1%% "
                         "per-conv quantization error)")
    args = ap.parse_args()

    synth = build(args.smoke, use_int8=args.int8)
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
                diffusion_steps=args.steps,
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
        synth = build(args.smoke, use_pallas=False, use_pallas_resnet=False, use_int8=args.int8)
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
    rtf = proc / speech_s
    result = {
        "metric": "rtf_50step_synthesis",
        "value": round(rtf, 5),
        "unit": "rtf",
        "vs_baseline": round(BASELINE_RTF / rtf, 2),
    }
    print(json.dumps(result))
    print(
        f"# proc={proc:.3f}s speech={speech_s:.2f}s frames={frames} batch={args.batch} "
        f"steps={args.steps} device={jax.devices()[0].platform}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
