#!/usr/bin/env python
"""Discrete resynthesis demo: wav -> units -> Tacotron2 -> WaveGlow -> wav.

TPU-native equivalent of the textlesslib resynthesis example
(/root/reference/unitspeech/textlesslib/examples/resynthesis/resynth.py):
encode speech into pseudo-units with the SSL dense model + k-means
quantizer, report the bitrate of the discrete stream, then resynthesize a
waveform from the units alone through the unit-vocoder glue
(infer/unit_vocoder.TacotronVocoder: bucketed gate-stopped Tacotron2 decode
-> WaveGlow at sigma=0.666 -> spectral denoiser).

Two modes:
  * default (no checkpoints): random-initialized tiny stack — runs on any
    backend in ~a minute, demonstrating the full API wiring.
  * --hubert/--kmeans/--tacotron/--waveglow/--code-dict: the published
    artifacts (fetch via utils/artifact_registry: 'hubert-base-ls960',
    'hubert-base-ls960-kmeans-100', '...-kmeans-100-tacotron',
    '...-tacotron-codes', 'waveglow').

Run: python examples/resynthesis.py [--input in.wav --output out.wav]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# CPU unless the caller EXPLICITLY exported JAX_PLATFORMS=tpu: probing
# jax.default_backend() would initialize (and contend for) the single
# tunneled TPU chip, which another process may be benchmarking.
if os.environ.get("JAX_PLATFORMS", "").lower() != "tpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np

# Unigram token entropies (bits) on the LibriLight-6k train split, as
# published with the reference example (resynth.py:60-71) — data constants,
# reproduced so the reported bitrates are comparable.
UNIGRAM_ENTROPY = {
    "hubert-base-ls960": {50: 5.4585, 100: 6.4451, 200: 7.4771},
    "cpc-big-ll6k": {50: 5.4283, 100: 6.4131, 200: 7.4425},
}


def bitrates(dense_model: str, n_units: int, vocab_size: int,
             seconds: float):
    """(uniform bps, unigram bps) of the deduplicated unit stream
    (reference get_compression_rate, resynth.py:50-76)."""
    uniform = float(np.log2(vocab_size)) * n_units / seconds
    unigram_h = UNIGRAM_ENTROPY.get(dense_model, {}).get(vocab_size)
    unigram = unigram_h * n_units / seconds if unigram_h else None
    return uniform, unigram


def build_tiny_stack(seed: int = 0):
    """Random-weight demo stack at test sizes (no downloads)."""
    from unitspeech_tpu.infer.unit_vocoder import (
        TacotronInput,
        TacotronVocoder,
    )
    from unitspeech_tpu.models.ssl.hubert import (
        HubertFeatureReader,
        HubertModel,
        hubert_test_config,
    )
    from unitspeech_tpu.models.ssl.kmeans import KMeansQuantizer
    from unitspeech_tpu.models.ssl.speech_encoder import SpeechEncoder
    from unitspeech_tpu.models.tacotron2 import (
        random_tacotron2_params,
        tacotron2_test_config,
    )
    from unitspeech_tpu.models.waveglow import (
        random_waveglow_params,
        waveglow_test_config,
    )

    vocab = 8
    hmodel = HubertModel(hubert_test_config())
    hparams = jax.jit(hmodel.init)(
        jax.random.PRNGKey(seed), np.zeros((1, 3200), np.float32)
    )
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal(
        (vocab, hmodel.config.embed_dim)
    ).astype(np.float32)
    encoder = SpeechEncoder(
        HubertFeatureReader(hmodel, hparams, layer=2),
        KMeansQuantizer(centers), deduplicate=True,
    )

    taco_cfg = tacotron2_test_config(
        n_symbols=vocab + 4, gate_threshold=1.1, max_decoder_steps=32
    )
    taco_params = random_tacotron2_params(taco_cfg, seed=seed + 1)
    wg_cfg = waveglow_test_config(
        n_mel_channels=taco_cfg.n_mel_channels, n_flows=3, n_channels=8
    )
    wg_params = random_waveglow_params(wg_cfg, seed=seed + 2)
    code_dict = {"_": 0, **{str(c): c + 1 for c in range(vocab)}}
    voc = TacotronVocoder(
        taco_params, taco_cfg, wg_params, wg_cfg, TacotronInput(code_dict),
        max_decoder_steps=32, denoiser_n_fft=32,
    )
    return encoder, voc, "tiny-random", vocab


def build_checkpoint_stack(args):
    from unitspeech_tpu.config import MainConfig
    from unitspeech_tpu.cli import build_unit_extractor
    from unitspeech_tpu.infer.unit_vocoder import TacotronVocoder

    cfg = MainConfig()
    import dataclasses as dc

    cfg = dc.replace(
        cfg, unit_extractor=dc.replace(
            cfg.unit_extractor, dense_model_name=args.dense_model,
        ),
    )
    encoder = build_unit_extractor(args.hubert, args.kmeans, cfg)
    voc = TacotronVocoder.from_torch(
        args.tacotron, args.code_dict, args.waveglow
    )
    return encoder, voc, args.dense_model, encoder.vocab_size


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default=None, help="input wav (default: a "
                    "synthetic harmonic 16 kHz utterance)")
    ap.add_argument("--output", default="resynth.wav")
    ap.add_argument("--dense-model", default="hubert-base-ls960",
                    choices=list(UNIGRAM_ENTROPY))
    ap.add_argument("--hubert", default=None)
    ap.add_argument("--kmeans", default=None)
    ap.add_argument("--tacotron", default=None)
    ap.add_argument("--waveglow", default=None)
    ap.add_argument("--code-dict", default=None)
    args = ap.parse_args()

    if args.hubert:
        encoder, voc, model_name, vocab = build_checkpoint_stack(args)
    else:
        encoder, voc, model_name, vocab = build_tiny_stack()

    if args.input:
        from unitspeech_tpu.data.dataset import load_wav

        wav, sr = load_wav(args.input)
        wav = encoder.maybe_resample(wav, sr)
    else:
        t = np.arange(16000) / 16000.0
        wav = (0.4 * np.sin(2 * np.pi * (120 + 30 * np.sin(4 * t)) * t)
               * (0.6 + 0.4 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)

    streams = encoder(wav)
    units = np.asarray(streams["units"])
    seconds = len(wav) / encoder.expected_sample_rate
    uniform_bps, unigram_bps = bitrates(model_name, units.size, vocab, seconds)
    print(f"units ({units.size} @ {vocab}-vocab): "
          f"{' '.join(map(str, units[:24]))}{' ...' if units.size > 24 else ''}")
    print(f"bitrate: uniform {uniform_bps:.1f} bps"
          + (f", unigram {unigram_bps:.1f} bps" if unigram_bps else ""))

    out = voc(" ".join(str(u) for u in units))
    from unitspeech_tpu.data.dataset import write_wav

    write_wav(args.output, out, 22050)
    print(f"resynthesized {out.shape[0] / 22050:.2f}s -> {args.output}")


if __name__ == "__main__":
    main()
