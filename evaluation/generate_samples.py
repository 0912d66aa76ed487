#!/usr/bin/env python
"""Evaluation sample generation with RTF accounting.

Equivalent of the reference's evaluation/evaluation_generate_samples.py:
synthesize every sentence of an eval list with a (fine-tuned) decoder, record
per-utterance processing/speech durations, write wavs + timings + a summary.

Usage:
  python evaluation/generate_samples.py --sentences synthesis.txt \
      --decoder ckpt/decoder --text-encoder ckpt/te \
      --duration-predictor ckpt/dp --vocoder ckpt/voc --out-dir eval_out \
      [--ipa] [--diffusion-steps 50]

The sentences file has one utterance per line (IPA if --ipa). Metrics beyond
RTF (WER/CER via an external ASR, MOS, speaker similarity) are computed with
unitspeech_tpu.eval.harness helpers on the written wavs.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sentences", required=True)
    ap.add_argument("--ipa", action="store_true")
    ap.add_argument("--language", default="en-us")
    ap.add_argument("--decoder", required=True)
    ap.add_argument("--text-encoder", required=True)
    ap.add_argument("--duration-predictor", required=True)
    ap.add_argument("--vocoder", required=True)
    ap.add_argument("--spk-emb", default=None)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--config", default=None)
    ap.add_argument("--diffusion-steps", type=int, default=50)
    ap.add_argument("--text-gradient-scale", type=float, default=1.0)
    ap.add_argument("--spk-gradient-scale", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--bf16", default=True)
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from unitspeech_tpu import text as text_frontend
    from unitspeech_tpu.cli import _load_tts_models, _setup
    from unitspeech_tpu.eval.harness import generate_eval_samples, rtf_summary
    from unitspeech_tpu.infer.tts import Synthesizer

    cfg = _setup(args)
    models = _load_tts_models(args, cfg)
    synth = Synthesizer(models)

    with open(args.sentences, encoding="utf-8") as f:
        sentences = [l.strip() for l in f if l.strip()]
    if args.ipa:
        seqs = [text_frontend.phonemes_to_sequence(s) for s in sentences]
    else:
        ph = text_frontend.get_phonemizer(args.language)
        if ph is None:
            raise SystemExit("espeak-ng not installed; use --ipa")
        seqs = [text_frontend.text_to_sequence(s, ph) for s in sentences]

    timings = generate_eval_samples(
        synth, seqs, args.out_dir, jax.random.PRNGKey(args.seed),
        diffusion_steps=args.diffusion_steps,
        text_gradient_scale=args.text_gradient_scale,
        spk_gradient_scale=args.spk_gradient_scale,
    )
    summary = rtf_summary(timings)
    with open(os.path.join(args.out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
