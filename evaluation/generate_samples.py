#!/usr/bin/env python
"""Evaluation sample generation with RTF accounting.

Equivalent of the reference's evaluation/evaluation_generate_samples.py,
including the per-speaker orchestration (:150-353): for every speaker in a
reference filelist, fine-tune the base decoder on that speaker's reference
wav (500 iters by default), then synthesize every matching eval utterance
with the fine-tuned decoder, recording per-utterance processing/speech
durations exactly like the reference's processing_time/speech_duration .npy
arrays.

Two modes:

  # flat: synthesize a sentence list with one (already fine-tuned) decoder
  python evaluation/generate_samples.py --sentences synthesis.txt \
      --decoder ckpt/decoder --text-encoder ckpt/te \
      --duration-predictor ckpt/dp --vocoder ckpt/voc --out-dir eval_out

  # per-speaker: finetune-then-synthesize, like the reference driver
  python evaluation/generate_samples.py \
      --reference-filelist refs.txt --eval-filelist eval.txt \
      --decoder ckpt/base_decoder --unit-encoder ckpt/ue \
      --text-encoder ckpt/te --duration-predictor ckpt/dp \
      --vocoder ckpt/voc --speaker-embedder ckpt/spk \
      --hubert ckpt/hubert --kmeans ckpt/kmeans.npz --out-dir eval_out

Filelists are `path|text|speaker_id` lines. WER/CER on the generated wavs run
through eval.harness.evaluate_transcriptions with any external ASR hook.
"""

import argparse
import json
import os
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _token_sequences(sentences, args, text_frontend):
    if args.ipa:
        return [text_frontend.phonemes_to_sequence(s) for s in sentences]
    ph = text_frontend.get_phonemizer(args.language)
    if ph is None:
        raise SystemExit("espeak-ng not installed; use --ipa")
    return [text_frontend.text_to_sequence(s, ph) for s in sentences]


def _synthesize_set(args, cfg, decoder_path, sentences, out_dir, seed):
    """Build a Synthesizer for `decoder_path` and generate `sentences`."""
    import jax

    from unitspeech_tpu import text as text_frontend
    from unitspeech_tpu.cli import _load_tts_models
    from unitspeech_tpu.eval.harness import generate_eval_samples
    from unitspeech_tpu.infer.tts import Synthesizer

    margs = types.SimpleNamespace(**vars(args))
    margs.decoder = decoder_path
    models = _load_tts_models(margs, cfg)
    synth = Synthesizer(models)
    seqs = _token_sequences(sentences, args, text_frontend)
    return generate_eval_samples(
        synth, seqs, out_dir, jax.random.PRNGKey(seed),
        diffusion_steps=args.diffusion_steps,
        text_gradient_scale=args.text_gradient_scale,
        spk_gradient_scale=args.spk_gradient_scale,
    )


def _per_speaker(args, cfg):
    """Reference evaluation_generate_samples.py:150-353: per speaker,
    fine-tune the base decoder on the reference wav, then synthesize that
    speaker's eval utterances."""
    import numpy as np

    from unitspeech_tpu.cli import main_finetune
    from unitspeech_tpu.data.dataset import parse_filelist
    from unitspeech_tpu.eval.harness import EvalTimings, rtf_summary
    from unitspeech_tpu.utils.checkpoint import latest_checkpoint

    refs = parse_filelist(args.reference_filelist)
    evals = parse_filelist(args.eval_filelist)
    by_spk = {}
    for entry in evals:
        path, text, spk = (entry + ["0"])[:3]
        by_spk.setdefault(spk, []).append((path, text))

    all_proc, all_speech = [], []
    per_speaker = {}
    for entry in refs:
        ref_path, _text, spk = (entry + ["0"])[:3]
        rows = by_spk.get(spk, [])
        if not rows:
            print(f"speaker {spk}: no eval utterances, skipping")
            continue
        ft_dir = os.path.join(args.out_dir, f"finetune_{spk}")
        ft_args = [
            "--reference", ref_path, "--decoder", args.decoder,
            "--unit-encoder", args.unit_encoder, "--output-dir", ft_dir,
            "--n-iters", str(args.finetune_iters), "--seed", str(args.seed),
        ]
        if args.config:
            ft_args += ["--config", args.config]
        if args.cpu:
            ft_args += ["--cpu"]
        if not args.bf16:
            ft_args += ["--fp32"]
        for flag, val in (
            ("--speaker-embedder", args.speaker_embedder),
            ("--hubert", args.hubert),
            ("--kmeans", args.kmeans),
            ("--spk-emb", args.spk_emb),
            ("--units", args.units),
        ):
            if val:
                ft_args += [flag, val]
        print(f"speaker {spk}: fine-tuning on {ref_path}")
        rc = main_finetune(ft_args)
        if rc != 0:
            raise SystemExit(f"finetune failed for speaker {spk}")
        ckpt = latest_checkpoint(ft_dir)

        spk_out = os.path.join(args.out_dir, f"speaker_{spk}")
        timings = _synthesize_set(
            args, cfg, ckpt, [t for _p, t in rows], spk_out, args.seed
        )
        per_speaker[spk] = rtf_summary(timings)
        all_proc.append(timings.processing_time)
        all_speech.append(timings.speech_duration)

    if not all_proc:
        raise SystemExit("no speakers evaluated")
    total = EvalTimings(np.concatenate(all_proc), np.concatenate(all_speech))
    # the reference persists these arrays as .npy (:352-353)
    np.save(os.path.join(args.out_dir, "processing_time.npy"), total.processing_time)
    np.save(os.path.join(args.out_dir, "speech_duration.npy"), total.speech_duration)
    summary = rtf_summary(total)
    summary["per_speaker"] = per_speaker
    return summary


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sentences", default=None,
                    help="flat mode: one utterance per line")
    ap.add_argument("--eval-filelist", default=None,
                    help="per-speaker mode: path|text|spk eval utterances")
    ap.add_argument("--reference-filelist", default=None,
                    help="per-speaker mode: path|text|spk reference wavs")
    ap.add_argument("--ipa", action="store_true")
    ap.add_argument("--language", default="en-us")
    ap.add_argument("--decoder", required=True,
                    help="decoder ckpt (base ckpt in per-speaker mode)")
    ap.add_argument("--text-encoder", required=True)
    ap.add_argument("--duration-predictor", required=True)
    ap.add_argument("--vocoder", required=True)
    ap.add_argument("--unit-encoder", default=None,
                    help="required in per-speaker mode")
    ap.add_argument("--speaker-embedder", default=None)
    ap.add_argument("--hubert", default=None)
    ap.add_argument("--kmeans", default=None)
    ap.add_argument("--units", default=None)
    ap.add_argument("--spk-emb", default=None)
    ap.add_argument("--finetune-iters", type=int, default=500)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--config", default=None)
    ap.add_argument("--diffusion-steps", type=int, default=50)
    ap.add_argument("--text-gradient-scale", type=float, default=1.0)
    ap.add_argument("--spk-gradient-scale", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--fp32", dest="bf16", action="store_false")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from unitspeech_tpu.cli import _setup
    from unitspeech_tpu.eval.harness import rtf_summary

    cfg = _setup(args)
    os.makedirs(args.out_dir, exist_ok=True)

    if args.reference_filelist:
        if not (args.eval_filelist and args.unit_encoder):
            raise SystemExit(
                "per-speaker mode needs --eval-filelist and --unit-encoder"
            )
        summary = _per_speaker(args, cfg)
    else:
        if not args.sentences:
            raise SystemExit("need --sentences or --reference-filelist")
        with open(args.sentences, encoding="utf-8") as f:
            sentences = [l.strip() for l in f if l.strip()]
        timings = _synthesize_set(
            args, cfg, args.decoder, sentences, args.out_dir, args.seed
        )
        summary = rtf_summary(timings)

    with open(os.path.join(args.out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
