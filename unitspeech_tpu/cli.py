"""Command-line entry points — API parity with the reference's L5 scripts
(SURVEY.md §1: train_STEP1.py / train_STEP2.py / finetune.py / inference.py /
scripts/{text_to_speech,voice_conversion}.py), one argparse CLI per task, one
config system.

    python -m unitspeech_tpu.cli inference --text "..." --decoder <ckpt> ...
    python -m unitspeech_tpu.cli finetune --reference ref.wav ...
    python -m unitspeech_tpu.cli train-step1 --filelist train.txt ...
    python -m unitspeech_tpu.cli train-step2 --filelist train.txt ...
    python -m unitspeech_tpu.cli voice-conversion --source src.wav ...
"""

from __future__ import annotations

import argparse
import json
import sys
from functools import partial


import numpy as np


def _common(ap: argparse.ArgumentParser):
    ap.add_argument("--config", default=None, help="JSON config overlay")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    ap.add_argument("--distributed", action="store_true",
                    help="multi-host launch: jax.distributed.initialize() "
                         "(auto topology on TPU pods, or UNITSPEECH_"
                         "COORDINATOR/NUM_PROCESSES/PROCESS_ID env); see "
                         "tools/tpu_pod_run.sh")
    ap.add_argument("--no-int8", dest="int8", action="store_false",
                    default=True,
                    help="disable the int8 deep-stage estimator convs "
                         "(on-TPU serving default since the r3 quality "
                         "gate; see INT8_GATE.json)")
    ap.add_argument("--no-fast-kernels", dest="fast_kernels",
                    action="store_false", default=True,
                    help="disable the fused Pallas serving kernels "
                         "(on-TPU default)")


def _setup(args):
    import jax

    from unitspeech_tpu.utils import compile_cache

    # every CLI entry point replays remote compiles from the persistent
    # cache (the warm adapt-a-voice session depends on this; measured 80 s
    # cold -> <0.1 s replay, utils/compile_cache.py)
    compile_cache.enable()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if getattr(args, "distributed", False):
        from unitspeech_tpu.parallel.launch import maybe_initialize_distributed

        maybe_initialize_distributed()
    from unitspeech_tpu.config import MainConfig, load_json

    return load_json(args.config) if args.config else MainConfig()


def _load_tts_models(args, cfg, need_vocoder=True):
    import jax
    import jax.numpy as jnp

    from unitspeech_tpu.infer.tts import TTSModels
    from unitspeech_tpu.models.diffusion import UnitSpeech
    from unitspeech_tpu.models.duration import DurationPredictor
    from unitspeech_tpu.models.encoder import Encoder
    from unitspeech_tpu.models.vocoder import BigVGAN
    from unitspeech_tpu.utils import artifacts

    dtype = jnp.bfloat16 if getattr(args, "bf16", True) else jnp.float32
    # serving defaults on TPU: fused Pallas kernels + int8 deep-stage convs
    # (int8 passed the r3 end-to-end quality gate — INT8_GATE.json: mel-L1/
    # MCD within 1.25x of the accepted bf16-vs-f32 numerics band)
    on_tpu = jax.default_backend() == "tpu"
    fast = on_tpu and getattr(args, "fast_kernels", True) \
        and dtype == jnp.bfloat16
    use_int8 = fast and getattr(args, "int8", True)
    bundle = artifacts.load_decoder_bundle(args.decoder, cfg.decoder)
    te_params = artifacts.load_encoder_params(args.text_encoder, cfg.text_encoder)
    dp_params = artifacts.load_duration_predictor_params(args.duration_predictor)
    vocoder = voc_params = None
    if need_vocoder:
        vocoder = BigVGAN.from_config(cfg.vocoder, dtype=dtype, use_pallas=fast)
        voc_params = artifacts.load_vocoder_params(args.vocoder, cfg.vocoder)
    spk_emb = bundle.spk_emb
    if getattr(args, "spk_emb", None):
        spk_emb = np.load(args.spk_emb).reshape(1, -1)
    if spk_emb is not None:
        spk_emb = spk_emb / np.linalg.norm(spk_emb)
    return TTSModels(
        cfg=cfg,
        text_encoder=Encoder.from_config(cfg.text_encoder),
        text_encoder_params=te_params,
        duration_predictor=DurationPredictor(
            in_channels=cfg.duration_predictor.in_channels,
            filter_channels=cfg.duration_predictor.filter_channels,
            kernel_size=cfg.duration_predictor.kernel_size,
            p_dropout=cfg.duration_predictor.p_dropout,
            spk_emb_dim=cfg.duration_predictor.spk_emb_dim,
        ),
        duration_predictor_params=dp_params,
        decoder=UnitSpeech.from_config(
            cfg.decoder, dtype=dtype, use_pallas_resnet=fast,
            use_pallas_attention=fast, use_int8_deep=use_int8,
        ),
        decoder_params=bundle.params,
        vocoder=vocoder,
        vocoder_params=voc_params,
        spk_emb=None if spk_emb is None else jnp.asarray(spk_emb, jnp.float32),
        mel_min=jnp.asarray(bundle.mel_min),
        mel_max=jnp.asarray(bundle.mel_max),
    )


# ---------------------------------------------------------------------------
# inference (reference inference.py / scripts/text_to_speech.py)
# ---------------------------------------------------------------------------


def main_inference(argv=None):
    ap = argparse.ArgumentParser("unitspeech-tpu inference")
    _common(ap)
    ap.add_argument("--text", required=True, help="input text (or IPA with --ipa)")
    ap.add_argument("--ipa", action="store_true", help="text is pre-phonemized IPA")
    ap.add_argument("--split-sentences", action="store_true",
                    help="long-text mode: split at sentence boundaries, "
                         "synthesize each chunk, concatenate — input length "
                         "is then not bounded by one frame bucket")
    ap.add_argument("--language", default=None, help="espeak language (en-us/ro)")
    ap.add_argument("--decoder", required=True)
    ap.add_argument("--text-encoder", required=True)
    ap.add_argument("--duration-predictor", required=True)
    ap.add_argument("--vocoder", required=True)
    ap.add_argument("--spk-emb", default=None, help=".npy speaker embedding override")
    ap.add_argument("--output", default="generated.wav")
    ap.add_argument("--diffusion-steps", type=int, default=None)
    ap.add_argument("--length-scale", type=float, default=None)
    ap.add_argument("--text-gradient-scale", type=float, default=None)
    ap.add_argument("--spk-gradient-scale", type=float, default=None)
    ap.add_argument("--no-sv56", action="store_true")
    ap.add_argument("--save-plot", default=None,
                    help="write the generated mel spectrogram as a PNG "
                         "(reference inference.py:143-149)")
    ap.add_argument("--fp32", dest="bf16", action="store_false")
    args = ap.parse_args(argv)
    cfg = _setup(args)

    import jax

    from unitspeech_tpu import text as text_frontend
    from unitspeech_tpu.data.dataset import write_wav
    from unitspeech_tpu.infer.tts import Synthesizer
    from unitspeech_tpu.ops import sv56

    models = _load_tts_models(args, cfg)
    synth = Synthesizer(models)

    if args.ipa:
        token_lists = [text_frontend.phonemes_to_sequence(args.text)]
    else:
        lang = args.language or cfg.inference.language
        ph = text_frontend.get_phonemizer(lang, fallback=True)
        if ph is None:
            raise SystemExit(
                "espeak-ng not installed and no G2P fallback for "
                f"{lang!r}: pass pre-phonemized IPA via --ipa"
            )
        chunks = (text_frontend.split_sentences(args.text)
                  if args.split_sentences else [args.text])
        token_lists = [
            ids for c in chunks
            if (ids := text_frontend.text_to_sequence(c, ph))
        ]
    if not token_lists:
        raise SystemExit("text produced no tokens")
    token_ids = token_lists[0]

    key = jax.random.PRNGKey(args.seed)
    if len(token_lists) > 1 and not args.save_plot:
        # long-text mode: one dispatch per sentence chunk, concatenated
        pieces = []
        for i, ids in enumerate(token_lists):
            w, sr = synth(
                ids, jax.random.fold_in(key, i),
                diffusion_steps=args.diffusion_steps,
                length_scale=args.length_scale,
                text_gradient_scale=args.text_gradient_scale,
                spk_gradient_scale=args.spk_gradient_scale,
            )
            pieces.append(np.asarray(w))
        wav = np.concatenate(pieces)
        if not args.no_sv56 and cfg.inference.with_sv56_normalization:
            wav = sv56.normalize(wav, sr)
        write_wav(args.output, wav, sr)
        print(f"wrote {args.output} ({len(wav) / sr:.2f}s @ {sr} Hz, "
              f"{len(token_lists)} chunks)")
        return 0
    if args.save_plot:
        mel, y_length, _attn = synth.synthesize_mel(
            token_ids, key,
            diffusion_steps=args.diffusion_steps,
            length_scale=args.length_scale,
            text_gradient_scale=args.text_gradient_scale,
            spk_gradient_scale=args.spk_gradient_scale,
        )
        save_mel_plot(np.asarray(mel[0, :y_length]), args.save_plot)
        wav_dev = synth.vocode(mel)
        hop = cfg.data.hop_length
        wav = np.asarray(wav_dev[0, : y_length * hop])
        sr = cfg.data.sampling_rate
    else:
        wav, sr = synth(
            token_ids, key,
            diffusion_steps=args.diffusion_steps,
            length_scale=args.length_scale,
            text_gradient_scale=args.text_gradient_scale,
            spk_gradient_scale=args.spk_gradient_scale,
        )
    if not args.no_sv56 and cfg.inference.with_sv56_normalization:
        wav = sv56.normalize(wav, sr)
    write_wav(args.output, wav, sr)
    print(f"wrote {args.output} ({len(wav) / sr:.2f}s @ {sr} Hz)")
    return 0


def save_mel_plot(mel, path: str):
    """Diagnostic spectrogram PNG (reference save_plot, util.py:110-121)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(12, 3))
    im = ax.imshow(mel.T, aspect="auto", origin="lower", interpolation="none")
    plt.colorbar(im, ax=ax)
    plt.tight_layout()
    fig.savefig(path)
    plt.close(fig)


# ---------------------------------------------------------------------------
# finetune (reference finetune.py / scripts/finetune.py)
# ---------------------------------------------------------------------------


def main_finetune(argv=None):
    ap = argparse.ArgumentParser("unitspeech-tpu finetune")
    _common(ap)
    ap.add_argument("--reference", required=True, help="reference wav (22.05 kHz)")
    ap.add_argument("--decoder", required=True, help="pretrained decoder ckpt")
    ap.add_argument("--unit-encoder", required=True)
    ap.add_argument("--output-dir", required=True)
    ap.add_argument("--n-iters", type=int, default=None)
    ap.add_argument("--learning-rate", type=float, default=None)
    ap.add_argument("--spk-emb", default=None,
                    help=".npy speaker embedding (skip the WavLM+ECAPA pass)")
    ap.add_argument("--units", default=None,
                    help=".npz with units+durations (skip the mHuBERT pass)")
    ap.add_argument("--speaker-embedder", default=None,
                    help="WavLM+ECAPA ckpt (torch or orbax)")
    ap.add_argument("--hubert", default=None, help="mHuBERT ckpt")
    ap.add_argument("--kmeans", default=None, help="k-means centroids (.npz/joblib)")
    ap.add_argument("--fp32", dest="bf16", action="store_false")
    ap.add_argument("--exact-ssl", action="store_true",
                    help="feed the speaker embedder the exact-length wav "
                         "(reference behavior) instead of the sample-bucket "
                         "ladder; costs a per-length WavLM compile on a "
                         "cold cache")
    ap.add_argument("--frame-buckets", default=DEFAULT_ADAPT_BUCKETS,
                    help="comma-separated mel-frame bucket ladder: the mel "
                         "frontend, unit encoder, and 500-iter finetune "
                         "scan all compile at the bucket size, so one "
                         "warmed ladder ('warmup-adapt') serves ANY "
                         "reference duration from the persistent compile "
                         "cache; '' disables bucketing (exact shapes, one "
                         "cold compile per new reference length)")
    args = ap.parse_args(argv)
    cfg = _setup(args)

    import jax
    import jax.numpy as jnp

    from unitspeech_tpu.data.dataset import load_wav
    from unitspeech_tpu.models.diffusion import UnitSpeech
    from unitspeech_tpu.models.encoder import Encoder
    from unitspeech_tpu.ops.units import process_unit
    from unitspeech_tpu.train.finetune import finetune_decoder, prepare_finetune_inputs
    from unitspeech_tpu.utils import artifacts

    bundle = artifacts.load_decoder_bundle(args.decoder, cfg.decoder)
    ue_params = artifacts.load_encoder_params(args.unit_encoder, cfg.unit_encoder)

    wav, sr = load_wav(args.reference)
    if sr != cfg.data.sampling_rate:
        raise SystemExit(f"{args.reference}: expected {cfg.data.sampling_rate} Hz, got {sr}")
    from unitspeech_tpu.ops.mel import normalize_mel

    mel, pad_to = _reference_mel(wav, cfg, args.frame_buckets)
    mel = normalize_mel(mel, bundle.mel_min, bundle.mel_max)

    # --- speaker embedding ---
    if args.spk_emb:
        spk_emb = np.load(args.spk_emb).reshape(1, -1)
    elif args.speaker_embedder:
        spk_emb = extract_speaker_embedding(
            args.speaker_embedder, wav, sr, cfg,
            sample_buckets=None if args.exact_ssl
            else DEFAULT_SPK_SAMPLE_BUCKETS,
        )
    elif bundle.spk_emb is not None:
        spk_emb = bundle.spk_emb
    else:
        raise SystemExit("need --spk-emb, --speaker-embedder, or a decoder ckpt with spk_emb")
    spk_emb = spk_emb / np.linalg.norm(spk_emb)

    # --- units ---
    if args.units:
        z = np.load(args.units)
        units, durations = z["units"], z["durations"]
    elif args.hubert and args.kmeans:
        units, durations = extract_units(args.hubert, args.kmeans, wav, sr, cfg)
    else:
        raise SystemExit("need --units or (--hubert and --kmeans)")
    units, durations = process_unit(
        units, durations, cfg.spk_embedder.sr, cfg.data.hop_length
    )

    unit_encoder = Encoder.from_config(cfg.unit_encoder)
    cond_x, y, y_lengths, attn = prepare_finetune_inputs(
        unit_encoder, ue_params, units, durations, mel,
        num_downsamplings=cfg.decoder.num_downsamplings, pad_to=pad_to,
    )

    decoder = UnitSpeech.from_config(
        cfg.decoder, dtype=jnp.bfloat16 if args.bf16 else jnp.float32
    )
    n_iters = args.n_iters or cfg.finetune.n_iters
    lr = args.learning_rate or cfg.finetune.learning_rate
    import time

    t0 = time.perf_counter()
    # AOT artifact cache (utils/aot_cache.py): a warmed session skips the
    # ~40 s scan trace+lowering, not just the XLA compile; the key folds
    # the decoder config + every static below, the value the arg shapes
    def _ft(params, c, yy, yl, a, s, k):
        return finetune_decoder(
            decoder.apply, params, c, yy, yl, a, s, k,
            segment_size=cfg.out_size, n_iters=n_iters, learning_rate=lr,
            grad_clip=cfg.finetune.grad_clip,
            beta_min=cfg.decoder.beta_min, beta_max=cfg.decoder.beta_max,
        )

    from unitspeech_tpu.utils import aot_cache

    (new_params, losses), _hit = aot_cache.cached_call(
        _adapt_aot_key(cfg, n_iters, lr, args.bf16), _ft,
        bundle.params, cond_x, y, y_lengths, attn,
        jnp.asarray(spk_emb, jnp.float32), jax.random.PRNGKey(args.seed),
    )
    losses = np.asarray(losses)
    dt = time.perf_counter() - t0
    out = artifacts.save_decoder_bundle(
        args.output_dir, n_iters,
        artifacts.DecoderBundle(
            params=new_params, spk_emb=spk_emb,
            mel_min=np.asarray(bundle.mel_min), mel_max=np.asarray(bundle.mel_max),
        ),
    )
    print(
        f"finetuned {n_iters} iters in {dt:.1f}s "
        f"(loss {losses[:10].mean():.4f} -> {losses[-10:].mean():.4f}) "
        f"aot_hit={bool(_hit)} -> {out}"
    )
    return 0


# Sample-bucket ladder for the 324M-param WavLM+ECAPA speaker embedder: its
# forward compiles per input length (~4 min cold on this stack), so the
# reference wav is reflect-extended to 6 s / 12 s of 16 kHz audio. Reflect
# continuation repeats the same speaker's audio, so the pooled embedding
# stays on-speaker (unit-normalized downstream); the exact-length reference
# behavior is available via extract_speaker_embedding(..., sample_buckets=
# None) / `finetune --exact-ssl`. Wavs longer than the ladder fall back to
# exact length.
DEFAULT_SPK_SAMPLE_BUCKETS = (96000, 192000)


def load_speaker_embedder(ckpt_path: str, cfg):
    """WavLM+ECAPA checkpoint -> (model, variables); load ONCE and reuse
    for corpus-scale embedding (the checkpoint is ~1.3 GB)."""
    from unitspeech_tpu.models.speaker import SpeakerEmbedder
    from unitspeech_tpu.utils.checkpoint import load_checkpoint
    from unitspeech_tpu.utils.torch_convert_ssl import convert_speaker_embedder

    if ckpt_path.endswith((".pt", ".pth", ".ckpt")):
        import torch

        obj = torch.load(ckpt_path, map_location="cpu", weights_only=True)
        sd = obj.get("model", obj)
        sd = {k: v.detach().cpu().numpy() for k, v in sd.items()}
        variables = convert_speaker_embedder(sd)
    else:
        variables = load_checkpoint(ckpt_path)
    return SpeakerEmbedder.from_config(cfg.spk_embedder), variables


def embed_speaker(model, variables, wav, sr: int, cfg,
                  sample_buckets=DEFAULT_SPK_SAMPLE_BUCKETS) -> np.ndarray:
    """wav -> 256-d embedding (host resample to 16 kHz, reference
    finetune.py:106-110). sample_buckets=None reproduces the reference's
    exact-length behavior (one compile per distinct wav length)."""
    import jax.numpy as jnp
    from scipy.signal import resample_poly

    from unitspeech_tpu.ops.mel import reflect_extend

    if sr != cfg.spk_embedder.sr:
        wav = resample_poly(np.asarray(wav, np.float64), cfg.spk_embedder.sr, sr)
    wav = np.asarray(wav, np.float32)
    if sample_buckets:
        for b in sample_buckets:
            if b >= len(wav):
                wav = reflect_extend(wav, b)
                break
    import jax

    emb = jax.jit(model.apply)(variables, jnp.asarray(wav[None], jnp.float32))
    return np.asarray(emb)


def extract_speaker_embedding(ckpt_path: str, wav, sr: int, cfg,
                              sample_buckets=DEFAULT_SPK_SAMPLE_BUCKETS) -> np.ndarray:
    """One-shot load + embed (see load_speaker_embedder / embed_speaker)."""
    model, variables = load_speaker_embedder(ckpt_path, cfg)
    return embed_speaker(model, variables, wav, sr, cfg, sample_buckets)


# Mel-frame bucket ladder for voice adaptation: 4/8/12/16/24 s of 22.05 kHz
# audio (hop 256). Every entry is a fix_len_compatibility multiple; the
# finetune scan, unit encoder, and mel frontend compile once PER BUCKET and
# replay from the persistent cache for any reference duration underneath
# (VERDICT r4 item 4 — the 12.7-minute cold adapt session was dominated by
# per-length compiles no cache entry could cover twice).
DEFAULT_ADAPT_BUCKETS = "344,688,1032,1376,2064"


def _adapt_aot_key(cfg, n_iters: int, lr: float, bf16: bool) -> str:
    """AOT-cache key for the adapt-a-voice finetune scan: every static the
    program depends on (decoder config + loop statics + dtype); the arg
    shapes (bucket) are folded in by aot_cache itself."""
    return (f"finetune|{cfg.decoder}|out{cfg.out_size}|it{n_iters}|lr{lr}"
            f"|clip{cfg.finetune.grad_clip}|bf16{bf16}")


def _reference_mel(wav, cfg, frame_buckets: str):
    """Mel of a reference wav with frame-bucketed compilation.

    Returns (mel (T_true, n_feats) float32, pad_to bucket or None). The wav
    is reflect-extended to bucket*hop samples so mel_spectrogram compiles at
    one shape per bucket; the first T_true frames are bit-identical to the
    exact-length mel (ops/mel.reflect_extend docstring)."""
    import numpy as _np

    from unitspeech_tpu.ops.masking import choose_bucket, fix_len_compatibility
    from unitspeech_tpu.ops.mel import (
        mel_spectrogram,
        mel_true_frames,
        reflect_extend,
    )

    d = cfg.data
    t_true = mel_true_frames(len(wav), d.n_fft, d.hop_length)
    pad_to = None
    if frame_buckets:
        ladder = tuple(int(x) for x in str(frame_buckets).split(",") if x)
        pad_to = choose_bucket(
            fix_len_compatibility(t_true, cfg.decoder.num_downsamplings),
            ladder,
        )
        # choose_bucket's above-ladder fallback rounds to multiples of 8
        # (num_down=3); re-round for THIS config so prepare_finetune_inputs
        # always accepts pad_to
        pad_to = fix_len_compatibility(pad_to, cfg.decoder.num_downsamplings)
        wav = reflect_extend(wav, pad_to * d.hop_length)
    mel = _np.asarray(
        mel_spectrogram(
            wav[None, :], n_fft=d.n_fft, num_mels=d.n_feats,
            sampling_rate=d.sampling_rate, hop_size=d.hop_length,
            win_size=d.win_length, fmin=d.mel_fmin, fmax=d.mel_fmax,
        )
    )[0][:t_true]
    return mel, pad_to


def build_unit_extractor(hubert_path: str, kmeans_path: str, cfg):
    """Load the mHuBERT + k-means stack ONCE; returns wav16 -> {units, durations}."""
    from unitspeech_tpu.models.ssl.hubert import (
        HubertFeatureReader,
        HubertModel,
        hubert_config_by_name,
    )
    from unitspeech_tpu.models.ssl.kmeans import KMeansQuantizer
    from unitspeech_tpu.models.ssl.speech_encoder import SpeechEncoder
    from unitspeech_tpu.utils.checkpoint import load_checkpoint
    from unitspeech_tpu.utils.torch_convert_ssl import (
        convert_hubert,
        convert_sklearn_kmeans,
    )

    name = cfg.unit_extractor.dense_model_name
    if name.startswith("cpc"):
        # CPC dense family (reference textless/__init__.py DENSE_MODELS:
        # "cpc-big-ll6k" -> CpcFeatureReader)
        from unitspeech_tpu.models.ssl.cpc import CpcFeatureReader

        reader = CpcFeatureReader.from_torch(
            hubert_path, layer=cfg.unit_extractor.hubert_layer
        )
        if kmeans_path.endswith(".npz"):
            quant = KMeansQuantizer.load(kmeans_path)
        else:
            quant = KMeansQuantizer(convert_sklearn_kmeans(kmeans_path))
        return SpeechEncoder(
            reader, quant, deduplicate=cfg.unit_extractor.deduplicate
        )

    model = HubertModel(hubert_config_by_name(name))
    if hubert_path.endswith((".pt", ".pth", ".ckpt")):
        import torch

        obj = torch.load(hubert_path, map_location="cpu", weights_only=False)
        sd = obj.get("model", obj)
        sd = {k: v.detach().cpu().numpy() for k, v in sd.items()}
        params = convert_hubert(sd)
    else:
        params = load_checkpoint(hubert_path)
    if kmeans_path.endswith(".npz"):
        quant = KMeansQuantizer.load(kmeans_path)
    else:
        quant = KMeansQuantizer(convert_sklearn_kmeans(kmeans_path))
    return SpeechEncoder(
        HubertFeatureReader(model, params, layer=cfg.unit_extractor.hubert_layer),
        quant, deduplicate=cfg.unit_extractor.deduplicate,
    )


def extract_units(hubert_path: str, kmeans_path: str, wav, sr: int, cfg):
    """wav -> (units, durations) at 50 Hz via mHuBERT + k-means."""
    from scipy.signal import resample_poly

    enc = build_unit_extractor(hubert_path, kmeans_path, cfg)
    wav16 = np.asarray(wav, np.float64)
    if sr != cfg.unit_extractor.sr:
        wav16 = resample_poly(wav16, cfg.unit_extractor.sr, sr)
    out = enc(wav16.astype(np.float32))
    return out["units"], out["durations"]


# ---------------------------------------------------------------------------
# voice conversion (reference scripts/voice_conversion.py)
# ---------------------------------------------------------------------------


def main_voice_conversion(argv=None):
    ap = argparse.ArgumentParser("unitspeech-tpu voice-conversion")
    _common(ap)
    ap.add_argument("--source", required=True, help="source wav (22.05 kHz)")
    ap.add_argument("--decoder", required=True, help="finetuned decoder ckpt")
    ap.add_argument("--content-encoder", required=True,
                    help="contentvec encoder ckpt")
    ap.add_argument("--content-features", default=None,
                    help=".npy (T, 768) contentvec features (skip extraction)")
    ap.add_argument("--contentvec", default=None, help="contentvec HuBERT ckpt")
    ap.add_argument("--vocoder", required=True)
    ap.add_argument("--spk-emb", default=None)
    ap.add_argument("--output", default="converted.wav")
    ap.add_argument("--diffusion-steps", type=int, default=50)
    ap.add_argument("--sampler", default="ddpm",
                    help="sampler spec: 'ddpm'/'dpm2' + optional ':cs<k>' "
                         "CFG-delta-caching stride (e.g. 'dpm2:cs2')")
    ap.add_argument("--text-gradient-scale", type=float, default=1.0)
    ap.add_argument("--spk-gradient-scale", type=float, default=1.0)
    ap.add_argument("--no-sv56", action="store_true")
    ap.add_argument("--fp32", dest="bf16", action="store_false")
    args = ap.parse_args(argv)
    cfg = _setup(args)

    import jax
    import jax.numpy as jnp

    from unitspeech_tpu.data.dataset import load_wav, write_wav
    from unitspeech_tpu.infer.vc import voice_conversion
    from unitspeech_tpu.models.diffusion import UnitSpeech
    from unitspeech_tpu.models.encoder import Encoder
    from unitspeech_tpu.models.vocoder import BigVGAN
    from unitspeech_tpu.ops import sv56
    from unitspeech_tpu.ops.mel import denormalize_mel  # noqa: F401 (API surface)
    from unitspeech_tpu.utils import artifacts

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    bundle = artifacts.load_decoder_bundle(args.decoder, cfg.decoder)
    enc_params = artifacts.load_encoder_params(
        args.content_encoder, cfg.contentvec_encoder, contentvec=True
    )
    wav, sr = load_wav(args.source)
    mel_len = len(wav) // cfg.data.hop_length

    if args.content_features:
        content = np.load(args.content_features)[None]
    elif args.contentvec:
        content = extract_contentvec(args.contentvec, wav, sr, cfg)[None]
    else:
        raise SystemExit("need --content-features or --contentvec")

    spk_emb = bundle.spk_emb if args.spk_emb is None else np.load(args.spk_emb).reshape(1, -1)
    spk_emb = spk_emb / np.linalg.norm(spk_emb)

    encoder = Encoder.from_config(cfg.contentvec_encoder)
    decoder = UnitSpeech.from_config(cfg.decoder, dtype=dtype)
    mel = voice_conversion(
        encoder, enc_params, decoder, bundle.params,
        jnp.asarray(content, jnp.float32), mel_len,
        jnp.asarray(spk_emb, jnp.float32),
        jnp.asarray(bundle.mel_min), jnp.asarray(bundle.mel_max),
        jax.random.PRNGKey(args.seed),
        n_timesteps=args.diffusion_steps,
        text_gradient_scale=args.text_gradient_scale,
        spk_gradient_scale=args.spk_gradient_scale,
        beta_min=cfg.decoder.beta_min, beta_max=cfg.decoder.beta_max,
        num_downsamplings=cfg.decoder.num_downsamplings,
        sampler=args.sampler,
    )
    vocoder = BigVGAN.from_config(cfg.vocoder, dtype=dtype)
    voc_params = artifacts.load_vocoder_params(args.vocoder, cfg.vocoder)
    out_wav = np.asarray(vocoder.apply(voc_params, mel))[0][: mel_len * cfg.data.hop_length]
    if not args.no_sv56:
        out_wav = sv56.normalize(out_wav, cfg.data.sampling_rate)
    write_wav(args.output, out_wav, cfg.data.sampling_rate)
    print(f"wrote {args.output}")
    return 0


def extract_contentvec(ckpt_path: str, wav, sr: int, cfg) -> np.ndarray:
    """Speaker-invariant content features via the contentvec HuBERT variant
    (reference scripts/voice_conversion.py:46-68); HF-format checkpoint is
    converted to our HubertModel."""
    from scipy.signal import resample_poly

    from unitspeech_tpu.models.ssl.contentvec import ContentvecExtractor

    extractor = ContentvecExtractor.from_torch(ckpt_path)
    wav16 = resample_poly(np.asarray(wav, np.float64), cfg.unit_extractor.sr, sr)
    return extractor(wav16.astype(np.float32))


# ---------------------------------------------------------------------------
# training (reference train_STEP1.py / train_STEP2.py)
# ---------------------------------------------------------------------------


def main_train_step1(argv=None):
    ap = argparse.ArgumentParser("unitspeech-tpu train-step1")
    _common(ap)
    ap.add_argument("--filelist", required=True)
    ap.add_argument("--spk-embs", required=True, help=".npz of per-speaker embeddings")
    ap.add_argument("--mel-stats", required=True, help=".npz with mel_min/mel_max")
    ap.add_argument("--uncond-stats", default=None,
                    help=".npz with text_uncond/spk_uncond (CFG training)")
    ap.add_argument("--log-dir", default=None)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--n-epochs", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--language", default="en-us")
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args(argv)
    cfg = _setup(args)

    import jax
    import jax.numpy as jnp
    import optax

    from unitspeech_tpu import text as text_frontend
    from unitspeech_tpu.data.dataset import (
        BucketCollator,
        TextMelSpeakerDataset,
        parse_filelist,
    )
    from unitspeech_tpu.models.diffusion import UnitSpeech
    from unitspeech_tpu.models.duration import DurationPredictor
    from unitspeech_tpu.models.encoder import Encoder
    from unitspeech_tpu.train.loop import TrainLoop
    from unitspeech_tpu.train.steps import TrainState, make_step1_train_step
    from unitspeech_tpu.utils.artifacts import load_speaker_embs

    if args.batch_size:
        from unitspeech_tpu.config import replace as cfg_replace

        cfg = cfg_replace(cfg, train=cfg_replace(cfg.train, batch_size=args.batch_size))

    ph = text_frontend.get_phonemizer(args.language)

    def text_to_ids(t):
        if ph is None:  # pre-phonemized filelists
            return text_frontend.phonemes_to_sequence(t, add_blank=cfg.data.add_blank)
        return text_frontend.text_to_sequence(t, ph, add_blank=cfg.data.add_blank)

    dataset = TextMelSpeakerDataset(
        parse_filelist(args.filelist), text_to_ids,
        hop_length=cfg.data.hop_length, sampling_rate=cfg.data.sampling_rate,
    )
    spk_embs = load_speaker_embs(args.spk_embs)
    stats = np.load(args.mel_stats)
    mel_min, mel_max = stats["mel_min"].reshape(-1), stats["mel_max"].reshape(-1)

    spk_uncond = None
    if args.uncond_stats:
        uz = np.load(args.uncond_stats)
        spk_uncond = jnp.asarray(uz["spk_uncond"].reshape(-1))

    text_encoder = Encoder.from_config(cfg.text_encoder)
    dp = DurationPredictor(
        in_channels=cfg.duration_predictor.in_channels,
        filter_channels=cfg.duration_predictor.filter_channels,
        kernel_size=cfg.duration_predictor.kernel_size,
        p_dropout=cfg.duration_predictor.p_dropout,
        spk_emb_dim=cfg.duration_predictor.spk_emb_dim,
    )
    decoder = UnitSpeech.from_config(
        cfg.decoder, dtype=jnp.bfloat16 if cfg.train.use_bf16 else jnp.float32
    )

    key = jax.random.PRNGKey(cfg.train.seed)
    k1, k2, k3 = jax.random.split(key, 3)
    s_dim = cfg.decoder.spk_emb_dim
    # jitted inits: eager full-size module construction pays ~25-35 ms
    # per-op dispatch on the tunneled TPU (minutes for the U-Net)
    params = {
        "text_encoder": jax.jit(text_encoder.init)(
            k1, jnp.zeros((1, 8), jnp.int32), jnp.array([8])
        ),
        "duration_predictor": jax.jit(
            lambda k, x, m, g: dp.init(k, x, m, g=g, reverse=True)
        )(
            k2, jnp.zeros((1, 8, cfg.text_encoder.n_channels)),
            jnp.ones((1, 8, 1)), jnp.zeros((1, s_dim)),
        ),
        "decoder": jax.jit(decoder.init)(
            k3, jnp.zeros((1, 8, cfg.data.n_feats)), jnp.ones((1, 8)),
            jnp.zeros((1, 8, cfg.data.n_feats)), jnp.zeros((1,)),
            jnp.zeros((1, s_dim)),
        ),
    }
    if args.uncond_stats:
        uz = np.load(args.uncond_stats)
        p = params["decoder"]["params"]
        params["decoder"]["params"] = dict(
            p,
            text_uncon=jnp.asarray(uz["text_uncond"].reshape(-1)),
            spk_uncon=jnp.asarray(uz["spk_uncond"].reshape(-1)),
        )

    optimizer = optax.adam(cfg.train.learning_rate)
    train_step = make_step1_train_step(
        text_encoder, dp, decoder, optimizer, out_size=cfg.out_size,
        spk_uncond=spk_uncond, spk_dropout=cfg.train.spk_dropout,
        clip_norms=(
            cfg.train.grad_clip_encoder,
            cfg.train.grad_clip_duration,
            cfg.train.grad_clip_decoder,
        ),
        beta_min=cfg.decoder.beta_min, beta_max=cfg.decoder.beta_max,
    )
    state = TrainState(params, optimizer.init(params), jnp.array(0))
    loop = TrainLoop(
        cfg=cfg, train_step=train_step, state=state, dataset=dataset,
        collator=BucketCollator(
            hop_length=cfg.data.hop_length,
            num_downsamplings=cfg.decoder.num_downsamplings,
        ),
        mel_min=jnp.asarray(mel_min), mel_max=jnp.asarray(mel_max),
        spk_embs=spk_embs,
        log_dir=args.log_dir or cfg.train.log_dir,
        checkpoint_dir=args.checkpoint_dir or cfg.train.checkpoint_dir,
        save_every=cfg.train.save_every, seed=cfg.train.seed,
    )
    start = loop.resume() if args.resume else 0
    loop.run(args.n_epochs or cfg.train.n_epochs, start)
    return 0


def main_train_step2(argv=None):
    ap = argparse.ArgumentParser("unitspeech-tpu train-step2")
    _common(ap)
    ap.add_argument("--filelist", required=True)
    ap.add_argument("--spk-embs", required=True)
    ap.add_argument("--mel-stats", required=True)
    ap.add_argument("--decoder", required=True, help="frozen pretrained decoder ckpt")
    ap.add_argument("--log-dir", default=None)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--n-epochs", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args(argv)
    cfg = _setup(args)

    import jax
    import jax.numpy as jnp
    import optax

    from unitspeech_tpu.data.dataset import (
        BucketCollator,
        UnitMelSpeakerDataset,
        parse_filelist,
    )
    from unitspeech_tpu.models.diffusion import UnitSpeech
    from unitspeech_tpu.models.encoder import Encoder
    from unitspeech_tpu.train.loop import TrainLoop
    from unitspeech_tpu.train.steps import TrainState, make_step2_train_step
    from unitspeech_tpu.utils.artifacts import load_decoder_bundle, load_speaker_embs

    if args.batch_size:
        from unitspeech_tpu.config import replace as cfg_replace

        cfg = cfg_replace(cfg, train=cfg_replace(cfg.train, batch_size=args.batch_size))

    dataset = UnitMelSpeakerDataset(
        parse_filelist(args.filelist),
        hop_length=cfg.data.hop_length, sampling_rate=cfg.data.sampling_rate,
    )
    spk_embs = load_speaker_embs(args.spk_embs)
    stats = np.load(args.mel_stats)
    bundle = load_decoder_bundle(args.decoder, cfg.decoder)

    unit_encoder = Encoder.from_config(cfg.unit_encoder)
    decoder = UnitSpeech.from_config(
        cfg.decoder, dtype=jnp.bfloat16 if cfg.train.use_bf16 else jnp.float32
    )
    key = jax.random.PRNGKey(cfg.train.seed)
    ue_params = jax.jit(unit_encoder.init)(
        key, jnp.zeros((1, 8), jnp.int32), jnp.array([8])
    )
    optimizer = optax.adam(cfg.train.learning_rate)
    train_step = make_step2_train_step(
        unit_encoder, decoder, optimizer, out_size=cfg.out_size,
        beta_min=cfg.decoder.beta_min, beta_max=cfg.decoder.beta_max,
    )
    state = TrainState(ue_params, optimizer.init(ue_params), jnp.array(0))
    loop = TrainLoop(
        cfg=cfg, train_step=train_step, state=state, dataset=dataset,
        collator=BucketCollator(
            hop_length=cfg.data.hop_length,
            num_downsamplings=cfg.decoder.num_downsamplings,
        ),
        mel_min=jnp.asarray(stats["mel_min"].reshape(-1)),
        mel_max=jnp.asarray(stats["mel_max"].reshape(-1)),
        spk_embs=spk_embs,
        log_dir=args.log_dir or cfg.train.log_dir,
        checkpoint_dir=args.checkpoint_dir or cfg.train.checkpoint_dir,
        save_every=cfg.train.save_every, seed=cfg.train.seed,
        extra_step_args=(bundle.params,),
    )
    start = loop.resume() if args.resume else 0
    loop.run(args.n_epochs or cfg.train.n_epochs, start)
    return 0


# ---------------------------------------------------------------------------
# preprocessing (reference preprocessing/*.py — runnable artifact builders)
# ---------------------------------------------------------------------------


def main_make_filelist(argv=None):
    """Build `path|text|speaker` train/valid/test filelists from a corpus
    tree. The reference ships pre-built filelists as data artifacts
    (resources/filelists/{ljspeech,libri-tts,swara}, referenced from
    conf/hydra_config.py:49-74); those are fixed published utterance-ID
    splits, so the portable equivalent is this deterministic seeded split
    generator over the user's local corpus copy.

    Layouts:
      ljspeech: ROOT/metadata.csv (`id|raw|normalized`), wavs at
                ROOT/wavs/<id>.wav, single speaker 0.
      libritts: ROOT/**/<utt>.wav + sidecar <utt>.normalized.txt (or .txt);
                speaker = first path component under ROOT (LibriTTS layout
                ROOT/<speaker>/<chapter>/...).
      generic:  ROOT/**/<utt>.wav + sidecar <utt>.txt|.lab; speaker =
                parent directory name.
    """
    import os
    import random

    ap = argparse.ArgumentParser("unitspeech-tpu make-filelist")
    ap.add_argument("--corpus", choices=("ljspeech", "libritts", "generic"),
                    required=True)
    ap.add_argument("--root", required=True, help="corpus root directory")
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--valid", type=int, default=100,
                    help="held-out validation utterances (reference ljspeech "
                         "valid.txt has 94)")
    ap.add_argument("--test", type=int, default=500,
                    help="held-out test utterances (reference test.txt: 487)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--speaker-ids", action="store_true",
                    help="map speaker names to dense integer ids (multi-"
                         "speaker training wants int ids; default keeps "
                         "names for generic corpora)")
    args = ap.parse_args(argv)

    entries = []  # (path, text, speaker)
    if args.corpus == "ljspeech":
        meta = os.path.join(args.root, "metadata.csv")
        with open(meta, encoding="utf-8") as fh:
            for line in fh:
                parts = line.rstrip("\n").split("|")
                if len(parts) < 2:
                    continue
                utt_id, text = parts[0], parts[-1]
                entries.append(
                    (os.path.join(args.root, "wavs", utt_id + ".wav"),
                     text, "0")
                )
    else:
        for dirpath, _dirnames, filenames in sorted(os.walk(args.root)):
            for fn in sorted(filenames):
                if not fn.endswith(".wav"):
                    continue
                stem = os.path.join(dirpath, fn[:-4])
                text = None
                for ext in (".normalized.txt", ".txt", ".lab"):
                    if os.path.exists(stem + ext):
                        with open(stem + ext, encoding="utf-8") as fh:
                            text = fh.read().strip().replace("|", " ")
                        break
                if text is None:
                    continue
                if args.corpus == "libritts":
                    rel = os.path.relpath(dirpath, args.root)
                    spk = rel.split(os.sep)[0]
                else:
                    spk = os.path.basename(dirpath)
                entries.append((stem + ".wav", text, spk))

    if not entries:
        print("no utterances found", file=sys.stderr)
        return 1
    if args.speaker_ids:
        ids = {s: i for i, s in enumerate(sorted({e[2] for e in entries}))}
        entries = [(p, t, str(ids[s])) for p, t, s in entries]

    rng = random.Random(args.seed)
    order = list(range(len(entries)))
    rng.shuffle(order)
    n_valid = min(args.valid, max(0, len(entries) - 1))
    n_test = min(args.test, max(0, len(entries) - n_valid - 1))
    splits = {
        "valid": [entries[i] for i in order[:n_valid]],
        "test": [entries[i] for i in order[n_valid:n_valid + n_test]],
        "train": [entries[i] for i in order[n_valid + n_test:]],
    }
    os.makedirs(args.out_dir, exist_ok=True)
    for name, rows in splits.items():
        out = os.path.join(args.out_dir, f"{name}.txt")
        with open(out, "w", encoding="utf-8") as fh:
            for p, t, s in sorted(rows):
                fh.write(f"{p}|{t}|{s}\n")
        print(f"{out}: {len(rows)} utterances")
    return 0


def main_preprocess_mel_stats(argv=None):
    """Global per-channel mel min/max over filelists
    (reference preprocessing/process_mel_normalization.py:15-58)."""
    ap = argparse.ArgumentParser("unitspeech-tpu preprocess-mel-stats")
    _common(ap)
    ap.add_argument("--filelist", action="append", required=True,
                    help="path|text|spk filelist (repeatable, e.g. train+test)")
    ap.add_argument("--out", required=True, help="output mel_stats.npz")
    ap.add_argument("--max-files", type=int, default=None)
    args = ap.parse_args(argv)
    cfg = _setup(args)
    from unitspeech_tpu.preprocess.stats import compute_mel_stats

    stats = compute_mel_stats(args.filelist, cfg.data, args.out, args.max_files)
    print(
        f"mel stats over {len(args.filelist)} filelist(s) -> {args.out} "
        f"(min {stats['mel_min'].min():.3f}, max {stats['mel_max'].max():.3f})"
    )
    return 0


def main_preprocess_spk_embs(argv=None):
    """Per-speaker mean WavLM+ECAPA embeddings
    (reference preprocessing/process_spkr_embs.py:63-100)."""
    ap = argparse.ArgumentParser("unitspeech-tpu preprocess-spk-embs")
    _common(ap)
    ap.add_argument("--filelist", action="append", required=True)
    ap.add_argument("--speaker-embedder", required=True,
                    help="WavLM+ECAPA ckpt (.pt torch or converted)")
    ap.add_argument("--out", required=True, help="output spk_embs.npz")
    ap.add_argument("--max-files", type=int, default=None)
    ap.add_argument("--bucket-ssl", action="store_true",
                    help="reflect-extend wavs to the sample-bucket ladder "
                         "(bounded compiles); DEFAULT here is the exact "
                         "per-length reference behavior so the persisted "
                         "corpus artifacts match process_spkr_embs.py")
    args = ap.parse_args(argv)
    cfg = _setup(args)
    from unitspeech_tpu.preprocess.stats import compute_speaker_embs

    # load the ~1.3 GB checkpoint ONCE for the whole corpus
    model, variables = load_speaker_embedder(args.speaker_embedder, cfg)

    def embed(wav, sr):
        return embed_speaker(
            model, variables, wav, sr, cfg,
            sample_buckets=DEFAULT_SPK_SAMPLE_BUCKETS if args.bucket_ssl
            else None,
        )

    means = compute_speaker_embs(args.filelist, cfg.data, embed, args.out,
                                 args.max_files)
    print(f"{len(means)} speaker embedding(s) -> {args.out}")
    return 0


def main_preprocess_uncond(argv=None):
    """Unconditional CFG embeddings: global mean normalized mel frame
    (text_uncond) + mean of speaker means (spk_uncond)
    (reference preprocessing/process_uncond_mel.py:22-48 and
    process_uncond_spk.py:34-44)."""
    ap = argparse.ArgumentParser("unitspeech-tpu preprocess-uncond")
    _common(ap)
    ap.add_argument("--filelist", action="append", required=True)
    ap.add_argument("--mel-stats", required=True, help="mel_stats.npz")
    ap.add_argument("--spk-embs", required=True, help="spk_embs.npz")
    ap.add_argument("--out", required=True, help="output uncond_stats.npz")
    ap.add_argument("--max-files", type=int, default=None)
    args = ap.parse_args(argv)
    cfg = _setup(args)
    from unitspeech_tpu.preprocess.stats import (
        compute_uncond_mel,
        compute_uncond_spk,
    )

    stats = np.load(args.mel_stats)
    text_uncond = compute_uncond_mel(
        args.filelist, cfg.data, stats["mel_min"].reshape(-1),
        stats["mel_max"].reshape(-1), max_files=args.max_files,
    )
    embs = np.load(args.spk_embs)
    spk_uncond = compute_uncond_spk({k: embs[k] for k in embs.files})
    np.savez(args.out, text_uncond=text_uncond, spk_uncond=spk_uncond)
    print(f"uncond stats ({text_uncond.shape[0]}-d mel, "
          f"{spk_uncond.shape[-1]}-d spk) -> {args.out}")
    return 0


def main_preprocess_units(argv=None):
    """Write <wav>.units.npz sidecars via mHuBERT + k-means
    (reference preprocessing/process_units.py:31-51)."""
    ap = argparse.ArgumentParser("unitspeech-tpu preprocess-units")
    _common(ap)
    ap.add_argument("--filelist", action="append", required=True)
    ap.add_argument("--hubert", required=True, help="mHuBERT ckpt")
    ap.add_argument("--kmeans", required=True, help="k-means centroids (.npz/joblib)")
    ap.add_argument("--max-files", type=int, default=None)
    args = ap.parse_args(argv)
    cfg = _setup(args)
    from scipy.signal import resample_poly

    from unitspeech_tpu.data.dataset import load_wav, parse_filelist

    enc = build_unit_extractor(args.hubert, args.kmeans, cfg)
    count = 0
    for fl in args.filelist:
        for entry in parse_filelist(fl):
            path = entry[0]
            wav, sr = load_wav(path)
            wav = np.asarray(wav, np.float64)
            if sr != cfg.unit_extractor.sr:
                wav = resample_poly(wav, cfg.unit_extractor.sr, sr)
            out = enc(wav.astype(np.float32))
            side = path.rsplit(".", 1)[0] + ".units.npz"
            np.savez(side, units=out["units"], durations=out["durations"])
            count += 1
            if args.max_files and count >= args.max_files:
                break
    print(f"unit sidecars for {count} wav(s)")
    return 0


def main_evaluate(argv=None):
    """Metric summary over a generated-samples directory — the CLI form of
    the reference's evaluation-metrics.ipynb (RTF stats from the recorded
    timings, WER/CER through an ASR hook, predicted MOS through a MOS hook,
    speaker cosine through an embedding hook), emitted as one CSV row.

    External models (Whisper, s3prl mos_wav2vec2, a speaker embedder) are
    separate installs for the reference too; they plug in as
    'module:function' hooks:
        --asr-hook  m:f   f(wav, sr) -> str
        --mos-hook  m:f   f(wav, sr) -> float
        --spk-hook  m:f   f(wav, sr) -> np.ndarray embedding
    """
    ap = argparse.ArgumentParser("unitspeech-tpu evaluate")
    ap.add_argument("--samples-dir", required=True,
                    help="directory from evaluation/generate_samples.py "
                         "(sample_*.wav + timings.npz)")
    ap.add_argument("--filelist", default=None,
                    help="path|text|spk filelist giving the reference text "
                         "for sample i on line i (enables WER/CER)")
    ap.add_argument("--reference-wav", default=None,
                    help="target-speaker reference wav (enables speaker "
                         "cosine when --spk-hook is given)")
    ap.add_argument("--asr-hook", default=None)
    ap.add_argument("--mos-hook", default=None)
    ap.add_argument("--spk-hook", default=None)
    ap.add_argument("--unit-hook", default=None,
                    help="'module:function' f(wav, sr) -> unit-id array for "
                         "the ASR-free unit-round-trip intelligibility "
                         "metric (uer_*); alternatively give --hubert + "
                         "--kmeans to use the in-repo mHuBERT stack")
    ap.add_argument("--hubert", default=None,
                    help="mHuBERT ckpt for the in-repo unit extractor")
    ap.add_argument("--kmeans", default=None,
                    help="k-means centroids (.npz/joblib) for the in-repo "
                         "unit extractor")
    ap.add_argument("--uer-ref-dir", default=None,
                    help="directory of ground-truth wavs for sample i "
                         "(sorted); default = the wav paths in --filelist")
    ap.add_argument("--out", default=None, help="summary CSV path "
                    "(default <samples-dir>/summary.csv)")
    args = ap.parse_args(argv)

    import glob
    import json
    import os

    from unitspeech_tpu.data.dataset import load_wav, parse_filelist
    from unitspeech_tpu.eval import harness

    wav_paths = sorted(glob.glob(os.path.join(args.samples_dir, "sample_*.wav")))
    if not wav_paths:
        print(f"no sample_*.wav under {args.samples_dir}", file=sys.stderr)
        return 2
    wavs = [load_wav(p) for p in wav_paths]

    timings = None
    tpath = os.path.join(args.samples_dir, "timings.npz")
    if os.path.exists(tpath):
        timings = harness.EvalTimings.load(tpath)

    transcription_pairs = transcribe = None
    if args.asr_hook and args.filelist:
        texts = [e[1] for e in parse_filelist(args.filelist)]
        n = min(len(texts), len(wavs))
        transcription_pairs = [
            (wavs[i][0], wavs[i][1], texts[i]) for i in range(n)
        ]
        transcribe = harness.load_hook(args.asr_hook)

    predict_mos = harness.load_hook(args.mos_hook) if args.mos_hook else None

    embedding_pairs = None
    if args.spk_hook and args.reference_wav:
        embed = harness.load_hook(args.spk_hook)
        ref_wav, ref_sr = load_wav(args.reference_wav)
        ref_emb = np.asarray(embed(ref_wav, ref_sr))
        embedding_pairs = [
            (ref_emb, np.asarray(embed(w, sr))) for w, sr in wavs
        ]

    # ASR-free unit-round-trip intelligibility (VERDICT r4 item 5): extract
    # units from each synthesized wav and from the matching ground-truth
    # wav, score the unit error rate with the in-repo mHuBERT+k-means stack
    # (or any '--unit-hook'). Ground truth comes from --uer-ref-dir (sorted
    # wavs) or the --filelist path column.
    unit_pairs = extract_units_hook = None
    if args.unit_hook or (args.hubert and args.kmeans):
        if args.unit_hook:
            extract_units_hook = harness.load_hook(args.unit_hook)
        else:
            from unitspeech_tpu.config import MainConfig

            enc = build_unit_extractor(args.hubert, args.kmeans, MainConfig())
            extract_units_hook = harness.speech_encoder_unit_hook(enc)
        if args.uer_ref_dir:
            ref_paths = sorted(glob.glob(os.path.join(args.uer_ref_dir, "*.wav")))
        elif args.filelist:
            ref_paths = [e[0] for e in parse_filelist(args.filelist)]
        else:
            ref_paths = []
        n = min(len(ref_paths), len(wavs))
        if n == 0:
            print("uer: no ground-truth wavs (--uer-ref-dir / --filelist); "
                  "skipping", file=sys.stderr)
            extract_units_hook = None
        else:
            unit_pairs = []
            for i in range(n):
                rw, rsr = load_wav(ref_paths[i])
                unit_pairs.append((wavs[i][0], wavs[i][1], rw, rsr))

    row = harness.evaluation_summary(
        timings=timings,
        transcription_pairs=transcription_pairs,
        transcribe=transcribe,
        mos_wavs=wavs if predict_mos else None,
        predict_mos=predict_mos,
        embedding_pairs=embedding_pairs,
        unit_pairs=unit_pairs,
        extract_units=extract_units_hook,
    )
    row["n_samples"] = len(wavs)
    out = args.out or os.path.join(args.samples_dir, "summary.csv")
    harness.write_summary_csv(out, row)
    print(json.dumps(row))
    print(f"summary -> {out}")
    return 0




def main_warmup_adapt(argv=None):
    """Populate the persistent compile cache for the whole adapt-a-voice
    session (VERDICT r4 item 4: the cold session was 12.7 min of compiles).

    Compiles, with random weights (the cache key covers only the PROGRAM, so
    warmed executables replay for real checkpoints): per frame bucket the
    mel frontend, unit-encoder forward, and the full n-iter finetune scan;
    plus (default on) the WavLM+ECAPA speaker embedder at its sample-bucket
    ladder and the mHuBERT reader at every sample bucket up to
    --max-seconds. After one warmup, a fresh `finetune` process replays
    everything from ~/.cache/unitspeech_tpu_xla (tools/bench_ssl.py --label
    warm records the measured warm session)."""
    ap = argparse.ArgumentParser("unitspeech-tpu warmup-adapt")
    _common(ap)
    ap.add_argument("--frame-buckets", default=DEFAULT_ADAPT_BUCKETS)
    ap.add_argument("--n-iters", type=int, default=None)
    ap.add_argument("--max-seconds", type=float, default=12.0,
                    help="longest reference wav to warm the SSL stacks for")
    ap.add_argument("--no-ssl", dest="ssl", action="store_false",
                    default=True, help="skip the SSL stack warmup")
    ap.add_argument("--fp32", dest="bf16", action="store_false")
    args = ap.parse_args(argv)
    cfg = _setup(args)

    import time

    import jax
    import jax.numpy as jnp

    from unitspeech_tpu.models.diffusion import UnitSpeech
    from unitspeech_tpu.models.encoder import Encoder
    from unitspeech_tpu.ops.mel import mel_spectrogram
    from unitspeech_tpu.train.finetune import finetune_decoder

    d = cfg.data
    n_iters = args.n_iters or cfg.finetune.n_iters
    ladder = tuple(int(x) for x in str(args.frame_buckets).split(",") if x)
    report = {"frame_buckets": list(ladder), "n_iters": n_iters,
              "compiles": {}}

    unit_encoder = Encoder.from_config(cfg.unit_encoder)
    ue_params = jax.jit(unit_encoder.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32), jnp.array([8])
    )
    decoder = UnitSpeech.from_config(
        cfg.decoder, dtype=jnp.bfloat16 if args.bf16 else jnp.float32
    )
    dec_params = jax.jit(decoder.init)(
        jax.random.PRNGKey(1),
        jnp.zeros((1, 8, cfg.decoder.n_feats)), jnp.ones((1, 8)),
        jnp.zeros((1, 8, cfg.decoder.n_feats)), jnp.zeros((1,)),
        jnp.zeros((1, cfg.decoder.spk_emb_dim)),
    )
    from unitspeech_tpu.train.finetune import prepare_finetune_inputs

    for b in ladder:
        t0 = time.perf_counter()
        np.asarray(mel_spectrogram(
            jnp.zeros((1, b * d.hop_length)), n_fft=d.n_fft,
            num_mels=d.n_feats, sampling_rate=d.sampling_rate,
            hop_size=d.hop_length, win_size=d.win_length, fmin=d.mel_fmin,
            fmax=d.mel_fmax,
        ))
        # warm the EXACT device-prep program main_finetune runs
        # (finetune._prepare_jit: encoder + masks + generate_path fused),
        # with representative shapes: ~b/3 tokens whose durations sum to
        # < b frames, padded to the bucket inside prepare
        n_tok = max(b // 3, 1)
        cond_x, y, y_lengths, attn = prepare_finetune_inputs(
            unit_encoder, ue_params,
            np.zeros(n_tok, np.int64), np.full(n_tok, 2, np.int64),
            np.zeros((min(2 * n_tok, b), d.n_feats), np.float32),
            num_downsamplings=cfg.decoder.num_downsamplings, pad_to=b,
        )
        # the big one: the n-iter finetune scan at this bucket. Built
        # through the SAME AOT-artifact path main_finetune replays
        # (utils/aot_cache): statics + key + ARG SHAPES mirror it exactly
        # (cond_x is the encoder's mu_x — width n_feats, NOT n_channels)
        def _ft(params, c, yy, yl, a, s, k):
            return finetune_decoder(
                decoder.apply, params, c, yy, yl, a, s, k,
                segment_size=cfg.out_size, n_iters=n_iters,
                learning_rate=cfg.finetune.learning_rate,
                grad_clip=cfg.finetune.grad_clip,
                beta_min=cfg.decoder.beta_min, beta_max=cfg.decoder.beta_max,
            )

        from unitspeech_tpu.utils import aot_cache

        aot_cache.warm(
            _adapt_aot_key(cfg, n_iters, cfg.finetune.learning_rate,
                           args.bf16),
            _ft, dec_params, cond_x, y, y_lengths, attn,
            jnp.zeros((1, cfg.decoder.spk_emb_dim)),
            jax.random.PRNGKey(2),
        )
        report["compiles"][f"bucket_{b}"] = round(time.perf_counter() - t0, 1)
        print(json.dumps({f"bucket_{b}_s": report["compiles"][f"bucket_{b}"]}),
              flush=True)

    if args.ssl:
        from unitspeech_tpu.models.speaker import SpeakerEmbedder
        from unitspeech_tpu.models.ssl.hubert import (
            HubertFeatureReader,
            HubertModel,
            hubert_config_by_name,
        )

        max_samples = int(args.max_seconds * cfg.spk_embedder.sr)
        spk_model = SpeakerEmbedder.from_config(cfg.spk_embedder)
        t0 = time.perf_counter()
        # host-filled params (utils/params.py): jit(init) would load a
        # ~150 MB init executable onto the tunneled server (146-344 s)
        from unitspeech_tpu.utils.params import host_random_params

        spk_vars = host_random_params(
            spk_model,
            (jax.random.PRNGKey(3), jnp.zeros((1, 8000), jnp.float32)),
        )
        spk_fwd = jax.jit(spk_model.apply)
        for b in DEFAULT_SPK_SAMPLE_BUCKETS:
            if b > max(max_samples, DEFAULT_SPK_SAMPLE_BUCKETS[0]):
                break
            np.asarray(spk_fwd(spk_vars, jnp.zeros((1, b), jnp.float32)))
            print(json.dumps({f"spk_{b}_s":
                              round(time.perf_counter() - t0, 1)}),
                  flush=True)
            t0 = time.perf_counter()
        hcfg = hubert_config_by_name(cfg.unit_extractor.dense_model_name)
        hmodel = HubertModel(hcfg)
        hparams = host_random_params(
            hmodel, (jax.random.PRNGKey(4), jnp.zeros((1, 8000), jnp.float32))
        )
        reader = HubertFeatureReader(
            hmodel, hparams,
            layer=min(cfg.unit_extractor.hubert_layer, hcfg.num_layers),
        )
        t0 = time.perf_counter()
        for b in reader.buckets:
            if b > max_samples + reader.buckets[0]:
                break
            reader(np.zeros(b, np.float32))
            report["compiles"][f"hubert_{b}"] = round(
                time.perf_counter() - t0, 1
            )
            t0 = time.perf_counter()
        print(json.dumps({"hubert_buckets_warmed":
                          len([k for k in report["compiles"]
                               if k.startswith("hubert_")])}), flush=True)

    print(json.dumps({"warmed": True, **report}))
    return 0


def main_train_vocoder(argv=None):
    """BigVGAN adversarial training (capability beyond the reference, which
    ships its discriminators untrained — SURVEY.md §2.1 #9): alternating
    MPD/MRD + generator updates with feature-matching and 45x mel losses."""
    ap = argparse.ArgumentParser("unitspeech-tpu train-vocoder")
    _common(ap)
    ap.add_argument("--filelist", required=True,
                    help="wav filelist (path or path|text|spk lines)")
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--segment-size", type=int, default=8192)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--log-dir", default=None)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--save-every", type=int, default=500)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--preload-limit", type=int, default=256,
                    help="filelists larger than this are loaded lazily per "
                         "draw instead of preloaded into host RAM (a full "
                         "BigVGAN corpus would exhaust memory)")
    args = ap.parse_args(argv)
    cfg = _setup(args)

    from unitspeech_tpu.data.dataset import load_wav, parse_filelist
    from unitspeech_tpu.train.vocoder_loop import (
        VocoderTrainConfig,
        train_vocoder,
    )

    rows = parse_filelist(args.filelist)

    def _checked_load(path):
        wav, sr = load_wav(path)
        if sr != cfg.data.sampling_rate:
            raise ValueError(f"{path}: {sr} != {cfg.data.sampling_rate}")
        return wav

    if len(rows) > args.preload_limit:
        # lazy: SegmentSampler calls the loader per draw (sample rate is
        # checked on first touch of each file)
        wavs = [partial(_checked_load, row[0]) for row in rows]
        _checked_load(rows[0][0])  # fail fast on an obviously wrong corpus
    else:
        try:
            wavs = [_checked_load(row[0]) for row in rows]
        except ValueError as e:
            raise SystemExit(str(e))
    tcfg = VocoderTrainConfig(
        segment_size=args.segment_size, batch_size=args.batch_size,
        learning_rate=args.lr, steps=args.steps, seed=args.seed,
        save_every=args.save_every,
    )
    _, _, metrics = train_vocoder(
        cfg, wavs, tcfg, log_dir=args.log_dir,
        checkpoint_dir=args.checkpoint_dir, resume=args.resume,
    )
    print(json.dumps({"final_metrics": metrics}))
    return 0


def main_serve(argv=None):
    """Production TTS serving daemon (capability beyond the reference, whose
    inference.py is a one-shot CLI): dynamic batching over the bucket-switch
    executable + an HTTP front-end (unitspeech_tpu/serve.py). One process
    per chip; warmup compiles the whole serving grid before the port opens."""
    ap = argparse.ArgumentParser("unitspeech-tpu serve")
    _common(ap)
    ap.add_argument("--decoder", required=True)
    ap.add_argument("--text-encoder", required=True)
    ap.add_argument("--duration-predictor", required=True)
    ap.add_argument("--vocoder", required=True)
    ap.add_argument("--spk-emb", default=None,
                    help=".npy speaker embedding override")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8777)
    ap.add_argument("--max-batch", type=int, default=8)
    ap.add_argument("--max-wait-ms", type=float, default=20.0,
                    help="dynamic-batching wait window (latency traded for "
                         "aggregate throughput)")
    ap.add_argument("--max-queue", type=int, default=256,
                    help="pending-request cap: submissions beyond it get "
                         "503 (backpressure) instead of unbounded queueing; "
                         "0 = unbounded")
    ap.add_argument("--strict-grid", action="store_true",
                    help="reject requests outside the warmed compile grid "
                         "(non-default steps/sampler, over-long tokens, "
                         "frame-window overflows) instead of paying a lazy "
                         "XLA compile on the dispatcher thread")
    ap.add_argument("--diffusion-steps", type=int, default=None)
    ap.add_argument("--sampler", default="ddpm",
                    help="default sampler spec: reference-parity 'ddpm' or "
                         "the quality-gated DPM-Solver++(2M) fast mode "
                         "'dpm2' (DPM2_GATE.json), optionally with a "
                         "':cs<k>' CFG-delta-caching stride suffix, e.g. "
                         "'dpm2:cs2' (CFG_GATE.json)")
    ap.add_argument("--length-scale", type=float, default=None)
    ap.add_argument("--text-gradient-scale", type=float, default=None)
    ap.add_argument("--spk-gradient-scale", type=float, default=None)
    ap.add_argument("--language", default=None,
                    help="espeak language for text payloads (token_ids "
                         "payloads always work)")
    ap.add_argument("--calibration-file", default=None,
                    help="one utterance per line; phonemized (or read as "
                         "IPA with --ipa-calibration) at startup to derive "
                         "the bucket-switch window from the corpus' length "
                         "distribution")
    ap.add_argument("--ipa-calibration", action="store_true",
                    help="calibration file lines are pre-phonemized IPA")
    ap.add_argument("--switch-buckets", default=None,
                    help="comma-separated frame buckets (skips calibration; "
                         "e.g. 344,384,432)")
    ap.add_argument("--bucket-policy", default="cost",
                    choices=("cost", "quantile"),
                    help="frame-window derivation from the calibrated "
                         "length distribution: 'cost' (default — minimize "
                         "expected per-request cost under the measured "
                         "serving cost model; chip-validated 2.31x over "
                         "'quantile' on long-tail traffic, BUCKET_AB.json) "
                         "or the pre-r4s5 'quantile' P5..max heuristic; "
                         "tools/analyze_buckets.py evaluates both offline")
    ap.add_argument("--warmup-token-lengths", default="64",
                    help="comma-separated token lengths whose buckets are "
                         "precompiled across the batch ladder")
    ap.add_argument("--voices", default=None,
                    help="voice bank for multi-voice serving: a directory "
                         "of <name>.npy speaker embeddings or one .npz "
                         "keyed by name; requests select with "
                         "{\"speaker\": \"<name>\"}")
    ap.add_argument("--dry-run", action="store_true",
                    help="build + calibrate + warm up, print the serving "
                         "config JSON, and exit without opening the port")
    ap.add_argument("--fp32", dest="bf16", action="store_false")
    args = ap.parse_args(argv)
    cfg = _setup(args)

    import dataclasses as dc

    from unitspeech_tpu import text as text_frontend
    from unitspeech_tpu.infer.tts import Synthesizer
    from unitspeech_tpu.models.diffusion import parse_sampler_spec
    from unitspeech_tpu.serve import build_batcher, make_http_server

    parse_sampler_spec(args.sampler)  # fail a typo'd spec at startup

    models = _load_tts_models(args, cfg)
    synth = Synthesizer(models)
    if args.switch_buckets:
        window = tuple(sorted(int(b) for b in args.switch_buckets.split(",")))
        synth = dc.replace(synth, switch_buckets=window)
        calibration_texts = None
    elif args.calibration_file:
        lang = args.language or cfg.inference.language
        ph = (None if args.ipa_calibration
              else text_frontend.get_phonemizer(lang, fallback=True))
        if ph is None and not args.ipa_calibration:
            raise SystemExit(
                "espeak-ng not installed and no G2P fallback for "
                f"{lang!r}: use --ipa-calibration or --switch-buckets"
            )
        with open(args.calibration_file, encoding="utf-8") as f:
            lines = [ln.strip() for ln in f if ln.strip()]
        calibration_texts = [
            text_frontend.phonemes_to_sequence(ln) if args.ipa_calibration
            else text_frontend.text_to_sequence(ln, ph)
            for ln in lines
        ]
    else:
        raise SystemExit("pass --calibration-file or --switch-buckets")

    kw = {}
    if args.diffusion_steps is not None:
        kw["default_steps"] = args.diffusion_steps
    if args.length_scale is not None:
        kw["length_scale"] = args.length_scale
    if args.text_gradient_scale is not None:
        kw["text_gradient_scale"] = args.text_gradient_scale
    if args.spk_gradient_scale is not None:
        kw["spk_gradient_scale"] = args.spk_gradient_scale
    warmup_lengths = tuple(
        int(t) for t in args.warmup_token_lengths.split(",")
    )
    if args.voices:
        from unitspeech_tpu.utils.artifacts import load_speaker_embs

        kw["voices"] = load_speaker_embs(args.voices, int_keys=False)
    batcher = build_batcher(
        synth, calibration_texts=calibration_texts,
        max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
        warmup_token_lengths=warmup_lengths,
        default_sampler=args.sampler, strict_grid=args.strict_grid,
        max_queue=args.max_queue or None,
        bucket_policy=args.bucket_policy, **kw,
    )
    serving_cfg = {
        "switch_buckets": list(batcher.synth.switch_buckets),
        "batch_ladder": batcher.batch_ladder,
        "default_steps": batcher.default_steps,
        "default_sampler": batcher.default_sampler,
        "length_scale": batcher.length_scale,
        "cfg_scales": [batcher.tg, batcher.sg],
        "max_wait_ms": args.max_wait_ms,
        "voices": sorted(batcher.voices),
    }
    if args.dry_run:
        batcher.shutdown()
        print(json.dumps({"serving_config": serving_cfg, "warmed": True}))
        return 0

    lang = args.language or cfg.inference.language
    ph = text_frontend.get_phonemizer(lang, fallback=True)
    text_to_ids = (
        None if ph is None
        else (lambda s: text_frontend.text_to_sequence(s, ph))
    )
    srv = make_http_server(batcher, host=args.host, port=args.port,
                           text_to_ids=text_to_ids)
    print(json.dumps({
        "serving_config": serving_cfg,
        "listening": f"http://{args.host}:{srv.server_address[1]}",
    }), flush=True)
    import signal

    def _sigterm(*_a):
        # raise into serve_forever so the finally below drains the batcher
        # (resolving queued futures) before the process exits
        raise KeyboardInterrupt

    signal.signal(signal.SIGTERM, _sigterm)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.shutdown()
        batcher.shutdown()
    return 0


COMMANDS = {
    "inference": main_inference,
    "serve": main_serve,
    "evaluate": main_evaluate,
    "finetune": main_finetune,
    "warmup-adapt": main_warmup_adapt,
    "voice-conversion": main_voice_conversion,
    "train-step1": main_train_step1,
    "train-step2": main_train_step2,
    "train-vocoder": main_train_vocoder,
    "make-filelist": main_make_filelist,
    "preprocess-mel-stats": main_preprocess_mel_stats,
    "preprocess-spk-embs": main_preprocess_spk_embs,
    "preprocess-uncond": main_preprocess_uncond,
    "preprocess-units": main_preprocess_units,
}


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print("usage: python -m unitspeech_tpu.cli <command> [...]\ncommands:", file=sys.stderr)
        for name in COMMANDS:
            print(f"  {name}", file=sys.stderr)
        return 0 if argv else 2
    cmd = argv.pop(0)
    if cmd not in COMMANDS:
        print(f"unknown command {cmd!r}; available: {', '.join(COMMANDS)}", file=sys.stderr)
        return 2
    return COMMANDS[cmd](argv)


if __name__ == "__main__":
    raise SystemExit(main())
