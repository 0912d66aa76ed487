#!/usr/bin/env python
"""Full-size SSL on the real chip + the adapt-a-voice wall clock
(VERDICT r4 item 5: WavLM-Large and mHuBERT had only been parity-tested at
tiny configs on CPU; full-size compiles on the Mosaic/axon stack are where
surprises live, and the user-facing "adapt a voice" time — SSL extraction +
500-iter finetune, reference finetune.py:34-173 — was unmeasured).

Measures, at published sizes with random weights (timing is
weight-independent):
  1. WavLM-Large (24L/1024d) + ECAPA speaker embedding of a 10 s wav
  2. mHuBERT-base + k-means(1000) unit extraction of the same wav
  3. the END-TO-END adapt-a-voice: 22.05 kHz wav -> mel -> spk_emb ->
     units -> unit-encoder conditioning -> 500-iter finetune scan

Writes SSL_BENCH.json. Run:  JAX_PLATFORMS=tpu python tools/bench_ssl.py
"""
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import argparse
import json
import os
import time

import numpy as np

import jax

from unitspeech_tpu.utils import compile_cache

compile_cache.enable()

import jax.numpy as jnp

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def timed(fn, *args, reps=3):
    out = fn(*args)
    jax.tree_util.tree_map(np.asarray, out)  # materialize (axon barrier)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree_util.tree_map(np.asarray, out)
        ts.append(time.perf_counter() - t0)
    return out, float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--n-iters", type=int, default=500)
    ap.add_argument("--label", default=None, choices=[None, "warm"],
                    help="'warm': record this run's total_session_s as "
                         "adapt_voice.warm_session_s inside the existing "
                         "SSL_BENCH.json instead of overwriting it (run "
                         "after a cold run / `cli.py warmup-adapt` so the "
                         "persistent compile cache is populated — VERDICT "
                         "r4 item 4)")
    args = ap.parse_args()
    if args.smoke:
        jax.config.update("jax_platforms", "cpu")

    from scipy.signal import resample_poly

    from unitspeech_tpu.config import MainConfig
    from unitspeech_tpu.models.diffusion import UnitSpeech
    from unitspeech_tpu.models.encoder import Encoder
    from unitspeech_tpu.models.speaker import SpeakerEmbedder
    from unitspeech_tpu.models.ssl.hubert import (
        HubertFeatureReader, HubertModel, hubert_config_by_name,
    )
    from unitspeech_tpu.models.ssl.kmeans import KMeansQuantizer
    from unitspeech_tpu.models.ssl.speech_encoder import SpeechEncoder
    from unitspeech_tpu.ops.mel import mel_spectrogram, normalize_mel
    from unitspeech_tpu.ops.units import process_unit
    from unitspeech_tpu.train.finetune import (
        finetune_decoder, prepare_finetune_inputs,
    )

    cfg = MainConfig()
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    spk_variant = "wavlm_large" if not args.smoke else "wavlm_test"
    hubert_name = ("mhubert-base-vp_en_es_fr" if not args.smoke
                   else "hubert-test")
    n_iters = args.n_iters if not args.smoke else 3
    report = {"seconds": args.seconds, "variant": spk_variant,
              "device": jax.devices()[0].platform, "n_iters": n_iters}

    rng = np.random.default_rng(0)
    sr_mel = cfg.data.sampling_rate
    t = np.arange(int(sr_mel * args.seconds)) / sr_mel
    wav22 = (0.3 * np.sin(2 * np.pi * 160 * t)
             + 0.1 * np.sin(2 * np.pi * 320 * t)
             + 0.02 * rng.standard_normal(t.size)).astype(np.float32)
    wav16 = resample_poly(wav22.astype(np.float64), cfg.spk_embedder.sr,
                          sr_mel).astype(np.float32)

    total_t0 = time.perf_counter()

    # --- 1) speaker embedding (WavLM-Large + ECAPA) ---
    import dataclasses as dc

    scfg = dc.replace(cfg.spk_embedder, feat_type=spk_variant)
    spk_model = SpeakerEmbedder.from_config(scfg, dtype=dtype)
    t0 = time.perf_counter()
    # param materialization the way a REAL session does it (checkpoint ->
    # host arrays -> device): eval_shape for the tree (trace only), host
    # random fill, one H2D. Running jit(init) instead loads a ~150 MB init
    # EXECUTABLE onto the tunneled server — measured 146-344 s even on a
    # persistent-cache HIT, a cost no real session pays.
    from unitspeech_tpu.utils.params import host_random_params

    spk_vars = host_random_params(
        spk_model, (jax.random.PRNGKey(0), jnp.zeros((1, 8000), jnp.float32))
    )
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(spk_vars))
    spk_fwd = jax.jit(spk_model.apply)
    emb, spk_s = timed(spk_fwd, spk_vars, jnp.asarray(wav16[None]))
    report["spk_embedder"] = {
        "params_m": round(n_params / 1e6, 1),
        "init_and_first_s": round(time.perf_counter() - t0, 1),
        "forward_s": round(spk_s, 4),
    }
    print(json.dumps(report["spk_embedder"]), flush=True)
    spk_emb = np.array(emb, np.float32).reshape(1, -1)
    spk_emb = spk_emb / np.linalg.norm(spk_emb)

    # --- 2) unit extraction (mHuBERT + kmeans) ---
    hcfg = hubert_config_by_name(hubert_name)
    hmodel = HubertModel(hcfg)
    t0 = time.perf_counter()
    hparams = jax.jit(hmodel.init)(
        jax.random.PRNGKey(1), jnp.zeros((1, 8000), jnp.float32)
    )
    hn = sum(x.size for x in jax.tree_util.tree_leaves(hparams))
    quant = KMeansQuantizer(
        rng.standard_normal((1000, hcfg.embed_dim)).astype(np.float32)
    )
    enc = SpeechEncoder(
        HubertFeatureReader(
            hmodel, hparams,
            layer=min(cfg.unit_extractor.hubert_layer, hcfg.num_layers),
        ),
        quant, deduplicate=True,
    )
    streams, unit_s = timed(lambda w: enc(w), wav16)
    report["unit_extractor"] = {
        "params_m": round(hn / 1e6, 1),
        "init_and_first_s": round(time.perf_counter() - t0, 1),
        "forward_s": round(unit_s, 4),
        "n_units": int(np.asarray(streams["units"]).size),
    }
    print(json.dumps(report["unit_extractor"]), flush=True)

    # --- 3) adapt-a-voice end to end ---
    t0 = time.perf_counter()
    mel = np.asarray(mel_spectrogram(
        wav22[None, :], n_fft=cfg.data.n_fft, num_mels=cfg.data.n_feats,
        sampling_rate=sr_mel, hop_size=cfg.data.hop_length,
        win_size=cfg.data.win_length, fmin=cfg.data.mel_fmin,
        fmax=cfg.data.mel_fmax,
    ))[0]
    mel = normalize_mel(mel, np.full(cfg.data.n_feats, -12.0),
                        np.full(cfg.data.n_feats, 3.0))
    units = np.asarray(streams["units"])
    durations = np.asarray(streams["durations"])
    units, durations = process_unit(
        units, durations, cfg.spk_embedder.sr, cfg.data.hop_length
    )
    uecfg = cfg.unit_encoder if not args.smoke else dc.replace(
        cfg.unit_encoder, n_channels=16, filter_channels=32, n_layers=1,
        n_feats=cfg.data.n_feats,
    )
    unit_encoder = Encoder.from_config(uecfg)
    # jit the inits: EAGER module construction pays thousands of ~25-35 ms
    # per-op tunnel dispatches (measured ~390-480 s of the cold session)
    ue_params = jax.jit(unit_encoder.init)(
        jax.random.PRNGKey(2),
        jnp.zeros((1, 8), jnp.int32), jnp.array([8]),
    )
    cond_x, y, y_lengths, attn = prepare_finetune_inputs(
        unit_encoder, ue_params, units, durations, mel,
        num_downsamplings=cfg.decoder.num_downsamplings,
    )
    dcfg = cfg.decoder if not args.smoke else dc.replace(
        cfg.decoder, dim=8, dim_mults=(1, 2), groups=4,
    )
    decoder = UnitSpeech.from_config(dcfg, dtype=dtype)
    dec_params = jax.jit(decoder.init)(
        jax.random.PRNGKey(3),
        jnp.zeros((1, 8, dcfg.n_feats)), jnp.ones((1, 8)),
        jnp.zeros((1, 8, dcfg.n_feats)), jnp.zeros((1,)),
        jnp.zeros((1, dcfg.spk_emb_dim)),
    )
    prep_s = time.perf_counter() - t0
    # the product path (cli.py main_finetune): finetune scan through the
    # AOT artifact cache — a warm session skips tracing+lowering entirely
    from unitspeech_tpu.utils import aot_cache

    seg = cfg.out_size if not args.smoke else 16

    def _ft(params, c, yy, yl, a, s, k):
        return finetune_decoder(
            decoder.apply, params, c, yy, yl, a, s, k,
            segment_size=seg, n_iters=n_iters,
            learning_rate=cfg.finetune.learning_rate,
            grad_clip=cfg.finetune.grad_clip,
        )

    t0 = time.perf_counter()
    ft_fn, aot_hit = aot_cache.cached_fn(
        f"bench_ssl_ft|{dcfg}|seg{seg}|it{n_iters}", _ft,
        dec_params, cond_x, y, y_lengths, attn,
        jnp.asarray(spk_emb, jnp.float32), jax.random.PRNGKey(4),
    )
    _params, losses = ft_fn(
        jax.tree_util.tree_map(jnp.copy, dec_params), cond_x, y, y_lengths,
        attn, jnp.asarray(spk_emb, jnp.float32), jax.random.PRNGKey(4),
    )
    np.asarray(losses)
    ft_first_s = time.perf_counter() - t0
    report["finetune_aot_hit"] = bool(aot_hit)
    # warm second run = the user-facing wall clock with caches hot
    t0 = time.perf_counter()
    _params, losses = ft_fn(
        jax.tree_util.tree_map(jnp.copy, dec_params), cond_x, y, y_lengths,
        attn, jnp.asarray(spk_emb, jnp.float32), jax.random.PRNGKey(5),
    )
    np.asarray(losses)
    ft_s = time.perf_counter() - t0
    report["adapt_voice"] = {
        "prep_s": round(prep_s, 2),
        "finetune_first_s": round(ft_first_s, 2),
        "finetune_s": round(ft_s, 2),
        # warm total: SSL forwards + conditioning prep + finetune scan
        "total_warm_s": round(spk_s + unit_s + prep_s + ft_s, 2),
        "total_session_s": round(time.perf_counter() - total_t0, 1),
    }
    print(json.dumps(report["adapt_voice"]), flush=True)

    # smoke runs are CI/dev validation only — never overwrite the chip
    # artifact with CPU numbers
    out = os.path.join(ROOT if not args.smoke else "/tmp", "SSL_BENCH.json")
    if args.label == "warm" and os.path.exists(out):
        with open(out) as f:
            merged = json.load(f)
        merged.setdefault("adapt_voice", {})["warm_session_s"] = (
            report["adapt_voice"]["total_session_s"]
        )
        merged["adapt_voice"]["warm_prep_s"] = report["adapt_voice"]["prep_s"]
        merged["adapt_voice"]["warm_finetune_first_s"] = (
            report["adapt_voice"]["finetune_first_s"]
        )
        report = merged
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in report.items()}))


if __name__ == "__main__":
    main()
