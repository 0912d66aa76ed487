#!/usr/bin/env python
"""Full-size reference-format checkpoint round trip (VERDICT r4 item 3).

Builds the REAL reference torch modules at the published configuration
(decoder dim=128 mults 1/2/4/8, 6-layer 192-ch text encoder, full 22 kHz
BigVGAN — /root/reference/conf/hydra_config.py:84-131), randomizes them,
`torch.save`s their state dicts in the reference's own checkpoint layout
(train_STEP1.py:290-304 text_encoder/duration_predictor bundles;
finetune.py:167-173 decoder bundle with spk_emb + mel stats), converts the
files with the production convert_cli, loads the converted orbax artifacts
through the CLI's own loader (_load_tts_models), and synthesizes with
injected noise identical to the torch pipeline's — asserting mel parity at
full size. A full-size-only converter bug (e.g. a shape-dependent
transpose) fails here even though every toy-size parity test passes.

Runs the JAX side on CPU by default (the converter-bug class is
platform-independent); --tpu runs it on the chip with f32 matmul precision
pinned. Writes CONVERT_ROUNDTRIP.json next to the repo root.

  python tools/convert_roundtrip.py [--steps 3] [--tpu]
"""

import argparse
import importlib.util
import json
import os
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def _load_ref():
    spec = importlib.util.spec_from_file_location(
        "_reference", os.path.join(ROOT, "tests", "_reference.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.load_reference()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--tpu", action="store_true",
                    help="run the JAX side on the TPU (default CPU)")
    ap.add_argument("--tokens", type=int, default=11)
    ap.add_argument("--rtol", type=float, default=2e-3)
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "float32")

    import numpy as np
    import torch

    REF = _load_ref()
    if REF is None:
        raise SystemExit("reference checkout not available")

    from unitspeech_tpu.config import MainConfig

    cfg = MainConfig()  # the published full-size configuration throughout

    def _randomize(module, seed):
        # fan-in-scaled randomization: the toy parity tests' flat *0.2
        # scale explodes at full size (each 9x128-fan-in conv then gains
        # ~6.8x; 38 blocks + 3 diffusion steps -> NaN on BOTH pipelines)
        g = torch.Generator().manual_seed(seed)
        with torch.no_grad():
            for p in module.parameters():
                fan_in = 1
                for d in p.shape[1:]:
                    fan_in *= int(d)
                scale = 0.5 / max(fan_in, 1) ** 0.5
                p.copy_(torch.randn(p.shape, generator=g) * scale)
        module.eval()
        return module

    tecfg, dpcfg, dcfg, vcfg = (cfg.text_encoder, cfg.duration_predictor,
                                cfg.decoder, cfg.vocoder)
    print("# building reference modules at the published config...",
          flush=True)
    enc_t = _randomize(REF.Encoder(
        n_vocab=tecfg.n_vocab, n_feats=cfg.data.n_feats,
        n_channels=tecfg.n_channels, filter_channels=tecfg.filter_channels,
        n_heads=tecfg.n_heads, n_layers=tecfg.n_layers,
        kernel_size=tecfg.kernel_size, p_dropout=tecfg.p_dropout,
        window_size=tecfg.window_size,
    ), 20)
    dp_t = _randomize(REF.DurationPredictor(
        in_channels=dpcfg.in_channels, filter_channels=dpcfg.filter_channels,
        kernel_size=dpcfg.kernel_size, p_dropout=dpcfg.p_dropout,
        spk_emb_dim=dpcfg.spk_emb_dim,
    ), 21)
    with torch.no_grad():  # a few frames per token -> a short utterance
        dp_t.proj.bias += 1.5
    dec_t = _randomize(REF.UnitSpeech(
        n_feats=dcfg.n_feats, dim=dcfg.dim, dim_mults=list(dcfg.dim_mults),
        beta_min=dcfg.beta_min, beta_max=dcfg.beta_max,
        pe_scale=dcfg.pe_scale, spk_emb_dim=dcfg.spk_emb_dim,
    ), 22)
    voc_t = _randomize(REF.BigVGAN(REF.AttrDict(
        num_mels=vcfg.num_mels, upsample_rates=list(vcfg.upsample_rates),
        upsample_kernel_sizes=list(vcfg.upsample_kernel_sizes),
        upsample_initial_channel=vcfg.upsample_initial_channel,
        resblock=vcfg.resblock,
        resblock_kernel_sizes=list(vcfg.resblock_kernel_sizes),
        resblock_dilation_sizes=[list(d) for d in vcfg.resblock_dilation_sizes],
        activation=vcfg.activation, snake_logscale=vcfg.snake_logscale,
    )), 23)

    rng = np.random.default_rng(24)
    tokens = rng.integers(1, tecfg.n_vocab - 1, size=args.tokens).tolist()
    spk = rng.normal(size=(1, dcfg.spk_emb_dim)).astype(np.float32)
    spk /= np.linalg.norm(spk)
    mel_min = rng.normal(size=cfg.data.n_feats).astype(np.float32) - 8.0
    mel_max = mel_min + 2.0 + rng.uniform(
        1.0, 3.0, cfg.data.n_feats).astype(np.float32)

    # ---- the reference's own on-disk checkpoint layout -------------------
    work = tempfile.mkdtemp(prefix="roundtrip_")
    torch.save({"model": enc_t.state_dict()},
               os.path.join(work, "text_encoder.pt"))
    torch.save({"model": dp_t.state_dict()},
               os.path.join(work, "duration_predictor.pt"))
    # the finetuned-decoder bundle (reference finetune.py:167-173) — what
    # inference.py serves from
    torch.save({
        "model": dec_t.state_dict(),
        "spk_emb": torch.as_tensor(spk)[:, None, :],      # (1, 1, S)
        "mel_min": torch.as_tensor(mel_min)[:, None],     # (80, 1)
        "mel_max": torch.as_tensor(mel_max)[:, None],
        "iteration": 500,
    }, os.path.join(work, "pretrained_decoder.pt"))
    torch.save({"generator": voc_t.state_dict()},
               os.path.join(work, "bigvgan.pt"))

    # ---- production conversion CLI ---------------------------------------
    from unitspeech_tpu.utils.convert_cli import main as convert_main

    t0 = time.time()
    for kind, src in (("decoder", "pretrained_decoder.pt"),
                      ("text-encoder", "text_encoder.pt"),
                      ("duration-predictor", "duration_predictor.pt"),
                      ("vocoder", "bigvgan.pt")):
        rc = convert_main([kind, os.path.join(work, src),
                           os.path.join(work, kind.replace("-", "_"))])
        assert rc == 0, kind
    print(f"# converted 4 checkpoints in {time.time()-t0:.1f}s", flush=True)

    # ---- load through the CLI's own loader --------------------------------
    from unitspeech_tpu.cli import _load_tts_models
    from unitspeech_tpu.utils.checkpoint import latest_checkpoint

    def _latest(name):
        path = latest_checkpoint(os.path.join(work, name))
        assert path, name
        return path

    ns = argparse.Namespace(
        decoder=_latest("decoder"),
        text_encoder=_latest("text_encoder"),
        duration_predictor=_latest("duration_predictor"),
        vocoder=_latest("vocoder"),
        spk_emb=None, bf16=False,  # f32 parity configuration
    )
    models = _load_tts_models(ns, cfg)

    # ---- duration probe (torch side) to pin the frame bucket --------------
    import jax.numpy as jnp

    from unitspeech_tpu.infer.tts import Synthesizer
    from unitspeech_tpu.ops.masking import fix_len_compatibility

    steps, tg, sg = args.steps, 1.0, 1.0
    phon_t = torch.as_tensor(np.asarray(tokens)[None, :], dtype=torch.long)
    len_t = torch.as_tensor([len(tokens)])
    spk_t = torch.as_tensor(spk)[:, None, :]
    with torch.no_grad():
        _, hid, mask = enc_t(phon_t, len_t)
        logw = dp_t(hid, mask, g=spk_t, reverse=True)
    w_ceil = torch.ceil(torch.exp(logw) * mask)
    y_len = max(int(w_ceil.sum()), 1)
    y_fix = fix_len_compatibility(y_len, dcfg.num_downsamplings)
    print(f"# utterance: {y_len} frames (padded {y_fix})", flush=True)

    synth = Synthesizer(models, frame_buckets=(y_fix, 4096))
    master = rng.normal(
        size=(steps + 1, 1, y_fix, cfg.data.n_feats)).astype(np.float32)

    # ---- torch pipeline with stubbed noise draws ---------------------------
    draw = [0]

    def _next_noise(t_frames):
        k = draw[0]
        draw[0] += 1
        return torch.as_tensor(master[k][:, :t_frames, :].transpose(0, 2, 1))

    orig_randn, orig_like = torch.randn, torch.randn_like
    torch.randn = lambda *a, **k: _next_noise(
        int((a[0] if len(a) == 1 else tuple(a))[-1]))
    torch.randn_like = lambda x, **k: _next_noise(int(x.shape[-1]))
    t0 = time.time()
    try:
        with torch.no_grad():
            _y_enc, y_dec, _attn = dec_t.execute_text_to_speech(
                phoneme=phon_t, phoneme_lengths=len_t, spk_emb=spk_t,
                text_encoder=enc_t, duration_predictor=dp_t,
                num_downsamplings_in_unet=dcfg.num_downsamplings,
                diffusion_steps=steps, length_scale=1.0,
                text_gradient_scale=tg, spk_gradient_scale=sg,
            )
            mm = torch.as_tensor(mel_max)[None, :, None]
            mn = torch.as_tensor(mel_min)[None, :, None]
            mel_ref = (y_dec + 1) / 2 * (mm - mn) + mn
            wav_ref = voc_t(mel_ref).clamp(-1, 1).squeeze().numpy()
    finally:
        torch.randn, torch.randn_like = orig_randn, orig_like
    assert draw[0] == steps + 1
    print(f"# torch pipeline: {time.time()-t0:.1f}s "
          f"mel_ref finite={bool(torch.isfinite(mel_ref).all())} "
          f"y_dec range=({float(y_dec.min()):.3f},{float(y_dec.max()):.3f}) "
          f"wav_ref finite={bool(np.isfinite(wav_ref).all())}", flush=True)

    # ---- our pipeline from the CONVERTED artifacts -------------------------
    t0 = time.time()
    mel_j, y_len_j, _attn_j = synth.synthesize_mel(
        tokens, jax.random.PRNGKey(0), diffusion_steps=steps,
        text_gradient_scale=tg, spk_gradient_scale=sg,
        noise_z=jnp.asarray(master[0]), noises=jnp.asarray(master[1:]),
    )
    mel_j = np.asarray(mel_j, np.float32)
    print(f"# mel_j finite={bool(np.isfinite(mel_j).all())} "
          f"range=({np.nanmin(mel_j):.3f},{np.nanmax(mel_j):.3f})", flush=True)
    wav_j = np.asarray(synth.vocode(mel_j[None] if mel_j.ndim == 2 else mel_j))
    print(f"# jax pipeline ({jax.devices()[0].platform}): "
          f"{time.time()-t0:.1f}s (incl. compile)", flush=True)

    assert int(y_len_j) == y_len, (y_len_j, y_len)
    ours = mel_j[0, :y_len].T if mel_j.ndim == 3 else mel_j[:y_len].T
    theirs = mel_ref.numpy()[0, :, :y_len]
    err = float(np.max(np.abs(ours - theirs)))
    scale = float(np.max(np.abs(theirs)))
    margin = 8 * cfg.data.hop_length
    wav_j1 = wav_j.reshape(-1)[: y_len * cfg.data.hop_length]
    nw = min(len(wav_j1), len(wav_ref)) - margin
    werr = float(np.max(np.abs(wav_j1[:nw] - wav_ref[:nw])))

    # relative criterion: random-weight diffusion output is unbounded (the
    # sampler's y_dec is not squashed), and 3 chaotic reverse steps amplify
    # f32 reassociation noise linearly with the value scale — a converter
    # bug (wrong transpose/permute) produces O(1) RELATIVE error, orders of
    # magnitude above this bound
    rel = err / max(scale, 1e-6)
    # per-platform tolerance: the CPU bound (2e-3 default) is the converter-
    # correctness gate — CPU f32 matmuls are exact-order f32 and measured
    # 4.5e-4 at full size. On TPU, "float32" matmul precision is emulated
    # with multi-pass bf16 and the on-chip kernel routes differ, so the same
    # program measures ~2.7e-3; a converter bug (wrong transpose/permute)
    # produces O(1) relative error — 1e-2 keeps >30x detection margin while
    # accepting documented TPU numerics. Wav bound scales the same way.
    on_tpu = jax.devices()[0].platform == "tpu"
    rtol = max(args.rtol, 1e-2) if on_tpu else args.rtol
    wtol = 2e-2 if on_tpu else 5e-3
    report = {
        "config": "published full size (dim=128, mults 1/2/4/8, enc 6L/192, "
                  "BigVGAN 22khz_80band)",
        "steps": steps, "tokens": args.tokens, "y_len": y_len,
        "platform": jax.devices()[0].platform,
        "mel_max_abs_err": err, "mel_scale": scale,
        "mel_max_rel_err": rel,
        "wav_max_abs_err": werr,
        "rtol": rtol,
        "pass": bool(rel <= rtol and werr <= wtol),
    }
    out = os.path.join(ROOT, "CONVERT_ROUNDTRIP.json")
    # keep per-platform history: append-style dict keyed by platform
    hist = {}
    if os.path.exists(out):
        with open(out) as f:
            hist = json.load(f)
    hist[report["platform"]] = report
    with open(out, "w") as f:
        json.dump(hist, f, indent=2)
    print(json.dumps(report))
    if not report["pass"]:
        raise SystemExit(
            f"mel parity FAILED: rel {rel} > {rtol} or wav {werr} > {wtol}")


if __name__ == "__main__":
    main()
