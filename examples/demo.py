#!/usr/bin/env python
"""End-to-end API walkthrough (the reference's DEMO notebook equivalent).

Runs entirely on randomly-initialized weights at a small size, so it works on
any backend with no checkpoints:

  1. text -> phoneme IDs (pre-phonemized IPA; espeak optional)
  2. guided synthesis (50-step diffusion, dual CFG) -> wav
  3. batched synthesis
  4. speaker fine-tune on a "reference" utterance (jitted 500-iter loop,
     30 iters here)
  5. unit extraction (HuBERT + k-means) from the same utterance
  6. sv56 loudness normalization + wav writing

Run: python examples/demo.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# CPU unless the caller EXPLICITLY exported JAX_PLATFORMS=tpu: probing
# jax.default_backend() would initialize (and contend for) the single
# tunneled TPU chip, which another process may be benchmarking.
if os.environ.get("JAX_PLATFORMS", "").lower() != "tpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
    from unitspeech_tpu.config import (
        DataConfig, DecoderConfig, DurationPredictorConfig, EncoderConfig,
        MainConfig, VocoderConfig,
    )
    from unitspeech_tpu.data.dataset import write_wav
    from unitspeech_tpu.infer.tts import Synthesizer, TTSModels
    from unitspeech_tpu.ops import sv56
    from unitspeech_tpu.text import phonemes_to_sequence

    cfg = MainConfig(
        data=DataConfig(n_feats=16),
        text_encoder=EncoderConfig(n_vocab=180, n_feats=16, n_channels=16,
                                   filter_channels=32, n_layers=2, n_heads=2),
        duration_predictor=DurationPredictorConfig(in_channels=16,
                                                   filter_channels=16, spk_emb_dim=8),
        decoder=DecoderConfig(n_feats=16, dim=16, dim_mults=(1, 2), groups=4,
                              spk_emb_dim=8),
        vocoder=VocoderConfig(num_mels=16, upsample_rates=(8, 8, 2, 2),
                              upsample_kernel_sizes=(16, 16, 4, 4),
                              upsample_initial_channel=32,
                              resblock_kernel_sizes=(3,),
                              resblock_dilation_sizes=((1, 3),)),
    )
    print("1) building models (random weights, small config)...")
    synth = Synthesizer(TTSModels.random_init(cfg, jax.random.PRNGKey(0)))

    print("2) text -> IDs -> guided synthesis...")
    token_ids = phonemes_to_sequence("həloʊ wɜːld, ðɪs ɪz juːnɪtspiːtʃ ɒn tiːpiːjuː")
    wav, sr = synth(token_ids, jax.random.PRNGKey(1), diffusion_steps=8)
    print(f"   synthesized {len(wav) / sr:.2f}s @ {sr} Hz")

    print("3) batched synthesis (one fused device program)...")
    outs = synth.synthesize_batch(
        [token_ids, token_ids[: len(token_ids) // 2]],
        jax.random.PRNGKey(2), diffusion_steps=4,
    )
    print(f"   batch of {len(outs)}: {[round(len(w)/s, 2) for w, s in outs]}s")

    print("4) speaker fine-tune (jitted scan)...")
    from unitspeech_tpu.models.encoder import Encoder
    from unitspeech_tpu.train.finetune import finetune_decoder, prepare_finetune_inputs

    unit_encoder = Encoder.from_config(cfg.unit_encoder, n_vocab=50, n_feats=16,
                                       n_channels=16, filter_channels=32,
                                       n_layers=1, n_heads=2)
    ue_params = unit_encoder.init(
        jax.random.PRNGKey(3), jnp.zeros((1, 8), jnp.int32), jnp.array([8])
    )
    rng = np.random.default_rng(0)
    mel = rng.uniform(-1, 1, (80, 16)).astype(np.float32)
    units = rng.integers(0, 50, 20)
    durations = rng.integers(2, 6, 20)
    cond_x, y, y_lengths, attn = prepare_finetune_inputs(
        unit_encoder, ue_params, units, durations, mel,
        num_downsamplings=cfg.decoder.num_downsamplings,
    )
    new_params, losses = finetune_decoder(
        synth.models.decoder.apply, synth.models.decoder_params,
        cond_x, y, y_lengths, attn, synth.models.spk_emb,
        jax.random.PRNGKey(4), segment_size=32, n_iters=30, learning_rate=1e-4,
    )
    losses = np.asarray(losses)
    print(f"   30 iters: loss {losses[:5].mean():.4f} -> {losses[-5:].mean():.4f}")

    print("5) unit extraction (tiny HuBERT + k-means)...")
    from unitspeech_tpu.models.ssl.hubert import (
        HubertConfig, HubertFeatureReader, HubertModel,
    )
    from unitspeech_tpu.models.ssl.kmeans import KMeansQuantizer
    from unitspeech_tpu.models.ssl.speech_encoder import SpeechEncoder

    hcfg = HubertConfig(conv_layers=((8, 10, 5), (8, 3, 2), (8, 2, 2)),
                        embed_dim=16, num_layers=2, num_heads=2, ffn_dim=32,
                        conv_pos=8, conv_pos_groups=2)
    hmodel = HubertModel(hcfg)
    hparams = hmodel.init(jax.random.PRNGKey(5), jnp.zeros((1, 400)))
    enc = SpeechEncoder(
        HubertFeatureReader(hmodel, hparams, layer=2, max_chunk=32000, hop=20),
        KMeansQuantizer(rng.standard_normal((50, 16)).astype(np.float32)),
    )
    out = enc(wav[: min(len(wav), 16000)].astype(np.float32))
    print(f"   {len(out['units'])} units, durations sum {int(out['durations'].sum())}")

    print("6) sv56 normalize + write...")
    wav_n = sv56.normalize(wav, sr)
    write_wav("demo_output.wav", wav_n, sr)
    print("   wrote demo_output.wav")


if __name__ == "__main__":
    main()
