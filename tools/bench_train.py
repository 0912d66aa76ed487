#!/usr/bin/env python
"""STEP1 training throughput at the reference configuration on one chip.

The reference trains single-GPU at batch 32 (hydra_config.py:135-150) with
no published steps/sec; this records ours for the ledger: full-size models
(text encoder 192ch/6L, decoder dim 128 mults 1/2/4/8), batch 32, the
reference's 2-second segment crop (out_size 172 frames), MAS on device,
per-module clipping, 25% CFG speaker dropout — the exact
train/steps.py:make_step1_train_step program the train-step1 CLI runs.

K-differenced timing inside one jit (dispatch ~35 ms on the tunnel; the
donated-state step chains naturally). Prints one JSON line.

  python tools/bench_train.py [--batch 32] [--t-x 72] [--t-y 688]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from unitspeech_tpu.utils import compile_cache

compile_cache.enable()

import jax.numpy as jnp
import numpy as np
import optax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--t-x", type=int, default=72,
                    help="token bucket (~13-word sentence interleaved)")
    ap.add_argument("--t-y", type=int, default=688,
                    help="mel frame bucket (~8 s utterances)")
    ap.add_argument("--k1", type=int, default=2)
    ap.add_argument("--k2", type=int, default=6)
    ap.add_argument("--step2", action="store_true",
                    help="bench the STEP2 unit-encoder step (frozen decoder) "
                         "instead of STEP1")
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()
    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
    print(json.dumps(run_bench(args)))


def run_bench(args):
    """Measure one train step; returns the result dict (bench.py embeds
    this in the round's complete record — VERDICT r3 weak #2)."""
    from unitspeech_tpu.config import MainConfig
    from unitspeech_tpu.models.diffusion import UnitSpeech
    from unitspeech_tpu.models.duration import DurationPredictor
    from unitspeech_tpu.models.encoder import Encoder
    from unitspeech_tpu.ops.masking import fix_len_compatibility
    from unitspeech_tpu.train.steps import TrainState, make_step1_train_step

    cfg = MainConfig()
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    if args.smoke:
        args.batch, args.t_x, args.t_y = 2, 8, 64

    te = Encoder.from_config(cfg.text_encoder)
    dp = DurationPredictor(
        in_channels=cfg.duration_predictor.in_channels,
        filter_channels=cfg.duration_predictor.filter_channels,
        kernel_size=cfg.duration_predictor.kernel_size,
        p_dropout=cfg.duration_predictor.p_dropout,
        spk_emb_dim=cfg.duration_predictor.spk_emb_dim,
    )
    dec = UnitSpeech.from_config(cfg.decoder, dtype=dtype)

    key = jax.random.PRNGKey(0)
    b, t_x, t_y = args.batch, args.t_x, fix_len_compatibility(
        args.t_y, cfg.decoder.num_downsamplings
    )
    spk_dim = cfg.decoder.spk_emb_dim
    rng = np.random.default_rng(0)
    batch = {
        "tokens": jnp.asarray(
            rng.integers(1, cfg.text_encoder.n_vocab - 1, (b, t_x)), jnp.int32
        ),
        "token_lengths": jnp.asarray(rng.integers(t_x - 8, t_x + 1, (b,))),
        "mel": jnp.asarray(rng.uniform(-1, 1, (b, t_y, cfg.data.n_feats)),
                           jnp.float32),
        "mel_lengths": jnp.asarray(rng.integers(t_y - 60, t_y + 1, (b,))),
        "spk_emb": jnp.asarray(rng.standard_normal((b, spk_dim)), jnp.float32),
    }

    # whole variable dicts, like the train CLIs (steps.py applies them)
    params = {
        "text_encoder": te.init(
            jax.random.fold_in(key, 1), batch["tokens"], batch["token_lengths"]
        ),
        "duration_predictor": dp.init(
            jax.random.fold_in(key, 2),
            jnp.zeros((1, t_x, cfg.text_encoder.n_channels)),
            jnp.ones((1, t_x, 1)),
            g=jnp.zeros((1, spk_dim)), reverse=True,
        ),
        "decoder": dec.init(
            jax.random.fold_in(key, 3),
            jnp.zeros((1, 16, cfg.decoder.n_feats)), jnp.ones((1, 16)),
            jnp.zeros((1, 16, cfg.decoder.n_feats)), jnp.zeros((1,)),
            jnp.zeros((1, spk_dim)),
        ),
    }

    out_size = fix_len_compatibility(
        int(cfg.train.out_size_second * cfg.data.sampling_rate
            / cfg.data.hop_length),
        cfg.decoder.num_downsamplings,
    )
    opt = optax.adam(cfg.train.learning_rate)
    if args.step2:
        from unitspeech_tpu.train.steps import make_step2_train_step

        ue = Encoder.from_config(cfg.unit_encoder)
        units = jnp.asarray(
            rng.integers(0, cfg.unit_encoder.n_vocab - 1, (b, t_x)), jnp.int32
        )
        # uniform durations summing to ~the mel length
        durs = jnp.full((b, t_x), t_y // t_x, jnp.float32)
        batch = {
            "units": units,
            "unit_lengths": batch["token_lengths"],
            "durations": durs,
            "mel": batch["mel"],
            "mel_lengths": batch["mel_lengths"],
            "spk_emb": batch["spk_emb"],
        }
        ue_params = ue.init(jax.random.fold_in(key, 4), units,
                            batch["unit_lengths"])
        dec_params = params["decoder"]
        step2 = make_step2_train_step(ue, dec, opt, out_size=out_size)
        state = TrainState(ue_params, opt.init(ue_params), jnp.array(0))

        def run_k(k, state):
            for i in range(k):
                state, metrics = step2(
                    state, dec_params, batch, jax.random.fold_in(key, 100 + i)
                )
            np.asarray(metrics["total_loss"])
            return state
    else:
        step = make_step1_train_step(
            te, dp, dec, opt, out_size=out_size,
            spk_uncond=jnp.zeros((spk_dim,)), spk_dropout=0.25,
        )
        state = TrainState(params, opt.init(params), jnp.array(0))

        def run_k(k, state):
            for i in range(k):
                state, metrics = step(state, batch, jax.random.fold_in(key, 100 + i))
            # materialize ONE scalar (axon block_until_ready returns early)
            np.asarray(metrics["total_loss"])
            return state

    t0 = time.perf_counter()
    state = run_k(args.k1, state)  # compile + k1 steps
    compile_and_k1 = time.perf_counter() - t0

    t0 = time.perf_counter()
    state = run_k(args.k1, state)
    t_k1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    state = run_k(args.k2, state)
    t_k2 = time.perf_counter() - t0
    per_step = (t_k2 - t_k1) / (args.k2 - args.k1)

    return {
        "metric": ("step2" if args.step2 else "step1") + "_train_step_seconds",
        "value": round(per_step, 4),
        "unit": "s/step",
        "batch": b, "t_x": t_x, "t_y": int(t_y), "out_size": int(out_size),
        "steps_per_sec": round(1.0 / per_step, 3),
        "utterances_per_sec": round(b / per_step, 1),
        "compile_s": round(compile_and_k1, 1),
        "device": jax.devices()[0].platform,
    }


if __name__ == "__main__":
    main()
