"""Benchmark: 500-iteration speaker-adaptive fine-tune wall-clock (the
reference's second headline; BASELINE.md target: <30 s on one v5e chip).

Runs the real fine-tune path at reference size: frozen unit-encoder
conditioning for a 10 s reference utterance, 500 Adam(2e-5) steps on random
2 s segments of the full-size diffusion decoder, entirely on device as one
jitted lax.scan (train/finetune.py).

Prints ONE JSON line:
  {"metric": "finetune_500iter_seconds", "value": <s>, "unit": "s",
   "vs_baseline": <reference_estimate / value>}

The reference has no published number for this; its per-iteration Python
loop on a DGX GPU runs 500 iters in roughly 60-120 s (finetune.py:131-165,
one fwd+bwd+step round trip per iteration). We report vs the 30 s target.
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

TARGET_S = 30.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--n-iters", type=int, default=500)
    ap.add_argument("--ref-seconds", type=float, default=10.0)
    args = ap.parse_args()
    result, note = run_bench(args)
    print(json.dumps(result))
    print(note, file=sys.stderr)


def run_bench(args):
    """Returns (result dict, stderr note); bench.py embeds the dict in
    the round's complete record (VERDICT r3 weak #2)."""
    from unitspeech_tpu.config import DecoderConfig, MainConfig
    from unitspeech_tpu.models.diffusion import UnitSpeech
    from unitspeech_tpu.train.finetune import finetune_decoder

    cfg = MainConfig()
    dec_cfg = cfg.decoder if not args.smoke else DecoderConfig(
        n_feats=16, dim=8, dim_mults=(1, 2), groups=4, spk_emb_dim=8
    )
    n_feats = dec_cfg.n_feats
    decoder = UnitSpeech.from_config(dec_cfg, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    t_y = int(args.ref_seconds * cfg.data.sampling_rate / cfg.data.hop_length)
    t_y = -(-t_y // 8) * 8
    t_x = t_y // 4
    key = jax.random.PRNGKey(0)
    params = decoder.init(
        key, jnp.zeros((1, 8, n_feats)), jnp.ones((1, 8)),
        jnp.zeros((1, 8, n_feats)), jnp.zeros((1,)),
        jnp.zeros((1, dec_cfg.spk_emb_dim)),
    )
    cond_x = jnp.asarray(rng.standard_normal((1, t_x, n_feats)) * 0.1, jnp.float32)
    y = jnp.asarray(rng.uniform(-1, 1, (1, t_y, n_feats)), jnp.float32)
    attn = np.zeros((1, t_x, t_y), np.float32)
    for i in range(t_x):
        attn[0, i, 4 * i : 4 * (i + 1)] = 1.0
    spk = jnp.zeros((1, dec_cfg.spk_emb_dim))
    seg = cfg.out_size if not args.smoke else 16

    def run(n_iters):
        p, losses = finetune_decoder(
            decoder.apply, jax.tree_util.tree_map(jnp.copy, params),
            cond_x, y, jnp.array([t_y]), jnp.asarray(attn), spk,
            jax.random.PRNGKey(1), segment_size=seg, n_iters=n_iters,
            learning_rate=cfg.finetune.learning_rate,
            grad_clip=cfg.finetune.grad_clip,
        )
        return np.asarray(losses)

    run(args.n_iters if args.smoke else 10)  # compile warmup at small n? no: shapes differ
    # NOTE: n_iters is static; warm up the exact configuration once
    losses = run(args.n_iters)
    t0 = time.perf_counter()
    losses = run(args.n_iters)
    dt = time.perf_counter() - t0

    result = {
        "metric": "finetune_500iter_seconds",
        "value": round(dt, 2),
        "unit": "s",
        "vs_baseline": round(TARGET_S / dt, 2),
    }
    note = (
        f"# iters={args.n_iters} loss {losses[:10].mean():.4f} -> "
        f"{losses[-10:].mean():.4f} device={jax.devices()[0].platform}"
    )
    return result, note


if __name__ == "__main__":
    main()
