#!/usr/bin/env python
"""Vocoder-only microbench (roofline r4: the vocoder measured 26.9 ms per
344-frame call vs a ~4 ms bytes-bound — 6.1x off; 16.7 ms in the fused
AA-snake-conv kernels and ~7.6 ms in the window pre-gather glue).

Times one full BigVGAN forward (random weights, bf16, Pallas path) at the
serving shape, for a sweep of kernel tile sizes, plus the XLA path for
reference. Run on the real TPU:

  python tools/bench_vocoder.py [--frames 344] [--tiles 256,512,1024]
"""
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import argparse
import json
import time

import numpy as np

import jax

from unitspeech_tpu.utils import compile_cache

compile_cache.enable()

import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=344)
    ap.add_argument("--tiles", default="256,512,1024")
    ap.add_argument("--xla", action="store_true", help="also bench the XLA path")
    ap.add_argument("--snake-mode", default="poly",
                    choices=["poly", "jnp", "probe_nosin"],
                    help="poly = range-reduced fast sin (default); jnp = "
                         "Mosaic builtin sin; probe_nosin = WRONG numerics, "
                         "times the kernel with sin replaced by a multiply")
    ap.add_argument("--aa-mode", default="full",
                    choices=["full", "probe_nofilter"],
                    help="probe_nofilter = WRONG numerics, times the kernel "
                         "with the up/down AA filters cut to one tap each "
                         "(bounds the filters' share of the kernel time)")
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()
    if args.smoke:
        jax.config.update("jax_platforms", "cpu")

    from unitspeech_tpu.config import MainConfig, VocoderConfig
    from unitspeech_tpu.models.vocoder import BigVGAN
    from unitspeech_tpu.ops import pallas_kernels as pk

    cfg = MainConfig().vocoder if not args.smoke else VocoderConfig(
        num_mels=16, upsample_rates=(8, 8, 2, 2),
        upsample_kernel_sizes=(16, 16, 4, 4), upsample_initial_channel=32,
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
    )
    frames = args.frames if not args.smoke else 48
    mel = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, frames, cfg.num_mels)) - 6.0,
        jnp.float32,
    )

    def bench(use_pallas, label):
        voc = BigVGAN.from_config(cfg, dtype=jnp.bfloat16, use_pallas=use_pallas)
        params = voc.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, cfg.num_mels)))
        fn = jax.jit(lambda m: voc.apply(params, m))
        np.asarray(fn(mel))
        np.asarray(fn(mel))
        ts = []
        for _ in range(7):
            t0 = time.perf_counter()
            np.asarray(fn(mel))
            ts.append(time.perf_counter() - t0)
        ms = float(np.median(ts)) * 1e3
        print(json.dumps({"variant": label, "ms": round(ms, 3)}), flush=True)
        return ms

    pk.SNAKE_MODE = args.snake_mode
    pk.AA_MODE = args.aa_mode
    suffix = "" if args.snake_mode == "poly" else f"_{args.snake_mode}"
    if args.aa_mode != "full":
        suffix += f"_{args.aa_mode}"
    for tile in [int(t) for t in args.tiles.split(",") if t]:
        pk.T_TILE_DEFAULT = tile
        jax.clear_caches()
        bench(True, f"pallas_t{tile}{suffix}")
    if args.xla:
        jax.clear_caches()
        bench(False, "xla")


if __name__ == "__main__":
    main()
