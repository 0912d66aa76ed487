#!/usr/bin/env python
"""Standalone TPU microbenchmark: fused Pallas ResnetBlock vs the XLA path
at the real estimator stage shapes (dim=128, mults (1,2,4,8), T=344 bucket,
dual-CFG batch 3).

Per-dispatch latency on the tunneled TPU is ~35 ms, so a block is timed as
K chained applications inside ONE jit (identity-residual shapes chain
output->input, like the blocks run inside the sampler scan); reported time is
(t_K2 - t_K1) / (K2 - K1), which cancels the dispatch overhead. Timing by
materialization (axon block_until_ready returns early; CLAUDE.md)."""

import argparse
import os
import sys
import time
from functools import partial

# NEVER set PYTHONPATH for TPU jobs: the axon plugin's device discovery
# fails ("No jellyfish device found") whenever the PYTHONPATH env var is set,
# even to an empty directory. Put the repo on sys.path here instead.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from unitspeech_tpu.utils import compile_cache

compile_cache.enable()  # persistent XLA cache (huge win: remote compiles)

import jax.numpy as jnp
import numpy as np
from jax import lax


def _timed(fn, *args, reps=5):
    np.asarray(jax.device_get(fn(*args)))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(jax.device_get(fn(*args)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--k1", type=int, default=4)
    ap.add_argument("--k2", type=int, default=20)
    ap.add_argument("--stages", default="0,1,2,3")
    ap.add_argument("--deep", action="store_true",
                    help="bench fused_resnet_block_deep at the F%%8!=0 stages "
                         "instead of skipping them (stage3 only fits VMEM)")
    ap.add_argument("--tap-mode", default=None,
                    choices=["taps", "taps3", "im2col"],
                    help="conv structure inside the fused early-stage "
                         "kernels (ops/pallas_resnet._conv3x3_taps)")
    ap.add_argument("--mish-mode", default="exp",
                    choices=["exp", "fast", "probe_noexp", "probe_nodiv",
                             "probe_identity"],
                    help="exp = Mosaic builtin (default); fast = exp2-poly "
                         "(measured negative, ~85 vs ~20 lane-ops); "
                         "probe_* = WRONG numerics timing diagnostics "
                         "(exp->mul, div->mul, whole mish -> identity)")
    ap.add_argument("--int8", action="store_true",
                    help="int8 convs on BOTH sides: the XLA baseline becomes "
                         "the flat conv3x3_int8 path (the serving default at "
                         "the deep stages) and the deep fused kernel "
                         "quantizes in kernel")
    ap.add_argument("--i8pre", action="store_true",
                    help="with --deep: bench fused_resnet_block_deep_i8 "
                         "(whole-layer int8 kernels on PRE-quantized "
                         "activations) against the flat int8 baseline")
    args = ap.parse_args()

    from unitspeech_tpu.models.unet import ResnetBlock, mish
    from unitspeech_tpu.ops import pallas_resnet
    from unitspeech_tpu.ops.pallas_resnet import (
        fused_resnet_block, fused_resnet_block_deep,
        fused_resnet_block_deep_i8, supports_shape,
    )

    pallas_resnet.MISH_MODE = args.mish_mode

    dtype = jnp.dtype(args.dtype)
    print(f"backend={jax.default_backend()} dtype={dtype.name}", flush=True)

    # identity-residual (chainable) shapes per stage at the 344-frame bucket
    stages = [
        (344, 80, 128),
        (172, 40, 256),
        (86, 20, 512),
        (43, 10, 1024),
    ]
    b = 3
    key = jax.random.PRNGKey(0)
    total_x = total_p = 0.0
    # per-stage block counts in the full estimator (res2 of down/up + mid)
    weights = {0: 3, 1: 5, 2: 5, 3: 6}
    for si in [int(s) for s in args.stages.split(",")]:
        t, f, c = stages[si]
        block = ResnetBlock(c, 8, dtype=dtype, use_int8=args.int8)
        x = (jax.random.normal(jax.random.fold_in(key, si), (b, t, f, c),
                               dtype) * 0.3)
        t_emb = jax.random.normal(jax.random.fold_in(key, 100 + si), (b, 384),
                                  dtype)
        mask = jnp.ones((b, t, 1, 1), dtype)
        params = jax.tree.map(
            lambda a: a.astype(jnp.float32),
            block.init(jax.random.PRNGKey(1), x, mask, t_emb),
        )["params"]

        # chains return an f32 SCALAR: materializing the (3,T,F,C) output
        # costs ~450 ms over the ~47 MB/s tunnel and its jitter swamps the
        # differenced block time (observed: negative ms/block)
        def xla_chain(k, reduce=True):
            @jax.jit
            def run(xx):
                def body(i, h):
                    return block.apply({"params": params}, h, mask, t_emb)
                out = lax.fori_loop(0, k, body, xx)
                return jnp.sum(out.astype(jnp.float32)) if reduce else out
            return run

        t_bias = (mish(t_emb.astype(jnp.float32)) @ params["mlp"]["kernel"]
                  + params["mlp"]["bias"])

        def pallas_chain(k, reduce=True):
            @jax.jit
            def run(xx):
                def body(i, h):
                    return fused_resnet_block(
                        h, mask, t_bias,
                        params["block1"]["conv"]["kernel"],
                        params["block1"]["conv"]["bias"],
                        params["block1"]["norm"]["scale"],
                        params["block1"]["norm"]["bias"],
                        params["block2"]["conv"]["kernel"],
                        params["block2"]["conv"]["bias"],
                        params["block2"]["norm"]["scale"],
                        params["block2"]["norm"]["bias"],
                        groups=8, interpret=False, tap_mode=args.tap_mode,
                    ).astype(h.dtype)
                out = lax.fori_loop(0, k, body, xx)
                return jnp.sum(out.astype(jnp.float32)) if reduce else out
            return run

        def deep_chain(k, reduce=True):
            deep_fn = (fused_resnet_block_deep_i8 if args.i8pre
                       else partial(fused_resnet_block_deep, int8=args.int8))

            @jax.jit
            def run(xx):
                def body(i, h):
                    return deep_fn(
                        h, mask, t_bias,
                        params["block1"]["conv"]["kernel"],
                        params["block1"]["conv"]["bias"],
                        params["block1"]["norm"]["scale"],
                        params["block1"]["norm"]["bias"],
                        params["block2"]["conv"]["kernel"],
                        params["block2"]["conv"]["bias"],
                        params["block2"]["norm"]["scale"],
                        params["block2"]["norm"]["bias"],
                        groups=8, interpret=False,
                    ).astype(h.dtype)
                out = lax.fori_loop(0, k, body, xx)
                return jnp.sum(out.astype(jnp.float32)) if reduce else out
            return run

        dt_x = (_timed(xla_chain(args.k2), x) - _timed(xla_chain(args.k1), x)) \
            / (args.k2 - args.k1)
        if not supports_shape(t, f):
            if args.deep:
                try:
                    dt_p = (_timed(deep_chain(args.k2), x)
                            - _timed(deep_chain(args.k1), x)) / (args.k2 - args.k1)
                    ref = np.asarray(xla_chain(1, reduce=False)(x), np.float32)
                    got = np.asarray(deep_chain(1, reduce=False)(x), np.float32)
                    err = np.abs(ref - got).max() / (np.abs(ref).max() + 1e-6)
                    note = f"relerr={err:.2e}"
                except Exception as e:  # noqa: BLE001
                    dt_p, note = float("nan"), f"FAIL {type(e).__name__}: {e}"[:300]
                print(f"stage{si} T={t} F={f} C={c}: flat {dt_x*1e3:.3f} "
                      f"ms/block  deep-fused {dt_p*1e3:.3f} ms/block  "
                      f"({dt_x/dt_p:.2f}x)  {note}", flush=True)
                w = weights.get(si, 1)
                total_x += w * dt_x
                total_p += w * (dt_p if np.isfinite(dt_p) else dt_x)
                continue
            print(f"stage{si} T={t} F={f} C={c}: xla {dt_x*1e3:.3f} ms/block  "
                  f"pallas SKIP (F%8!=0 -> XLA fallback in the estimator)",
                  flush=True)
            w = weights.get(si, 1)
            total_x += w * dt_x
            total_p += w * dt_x
            continue
        try:
            dt_p = (_timed(pallas_chain(args.k2), x)
                    - _timed(pallas_chain(args.k1), x)) / (args.k2 - args.k1)
            ref = np.asarray(xla_chain(1, reduce=False)(x), np.float32)
            got = np.asarray(pallas_chain(1, reduce=False)(x), np.float32)
            err = np.abs(ref - got).max() / (np.abs(ref).max() + 1e-6)
            note = f"relerr={err:.2e}"
        except Exception as e:  # noqa: BLE001
            dt_p, note = float("nan"), f"FAIL {type(e).__name__}: {e}"[:300]
        print(f"stage{si} T={t} F={f} C={c}: xla {dt_x*1e3:.3f} ms/block  "
              f"pallas {dt_p*1e3:.3f} ms/block  ({dt_x/dt_p:.2f}x)  {note}",
              flush=True)
        w = weights.get(si, 1)
        total_x += w * dt_x
        total_p += w * dt_p
    print(f"WEIGHTED estimator-resblocks: xla {total_x*1e3:.2f} ms/step  "
          f"pallas {total_p*1e3:.2f} ms/step  ({total_x/total_p:.2f}x)")


if __name__ == "__main__":
    main()
