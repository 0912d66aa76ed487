#!/usr/bin/env python
"""Microbench: flat deep-stage ResnetBlock vs glue-mish variant (VERDICT r4
item 1). The nine flat-block glue fusions (GroupNorm+mish+FiLM+mask+quantize)
are VPU-transcendental-bound at ~0.128 ms/step each (ROADMAP r3 ledger);
this times the WHOLE flat block per ops/cheap_mish.py variant at the real
stage shapes, serving config (int8 deep convs).

The block is scanned output->input (50 steps in ONE dispatch) so the ~35 ms
tunnel dispatch latency doesn't swamp the measurement; a tiny carried
perturbation defeats CSE for cin != cout shapes.

Run on the real TPU:  python tools/bench_glue.py [--impls exact,poly5,...]
Prints one JSON line per (shape, impl): ms per block application.
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

from unitspeech_tpu.models.unet import ResnetBlock
from unitspeech_tpu.ops.cheap_mish import GLUE_MISH_IMPLS

# (label, B, T, F, cin, cout) — stage shapes at 344 frames, 3x CFG batch
SHAPES = [
    ("stage2_512", 3, 86, 20, 512, 512),
    ("stage3_1024", 3, 43, 10, 1024, 1024),
    ("up2_2048to512", 3, 86, 20, 2048, 512),
]
SCAN_LEN = 50


def bench_block(label, b, t, f, cin, cout, impl, int8, repeats=5):
    block = ResnetBlock(cout, groups=8, dtype=jnp.bfloat16, use_int8=int8,
                        glue_mish=impl)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, t, f, cin), jnp.float32)
    mask = jnp.ones((b, t, 1, 1))
    t_emb = jax.random.normal(jax.random.PRNGKey(1), (b, 384), jnp.float32)
    params = block.init(jax.random.PRNGKey(2), x, mask, t_emb)

    identity = cin == cout

    @jax.jit
    def run(x0):
        def step(carry, _):
            h, acc = carry
            y = block.apply(params, h + (acc * 1e-20).astype(h.dtype), mask,
                            t_emb)
            acc = acc + jnp.mean(y).astype(jnp.float32) * 1e-20
            nxt = y if identity else h
            return (nxt, acc), None

        (hN, accN), _ = jax.lax.scan(
            step, (x0.astype(jnp.bfloat16), jnp.float32(0.0)), None,
            length=SCAN_LEN,
        )
        return jnp.mean(hN).astype(jnp.float32) + accN

    np.asarray(run(x))  # compile + warm
    np.asarray(run(x))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(run(x))
        times.append(time.perf_counter() - t0)
    ms = float(np.median(times)) / SCAN_LEN * 1e3
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impls", default=",".join(GLUE_MISH_IMPLS))
    ap.add_argument("--no-int8", dest="int8", action="store_false", default=True)
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()
    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
    shapes = SHAPES if not args.smoke else [("tiny", 1, 8, 8, 512, 512)]
    out = []
    for label, b, t, f, cin, cout in shapes:
        for impl in args.impls.split(","):
            ms = bench_block(label, b, t, f, cin, cout, impl, args.int8)
            row = {"shape": label, "impl": impl, "int8": args.int8,
                   "ms_per_block": round(ms, 4)}
            out.append(row)
            print(json.dumps(row), flush=True)
    base = {r["shape"]: r["ms_per_block"] for r in out if r["impl"] == "exact"}
    for r in out:
        if r["shape"] in base and base[r["shape"]] > 0:
            r["vs_exact"] = round(base[r["shape"]] / r["ms_per_block"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
