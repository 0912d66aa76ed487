"""TPU microbenchmark: fused Pallas stride-2 resample convs vs the XLA
Downsample/Upsample at the estimator stage shapes (dual-CFG batch 3).

A down+up PAIR is shape-preserving, so pairs chain inside one jit and the
per-pair time is the K-differenced delta (cancels the ~35 ms tunnel
dispatch; timing by materialization — axon block_until_ready returns early).

  python tools/bench_resample.py
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from unitspeech_tpu.utils import compile_cache

compile_cache.enable()

import jax.numpy as jnp
import numpy as np
from jax import lax


def _timed(fn, *args, reps=5):
    np.asarray(jax.device_get(fn(*args)))
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
    args = ap.parse_args()

    from unitspeech_tpu.models.unet import Downsample, Upsample
    from unitspeech_tpu.ops.pallas_resample import (
        fused_downsample_conv,
        fused_upsample_conv,
        supports_downsample,
        supports_upsample,
    )

    dtype = jnp.dtype(args.dtype)
    print(f"backend={jax.default_backend()} dtype={dtype.name}", flush=True)

    # (T, F, C) at the resample INPUT; the estimator's pairs are
    # d0/u0 at C=128 and d1/u1 at C=256 (d2/u2 shapes have no aligned tile)
    stages = [(344, 80, 128), (172, 40, 256), (86, 20, 512)]
    b = 3
    key = jax.random.PRNGKey(0)
    for t, f, c in stages:
        down = Downsample(c, dtype=dtype)
        up = Upsample(c, dtype=dtype)
        x = jax.random.normal(key, (b, t, f, c), dtype) * 0.3
        mask = jnp.ones((b, t, 1, 1), dtype)
        mask_half = jnp.ones((b, t // 2, 1, 1), dtype)
        dp = jax.tree.map(lambda a: a.astype(jnp.float32),
                          down.init(jax.random.PRNGKey(1), x))["params"]
        xp_small = jax.random.normal(key, (b, t // 2, f // 2, c), dtype)
        upar = jax.tree.map(lambda a: a.astype(jnp.float32),
                            up.init(jax.random.PRNGKey(2), xp_small))["params"]

        def xla_pair(k):
            @jax.jit
            def run(xx):
                def body(i, h):
                    y = down.apply({"params": dp}, h * mask)
                    return up.apply({"params": upar}, y * mask_half).astype(
                        h.dtype)
                out = lax.fori_loop(0, k, body, xx)
                return jnp.sum(out.astype(jnp.float32))
            return run

        def pallas_pair(k):
            @jax.jit
            def run(xx):
                def body(i, h):
                    y = fused_downsample_conv(
                        h, mask, dp["conv"]["kernel"], dp["conv"]["bias"])
                    return fused_upsample_conv(
                        y, mask_half, upar["conv"]["kernel"],
                        upar["conv"]["bias"]).astype(h.dtype)
                out = lax.fori_loop(0, k, body, xx)
                return jnp.sum(out.astype(jnp.float32))
            return run

        sup = (supports_downsample(t, f, c), supports_upsample(t // 2, f // 2, c))
        dt_x = (_timed(xla_pair(args.k2), x) - _timed(xla_pair(args.k1), x)) \
            / (args.k2 - args.k1)
        if not all(sup):
            print(f"T={t} F={f} C={c}: xla {dt_x*1e3:.3f} ms/pair  "
                  f"pallas SKIP supports={sup}", flush=True)
            continue
        try:
            dt_p = (_timed(pallas_pair(args.k2), x)
                    - _timed(pallas_pair(args.k1), x)) / (args.k2 - args.k1)
            # correctness on-chip
            @jax.jit
            def one(xx):
                y = fused_downsample_conv(
                    xx, mask, dp["conv"]["kernel"], dp["conv"]["bias"])
                return fused_upsample_conv(
                    y, mask_half, upar["conv"]["kernel"], upar["conv"]["bias"])

            @jax.jit
            def one_ref(xx):
                y = down.apply({"params": dp}, xx * mask)
                return up.apply({"params": upar}, y * mask_half)

            got = np.asarray(one(x), np.float32)
            ref = np.asarray(one_ref(x), np.float32)
            err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-6)
            note = f"relerr={err:.2e}"
        except Exception as e:  # noqa: BLE001
            dt_p, note = float("nan"), f"FAIL {type(e).__name__}: {e}"[:200]
        print(f"T={t} F={f} C={c}: xla {dt_x*1e3:.3f} ms/pair  "
              f"pallas {dt_p*1e3:.3f} ms/pair  ({dt_x/dt_p:.2f}x)  {note}",
              flush=True)


if __name__ == "__main__":
    main()
