#!/usr/bin/env python
"""Standalone TPU microbenchmark: fused Pallas ResnetBlock vs the XLA path
at the real estimator stage shapes (dim=128, mults (1,2,4,8), T=344 bucket,
dual-CFG batch 3). Timing by materialization (axon block_until_ready returns
early; CLAUDE.md)."""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def _time(fn, *args, iters=20):
    np.asarray(jax.device_get(fn(*args)))  # compile + warm
    np.asarray(jax.device_get(fn(*args)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.device_get(out))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--stages", default="0,1,2,3")
    args = ap.parse_args()

    from unitspeech_tpu.models.unet import ResnetBlock, mish
    from unitspeech_tpu.ops.pallas_resnet import fused_resnet_block

    dtype = jnp.dtype(args.dtype)
    print(f"backend={jax.default_backend()} dtype={dtype.name}")

    # (T, F, Cin, Cout) per stage at the 344-frame bucket; res1 of each down
    # stage plus the first up stage's concat shape
    stages = [
        (344, 80, 128, 128),   # down_0 res2-like (identity)
        (172, 40, 256, 256),
        (86, 20, 512, 512),
        (43, 10, 1024, 1024),
        (344, 80, 2, 128),     # down_0 res1 (entry, res_conv)
        (86, 20, 1024, 512),   # up res1 (concat, res_conv)
    ]
    b = 3
    key = jax.random.PRNGKey(0)
    total_x, total_p = 0.0, 0.0
    for si in [int(s) for s in args.stages.split(",")] + [4, 5]:
        t, f, cin, cout = stages[si]
        block = ResnetBlock(cout, 8, dtype=dtype)
        x = jax.random.normal(jax.random.fold_in(key, si), (b, t, f, cin),
                              dtype) * 0.3
        t_emb = jax.random.normal(jax.random.fold_in(key, 100 + si), (b, 384),
                                  dtype)
        mask = jnp.ones((b, t, 1, 1), dtype)
        params = block.init(jax.random.PRNGKey(1), x, mask, t_emb)
        p = jax.tree.map(lambda a: a.astype(jnp.float32), params)["params"]

        xla_fn = jax.jit(lambda pp, xx, mm, tt: block.apply(
            {"params": pp}, xx, mm, tt))
        dt_x = _time(xla_fn, p, x, mask, t_emb, iters=args.iters)

        t_bias = mish(t_emb.astype(jnp.float32)) @ p["mlp"]["kernel"] + p["mlp"]["bias"]

        def pallas_fn(pp, xx, mm, tb):
            return fused_resnet_block(
                xx, mm, tb,
                pp["block1"]["conv"]["kernel"], pp["block1"]["conv"]["bias"],
                pp["block1"]["norm"]["scale"], pp["block1"]["norm"]["bias"],
                pp["block2"]["conv"]["kernel"], pp["block2"]["conv"]["bias"],
                pp["block2"]["norm"]["scale"], pp["block2"]["norm"]["bias"],
                wres=pp["res_conv"]["kernel"] if cin != cout else None,
                bres=pp["res_conv"]["bias"] if cin != cout else None,
                groups=8, interpret=False,
            )

        try:
            dt_p = _time(pallas_fn, p, x, mask, t_bias, iters=args.iters)
            # parity spot check
            ref = np.asarray(xla_fn(p, x, mask, t_emb), np.float32)
            got = np.asarray(pallas_fn(p, x, mask, t_bias), np.float32)
            err = np.abs(ref - got).max() / (np.abs(ref).max() + 1e-6)
            ok = f"relerr={err:.2e}"
        except Exception as e:  # noqa: BLE001
            dt_p, ok = float("nan"), f"FAIL {type(e).__name__}: {e}"[:200]
        print(f"stage{si} T={t} F={f} {cin}->{cout}: "
              f"xla {dt_x*1e3:.3f} ms  pallas {dt_p*1e3:.3f} ms  "
              f"({dt_x/dt_p:.2f}x)  {ok}", flush=True)
        total_x += dt_x
        total_p += dt_p
    print(f"TOTAL xla {total_x*1e3:.2f} ms  pallas {total_p*1e3:.2f} ms "
          f"({total_x/total_p:.2f}x)")


if __name__ == "__main__":
    main()
