"""Probe: which estimator deep-stage (cin -> cout) ResnetBlock shapes does
the fused deep kernel compile on-chip, and how fast does each run?

The full-pipeline bench with --deep fell back to XLA (JaxRuntimeError during
compile) while the identity-residual microbench shapes compiled fine — so
some cin != cout combination still trips the remote TPU compiler. This
compiles each deep shape the estimator actually routes
(models/unet.py routing: choose_conv_impl != 'xla' and VMEM fit), one
pallas_call set at a time, printing compile wall time / failure per shape.

  python tools/probe_deep_shapes.py [--int8]
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

# (T, F, cin, cout) for every deep-routed block at the 344-frame bucket
SHAPES = [
    (86, 20, 256, 512),    # down_2_res1
    (86, 20, 512, 512),    # down_2_res2
    (43, 10, 512, 1024),   # down_3_res1
    (43, 10, 1024, 1024),  # down_3_res2 / mid_res1 / mid_res2
    (43, 10, 2048, 512),   # up_2_res1 (skip concat)
    (43, 10, 512, 512),    # up_2_res2
    (86, 20, 1024, 256),   # up_1_res1 (skip concat)
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    from unitspeech_tpu.models.unet import ResnetBlock, mish
    from unitspeech_tpu.ops.pallas_resnet import fused_resnet_block_deep

    dtype = jnp.dtype(args.dtype)
    b = 3
    key = jax.random.PRNGKey(0)
    print(f"backend={jax.default_backend()} int8={args.int8}", flush=True)
    for t, f, cin, cout in SHAPES:
        block = ResnetBlock(cout, 8, dtype=dtype)
        x = jax.random.normal(key, (b, t, f, cin), dtype) * 0.3
        t_emb = jax.random.normal(key, (b, 384), dtype)
        mask = jnp.ones((b, t, 1, 1), dtype)
        params = jax.tree.map(
            lambda a: a.astype(jnp.float32),
            block.init(jax.random.PRNGKey(1), x, mask, t_emb),
        )["params"]
        t_bias = (mish(t_emb.astype(jnp.float32)) @ params["mlp"]["kernel"]
                  + params["mlp"]["bias"])

        @jax.jit
        def run(xx):
            return fused_resnet_block_deep(
                xx, mask, t_bias,
                params["block1"]["conv"]["kernel"],
                params["block1"]["conv"]["bias"],
                params["block1"]["norm"]["scale"],
                params["block1"]["norm"]["bias"],
                params["block2"]["conv"]["kernel"],
                params["block2"]["conv"]["bias"],
                params["block2"]["norm"]["scale"],
                params["block2"]["norm"]["bias"],
                wres=(params["res_conv"]["kernel"] if cin != cout else None),
                bres=(params["res_conv"]["bias"] if cin != cout else None),
                groups=8, interpret=False, int8=args.int8,
            )

        t0 = time.perf_counter()
        try:
            out = np.asarray(run(x), np.float32)
            dt = time.perf_counter() - t0
            ref = np.asarray(
                block.apply({"params": params}, x, mask, t_emb), np.float32
            )
            err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-6)
            print(f"({t},{f}) {cin}->{cout}: compile+run {dt:7.2f}s  "
                  f"relerr={err:.2e}", flush=True)
        except Exception as e:  # noqa: BLE001
            dt = time.perf_counter() - t0
            msg = f"{type(e).__name__}: {e}"[:200].replace("\n", " ")
            print(f"({t},{f}) {cin}->{cout}: FAIL after {dt:6.1f}s  {msg}",
                  flush=True)


if __name__ == "__main__":
    main()
