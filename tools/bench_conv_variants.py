#!/usr/bin/env python
"""TPU experiment: at the deep U-Net stages (F=20/10, C=512/1024) the
tensors are small (2.6-5.3 MB) but XLA's conv costs ~2-3.5x the MXU matmul
floor — is the conv LOWERING the problem? Compare three ResnetBlock
implementations per stage:

  a) nn.Conv-based (current XLA path, models/unet.py:ResnetBlock)
  b) conv3x3 as 9 shifted matmuls over the flattened (t*f, C) layout
  c) conv3x3 as im2col concat + ONE (N, 9C) x (9C, Cout) matmul

Also sweeps the fused Pallas kernel's frames_per_tile at the early stages.
Chains K blocks in one jit and differences (K2-K1) timings; returns scalars
(materializing outputs over the ~47 MB/s tunnel swamps the signal).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from unitspeech_tpu.utils import compile_cache

compile_cache.enable()  # persistent XLA cache (huge win: remote compiles)

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


def _chain_ms(make_step, x, k1, k2):
    def chain(k):
        @jax.jit
        def run(xx):
            out = lax.fori_loop(0, k, lambda i, h: make_step(h), xx)
            return jnp.sum(out.astype(jnp.float32))
        return run

    return (_timed(chain(k2), x) - _timed(chain(k1), x)) / (k2 - k1) * 1e3


from unitspeech_tpu.ops.conv_matmul import (  # noqa: E402
    conv3x3_im2col as conv3x3_im2col_xla,
    conv3x3_taps as conv3x3_taps_xla,
)


def _gn(h32, groups, scale, bias, n_valid):
    b, n, c = h32.shape
    hg = h32.reshape(b, n, groups, c // groups)
    mean = jnp.mean(hg, axis=(1, 3))
    var = jnp.mean(jnp.square(hg), axis=(1, 3)) - jnp.square(mean)
    inv = lax.rsqrt(var + 1e-5)
    hn = (hg - mean[:, None, :, None]) * inv[:, None, :, None]
    return hn.reshape(b, n, c) * scale + bias


def matmul_resnet(xf, mask_rows, t_bias, p, f, conv_fn, dtype):
    """Identity-residual ResnetBlock on the flat layout via conv_fn."""

    def blk(h, bp, film=None):
        c1 = conv_fn(h * mask_rows, bp["conv"]["kernel"].astype(dtype), f)
        c1 = c1 + bp["conv"]["bias"]
        g = _gn(c1, 8, bp["norm"]["scale"], bp["norm"]["bias"], None)
        g = g * jnp.tanh(jax.nn.softplus(g))
        if film is not None:
            g = g + film[:, None, :]
        return (g * mask_rows).astype(dtype)

    h = blk(xf, p["block1"])
    h = h + t_bias[:, None, :].astype(dtype)
    h = blk(h, p["block2"])
    return h + xf * mask_rows.astype(dtype)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--k1", type=int, default=5)
    ap.add_argument("--k2", type=int, default=45)
    ap.add_argument("--stages", default="2,3")
    ap.add_argument("--fpt-sweep", default="",
                    help="stage:fpt,fpt,... e.g. 0:8,16,43")
    ap.add_argument("--extras", action="store_true",
                    help="time attention and down/up resampling per stage")
    ap.add_argument("--reshape-cost", action="store_true", dest="reshape_cost",
                    help="probe the 4D<->flat relayout cost at F%%8!=0 stages")
    ap.add_argument("--int8", action="store_true",
                    help="also time an int8-quantized im2col conv (v5e has "
                         "2x int8 MXU throughput; timing ledger only)")
    args = ap.parse_args()

    from unitspeech_tpu.models.unet import ResnetBlock, mish

    dtype = jnp.dtype(args.dtype)
    print(f"backend={jax.default_backend()} dtype={dtype.name}", flush=True)
    stages = [(344, 80, 128), (172, 40, 256), (86, 20, 512), (43, 10, 1024)]
    b = 3
    key = jax.random.PRNGKey(0)

    for si in [] if (args.reshape_cost or args.extras) else [
            int(s) for s in args.stages.split(",") if s]:
        t, f, c = stages[si]
        n = t * f
        block = ResnetBlock(c, 8, dtype=dtype)
        x = jax.random.normal(jax.random.fold_in(key, si), (b, t, f, c), dtype) * 0.3
        t_emb = jax.random.normal(jax.random.fold_in(key, 99 + si), (b, 384), dtype)
        mask = jnp.ones((b, t, 1, 1), dtype)
        params = jax.tree.map(
            lambda a: a.astype(jnp.float32),
            block.init(jax.random.PRNGKey(1), x, mask, t_emb),
        )["params"]
        t_bias = (mish(t_emb.astype(jnp.float32)) @ params["mlp"]["kernel"]
                  + params["mlp"]["bias"])
        xf = x.reshape(b, n, c)
        mask_rows = jnp.ones((b, n, 1), dtype)

        dt_a = _chain_ms(
            lambda h: block.apply({"params": params}, h, mask, t_emb),
            x, args.k1, args.k2)
        dt_b = _chain_ms(
            lambda h: matmul_resnet(h, mask_rows, t_bias, params, f,
                                    conv3x3_taps_xla, dtype),
            xf, args.k1, args.k2)
        dt_c = _chain_ms(
            lambda h: matmul_resnet(h, mask_rows, t_bias, params, f,
                                    conv3x3_im2col_xla, dtype),
            xf, args.k1, args.k2)
        # parity of the matmul reformulation vs nn.Conv
        ref = np.asarray(block.apply({"params": params}, x, mask, t_emb),
                         np.float32).reshape(b, n, c)
        got = np.asarray(matmul_resnet(xf, mask_rows, t_bias, params, f,
                                       conv3x3_taps_xla, dtype), np.float32)
        err = np.abs(ref - got).max() / (np.abs(ref).max() + 1e-6)
        print(f"stage{si} T={t} F={f} C={c}: nn.Conv {dt_a:.3f}  "
              f"9-matmul {dt_b:.3f}  im2col {dt_c:.3f} ms/block  "
              f"relerr={err:.2e}", flush=True)

        if args.int8:
            # int8 x int8 -> int32 MXU matmuls with per-tensor scales.
            # Timing-only: quantization error is evaluated separately.
            from unitspeech_tpu.ops.conv_matmul import (
                _shifted, _time_shifts, _wrap_masks,
            )

            def conv_int8(xf8, w8, f, sx, sw):
                bq, nq, cinq = xf8.shape
                wrap_m, wrap_p = _wrap_masks(nq, f, jnp.int8)
                z1 = jnp.zeros((bq, 1, cinq), jnp.int8)
                x_dt = _time_shifts(xf8, f)
                cols = [
                    _shifted(x_dt[dt], df, wrap_m, wrap_p, z1)
                    for dt in (-1, 0, 1) for df in (-1, 0, 1)
                ]
                col = jnp.concatenate(cols, -1)
                y = jnp.einsum("bnk,kd->bnd", col, w8.reshape(9 * cinq, -1),
                               preferred_element_type=jnp.int32)
                return y.astype(jnp.float32) * (sx * sw)

            def int8_resnet(h):
                def q(a):
                    s = 127.0 / jnp.max(jnp.abs(a))
                    return jnp.clip(jnp.round(a * s), -127, 127).astype(jnp.int8), s

                def blk(hh, bp, film=None):
                    x8, sx = q(hh.astype(jnp.float32))
                    w8, sw = q(bp["conv"]["kernel"])
                    c1 = conv_int8(x8, w8, f, 1.0 / sx, 1.0 / sw)
                    c1 = c1 + bp["conv"]["bias"]
                    g = _gn(c1, 8, bp["norm"]["scale"], bp["norm"]["bias"], None)
                    g = g * jnp.tanh(jax.nn.softplus(g))
                    if film is not None:
                        g = g + film[:, None, :]
                    return g.astype(dtype)

                h1 = blk(h, params["block1"])
                h1 = h1 + t_bias[:, None, :].astype(dtype)
                h1 = blk(h1, params["block2"])
                return h1 + h

            dt_i8 = _chain_ms(int8_resnet, xf, args.k1, args.k2)
            print(f"stage{si} int8-im2col resnet: {dt_i8:.3f} ms/block",
                  flush=True)

    if args.reshape_cost:
        # hypothesis probe: at F%8!=0 stages the (B,T,F,C) layout pads the
        # sublane dim (10->16 at stage3) and every 4D<->flat reshape is a
        # physical relayout; chain the SAME flat resnet with and without a
        # per-iteration 4D round trip
        for si in [int(s) for s in args.stages.split(",") if s]:
            t, f, c = stages[si]
            n = t * f
            block = ResnetBlock(c, 8, dtype=dtype)
            x = jax.random.normal(jax.random.fold_in(key, si), (b, t, f, c),
                                  dtype) * 0.3
            t_emb = jax.random.normal(jax.random.fold_in(key, 99 + si),
                                      (b, 384), dtype)
            mask = jnp.ones((b, t, 1, 1), dtype)
            params = jax.tree.map(
                lambda a: a.astype(jnp.float32),
                block.init(jax.random.PRNGKey(1), x, mask, t_emb),
            )["params"]
            t_bias = (mish(t_emb.astype(jnp.float32))
                      @ params["mlp"]["kernel"] + params["mlp"]["bias"])
            xf = x.reshape(b, n, c)
            mask_rows = jnp.ones((b, n, 1), dtype)

            def flat_step(h):
                return matmul_resnet(h, mask_rows, t_bias, params, f,
                                     conv3x3_im2col_xla, dtype)

            def roundtrip_step(h):
                h4 = h.reshape(b, t, f, c)
                h4 = h4 * mask  # consume in 4-D so the reshape is material
                return matmul_resnet(h4.reshape(b, n, c), mask_rows, t_bias,
                                     params, f, conv3x3_im2col_xla, dtype)

            ms_flat = _chain_ms(flat_step, xf, args.k1, args.k2)
            ms_rt = _chain_ms(roundtrip_step, xf, args.k1, args.k2)
            print(f"stage{si} flat {ms_flat:.3f} ms/block  "
                  f"with-4D-roundtrip {ms_rt:.3f} ms/block  "
                  f"(relayout cost {ms_rt - ms_flat:.3f})", flush=True)
        return

    if args.extras:
        # the non-resblock estimator ops: attention (XLA vs fused Pallas) and
        # the stride-2 down / transposed up resampling convs, per stage
        from unitspeech_tpu.models.unet import Downsample, RezeroAttention, Upsample

        for si in [int(s) for s in args.stages.split(",") if s]:
            t, f, c = stages[si]
            x = jax.random.normal(jax.random.fold_in(key, si), (b, t, f, c),
                                  dtype) * 0.3
            attn = RezeroAttention(dtype=dtype)
            pa = jax.tree.map(
                lambda a: a.astype(jnp.float32),
                attn.init(jax.random.PRNGKey(1), x),
            )
            ms_attn = _chain_ms(lambda h: attn.apply(pa, h), x, args.k1, args.k2)
            try:
                attn_p = RezeroAttention(dtype=dtype, use_pallas=True)
                ms_attn_p = _chain_ms(lambda h: attn_p.apply(pa, h), x,
                                      args.k1, args.k2)
            except Exception as e:  # noqa: BLE001
                ms_attn_p = float("nan")
                print(f"  pallas attn FAIL: {e}"[:160], flush=True)
            down = Downsample(c, dtype=dtype)
            pd = jax.tree.map(lambda a: a.astype(jnp.float32),
                              down.init(jax.random.PRNGKey(2), x))
            # down halves (t, f); chain via down->up pairs won't typecheck, so
            # time one-shot pairs: k chained (down then upsample back)
            up = Upsample(c, dtype=dtype)
            xs = down.apply(pd, x)
            pu = jax.tree.map(lambda a: a.astype(jnp.float32),
                              up.init(jax.random.PRNGKey(3), xs))

            def downup(h):
                # odd T (stage3: 43) rounds up through down->up; crop back
                return up.apply(pu, down.apply(pd, h))[:, :t, :f]

            ms_downup = _chain_ms(downup, x, args.k1, args.k2)
            print(f"stage{si} T={t} F={f} C={c}: attn {ms_attn:.3f} "
                  f"(pallas {ms_attn_p:.3f})  down+up {ms_downup:.3f} ms",
                  flush=True)
        return

    if args.fpt_sweep:
        from unitspeech_tpu.ops.pallas_resnet import fused_resnet_block

        sspec, fpts = args.fpt_sweep.split(":")
        si = int(sspec)
        t, f, c = stages[si]
        block = ResnetBlock(c, 8, dtype=dtype)
        x = jax.random.normal(jax.random.fold_in(key, si), (b, t, f, c), dtype) * 0.3
        t_emb = jax.random.normal(jax.random.fold_in(key, 99 + si), (b, 384), dtype)
        mask = jnp.ones((b, t, 1, 1), dtype)
        params = jax.tree.map(
            lambda a: a.astype(jnp.float32),
            block.init(jax.random.PRNGKey(1), x, mask, t_emb),
        )["params"]
        t_bias = (mish(t_emb.astype(jnp.float32)) @ params["mlp"]["kernel"]
                  + params["mlp"]["bias"])
        for fpt in [int(v) for v in fpts.split(",")]:
            for i2c in (False, True):
                def step(h, fpt=fpt, i2c=i2c):
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
                        groups=8, interpret=False, frames_per_tile=fpt,
                        im2col=i2c,
                    ).astype(h.dtype)
                try:
                    ms = _chain_ms(step, x, args.k1, args.k2)
                    print(f"stage{si} pallas fpt={fpt} im2col={int(i2c)}: "
                          f"{ms:.3f} ms/block", flush=True)
                except Exception as e:  # noqa: BLE001
                    print(f"stage{si} pallas fpt={fpt} im2col={int(i2c)}: "
                          f"FAIL {e}"[:200], flush=True)


if __name__ == "__main__":
    main()
