#!/usr/bin/env python
"""Isolated Mosaic transcendental cost: times a standalone Pallas kernel
that applies K rounds of an elementwise op to a VMEM-resident (rows, 128)
f32 block, for each variant INTERLEAVED in one process (the per-run chip
variance on this box is ~10-15%, larger than the effects under test).

  python tools/bench_transcendental.py [--rows 4096] [--k 64] [--reps 7]
"""
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
from functools import partial

from unitspeech_tpu.ops.fastmath import fast_exp, fast_sin


def make_fn(body, rows):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(x_ref, o_ref, *, k):
        x = x_ref[:]
        acc = x
        for _ in range(k):
            acc = body(acc) * jnp.float32(0.5) + x  # keep values bounded
        o_ref[:] = acc

    def run(x, k):
        return pl.pallas_call(
            partial(kern, k=k),
            out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    return run


BODIES = {
    "mul": lambda x: x * jnp.float32(1.1),
    "jnp_sin": jnp.sin,
    "fast_sin": fast_sin,
    "jnp_exp": lambda x: jnp.exp(jnp.minimum(x, 8.0)),
    "fast_exp": lambda x: fast_exp(jnp.minimum(x, 8.0)),
    "jnp_tanh": jnp.tanh,
    "div": lambda x: jnp.float32(1.3) / (jnp.abs(x) + jnp.float32(1.0)),
    "rsqrt": lambda x: jax.lax.rsqrt(jnp.abs(x) + jnp.float32(1.0)),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=4096)
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--k0", type=int, default=8)
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--variants", default=",".join(BODIES))
    args = ap.parse_args()

    print(f"backend={jax.default_backend()} rows={args.rows} "
          f"k={args.k0}->{args.k}", flush=True)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((args.rows, 128)), jnp.float32
    )
    names = [v for v in args.variants.split(",") if v]
    fns = {}
    for name in names:
        run = make_fn(BODIES[name], args.rows)
        f_lo = jax.jit(lambda x, r=run: r(x, args.k0))
        f_hi = jax.jit(lambda x, r=run: r(x, args.k))
        np.asarray(f_lo(x)); np.asarray(f_hi(x))  # compile
        fns[name] = (f_lo, f_hi)

    # interleave reps across variants so chip drift hits all equally
    times = {n: [] for n in names}
    for _ in range(args.reps):
        for name in names:
            f_lo, f_hi = fns[name]
            t0 = time.perf_counter(); np.asarray(f_lo(x))
            t1 = time.perf_counter(); np.asarray(f_hi(x))
            t2 = time.perf_counter()
            times[name].append((t2 - t1) - (t1 - t0))
    n_el = args.rows * 128 * (args.k - args.k0)
    for name in names:
        dt = float(np.median(times[name]))
        # ns per element per op-application
        print(f"{name:10s} {dt*1e3:8.3f} ms  "
              f"{dt/n_el*1e12:8.2f} ps/elem  "
              f"~{dt/n_el*0.94e9*1024:6.1f} lane-ops", flush=True)


if __name__ == "__main__":
    main()
