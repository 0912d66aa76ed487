#!/usr/bin/env python
"""Microbench: GroupNorm row-stats variants at the flat-path serving shapes.

The r4 roofline measured the flat deep blocks' GN stats (XLA variadic
convert+sum+sumsq reduce fusions) at ~10x their bytes bound — 20 fusions,
~1.13 ms/step of the serving sampler. ops/pallas_stats.py replaces them with
a one-pass Pallas kernel; this tool times both forms standalone (K-chained
applications, differenced) so the kernel's win is measurable outside the
pipeline's ~5% run-to-run variance.

Usage: python tools/bench_stats.py [--k 200] [--shapes stage2,stage3]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

SHAPES = {
    "stage2": (3, 1720, 512),
    "stage3": (3, 430, 1024),
    "up0": (3, 1720, 1024),
}


def time_fn(fn, x, k, label):
    import functools

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(x, k):
        acc = jnp.zeros((x.shape[0], 2, x.shape[2]), jnp.float32)
        y = x
        for i in range(k):
            st = fn(y)
            acc = acc + st
            # serial dependency so the chain cannot collapse
            y = y + st[:, :1, :1] * 1e-12
        return acc

    for kk in (1, k):
        t0 = time.time()
        np.asarray(chain(x, kk))
        t1 = time.time()
        if kk == 1:
            base = t1 - t0
    per = (t1 - t0 - base) / (k - 1) * 1e3
    print(f"  {label:24s} {per:8.4f} ms/call")
    return per


def xla_stats(x):
    s = jnp.sum(x, axis=1, dtype=jnp.float32)
    ss = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=1)
    return jnp.stack([s, ss], axis=1)


def xla_stats_split_groups(x, groups=8):
    """The pre-r4 form: reduce over a lane-splitting (B, n, G, C/G) view."""
    b, n, c = x.shape
    ag = x.reshape(b, n, groups, c // groups)
    mean = jnp.mean(ag, axis=(1, 3), dtype=jnp.float32)
    ex2 = jnp.mean(jnp.square(ag.astype(jnp.float32)), axis=(1, 3))
    return jnp.stack([mean, ex2], axis=1).repeat(c // groups, axis=-1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=200)
    ap.add_argument("--shapes", default="stage2,stage3,up0")
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    from unitspeech_tpu.ops.pallas_stats import _row_stats_pallas, supported

    dt = jnp.dtype(args.dtype)
    interp = jax.default_backend() != "tpu"
    for name in args.shapes.split(","):
        b, n, c = SHAPES[name]
        x = jax.random.normal(jax.random.PRNGKey(0), (b, n, c)).astype(dt)
        bound_us = b * n * c * dt.itemsize / 819e9 * 1e6
        print(f"{name}: ({b},{n},{c}) {args.dtype}  "
              f"bytes-bound {bound_us:.1f} us  "
              f"supported={supported(n, c, dt.itemsize)}")
        time_fn(xla_stats, x, args.k, "xla rows-reduce")
        time_fn(lambda y: xla_stats_split_groups(y), x, args.k,
                "xla lane-split (pre-r4)")
        time_fn(lambda y: _row_stats_pallas(y, interpret=interp), x,
                min(args.k, 50 if interp else args.k), "pallas row_stats")
    print("DONE")


if __name__ == "__main__":
    main()
