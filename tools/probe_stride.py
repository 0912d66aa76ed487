"""Probe: which in-kernel row-subsample forms does Mosaic lower (fast+correct)?

The up/down-sample convs are the last XLA-lowered convs in the sampler
(~0.6 ms/step, ~3x off the MXU floor — ROADMAP profile). A Pallas stride-2
conv must select every other row (and every other F-row frame block) of the
flattened (rows, C) activation; Mosaic famously rejects strided gathers, so
this probes the candidate forms on-chip:

  a) strided slice        x[::2, :]
  b) sublane reshape      x.reshape(R//2, 2, C)[:, 0, :]
  c) selection matmul     S @ x with S a 0/1 (R//2, R) iota matrix
  d) interleave (upsample) jnp.stack([a, b], 1).reshape(R, C)

Each runs in a tiny pallas_call; reports compile wall time, correctness vs
numpy, and a rough per-call time. Run on the real chip:
  python tools/probe_stride.py
"""

from __future__ import annotations

import sys
import time
from functools import partial

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from unitspeech_tpu.utils import compile_cache

compile_cache.enable()


def run_case(name, kernel, out_shape, x, expect):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r, c = x.shape
    try:
        fn = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec((r, c), lambda: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(out_shape, lambda: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(out_shape, x.dtype),
        )
        t0 = time.perf_counter()
        y = np.asarray(jax.jit(fn)(x))
        dt = time.perf_counter() - t0
        ok = np.allclose(y, expect, atol=1e-2)
        # rough steady-state timing
        g = jax.jit(lambda v: fn(v))
        np.asarray(g(x))
        t0 = time.perf_counter()
        for _ in range(50):
            out = g(x)
        np.asarray(out)
        per = (time.perf_counter() - t0) / 50
        print(f"{name:>24}: compile {dt:6.2f}s  correct={ok}  {per*1e6:7.1f} us/call",
              flush=True)
    except Exception as e:  # noqa: BLE001
        msg = f"{type(e).__name__}: {e}"[:160].replace("\n", " ")
        print(f"{name:>24}: FAIL {msg}", flush=True)


def main():
    r, c = 512, 128
    x = jnp.asarray(np.random.default_rng(0).standard_normal((r, c)),
                    jnp.bfloat16)
    xn = np.asarray(x, np.float32)

    def k_strided(x_ref, o_ref):
        o_ref[...] = x_ref[...][::2, :]

    def k_reshape(x_ref, o_ref):
        v = x_ref[...]
        o_ref[...] = v.reshape(v.shape[0] // 2, 2, v.shape[1])[:, 0, :]

    def k_selmat(x_ref, o_ref):
        v = x_ref[...]
        rr = v.shape[0]
        row = jax.lax.broadcasted_iota(jnp.int32, (rr // 2, rr), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (rr // 2, rr), 1)
        s = (col == 2 * row).astype(v.dtype)
        o_ref[...] = jnp.dot(s, v, preferred_element_type=jnp.float32
                             ).astype(v.dtype)

    def k_interleave(x_ref, o_ref):
        v = x_ref[...]
        half = v[: v.shape[0] // 2, :]
        o_ref[...] = jnp.stack([half, half + 1.0], axis=1).reshape(
            v.shape[0], v.shape[1])

    def k_dynslice(x_ref, o_ref):
        v = x_ref[...]
        o_ref[...] = jax.lax.slice(v, (0, 0), (v.shape[0], v.shape[1]),
                                   (2, 1))

    expect_half = xn[::2, :]
    inter = np.empty_like(xn)
    inter[0::2] = xn[: r // 2]
    inter[1::2] = xn[: r // 2] + 1.0

    run_case("strided getitem", k_strided, (r // 2, c), x, expect_half)
    run_case("lax.slice stride2", k_dynslice, (r // 2, c), x, expect_half)
    run_case("sublane reshape", k_reshape, (r // 2, c), x, expect_half)
    run_case("selection matmul", k_selmat, (r // 2, c), x, expect_half)
    run_case("stack interleave", k_interleave, (r, c), x, inter)

    # frame-block selection: keep the first F of every 2F rows (time stride)
    f = 16

    def k_frameblock(x_ref, o_ref):
        v = x_ref[...]
        o_ref[...] = v.reshape(v.shape[0] // (2 * f), 2 * f, v.shape[1]
                               )[:, :f, :].reshape(-1, v.shape[1])

    expect_fb = xn.reshape(r // (2 * f), 2 * f, c)[:, :f, :].reshape(-1, c)
    run_case("frame-block reshape", k_frameblock, (r // 2, c), x, expect_fb)


if __name__ == "__main__":
    main()
