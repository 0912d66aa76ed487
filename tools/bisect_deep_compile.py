#!/usr/bin/env python
"""Bisect the Mosaic compile blow-up of the whole-layer deep fused resnet
kernel (VERDICT r2 next-round #3: ~17 min to compile ONE block at the stage3
shape t=43, f=10, C=1024).

Hypothesis under test: the deep stages' frequency width (f=10/20) is not a
multiple of the 8-row sublane, so the window's +-f row shifts in
_conv3x3_taps are misaligned whole-layer slices — the early-stage kernels
(f=80/40, aligned) compile in seconds.

One case per SUBPROCESS so a pathological compile can be killed by timeout:
    python tools/bisect_deep_compile.py --case t43_f10_c1024 [--timeout 300]
    python tools/bisect_deep_compile.py --all      # run the sweep, print table
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

CASES = {
    # name: (t, f, cin, cout)  — n_rows = t*f
    "t43_f10_c1024": (43, 10, 1024, 1024),   # stage3: the known ~17 min case
    "t9_f10_c1024": (9, 10, 1024, 1024),     # n=90 (misaligned), C=1024
    "t21_f10_c1024": (21, 10, 1024, 1024),   # n=210 (misaligned), C=1024
    "t43_f10_c512": (43, 10, 512, 512),
    "t43_f10_c256": (43, 10, 256, 256),
    "t8_f10_c1024": (8, 10, 1024, 1024),     # tiny n, same misaligned f
    "t16_f10_c1024": (16, 10, 1024, 1024),
    "t43_f8_c1024": (43, 8, 1024, 1024),     # ALIGNED f, same t/C
    "t27_f16_c1024": (27, 16, 1024, 1024),   # aligned f, n=432
    "t86_f20_c512": (86, 20, 512, 512),      # stage2 shape (f=20 misaligned)
    "t86_f24_c512": (86, 24, 512, 512),      # aligned neighbor of stage2
    # cin != cout (wres 1x1-residual path) — the in-model down/up blocks
    "t43_f10_c512_1024": (43, 10, 512, 1024),
    "t43_f10_c2048_1024": (43, 10, 2048, 1024),
    "t86_f20_c1024_512": (86, 20, 1024, 512),
}


def run_case(name: str):
    import numpy as np

    import jax

    from unitspeech_tpu.utils import compile_cache

    compile_cache.enable("/tmp/bisect_no_cache_" + name)  # isolate: no reuse
    import jax.numpy as jnp

    from unitspeech_tpu.ops.pallas_resnet import fused_resnet_block_deep

    t, f, cin, cout = CASES[name]
    rng = np.random.default_rng(0)
    r = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.05, jnp.bfloat16)
    rf = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.05, jnp.float32)
    x = r(1, t, f, cin)
    mask = jnp.ones((1, t, 1), jnp.bfloat16)
    args = (
        x, mask, r(1, 1, 1, cout),
        r(3, 3, cin, cout), rf(cout), rf(cout), rf(cout),
        r(3, 3, cout, cout), rf(cout), rf(cout), rf(cout),
    )
    kw = {}
    if cin != cout:
        kw = dict(wres=r(1, 1, cin, cout), bres=rf(cout))
    t0 = time.time()
    lowered = jax.jit(
        lambda *a: fused_resnet_block_deep(*a, groups=8, interpret=False, **kw)
    ).lower(*args)
    t_lower = time.time() - t0
    t0 = time.time()
    lowered.compile()
    t_compile = time.time() - t0
    print(json.dumps({"case": name, "lower_s": round(t_lower, 1),
                      "compile_s": round(t_compile, 1)}), flush=True)


def main():
    if "--case" in sys.argv:
        run_case(sys.argv[sys.argv.index("--case") + 1])
        return
    # NO kill-timeouts: SIGKILLing an axon TPU client mid-compile wedges the
    # remote server for ~30 min (CLAUDE.md). Instead the sweep runs
    # cheapest-hypothesis-first and the caller stops escalating once the
    # pattern is clear. Select cases explicitly:
    #   python tools/bisect_deep_compile.py t43_f8_c1024 t8_f10_c1024
    names = [a for a in sys.argv[1:] if a in CASES] or list(CASES)
    results = []
    for name in names:
        t0 = time.time()
        p = subprocess.run(
            [sys.executable, __file__, "--case", name],
            capture_output=True, text=True,
            env={**os.environ, "JAX_PLATFORMS": "tpu"},
        )
        line = [l for l in p.stdout.splitlines() if l.startswith("{")]
        if line:
            results.append(json.loads(line[-1]))
            print(line[-1], flush=True)
        else:
            msg = (p.stderr or "")[-400:]
            results.append({"case": name, "error": msg})
            print(json.dumps({"case": name, "error": "no output",
                              "tail": msg[-200:]}), flush=True)
        print(f"# case {name} wall {time.time()-t0:.0f}s", file=sys.stderr,
              flush=True)
    with open("/tmp/bisect_deep_compile.json", "w") as fh:
        json.dump(results, fh, indent=2)


def run_probe(which: str, t: int, f: int, cin: int, cout: int):
    """Lower ONE of the deep kernels in isolation (which in a/b/c/c_none)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from unitspeech_tpu.utils import compile_cache

    compile_cache.enable(f"/tmp/bisect_probe_{which}_{t}_{f}_{cin}_{cout}")
    import time as _t

    from functools import partial as _p

    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from unitspeech_tpu.ops import pallas_resnet as pr

    rng = np.random.default_rng(0)
    r = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.05, jnp.bfloat16)
    rf = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.05, jnp.float32)
    n = t * f
    b = 1
    lens_rows = jnp.full((b, 1, 1), n, jnp.int32)
    lens_spec = pl.BlockSpec((1, 1, 1), lambda bb, cb: (bb, 0, 0),
                             memory_space=pltpu.SMEM)
    full = lambda c: pl.BlockSpec((1, n, c), lambda bb, cb: (bb, 0, 0),
                                  memory_space=pltpu.VMEM)
    row = lambda c: pl.BlockSpec((1, c), lambda bb, cb: (0, 0),
                                 memory_space=pltpu.VMEM)
    stats = lambda c: pl.BlockSpec((1, 2, c), lambda bb, cb: (bb, 0, 0),
                                   memory_space=pltpu.VMEM)

    if which == "a":
        cb1 = int(sys.argv[sys.argv.index("--cb") + 1]) if "--cb" in sys.argv \
            else pr._cout_split(cin, cout)
        def fn(x, w, bb_):
            return pl.pallas_call(
                _p(pr._kernel_a_deep, f=f, n=n, out_dtype=jnp.bfloat16),
                grid=(b, cout // cb1),
                in_specs=[lens_spec, full(cin),
                          pl.BlockSpec((9 * cin, cb1), lambda bb, cb: (0, cb),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec((1, cb1), lambda bb, cb: (0, cb),
                                       memory_space=pltpu.VMEM)],
                out_specs=(pl.BlockSpec((1, n, cb1), lambda bb, cb: (bb, 0, cb),
                                        memory_space=pltpu.VMEM),
                           pl.BlockSpec((1, 2, cb1), lambda bb, cb: (bb, 0, cb),
                                        memory_space=pltpu.VMEM)),
                out_shape=(jax.ShapeDtypeStruct((b, n, cout), jnp.bfloat16),
                           jax.ShapeDtypeStruct((b, 2, cout), jnp.float32)),
            )(lens_rows, x, w, bb_)
        args = (r(b, n, cin), r(9 * cin, cout), rf(1, cout))
    elif which in ("c_identity", "c_none", "c_matmul"):
        mode = which.split("_")[1]
        kd = jnp.float32 if mode == "none" else jnp.bfloat16
        wspec = (pl.BlockSpec((cin, cout), lambda bb, cb: (0, 0),
                              memory_space=pltpu.VMEM) if mode == "matmul"
                 else pl.BlockSpec((1, 1), lambda bb, cb: (0, 0),
                                   memory_space=pltpu.VMEM))
        bspec = (row(cout) if mode == "matmul"
                 else pl.BlockSpec((1, 1), lambda bb, cb: (0, 0),
                                   memory_space=pltpu.VMEM))
        def fn(c2, x, st, s2, be2, wres, bres):
            return pl.pallas_call(
                _p(pr._kernel_c, tile=n, n_rows=n, groups=8, res_mode=mode,
                   out_dtype=kd),
                grid=(b, 1),
                in_specs=[lens_spec, full(cout), full(cin), stats(cout),
                          row(cout), row(cout), wspec, bspec],
                out_specs=full(cout),
                out_shape=jax.ShapeDtypeStruct((b, n, cout), kd),
            )(lens_rows, c2, x, st, s2, be2, wres, bres)
        wres_in = (r(cin, cout) if mode == "matmul" else r(1, 1))
        bres_in = (rf(1, cout) if mode == "matmul" else rf(1, 1))
        args = (r(b, n, cout), r(b, n, cin), rf(b, 2, cout), rf(1, cout),
                rf(1, cout), wres_in, bres_in)
    else:
        raise SystemExit(f"unknown probe {which}")

    t0 = _t.time()
    lowered = jax.jit(fn).lower(*args)
    t_lower = _t.time() - t0
    t0 = _t.time()
    lowered.compile()
    print(json.dumps({"probe": which, "t": t, "f": f, "cin": cin,
                      "cout": cout, "lower_s": round(t_lower, 1),
                      "compile_s": round(_t.time() - t0, 1)}), flush=True)


if __name__ == "__main__":
    if "--probe" in sys.argv:
        i = sys.argv.index("--probe")
        run_probe(sys.argv[i + 1], *map(int, sys.argv[i + 2:i + 6]))
        raise SystemExit(0)
    main()
