"""Fast f32 transcendentals for Mosaic (Pallas TPU) kernels.

Measured per-op costs on v5e Mosaic (tools/bench_transcendental.py,
K-chained in-VMEM kernel, r4): jnp.sin ~30 lane-ops, jnp.tanh ~27,
jnp.exp ~20, fast_sin ~free (inside the ~13-op noise floor), fast_exp ~85
(NEGATIVE — see its docstring). So:

- fast_sin IS the production snake path (pallas_kernels.SNAKE_MODE="poly"):
  sin cost 14.2 ms of a 58.3 ms standalone BigVGAN forward
  (--snake-mode probe_nosin), and the poly recovered ~10 ms of it.
- fast_exp is kept only as a documented negative; kernels use jnp.exp.

The poly errors sit orders of magnitude below the bf16 resolution of every
consumer, so using them is not a meaningful numerics change (locked by
tests/test_fastmath.py bit-compat assertions).

Only relevant INSIDE Pallas kernels: on the XLA side the stock jnp
transcendentals are already cheap (the r4 cheap-mish A/B measured XLA's exp
as a non-factor — ROADMAP.md glue ledger).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_LOG2E = 1.4426950408889634


def fast_sin(x):
    """sin(x) for f32 x, sign-correct only up to a factor of (-1)^n — meant
    for callers that SQUARE the result (snake), where the dropped
    range-reduction parity sign is irrelevant.

    Range reduction r = x - round(x/pi)*pi puts r in [-pi/2, pi/2]; the odd
    least-squares degree-7 polynomial there has max abs error 1.6e-6, and
    f32 pi rounding adds ~9e-8 per reduced period: measured max
    |poly^2 - sin^2| = 1.4e-5 over |x| <= 256, ~500x below bf16 eps
    (7.8e-3). ~9 VPU ops vs ~40 for Mosaic's sin."""
    n = jnp.round(x * jnp.float32(1.0 / np.pi))
    r = x - n * jnp.float32(np.pi)
    r2 = r * r
    return r * (jnp.float32(0.99999749)
                + r2 * (jnp.float32(-0.16665168)
                        + r2 * (jnp.float32(8.3095146e-3)
                                + r2 * jnp.float32(-1.8447153e-4))))


def fast_exp(x):
    """exp(x) for f32 x via 2^z decomposition: z = x*log2(e) splits into a
    rounded integer n (applied as an exponent-field bitcast, legal in
    Mosaic) and a fraction f in [-0.5, 0.5] (degree-5 least-squares 2^f
    polynomial, max rel err 2.9e-7). Whole-pipeline rel error vs exp is
    <4e-6 over [-87, 30] (measured on-chip, /tmp probe r4).

    MEASURED NEGATIVE on v5e Mosaic (tools/bench_transcendental.py r4):
    ~85 lane-ops vs ~20 for the builtin jnp.exp — the i32 convert/shift/
    bitcast exponent construction lowers as wide multi-pass vector ops.
    Kept as the documented attempt (and it IS faster in interpret/CPU
    contexts); kernel defaults use jnp.exp.

    x is clamped to [-87, 30]: below -87 the true exp underflows f32 toward
    0 (the clamp returns ~1.6e-38, which consumers treat as 0 — note
    exp(-inf) therefore returns ~1.6e-38, NOT exactly 0); above 30 callers
    are expected to have saturated already (mish clamps at 30; softmax
    arguments are <= 0)."""
    z = jnp.clip(x, -87.0, 30.0) * jnp.float32(_LOG2E)
    n = jnp.round(z)
    f = z - n
    p = (jnp.float32(1.0)
         + f * (jnp.float32(0.69314718)
                + f * (jnp.float32(0.24022211)
                       + f * (jnp.float32(0.05550341)
                              + f * (jnp.float32(0.00967077)
                                     + f * jnp.float32(0.00133953))))))
    scale = jax.lax.bitcast_convert_type(
        (n.astype(jnp.int32) + 127) << 23, jnp.float32
    )
    return p * scale
