"""Cheap mish approximations for the VPU-bound glue fusions.

The reference activation is exact Mish, x * tanh(softplus(x))
(/root/reference/unitspeech/unitspeech.py:13-15). In the deep U-Net stages
the convs run as int8/bf16 MXU matmuls and the inter-conv glue
(GroupNorm + mish + FiLM + mask + quantize) is VPU-transcendental-bound
(profiled nine ~0.128 ms/step fusions, ~17% of the sampler step — ROADMAP
r3 ledger). These variants trade bounded absolute error against VPU op
count; the serving default is chosen by an INT8_GATE-style end-to-end
quality gate (tools/mish_gate.py) plus an in-pipeline A/B
(tools/bench_glue.py).

All functions take/return float32 and are exact-asymptote clamped:
x >= 8 -> x (|err| <= 1.8e-6), x <= -12 -> 0 (|err| <= 7.5e-5).

Max absolute error vs exact mish (f32 evaluation, verified over [-30, 30]):
  exact       0           (one-exp identity, 1 exp + 1 div)
  rational66  6.3e-4      (deg-6/6 rational, 12 FMA + 1 div)
  rational44  1.3e-2      (deg-4/4 rational,  8 FMA + 1 div)
  poly5       6.1e-2      (x * clip(deg-5 poly, 0, 1), 5 FMA, no div)
  hard        2.6e-1      (0.5 x clip(x+2, 0, 2), 2 ops, no div)
"""

from __future__ import annotations

import jax.numpy as jnp

GLUE_MISH_IMPLS = ("exact", "rational66", "rational44", "poly5", "hard")

# least-squares fits of tanh(softplus(x)) on [-12, 8], weighted by |x|+0.3
# so the bound is on mish's absolute error (see module docstring; the fit
# script lives in the r4 ledger entry)
_P44 = (0.6033350149368806, 0.26546748492676, 0.048326485951154755,
        0.004151000060567001, 0.0001362444981790446)
_Q44 = (1.0, -0.07520845922136188, 0.15539823715162498,
        -0.010303306415290906, 0.0008418548144279357)
_P66 = (0.6003841084123365, 0.13518056145357046, 0.03079624818969829,
        0.010708970693782526, 0.0019286263594671877, 0.0001542062913288647,
        4.521837211124869e-06)
_Q66 = (1.0, -0.306830784764715, 0.24271755346598606, -0.044695965026416075,
        0.010137768383543907, -0.0004923065967933071, 2.5513886329811114e-05)
_POLY5 = (0.6017234482865478, 0.2755095557877465, -0.015878795076013894,
          -0.0179987411159396, 0.0007416837399881002, 0.0005540606906390195)

_LO, _HI = -12.0, 8.0


def _horner(x, coefs):
    acc = jnp.full_like(x, coefs[-1])
    for c in coefs[-2::-1]:
        acc = acc * x + c
    return acc


def mish_exact(h):
    """Exact mish via the one-exp identity (see pallas_resnet._mish_f32)."""
    e2 = jnp.square(1.0 + jnp.exp(jnp.minimum(h, 30.0)))
    return jnp.where(h > 20.0, h, h * ((e2 - 1.0) / (e2 + 1.0)))


def _rational(h, p, q):
    xc = jnp.clip(h, _LO, _HI)
    y = xc * (_horner(xc, p) / _horner(xc, q))
    y = jnp.where(h >= _HI, h, y)
    return jnp.where(h <= _LO, 0.0, y)


def mish_rational44(h):
    return _rational(h, _P44, _Q44)


def mish_rational66(h):
    return _rational(h, _P66, _Q66)


def mish_poly5(h):
    s = jnp.clip(_horner(jnp.clip(h, _LO, _HI), _POLY5), 0.0, 1.0)
    y = jnp.where(h >= _HI, h, h * s)
    return jnp.where(h <= _LO, 0.0, y)


def mish_hard(h):
    # exact identity for h >= 0 (the clip saturates at 2), zero below -2
    return 0.5 * h * jnp.clip(h + 2.0, 0.0, 2.0)


_IMPLS = {
    "exact": mish_exact,
    "rational66": mish_rational66,
    "rational44": mish_rational44,
    "poly5": mish_poly5,
    "hard": mish_hard,
}


def glue_mish(h, impl: str = "exact"):
    """Dispatch by impl name; h float32."""
    return _IMPLS[impl](h)
