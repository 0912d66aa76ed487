"""ops/fastmath.py — fast Mosaic transcendentals vs the jnp oracles.

The default kernel paths (SNAKE_MODE="poly", MISH_MODE="fast") are only
allowed because their error is far below the bf16 resolution of every
consumer; these tests lock that bound and the bit-compat claim."""

import jax
import jax.numpy as jnp
import numpy as np

from unitspeech_tpu.ops.fastmath import fast_exp, fast_sin


def test_fast_exp_accuracy():
    x = jnp.asarray(
        np.random.default_rng(0).uniform(-87, 30, 500_001), jnp.float32
    )
    got = np.asarray(fast_exp(x)).astype(np.float64)
    want = np.exp(np.asarray(x).astype(np.float64))
    assert np.max(np.abs(got - want) / want) < 5e-6


def test_fast_exp_edge_cases():
    x = jnp.asarray([-jnp.inf, -200.0, -87.0, 0.0, 30.0, 100.0], jnp.float32)
    got = np.asarray(fast_exp(x))
    # clamp semantics: [-inf, -87] -> exp(-87) ~ 1.6e-38 (treated as 0 by
    # consumers), [30, inf) -> exp(30)
    assert np.all(np.isfinite(got))
    assert got[0] == got[1] == got[2]
    assert got[2] < 2e-38
    np.testing.assert_allclose(got[3], 1.0, rtol=1e-6)
    np.testing.assert_allclose(got[4], np.exp(30.0), rtol=1e-5)
    assert got[5] == got[4]


def test_fast_sin_squared_bound():
    x = jnp.asarray(
        np.random.default_rng(1).uniform(-256, 256, 500_001), jnp.float32
    )
    got = np.asarray(fast_sin(x)).astype(np.float64) ** 2
    want = np.sin(np.asarray(x).astype(np.float64)) ** 2
    assert np.max(np.abs(got - want)) < 2e-5


def test_mish_fast_bitcompat_bf16():
    """_mish_f32 under MISH_MODE='fast' vs 'exp', bf16 in/out: the fused
    resblock kernels consume the bf16 cast, where the <4e-6 poly error is
    invisible (~all outputs bit-identical)."""
    from unitspeech_tpu.ops import pallas_resnet as pr

    x = jnp.asarray(
        np.random.default_rng(2).standard_normal(100_000) * 4.0, jnp.bfloat16
    )
    prev = pr.MISH_MODE
    try:
        pr.MISH_MODE = "fast"
        got = np.asarray(pr._mish_f32(x), np.float32)
        pr.MISH_MODE = "exp"
        want = np.asarray(pr._mish_f32(x), np.float32)
    finally:
        pr.MISH_MODE = prev
    np.testing.assert_allclose(got, want, rtol=8e-3, atol=1e-6)
    assert np.mean(got == want) > 0.999


def test_mish_fast_bitcompat_f32_to_bf16():
    """The fused kernels keep mish in f32 and cast at the conv input —
    check the f32 path quantized to bf16 matches the oracle the same way."""
    from unitspeech_tpu.ops import pallas_resnet as pr

    x = jnp.asarray(
        np.random.default_rng(3).standard_normal(100_000) * 6.0, jnp.float32
    )
    prev = pr.MISH_MODE
    try:
        pr.MISH_MODE = "fast"
        got = np.asarray(pr._mish_f32(x).astype(jnp.bfloat16), np.float32)
        pr.MISH_MODE = "exp"
        want = np.asarray(pr._mish_f32(x).astype(jnp.bfloat16), np.float32)
    finally:
        pr.MISH_MODE = prev
    assert np.mean(got == want) > 0.999
    np.testing.assert_allclose(got, want, rtol=8e-3, atol=1e-6)
