"""Pallas row-stats kernels (ops/pallas_stats.py) vs jnp oracles.

The kernels replace XLA's slow variadic reduce fusions for the flat-path
GroupNorm statistics and the int8 activation abs-max scale (r4 roofline:
~10-15x off bytes bound). On CPU the dispatchers fall back to jnp, so the
kernels themselves are exercised in interpret mode here; the TPU route is
covered by the serving bench / parity suite on-chip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unitspeech_tpu.ops.pallas_stats import (
    _row_absmax_pallas,
    _row_stats_pallas,
    group_mean_inv,
    row_absmax,
    row_stats,
)


@pytest.mark.parametrize("shape,dtype", [
    ((3, 430, 256), jnp.float32),    # stage3-like rows (not 8-aligned)
    ((3, 1720, 128), jnp.bfloat16),  # stage2-like rows, bf16 serving dtype
    ((1, 16, 128), jnp.float32),
])
def test_row_stats_kernel_matches_jnp(shape, dtype):
    x = jax.random.normal(jax.random.PRNGKey(0), shape).astype(dtype)
    got = _row_stats_pallas(x, interpret=True)
    xf = np.asarray(x, dtype=np.float32)
    want_s = xf.sum(axis=1)
    want_ss = (xf * xf).sum(axis=1)
    rtol = 2e-2 if dtype == jnp.bfloat16 else 1e-5
    np.testing.assert_allclose(np.asarray(got[:, 0]), want_s, rtol=rtol,
                               atol=1e-2)
    np.testing.assert_allclose(np.asarray(got[:, 1]), want_ss, rtol=rtol)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_row_absmax_kernel_matches_jnp(dtype):
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 430, 128)).astype(dtype)
    got = _row_absmax_pallas(x, interpret=True)
    want = np.abs(np.asarray(x, dtype=np.float32)).max(axis=1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)


def test_row_stats_dispatcher_cpu_fallback():
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 100, 64))
    st = row_stats(x)
    np.testing.assert_allclose(
        np.asarray(st[:, 0]), np.asarray(x).sum(1), rtol=1e-5, atol=1e-5
    )
    am = row_absmax(x)
    np.testing.assert_allclose(
        np.asarray(am), np.abs(np.asarray(x)).max(1), rtol=1e-6
    )


def test_row_stats_grad():
    """Custom VJP: d sum/dx = 1, d sumsq/dx = 2x (training paths share the
    kernel through _group_norm_lowmem)."""
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 24, 32))
    w = jax.random.normal(jax.random.PRNGKey(4), (2, 2, 32))

    def f(x):
        return jnp.sum(row_stats(x) * w)

    def f_ref(x):
        s = jnp.sum(x, axis=1)
        ss = jnp.sum(x * x, axis=1)
        return jnp.sum(jnp.stack([s, ss], axis=1) * w)

    g = jax.grad(f)(x)
    g_ref = jax.grad(f_ref)(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-5,
                               atol=1e-5)


def test_group_mean_inv_matches_groupnorm_math():
    b, n, c, groups = 2, 120, 64, 8
    x = jax.random.normal(jax.random.PRNGKey(5), (b, n, c))
    mean_c, inv_c = group_mean_inv(x, groups)
    xg = np.asarray(x).reshape(b, n, groups, c // groups)
    mean_g = xg.mean(axis=(1, 3))
    var_g = (xg * xg).mean(axis=(1, 3)) - mean_g**2
    want_mean = np.repeat(mean_g, c // groups, axis=1)
    want_inv = 1.0 / np.sqrt(var_g + 1e-5)
    want_inv = np.repeat(want_inv, c // groups, axis=1)
    np.testing.assert_allclose(np.asarray(mean_c), want_mean, rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(inv_c), want_inv, rtol=1e-4)
