"""Fused Pallas stride-2 resampling kernels vs the XLA Downsample/Upsample
(models/unet.py, themselves reference-verified in test_reference_parity.py).
Interpret mode on CPU."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unitspeech_tpu.models.unet import Downsample, Upsample
from unitspeech_tpu.ops.pallas_resample import (
    fused_downsample_conv,
    fused_upsample_conv,
)


def _mask(b, t, lens):
    return (jnp.arange(t)[None, :] < jnp.asarray(lens)[:, None]).astype(
        jnp.float32
    )[:, :, None, None]


@pytest.mark.parametrize(
    "b,t,f,cin,cout,lens,fpt",
    [
        (2, 16, 8, 4, 4, [16, 16], 0),   # full mask
        (2, 16, 8, 4, 8, [16, 10], 0),   # padded batch, channel change
        (1, 8, 16, 4, 4, [8], 2),        # explicit small tile
        (2, 12, 8, 4, 4, [12, 5], 3),    # odd tile count, heavy padding
    ],
)
def test_downsample_parity(b, t, f, cin, cout, lens, fpt):
    key = jax.random.PRNGKey(0)
    mod = Downsample(cout)
    x = jax.random.normal(jax.random.fold_in(key, 1), (b, t, f, cin))
    mask = _mask(b, t, lens)
    params = mod.init(key, x)
    ref = mod.apply(params, x * mask)

    got = fused_downsample_conv(
        x, mask, params["params"]["conv"]["kernel"],
        params["params"]["conv"]["bias"], interpret=True, fpt=fpt,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4
    )


@pytest.mark.parametrize(
    "b,t,f,cin,cout,lens,fpt",
    [
        (2, 8, 8, 4, 4, [8, 8], 0),      # full mask
        (2, 8, 8, 8, 4, [8, 5], 0),      # padded batch, channel change
        (1, 6, 8, 4, 4, [6], 2),         # explicit small tile
        (2, 12, 16, 4, 4, [12, 7], 3),   # odd tile count, heavy padding
    ],
)
def test_upsample_parity(b, t, f, cin, cout, lens, fpt):
    key = jax.random.PRNGKey(1)
    mod = Upsample(cout)
    x = jax.random.normal(jax.random.fold_in(key, 1), (b, t, f, cin))
    mask = _mask(b, t, lens)
    params = mod.init(key, x)
    ref = mod.apply(params, x * mask)

    got = fused_upsample_conv(
        x, mask, params["params"]["conv"]["kernel"],
        params["params"]["conv"]["bias"], interpret=True, fpt=fpt,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4
    )


def test_downsample_bf16_numerics_contract():
    """bf16 inputs: f32 accumulation rounded once (like the other fused
    kernels) — compare against the f32 math within bf16 tolerance."""
    key = jax.random.PRNGKey(2)
    b, t, f, c = 1, 8, 8, 8
    mod = Downsample(c)
    x32 = jax.random.normal(jax.random.fold_in(key, 1), (b, t, f, c))
    mask = _mask(b, t, [8])
    params = mod.init(key, x32)
    ref = np.asarray(mod.apply(params, x32 * mask), np.float32)
    got = fused_downsample_conv(
        x32.astype(jnp.bfloat16), mask,
        params["params"]["conv"]["kernel"],
        params["params"]["conv"]["bias"], interpret=True,
    )
    rel = np.abs(np.asarray(got, np.float32) - ref).max() / (
        np.abs(ref).max() + 1e-9
    )
    assert rel < 0.03, rel


def test_estimator_resample_routing_parity():
    """use_pallas_resample routes the supported down/up stages through the
    fused kernels with the SAME parameter tree — estimator outputs match the
    XLA path (interpret mode; shapes chosen so both a downsample and an
    upsample qualify)."""
    from unitspeech_tpu.models.unet import GradLogPEstimator2d

    b, t, f, c = 1, 16, 16, 16
    kw = dict(dim=8, dim_mults=(1, 2), groups=4, spk_emb_dim=8)
    ref_mod = GradLogPEstimator2d(**kw)
    new_mod = GradLogPEstimator2d(use_pallas_resample=True, **kw)

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.fold_in(key, 1), (b, t, f))
    mu = jax.random.normal(jax.random.fold_in(key, 2), (b, t, f))
    mask = (jnp.arange(t)[None, :] < 11).astype(jnp.float32)
    tt = jnp.full((b,), 0.4)
    spk = jax.random.normal(jax.random.fold_in(key, 3), (b, 8))

    params = ref_mod.init(key, x, mask, mu, tt, spk)
    p2 = new_mod.init(jax.random.PRNGKey(1), x, mask, mu, tt, spk)
    assert jax.tree.structure(params) == jax.tree.structure(p2)

    ref = ref_mod.apply(params, x, mask, mu, tt, spk)
    got = new_mod.apply(params, x, mask, mu, tt, spk)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=3e-5, rtol=1e-4
    )


def test_bf16_mask_odd_length_over_256():
    """Regression: summing a bf16 mask rounds odd lengths > 256 to even
    (bf16 has 8 mantissa bits), silently zeroing a REAL frame — the serving
    pipeline passes bf16 masks at T=344. Lengths must derive via f32."""
    t, f, c = 344, 8, 4
    lens = 341  # odd, > 256: bf16 sum would give 340
    key = jax.random.PRNGKey(5)
    x = jax.random.normal(key, (1, t, f, c))
    mask16 = (jnp.arange(t)[None, :] < lens).astype(jnp.bfloat16)[
        :, :, None, None
    ]
    mask32 = mask16.astype(jnp.float32)
    mod = Downsample(c)
    params = mod.init(key, x)
    ref = fused_downsample_conv(
        x, mask32, params["params"]["conv"]["kernel"],
        params["params"]["conv"]["bias"], interpret=True, fpt=1,
    )
    got = fused_downsample_conv(
        x, mask16, params["params"]["conv"]["kernel"],
        params["params"]["conv"]["bias"], interpret=True, fpt=1,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)


def test_support_matrix_at_reference_shapes():
    """Locks WHICH estimator resample sites the fused kernels may claim at
    the reference config (the f % 8 halo constraint and aligned-tile search
    are easy to regress; the first on-chip run of an unsupported shape
    costs a compiler crash)."""
    from unitspeech_tpu.ops.pallas_resample import (
        supports_downsample,
        supports_upsample,
    )

    # downsample inputs (T, F, C) at the 344-frame bucket
    assert supports_downsample(344, 80, 128)
    assert supports_downsample(172, 40, 256)
    assert not supports_downsample(86, 20, 512)   # F % 8 != 0
    # upsample inputs
    assert supports_upsample(172, 40, 128)
    assert not supports_upsample(86, 20, 256)     # F % 8 != 0
    assert not supports_upsample(43, 10, 512)
