"""BigVGAN vocoder tests: resampling-filter invariants and generator
shape/bounds (reference /root/reference/unitspeech/vocoder/)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unitspeech_tpu.models.vocoder import (
    AMPBlock1,
    BigVGAN,
    Snake,
    SnakeBeta,
    downsample1d,
    kaiser_sinc_filter1d,
    upsample1d,
)


def test_kaiser_filter_matches_torch_window():
    torch = pytest.importorskip("torch")
    # the reference builds the window with torch.kaiser_window(periodic=False)
    # (filter.py:49); np.kaiser must agree
    k = 12
    cutoff, half_width = 0.25, 0.3
    ours = kaiser_sinc_filter1d(cutoff, half_width, k)
    half_size = k // 2
    delta_f = 4 * half_width
    a = 2.285 * (half_size - 1) * np.pi * delta_f + 7.95
    beta = 0.1102 * (a - 8.7) if a > 50 else 0.5842 * (a - 21) ** 0.4 + 0.07886 * (a - 21.0)
    tw = torch.kaiser_window(k, beta=beta, periodic=False).numpy()
    np.testing.assert_allclose(np.kaiser(k, beta), tw, atol=1e-5)
    assert abs(ours.sum() - 1.0) < 1e-6


def test_upsample_doubles_and_preserves_dc():
    x = jnp.ones((1, 64, 3)) * 0.7
    y = upsample1d(x)
    assert y.shape == (1, 128, 3)
    np.testing.assert_allclose(np.asarray(y[:, 10:-10]), 0.7, rtol=1e-3)


def test_downsample_halves_and_preserves_dc():
    x = jnp.ones((1, 64, 3)) * -0.3
    y = downsample1d(x)
    assert y.shape == (1, 32, 3)
    np.testing.assert_allclose(np.asarray(y[:, 5:-5]), -0.3, rtol=1e-3)


def test_resample_roundtrip_midband_sine():
    """up2x -> down2x must be near-identity for in-band content."""
    t = np.arange(256) / 22050.0
    sine = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)
    x = jnp.asarray(sine)[None, :, None]
    y = np.asarray(downsample1d(upsample1d(x)))[0, :, 0]
    err = np.abs(y[32:-32] - sine[32:-32]).max()
    assert err < 5e-3, err


def test_snake_math():
    x = np.linspace(-3, 3, 7).astype(np.float32)[None, :, None]
    m = Snake(1)
    p = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = np.asarray(m.apply(p, jnp.asarray(x)))[0, :, 0]
    alpha = 1.0
    want = x[0, :, 0] + (1 / (alpha + 1e-9)) * np.sin(alpha * x[0, :, 0]) ** 2
    np.testing.assert_allclose(y, want, rtol=1e-5, atol=1e-6)


def test_snakebeta_logscale_init_is_identityish():
    # log-scale zeros init -> alpha=beta=1
    x = np.linspace(-2, 2, 5).astype(np.float32)[None, :, None]
    m = SnakeBeta(1, alpha_logscale=True)
    p = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = np.asarray(m.apply(p, jnp.asarray(x)))[0, :, 0]
    want = x[0, :, 0] + np.sin(x[0, :, 0]) ** 2
    np.testing.assert_allclose(y, want, rtol=1e-4, atol=1e-5)


def test_ampblock_preserves_shape():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 32, 8)), jnp.float32)
    block = AMPBlock1(8, 3, (1, 3, 5))
    p = block.init(jax.random.PRNGKey(0), x)
    y = block.apply(p, x)
    assert y.shape == x.shape


def test_bigvgan_tiny_generator():
    voc = BigVGAN(
        num_mels=8,
        upsample_rates=(2, 2),
        upsample_kernel_sizes=(4, 4),
        upsample_initial_channel=16,
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
    )
    mel = jnp.asarray(np.random.default_rng(0).standard_normal((2, 20, 8)), jnp.float32)
    p = voc.init(jax.random.PRNGKey(0), mel)
    wav = voc.apply(p, mel)
    assert wav.shape == (2, 80)  # T * prod(rates) = 20 * 4
    assert np.abs(np.asarray(wav)).max() <= 1.0
    assert np.isfinite(np.asarray(wav)).all()
