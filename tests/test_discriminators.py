"""BigVGAN discriminators + GAN losses (reference vocoder/models.py:204-376)."""

import jax
import jax.numpy as jnp
import numpy as np

from unitspeech_tpu.models.discriminators import (
    MultiPeriodDiscriminator,
    MultiResolutionDiscriminator,
    discriminator_loss,
    feature_loss,
    generator_loss,
)


def test_mpd_shapes_and_losses():
    mpd = MultiPeriodDiscriminator(periods=(2, 3), channel_mult=0.125)
    y = jnp.asarray(np.random.default_rng(0).standard_normal((2, 400)) * 0.1, jnp.float32)
    y_hat = jnp.asarray(np.random.default_rng(1).standard_normal((2, 400)) * 0.1, jnp.float32)
    p = mpd.init(jax.random.PRNGKey(0), y, y_hat)
    outs_r, outs_g, fmaps_r, fmaps_g = mpd.apply(p, y, y_hat)
    assert len(outs_r) == 2 and len(fmaps_g) == 2
    assert all(o.ndim == 2 and o.shape[0] == 2 for o in outs_r)
    d_loss, r_losses, g_losses = discriminator_loss(outs_r, outs_g)
    g_loss, _ = generator_loss(outs_g)
    f_loss = feature_loss(fmaps_r, fmaps_g)
    for v in (d_loss, g_loss, f_loss):
        assert np.isfinite(float(v))
    # identical inputs -> zero feature loss
    outs_r2, outs_g2, fr2, fg2 = mpd.apply(p, y, y)
    assert float(feature_loss(fr2, fg2)) == 0.0


def test_mrd_shapes():
    mrd = MultiResolutionDiscriminator(
        resolutions=((128, 32, 64), (256, 64, 128)), channel_mult=0.25
    )
    y = jnp.asarray(np.random.default_rng(0).standard_normal((1, 1000)) * 0.1, jnp.float32)
    p = mrd.init(jax.random.PRNGKey(0), y, y)
    outs_r, outs_g, fmaps_r, fmaps_g = mrd.apply(p, y, y)
    assert len(outs_r) == 2
    np.testing.assert_allclose(np.asarray(outs_r[0]), np.asarray(outs_g[0]))


def test_period_padding_non_divisible():
    mpd = MultiPeriodDiscriminator(periods=(3,), channel_mult=0.125)
    y = jnp.zeros((1, 400))  # 400 % 3 != 0 -> reflect pad path
    p = mpd.init(jax.random.PRNGKey(0), y, y)
    outs_r, *_ = mpd.apply(p, y, y)
    assert np.isfinite(np.asarray(outs_r[0])).all()
