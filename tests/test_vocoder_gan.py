"""Vocoder GAN training step (capability beyond the reference, which ships
the discriminators untrained — SURVEY.md §2.1 #9)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from unitspeech_tpu.config import DataConfig
from unitspeech_tpu.models.discriminators import (
    MultiPeriodDiscriminator,
    MultiResolutionDiscriminator,
)
from unitspeech_tpu.models.vocoder import BigVGAN
from unitspeech_tpu.train.steps import TrainState
from unitspeech_tpu.train.vocoder_gan import make_vocoder_gan_steps


def test_vocoder_gan_steps():
    data_cfg = DataConfig(n_feats=16, n_fft=64, hop_length=16, win_length=64,
                          sampling_rate=22050, mel_fmax=8000.0)
    gen = BigVGAN(
        num_mels=16, upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
        upsample_initial_channel=16, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
    )
    mpd = MultiPeriodDiscriminator(periods=(2,), channel_mult=0.125)
    mrd = MultiResolutionDiscriminator(resolutions=((64, 16, 32),), channel_mult=0.25)

    b, t = 2, 24  # wav length = 24*16 = 384
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.uniform(-1, 1, (b, t, 16)), jnp.float32)
    wav = jnp.asarray(rng.uniform(-0.5, 0.5, (b, t * 16)), jnp.float32)
    batch = {"mel": mel, "wav": wav}

    key = jax.random.PRNGKey(0)
    g_params = gen.init(key, mel)
    d_params = {
        "mpd": mpd.init(key, wav, wav),
        "mrd": mrd.init(key, wav, wav),
    }
    g_opt = optax.adam(2e-4)
    d_opt = optax.adam(2e-4)
    disc_step, gen_step = make_vocoder_gan_steps(
        gen, mpd, mrd, g_opt, d_opt, data_cfg
    )
    d_state = TrainState(d_params, d_opt.init(d_params), jnp.array(0))
    g_state = TrainState(g_params, g_opt.init(g_params), jnp.array(0))

    d_before = [np.asarray(x) for x in jax.tree_util.tree_leaves(d_params)]
    d_state, d_metrics = disc_step(d_state, g_state.params, batch)
    assert np.isfinite(float(d_metrics["disc_loss"]))
    assert any(
        not np.allclose(a, np.asarray(b_))
        for a, b_ in zip(d_before, jax.tree_util.tree_leaves(d_state.params))
    )

    g_before = [np.asarray(x) for x in jax.tree_util.tree_leaves(g_state.params)]
    g_state, g_metrics = gen_step(g_state, d_state.params, batch)
    for k in ("gen_loss", "gen_adv", "gen_fm", "gen_mel_l1"):
        assert np.isfinite(float(g_metrics[k])), k
    assert any(
        not np.allclose(a, np.asarray(b_))
        for a, b_ in zip(g_before, jax.tree_util.tree_leaves(g_state.params))
    )
