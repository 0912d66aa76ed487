"""BigVGAN adversarial training step (generator + MPD/MRD discriminators).

The reference vendors the BigVGAN discriminators and GAN losses but never
trains the vocoder (SURVEY.md §2.1 #9: "present but never trained in this
repo"); this module provides the full jitted training step so the framework
can train/fine-tune its vocoder end to end on TPU — alternating LS-GAN
updates with feature-matching and mel-spectrogram losses (the standard
BigVGAN recipe: L_G = L_adv + 2*L_fm + 45*L_mel).

Both updates compile into single XLA programs; DP over the mesh works the
same way as the diffusion train steps (batch sharded, params replicated).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from unitspeech_tpu.models.discriminators import (
    MultiPeriodDiscriminator,
    MultiResolutionDiscriminator,
    discriminator_loss,
    feature_loss,
    generator_loss,
)
from unitspeech_tpu.models.vocoder import BigVGAN
from unitspeech_tpu.ops.mel import mel_spectrogram
from unitspeech_tpu.train.steps import TrainState, clip_by_global_norm

MEL_LOSS_WEIGHT = 45.0
FM_IS_IN_FEATURE_LOSS = True  # feature_loss already includes the x2 factor


def _mel(wav, data_cfg):
    return mel_spectrogram(
        wav,
        n_fft=data_cfg.n_fft, num_mels=data_cfg.n_feats,
        sampling_rate=data_cfg.sampling_rate, hop_size=data_cfg.hop_length,
        win_size=data_cfg.win_length, fmin=data_cfg.mel_fmin,
        fmax=data_cfg.mel_fmax,
    )


def make_vocoder_gan_steps(
    generator: BigVGAN,
    mpd: MultiPeriodDiscriminator,
    mrd: MultiResolutionDiscriminator,
    gen_opt: optax.GradientTransformation,
    disc_opt: optax.GradientTransformation,
    data_cfg,
    grad_clip: float = 1000.0,
) -> Tuple[Callable, Callable]:
    """Returns (disc_step, gen_step), each jitted.

    disc_step(d_state, gen_params, batch) -> (d_state, metrics)
    gen_step(g_state, disc_params, batch) -> (g_state, metrics)
    batch: {"mel": (B, T, n_mels), "wav": (B, T*hop)}.
    """

    def disc_loss_fn(d_params, gen_params, batch):
        y = batch["wav"]
        y_hat = jax.lax.stop_gradient(generator.apply(gen_params, batch["mel"]))
        mpd_r, mpd_g, _, _ = mpd.apply(d_params["mpd"], y, y_hat)
        mrd_r, mrd_g, _, _ = mrd.apply(d_params["mrd"], y, y_hat)
        loss_mpd, _, _ = discriminator_loss(mpd_r, mpd_g)
        loss_mrd, _, _ = discriminator_loss(mrd_r, mrd_g)
        total = loss_mpd + loss_mrd
        return total, {"disc_loss": total, "disc_mpd": loss_mpd, "disc_mrd": loss_mrd}

    def disc_step(d_state: TrainState, gen_params, batch):
        (total, parts), grads = jax.value_and_grad(disc_loss_fn, has_aux=True)(
            d_state.params, gen_params, batch
        )
        grads, gnorm = clip_by_global_norm(grads, grad_clip)
        updates, opt_state = disc_opt.update(grads, d_state.opt_state, d_state.params)
        params = optax.apply_updates(d_state.params, updates)
        return TrainState(params, opt_state, d_state.step + 1), dict(
            parts, disc_grad_norm=gnorm
        )

    def gen_loss_fn(gen_params, d_params, batch):
        y = batch["wav"]
        mel_real = batch["mel"]
        y_hat = generator.apply(gen_params, mel_real)
        mel_hat = _mel(y_hat, data_cfg)
        mel_loss = jnp.mean(jnp.abs(mel_hat - _mel(y, data_cfg)))
        mpd_r, mpd_g, mpd_fr, mpd_fg = mpd.apply(d_params["mpd"], y, y_hat)
        mrd_r, mrd_g, mrd_fr, mrd_fg = mrd.apply(d_params["mrd"], y, y_hat)
        adv_mpd, _ = generator_loss(mpd_g)
        adv_mrd, _ = generator_loss(mrd_g)
        fm = feature_loss(mpd_fr, mpd_fg) + feature_loss(mrd_fr, mrd_fg)
        total = adv_mpd + adv_mrd + fm + MEL_LOSS_WEIGHT * mel_loss
        return total, {
            "gen_loss": total, "gen_adv": adv_mpd + adv_mrd,
            "gen_fm": fm, "gen_mel_l1": mel_loss,
        }

    def gen_step(g_state: TrainState, d_params, batch):
        (total, parts), grads = jax.value_and_grad(gen_loss_fn, has_aux=True)(
            g_state.params, d_params, batch
        )
        grads, gnorm = clip_by_global_norm(grads, grad_clip)
        updates, opt_state = gen_opt.update(grads, g_state.opt_state, g_state.params)
        params = optax.apply_updates(g_state.params, updates)
        return TrainState(params, opt_state, g_state.step + 1), dict(
            parts, gen_grad_norm=gnorm
        )

    return jax.jit(disc_step, donate_argnums=(0,)), jax.jit(gen_step, donate_argnums=(0,))


def make_fused_vocoder_gan_step(
    generator: BigVGAN,
    mpd: MultiPeriodDiscriminator,
    mrd: MultiResolutionDiscriminator,
    gen_opt: optax.GradientTransformation,
    disc_opt: optax.GradientTransformation,
    data_cfg,
    grad_clip: float = 1000.0,
) -> Callable:
    """ONE jitted program per training step: real-wav mel + the alternating
    discriminator-then-generator updates (the separate disc/gen steps cost
    three dispatches per step — mel, disc, gen — at ~35 ms of tunnel
    latency each on this environment's TPU; see CLAUDE.md).

    fused_step(d_state, g_state, wav) -> (d_state, g_state, metrics)."""
    disc_step, gen_step = make_vocoder_gan_steps(
        generator, mpd, mrd, gen_opt, disc_opt, data_cfg, grad_clip
    )
    # trace the UN-jitted step bodies (calling the jitted wrappers under the
    # outer trace would just warn about the ignored inner donations)
    disc_fn = getattr(disc_step, "__wrapped__", disc_step)
    gen_fn = getattr(gen_step, "__wrapped__", gen_step)

    def fused_step(d_state: TrainState, g_state: TrainState, wav):
        batch = {"wav": wav, "mel": _mel(wav, data_cfg)}
        d_state, d_metrics = disc_fn(d_state, g_state.params, batch)
        g_state, g_metrics = gen_fn(g_state, d_state.params, batch)
        return d_state, g_state, {**d_metrics, **g_metrics}

    return jax.jit(fused_step, donate_argnums=(0, 1))
