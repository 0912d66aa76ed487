"""Unit/contentvec-based voice conversion.

TPU-native equivalent of the reference VC path
(/root/reference/scripts/voice_conversion.py:18-43): speaker-invariant
content features (contentvec, 768-d) -> contentvec encoder (linear embedding
variant of the shared Encoder) -> linear time-interpolation of the
conditioning to the source mel length -> reverse diffusion with dual CFG ->
denormalize -> BigVGAN.

The content extractor itself (HF contentvec HuBERT) lives in models/ssl; this
module takes the features as input so it also serves unit-based VC.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from unitspeech_tpu.models.diffusion import (
    parse_sampler_spec,
    reverse_diffusion,
    reverse_diffusion_ode,
)
from unitspeech_tpu.ops.masking import (
    choose_bucket,
    default_frame_buckets,
    fix_len_compatibility,
    sequence_mask,
)
from unitspeech_tpu.ops.mel import denormalize_mel


def interpolate_linear(x, new_len: int):
    """(B, T, C) -> (B, new_len, C), linear, half-pixel centers (same as
    torch F.interpolate(mode='linear', align_corners=False), used at
    voice_conversion.py:26-31). antialias=False because torch's interpolate
    does not low-pass when downscaling either (the VC path upsamples 50 Hz
    contentvec to ~86 fps mel, but the documented parity holds both ways)."""
    b, t, c = x.shape
    return jax.image.resize(x, (b, new_len, c), method="linear",
                            antialias=False)


@partial(
    jax.jit,
    static_argnames=(
        "encoder", "decoder_apply", "mel_len", "pad_len", "n_timesteps",
        "text_gradient_scale", "spk_gradient_scale", "beta_min", "beta_max",
        "sampler",
    ),
)
def _vc_core(
    encoder,
    encoder_params,
    decoder_apply,
    decoder_params,
    content,
    content_lengths,
    spk_emb,
    key,
    mel_min,
    mel_max,
    mel_len: int,
    pad_len: int,
    n_timesteps: int,
    text_gradient_scale: float,
    spk_gradient_scale: float,
    beta_min: float,
    beta_max: float,
    sampler: str = "ddpm",
):
    cond, _, _ = encoder.apply(encoder_params, content, content_lengths)
    cond = interpolate_linear(cond, mel_len)
    cond = jnp.pad(cond, ((0, 0), (0, pad_len - mel_len), (0, 0)))
    y_mask = sequence_mask(jnp.full((content.shape[0],), mel_len), pad_len)
    z = jax.random.normal(jax.random.fold_in(key, 0), cond.shape)
    # sampler SPEC string, same grammar as the TTS paths
    # (models/diffusion.parse_sampler_spec): "ddpm"/"dpm2" + optional
    # ":cs<k>" CFG-delta-caching stride
    sampler_name, cfg_stride = parse_sampler_spec(sampler)
    if sampler_name == "dpm2":
        mel = reverse_diffusion_ode(
            decoder_apply, decoder_params, z, y_mask, cond, spk_emb,
            n_timesteps=n_timesteps,
            text_gradient_scale=text_gradient_scale,
            spk_gradient_scale=spk_gradient_scale,
            beta_min=beta_min, beta_max=beta_max, cfg_stride=cfg_stride,
        )
    else:
        mel = reverse_diffusion(
            decoder_apply, decoder_params, z, y_mask, cond, spk_emb,
            jax.random.fold_in(key, 1),
            n_timesteps=n_timesteps,
            text_gradient_scale=text_gradient_scale,
            spk_gradient_scale=spk_gradient_scale,
            beta_min=beta_min, beta_max=beta_max, cfg_stride=cfg_stride,
        )
    return denormalize_mel(mel, mel_min, mel_max)


def voice_conversion(
    encoder,
    encoder_params,
    decoder,
    decoder_params,
    content: Any,
    mel_len: int,
    spk_emb,
    mel_min,
    mel_max,
    key,
    n_timesteps: int = 50,
    text_gradient_scale: float = 1.0,
    spk_gradient_scale: float = 1.0,
    beta_min: float = 0.05,
    beta_max: float = 20.0,
    num_downsamplings: int = 3,
    frame_buckets=None,
    sampler: str = "ddpm",
):
    """content: (1, Tc, n_contentvec) features OR (1, Tc) int unit IDs.
    Returns denormalized mel (1, pad_len, F); valid frames = mel_len."""
    frame_buckets = frame_buckets or default_frame_buckets(4096)
    pad_len = choose_bucket(
        fix_len_compatibility(mel_len, num_downsamplings), frame_buckets
    )
    content_lengths = jnp.full((content.shape[0],), content.shape[1])
    mel = _vc_core(
        encoder, encoder_params, decoder.apply, decoder_params,
        jnp.asarray(content), content_lengths, spk_emb, key,
        mel_min, mel_max,
        mel_len=int(mel_len), pad_len=int(pad_len),
        n_timesteps=int(n_timesteps),
        text_gradient_scale=float(text_gradient_scale),
        spk_gradient_scale=float(spk_gradient_scale),
        beta_min=beta_min, beta_max=beta_max, sampler=str(sampler),
    )
    return mel
