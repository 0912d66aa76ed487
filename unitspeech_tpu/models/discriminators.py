"""BigVGAN discriminators + GAN losses (vocoder training support).

JAX re-implementation of the reference's MPD/MRD discriminators and losses
(/root/reference/unitspeech/vocoder/models.py:204-376). The reference ships
these but never trains the vocoder in-repo (SURVEY.md §2.1 #9); they are
provided here so the framework can train/fine-tune BigVGAN end to end.

  * MultiPeriodDiscriminator: per-period 2-D conv stacks over (T/p, p)
    reshapes, periods from config (default 2,3,5,7,11)
  * MultiResolutionDiscriminator: 2-D convs over |STFT| at three resolutions
  * least-squares GAN losses + feature-matching loss

Weight norm is treated as plain parameterization on TPU (fold at conversion,
regularize via optimizer if training from scratch).
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from unitspeech_tpu.ops.mel import hann_window

LRELU_SLOPE = 0.1


class DiscriminatorP(nn.Module):
    """One period discriminator (reference models.py:204-238)."""

    period: int
    kernel_size: int = 5
    stride: int = 3
    channel_mult: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, T) waveform -> (logits (B, N), feature maps)."""
        b, t = x.shape
        if t % self.period != 0:
            n_pad = self.period - (t % self.period)
            x = jnp.pad(x, ((0, 0), (0, n_pad)), mode="reflect")
            t = t + n_pad
        x = x.reshape(b, t // self.period, self.period, 1).astype(self.dtype)
        fmap: List = []
        pad = (self.kernel_size * 1 - 1) // 2
        chans = [32, 128, 512, 1024]
        for i, ch in enumerate(chans):
            x = nn.Conv(
                int(ch * self.channel_mult), (self.kernel_size, 1),
                strides=(self.stride, 1), padding=[(pad, pad), (0, 0)],
                dtype=self.dtype, name=f"conv_{i}",
            )(x)
            x = nn.leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
        x = nn.Conv(
            int(1024 * self.channel_mult), (self.kernel_size, 1),
            padding=[(2, 2), (0, 0)], dtype=self.dtype, name="conv_4",
        )(x)
        x = nn.leaky_relu(x, LRELU_SLOPE)
        fmap.append(x)
        x = nn.Conv(1, (3, 1), padding=[(1, 1), (0, 0)], dtype=self.dtype,
                    name="conv_post")(x)
        fmap.append(x)
        return x.reshape(b, -1), fmap


class MultiPeriodDiscriminator(nn.Module):
    periods: Sequence[int] = (2, 3, 5, 7, 11)
    channel_mult: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, y, y_hat):
        outs_r, outs_g, fmaps_r, fmaps_g = [], [], [], []
        for p in self.periods:
            d = DiscriminatorP(p, channel_mult=self.channel_mult,
                               dtype=self.dtype, name=f"p{p}")
            o_r, f_r = d(y)
            o_g, f_g = d(y_hat)
            outs_r.append(o_r)
            outs_g.append(o_g)
            fmaps_r.append(f_r)
            fmaps_g.append(f_g)
        return outs_r, outs_g, fmaps_r, fmaps_g


def _stft_mag(x, n_fft: int, hop: int, win: int):
    """|STFT| with the reference's padding semantics (models.py:307-315)."""
    pad = (n_fft - hop) // 2
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    b, length = x.shape
    n_frames = 1 + (length - n_fft) // hop
    import numpy as np

    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = x[:, idx]
    w = np.asarray(hann_window(win))
    if win < n_fft:  # torch.stft centers a short window inside n_fft
        left = (n_fft - win) // 2
        w = np.pad(w, (left, n_fft - win - left))
    spec = jnp.fft.rfft(frames * jnp.asarray(w)[None, None, :], n=n_fft, axis=-1)
    return jnp.sqrt(jnp.real(spec) ** 2 + jnp.imag(spec) ** 2 + 1e-12)  # (B, T, F)


class DiscriminatorR(nn.Module):
    """One STFT-resolution discriminator (reference models.py:265-315)."""

    resolution: Tuple[int, int, int]  # (n_fft, hop, win)
    channel_mult: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        n_fft, hop, win = self.resolution
        mag = _stft_mag(x, n_fft, hop, win)  # (B, T, F)
        h = mag.transpose(0, 2, 1)[..., None].astype(self.dtype)  # (B, F, T, 1)
        fmap: List = []
        ch = int(32 * self.channel_mult)
        specs = [
            ((3, 9), (1, 1), [(1, 1), (4, 4)]),
            ((3, 9), (1, 2), [(1, 1), (4, 4)]),
            ((3, 9), (1, 2), [(1, 1), (4, 4)]),
            ((3, 9), (1, 2), [(1, 1), (4, 4)]),
            ((3, 3), (1, 1), [(1, 1), (1, 1)]),
        ]
        for i, (k, s, pad) in enumerate(specs):
            h = nn.Conv(ch, k, strides=s, padding=pad, dtype=self.dtype,
                        name=f"conv_{i}")(h)
            h = nn.leaky_relu(h, LRELU_SLOPE)
            fmap.append(h)
        h = nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                    name="conv_post")(h)
        fmap.append(h)
        return h.reshape(h.shape[0], -1), fmap


class MultiResolutionDiscriminator(nn.Module):
    resolutions: Tuple[Tuple[int, int, int], ...] = (
        (1024, 120, 600), (2048, 240, 1200), (512, 50, 240),
    )
    channel_mult: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, y, y_hat):
        outs_r, outs_g, fmaps_r, fmaps_g = [], [], [], []
        for res in self.resolutions:
            d = DiscriminatorR(tuple(res), channel_mult=self.channel_mult,
                               dtype=self.dtype, name=f"r{res[0]}_{res[1]}")
            o_r, f_r = d(y)
            o_g, f_g = d(y_hat)
            outs_r.append(o_r)
            outs_g.append(o_g)
            fmaps_r.append(f_r)
            fmaps_g.append(f_g)
        return outs_r, outs_g, fmaps_r, fmaps_g


def feature_loss(fmaps_r, fmaps_g):
    """Reference models.py:346-352 (x2 scaling included)."""
    loss = 0.0
    for fr, fg in zip(fmaps_r, fmaps_g):
        for rl, gl in zip(fr, fg):
            loss += jnp.mean(jnp.abs(rl.astype(jnp.float32) - gl.astype(jnp.float32)))
    return loss * 2.0


def discriminator_loss(real_outputs, generated_outputs):
    """LS-GAN discriminator loss (reference models.py:355-366)."""
    loss = 0.0
    r_losses, g_losses = [], []
    for dr, dg in zip(real_outputs, generated_outputs):
        r = jnp.mean((1.0 - dr.astype(jnp.float32)) ** 2)
        g = jnp.mean(dg.astype(jnp.float32) ** 2)
        loss += r + g
        r_losses.append(r)
        g_losses.append(g)
    return loss, r_losses, g_losses


def generator_loss(disc_outputs):
    """LS-GAN generator loss (reference models.py:369-376)."""
    loss = 0.0
    gen_losses = []
    for dg in disc_outputs:
        l = jnp.mean((1.0 - dg.astype(jnp.float32)) ** 2)
        gen_losses.append(l)
        loss += l
    return loss, gen_losses
