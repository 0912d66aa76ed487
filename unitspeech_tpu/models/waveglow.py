"""WaveGlow mel->waveform vocoder + denoiser (textlesslib extras).

JAX re-implementation of the WaveGlow used by textlesslib's Tacotron unit
vocoder (/root/reference/unitspeech/textlesslib/textless/vocoders/tacotron2/
glow.py:62-309 and waveglow_denoiser.py:32-67). Inference only: the flows
invert with precomputed W^{-1} (host-side at conversion), weight-norm is
folded into plain conv weights at conversion, and the whole sample path is
one jit (upsample -> grouped flows -> overlap of early outputs).

NTC layout; channel orderings inside the grouped representation follow the
reference exactly (channel-major (mel, group-offset) interleave) so converted
checkpoints match sample-for-sample.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class WaveGlowConfig:
    n_mel_channels: int = 80
    n_flows: int = 12
    n_group: int = 8
    n_early_every: int = 4
    n_early_size: int = 2
    # WN_config
    n_layers: int = 8
    n_channels: int = 256
    kernel_size: int = 3
    upsample_kernel: int = 1024
    upsample_stride: int = 256

    def flow_channels(self) -> List[int]:
        """Remaining audio channels entering each flow (glow.py:196-205)."""
        out, rem = [], self.n_group
        for k in range(self.n_flows):
            if k % self.n_early_every == 0 and k > 0:
                rem -= self.n_early_size
            out.append(rem)
        return out


def waveglow_test_config(**kw) -> WaveGlowConfig:
    base = dict(n_mel_channels=8, n_flows=5, n_group=8, n_early_every=2,
                n_early_size=2, n_layers=2, n_channels=16, kernel_size=3,
                upsample_kernel=32, upsample_stride=8)
    base.update(kw)
    return WaveGlowConfig(**base)


def _conv1d(kernel, bias, x, padding: int = 0, dilation: int = 1):
    y = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1,), padding=[(padding, padding)],
        rhs_dilation=(dilation,), dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return y if bias is None else y + bias


def _wn_forward(p: Dict, cfg: WaveGlowConfig, audio_half, spect_cond):
    """WaveNet-like conditioner (glow.py:105-175). audio_half (B, T, n_half);
    spect_cond: precomputed cond_layer output (B, T, 2*n_channels*n_layers).
    Returns (B, T, 2*n_half) = [b, log_s] on channels."""
    nc = cfg.n_channels
    audio = _conv1d(p["start"]["kernel"], p["start"]["bias"], audio_half)
    output = jnp.zeros_like(audio)
    for i in range(cfg.n_layers):
        dilation = 2 ** i
        pad = (cfg.kernel_size * dilation - dilation) // 2
        li = p[f"in_layer{i}"]
        acts = _conv1d(li["kernel"], li["bias"], audio, pad, dilation)
        acts = acts + spect_cond[..., i * 2 * nc : (i + 1) * 2 * nc]
        acts = jnp.tanh(acts[..., :nc]) * jax.nn.sigmoid(acts[..., nc:])
        rs = p[f"res_skip{i}"]
        res_skip = _conv1d(rs["kernel"], rs["bias"], acts)
        if i < cfg.n_layers - 1:
            audio = audio + res_skip[..., :nc]
            output = output + res_skip[..., nc:]
        else:
            output = output + res_skip
    return _conv1d(p["end"]["kernel"], p["end"]["bias"], output)


def _upsample_mel(p: Dict, cfg: WaveGlowConfig, spect):
    """ConvTranspose1d(mel, mel, K, stride) + conv-artifact trim
    (glow.py:251-258), then group into (B, T', n_group * n_mel) with the
    reference's channel-major (mel, offset) ordering."""
    y = jax.lax.conv_transpose(
        spect, p["upsample"]["kernel"],
        strides=(cfg.upsample_stride,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
    ) + p["upsample"]["bias"]
    cutoff = cfg.upsample_kernel - cfg.upsample_stride
    y = y[:, : y.shape[1] - cutoff]
    b, t, n_mel = y.shape
    g = cfg.n_group
    y = y[:, : (t // g) * g]
    y = y.reshape(b, t // g, g, n_mel)            # (B, T', j, mel)
    y = jnp.swapaxes(y, 2, 3).reshape(b, t // g, n_mel * g)  # (mel, j) major
    return y


def waveglow_infer(params: Dict, cfg: WaveGlowConfig, spect,
                   sigma: float = 1.0, rng=None,
                   noise: Optional[List] = None):
    """spect (B, T, n_mel) -> audio (B, samples). glow.py:251-299.

    Noise comes either from `rng` (a JAX key) or an explicit `noise` list
    [z_init (B, T', n_remaining), z_early_1, ...] ordered as drawn by the
    reference (initial draw first, then one per early-output flow in
    REVERSED flow order) — the explicit form lets tests inject torch draws.
    """
    spect_g = _upsample_mel(params, cfg, spect)
    b, t_g, _ = spect_g.shape
    # each WN owns a cond_layer applied to the same grouped spect
    # (glow.py:159); precompute all of them once outside the flow loop
    conds = {
        k: _conv1d(params[f"wn{k}"]["cond"]["kernel"],
                   params[f"wn{k}"]["cond"]["bias"], spect_g)
        for k in range(cfg.n_flows)
    }

    chans = cfg.flow_channels()
    n_remaining = chans[-1]
    early_ks = [k for k in range(cfg.n_flows)
                if k % cfg.n_early_every == 0 and k > 0]

    if noise is None:
        if rng is None:
            rng = jax.random.PRNGKey(0)
        keys = jax.random.split(rng, 1 + len(early_ks))
        noise = [jax.random.normal(keys[0], (b, t_g, n_remaining))]
        noise += [
            jax.random.normal(keys[1 + i], (b, t_g, cfg.n_early_size))
            for i in range(len(early_ks))
        ]
    audio = sigma * noise[0]
    early_i = 0

    for k in reversed(range(cfg.n_flows)):
        n_half = chans[k] // 2
        audio_0 = audio[..., :n_half]
        audio_1 = audio[..., n_half:]
        out = _wn_forward(params[f"wn{k}"], cfg, audio_0, conds[k])
        bshift = out[..., :n_half]
        s = out[..., n_half:]
        audio_1 = (audio_1 - bshift) / jnp.exp(s)
        audio = jnp.concatenate([audio_0, audio_1], axis=-1)
        w_inv = params[f"convinv{k}"]["w_inverse"]  # (C, C)
        audio = jnp.einsum("btc,cd->btd", audio, w_inv.T,
                           preferred_element_type=jnp.float32)
        if k in early_ks:
            early_i += 1
            z = noise[early_i]
            audio = jnp.concatenate([sigma * z, audio], axis=-1)

    return audio.reshape(b, -1)  # (B, T', n_group) row-major == sample order


# ---------------------------------------------------------------------------
# denoiser (waveglow_denoiser.py): STFT-domain bias removal


def _hann(win_length: int, n_fft: int):
    w = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(win_length) / win_length)
    pad = (n_fft - win_length) // 2
    return np.pad(w, (pad, n_fft - win_length - pad))


def stft_transform(audio, n_fft: int = 1024, hop: int = 256,
                   win_length: int = 1024):
    """(B, samples) -> (magnitude, phase) each (B, bins, frames) — the
    reference's conv-with-Fourier-basis STFT (stft.py:77-105: reflect pad
    n_fft//2, windowed frames, no extra centering)."""
    win = jnp.asarray(_hann(win_length, n_fft), jnp.float32)
    pad = n_fft // 2
    x = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + (x.shape[1] - n_fft) // hop
    idx = jnp.arange(n_fft)[None, :] + hop * jnp.arange(n_frames)[:, None]
    frames = x[:, idx] * win  # (B, F, n_fft)
    spec = jnp.fft.rfft(frames, axis=-1)  # (B, F, bins)
    mag = jnp.abs(spec)
    phase = jnp.arctan2(spec.imag, spec.real)
    return jnp.swapaxes(mag, 1, 2), jnp.swapaxes(phase, 1, 2)


def stft_inverse(magnitude, phase, n_fft: int = 1024, hop: int = 256,
                 win_length: int = 1024):
    """Overlap-add inverse with window-sumsquare normalization
    (stft.py:107-136)."""
    win = jnp.asarray(_hann(win_length, n_fft), jnp.float32)
    spec = magnitude * jnp.exp(1j * phase)  # (B, bins, F)
    # pinv(scale * [Re; Im] DFT rows) applied to the coefficients equals
    # irfft(spec) / scale; the reference then windows, overlap-adds,
    # normalizes by the window sum-square and multiplies back by scale —
    # the two scale factors cancel, leaving windowed-OLA / sum(win^2)
    frames = jnp.fft.irfft(jnp.swapaxes(spec, 1, 2), n=n_fft, axis=-1) * win
    b, n_frames, _ = frames.shape
    out_len = n_fft + hop * (n_frames - 1)

    idx = jnp.arange(n_fft)[None, :] + hop * jnp.arange(n_frames)[:, None]
    audio = jnp.zeros((b, out_len), jnp.float32)
    audio = audio.at[:, idx.reshape(-1)].add(
        frames.reshape(b, -1), indices_are_sorted=False,
    )
    wss = jnp.zeros((out_len,), jnp.float32)
    wss = wss.at[idx.reshape(-1)].add(
        jnp.tile(win ** 2, (n_frames,)), indices_are_sorted=False)
    audio = jnp.where(wss > 1e-11, audio / jnp.maximum(wss, 1e-11), audio)
    pad = n_fft // 2
    return audio[:, pad:-pad]


class WaveGlowDenoiser:
    """Subtract the model's sigma=0 bias spectrum (waveglow_denoiser.py:
    32-67). Construct AFTER conversion: runs one sigma=0 infer."""

    def __init__(self, params: Dict, cfg: WaveGlowConfig,
                 n_fft: int = 1024, hop: Optional[int] = None,
                 win_length: int = 1024, bias_frames: int = 88):
        hop = hop or n_fft // 4
        self.n_fft, self.hop, self.win_length = n_fft, hop, win_length
        mel = jnp.zeros((1, bias_frames, cfg.n_mel_channels), jnp.float32)
        bias_audio = waveglow_infer(params, cfg, mel, sigma=0.0)
        bias_spec, _ = stft_transform(bias_audio, n_fft, hop, win_length)
        self.bias_spec = bias_spec[:, :, :1]  # (1, bins, 1)

    def __call__(self, audio, strength: float = 0.1):
        mag, phase = stft_transform(audio, self.n_fft, self.hop,
                                    self.win_length)
        mag = jnp.clip(mag - self.bias_spec * strength, 0.0, None)
        return stft_inverse(mag, phase, self.n_fft, self.hop, self.win_length)


# ---------------------------------------------------------------------------
# torch checkpoint conversion


def _t(a) -> np.ndarray:
    return np.asarray(a, np.float32)


def _fold_wn_conv(sd, prefix) -> Tuple[np.ndarray, np.ndarray]:
    """weight-norm'd torch Conv1d -> plain (K, Cin, Cout) kernel + bias.
    w = g * v / ||v|| over (Cin, K) per out-channel (glow.py:122-151)."""
    if f"{prefix}.weight_g" in sd:
        g = _t(sd[f"{prefix}.weight_g"])  # (Cout, 1, 1)
        v = _t(sd[f"{prefix}.weight_v"])  # (Cout, Cin, K)
        norm = np.sqrt((v ** 2).sum(axis=(1, 2), keepdims=True))
        w = g * v / np.maximum(norm, 1e-12)
    else:
        w = _t(sd[f"{prefix}.weight"])
    return w.transpose(2, 1, 0), _t(sd[f"{prefix}.bias"])


def random_waveglow_params(cfg: WaveGlowConfig, seed: int = 0,
                           scale: float = 0.1) -> Dict:
    """Random param tree with the exact structure/shapes `convert_waveglow`
    produces — torch-free initialization for demos and shape tests
    (examples/resynthesis.py)."""
    rng = np.random.default_rng(seed)

    def w(*shape):
        return (scale * rng.standard_normal(shape)).astype(np.float32)

    def conv(k, cin, cout):
        return {"kernel": w(k, cin, cout), "bias": w(cout)}

    p: Dict[str, Any] = {
        "upsample": conv(cfg.upsample_kernel, cfg.n_mel_channels,
                         cfg.n_mel_channels),
    }
    nc = cfg.n_channels
    cond_in = cfg.n_mel_channels * cfg.n_group
    for k, c_k in enumerate(cfg.flow_channels()):
        n_half = c_k // 2
        # any square matrix works as the precomputed inverse 1x1 weight
        p[f"convinv{k}"] = {
            "w_inverse": (np.eye(c_k) + w(c_k, c_k)).astype(np.float32)
        }
        wn: Dict[str, Any] = {
            "start": conv(1, n_half, nc),
            "end": conv(1, nc, 2 * n_half),
            "cond": conv(1, cond_in, 2 * nc * cfg.n_layers),
        }
        for i in range(cfg.n_layers):
            wn[f"in_layer{i}"] = conv(cfg.kernel_size, nc, 2 * nc)
            out_c = 2 * nc if i < cfg.n_layers - 1 else nc
            wn[f"res_skip{i}"] = conv(1, nc, out_c)
        p[f"wn{k}"] = wn
    return p


def convert_waveglow(sd: Dict[str, np.ndarray], cfg: WaveGlowConfig) -> Dict:
    """torch WaveGlow state dict -> our inference param tree: weight norm
    folded, inverse 1x1 weights precomputed, upsample kernel moved to the
    flax ConvTranspose layout (spatially flipped (K, Cin, Cout);
    CLAUDE.md conversion rule)."""
    p: Dict[str, Any] = {}
    up_w = _t(sd["upsample.weight"])  # torch convT (Cin, Cout, K)
    p["upsample"] = {
        "kernel": up_w.transpose(2, 0, 1)[::-1].copy(),
        "bias": _t(sd["upsample.bias"]),
    }
    # the reference stores ONE cond_layer per WN; all receive the same spect
    for k in range(cfg.n_flows):
        w = _t(sd[f"convinv.{k}.conv.weight"])[:, :, 0]  # (C, C)
        p[f"convinv{k}"] = {"w_inverse": np.linalg.inv(w).astype(np.float32)}
        wn: Dict[str, Any] = {}
        kker, kb = _fold_wn_conv(sd, f"WN.{k}.start")
        wn["start"] = {"kernel": kker, "bias": kb}
        eker = _t(sd[f"WN.{k}.end.weight"]).transpose(2, 1, 0)
        wn["end"] = {"kernel": eker, "bias": _t(sd[f"WN.{k}.end.bias"])}
        for i in range(cfg.n_layers):
            kker, kb = _fold_wn_conv(sd, f"WN.{k}.in_layers.{i}")
            wn[f"in_layer{i}"] = {"kernel": kker, "bias": kb}
            kker, kb = _fold_wn_conv(sd, f"WN.{k}.res_skip_layers.{i}")
            wn[f"res_skip{i}"] = {"kernel": kker, "bias": kb}
        p[f"wn{k}"] = wn
    # cond layers: glow.py gives each WN its own cond_layer over the SAME
    # grouped spect; they differ per flow, so keep them per-WN but expose the
    # first at top level for the shared precompute path
    for k in range(cfg.n_flows):
        kker, kb = _fold_wn_conv(sd, f"WN.{k}.cond_layer")
        p[f"wn{k}"]["cond"] = {"kernel": kker, "bias": kb}
    return p
