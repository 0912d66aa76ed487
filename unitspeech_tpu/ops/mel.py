"""On-device mel-spectrogram frontend.

TPU-native equivalent of the reference's torch/librosa mel pipeline
(/root/reference/unitspeech/vocoder/meldataset.py:51-74), matching its exact
semantics:

  1. reflect-pad the waveform by (n_fft - hop)/2 on both sides
  2. STFT with center=False, periodic Hann window (win = n_fft = 1024, hop 256)
  3. magnitude = sqrt(|spec|^2 + 1e-9)
  4. mel filterbank: librosa Slaney-scale, Slaney-normalized, 80 bands, 0-8 kHz
  5. log dynamic-range compression: log(clamp(x, min=1e-5))

The filterbank and window are host-precomputed constants (the reference caches
them per-device in module globals, meldataset.py:47-61); framing + rfft + the
mel projection all compile to one XLA program — the matmul rides the MXU.

Golden-parity tested against torch.stft in tests/test_mel.py.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np


def _hz_to_mel_slaney(f):
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3.0
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_branch = min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep
    return np.where(f >= min_log_hz, log_branch, mels)


def _mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3.0
    freqs = m * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


@lru_cache(maxsize=8)
def mel_filterbank(
    sr: int = 22050,
    n_fft: int = 1024,
    n_mels: int = 80,
    fmin: float = 0.0,
    fmax: float = 8000.0,
) -> np.ndarray:
    """(n_mels, 1 + n_fft//2) Slaney-scale, Slaney-normalized triangular
    filterbank — numerically identical to librosa.filters.mel defaults
    (htk=False, norm='slaney'), which the reference uses at meldataset.py:59."""
    fftfreqs = np.linspace(0.0, sr / 2.0, 1 + n_fft // 2)
    mel_pts = np.linspace(_hz_to_mel_slaney(fmin), _hz_to_mel_slaney(fmax), n_mels + 2)
    mel_f = _mel_to_hz_slaney(mel_pts)
    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


@lru_cache(maxsize=4)
def hann_window(win_length: int = 1024) -> np.ndarray:
    """Periodic Hann (torch.hann_window default), float32."""
    n = np.arange(win_length, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(np.float32)


def frame_signal(y, n_fft: int, hop: int):
    """(B, L) -> (B, n_frames, n_fft) overlapping frames, center=False."""
    b, length = y.shape
    n_frames = 1 + (length - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    return y[:, idx]


@partial(jax.jit, static_argnames=("n_fft", "num_mels", "sampling_rate", "hop_size", "win_size", "fmin", "fmax"))
def mel_spectrogram(
    y,
    n_fft: int = 1024,
    num_mels: int = 80,
    sampling_rate: int = 22050,
    hop_size: int = 256,
    win_size: int = 1024,
    fmin: float = 0.0,
    fmax: float = 8000.0,
):
    """(B, L) waveform in [-1, 1] -> (B, n_frames, num_mels) log-mel.

    NOTE: returns time-major (frames, mels); the reference returns
    (mels, frames) (meldataset.py:51-74).
    """
    pad = (n_fft - hop_size) // 2
    y = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
    frames = frame_signal(y, n_fft, hop_size)  # (B, T, n_fft)
    win = jnp.asarray(hann_window(win_size))
    spec = jnp.fft.rfft(frames * win[None, None, :], n=n_fft, axis=-1)
    mag = jnp.sqrt(jnp.real(spec) ** 2 + jnp.imag(spec) ** 2 + 1e-9)
    fbank = jnp.asarray(mel_filterbank(sampling_rate, n_fft, num_mels, fmin, fmax))
    # HIGHEST precision: the projection is tiny (80x513) but feeds a log, so
    # bf16 MXU accumulation would visibly perturb low-energy bands.
    mel = jnp.einsum("btf,mf->btm", mag, fbank, precision=jax.lax.Precision.HIGHEST)
    return jnp.log(jnp.clip(mel, 1e-5, None))


def mel_true_frames(n_samples: int, n_fft: int = 1024, hop: int = 256) -> int:
    """Exact mel frame count mel_spectrogram produces for an n_samples wav
    (reflect pad (n_fft-hop)/2 each side, center=False framing)."""
    pad = (n_fft - hop) // 2
    return 1 + (n_samples + 2 * pad - n_fft) // hop


def reflect_extend(wav: "np.ndarray", target_len: int) -> "np.ndarray":
    """Host-side: extend a 1-D wav to target_len samples by repeated reflect
    padding on the right. Purpose: ONE mel_spectrogram compile per frame
    bucket instead of one per reference length. The first (n_fft-hop)/2
    appended samples equal mel_spectrogram's own internal right reflect pad,
    so the first mel_true_frames(len(wav)) frames of the extended signal's
    mel are BIT-identical to the unextended mel (every true frame's window
    ends within len(wav) + (n_fft-hop)/2); frames beyond are padding and
    must be trimmed/masked by the caller
    (tests/test_train_steps.py::test_bucketed_mel_prefix_exact)."""
    wav = np.asarray(wav)
    if wav.shape[0] < 2 and wav.shape[0] < target_len:
        # reflect is undefined on <2 samples; a degenerate wav here means a
        # broken input file — fail loudly instead of spinning
        raise ValueError(
            f"reflect_extend: wav has {wav.shape[0]} sample(s), cannot "
            f"extend to {target_len}"
        )
    out = wav
    while out.shape[0] < target_len:
        # np.pad reflect requires pad < len; chunk for short signals
        chunk = min(target_len - out.shape[0], out.shape[0] - 1)
        out = np.pad(out, (0, chunk), mode="reflect")
    return out


def normalize_mel(mel, mel_min, mel_max):
    """Per-channel min-max normalization to [-1, 1].

    mel: (..., n_mels); mel_min/mel_max: (n_mels,).
    Reference: data.py:89-92."""
    return 2.0 * (mel - mel_min) / (mel_max - mel_min) - 1.0


def denormalize_mel(mel, mel_min, mel_max):
    """Inverse of normalize_mel (reference inference.py:140)."""
    return (mel + 1.0) / 2.0 * (mel_max - mel_min) + mel_min
