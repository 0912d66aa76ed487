"""F0 (pitch) extraction, normalization, and quantization.

Capability-parity with textlesslib's F0 pipeline
(/root/reference/unitspeech/textlesslib/textless/data/f0_preprocess.py:
16-123): the reference shells into pYAAPT; here F0 comes from a vectorized
normalized-autocorrelation tracker (YIN-flavored) that runs as framed
jnp ops, plus the same per-speaker normalizers and a uniform quantizer.
Includes trailing_silence_mask parity (f0_preprocess.py:127-131).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

F0_FRAME_SPACE = 0.005  # seconds per F0 frame (textlesslib default)


@partial(jax.jit, static_argnames=("sr", "frame_length", "hop", "fmin", "fmax"))
def extract_f0(
    wav,
    sr: int = 16000,
    frame_length: int = 1024,
    hop: Optional[int] = None,
    fmin: float = 60.0,
    fmax: float = 400.0,
):
    """(samples,) -> (frames,) F0 in Hz; 0 where unvoiced.

    Normalized autocorrelation peak within [sr/fmax, sr/fmin] lags; voicing
    decision by peak clarity + energy.
    """
    hop = hop or int(sr * F0_FRAME_SPACE)
    n = wav.shape[0]
    n_frames = max(1 + (n - frame_length) // hop, 1)
    idx = (
        jnp.arange(frame_length)[None, :]
        + hop * jnp.arange(n_frames)[:, None]
    )
    frames = wav[jnp.clip(idx, 0, n - 1)]
    frames = frames - frames.mean(axis=1, keepdims=True)

    # autocorrelation via rFFT (power spectrum)
    nfft = 2 * frame_length
    spec = jnp.fft.rfft(frames, n=nfft, axis=1)
    ac = jnp.fft.irfft(jnp.abs(spec) ** 2, n=nfft, axis=1)[:, :frame_length]
    ac0 = jnp.maximum(ac[:, :1], 1e-8)
    nac = ac / ac0

    lag_min = int(sr / fmax)
    lag_max = min(int(sr / fmin), frame_length - 1)
    lags = jnp.arange(lag_min, lag_max)
    window = nac[:, lag_min:lag_max]
    best = jnp.argmax(window, axis=1)
    peak = jnp.take_along_axis(window, best[:, None], axis=1)[:, 0]
    f0 = sr / lags[best].astype(jnp.float32)

    energy = jnp.sqrt((frames ** 2).mean(axis=1))
    voiced = (peak > 0.5) & (energy > 1e-3)
    return jnp.where(voiced, f0, 0.0)


def mean_normalize_f0(f0: np.ndarray) -> np.ndarray:
    """Divide voiced frames by the speaker's voiced mean
    (f0_preprocess.py PromptNormalizer-style)."""
    voiced = f0 > 0
    if not voiced.any():
        return f0
    mean = f0[voiced].mean()
    out = f0.copy()
    out[voiced] = f0[voiced] / max(mean, 1e-8)
    return out


def std_normalize_f0(f0: np.ndarray) -> np.ndarray:
    """Z-score voiced frames (per-utterance)."""
    voiced = f0 > 0
    if not voiced.any():
        return f0
    mean, std = f0[voiced].mean(), f0[voiced].std()
    out = f0.copy()
    out[voiced] = (f0[voiced] - mean) / max(std, 1e-8)
    return out


def quantize_f0(f0: np.ndarray, n_bins: int = 32, f_lo: float = 0.0,
                f_hi: float = 2.0) -> np.ndarray:
    """Uniform bin quantization of (normalized) F0; bin 0 reserved for
    unvoiced (F0NormalizerQuantizer-style)."""
    voiced = f0 > 0
    bins = np.clip(
        ((f0 - f_lo) / max(f_hi - f_lo, 1e-8) * (n_bins - 1)).astype(np.int64) + 1,
        1, n_bins,
    )
    return np.where(voiced, bins, 0)


def trailing_silence_mask(f0: np.ndarray) -> np.ndarray:
    """True for the trailing run of unvoiced frames
    (reference f0_preprocess.py:127-131)."""
    mask = np.zeros(len(f0), bool)
    for i in range(len(f0) - 1, -1, -1):
        if f0[i] > 0:
            break
        mask[i] = True
    return mask


def align_f0_to_durations(f0: np.ndarray, durations: np.ndarray,
                          f0_code_ratio: float, tol: float = 1.0) -> np.ndarray:
    """Pool the frame-rate F0 track into one value per unit: each unit's
    segment of `dur * f0_code_ratio` F0 frames is averaged over its VOICED
    frames (0 if none). Behavior-parity with the reference
    (f0_preprocess.py:35-62), including truncate/extend to the target length
    within `tol` frames."""
    f0 = np.asarray(f0, np.float32)
    durations = np.asarray(durations)
    code_len = int(durations.sum())
    targ_len = int(f0_code_ratio * code_len)
    diff = len(f0) - targ_len
    if abs(diff) > tol:
        raise ValueError(
            f"Cannot subsample F0: |{len(f0)} - {f0_code_ratio}*{code_len}| > {tol}"
        )
    if diff > 0:
        f0 = f0[:targ_len]
    elif diff < 0:
        f0 = np.concatenate([f0, np.full(-diff, f0[-1] if len(f0) else 0.0,
                                         np.float32)])
    offset = 0.0
    out = np.zeros(len(durations), np.float32)
    for i, dur in enumerate(durations):
        seg_len = float(dur) * f0_code_ratio
        seg = f0[int(offset) : int(offset + seg_len)]
        seg = seg[seg != 0]
        out[i] = seg.mean() if len(seg) else 0.0
        offset += seg_len
    return out


class SpeakerMeanNormalize:
    """Per-speaker (log-)F0 centering/scaling from a stats table
    {speaker: {"f0_mean", "f0_std", "logf0_mean", "logf0_std"}} — reference
    f0_preprocess.py:65-93 (which torch.loads the table; any mapping works
    here)."""

    def __init__(self, stats, center: bool = True, scale: bool = False,
                 log: bool = True):
        self.stats = stats
        self.center = center
        self.scale = scale
        self.log = log

    def __call__(self, f0: np.ndarray, speaker) -> np.ndarray:
        f0 = np.array(f0, np.float32)
        mask = f0 != 0.0
        if self.log:
            f0[mask] = np.log(f0[mask])
        key = "logf0" if self.log else "f0"
        if self.center:
            f0[mask] -= float(self.stats[speaker][f"{key}_mean"])
        if self.scale:
            f0[mask] /= float(self.stats[speaker][f"{key}_std"])
        return f0


class PromptNormalize:
    """Per-utterance (log-)F0 centering/scaling over voiced frames
    (reference f0_preprocess.py:96-113)."""

    def __init__(self, center: bool = True, scale: bool = False,
                 log: bool = True):
        self.center = center
        self.scale = scale
        self.log = log

    def __call__(self, f0: np.ndarray, _speaker=None) -> np.ndarray:
        f0 = np.array(f0, np.float32)
        mask = f0 != 0.0
        if self.log:
            f0[mask] = np.log(f0[mask])
        if mask.any():
            if self.center:
                f0[mask] -= f0[mask].mean()
            if self.scale:
                f0[mask] /= max(f0[mask].std(), 1e-8)
        return f0


class F0BinQuantizer:
    """Bin index per F0 value from precomputed bin edges (reference
    f0_preprocess.py:116-122)."""

    def __init__(self, bins: np.ndarray):
        self.bins = np.asarray(bins, np.float32).reshape(-1)

    def __call__(self, f0: np.ndarray) -> np.ndarray:
        return (np.asarray(f0, np.float32).reshape(-1, 1)
                > self.bins.reshape(1, -1)).sum(axis=1).astype(np.int64)
