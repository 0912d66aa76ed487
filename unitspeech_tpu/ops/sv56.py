"""ITU-T P.56 active speech level measurement + sv56-style gain normalization.

Native replacement for the reference's subprocess call into the compiled
`sv56demo` binary from the ITU-T G.191 STL (/root/reference/sv56.py:39-92,
sv56_inplace.py:38-96, invoked after synthesis at inference.py:153-158).

Algorithm (P.56 "active speech level", method B):
  1. envelope q = second-order cascade of one-pole smoothers of |x|
     (time constant 0.03 s)
  2. for 15 binary thresholds c_j = 2^(j-15), count samples where the
     envelope exceeds c_j, with a 0.2 s hangover
  3. active level A_j = 10 log10(sum x^2 / a_j); find where A_j - 20 log10(c_j)
     crosses the 15.9 dB margin, interpolating between adjacent thresholds
  4. gain = 10^((target_dBov - active_dBov) / 20)

Everything is vectorized numpy (the two IIRs via scipy.signal.lfilter, the
hangover via a cumulative-maximum trick) — no per-sample Python loop and no
subprocess. Host-side by design: it runs once per written wav file.
"""

from __future__ import annotations

import numpy as np
from scipy.signal import lfilter

MARGIN_DB = 15.9
TIME_CONSTANT_S = 0.03
HANGOVER_S = 0.2
N_THRESHOLDS = 15


def _activity_counts(x: np.ndarray, sr: int):
    """Returns (sum_sq, counts (15,), thresholds (15,))."""
    g = np.exp(-1.0 / (sr * TIME_CONSTANT_S))
    # two cascaded one-pole smoothers: y = (1-g)/ (1 - g z^-1) applied twice
    p = lfilter([1.0 - g], [1.0, -g], np.abs(x))
    q = lfilter([1.0 - g], [1.0, -g], p)

    hangover = int(np.ceil(HANGOVER_S * sr))
    thresholds = 2.0 ** (np.arange(1, N_THRESHOLDS + 1) - 15.0)  # 2^-14 .. 2^0

    t_idx = np.arange(len(x))
    counts = np.zeros(N_THRESHOLDS, np.int64)
    for j, c in enumerate(thresholds):
        exceed = q >= c
        if not exceed.any():
            continue
        # last index where the envelope exceeded c, as of each t
        last = np.maximum.accumulate(np.where(exceed, t_idx, -hangover - 1))
        counts[j] = int((t_idx - last <= hangover).sum())
    return float(np.sum(x.astype(np.float64) ** 2)), counts, thresholds


def active_speech_level(x: np.ndarray, sr: int):
    """Returns (active_level_dBov, activity_factor). x: float waveform in
    [-1, 1]; 0 dBov == the energy of a full-scale (+-1) square wave."""
    sq, counts, thresholds = _activity_counts(np.asarray(x, np.float64), sr)
    n = len(x)
    if n == 0 or sq <= 0:
        return -100.0, 0.0
    long_term = 10.0 * np.log10(sq / n + 1e-20)

    a_db = np.full(N_THRESHOLDS, -100.0)
    mask = counts > 0
    a_db[mask] = 10.0 * np.log10(sq / counts[mask] + 1e-20)
    c_db = 20.0 * np.log10(thresholds)
    delta = a_db - c_db  # decreasing in j while counts saturate

    # find the crossing of delta with MARGIN_DB (P.56 interpolation)
    active = long_term
    activity = 1.0
    for j in range(N_THRESHOLDS - 1, -1, -1):
        if counts[j] == 0:
            continue
        if delta[j] >= MARGIN_DB:
            # crossing between j and j+1 (or exactly at j)
            if j == N_THRESHOLDS - 1 or counts[j + 1] == 0:
                active = a_db[j]
            else:
                # linear interpolation on the threshold (dB) axis
                d1, d2 = delta[j], delta[j + 1]
                if abs(d1 - d2) < 1e-9:
                    active = a_db[j]
                else:
                    w = (d1 - MARGIN_DB) / (d1 - d2)
                    active = a_db[j] + w * (a_db[j + 1] - a_db[j])
            activity = 10.0 ** ((long_term - active) / 10.0)
            break
    return float(active), float(activity)


def sv56_gain(x: np.ndarray, sr: int, target_dbov: float = -26.0) -> float:
    """Scalar gain that brings the active speech level to `target_dbov`."""
    level, _ = active_speech_level(x, sr)
    return float(10.0 ** ((target_dbov - level) / 20.0))


def normalize(x: np.ndarray, sr: int, target_dbov: float = -26.0) -> np.ndarray:
    """Apply sv56 gain; clips to [-1, 1] like 16-bit staging in the STL tool."""
    g = sv56_gain(x, sr, target_dbov)
    return np.clip(np.asarray(x, np.float64) * g, -1.0, 1.0).astype(np.float32)
