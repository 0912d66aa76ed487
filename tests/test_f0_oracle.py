"""F0 tracker ACCURACY oracle (VERDICT r2 missing #4): the reference's
textlesslib F0 pipeline uses pYAAPT (/root/reference/unitspeech/textlesslib/
textless/data/f0_preprocess.py:16-32), which is unavailable here — so the
tracker is held to synthetic voiced-speech oracles with KNOWN time-varying
F0 contours instead: harmonic-rich glottal-like signals with glides,
vibrato, missing fundamentals (the classic octave-error trap), additive
noise down to 5 dB SNR, and voiced/unvoiced gating.

Metrics follow the pitch-tracking literature: GPE (gross pitch error — the
fraction of voiced frames off by >20%) and FPE (median fine relative error
on the correct frames)."""

import numpy as np
import pytest

import jax

from unitspeech_tpu.ops.f0 import extract_f0

SR = 16000
FRAME = 1024
HOP = int(SR * 0.005)


def synth_voiced(f0_fn, dur=1.0, harmonics=range(1, 13), snr_db=20.0,
                 seed=0, amp_fn=None):
    """Harmonic pulse train with 1/k rolloff + white noise at snr_db."""
    n = int(SR * dur)
    t = np.arange(n) / SR
    f0 = f0_fn(t)
    phase = 2 * np.pi * np.cumsum(f0) / SR
    sig = sum((1.0 / k) * np.sin(k * phase) for k in harmonics)
    sig /= np.abs(sig).max()
    if amp_fn is not None:
        sig = sig * amp_fn(t)
    rng = np.random.default_rng(seed)
    noise = rng.standard_normal(n)
    noise *= np.sqrt(
        max((sig ** 2).mean(), 1e-12) / (10 ** (snr_db / 10.0))
        / (noise ** 2).mean()
    )
    return (sig + noise).astype(np.float32), f0


def gpe_fpe(wav, f0_truth):
    est = np.asarray(extract_f0(wav, sr=SR))
    centers = (np.arange(len(est)) * HOP + FRAME // 2).clip(0, len(wav) - 1)
    truth = f0_truth[centers]
    voiced = est > 0
    assert voiced.any()
    rel = np.abs(est[voiced] - truth[voiced]) / truth[voiced]
    gpe = float((rel > 0.2).mean())
    fpe = float(np.median(rel[rel <= 0.2])) if (rel <= 0.2).any() else 1.0
    return voiced.mean(), gpe, fpe


@pytest.mark.parametrize(
    "name,f0_fn,harmonics,snr_db",
    [
        ("glide", lambda t: 120 + 60 * t / t[-1], range(1, 13), 20.0),
        ("vibrato", lambda t: 200 * (1 + 0.03 * np.sin(2 * np.pi * 5 * t)),
         range(1, 13), 20.0),
        ("low_male", lambda t: np.full_like(t, 85.0), range(1, 13), 20.0),
        ("high_female", lambda t: np.full_like(t, 350.0), range(1, 10), 20.0),
        # missing fundamental: energy only at harmonics 2..12 — a naive
        # spectral peak-picker would report 2*F0; autocorrelation must not
        ("missing_fundamental", lambda t: np.full_like(t, 160.0),
         range(2, 13), 20.0),
        ("noisy_5db", lambda t: 140 + 40 * t / t[-1], range(1, 13), 5.0),
    ],
)
def test_f0_accuracy_oracle(name, f0_fn, harmonics, snr_db):
    wav, truth = synth_voiced(f0_fn, harmonics=harmonics, snr_db=snr_db)
    voiced_frac, gpe, fpe = gpe_fpe(wav, truth)
    assert voiced_frac > 0.9, (name, voiced_frac)
    assert gpe <= 0.05, (name, gpe)   # measured 0.0 on all cases
    assert fpe <= 0.02, (name, fpe)   # measured <= 0.007


def test_f0_voicing_gating():
    """2 Hz on/off amplitude gating: the voicing decision must track the
    gate (~50% voiced), not smear voicing across silent spans."""
    wav, truth = synth_voiced(
        lambda t: np.full_like(t, 200.0),
        amp_fn=lambda t: (np.sin(2 * np.pi * 2 * t) > 0).astype(float),
    )
    est = np.asarray(extract_f0(wav, sr=SR))
    frac = float((est > 0).mean())
    assert 0.35 <= frac <= 0.7, frac
    # and the frames it does call voiced are pitched correctly
    centers = (np.arange(len(est)) * HOP + FRAME // 2).clip(0, len(wav) - 1)
    rel = np.abs(est[est > 0] - truth[centers][est > 0]) / 200.0
    assert float((rel > 0.2).mean()) <= 0.05


# ---------------------------------------------------------------------------
# Adversarial cases (VERDICT r4 item 6): jitter, creak/subharmonics, heavy
# noise, and octave traps. The tracker is the NCCF + Viterbi DP of
# ops/f0.py; these lock its accuracy envelope on signals where the previous
# argmax tracker octave-hopped or mis-voiced.
# ---------------------------------------------------------------------------


def _gpe(wav, truth, est=None):
    est = np.asarray(extract_f0(wav, sr=SR)) if est is None else est
    centers = (np.arange(len(est)) * HOP + FRAME // 2).clip(0, len(wav) - 1)
    tr = truth[centers]
    v = est > 0
    rel = np.abs(est[v] - tr[v]) / tr[v]
    return est, v, rel


def test_f0_jitter_random_walk():
    """Cycle-to-cycle jitter: F0 random-walks +-~2%/5ms around 150 Hz (creaky
    but still periodic). The DP must follow without octave hops."""
    rng = np.random.default_rng(3)
    steps = rng.normal(0, 0.02, 400)
    walk = 150.0 * np.exp(np.cumsum(steps) * 0.25).clip(0.6, 1.6)
    grid = np.linspace(0, 1, 400)

    def f0_fn(t):
        return np.interp(t / t[-1], grid, walk)

    wav, truth = synth_voiced(f0_fn, dur=2.0, snr_db=15.0, seed=4)
    _est, v, rel = _gpe(wav, truth)
    assert v.mean() > 0.9
    assert float((rel > 0.2).mean()) <= 0.05, float((rel > 0.2).mean())


def test_f0_subharmonic_creak():
    """Diplophonic creak: every other glottal cycle attenuated, creating a
    true subharmonic at F0/2. Reporting F0 or F0/2 are both defensible; the
    failure mode being locked out is rapid flip-flopping between them."""
    f0 = 140.0
    n = int(SR * 1.0)
    t = np.arange(n) / SR
    phase = 2 * np.pi * f0 * t
    sig = sum((1.0 / k) * np.sin(k * phase) for k in range(1, 13))
    # amplitude-modulate alternate cycles at F0/2
    sig = sig * (1.0 - 0.35 * (np.sin(np.pi * f0 * t) > 0))
    sig = (sig / np.abs(sig).max()).astype(np.float32)
    est = np.asarray(extract_f0(sig, sr=SR))
    v = est > 0
    assert v.mean() > 0.9
    ok = (np.abs(est[v] - f0) / f0 < 0.2) | (np.abs(est[v] - f0 / 2) / (f0 / 2) < 0.2)
    assert ok.mean() > 0.95, ok.mean()
    # no rapid alternation: few octave flips along the voiced track
    tr = est[v]
    flips = (np.abs(np.log2(tr[1:] / tr[:-1])) > 0.5).sum()
    assert flips <= 4, flips


def test_f0_zero_db_noise():
    """0 dB SNR: the envelope widens but gross errors stay bounded and the
    frames called voiced are overwhelmingly correct."""
    wav, truth = synth_voiced(
        lambda t: 120 + 60 * t / t[-1], snr_db=0.0, seed=5
    )
    _est, v, rel = _gpe(wav, truth)
    assert v.mean() > 0.9, v.mean()          # tracks even at 0 dB...
    assert float((rel > 0.2).mean()) <= 0.10  # ...but not report junk


def test_f0_octave_trap_strong_second_harmonic():
    """Energy dominated by the 2nd harmonic (3x the fundamental): a spectral
    peak-picker reports 2*F0; NCCF+DP must hold the true period."""
    f0 = 170.0
    n = int(SR * 1.0)
    t = np.arange(n) / SR
    phase = 2 * np.pi * f0 * t
    sig = 0.3 * np.sin(phase) + 1.0 * np.sin(2 * phase) + 0.2 * np.sin(3 * phase)
    sig = (sig / np.abs(sig).max()).astype(np.float32)
    est = np.asarray(extract_f0(sig, sr=SR))
    v = est > 0
    assert v.mean() > 0.9
    rel = np.abs(est[v] - f0) / f0
    assert float((rel > 0.2).mean()) <= 0.02, est[v][:10]


def test_f0_octave_trap_alternating_segments():
    """Two voiced segments an octave apart with silence between: each
    segment must settle at its own octave (no carry-over lock-in)."""
    segs = []
    for f0, dur in ((110.0, 0.4), (0.0, 0.2), (220.0, 0.4)):
        n = int(SR * dur)
        t = np.arange(n) / SR
        if f0:
            phase = 2 * np.pi * f0 * t
            s = sum((1.0 / k) * np.sin(k * phase) for k in range(1, 13))
            segs.append(s / np.abs(s).max())
        else:
            segs.append(np.zeros(n))
    wav = np.concatenate(segs).astype(np.float32)
    est = np.asarray(extract_f0(wav, sr=SR))
    n1 = len(est) * 4 // 10
    n2 = len(est) * 6 // 10
    a, b = est[: n1 - 2], est[n2 + 2:]
    a, b = a[a > 0], b[b > 0]
    assert len(a) > 10 and len(b) > 10
    assert float((np.abs(a - 110.0) / 110.0 > 0.15).mean()) <= 0.05, a[:10]
    assert float((np.abs(b - 220.0) / 220.0 > 0.15).mean()) <= 0.05, b[:10]


def test_f0_noise_only_stays_unvoiced():
    """Pure noise must not be voiced (precision lock for the _UV_COST
    calibration that keeps 0 dB speech tracking)."""
    rng = np.random.default_rng(9)
    wav = (rng.standard_normal(SR) * 0.3).astype(np.float32)
    est = np.asarray(extract_f0(wav, sr=SR))
    assert float((est > 0).mean()) <= 0.05, (est > 0).mean()
