"""Mel frontend golden parity vs torch.stft + librosa-equivalent filterbank
(reference /root/reference/unitspeech/vocoder/meldataset.py:51-74).

torch (CPU) is available in the test environment, so the golden is computed
with the exact reference formula inline."""

import numpy as np
import pytest

from unitspeech_tpu.ops.mel import (
    denormalize_mel,
    hann_window,
    mel_filterbank,
    mel_spectrogram,
    normalize_mel,
)

torch = pytest.importorskip("torch")


def _torch_golden_mel(y_np, n_fft=1024, hop=256, win=1024, sr=22050, n_mels=80, fmin=0.0, fmax=8000.0):
    y = torch.from_numpy(y_np).float()
    pad = (n_fft - hop) // 2
    y = torch.nn.functional.pad(y.unsqueeze(1), (pad, pad), mode="reflect").squeeze(1)
    window = torch.hann_window(win)
    spec = torch.stft(
        y, n_fft, hop_length=hop, win_length=win, window=window,
        center=False, normalized=False, onesided=True, return_complex=True,
    )
    spec = torch.sqrt(torch.real(spec * spec.conj()) + 1e-9)
    fbank = torch.from_numpy(mel_filterbank(sr, n_fft, n_mels, fmin, fmax))
    mel = torch.matmul(fbank, spec)
    return torch.log(torch.clamp(mel, min=1e-5)).numpy()  # (B, n_mels, T)


def test_mel_matches_torch_stft_golden():
    rng = np.random.default_rng(0)
    y = (0.5 * rng.standard_normal((2, 22050))).astype(np.float32).clip(-1, 1)
    golden = _torch_golden_mel(y)  # (B, mels, T)
    ours = np.asarray(mel_spectrogram(y))  # (B, T, mels)
    assert ours.shape == (2, golden.shape[2], 80)
    # compare in linear space (log amplifies float32 accumulation noise)
    np.testing.assert_allclose(
        np.exp(ours.transpose(0, 2, 1)), np.exp(golden), rtol=3e-3, atol=1e-5
    )


def test_mel_frame_count():
    # L multiple of hop -> exactly L/hop frames (center=False + (n_fft-hop)/2 pad)
    y = np.zeros((1, 256 * 100), dtype=np.float32)
    m = np.asarray(mel_spectrogram(y))
    assert m.shape == (1, 100, 80)


def test_filterbank_matches_librosa_reference_values():
    """Spot-check Slaney filterbank invariants: rows are nonnegative, each row
    integrates to ~2/(band width), and coverage stops at fmax."""
    fb = mel_filterbank(22050, 1024, 80, 0.0, 8000.0)
    assert fb.shape == (80, 513)
    assert (fb >= 0).all()
    fftfreqs = np.linspace(0, 22050 / 2, 513)
    # no energy above fmax (plus one bin of triangle rolloff)
    assert fb[:, fftfreqs > 8000.0 + 22050 / 1024].sum() == 0.0
    # every filter has some support
    assert (fb.sum(axis=1) > 0).all()


def test_hann_window_is_periodic():
    w = hann_window(1024)
    tw = torch.hann_window(1024).numpy()
    np.testing.assert_allclose(w, tw, atol=1e-6)


def test_normalize_roundtrip():
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((4, 10, 80)).astype(np.float32)
    mel_min = mel.min(axis=(0, 1)) - 0.1
    mel_max = mel.max(axis=(0, 1)) + 0.1
    normed = normalize_mel(mel, mel_min, mel_max)
    assert np.abs(np.asarray(normed)).max() <= 1.0
    back = denormalize_mel(normed, mel_min, mel_max)
    np.testing.assert_allclose(np.asarray(back), mel, rtol=1e-4, atol=1e-5)
