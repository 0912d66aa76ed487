"""F0 extraction / normalization / quantization (textlesslib F0-pipeline
capability, reference f0_preprocess.py)."""

import numpy as np

from unitspeech_tpu.ops.f0 import (
    extract_f0,
    mean_normalize_f0,
    quantize_f0,
    std_normalize_f0,
    trailing_silence_mask,
)


def test_extract_f0_on_pure_tone():
    sr = 16000
    t = np.arange(sr) / sr
    wav = (0.4 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32)
    f0 = np.asarray(extract_f0(wav, sr=sr))
    voiced = f0[f0 > 0]
    assert len(voiced) > 0.9 * len(f0)
    assert abs(np.median(voiced) - 220.0) < 5.0


def test_extract_f0_silence_is_unvoiced():
    f0 = np.asarray(extract_f0(np.zeros(16000, np.float32)))
    assert (f0 == 0).all()


def test_extract_f0_tone_then_silence():
    sr = 16000
    t = np.arange(sr // 2) / sr
    wav = np.concatenate([
        (0.4 * np.sin(2 * np.pi * 150.0 * t)).astype(np.float32),
        np.zeros(sr // 2, np.float32),
    ])
    f0 = np.asarray(extract_f0(wav, sr=sr))
    mask = trailing_silence_mask(f0)
    assert mask[-1] and not mask[0]
    # roughly the second half is trailing silence
    assert 0.3 < mask.mean() < 0.7


def test_normalizers_and_quantizer():
    f0 = np.array([0.0, 100.0, 200.0, 300.0, 0.0])
    mn = mean_normalize_f0(f0)
    assert mn[0] == 0 and abs(mn[1:4].mean() - 1.0) < 1e-6
    sn = std_normalize_f0(f0)
    assert abs(sn[1:4].mean()) < 1e-6
    q = quantize_f0(mn, n_bins=16)
    assert q[0] == 0 and (q[1:4] >= 1).all() and (q <= 16).all()
