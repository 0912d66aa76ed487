"""Evaluation harness metrics (reference evaluation/ pipeline)."""

import numpy as np

from unitspeech_tpu.eval.harness import (
    EvalTimings,
    cer,
    mel_cepstral_distortion,
    mel_l1,
    rtf_summary,
    speaker_cosine_similarity,
    wer,
)


def test_rtf_statistics(tmp_path):
    t = EvalTimings(np.array([1.0, 2.0]), np.array([4.0, 4.0]))
    assert abs(t.rtf - 3.0 / 8.0) < 1e-9
    assert abs(t.rtf_mean_of_ratios - 1.5 / 4.0) < 1e-9
    p = str(tmp_path / "t.npz")
    t.save(p)
    t2 = EvalTimings.load(p)
    np.testing.assert_array_equal(t2.processing_time, t.processing_time)
    s = rtf_summary(t2)
    assert s["n"] == 2


def test_mel_metrics():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((50, 80)).astype(np.float32)
    assert mel_l1(a, a) == 0.0
    assert mel_cepstral_distortion(a, a) == 0.0
    b = a + 0.1
    assert mel_l1(a, b) > 0.05
    # different lengths: metric over the overlap
    assert mel_l1(a, b[:30]) > 0.05


def test_speaker_similarity():
    v = np.array([1.0, 0.0, 0.0])
    assert abs(speaker_cosine_similarity(v, v) - 1.0) < 1e-9
    assert abs(speaker_cosine_similarity(v, np.array([0.0, 1.0, 0.0]))) < 1e-9


def test_wer_cer():
    assert wer("the cat sat", "the cat sat") == 0.0
    assert abs(wer("the cat sat", "the bat sat") - 1 / 3) < 1e-9
    assert wer("a b", "a b c") == 0.5
    assert cer("abc", "abc") == 0.0
    assert cer("abc", "abd") > 0.0
