"""DurationCalibrator unit tests (infer/calibration.py): the host-side
duration surrogate that drives calibrated speculative serving."""

import numpy as np
import pytest

from unitspeech_tpu.infer.calibration import DurationCalibrator


def test_per_token_table_and_estimate():
    cal = DurationCalibrator(n_vocab=10, min_samples=2)
    # token 1 always 2 frames, token 2 always 4 frames
    cal.observe_durations([1, 2, 1], [2.0, 4.0, 2.0])
    cal.observe_durations([2, 2], [4.0, 4.0])
    assert cal.estimate([1, 2]) == pytest.approx(6.0)
    # unseen token falls back to the global mean (16/5 = 3.2)
    assert cal.estimate([7]) == pytest.approx(3.2)
    assert cal.estimate([1, 1, 2, 7]) == pytest.approx(2 + 2 + 4 + 3.2)


def test_estimate_none_before_any_data():
    cal = DurationCalibrator(n_vocab=4)
    assert cal.estimate([1, 2]) is None
    assert cal.guess_frames([1, 2]) is None
    assert not cal.ready


def test_ready_gating_and_guess():
    cal = DurationCalibrator(n_vocab=8, min_samples=3)
    for _ in range(3):
        cal.observe_durations([1, 2], [3.0, 5.0])
        cal.observe_total([1, 2], 8.0)
    assert cal.ready
    g = cal.guess_frames([1, 2])
    # estimate 8.0, margin >= 1.0 -> guess covers the actual total
    assert g is not None and g >= 8


def test_margin_tracks_residual_quantile():
    cal = DurationCalibrator(n_vocab=8, min_samples=1, quantile=0.95)
    cal.observe_durations([1], [10.0])
    # residuals near 1.0 -> margin collapses toward ~1.02, not max_margin
    for _ in range(50):
        cal.observe_total([1], 10.0)
    assert 1.0 <= cal.margin <= 1.1
    # a few 30% overshoots push the P95 margin up
    for _ in range(50):
        cal.observe_total([1], 13.0)
    assert cal.margin >= 1.25


def test_margin_capped():
    cal = DurationCalibrator(n_vocab=8, min_samples=1, max_margin=1.5)
    cal.observe_durations([1], [1.0])
    for _ in range(10):
        cal.observe_total([1], 100.0)  # wild residuals
    assert cal.margin == 1.5


def test_save_load_roundtrip(tmp_path):
    cal = DurationCalibrator(n_vocab=6, min_samples=2)
    cal.observe_durations([1, 2, 3], [2.0, 3.0, 4.0])
    cal.observe_total([1, 2, 3], 9.0)
    cal.observe_total([1, 2, 3], 9.5)
    p = str(tmp_path / "cal.json")
    cal.save(p)
    cal2 = DurationCalibrator.load(p)
    assert cal2.estimate([1, 2, 3]) == pytest.approx(cal.estimate([1, 2, 3]))
    assert cal2.margin == pytest.approx(cal.margin)
    assert cal2.ready == cal.ready
    assert cal2.guess_frames([1, 2]) == cal.guess_frames([1, 2])
