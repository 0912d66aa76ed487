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


def test_evaluate_mos_and_summary():
    from unitspeech_tpu.eval.harness import evaluate_mos, evaluation_summary

    wavs = [(np.zeros(100, np.float32), 10), (np.zeros(200, np.float32), 10)]
    out = evaluate_mos(wavs, lambda w, sr: 2.0 + len(w) / 100.0)
    assert out == {"mos_mean": 3.5, "mos_min": 3.0, "mos_max": 4.0}

    row = evaluation_summary(
        timings=EvalTimings(np.array([1.0]), np.array([2.0])),
        mos_wavs=wavs, predict_mos=lambda w, sr: 3.0,
        embedding_pairs=[(np.array([1.0, 0.0]), np.array([1.0, 0.0]))],
    )
    assert abs(row["rtf"] - 0.5) < 1e-9
    assert row["mos_mean"] == 3.0
    assert abs(row["spk_cosine_mean"] - 1.0) < 1e-9
    # absent hooks -> absent columns
    assert "wer" not in row


def test_evaluate_cli_with_stub_hooks(tmp_path, capsys):
    """e2e: samples dir + timings + filelist -> `evaluate` subcommand with
    stub ASR/MOS/speaker hooks -> notebook-style summary CSV (closes PARITY
    component #29)."""
    import csv
    import json

    from unitspeech_tpu.cli import main
    from unitspeech_tpu.data.dataset import write_wav
    from unitspeech_tpu.eval.harness import EvalTimings

    sr = 8000
    d = tmp_path / "samples"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i, n in enumerate((4000, 6001)):
        write_wav(str(d / f"sample_{i:04d}.wav"),
                  rng.normal(size=n).astype(np.float32) * 0.1, sr)
    EvalTimings(np.array([0.5, 0.25]), np.array([0.5, 0.75])).save(
        str(d / "timings.npz"))
    ref = tmp_path / "ref.wav"
    write_wav(str(ref), rng.normal(size=5000).astype(np.float32) * 0.1, sr)
    fl = tmp_path / "eval.txt"
    fl.write_text("a.wav|hello world|0\nb.wav|hello world|0\n")

    rc = main([
        "evaluate", "--samples-dir", str(d), "--filelist", str(fl),
        "--reference-wav", str(ref),
        "--asr-hook", "tests._eval_hooks:transcribe",
        "--mos-hook", "tests._eval_hooks:predict_mos",
        "--spk-hook", "tests._eval_hooks:embed",
    ])
    assert rc == 0
    row = json.loads(capsys.readouterr().out.splitlines()[0])
    assert abs(row["rtf"] - 0.75 / 1.25) < 1e-9
    assert row["n_samples"] == 2
    assert row["wer"] == 0.25  # one perfect, one 1-of-2-words substitution
    assert 3.0 < row["mos_mean"] < 4.0
    assert -1.0 <= row["spk_cosine_min"] <= 1.0

    with open(d / "summary.csv") as f:
        rows = list(csv.reader(f))
    assert rows[0][: len(rows[0])] == list(row.keys())
    assert len(rows) == 2


def test_unit_error_rate_matches_word_dp_oracle():
    """uer's vectorized Levenshtein must equal the word-level DP in `wer`
    (the oracle) on random sequences, and satisfy the basic identities."""
    from unitspeech_tpu.eval.harness import unit_error_rate, wer

    rng = np.random.default_rng(0)
    for _ in range(20):
        ref = rng.integers(0, 5, rng.integers(1, 30))
        hyp = rng.integers(0, 5, rng.integers(0, 30))
        oracle = wer(" ".join(map(str, ref)), " ".join(map(str, hyp)))
        got = unit_error_rate(ref, hyp, dedup=False)
        assert abs(got - oracle) < 1e-12, (ref, hyp)
    # identities
    assert unit_error_rate([1, 2, 3], [1, 2, 3]) == 0.0
    assert unit_error_rate([1, 2, 3, 4], [1, 9, 3, 4]) == 0.25
    # dedup: pace differences are not errors
    assert unit_error_rate([1, 1, 1, 2, 3], [1, 2, 2, 3, 3, 3]) == 0.0
    # empty reference
    assert unit_error_rate([], [1]) == 1.0
    assert unit_error_rate([], []) == 0.0


def test_unit_roundtrip_discriminates_degradation():
    """The metric must be 0 on identical audio and grow with degradation —
    the property that makes it an intelligibility proxy. Uses the in-repo
    SpeechEncoder pipeline (FakeDense-style dense model + k-means)."""
    from unitspeech_tpu.eval.harness import (
        evaluate_unit_roundtrip,
        speech_encoder_unit_hook,
    )
    from unitspeech_tpu.models.ssl.kmeans import KMeansQuantizer
    from unitspeech_tpu.models.ssl.speech_encoder import SpeechEncoder

    class Dense:
        hop = 320

        def __call__(self, wav):
            n = len(wav) // 320
            f = np.asarray(wav[: n * 320], np.float32).reshape(n, 320)
            return f.reshape(n, 4, 80).mean(axis=2)

    rng = np.random.default_rng(1)
    centers = rng.standard_normal((8, 4)).astype(np.float32) * 0.5
    enc = SpeechEncoder(Dense(), KMeansQuantizer(centers), deduplicate=True)
    hook = speech_encoder_unit_hook(enc)

    gt = (np.sin(np.arange(16000) * 0.01)
          * rng.standard_normal(16000)).astype(np.float32)
    clean = evaluate_unit_roundtrip([(gt, 16000, gt, 16000)], hook)
    assert clean["uer_mean"] == 0.0
    uers = []
    for noise in (0.05, 0.5, 5.0):
        deg = gt + noise * rng.standard_normal(16000).astype(np.float32)
        uers.append(
            evaluate_unit_roundtrip([(deg, 16000, gt, 16000)], hook)["uer_mean"]
        )
    assert uers[0] < uers[-1], uers
    assert uers[-1] > 0.3
    # resampling path: 8 kHz degraded input goes through maybe_resample
    deg8 = (gt + 0.5 * rng.standard_normal(16000).astype(np.float32))[::2]
    r = evaluate_unit_roundtrip([(deg8, 8000, gt, 16000)], hook)
    assert 0.0 <= r["uer_mean"] <= 2.0


def test_evaluate_cli_unit_roundtrip(tmp_path, capsys):
    """`evaluate --unit-hook --uer-ref-dir`: uer_* lands in the summary row
    and CSV (VERDICT r4 item 5 wiring)."""
    import csv
    import json

    from unitspeech_tpu.cli import main
    from unitspeech_tpu.data.dataset import write_wav

    sr = 8000
    d = tmp_path / "samples"
    ref = tmp_path / "refs"
    d.mkdir()
    ref.mkdir()
    rng = np.random.default_rng(2)
    for i in range(2):
        gt = rng.normal(size=4000).astype(np.float32) * 0.1
        # sample 0 perfect, sample 1 degraded
        syn = gt if i == 0 else (gt + 0.3 * rng.normal(size=4000)).astype(np.float32)
        write_wav(str(d / f"sample_{i:04d}.wav"), syn, sr)
        write_wav(str(ref / f"ref_{i:04d}.wav"), gt, sr)

    rc = main([
        "evaluate", "--samples-dir", str(d), "--uer-ref-dir", str(ref),
        "--unit-hook", "tests._eval_hooks:units",
    ])
    assert rc == 0
    row = json.loads(capsys.readouterr().out.splitlines()[0])
    assert "uer_mean" in row and "uer_median" in row
    assert 0.0 <= row["uer_mean"] <= 2.0
    assert row["uer_max"] > 0.0  # the degraded sample must register errors
    with open(d / "summary.csv") as f:
        header = next(csv.reader(f))
    assert "uer_mean" in header
