"""Evaluation harness: sample generation with RTF accounting + objective
metrics.

TPU-native equivalent of the reference's evaluation pipeline
(/root/reference/evaluation/evaluation_generate_samples.py:317-353 records
wall-clock processing_time / speech_duration arrays to .npy; the metrics
notebook computes RTF, Whisper WER/CER, predicted MOS, speaker cosine
similarity). Here:

  * generate_eval_samples: synthesize a sentence list, record per-utterance
    processing and speech durations (host-materialized timing — the axon
    platform's block_until_ready does not block), write wavs + timings.npz
  * rtf_summary: the headline RTF statistic (BASELINE.md row 1)
  * mel_l1 / mel_cepstral_distortion: parity metrics against reference mels
  * speaker_cosine_similarity: cosine between embeddings (caller supplies the
    embedder — WavLM+ECAPA from models/speaker.py, matching the notebook)

WER/CER and predicted MOS require external ASR/MOS models (Whisper, NeMo)
that are not vendored; hooks accept any callable `transcribe(wav, sr) -> str`.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

from unitspeech_tpu.data.dataset import write_wav


@dataclass
class EvalTimings:
    processing_time: np.ndarray  # (N,) seconds
    speech_duration: np.ndarray  # (N,) seconds

    @property
    def rtf(self) -> float:
        return float(self.processing_time.sum() / self.speech_duration.sum())

    @property
    def rtf_mean_of_ratios(self) -> float:
        """The reference notebook's statistic: mean(proc)/mean(speech)
        (evaluation-metrics.ipynb cell 6)."""
        return float(self.processing_time.mean() / self.speech_duration.mean())

    def save(self, path: str):
        np.savez(
            path,
            processing_time=self.processing_time,
            speech_duration=self.speech_duration,
        )

    @classmethod
    def load(cls, path: str) -> "EvalTimings":
        z = np.load(path)
        return cls(z["processing_time"], z["speech_duration"])


def generate_eval_samples(
    synthesizer,
    token_sequences: Sequence[Sequence[int]],
    out_dir: str,
    key,
    diffusion_steps: Optional[int] = None,
    warmup: int = 1,
    **synth_kwargs,
) -> EvalTimings:
    """Synthesize every token sequence, timing each end-to-end synthesis
    (phoneme IDs -> waveform on host), like evaluation_generate_samples.py."""
    import jax

    os.makedirs(out_dir, exist_ok=True)
    # warm the compile caches outside the timed region
    for seq in token_sequences[:warmup]:
        synthesizer(list(seq), key, diffusion_steps=diffusion_steps, **synth_kwargs)

    proc, speech = [], []
    for i, seq in enumerate(token_sequences):
        k = jax.random.fold_in(key, i)
        t0 = time.perf_counter()
        wav, sr = synthesizer(
            list(seq), k, diffusion_steps=diffusion_steps, **synth_kwargs
        )
        dt = time.perf_counter() - t0
        proc.append(dt)
        speech.append(len(wav) / sr)
        write_wav(os.path.join(out_dir, f"sample_{i:04d}.wav"), wav, sr)
    timings = EvalTimings(np.asarray(proc), np.asarray(speech))
    timings.save(os.path.join(out_dir, "timings.npz"))
    return timings


def rtf_summary(timings: EvalTimings) -> Dict[str, float]:
    return {
        "rtf": timings.rtf,
        "rtf_mean_of_ratios": timings.rtf_mean_of_ratios,
        "mean_processing_s": float(timings.processing_time.mean()),
        "mean_speech_s": float(timings.speech_duration.mean()),
        "n": int(len(timings.processing_time)),
    }


# ---------------------------------------------------------------------------
# objective parity metrics
# ---------------------------------------------------------------------------


def mel_l1(mel_a: np.ndarray, mel_b: np.ndarray) -> float:
    """Mean absolute log-mel difference over the overlapping frames."""
    t = min(mel_a.shape[0], mel_b.shape[0])
    return float(np.abs(mel_a[:t] - mel_b[:t]).mean())


def mel_cepstral_distortion(mel_a: np.ndarray, mel_b: np.ndarray, k: int = 13) -> float:
    """MCD-style distance on DCT-II cepstra of log-mels (dB)."""
    from scipy.fft import dct

    t = min(mel_a.shape[0], mel_b.shape[0])
    ca = dct(mel_a[:t], type=2, axis=1, norm="ortho")[:, 1:k]
    cb = dct(mel_b[:t], type=2, axis=1, norm="ortho")[:, 1:k]
    return float(
        (10.0 / np.log(10.0))
        * np.sqrt(2.0)
        * np.sqrt(((ca - cb) ** 2).sum(axis=1)).mean()
    )


def speaker_cosine_similarity(emb_a: np.ndarray, emb_b: np.ndarray) -> float:
    a = emb_a.reshape(-1)
    b = emb_b.reshape(-1)
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def wer(reference: str, hypothesis: str) -> float:
    """Word error rate via dynamic programming (no external deps; the
    reference uses jiwer + Whisper transcripts)."""
    r = reference.split()
    h = hypothesis.split()
    d = np.zeros((len(r) + 1, len(h) + 1), np.int32)
    d[:, 0] = np.arange(len(r) + 1)
    d[0, :] = np.arange(len(h) + 1)
    for i in range(1, len(r) + 1):
        for j in range(1, len(h) + 1):
            sub = d[i - 1, j - 1] + (r[i - 1] != h[j - 1])
            d[i, j] = min(sub, d[i - 1, j] + 1, d[i, j - 1] + 1)
    return float(d[-1, -1] / max(len(r), 1))


def cer(reference: str, hypothesis: str) -> float:
    return wer(" ".join(reference.replace(" ", "")), " ".join(hypothesis.replace(" ", "")))


def unit_error_rate(ref_units, hyp_units, dedup: bool = True) -> float:
    """ASR-free intelligibility proxy (VERDICT r4 item 5): Levenshtein edit
    distance between discrete-unit transcripts, normalized by the reference
    length — exactly WER over unit IDs instead of words. The units come from
    the in-repo mHuBERT+k-means stack (models/ssl/speech_encoder.py), the
    same features the reference's evaluation axis proxies with Whisper WER
    (evaluation-metrics.ipynb cells 31-34): if the synthesized audio's unit
    transcript diverges from the ground-truth audio's, the content is not
    intelligible to the very encoder that defined the units.

    dedup=True run-length-collapses both sequences first so pure pace/
    duration differences (the dominant benign variation between two
    renditions of the same text) don't count as errors."""
    ref = np.asarray(ref_units).reshape(-1)
    hyp = np.asarray(hyp_units).reshape(-1)
    if dedup:
        if ref.size:
            ref = ref[np.insert(np.diff(ref) != 0, 0, True)]
        if hyp.size:
            hyp = hyp[np.insert(np.diff(hyp) != 0, 0, True)]
    if ref.size == 0:
        return float(hyp.size > 0)
    # banded-free full DP in numpy (row sweep): O(|ref|*|hyp|) ints
    prev = np.arange(hyp.size + 1, dtype=np.int32)
    for i in range(1, ref.size + 1):
        cur = np.empty_like(prev)
        cur[0] = i
        sub = prev[:-1] + (ref[i - 1] != hyp)
        # cur[j] = min(sub[j-1], prev[j] + 1, cur[j-1] + 1); the cur[j-1]
        # dependency is sequential -> running minimum trick
        best = np.minimum(sub, prev[1:] + 1)
        for j in range(1, hyp.size + 1):
            cur[j] = min(best[j - 1], cur[j - 1] + 1)
        prev = cur
    return float(prev[-1] / ref.size)


def evaluate_unit_roundtrip(
    pairs: List, extract_units: Callable[[np.ndarray, int], np.ndarray]
) -> Dict[str, float]:
    """Unit-round-trip intelligibility over wav pairs.

    pairs: [(syn_wav, syn_sr, ref_wav, ref_sr)] — synthesized audio vs
    ground-truth audio of the same text. extract_units: `(wav, sr) ->
    unit-id array` (e.g. a SpeechEncoder via `speech_encoder_unit_hook`).
    Returns the per-set statistics reported in the eval CSV."""
    uers = []
    for syn_wav, syn_sr, ref_wav, ref_sr in pairs:
        hyp = extract_units(np.asarray(syn_wav), syn_sr)
        ref = extract_units(np.asarray(ref_wav), ref_sr)
        uers.append(unit_error_rate(ref, hyp))
    arr = np.asarray(uers, np.float64)
    return {
        "uer_mean": float(arr.mean()),
        "uer_median": float(np.median(arr)),
        "uer_max": float(arr.max()),
    }


def speech_encoder_unit_hook(encoder) -> Callable[[np.ndarray, int], np.ndarray]:
    """Adapt a models.ssl.speech_encoder.SpeechEncoder into the
    `(wav, sr) -> units` hook evaluate_unit_roundtrip expects (resamples to
    the encoder's 16 kHz input like the reference's SpeechEncoder does)."""

    def hook(wav: np.ndarray, sr: int) -> np.ndarray:
        return encoder(encoder.maybe_resample(np.asarray(wav), sr))["units"]

    return hook


def evaluate_transcriptions(
    pairs: List, transcribe: Callable[[np.ndarray, int], str]
) -> Dict[str, float]:
    """pairs: [(wav, sr, reference_text)]; transcribe: external ASR hook."""
    wers, cers = [], []
    for wav, sr, ref_text in pairs:
        hyp = transcribe(wav, sr)
        wers.append(wer(ref_text.lower(), hyp.lower()))
        cers.append(cer(ref_text.lower(), hyp.lower()))
    return {"wer": float(np.mean(wers)), "cer": float(np.mean(cers))}


# ---------------------------------------------------------------------------
# predicted MOS + summary table (reference evaluation-metrics.ipynb cells
# 12-18: s3prl mos_wav2vec2 scores per wav, then per-set mean/min/max)
# ---------------------------------------------------------------------------


def evaluate_mos(
    wavs: Sequence, predict_mos: Callable[[np.ndarray, int], float]
) -> Dict[str, float]:
    """wavs: [(wav, sr)]; predict_mos: external hook `(wav, sr) -> float`
    (the reference notebook uses s3prl's mos_wav2vec2 predictor — an external
    install there too). Returns the notebook's per-set statistics."""
    scores = np.asarray([float(predict_mos(w, sr)) for w, sr in wavs], np.float64)
    return {
        "mos_mean": float(scores.mean()),
        "mos_min": float(scores.min()),
        "mos_max": float(scores.max()),
    }


def load_hook(spec: str):
    """Resolve an external-model hook given as 'module.path:function' — how
    the CLI accepts ASR / MOS / speaker-embedding models that are separate
    installs (Whisper, NeMo/s3prl), matching the reference's notebook-side
    imports."""
    mod_name, _, fn_name = spec.partition(":")
    if not fn_name:
        raise ValueError(f"hook spec {spec!r} must be 'module:function'")
    import importlib

    return getattr(importlib.import_module(mod_name), fn_name)


def evaluation_summary(
    timings: Optional[EvalTimings] = None,
    transcription_pairs: Optional[List] = None,
    transcribe: Optional[Callable] = None,
    mos_wavs: Optional[Sequence] = None,
    predict_mos: Optional[Callable] = None,
    embedding_pairs: Optional[List] = None,
    unit_pairs: Optional[List] = None,
    extract_units: Optional[Callable] = None,
) -> Dict[str, float]:
    """One summary row combining every metric the reference's notebook
    reports (RTF stats, Whisper WER/CER, predicted MOS, speaker cosine)
    plus the in-repo unit-round-trip intelligibility score (uer_*).
    Sections whose inputs/hooks are absent are skipped."""
    row: Dict[str, float] = {}
    if timings is not None:
        row.update(rtf_summary(timings))
    if transcription_pairs and transcribe is not None:
        row.update(evaluate_transcriptions(transcription_pairs, transcribe))
    if mos_wavs and predict_mos is not None:
        row.update(evaluate_mos(mos_wavs, predict_mos))
    if unit_pairs and extract_units is not None:
        row.update(evaluate_unit_roundtrip(unit_pairs, extract_units))
    if embedding_pairs:
        sims = [speaker_cosine_similarity(a, b) for a, b in embedding_pairs]
        row["spk_cosine_mean"] = float(np.mean(sims))
        row["spk_cosine_min"] = float(np.min(sims))
    return row


def write_summary_csv(path: str, row: Dict[str, float]):
    """The notebook's final table as one-header-one-row CSV."""
    import csv

    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(list(row.keys()))
        w.writerow([f"{v:.6g}" if isinstance(v, float) else v for v in row.values()])
