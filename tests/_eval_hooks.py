"""Stub external-model hooks for the `evaluate` CLI e2e test — stand-ins for
the separate installs the reference notebook uses (Whisper ASR, s3prl
mos_wav2vec2, a speaker embedder), wired in via 'module:function' specs."""

import numpy as np


def transcribe(wav, sr):
    # deterministic "ASR": perfect on even-length wavs, one substitution else
    return "hello world" if len(wav) % 2 == 0 else "hello word"


def predict_mos(wav, sr):
    return 3.0 + min(len(wav) / (10.0 * sr), 1.0)


def embed(wav, sr):
    # deterministic projection of the waveform into a 4-d "embedding"
    x = np.asarray(wav, np.float64)
    n = len(x)
    idx = np.arange(n)
    basis = np.stack([
        np.ones(n), np.cos(idx * 0.01), np.sin(idx * 0.01), np.cos(idx * 0.02)
    ])
    return basis @ x


def units(wav, sr):
    # deterministic "unit extractor": sign of 80-sample frame means -> 2
    # units; same audio -> same transcript, degraded audio diverges
    x = np.asarray(wav, np.float64)
    n = len(x) // 80
    frames = x[: n * 80].reshape(n, 80).mean(axis=1)
    return (frames > 0).astype(np.int64)
