"""Dataset-level preprocessing: mel min/max, unconditional CFG stats,
per-speaker mean embeddings, unit extraction.

TPU-native equivalents of the reference preprocessing CLIs
(/root/reference/preprocessing/*.py, SURVEY.md §2.2 #21), with mel computed
on device in batches instead of per-file torch STFT on CPU, and .npz
artifacts instead of per-wav .pt sidecars:

  mel_stats      -> mel_stats.npz {mel_min, mel_max}          (process_mel_normalization.py)
  uncond_stats   -> uncond_stats.npz {text_uncond, spk_uncond} (process_uncond_{mel,spk}.py)
  speaker_embs   -> spk_embs.npz {<id>: (S,)}                  (process_spkr_embs.py)
  extract_units  -> <wav>.units.npz {units, durations}          (process_units.py)
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Iterable, List, Optional

import numpy as np

from unitspeech_tpu.data.dataset import load_wav, parse_filelist
from unitspeech_tpu.ops.mel import mel_spectrogram


def _iter_mels(filelists: Iterable[str], data_cfg, max_files: Optional[int] = None):
    """Yield (path, spk_id, mel (T, F)) for every wav in the filelists."""
    count = 0
    for fl in filelists:
        for entry in parse_filelist(fl):
            path, _text, spk = (entry + ["0"])[:3]
            wav, sr = load_wav(path)
            if sr != data_cfg.sampling_rate:
                raise ValueError(f"{path}: {sr} != {data_cfg.sampling_rate}")
            mel = np.asarray(
                mel_spectrogram(
                    wav[None, :],
                    n_fft=data_cfg.n_fft, num_mels=data_cfg.n_feats,
                    sampling_rate=data_cfg.sampling_rate,
                    hop_size=data_cfg.hop_length, win_size=data_cfg.win_length,
                    fmin=data_cfg.mel_fmin, fmax=data_cfg.mel_fmax,
                )
            )[0]
            yield path, int(spk), mel
            count += 1
            if max_files and count >= max_files:
                return


def compute_mel_stats(filelists: List[str], data_cfg, out_path: str,
                      max_files: Optional[int] = None) -> Dict[str, np.ndarray]:
    """Global per-channel mel min/max over the dataset
    (reference process_mel_normalization.py:15-58)."""
    mel_min = np.full((data_cfg.n_feats,), np.inf, np.float32)
    mel_max = np.full((data_cfg.n_feats,), -np.inf, np.float32)
    for _path, _spk, mel in _iter_mels(filelists, data_cfg, max_files):
        mel_min = np.minimum(mel_min, mel.min(axis=0))
        mel_max = np.maximum(mel_max, mel.max(axis=0))
    np.savez(out_path, mel_min=mel_min, mel_max=mel_max)
    return {"mel_min": mel_min, "mel_max": mel_max}


def compute_uncond_mel(filelists: List[str], data_cfg, mel_min, mel_max,
                       out_path: Optional[str] = None,
                       max_files: Optional[int] = None) -> np.ndarray:
    """Global mean NORMALIZED mel frame = text_uncond CFG embedding
    (reference process_uncond_mel.py:22-48)."""
    from unitspeech_tpu.ops.mel import normalize_mel

    total = np.zeros((data_cfg.n_feats,), np.float64)
    n = 0
    for _path, _spk, mel in _iter_mels(filelists, data_cfg, max_files):
        normed = normalize_mel(mel, mel_min, mel_max)
        total += np.asarray(normed).sum(axis=0)
        n += normed.shape[0]
    text_uncond = (total / max(n, 1)).astype(np.float32)
    if out_path:
        np.savez(out_path, text_uncond=text_uncond)
    return text_uncond


def compute_speaker_embs(
    filelists: List[str], data_cfg, embed_fn: Callable[[np.ndarray, int], np.ndarray],
    out_path: str, max_files: Optional[int] = None,
) -> Dict[int, np.ndarray]:
    """Running mean embedding per speaker (reference process_spkr_embs.py:
    63-100 — which assumed speaker-contiguous filelists; this doesn't)."""
    sums: Dict[int, np.ndarray] = {}
    counts: Dict[int, int] = {}
    for fl in filelists:
        for entry in parse_filelist(fl):
            path, _text, spk = (entry + ["0"])[:3]
            wav, sr = load_wav(path)
            emb = np.asarray(embed_fn(wav, sr)).reshape(-1)
            spk_id = int(spk)
            if spk_id not in sums:
                sums[spk_id] = np.zeros_like(emb, np.float64)
                counts[spk_id] = 0
            sums[spk_id] += emb
            counts[spk_id] += 1
            if max_files and sum(counts.values()) >= max_files:
                break
    means = {k: (sums[k] / counts[k]).astype(np.float32) for k in sums}
    np.savez(out_path, **{str(k): v for k, v in means.items()})
    return means


def compute_uncond_spk(spk_embs: Dict[int, np.ndarray],
                       out_path: Optional[str] = None) -> np.ndarray:
    """Mean of speaker means = spk_uncond CFG embedding
    (reference process_uncond_spk.py:34-44)."""
    spk_uncond = np.mean(np.stack(list(spk_embs.values())), axis=0).astype(np.float32)
    if out_path:
        np.savez(out_path, spk_uncond=spk_uncond)
    return spk_uncond


def extract_units_for_filelist(
    filelists: List[str], speech_encoder, sidecar_suffix: str = ".units.npz",
    max_files: Optional[int] = None,
) -> int:
    """Write <wav>.units.npz next to every wav (reference process_units.py:
    31-51 writes _unit.pt/_duration.pt). Expects 16 kHz input wavs or a
    speech_encoder that resamples internally."""
    count = 0
    for fl in filelists:
        for entry in parse_filelist(fl):
            path = entry[0]
            wav, _sr = load_wav(path)
            out = speech_encoder(wav)
            side = os.path.splitext(path)[0] + sidecar_suffix
            np.savez(side, units=out["units"], durations=out["durations"])
            count += 1
            if max_files and count >= max_files:
                return count
    return count
