"""Data pipeline: filelist datasets + bucketed batch collation.

TPU-native re-design of the reference datasets
(/root/reference/data.py:21-279):

  * the reference phonemizes + STFTs EVERY item in torch DataLoader workers,
    uncached, per epoch (SURVEY.md §3 "hot loops" (e)); here text is
    phonemized once (cached), waveforms ship to the device, and the mel
    frontend (ops/mel.py) runs on-chip inside the jitted train step — the
    host does file I/O only
  * batches pad to a fixed (token, frame) bucket so the train step compiles
    once per bucket instead of per max-length (XLA static shapes)
  * artifacts (units/durations, speaker embeddings, mel min/max, uncond
    stats) are .npz files produced by preprocessing/ CLIs, replacing the
    reference's per-wav .pt sidecars (data.py:212-223)

Dataset item contract (all numpy, host-side):
  text-mel:  {tokens (Tx,), mel or wav, spk_id}
  unit-mel:  {units (Tx,), durations (Tx,), mel or wav, spk_id}
"""

from __future__ import annotations


import os
import wave
from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from unitspeech_tpu.ops.masking import choose_bucket, fix_len_compatibility


def parse_filelist(filelist_path: str, split_char: str = "|") -> List[List[str]]:
    """`path|text|speaker_id` lines (reference util.py:49-52)."""
    with open(filelist_path, encoding="utf-8") as f:
        return [line.strip().split(split_char) for line in f if line.strip()]


def load_wav(path: str) -> Tuple[np.ndarray, int]:
    """Read a PCM wav to float32 in [-1, 1] without soundfile/librosa."""
    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        width = w.getsampwidth()
        raw = w.readframes(n)
    if width == 2:
        data = np.frombuffer(raw, dtype=np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        data = np.frombuffer(raw, dtype=np.int32).astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"unsupported sample width {width} in {path}")
    return data, sr


def write_wav(path: str, data: np.ndarray, sr: int):
    """Write float32 [-1, 1] to 16-bit PCM."""
    pcm = np.clip(data, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype(np.int16)
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


@dataclass
class TextMelSpeakerDataset:
    """Filelist-backed dataset for STEP1 (reference data.py:21-112).

    `text_to_ids` maps raw text -> token IDs (the text frontend); results are
    cached so phonemization happens once per utterance, not once per epoch.
    """

    filelist: List[List[str]]
    text_to_ids: Callable[[str], Sequence[int]]
    hop_length: int = 256
    sampling_rate: int = 22050

    def __post_init__(self):
        self._token_cache: Dict[int, np.ndarray] = {}

    def __len__(self):
        return len(self.filelist)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        path, text, spk = (self.filelist[idx] + ["0"])[:3]
        if idx not in self._token_cache:
            self._token_cache[idx] = np.asarray(self.text_to_ids(text), np.int32)
        wav, sr = load_wav(path)
        if sr != self.sampling_rate:
            raise ValueError(f"{path}: {sr} != {self.sampling_rate}")
        return {
            "tokens": self._token_cache[idx],
            "wav": wav,
            "spk_id": np.int32(int(spk)),
        }


@dataclass
class UnitMelSpeakerDataset:
    """Filelist-backed dataset for STEP2 (reference data.py:143-236); units
    and durations come from `<wav>.units.npz` sidecars written by
    preprocessing/extract_units.py."""

    filelist: List[List[str]]
    hop_length: int = 256
    sampling_rate: int = 22050
    sidecar_suffix: str = ".units.npz"

    def __len__(self):
        return len(self.filelist)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        path, _text, spk = (self.filelist[idx] + ["0"])[:3]
        side = os.path.splitext(path)[0] + self.sidecar_suffix
        z = np.load(side)
        units, durations = z["units"], z["durations"]
        assert len(units) == len(durations), side
        wav, sr = load_wav(path)
        if sr != self.sampling_rate:
            raise ValueError(f"{path}: {sr} != {self.sampling_rate}")
        return {
            "units": units.astype(np.int32),
            "durations": durations.astype(np.float32),
            "wav": wav,
            "spk_id": np.int32(int(spk)),
        }


@dataclass
class BucketCollator:
    """Pad a list of items to static (token-bucket, frame-bucket) shapes.

    Waveforms are padded to frames*hop so the on-device mel frontend yields
    exactly `frames` mel frames; frame counts are rounded for the U-Net
    (fix_len_compatibility, reference data.py:128-140).
    """

    hop_length: int = 256
    num_downsamplings: int = 3
    token_buckets: Sequence[int] = (32, 64, 96, 128, 192, 256, 384, 512)
    frame_buckets: Sequence[int] = (
        128, 192, 256, 320, 384, 448, 512, 640, 768, 896, 1024, 1280, 1536, 2048,
    )

    def _frame_count(self, wav_len: int) -> int:
        return wav_len // self.hop_length

    def __call__(self, items: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
        b = len(items)
        token_key = "tokens" if "tokens" in items[0] else "units"
        tok_lens = np.array([len(it[token_key]) for it in items], np.int32)
        frame_lens = np.array(
            [self._frame_count(len(it["wav"])) for it in items], np.int32
        )
        t_x = choose_bucket(int(tok_lens.max()), self.token_buckets)
        t_y = fix_len_compatibility(
            choose_bucket(int(frame_lens.max()), self.frame_buckets),
            self.num_downsamplings,
        )
        tokens = np.zeros((b, t_x), np.int32)
        wavs = np.zeros((b, t_y * self.hop_length), np.float32)
        durations = None
        if "durations" in items[0]:
            durations = np.zeros((b, t_x), np.float32)
        spk_ids = np.zeros((b,), np.int32)
        for i, it in enumerate(items):
            tokens[i, : tok_lens[i]] = it[token_key]
            n = frame_lens[i] * self.hop_length
            wavs[i, :n] = it["wav"][:n]
            if durations is not None:
                durations[i, : tok_lens[i]] = it["durations"]
            spk_ids[i] = it["spk_id"]
        batch = {
            token_key: tokens,
            f"{token_key[:-1]}_lengths" if token_key == "units" else "token_lengths": tok_lens,
            "wav": wavs,
            "mel_lengths": frame_lens,
            "spk_id": spk_ids,
        }
        if durations is not None:
            batch["durations"] = durations
        return batch


def iterate_batches(
    dataset,
    collator: BucketCollator,
    batch_size: int,
    key: Optional[np.random.Generator] = None,
    shuffle: bool = True,
    drop_last: bool = True,
    process_index: int = 0,
    process_count: int = 1,
):
    """Epoch iterator with per-host dataset sharding for multi-host pods.

    Every host shuffles the SAME permutation (callers must seed identically
    across hosts) and takes its strided slice — the
    `range(rank, N, world)` pattern of the reference's only distributed code
    (/root/reference/tools/distributed_transcribe/transcribe.py:109), so the
    hosts' sample sets are disjoint and together cover the epoch.
    `batch_size` is the PER-HOST batch size.
    """
    idx = np.arange(len(dataset))
    if shuffle:
        (key or np.random.default_rng(0)).shuffle(idx)
    idx = idx[process_index::process_count]
    if drop_last and process_count > 1:
        # lock-step: every host must yield the SAME number of batches (they
        # meet in collectives inside the jitted step), so cap at the
        # smallest host shard's full-batch count
        min_shard = len(dataset) // process_count
        end = (min_shard // batch_size) * batch_size
    elif drop_last:
        end = len(idx) - (len(idx) % batch_size)
    else:
        end = len(idx)
    for s in range(0, end, batch_size):
        chunk = idx[s : s + batch_size]
        if drop_last and len(chunk) < batch_size:
            break
        yield collator([dataset[int(i)] for i in chunk])
