"""SpeechEncoder: waveform -> {units, durations, dense, [f0]}.

TPU-native equivalent of textlesslib's SpeechEncoder
(/root/reference/unitspeech/textlesslib/textless/data/speech_encoder.py:
61-260): a dense model (mHuBERT/CPC/…, 50-100 Hz) -> k-means quantization ->
optional run-length deduplication, optional bos/eos wrapping
(collater_utils.py:31-45) and an optional aligned F0 stream
(speech_encoder.py:45-52). The dense model runs jitted on device; k-means
predict is an on-device matmul (kmeans.py); dedup/F0 pooling are host-side.

`need_f0` defaults to False (the reference defaults True, but none of this
framework's training/serving paths consume the F0 stream, and the tracker
costs real time — flip it on for GSLM-style prosodic workloads).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional

import numpy as np

from unitspeech_tpu.models.ssl.kmeans import KMeansQuantizer, dedup_consecutive

F0_FRAME_SPACE = 0.005  # seconds; textlesslib f0_preprocess.py:13


@dataclass
class SpeechEncoder:
    dense_model: Any  # HubertFeatureReader / CpcFeatureReader duck type
    quantizer: KMeansQuantizer
    deduplicate: bool = True
    add_bos_eos: bool = False
    need_f0: bool = False
    f0_normalizer: Optional[Callable] = None
    f0_quantizer: Optional[Callable] = None

    @property
    def vocab_size(self) -> int:
        return self.quantizer.vocab_size

    @property
    def bos(self) -> int:
        """reference speech_encoder.py:103-108"""
        return self.vocab_size

    @property
    def eos(self) -> int:
        return self.vocab_size + 1

    @property
    def code_hop_size(self) -> int:
        return self.dense_model.hop

    @property
    def expected_sample_rate(self) -> int:
        return 16000

    @property
    def f0_code_ratio(self) -> float:
        """F0 frames per unit frame (speech_encoder.py:171-177)."""
        return self.code_hop_size / self.expected_sample_rate / F0_FRAME_SPACE

    def maybe_resample(self, wav: np.ndarray, sr: int) -> np.ndarray:
        """Resample to the dense model's rate if needed
        (speech_encoder.py:193-214)."""
        if sr == self.expected_sample_rate:
            return wav
        from scipy.signal import resample_poly

        return resample_poly(
            np.asarray(wav, np.float64), self.expected_sample_rate, sr
        ).astype(np.float32)

    def _f0_stream(self, wav: np.ndarray, durations: np.ndarray,
                   speaker) -> np.ndarray:
        from unitspeech_tpu.ops.f0 import align_f0_to_durations, extract_f0

        f0 = np.asarray(extract_f0(np.asarray(wav, np.float32)))
        if self.f0_normalizer is not None:
            f0 = self.f0_normalizer(f0, speaker)
        tol = 5 * self.f0_code_ratio  # speech_encoder.py:51
        f0 = align_f0_to_durations(f0, durations, self.f0_code_ratio, tol=tol)
        if self.f0_quantizer is not None:
            f0 = self.f0_quantizer(f0)
        return f0

    def __call__(self, wav: np.ndarray, speaker=None) -> Dict[str, np.ndarray]:
        """wav: (samples,) 16 kHz -> {'units', 'durations', 'dense'[, 'f0']}.
        Without dedup, durations are all ones (speech_encoder.py:44-52)."""
        wav = np.asarray(wav)
        if wav.ndim > 1:  # multi-channel -> mono (speech_encoder.py:34-35)
            wav = wav.mean(axis=0)
        dense = self.dense_model(wav)  # (T, D)
        units = self.quantizer(dense)  # (T,)
        if self.deduplicate:
            units, durations = dedup_consecutive(units)
        else:
            durations = np.ones_like(units, dtype=np.int64)
        f0 = self._f0_stream(wav, durations, speaker) if self.need_f0 else None
        units = np.asarray(units, np.int64)
        durations = np.asarray(durations, np.int64)
        if self.add_bos_eos:  # collater_utils.py:31-45
            units = np.concatenate([[self.bos], units, [self.eos]])
            durations = np.concatenate([[0], durations, [0]])
            dense = np.concatenate(
                [np.zeros_like(dense[:1]), dense, np.zeros_like(dense[:1])]
            )
            if f0 is not None:
                f0 = np.concatenate([
                    np.zeros_like(f0[:1]), f0, np.zeros_like(f0[:1])
                ])
        out = {"units": units, "durations": durations, "dense": dense}
        if f0 is not None:
            out["f0"] = f0
        return out
