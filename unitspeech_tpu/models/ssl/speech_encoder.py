"""SpeechEncoder: waveform -> {units, durations, dense}.

TPU-native equivalent of textlesslib's SpeechEncoder
(/root/reference/unitspeech/textlesslib/textless/data/speech_encoder.py:
61-260): mHuBERT dense features (layer 6, 50 Hz) -> k-means quantization ->
optional run-length deduplication. The dense model runs jitted on device;
k-means predict is an on-device matmul (kmeans.py); dedup is host-side.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

import numpy as np

from unitspeech_tpu.models.ssl.hubert import HubertFeatureReader
from unitspeech_tpu.models.ssl.kmeans import KMeansQuantizer, dedup_consecutive


@dataclass
class SpeechEncoder:
    dense_model: HubertFeatureReader
    quantizer: KMeansQuantizer
    deduplicate: bool = True

    @property
    def vocab_size(self) -> int:
        return self.quantizer.vocab_size

    @property
    def code_hop_size(self) -> int:
        return self.dense_model.hop

    @property
    def expected_sample_rate(self) -> int:
        return 16000

    def __call__(self, wav: np.ndarray) -> Dict[str, np.ndarray]:
        """wav: (samples,) 16 kHz -> {'units', 'durations', 'dense'}.
        Without dedup, durations are all ones (speech_encoder.py:44-52)."""
        dense = self.dense_model(wav)  # (T, D)
        units = self.quantizer(dense)  # (T,)
        if self.deduplicate:
            units, durations = dedup_consecutive(units)
        else:
            durations = np.ones_like(units, dtype=np.int64)
        return {
            "units": np.asarray(units, np.int64),
            "durations": np.asarray(durations, np.int64),
            "dense": dense,
        }
