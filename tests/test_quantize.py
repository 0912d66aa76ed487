"""QuantizeDataset + SpeechEncoder stream tests (textlesslib parity:
quantized_datasets.py:117-255, speech_encoder.py:23-260,
collater_utils.py:10-45, f0_preprocess.py:35-62)."""

from __future__ import annotations

import numpy as np
import pytest

from unitspeech_tpu.data.quantize import (
    FilelistAudioDataset,
    QuantizeDataset,
    QuantizedFilelist,
    collate_arrays,
)
from unitspeech_tpu.models.ssl.kmeans import KMeansQuantizer
from unitspeech_tpu.models.ssl.speech_encoder import SpeechEncoder
from unitspeech_tpu.ops.f0 import align_f0_to_durations


class FakeDense:
    """50 Hz dense model: mean-pools 320-sample frames into 4 dims."""

    hop = 320

    def __call__(self, wav):
        n = len(wav) // self.hop
        frames = np.asarray(wav[: n * self.hop], np.float32).reshape(n, self.hop)
        cols = frames.reshape(n, 4, -1).mean(axis=2)
        return cols.astype(np.float32)


def _encoder(**kw):
    centers = np.array(
        [[-1, -1, -1, -1], [0, 0, 0, 0], [1, 1, 1, 1]], np.float32
    )
    return SpeechEncoder(FakeDense(), KMeansQuantizer(centers), **kw)


class ToyAudioDataset:
    def __init__(self, n=3, seed=0):
        rng = np.random.default_rng(seed)
        self.items = [
            (rng.standard_normal(3200 + 320 * i).astype(np.float32),
             f"text-{i}", f"spk{i % 2}")
            for i in range(n)
        ]

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def test_collate_arrays_padding():
    out = collate_arrays([np.array([1, 2, 3]), np.array([1])], 0)
    np.testing.assert_array_equal(out, [[1, 2, 3], [1, 0, 0]])


def test_quantize_dataset_item_and_collate():
    enc = _encoder(deduplicate=True)
    qd = QuantizeDataset(ToyAudioDataset(), enc,
                         speaker_extractor=lambda rest: rest[1])
    assert len(qd) == 3
    # pad id clears the vocab AND bos/eos ids (quantized_datasets.py:165-169)
    assert qd.unit_pad == 1 + max(enc.vocab_size - 1, enc.bos, enc.eos)
    item = qd[0]
    assert item["units"].shape == item["durations"].shape
    assert int(item["durations"].sum()) == item["dense"].shape[0] == 10
    assert item["rest"] == ["text-0", "spk0"]

    batch = qd.collater([qd[i] for i in range(3)])
    assert batch["units"].shape == batch["durations"].shape
    assert batch["dense"].shape[0] == 3 and batch["dense"].shape[2] == 4
    # longest item (idx 2) has 12 frames pre-dedup; dense padded to batch max
    assert batch["dense"].shape[1] == 12
    # padding positions carry unit_pad in units, 0 in durations
    lens = [len(qd[i]["units"]) for i in range(3)]
    for i, ln in enumerate(lens):
        assert (batch["units"][i, ln:] == qd.unit_pad).all()
        assert (batch["durations"][i, ln:] == 0).all()
    assert batch["rest"] == [["text-0", "text-1", "text-2"],
                             ["spk0", "spk1", "spk0"]]


def test_quantize_dataset_f0_tuple_quirk():
    enc = _encoder(deduplicate=True, need_f0=True)
    qd = QuantizeDataset(ToyAudioDataset(), enc,
                         speaker_extractor=lambda rest: rest[1])
    batch = qd.collater([qd[0], qd[1]])
    # the reference returns the collated f0 as a 1-tuple (:252-254)
    assert isinstance(batch["f0"], tuple) and len(batch["f0"]) == 1
    assert batch["f0"][0].shape == batch["units"].shape


def test_speech_encoder_bos_eos_wrap():
    enc = _encoder(deduplicate=True, add_bos_eos=True)
    out = enc(np.random.default_rng(1).standard_normal(3200).astype(np.float32))
    assert out["units"][0] == enc.bos == 3
    assert out["units"][-1] == enc.eos == 4
    assert out["durations"][0] == out["durations"][-1] == 0
    assert (out["dense"][0] == 0).all() and (out["dense"][-1] == 0).all()
    assert int(out["durations"].sum()) == out["dense"].shape[0] - 2


def test_speech_encoder_f0_stream_aligned():
    enc = _encoder(deduplicate=False, need_f0=True)
    sr = 16000
    t = np.arange(sr) / sr
    wav = np.sin(2 * np.pi * 150.0 * t).astype(np.float32)
    out = enc(wav, speaker="spk0")
    assert out["f0"].shape == out["units"].shape
    voiced = out["f0"][out["f0"] > 0]
    assert len(voiced) > 0
    assert np.allclose(voiced, 150.0, rtol=0.05)


def test_align_f0_to_durations_oracle():
    # 2 units of duration [2, 1] at ratio 2.0 -> segments of 4 and 2 frames;
    # voiced-only means per segment, zeros excluded
    f0 = np.array([100.0, 0.0, 110.0, 90.0, 0.0, 200.0])
    out = align_f0_to_durations(f0, np.array([2, 1]), 2.0)
    np.testing.assert_allclose(out, [100.0, 200.0])
    # tolerance: one frame short -> padded with the last value
    out2 = align_f0_to_durations(f0[:5], np.array([2, 1]), 2.0, tol=1)
    np.testing.assert_allclose(out2, [100.0, 0.0])
    with pytest.raises(ValueError):
        align_f0_to_durations(f0[:2], np.array([2, 1]), 2.0, tol=1)


def test_quantized_filelist(tmp_path):
    import wave as wave_mod

    paths = []
    rng = np.random.default_rng(2)
    for i in range(2):
        p = tmp_path / f"a{i}.wav"
        data = (rng.standard_normal(3200) * 3000).astype(np.int16)
        with wave_mod.open(str(p), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(data.tobytes())
        paths.append(p)
    fl = tmp_path / "list.txt"
    fl.write_text("\n".join(f"{p}|hello|spk{i}" for i, p in enumerate(paths)))

    ds = FilelistAudioDataset(str(fl))
    assert len(ds) == 2
    wav, text, spk = ds[0]
    assert text == "hello" and spk == "spk0" and len(wav) == 3200

    qd = QuantizedFilelist(_encoder(), str(fl))
    item = qd[1]
    assert item["rest"] == ["hello", "spk1"]
    assert int(item["durations"].sum()) == 10
