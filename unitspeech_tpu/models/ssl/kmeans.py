"""K-means unit quantizer + run-length deduplication.

TPU-native replacement for the reference's sklearn CPU k-means predict
(/root/reference/unitspeech/textlesslib/textless/data/kmeans_quantizer.py:
11-42): prediction is a single argmin-over-centroids matmul
(argmin ||x-c||^2 == argmin(||c||^2 - 2 x.c)) that rides the MXU, instead of
a host round-trip per utterance. Dedup mirrors torch.unique_consecutive
(speech_encoder.py:41).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=())
def kmeans_predict(features, centroids):
    """features: (T, D); centroids: (K, D) -> (T,) int32 nearest-centroid."""
    c_sq = jnp.sum(centroids ** 2, axis=1)  # (K,)
    scores = c_sq[None, :] - 2.0 * features @ centroids.T  # (T, K)
    return jnp.argmin(scores, axis=1).astype(jnp.int32)


def dedup_consecutive(units: np.ndarray):
    """(T,) -> (unique_units, run_lengths) like torch.unique_consecutive with
    return_counts=True."""
    units = np.asarray(units)
    if len(units) == 0:
        return units, np.zeros((0,), np.int64)
    change = np.flatnonzero(np.diff(units)) + 1
    starts = np.concatenate([[0], change])
    ends = np.concatenate([change, [len(units)]])
    return units[starts], (ends - starts).astype(np.int64)


@dataclass
class KMeansQuantizer:
    """Centroid table; load from .npz ({'centroids': (K, D)}) or convert from
    a sklearn joblib checkpoint with utils/torch_convert_ssl.py."""

    centroids: np.ndarray  # (K, D)

    @property
    def vocab_size(self) -> int:
        return self.centroids.shape[0]

    def __call__(self, dense_features) -> np.ndarray:
        return np.asarray(
            kmeans_predict(
                jnp.asarray(dense_features, jnp.float32),
                jnp.asarray(self.centroids, jnp.float32),
            )
        )

    @classmethod
    def load(cls, path: str) -> "KMeansQuantizer":
        z = np.load(path)
        return cls(centroids=np.asarray(z["centroids"], np.float32))

    def save(self, path: str):
        np.savez(path, centroids=self.centroids)
