"""Unit <-> mel frame-rate alignment.

Exact re-implementation of the reference's process_unit
(/root/reference/unitspeech/util.py:69-102), vectorized (the reference runs
Python loops per sample): 50 Hz HuBERT unit runs are expanded to the sample
domain (duration * sr//50 samples each), re-bucketed into hop-sized groups by
per-group MODE, then run-length re-encoded.

Host-side numpy by design — this runs once per utterance during
preprocessing/fine-tune prep, not in the training hot loop.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from unitspeech_tpu.models.ssl.kmeans import dedup_consecutive


def process_unit(
    units: np.ndarray,
    durations: np.ndarray,
    sampling_rate: int,
    hop_length: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """(units (N,), durations (N,) at 50 Hz) -> (units (M,), durations (M,))
    at the mel frame rate. Matches util.py:69-102 exactly, including the
    truncation to a whole number of hops."""
    units = np.asarray(units, np.int64)
    durations = np.asarray(durations, np.int64) * (sampling_rate // 50)
    expanded = np.repeat(units, durations)
    new_length = len(expanded) // hop_length * hop_length
    if new_length == 0:
        return np.zeros((0,), np.int64), np.zeros((0,), np.int64)
    groups = expanded[:new_length].reshape(-1, hop_length)

    # per-row mode with the same tie-break as torch.mode (smallest value):
    # sort each row, find the longest run; np.unique per row via bincount is
    # slow for 1000-unit vocab x many rows, so use a sorted-run trick.
    s = np.sort(groups, axis=1)
    change = s[:, 1:] != s[:, :-1]
    # run ids per row
    run_id = np.concatenate(
        [np.zeros((s.shape[0], 1), np.int64), np.cumsum(change, axis=1)], axis=1
    )
    modes = np.empty(s.shape[0], np.int64)
    for i in range(s.shape[0]):
        counts = np.bincount(run_id[i])
        # torch.mode returns the SMALLEST modal value; runs are sorted
        # ascending, argmax returns the first (= smallest) maximal run
        best_run = np.argmax(counts)
        modes[i] = s[i, np.searchsorted(run_id[i], best_run)]

    out_units, out_durations = dedup_consecutive(modes)
    return out_units.astype(np.int64), out_durations.astype(np.int64)
