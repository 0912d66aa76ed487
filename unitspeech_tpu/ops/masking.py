"""Mask / alignment-path primitives.

TPU-native equivalents of the reference's vectorized mask helpers
(/root/reference/unitspeech/util.py:20-66). All functions are pure, jittable,
and operate on static shapes.

Axis convention: this framework is time-major channels-last everywhere —
sequences are (batch, time, channels); masks are (batch, time) float or bool.
(The reference is channels-first (batch, channels, time); the conversion is
purely notational and handled once in the torch-weight converter.)
"""

from __future__ import annotations

import jax.numpy as jnp


def sequence_mask(length, max_length: int, dtype=jnp.float32):
    """(B,) lengths -> (B, max_length) mask; 1.0 inside, 0.0 in padding.

    Reference: util.py:20-24.
    """
    pos = jnp.arange(max_length, dtype=length.dtype)
    return (pos[None, :] < length[:, None]).astype(dtype)


def generate_path(duration, mask):
    """Expand per-token durations into a monotonic alignment path.

    Args:
      duration: (B, Tx) non-negative integer-valued durations (float or int).
      mask: (B, Tx, Ty) attention mask.
    Returns:
      (B, Tx, Ty) 0/1 path where row x covers frames
      [cum(d)_{x-1}, cum(d)_x). Cumsum-and-difference trick, identical math to
      reference util.py:27-40 but with no reshape round-trip.
    """
    b, t_x, t_y = mask.shape
    cum = jnp.cumsum(duration.astype(jnp.float32), axis=1)  # (B, Tx)
    pos = jnp.arange(t_y, dtype=jnp.float32)
    # step[b, x, y] = 1 if y < cum[b, x]
    step = (pos[None, None, :] < cum[:, :, None]).astype(mask.dtype)
    path = step - jnp.pad(step, ((0, 0), (1, 0), (0, 0)))[:, :-1]
    return path * mask


def fix_len_compatibility(length: int, num_downsamplings_in_unet: int = 3) -> int:
    """Round a frame count up to a multiple of 2**num_downsamplings so the
    U-Net down/up path round-trips exactly. Reference: util.py:55-59."""
    m = 2 ** num_downsamplings_in_unet
    return int(-(-length // m) * m)


def intersperse(lst, item):
    """Insert `item` between every element and at both ends (blank tokens).

    Reference: util.py:62-66.
    """
    result = [item] * (len(lst) * 2 + 1)
    result[1::2] = lst
    return result


def choose_bucket(length: int, buckets) -> int:
    """Pick the smallest bucket >= length; used to bound jit recompiles for
    data-dependent output lengths (TPU-native addition — the reference pads
    per-sample which would retrace XLA for every new length)."""
    for b in buckets:
        if b >= length:
            return int(b)
    return fix_len_compatibility(length, 3)


def default_frame_buckets(max_frames: int = 4096, num_down: int = 3):
    """Geometric-ish bucket ladder for mel-frame counts, all multiples of
    2**num_down. Keeps padding waste <~12.5% while bounding compile count."""
    buckets = []
    b = 2 ** num_down * 4  # 32 frames minimum
    while b < max_frames:
        buckets.append(fix_len_compatibility(b, num_down))
        b = int(b * 1.125) + 1
    buckets.append(fix_len_compatibility(max_frames, num_down))
    # dedupe, sorted
    return tuple(sorted(set(buckets)))
