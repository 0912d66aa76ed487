"""Monotonic alignment search (MAS) — Viterbi max-path over the log-prior.

The reference calls an external Cython CPU kernel per training batch
(/root/reference/train_STEP1.py:344, pip package `monotonic_align`), which
forces a device->host sync in the middle of every training step. Here MAS is
a device-resident `lax.scan` DP instead, so the whole STEP1 training step
compiles to one XLA program:

  forward:  value[y, x] = lp[y, x] + max(value[y-1, x], value[y-1, x-1]),
            with value[0, x>0] = -inf (each frame either stays on the current
            token or advances by one)
  backward: walk argmax decisions from (t_y-1, t_x-1) to (0, 0)

Per-sample lengths are handled by freezing rows beyond t_y and starting the
backtrack at each sample's own (t_y-1, t_x-1). Tie-breaking matches the
Cython kernel (advance preferred on v_prev >= v_cur). A pure-numpy oracle
lives in tests/test_mas.py; a C++ host kernel (native/) provides the same
contract for CPU-side preprocessing.

Complexity: O(t_y) scan steps, each a vectorized O(B * t_x) row update.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_NEG_INF = -1e9


def maximum_path(log_prior, mask):
    """Find the most-likely monotonic alignment.

    Args:
      log_prior: (B, Tx, Ty) log-likelihood of token x emitting frame y.
      mask: (B, Tx, Ty) attention mask (x_mask outer y_mask).
    Returns:
      (B, Tx, Ty) 0/1 path, same dtype as mask; for each sample, a monotonic
      staircase from (0,0) to (t_x-1, t_y-1).
    """
    b, t_x, t_y = log_prior.shape
    dtype = jnp.float32
    lp = log_prior.astype(dtype) * mask.astype(dtype)
    x_lengths = jnp.maximum(mask[:, :, 0].sum(axis=1).astype(jnp.int32), 1)
    y_lengths = jnp.maximum(mask[:, 0, :].sum(axis=1).astype(jnp.int32), 1)

    x_idx = jnp.arange(t_x)

    # ---- forward DP over frames ----
    init = jnp.where(x_idx[None, :] == 0, lp[:, 0, 0][:, None], _NEG_INF)

    def fwd(value, y):
        lp_y = lax.dynamic_index_in_dim(lp, y, axis=2, keepdims=False)  # (B, Tx)
        stay = value
        advance = jnp.concatenate(
            [jnp.full((b, 1), _NEG_INF, dtype), value[:, :-1]], axis=1
        )
        decision = advance >= stay  # True -> came from x-1 (Cython tie rule)
        new_value = lp_y + jnp.maximum(stay, advance)
        active = (y < y_lengths) & (y > 0)
        value = jnp.where(active[:, None], new_value, value)
        return value, decision

    _, decisions = lax.scan(fwd, init, jnp.arange(t_y))  # (Ty, B, Tx)

    # ---- backtrack ----
    init_index = x_lengths - 1

    def bwd(index, y):
        active = y < y_lengths  # (B,)
        row = (x_idx[None, :] == index[:, None]) & active[:, None]
        dec_y = decisions[y]  # (B, Tx) decisions computed from value[y-1]
        dec_at = jnp.take_along_axis(dec_y, index[:, None], axis=1)[:, 0]
        step = active & (index > 0) & ((index == y) | dec_at)
        index = index - step.astype(index.dtype)
        return index, row

    _, rows = lax.scan(bwd, init_index, jnp.arange(t_y), reverse=True)  # (Ty, B, Tx)
    path = rows.transpose(1, 2, 0).astype(mask.dtype)
    return path * mask


maximum_path_jit = jax.jit(maximum_path)
