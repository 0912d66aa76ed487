"""Duration predictor.

Log-duration regressor conditioned on the speaker embedding; dual-mode like
the reference (/root/reference/unitspeech/duration_predictor.py:24-63):
reverse=True returns log-durations, reverse=False returns the MSE training
loss against log(w + 1e-6).

The encoder hidden states are stop-gradiented on entry (reference :48 —
duration gradients never reach the encoder). Standard LayerNorm here uses
eps=1e-5 (torch F.layer_norm default, duration_predictor.py:10-21), unlike
the encoder's 1e-4.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from unitspeech_tpu.models.encoder import Conv1d


class DurationPredictor(nn.Module):
    in_channels: int = 192
    filter_channels: int = 256
    kernel_size: int = 3
    p_dropout: float = 0.1
    spk_emb_dim: int = 256

    @nn.compact
    def __call__(self, x, x_mask, w=None, g=None, reverse: bool = False,
                 deterministic: bool = True):
        """x: (B, T, C) encoder hiddens; x_mask: (B, T, 1);
        w: (B, T) target durations (train mode); g: (B, spk_emb_dim)."""
        x = jax.lax.stop_gradient(x)
        if g is not None:
            g_tiled = jnp.broadcast_to(g[:, None, :], (x.shape[0], x.shape[1], g.shape[-1]))
            x = jnp.concatenate([x, g_tiled], axis=-1)
        x = Conv1d(self.filter_channels, self.kernel_size, name="conv_1")(x * x_mask)
        x = nn.relu(x)
        x = nn.LayerNorm(epsilon=1e-5, name="norm_1")(x)
        x = nn.Dropout(self.p_dropout)(x, deterministic=deterministic)
        x = Conv1d(self.filter_channels, self.kernel_size, name="conv_2")(x * x_mask)
        x = nn.relu(x)
        x = nn.LayerNorm(epsilon=1e-5, name="norm_2")(x)
        x = nn.Dropout(self.p_dropout)(x, deterministic=deterministic)
        logw = nn.Dense(1, name="proj")(x * x_mask) * x_mask  # (B, T, 1)
        logw = logw[..., 0]
        if reverse:
            return logw
        logw_target = jnp.log(w + 1e-6) * x_mask[..., 0]
        return jnp.sum((logw - logw_target) ** 2) / jnp.sum(x_mask)
