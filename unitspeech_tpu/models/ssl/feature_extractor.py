"""Waveform conv feature extractor shared by HuBERT / WavLM / wav2vec2.

JAX re-implementation of the fairseq ConvFeatureExtractionModel the reference
loads through fairseq/s3prl (SURVEY.md §2.4: "Reimplement HuBERT/WavLM encoder
stacks in JAX"). Two normalization modes:

  * "group_norm"  (HuBERT/mHuBERT base): GroupNorm(512 groups) after the
    first conv only, no conv bias
  * "layer_norm"  (WavLM-Large): LayerNorm after every conv, conv bias

Strides multiply to 320 => 50 Hz frames at 16 kHz. Layout: (B, samples) ->
(B, frames, 512), channels-last throughout.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

# (dim, kernel, stride) — the standard 7-layer stack
DEFAULT_CONV_LAYERS: Tuple[Tuple[int, int, int], ...] = (
    (512, 10, 5), (512, 3, 2), (512, 3, 2), (512, 3, 2),
    (512, 3, 2), (512, 2, 2), (512, 2, 2),
)


class ConvFeatureExtractor(nn.Module):
    conv_layers: Tuple[Tuple[int, int, int], ...] = DEFAULT_CONV_LAYERS
    mode: str = "group_norm"  # or "layer_norm"
    conv_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, wav):
        x = wav[:, :, None].astype(self.dtype)  # (B, samples, 1)
        for i, (dim, k, stride) in enumerate(self.conv_layers):
            x = nn.Conv(
                dim, (k,), strides=(stride,), padding="VALID",
                use_bias=self.conv_bias or self.mode == "layer_norm",
                dtype=self.dtype, name=f"conv_{i}",
            )(x)
            if self.mode == "group_norm" and i == 0:
                # 512 groups over 512 channels == per-channel instance norm
                x = nn.GroupNorm(
                    num_groups=self.conv_layers[0][0], epsilon=1e-5,
                    dtype=jnp.float32, name=f"norm_{i}",
                )(x).astype(self.dtype)
            elif self.mode == "layer_norm":
                x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name=f"norm_{i}")(
                    x
                ).astype(self.dtype)
            x = nn.gelu(x, approximate=False)
        return x
