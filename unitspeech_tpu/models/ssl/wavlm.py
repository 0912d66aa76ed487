"""WavLM encoder (Large preset) — the speaker embedder's feature backbone.

JAX re-implementation of microsoft/unilm WavLM as loaded by the reference's
s3prl UpstreamExpert (/root/reference/unitspeech/speaker_encoder/utils.py:
40-79, config feat_type="wavlm_large", hydra_config.py:166-175):
layer-norm conv extractor -> 1024-d pre-LN transformer (24 layers) with
gated relative position bias. Returns all 25 hidden states (embedding +
24 layers) for the ECAPA layer-weighted sum (ecapa_tdnn.py:261-269).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from unitspeech_tpu.models.ssl.feature_extractor import (
    DEFAULT_CONV_LAYERS,
    ConvFeatureExtractor,
)
from unitspeech_tpu.models.ssl.transformer import SSLTransformerEncoder


@dataclass(frozen=True)
class WavLMConfig:
    extractor_mode: str = "layer_norm"
    conv_layers: Tuple[Tuple[int, int, int], ...] = DEFAULT_CONV_LAYERS
    conv_bias: bool = True
    embed_dim: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    ffn_dim: int = 4096
    layer_norm_first: bool = True
    relative_position_embedding: bool = True
    gru_rel_pos: bool = True
    num_buckets: int = 320
    max_distance: int = 800
    conv_pos: int = 128
    conv_pos_groups: int = 16


def wavlm_large_config() -> WavLMConfig:
    return WavLMConfig()


def wavlm_base_config() -> WavLMConfig:
    return WavLMConfig(
        extractor_mode="group_norm", conv_bias=False, embed_dim=768,
        num_layers=12, num_heads=12, ffn_dim=3072, layer_norm_first=False,
    )


def wavlm_test_config() -> WavLMConfig:
    """Tiny WavLM for smoke/dev runs and CLI e2e tests (no reference
    equivalent — real runs use wavlm_large)."""
    return WavLMConfig(
        conv_layers=((8, 10, 5), (8, 3, 2), (8, 2, 2)),
        embed_dim=16, num_layers=2, num_heads=2, ffn_dim=32,
        num_buckets=16, max_distance=64, conv_pos=8, conv_pos_groups=2,
    )


class WavLMModel(nn.Module):
    config: WavLMConfig = WavLMConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, wav):
        """wav: (B, samples) 16 kHz -> (final (B, T, D), hidden_states
        [embedding, layer1..layerN] each (B, T, D))."""
        c = self.config
        x = ConvFeatureExtractor(
            c.conv_layers, c.extractor_mode, c.conv_bias, dtype=self.dtype,
            name="feature_extractor",
        )(wav)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="layer_norm")(
            x
        ).astype(self.dtype)
        if x.shape[-1] != c.embed_dim:
            x = nn.Dense(c.embed_dim, dtype=self.dtype, name="post_extract_proj")(x)
        x, hidden = SSLTransformerEncoder(
            embed_dim=c.embed_dim, num_layers=c.num_layers, num_heads=c.num_heads,
            ffn_dim=c.ffn_dim, layer_norm_first=c.layer_norm_first,
            relative_position_embedding=c.relative_position_embedding,
            gru_rel_pos=c.gru_rel_pos, num_buckets=c.num_buckets,
            max_distance=c.max_distance, conv_pos=c.conv_pos,
            conv_pos_groups=c.conv_pos_groups, dtype=self.dtype, name="encoder",
        )(x)
        return x, hidden
