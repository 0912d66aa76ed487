"""HuBERT encoder (mHuBERT preset) — the unit extractor's dense model.

JAX re-implementation of the fairseq HubertModel the reference loads through
textlesslib (/root/reference/unitspeech/textlesslib/textless/data/
hubert_feature_reader.py:12-76): conv feature extractor -> LayerNorm ->
512->768 projection -> 12-layer post-LN transformer; features are taken from
layer 6 for mHuBERT units (hop 320 => 50 Hz).

Long inputs are processed in 100 s chunks like the reference
(hubert_feature_reader.py:67-76) — chunking happens on host between jit calls
so each chunk keeps a static shape.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from unitspeech_tpu.models.ssl.feature_extractor import (
    DEFAULT_CONV_LAYERS,
    ConvFeatureExtractor,
)
from unitspeech_tpu.models.ssl.transformer import SSLTransformerEncoder


@dataclass(frozen=True)
class HubertConfig:
    extractor_mode: str = "group_norm"
    conv_layers: Tuple[Tuple[int, int, int], ...] = DEFAULT_CONV_LAYERS
    conv_bias: bool = False
    embed_dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    ffn_dim: int = 3072
    layer_norm_first: bool = False
    conv_pos: int = 128
    conv_pos_groups: int = 16


def mhubert_base_config() -> HubertConfig:
    """mhubert-base-vp_en_es_fr (textless registry, textless/__init__.py)."""
    return HubertConfig()


def hubert_test_config() -> HubertConfig:
    """Tiny HuBERT for smoke/dev runs and CLI e2e tests (no reference
    equivalent — real runs use mhubert_base)."""
    return HubertConfig(
        conv_layers=((8, 10, 5), (8, 3, 2), (8, 2, 2)),
        embed_dim=16, num_layers=3, num_heads=2, ffn_dim=32,
        conv_pos=8, conv_pos_groups=2,
    )


def hubert_config_by_name(name: str) -> HubertConfig:
    """Dense-model registry lookup (reference textless/__init__.py:12-34)."""
    table = {
        "mhubert-base-vp_en_es_fr": mhubert_base_config,
        "hubert-test": hubert_test_config,
    }
    if name not in table:
        raise KeyError(f"unknown dense model {name!r}; known: {sorted(table)}")
    return table[name]()


class HubertModel(nn.Module):
    config: HubertConfig = HubertConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, wav, output_layer: Optional[int] = None):
        """wav: (B, samples) 16 kHz in [-1,1] ->
        (features (B, frames, D), hidden_states list).

        output_layer follows the fairseq convention: layer 6 means the OUTPUT
        of the 6th transformer layer (hidden_states[6])."""
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
            conv_pos=c.conv_pos, conv_pos_groups=c.conv_pos_groups,
            dtype=self.dtype, name="encoder",
        )(x, output_layer=output_layer)
        feats = hidden[output_layer] if output_layer is not None else x
        return feats.astype(jnp.float32), hidden


@partial(jax.jit, static_argnames=("model", "output_layer", "length"))
def _hubert_features_fixed(model, params, wav, output_layer: int, length: int):
    feats, _ = model.apply(params, wav[:, :length], output_layer=output_layer)
    return feats


class HubertFeatureReader:
    """Host-side wrapper: pads to sample buckets (bounded recompiles) and
    chunks inputs longer than max_chunk (reference hubert_feature_reader.py:
    67-76 uses 100 s)."""

    def __init__(self, model: HubertModel, params, layer: int = 6,
                 max_chunk: int = 1_600_000, hop: int = 320):
        self.model = model
        self.params = params
        self.layer = layer
        self.max_chunk = max_chunk
        self.hop = hop
        # sample buckets: multiples of hop * 64, covering max_chunk
        step = hop * 64
        self.buckets = [step * i for i in range(1, max(max_chunk // step, 1) + 1)]
        if self.buckets[-1] < max_chunk:
            self.buckets.append(self.buckets[-1] + step)

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if b >= n:
                return b
        return self.buckets[-1]

    def _n_frames(self, n_samples: int) -> int:
        """Exact conv-stack output length (per-layer VALID-conv arithmetic)."""
        n = n_samples
        for _, k, s in self.model.config.conv_layers:
            if n < k:
                return 0
            n = (n - k) // s + 1
        return n

    def __call__(self, wav: np.ndarray) -> np.ndarray:
        """wav: (samples,) -> (frames, D) float32."""
        wav = np.asarray(wav, np.float32)
        outs = []
        for start in range(0, len(wav), self.max_chunk):
            chunk = wav[start : start + self.max_chunk]
            n_frames = self._n_frames(len(chunk))
            if n_frames <= 0:
                continue
            padded_len = self._bucket(len(chunk))
            padded = np.zeros((1, padded_len), np.float32)
            padded[0, : len(chunk)] = chunk
            feats = _hubert_features_fixed(
                self.model, self.params, jnp.asarray(padded), self.layer, padded_len
            )
            outs.append(np.asarray(feats[0, :n_frames]))
        if outs:
            return np.concatenate(outs, axis=0)
        return np.zeros((0, self.model.config.embed_dim), np.float32)
