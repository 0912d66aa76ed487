"""ECAPA-TDNN speaker embedder on WavLM features.

JAX re-implementation of the reference's ECAPA_TDNN_SMALL
(/root/reference/unitspeech/speaker_encoder/ecapa_tdnn.py:164-298):

  wav 16 kHz -> WavLM-Large hidden states (25) -> softmax layer-weighted sum
  (ecapa_tdnn.py:261-269) -> InstanceNorm over channels -> TDNN layer1 +
  3 SE-Res2Blocks (dilations 2/3/4, scale 8) -> cat(out2,out3,out4) ->
  1x1 conv 1536 -> attentive stats pooling -> BatchNorm -> Linear -> 256-d.

Faithful quirks: Res2 blocks apply conv -> ReLU -> BN in that order
(ecapa_tdnn.py:43-45); attention uses tanh (not ReLU, :154-155); callers
unit-normalize the output embedding (finetune.py:108-110).

Layout: channels-last (B, T, C). BatchNorms run with running statistics (the
speaker encoder is a frozen feature extractor in every reference code path,
ecapa_tdnn.py:216-218).
"""

from __future__ import annotations

from typing import Any, List

import flax.linen as nn
import jax.numpy as jnp

from unitspeech_tpu.models.ssl.wavlm import WavLMConfig, WavLMModel


def _bn(name: str):
    return nn.BatchNorm(
        use_running_average=True, epsilon=1e-5, momentum=0.9,
        dtype=jnp.float32, name=name,
    )


class Conv1dReluBn(nn.Module):
    """conv -> ReLU -> BatchNorm (ecapa_tdnn.py:58-65)."""

    out_channels: int
    kernel_size: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel_size * self.dilation - self.dilation) // 2
        x = nn.Conv(
            self.out_channels, (self.kernel_size,), kernel_dilation=(self.dilation,),
            padding=[(pad, pad)], dtype=self.dtype, name="conv",
        )(x)
        return _bn("bn")(nn.relu(x))


class Res2Conv1dReluBn(nn.Module):
    """Res2Net-style split conv (ecapa_tdnn.py:15-51): channels split into
    `scale` groups; group i (1..scale-2) convolves (prev + group) and the last
    group passes through."""

    channels: int
    kernel_size: int = 3
    dilation: int = 1
    scale: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        width = self.channels // self.scale
        nums = self.scale if self.scale == 1 else self.scale - 1
        pad = (self.kernel_size * self.dilation - self.dilation) // 2
        splits = [x[..., i * width : (i + 1) * width] for i in range(self.scale)]
        out: List = []
        sp = None
        for i in range(nums):
            sp = splits[i] if i == 0 else sp + splits[i]
            sp = nn.Conv(
                width, (self.kernel_size,), kernel_dilation=(self.dilation,),
                padding=[(pad, pad)], dtype=self.dtype, name=f"conv_{i}",
            )(sp)
            sp = _bn(f"bn_{i}")(nn.relu(sp))
            out.append(sp)
        if self.scale != 1:
            out.append(splits[nums])
        return jnp.concatenate(out, axis=-1)


class SEConnect(nn.Module):
    """Squeeze-excite over time (ecapa_tdnn.py:72-84)."""

    channels: int
    bottleneck: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = x.mean(axis=1)  # (B, C)
        s = nn.relu(nn.Dense(self.bottleneck, dtype=self.dtype, name="linear1")(s))
        s = nn.sigmoid(nn.Dense(self.channels, dtype=self.dtype, name="linear2")(s))
        return x * s[:, None, :]


class SERes2Block(nn.Module):
    """1x1 conv -> Res2 conv -> 1x1 conv -> SE, residual (ecapa_tdnn.py:100-126)."""

    channels: int
    kernel_size: int = 3
    dilation: int = 1
    scale: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        x = Conv1dReluBn(self.channels, 1, dtype=self.dtype, name="conv1")(x)
        x = Res2Conv1dReluBn(
            self.channels, self.kernel_size, self.dilation, self.scale,
            dtype=self.dtype, name="res2",
        )(x)
        x = Conv1dReluBn(self.channels, 1, dtype=self.dtype, name="conv2")(x)
        x = SEConnect(self.channels, dtype=self.dtype, name="se")(x)
        return x + residual


class AttentiveStatsPool(nn.Module):
    """tanh-attention weighted mean + std over time (ecapa_tdnn.py:133-161)."""

    in_dim: int
    attention_channels: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        a = jnp.tanh(nn.Dense(self.attention_channels, dtype=self.dtype, name="linear1")(x))
        a = nn.Dense(self.in_dim, dtype=self.dtype, name="linear2")(a)
        alpha = nn.softmax(a, axis=1)  # over time
        mean = jnp.sum(alpha * x, axis=1)
        var = jnp.sum(alpha * x ** 2, axis=1) - mean ** 2
        std = jnp.sqrt(jnp.clip(var, 1e-9, None))
        return jnp.concatenate([mean, std], axis=-1)


class EcapaTdnn(nn.Module):
    """Feature-sequence -> embedding head (everything after the SSL backbone).
    Input: stacked hidden states (L, B, T, D)."""

    feat_dim: int = 1024
    channels: int = 512
    emb_dim: int = 256
    n_hidden_states: int = 25
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden_states):
        # softmax layer-weighted sum (ecapa_tdnn.py:261-269)
        w = self.param(
            "feature_weight", nn.initializers.zeros, (self.n_hidden_states,)
        )
        w = nn.softmax(w)
        x = jnp.einsum("l,lbtd->btd", w, hidden_states) + 1e-6
        # InstanceNorm1d(feat_dim): per (sample, channel) over time, no affine
        mean = x.mean(axis=1, keepdims=True)
        var = ((x - mean) ** 2).mean(axis=1, keepdims=True)
        x = (x - mean) / jnp.sqrt(var + 1e-5)

        out1 = Conv1dReluBn(self.channels, 5, dtype=self.dtype, name="layer1")(x)
        out2 = SERes2Block(self.channels, 3, 2, 8, dtype=self.dtype, name="layer2")(out1)
        out3 = SERes2Block(self.channels, 3, 3, 8, dtype=self.dtype, name="layer3")(out2)
        out4 = SERes2Block(self.channels, 3, 4, 8, dtype=self.dtype, name="layer4")(out3)
        out = jnp.concatenate([out2, out3, out4], axis=-1)  # (B, T, 1536)
        out = nn.relu(nn.Dense(1536, dtype=self.dtype, name="conv")(out))
        out = AttentiveStatsPool(1536, 128, dtype=self.dtype, name="pooling")(out)
        out = _bn("bn")(out)
        return nn.Dense(self.emb_dim, dtype=self.dtype, name="linear")(out)


class SpeakerEmbedder(nn.Module):
    """Full wav -> 256-d speaker embedding (WavLM-Large + ECAPA)."""

    wavlm_config: WavLMConfig = WavLMConfig()
    channels: int = 512
    emb_dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, wav):
        _, hidden = WavLMModel(self.wavlm_config, dtype=self.dtype, name="wavlm")(wav)
        stacked = jnp.stack(hidden, axis=0)  # (L, B, T, D)
        return EcapaTdnn(
            feat_dim=self.wavlm_config.embed_dim, channels=self.channels,
            emb_dim=self.emb_dim, n_hidden_states=len(hidden),
            dtype=self.dtype, name="ecapa",
        )(stacked)

    @classmethod
    def from_config(cls, cfg, dtype=jnp.float32):
        """Build from SpeakerEmbedderConfig (config.py): feat_type selects the
        WavLM variant (reference conf/hydra_config.py:166-175 pins
        wavlm_large; wavlm-test exists for smoke/CLI tests)."""
        from unitspeech_tpu.models.ssl.wavlm import (
            wavlm_base_config,
            wavlm_large_config,
            wavlm_test_config,
        )

        table = {
            "wavlm_large": wavlm_large_config,
            "wavlm_base": wavlm_base_config,
            "wavlm_test": wavlm_test_config,
        }
        if cfg.feat_type not in table:
            raise KeyError(
                f"unknown feat_type {cfg.feat_type!r}; known: {sorted(table)}"
            )
        wavlm_cfg = table[cfg.feat_type]()
        return cls(
            wavlm_config=wavlm_cfg, channels=cfg.channels,
            emb_dim=cfg.spk_emb_dim, dtype=dtype,
        )
