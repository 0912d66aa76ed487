"""Transformer encoder for SSL speech models (HuBERT / WavLM).

JAX re-implementation of the fairseq/unilm TransformerEncoder used by the
reference's feature extractors (SURVEY.md §2.4). Supports:

  * convolutional relative positional embedding (k=128, 16 groups,
    weight-norm folded at conversion)
  * post-LN (HuBERT base, layer_norm_first=False) and pre-LN (WavLM-Large,
    layer_norm_first=True)
  * WavLM's gated relative position bias: bucketed relative positions ->
    per-head bias embedded in layer 0, shared across layers, gated per
    query (gru_rel_pos)
  * returns ALL layer outputs so callers can pick a layer (mHuBERT layer 6
    for units) or learn a weighted sum (ECAPA over WavLM hidden_states)
"""

from __future__ import annotations

import math
from typing import Any, List, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def relative_position_bucket(
    relative_position, num_buckets: int = 320, max_distance: int = 800
):
    """Bidirectional T5-style bucketing (WavLM compute_bias)."""
    ret = 0
    n = -relative_position
    num_buckets //= 2
    ret += (n < 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(n)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-9)
        / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    ret += jnp.where(is_small, n, val_if_large)
    return ret


class ConvPositionalEmbedding(nn.Module):
    """Grouped conv positional embedding (fairseq pos_conv): k=128, groups=16,
    GELU, trailing element dropped for even kernels. Weight norm is folded
    into the kernel at conversion time."""

    embed_dim: int
    kernel_size: int = 128
    groups: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        pad = k // 2
        kernel = self.param(
            "kernel",
            nn.initializers.normal(math.sqrt(4.0 / (k * self.embed_dim))),
            (k, self.embed_dim // self.groups, self.embed_dim),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.embed_dim,))
        from jax import lax

        y = lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=(1,), padding=[(pad, pad)],
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=self.groups,
        ) + bias.astype(self.dtype)
        if k % 2 == 0:
            y = y[:, :-1]
        return nn.gelu(y, approximate=False)


class SSLSelfAttention(nn.Module):
    """Multi-head self-attention with optional WavLM gated relative position
    bias. Returns (output, position_bias) so the bias computes once in layer 0
    and flows through the stack."""

    embed_dim: int
    num_heads: int
    has_relative_attention_bias: bool = False
    num_buckets: int = 320
    max_distance: int = 800
    gru_rel_pos: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, padding_mask=None, position_bias=None):
        b, t, _ = x.shape
        h = self.num_heads
        d = self.embed_dim // h

        if self.has_relative_attention_bias and position_bias is None:
            rel_embed = self.param(
                "rel_attn_embed", nn.initializers.normal(0.02),
                (self.num_buckets, h),
            )
            pos = jnp.arange(t)
            rel = pos[None, :] - pos[:, None]  # memory - query
            buckets = relative_position_bucket(
                rel, self.num_buckets, self.max_distance
            )
            position_bias = rel_embed[buckets]  # (T, T, H)
            position_bias = position_bias.transpose(2, 0, 1)  # (H, T, T)

        q = nn.Dense(self.embed_dim, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(self.embed_dim, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(self.embed_dim, dtype=self.dtype, name="v_proj")(x)
        q = q.reshape(b, t, h, d).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, h, d).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, h, d).transpose(0, 2, 1, 3)

        scores = jnp.einsum("bhid,bhjd->bhij", q, k) / math.sqrt(d)

        if position_bias is not None:
            bias = position_bias[None]  # (1, H, T, T)
            if self.gru_rel_pos:
                # gate from the query (WavLM gru_rel_pos): sigmoid gates a, b
                gates = nn.Dense(8, dtype=self.dtype, name="grep_linear")(
                    q
                )  # (B,H,T,8)
                gates = gates.reshape(b, h, t, 2, 4).sum(-1)
                gate_ab = nn.sigmoid(gates)
                gate_a, gate_b = gate_ab[..., 0], gate_ab[..., 1]
                grep_a = self.param(
                    "grep_a", nn.initializers.ones, (1, h, 1, 1)
                )
                gate_a_1 = gate_a * (gate_b * grep_a[:, :, :, 0] - 1.0) + 2.0
                bias = gate_a_1[..., None] * bias
            scores = scores + bias

        if padding_mask is not None:
            scores = jnp.where(padding_mask[:, None, None, :] == 0, -1e9, scores)
        attn = nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, self.embed_dim)
        out = nn.Dense(self.embed_dim, dtype=self.dtype, name="out_proj")(out)
        return out, position_bias


class SSLEncoderLayer(nn.Module):
    embed_dim: int
    num_heads: int
    ffn_dim: int
    layer_norm_first: bool = False
    has_relative_attention_bias: bool = False
    gru_rel_pos: bool = False
    num_buckets: int = 320
    max_distance: int = 800
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, padding_mask=None, position_bias=None):
        attn = SSLSelfAttention(
            self.embed_dim, self.num_heads,
            has_relative_attention_bias=self.has_relative_attention_bias,
            num_buckets=self.num_buckets, max_distance=self.max_distance,
            gru_rel_pos=self.gru_rel_pos, dtype=self.dtype, name="self_attn",
        )
        ln1 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="self_attn_layer_norm")
        ln2 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="final_layer_norm")
        fc1 = nn.Dense(self.ffn_dim, dtype=self.dtype, name="fc1")
        fc2 = nn.Dense(self.embed_dim, dtype=self.dtype, name="fc2")

        if self.layer_norm_first:
            y, position_bias = attn(
                ln1(x).astype(self.dtype), padding_mask, position_bias
            )
            x = x + y
            y = fc2(nn.gelu(fc1(ln2(x).astype(self.dtype)), approximate=False))
            x = x + y
        else:
            y, position_bias = attn(x, padding_mask, position_bias)
            x = ln1(x + y).astype(self.dtype)
            y = fc2(nn.gelu(fc1(x), approximate=False))
            x = ln2(x + y).astype(self.dtype)
        return x, position_bias


class SSLTransformerEncoder(nn.Module):
    """pos-conv + N layers; returns the final output and every layer's input
    hidden state (fairseq layer_results convention: hidden_states[i] is the
    INPUT to layer i; index 0 = post-pos-conv embedding)."""

    embed_dim: int
    num_layers: int
    num_heads: int
    ffn_dim: int
    layer_norm_first: bool = False
    relative_position_embedding: bool = False
    gru_rel_pos: bool = False
    num_buckets: int = 320
    max_distance: int = 800
    conv_pos: int = 128
    conv_pos_groups: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, padding_mask=None, output_layer: Optional[int] = None):
        pos = ConvPositionalEmbedding(
            self.embed_dim, self.conv_pos, self.conv_pos_groups,
            dtype=self.dtype, name="pos_conv",
        )(x)
        x = x + pos
        if not self.layer_norm_first:
            x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="layer_norm")(
                x
            ).astype(self.dtype)

        hidden_states: List[jnp.ndarray] = [x]
        position_bias = None
        n = self.num_layers if output_layer is None else output_layer
        for i in range(self.num_layers):
            if i >= n:
                break
            x, position_bias = SSLEncoderLayer(
                self.embed_dim, self.num_heads, self.ffn_dim,
                layer_norm_first=self.layer_norm_first,
                has_relative_attention_bias=(
                    self.relative_position_embedding and i == 0
                ),
                gru_rel_pos=self.gru_rel_pos,
                num_buckets=self.num_buckets, max_distance=self.max_distance,
                dtype=self.dtype, name=f"layer_{i}",
            )(x, padding_mask, position_bias)
            hidden_states.append(x)
        if self.layer_norm_first and n == self.num_layers:
            x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="layer_norm")(
                x
            ).astype(self.dtype)
        return x, hidden_states
