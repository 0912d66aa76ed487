"""Text / unit / contentvec encoder.

TPU-native re-design of the reference's Glow-TTS-style encoder
(/root/reference/unitspeech/encoder.py:253-309): embedding (or linear for
contentvec) -> 3-layer conv prenet with residual -> 6 transformer blocks with
window-limited relative-position attention (window_size=4) -> projection to
mel channels.

Differences from the reference that matter on TPU:
  * time-major channels-last layout (B, T, C) — feature dim rides the lanes;
    1x1 convs become Dense, k-wide convs are NTC `lax.conv`
  * relative-position logits are computed as a (T, 2w+1) gather instead of the
    reference's pad/reshape absolute<->relative index dance
    (encoder.py:168-182) — same math (verified in tests), no O(T^2) reshapes
  * all shapes static; masks multiplied through exactly like the reference

Numerics parity notes: custom channel LayerNorm uses eps=1e-4 (reference
encoder.py:13), attention mask fill is -1e4 (encoder.py:134).
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
from jax import lax


class ChannelLayerNorm(nn.Module):
    """LayerNorm over the channel (last) axis, eps=1e-4, biased variance —
    matches the reference's custom LayerNorm (encoder.py:12-30)."""

    channels: int
    eps: float = 1e-4

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.ones, (self.channels,))
        beta = self.param("beta", nn.initializers.zeros, (self.channels,))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
        return (x - mean) * lax.rsqrt(var + self.eps) * gamma + beta


def conv1d(x, kernel, bias=None):
    """NTC 1D convolution with 'same' odd-kernel padding."""
    k = kernel.shape[0]
    y = lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1,),
        padding=[(k // 2, k // 2)],
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    if bias is not None:
        y = y + bias
    return y


class Conv1d(nn.Module):
    features: int
    kernel_size: int
    use_bias: bool = True
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", self.kernel_init, (self.kernel_size, x.shape[-1], self.features)
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        return conv1d(x, kernel, bias)


class ConvReluNorm(nn.Module):
    """Prenet: (conv5 -> LN(1e-4) -> ReLU -> dropout) x n_layers, zero-init
    residual projection. Reference encoder.py:33-65."""

    hidden_channels: int
    out_channels: int
    kernel_size: int = 5
    n_layers: int = 3
    p_dropout: float = 0.5

    @nn.compact
    def __call__(self, x, x_mask, deterministic: bool = True):
        # x: (B, T, C); x_mask: (B, T, 1)
        x_org = x
        for i in range(self.n_layers):
            x = Conv1d(self.hidden_channels, self.kernel_size, name=f"conv_{i}")(
                x * x_mask
            )
            x = ChannelLayerNorm(self.hidden_channels, name=f"norm_{i}")(x)
            x = nn.relu(x)
            x = nn.Dropout(self.p_dropout)(x, deterministic=deterministic)
        # zero-init proj: prenet starts as identity (reference encoder.py:55-56)
        x = x_org + nn.Dense(
            self.out_channels,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="proj",
        )(x)
        return x * x_mask


class RelPositionMultiHeadAttention(nn.Module):
    """Self-attention with window-limited relative position bias
    (reference MultiHeadAttention, encoder.py:68-187, heads_share=True).

    rel logits: scores[b,h,i,j] += (q[b,h,i] . emb_k[j-i+w]) / sqrt(d)
    rel values: out[b,h,i]      += sum_r p[b,h,i,i+r-w] * emb_v[r]
    both only where |j-i| <= w; computed with gathers over a (T, 2w+1) band.
    """

    channels: int
    out_channels: int
    n_heads: int
    window_size: Optional[int] = None
    p_dropout: float = 0.0

    @nn.compact
    def __call__(self, x, attn_mask=None, deterministic: bool = True):
        b, t, _ = x.shape
        h = self.n_heads
        d = self.channels // h
        xavier = nn.initializers.xavier_uniform()
        q = nn.Dense(self.channels, kernel_init=xavier, name="conv_q")(x)
        k = nn.Dense(self.channels, kernel_init=xavier, name="conv_k")(x)
        v = nn.Dense(self.channels, kernel_init=xavier, name="conv_v")(x)
        # (B, H, T, d)
        q = q.reshape(b, t, h, d).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, h, d).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, h, d).transpose(0, 2, 1, 3)

        scores = jnp.einsum("bhid,bhjd->bhij", q, k) / math.sqrt(d)

        if self.window_size is not None:
            w = self.window_size
            r = 2 * w + 1
            rel_stddev = d ** -0.5
            emb_rel_k = self.param(
                "emb_rel_k", nn.initializers.normal(rel_stddev), (r, d)
            )
            # (B, H, T, r): q against every relative slot
            qe = jnp.einsum("bhid,rd->bhir", q, emb_rel_k) / math.sqrt(d)
            ii = jnp.arange(t)[:, None]
            jj = jnp.arange(t)[None, :]
            rel_idx = jj - ii + w  # (T, T)
            valid = (rel_idx >= 0) & (rel_idx < r)
            gathered = jnp.take_along_axis(
                qe, jnp.clip(rel_idx, 0, r - 1)[None, None], axis=-1
            )
            scores = scores + jnp.where(valid[None, None], gathered, 0.0)

        if attn_mask is not None:
            scores = jnp.where(attn_mask == 0, -1e4, scores)
        p_attn = nn.softmax(scores, axis=-1)
        p_attn = nn.Dropout(self.p_dropout)(p_attn, deterministic=deterministic)
        out = jnp.einsum("bhij,bhjd->bhid", p_attn, v)

        if self.window_size is not None:
            emb_rel_v = self.param(
                "emb_rel_v", nn.initializers.normal(rel_stddev), (r, d)
            )
            # weights_rel[b,h,i,r'] = p[b,h,i, i + r' - w]
            ii = jnp.arange(t)[:, None]
            rr = jnp.arange(r)[None, :]
            src = ii + rr - w  # (T, r)
            valid = (src >= 0) & (src < t)
            wrel = jnp.take_along_axis(
                p_attn, jnp.clip(src, 0, t - 1)[None, None], axis=-1
            )
            wrel = jnp.where(valid[None, None], wrel, 0.0)
            out = out + jnp.einsum("bhir,rd->bhid", wrel, emb_rel_v)

        out = out.transpose(0, 2, 1, 3).reshape(b, t, self.channels)
        return nn.Dense(self.out_channels, name="conv_o")(out)


class FFN(nn.Module):
    """Conv feed-forward (reference encoder.py:190-211)."""

    out_channels: int
    filter_channels: int
    kernel_size: int = 3
    p_dropout: float = 0.0

    @nn.compact
    def __call__(self, x, x_mask, deterministic: bool = True):
        x = Conv1d(self.filter_channels, self.kernel_size, name="conv_1")(x * x_mask)
        x = nn.relu(x)
        x = nn.Dropout(self.p_dropout)(x, deterministic=deterministic)
        x = Conv1d(self.out_channels, self.kernel_size, name="conv_2")(x * x_mask)
        return x * x_mask


class TransformerEncoder(nn.Module):
    """Post-LN transformer stack (reference EncoderModule, encoder.py:214-250)."""

    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int = 3
    p_dropout: float = 0.0
    window_size: Optional[int] = None

    @nn.compact
    def __call__(self, x, x_mask, deterministic: bool = True):
        # x: (B, T, C); x_mask: (B, T, 1)
        attn_mask = x_mask[:, None, :, 0][:, :, :, None] * x_mask[:, None, None, :, 0]
        for i in range(self.n_layers):
            x = x * x_mask
            y = RelPositionMultiHeadAttention(
                self.hidden_channels,
                self.hidden_channels,
                self.n_heads,
                window_size=self.window_size,
                p_dropout=self.p_dropout,
                name=f"attn_{i}",
            )(x, attn_mask, deterministic=deterministic)
            y = nn.Dropout(self.p_dropout)(y, deterministic=deterministic)
            x = ChannelLayerNorm(self.hidden_channels, name=f"norm1_{i}")(x + y)
            y = FFN(
                self.hidden_channels,
                self.filter_channels,
                self.kernel_size,
                self.p_dropout,
                name=f"ffn_{i}",
            )(x, x_mask, deterministic=deterministic)
            y = nn.Dropout(self.p_dropout)(y, deterministic=deterministic)
            x = ChannelLayerNorm(self.hidden_channels, name=f"norm2_{i}")(x + y)
        return x * x_mask


class Encoder(nn.Module):
    """Full encoder; one class, three uses (text / unit / contentvec), like
    the reference Encoder (encoder.py:253-309).

    Call: (tokens (B, T) int32 or contentvec (B, T, n_contentvec) float,
           lengths (B,)) -> (mu_x (B, T, n_feats), hidden (B, T, C),
           mask (B, T, 1)).
    """

    n_vocab: int
    n_feats: int
    n_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int
    p_dropout: float
    n_contentvec: int = 0
    window_size: Optional[int] = 4

    @nn.compact
    def __call__(self, x, x_lengths, deterministic: bool = True):
        from unitspeech_tpu.ops.masking import sequence_mask

        scale = math.sqrt(self.n_channels)
        if self.n_contentvec > 0:
            emb = nn.Dense(
                self.n_channels,
                use_bias=False,
                kernel_init=nn.initializers.normal(self.n_channels ** -0.5),
                name="emb",
            )(x)
        else:
            emb = nn.Embed(
                self.n_vocab,
                self.n_channels,
                embedding_init=nn.initializers.normal(self.n_channels ** -0.5),
                name="emb",
            )(x)
        hidden = emb * scale  # (B, T, C)
        t = hidden.shape[1]
        x_mask = sequence_mask(x_lengths, t, dtype=hidden.dtype)[:, :, None]

        hidden = ConvReluNorm(
            self.n_channels, self.n_channels, name="prenet"
        )(hidden, x_mask, deterministic=deterministic)
        hidden = TransformerEncoder(
            self.n_channels,
            self.filter_channels,
            self.n_heads,
            self.n_layers,
            self.kernel_size,
            self.p_dropout,
            window_size=self.window_size,
            name="encoder",
        )(hidden, x_mask, deterministic=deterministic)
        mu_x = nn.Dense(self.n_feats, name="proj_m")(hidden) * x_mask
        return mu_x, hidden, x_mask

    @classmethod
    def from_config(cls, cfg, **overrides):
        kw = dict(
            n_vocab=cfg.n_vocab,
            n_feats=cfg.n_feats,
            n_channels=cfg.n_channels,
            filter_channels=cfg.filter_channels,
            n_heads=cfg.n_heads,
            n_layers=cfg.n_layers,
            kernel_size=cfg.kernel_size,
            p_dropout=cfg.p_dropout,
            n_contentvec=cfg.n_contentvec,
            window_size=cfg.window_size,
        )
        kw.update(overrides)
        return cls(**kw)
