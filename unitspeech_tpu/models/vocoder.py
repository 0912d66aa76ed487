"""BigVGAN vocoder (generator) — mel (B, T, 80) -> waveform (B, T*256).

TPU-native re-design of the reference BigVGAN
(/root/reference/unitspeech/vocoder/models.py:121-201) and its anti-aliased
snake activation stack (vocoder/activations.py, vocoder/alias_free_torch/*):

  * channels-last (B, T, C) layout; depthwise kaiser-sinc resampling filters
    are host-precomputed constants
  * weight normalization is folded into plain kernels at weight-conversion
    time (equivalent to the reference's remove_weight_norm inference path,
    models.py:193-201), so the forward graph is pure convs
  * anti-aliased activation: 2x kaiser-sinc upsample -> snake/snakebeta ->
    2x kaiser-sinc downsample (reference alias_free_torch/act.py:8-27)

Config (22 kHz / 80-band): 4 transposed-conv upsample stages (8,8,2,2),
3 parallel AMP resblocks per stage (kernels 3/7/11, dilations 1/3/5),
snakebeta activations with log-scale parameters.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
from jax import lax


# ---------------------------------------------------------------------------
# kaiser-sinc filters (host-side constants; reference filter.py:28-57)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=16)
def kaiser_sinc_filter1d(cutoff: float, half_width: float, kernel_size: int) -> np.ndarray:
    """Kaiser-windowed sinc low-pass prototype, sums to 1. (kernel_size,)"""
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2
    delta_f = 4 * half_width
    a = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if a > 50.0:
        beta = 0.1102 * (a - 8.7)
    elif a >= 21.0:
        beta = 0.5842 * (a - 21) ** 0.4 + 0.07886 * (a - 21.0)
    else:
        beta = 0.0
    window = np.kaiser(kernel_size, beta)
    if even:
        time = np.arange(-half_size, half_size) + 0.5
    else:
        time = np.arange(kernel_size) - half_size
    if cutoff == 0:
        return np.zeros(kernel_size, dtype=np.float32)
    filt = 2 * cutoff * window * np.sinc(2 * cutoff * time)
    filt /= filt.sum()
    return filt.astype(np.float32)


def _depthwise_conv(x, filt, stride: int = 1, pad=(0, 0), pad_mode: str = "edge"):
    """x: (B, T, C); filt: (K,) shared across channels (the reference expands
    one prototype filter to all channels, filter.py:88-92)."""
    c = x.shape[-1]
    if pad != (0, 0):
        x = jnp.pad(x, ((0, 0), pad, (0, 0)), mode=pad_mode)
    kernel = jnp.broadcast_to(
        jnp.asarray(filt)[:, None, None], (filt.shape[0], 1, c)
    ).astype(x.dtype)
    return lax.conv_general_dilated(
        x, kernel, window_strides=(stride,), padding=[(0, 0)],
        dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=c,
    )


def upsample1d(x, ratio: int = 2, kernel_size: int | None = None):
    """Anti-aliased 2x upsample (reference resample.py:10-35)."""
    k = int(6 * ratio // 2) * 2 if kernel_size is None else kernel_size
    stride = ratio
    pad = k // ratio - 1
    pad_left = pad * stride + (k - stride) // 2
    pad_right = pad * stride + (k - stride + 1) // 2
    filt = kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, k)
    x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="edge")
    c = x.shape[-1]
    # torch conv_transpose1d == lhs-dilated conv with the flipped kernel
    kernel = jnp.broadcast_to(
        jnp.asarray(filt[::-1].copy())[:, None, None], (k, 1, c)
    ).astype(x.dtype)
    y = ratio * lax.conv_general_dilated(
        x, kernel, window_strides=(1,), padding=[(k - 1, k - 1)],
        lhs_dilation=(stride,), dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=c,
    )
    return y[:, pad_left : y.shape[1] - pad_right]


def downsample1d(x, ratio: int = 2, kernel_size: int | None = None):
    """Anti-aliased 2x downsample (reference resample.py:38-48)."""
    k = int(6 * ratio // 2) * 2 if kernel_size is None else kernel_size
    even = k % 2 == 0
    pad_left = k // 2 - int(even)
    pad_right = k // 2
    filt = kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, k)
    return _depthwise_conv(x, filt, stride=ratio, pad=(pad_left, pad_right))


# ---------------------------------------------------------------------------
# snake activations (reference activations.py:9-119)
# ---------------------------------------------------------------------------


class Snake(nn.Module):
    """x + (1/alpha) sin^2(alpha x), per-channel trainable alpha."""

    channels: int
    alpha_logscale: bool = False

    def setup(self):
        init = nn.initializers.zeros if self.alpha_logscale else nn.initializers.ones
        self.alpha = self.param("alpha", init, (self.channels,))

    def params_ab(self):
        """Raw (alpha, beta) parameters; Snake reuses alpha as beta."""
        return self.alpha, self.alpha

    def __call__(self, x):
        alpha = self.alpha.astype(x.dtype)
        if self.alpha_logscale:
            alpha = jnp.exp(alpha)
        return x + (1.0 / (alpha + 1e-9)) * jnp.sin(x * alpha) ** 2


class SnakeBeta(nn.Module):
    """x + (1/beta) sin^2(alpha x), separate magnitude parameter."""

    channels: int
    alpha_logscale: bool = False

    def setup(self):
        init = nn.initializers.zeros if self.alpha_logscale else nn.initializers.ones
        self.alpha = self.param("alpha", init, (self.channels,))
        self.beta = self.param("beta", init, (self.channels,))

    def params_ab(self):
        return self.alpha, self.beta

    def __call__(self, x):
        alpha = self.alpha.astype(x.dtype)
        beta = self.beta.astype(x.dtype)
        if self.alpha_logscale:
            alpha = jnp.exp(alpha)
            beta = jnp.exp(beta)
        return x + (1.0 / (beta + 1e-9)) * jnp.sin(x * alpha) ** 2


class AntiAliasedActivation(nn.Module):
    """upsample 2x -> snake -> downsample 2x (reference act.py:8-27).

    use_pallas=True runs the whole chain as one fused Pallas kernel
    (ops/pallas_kernels.fused_aa_snake): one HBM read + one write instead of
    ~6 passes at the 2x rate. Interior-exact; utterance-edge samples use
    extended-LTI padding (see the kernel docstring)."""

    channels: int
    activation: str = "snakebeta"
    alpha_logscale: bool = True
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, conv_kernel=None, conv_bias=None, dilation: int = 1,
                 residual=None):
        """Optionally fuses the FOLLOWING k=3 dilated conv (+ residual add)
        into the activation kernel when conv_kernel/conv_bias are passed
        (AMPBlock fast path) — the conv params live with the caller so the
        parameter tree matches the unfused layout exactly."""
        act_cls = SnakeBeta if self.activation == "snakebeta" else Snake
        act = act_cls(self.channels, self.alpha_logscale, name="act")
        if self.use_pallas:
            from unitspeech_tpu.ops.pallas_kernels import (
                fused_aa_snake, fused_aa_snake_conv,
            )

            alpha, beta = act.params_ab()
            if conv_kernel is not None:
                return fused_aa_snake_conv(
                    x, alpha, beta, conv_kernel, conv_bias,
                    dilation=dilation, residual=residual,
                    logscale=self.alpha_logscale,
                )
            return fused_aa_snake(x, alpha, beta, logscale=self.alpha_logscale)
        y = downsample1d(act(upsample1d(x)))
        if conv_kernel is not None:
            pad = dilation
            y = lax.conv_general_dilated(
                y, conv_kernel.astype(y.dtype), (1,), [(pad, pad)],
                rhs_dilation=(dilation,),
                dimension_numbers=("NWC", "WIO", "NWC"),
            ) + conv_bias.astype(y.dtype)
            if residual is not None:
                y = y + residual
        return y


# ---------------------------------------------------------------------------
# generator
# ---------------------------------------------------------------------------


class _Conv1dParams(nn.Module):
    """Parameter holder with nn.Conv's 1D tree (kernel (k, in, out) + bias)
    and identical init, so the fused AA+conv kernel shares checkpoints with
    the XLA path."""

    features: int
    ksize: int = 3

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.ksize, in_features, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


def _conv1d_torchpad(features: int, kernel_size: int, dilation: int = 1,
                     name=None, dtype=None):
    # dtype MUST be threaded: flax's default promotes bf16 activations back
    # to f32 (f32 params), which silently doubled the whole vocoder's HBM
    # traffic (profiled: 16/19 aa_snake kernels ran f32 under the bf16 knob)
    pad = (kernel_size * dilation - dilation) // 2
    return nn.Conv(
        features, (kernel_size,), kernel_dilation=(dilation,),
        padding=[(pad, pad)], name=name, dtype=dtype,
    )


class AMPBlock1(nn.Module):
    """3x (aa-act -> dilated conv -> aa-act -> conv) with residuals
    (reference models.py:18-76)."""

    channels: int
    kernel_size: int = 3
    dilation: Tuple[int, ...] = (1, 3, 5)
    activation: str = "snakebeta"
    alpha_logscale: bool = True
    use_pallas: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # fused path: AA-activation + k=3 conv (+ residual) as single Pallas
        # kernels (ops/pallas_kernels.fused_aa_snake_conv) — the XLA convs/
        # adds at the top stages run C=32 on 128 lanes (4x waste) with an
        # HBM round trip per op. Requires k=3 and dilation reach <= CONV_EXT.
        fuse = self.use_pallas and self.kernel_size % 2 == 1
        for i, d in enumerate(self.dilation):
            if fuse:
                k1, b1 = _Conv1dParams(
                    self.channels, ksize=self.kernel_size, name=f"conv1_{i}"
                )(self.channels)
                xt = AntiAliasedActivation(
                    self.channels, self.activation, self.alpha_logscale,
                    use_pallas=True, name=f"act1_{i}",
                )(x.astype(self.dtype), conv_kernel=k1, conv_bias=b1,
                  dilation=d)
                k2, b2 = _Conv1dParams(
                    self.channels, ksize=self.kernel_size, name=f"conv2_{i}"
                )(self.channels)
                x = AntiAliasedActivation(
                    self.channels, self.activation, self.alpha_logscale,
                    use_pallas=True, name=f"act2_{i}",
                )(xt, conv_kernel=k2, conv_bias=b2, dilation=1, residual=x)
                continue
            xt = AntiAliasedActivation(
                self.channels, self.activation, self.alpha_logscale,
                use_pallas=self.use_pallas, name=f"act1_{i}",
            )(x)
            xt = _conv1d_torchpad(self.channels, self.kernel_size, d,
                                  name=f"conv1_{i}", dtype=self.dtype)(xt)
            xt = AntiAliasedActivation(
                self.channels, self.activation, self.alpha_logscale,
                use_pallas=self.use_pallas, name=f"act2_{i}",
            )(xt)
            xt = _conv1d_torchpad(self.channels, self.kernel_size, 1,
                                  name=f"conv2_{i}", dtype=self.dtype)(xt)
            x = xt + x
        return x


class AMPBlock2(nn.Module):
    """2x (aa-act -> dilated conv) with residuals (reference models.py:78-118)."""

    channels: int
    kernel_size: int = 3
    dilation: Tuple[int, ...] = (1, 3)
    activation: str = "snakebeta"
    alpha_logscale: bool = True
    use_pallas: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        fuse = self.use_pallas and self.kernel_size % 2 == 1
        for i, d in enumerate(self.dilation):
            if fuse:
                k1, b1 = _Conv1dParams(
                    self.channels, ksize=self.kernel_size, name=f"conv_{i}"
                )(self.channels)
                x = AntiAliasedActivation(
                    self.channels, self.activation, self.alpha_logscale,
                    use_pallas=True, name=f"act_{i}",
                )(x.astype(self.dtype), conv_kernel=k1, conv_bias=b1,
                  dilation=d, residual=x)
                continue
            xt = AntiAliasedActivation(
                self.channels, self.activation, self.alpha_logscale,
                use_pallas=self.use_pallas, name=f"act_{i}",
            )(x)
            xt = _conv1d_torchpad(self.channels, self.kernel_size, d,
                                  name=f"conv_{i}", dtype=self.dtype)(xt)
            x = xt + x
        return x


class BigVGAN(nn.Module):
    """Generator. Call: mel (B, T, num_mels) -> wav (B, T * prod(rates))."""

    num_mels: int = 80
    upsample_rates: Tuple[int, ...] = (8, 8, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 16, 4, 4)
    upsample_initial_channel: int = 512
    resblock: str = "1"
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = ((1, 3, 5),) * 3
    activation: str = "snakebeta"
    snake_logscale: bool = True
    dtype: Any = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        x = nn.Conv(
            self.upsample_initial_channel, (7,), padding=[(3, 3)],
            dtype=self.dtype, name="conv_pre",
        )(x)
        block_cls = AMPBlock1 if self.resblock == "1" else AMPBlock2
        num_kernels = len(self.resblock_kernel_sizes)
        ch = self.upsample_initial_channel
        for i, (u, k) in enumerate(zip(self.upsample_rates, self.upsample_kernel_sizes)):
            ch = self.upsample_initial_channel // (2 ** (i + 1))
            # torch ConvTranspose1d(k, u, padding=(k-u)//2) -> out = T*u;
            # flax explicit padding p_flax = (k-1) - p_torch gives the same
            # output size and phase.
            pad = (k - 1) - (k - u) // 2
            x = nn.ConvTranspose(
                ch, (k,), strides=(u,), padding=[(pad, pad)],
                dtype=self.dtype, name=f"up_{i}",
            )(x)
            xs = None
            for j, (rk, rd) in enumerate(
                zip(self.resblock_kernel_sizes, self.resblock_dilation_sizes)
            ):
                block = block_cls(
                    ch, rk, tuple(rd), self.activation, self.snake_logscale,
                    use_pallas=self.use_pallas, dtype=self.dtype,
                    name=f"resblock_{i}_{j}",
                )
                xs = block(x) if xs is None else xs + block(x)
            x = xs / num_kernels
        if self.use_pallas:
            from unitspeech_tpu.ops.pallas_kernels import fused_aa_snake

            act_cls = SnakeBeta if self.activation == "snakebeta" else Snake
            act = act_cls(ch, self.snake_logscale, name="act_post")
            alpha, beta = act.params_ab()
            x = fused_aa_snake(x, alpha, beta, logscale=self.snake_logscale)
        else:
            act_cls = SnakeBeta if self.activation == "snakebeta" else Snake
            x = downsample1d(
                act_cls(ch, self.snake_logscale, name="act_post")(upsample1d(x))
            )
        x = nn.Conv(1, (7,), padding=[(3, 3)], dtype=self.dtype, name="conv_post")(x)
        return jnp.tanh(x)[..., 0].astype(jnp.float32)

    @classmethod
    def from_config(cls, cfg, dtype=jnp.float32, use_pallas=False):
        return cls(
            num_mels=cfg.num_mels,
            upsample_rates=tuple(cfg.upsample_rates),
            upsample_kernel_sizes=tuple(cfg.upsample_kernel_sizes),
            upsample_initial_channel=cfg.upsample_initial_channel,
            resblock=cfg.resblock,
            resblock_kernel_sizes=tuple(cfg.resblock_kernel_sizes),
            resblock_dilation_sizes=tuple(tuple(d) for d in cfg.resblock_dilation_sizes),
            activation=cfg.activation,
            snake_logscale=cfg.snake_logscale,
            dtype=dtype,
            use_pallas=use_pallas,
        )
