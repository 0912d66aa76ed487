"""U-Net score estimator for the diffusion decoder.

TPU-native re-design of the reference GradLogPEstimator2d
(/root/reference/unitspeech/unitspeech.py:124-201):

  * NHWC layout (batch, time, freq, channels) — channels ride the lanes,
    convs tile onto the MXU without transposes (the reference is NCHW)
  * 2-channel input: stacked (conditioning mu, noisy sample x_t)
  * len(dim_mults) resolutions down (last stage keeps resolution) + mid +
    len(dim_mults)-1 up stages; each stage: 2 ResnetBlocks (conv3x3 +
    GroupNorm(8) + Mish, FiLM-style time+speaker bias) then
    Residual(Rezero(LinearAttention))
  * linear attention (softmax over keys, O(N d^2)) over flattened
    time x freq tokens — kept linear so long-utterance inference scales,
    and a natural Pallas fusion target
  * mixed precision: params float32, compute in `dtype` (bfloat16 on TPU);
    GroupNorm statistics always in float32

Sizes with the reference config (dim=128, dim_mults=(1,2,4,8)): channel path
2 -> 128 -> 256 -> 512 -> 1024, three 2x downsamplings of (time, freq).
"""

from __future__ import annotations

import math
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def mish(x):
    return x * jnp.tanh(nn.softplus(x))


_DEEP_INT8_OVERRIDE_LOGGED = False


def _mark_deep_int8_override_logged():
    global _DEEP_INT8_OVERRIDE_LOGGED
    _DEEP_INT8_OVERRIDE_LOGGED = True


def sinusoidal_pos_emb(t, dim: int, scale: float = 1000.0):
    """(B,) -> (B, dim). Reference SinusoidalPosEmb (unitspeech.py:109-121)."""
    half = dim // 2
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * (-math.log(10000.0) / (half - 1)))
    args = scale * t[:, None].astype(jnp.float32) * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


def _group_norm_lowmem(x, groups: int, scale, bias, eps: float = 1e-5):
    """GroupNorm that keeps the big tensor in its compute dtype: statistics
    accumulate in float32 (small per-group scalars), but no float32 copy of
    the activation is ever materialized — on TPU the U-Net is HBM-bandwidth
    bound, so activation bytes are the budget.

    The stats come from ops/pallas_stats.group_mean_inv: ONE bytes-bound
    Pallas pass per tensor (channels on lanes, rows across sublanes, f32
    accumulation; jnp row-reduce fallback off-TPU). Reducing a
    (B,T,F,G,C/G) reshape instead splits the 128-lane dim, and even the
    lane-intact XLA reduce lowers ~10x off its bytes bound (r4 roofline).
    Group pooling happens on the tiny (B, C) sums, same trick as the fused
    kernels' _group_stats (ops/pallas_resnet.py)."""
    from unitspeech_tpu.ops.pallas_stats import group_mean_inv

    b, t, f, c = x.shape
    x2 = x.reshape(b, t * f, c)
    mean_f, inv_f = group_mean_inv(x2, groups, eps)  # (B, C) f32
    mean_c = mean_f.astype(x.dtype)
    inv_c = inv_f.astype(x.dtype)
    y = (x2 - mean_c[:, None, :]) * inv_c[:, None, :]
    y = y.reshape(b, t, f, c)
    return y * scale.astype(x.dtype) + bias.astype(x.dtype)


class GroupNormLowMem(nn.Module):
    """Drop-in for nn.GroupNorm (same scale/bias param tree) with
    dtype-preserving activations and float32 statistics."""

    channels: int
    groups: int = 8
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        return _group_norm_lowmem(x, self.groups, scale, bias, self.eps)


class Block(nn.Module):
    """conv3x3 -> GroupNorm(8) -> Mish, masked in and out
    (reference unitspeech.py:46-55).

    input_pre_masked=True skips the input mask multiply when the caller
    guarantees the padding region is already zero — bit-identical output
    (TPU conv operands must be materialized, so each skipped multiply saves
    a full tensor round trip to HBM).

    At the deep stages (C >= 512) the conv runs as explicit MXU matmuls
    (ops/conv_matmul.py — exact reformulation, measured 1.2-5.9x faster than
    XLA's conv lowering on v5e); the parameter tree is nn.Conv's either way,
    so checkpoints are interchangeable."""

    dim_out: int
    groups: int = 8
    dtype: Any = jnp.float32
    input_pre_masked: bool = False

    @nn.compact
    def __call__(self, x, mask):
        from unitspeech_tpu.ops.conv_matmul import choose_conv_impl, conv3x3_matmul

        if not self.input_pre_masked:
            x = x * mask
        impl = choose_conv_impl(x.shape[-1], self.dim_out)
        if impl == "xla":
            x = nn.Conv(self.dim_out, (3, 3), padding=[(1, 1), (1, 1)],
                        dtype=self.dtype, name="conv")(x)
        else:
            k, b = _Conv2dParams(self.dim_out, name="conv")(x.shape[-1])
            x = conv3x3_matmul(x.astype(self.dtype), k, b, impl)
        x = GroupNormLowMem(self.dim_out, self.groups, name="norm")(x)
        return mish(x) * mask


class _Conv2dParams(nn.Module):
    """Parameter holder with nn.Conv's tree layout (kernel (kh,kw,in,out) +
    bias) and identical default init, so the fused Pallas ResnetBlock shares
    checkpoints with the XLA path."""

    features: int
    ksize: Tuple[int, int] = (3, 3)

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (*self.ksize, in_features, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class _GNParams(nn.Module):
    """GroupNormLowMem's parameter tree (scale/bias)."""

    channels: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        return scale, bias


class _BlockParams(nn.Module):
    """Block's parameter tree (conv + norm) without running the XLA ops."""

    dim_out: int

    @nn.compact
    def __call__(self, in_features: int):
        k, b = _Conv2dParams(self.dim_out, name="conv")(in_features)
        s, bb = _GNParams(self.dim_out, name="norm")()
        return k, b, s, bb


class ResnetBlock(nn.Module):
    """Two Blocks with a time/speaker FiLM bias between them + residual 1x1
    (reference unitspeech.py:58-75).

    input_pre_masked: caller guarantees x is already zero in the padding —
    the input-side mask multiplies become no-ops and are skipped
    (bit-identical; block2's mask stays because the FiLM bias un-masks).

    The res_conv OUTPUT is masked (its bias would otherwise fill the padding),
    so every ResnetBlock output is fully masked. The reference instead leaves
    that leak in res1's output and masks it away in res2's residual
    (unitspeech.py:71-74 res_conv(x * mask)); both arrangements produce the
    same downstream values — verified output-level against the real reference
    modules in tests/test_reference_parity.py, including padded batches.

    At the deep stages (C >= 512, where choose_conv_impl picks a matmul
    conv) the WHOLE block runs in the flattened (B, T*F, C) layout: convs as
    MXU matmuls, GroupNorm/mish/FiLM on the flat f32 accumulators, one
    round to the compute dtype per conv (the Pallas kernel's numerics
    contract). Measured on v5e at stage3 (T=43, F=10, C=1024): ~0.33
    ms/block vs 0.4-0.8 for nn.Conv across runs (the tunneled chip has high
    run-to-run variance; tools/bench_conv_variants.py)."""

    dim_out: int
    groups: int = 8
    dtype: Any = jnp.float32
    input_pre_masked: bool = False
    use_pallas: bool = False
    # EXPERIMENTAL whole-layer fused kernels at the deep stages (see the
    # routing comment in __call__; compile-time pathology keeps it off)
    use_pallas_deep: bool = False
    # OPT-IN int8 convs for the flat path (dynamic per-tensor activation +
    # per-channel weight scales; ~1% relative error per conv). Measured
    # stage2 0.21 vs 0.31 ms/block bf16; stage3 break-even. Excluded from
    # parity claims; see ops/conv_matmul.conv3x3_int8.
    use_int8: bool = False
    # whole-layer PRE-quantized int8 deep kernels for the stage2-band
    # blocks (Cout <= 512): activations quantize in one XLA pass so the
    # kernels assemble int8 windows directly — no (r, 9C) im2col column
    # round trip. Microbenched 1.30x vs flat int8 at stage2, wash at
    # stage3 (tools/bench_resnet_kernel.py --deep --i8pre --int8); only
    # the winning band routes. Same ~1% int8 error family as use_int8.
    use_i8pre_deep: bool = False
    # mish implementation for the VPU-bound inter-conv glue of the flat
    # path (ops/cheap_mish.py; quality-gated by tools/mish_gate.py). The
    # XLA Block path and the Pallas kernels keep exact mish — their glue is
    # HBM-bound, the approximation buys nothing there.
    glue_mish: str = "exact"
    # conv structure inside the fused early-stage kernels ("taps" | "taps3"
    # | "im2col", ops/pallas_resnet._conv3x3_taps); bit-equivalent routes
    # with different MXU-dispatch/VPU-move tradeoffs
    tap_mode: str = "taps"

    def _flat_matmul_block(self, x, mask, t_emb):
        """Whole-block flat fast path (identical parameter tree)."""
        from unitspeech_tpu.ops.conv_matmul import (
            choose_conv_impl, conv3x3_im2col, conv3x3_int8, conv3x3_taps,
        )

        b, t, f, cin = x.shape
        n = t * f
        k1, b1, s1, be1 = _BlockParams(self.dim_out, name="block1")(cin)
        bias_t = nn.Dense(self.dim_out, dtype=self.dtype, name="mlp")(
            mish(t_emb)
        )
        k2, b2, s2, be2 = _BlockParams(self.dim_out, name="block2")(
            self.dim_out
        )
        mask_rows = jnp.broadcast_to(mask, (b, t, f, 1)).reshape(b, n, 1)
        mask_rows = mask_rows.astype(self.dtype)
        xf = x.astype(self.dtype).reshape(b, n, cin)
        if not self.input_pre_masked:
            xf = xf * mask_rows

        def gn_mish(acc, scale, bias):
            # f32 stats over ALL rows incl. padding (torch GroupNorm parity);
            # math stays f32 even when the materialized input is bf16. Stats
            # come from the one-pass Pallas row_stats kernel: the previous
            # (b, n, g, C/g) reduce split the 128-lane axis and XLA's
            # variadic sum/sumsq reduce emitter measured ~10x its bytes
            # bound either way (thirteen fusions, 0.88 ms/step — r4
            # roofline; ops/pallas_stats.py)
            from unitspeech_tpu.ops.pallas_stats import group_mean_inv

            mean_c, inv_c = group_mean_inv(acc, self.groups)
            h = (acc.astype(jnp.float32) - mean_c[:, None, :]) \
                * inv_c[:, None, :]
            h = h * scale + bias
            from unitspeech_tpu.ops.cheap_mish import glue_mish

            return glue_mish(h, self.glue_mish)

        def conv(h, w):
            if self.use_int8:
                return conv3x3_int8(h, w, f)
            impl = choose_conv_impl(h.shape[-1], self.dim_out)
            fn = conv3x3_im2col if impl == "im2col" else conv3x3_taps
            return fn(h, w.astype(self.dtype), f)

        c1 = conv(xf, k1) + b1
        if self.use_int8:
            # the inter-conv glue fusions (GN+mish+FiLM+mask+quantize) are
            # HBM-bound at the deep stages (profiled ~0.128 ms/step per flat
            # block); materializing the conv accumulators in bf16 halves
            # their traffic. Stats/normalize math stays f32 (gn_mish); the
            # ~0.4% bf16 rounding sits under int8's ~1%-per-conv error and
            # int8 is already excluded from parity claims.
            c1 = c1.astype(self.dtype)
        h = gn_mish(c1, s1, be1) * mask_rows.astype(jnp.float32)
        h = (h + bias_t[:, None, :].astype(jnp.float32)).astype(self.dtype)
        c2 = conv(h * mask_rows, k2) + b2
        if self.use_int8:
            c2 = c2.astype(self.dtype)
        h2 = gn_mish(c2, s2, be2) * mask_rows.astype(jnp.float32)
        if cin != self.dim_out:
            wres, bres = _Conv2dParams(
                self.dim_out, ksize=(1, 1), name="res_conv"
            )(cin)
            res = jnp.einsum(
                "bnc,cd->bnd", xf * mask_rows,
                wres.reshape(cin, self.dim_out).astype(self.dtype),
                preferred_element_type=jnp.float32,
            )
            res = (res + bres) * mask_rows.astype(jnp.float32)
        else:
            res = xf * mask_rows
        out = (h2 + res).astype(self.dtype)
        return out.reshape(b, t, f, self.dim_out)

    def _fused_params(self, x, t_emb):
        cin = x.shape[-1]
        k1, b1, s1, be1 = _BlockParams(self.dim_out, name="block1")(cin)
        bias_t = nn.Dense(self.dim_out, dtype=self.dtype, name="mlp")(
            mish(t_emb)
        )
        k2, b2, s2, be2 = _BlockParams(self.dim_out, name="block2")(
            self.dim_out
        )
        wres = bres = None
        if cin != self.dim_out:
            wres, bres = _Conv2dParams(
                self.dim_out, ksize=(1, 1), name="res_conv"
            )(cin)
        return (k1, b1, s1, be1, bias_t, k2, b2, s2, be2, wres, bres)

    @nn.compact
    def __call__(self, x, mask, t_emb):
        from unitspeech_tpu.ops.conv_matmul import choose_conv_impl
        from unitspeech_tpu.ops.pallas_resnet import supports_shape

        b, t, f, cin = x.shape
        if (not (self.use_pallas and supports_shape(t, f))
                and choose_conv_impl(cin, self.dim_out) != "xla"):
            # deep stages (F % 8 != 0): whole-layer fused kernels when the
            # full activation fits VMEM (rows padded to the 8-sublane; the
            # r2 ~17-min Mosaic compile pathology is fixed — see
            # fused_resnet_block_deep); flat matmul path otherwise.
            #
            # A whole-layer kernel at cin > cout (the up-stage skip-concat
            # projections 2048->512 and 1024->256) CRASHES the TPU compiler
            # subprocess (tools/probe_deep_shapes.py; suspected VMEM blow-up
            # from the 3x window copies at large cin) — those blocks run
            # conv1 as the XLA matmul and fuse kernels B+C only (hybrid
            # inside _fused_resnet_deep). The in-kernel int8 variant crashes
            # the same way even at identity shapes, so the deep call is
            # always bf16 (measured faster than flat int8 anyway: 0.182 vs
            # 0.289 ms/block at stage2, tools/bench_resnet_kernel.py).
            i8pre_ok = (
                self.use_i8pre_deep and self.use_int8
                and self.dim_out <= 512
                and t * f * max(cin, self.dim_out) * 2 <= 4 * 1024 * 1024
            )
            if i8pre_ok:
                from unitspeech_tpu.ops.pallas_resnet import (
                    fused_resnet_block_deep_i8,
                )

                (k1, b1, s1, be1, bias_t, k2, b2, s2, be2, wres,
                 bres) = self._fused_params(x, t_emb)
                return fused_resnet_block_deep_i8(
                    x.astype(self.dtype), mask, bias_t,
                    k1, b1, s1, be1, k2, b2, s2, be2,
                    wres=wres, bres=bres, groups=self.groups,
                )
            deep_ok = (
                self.use_pallas_deep
                and t * f * max(cin, self.dim_out) * 2 <= 4 * 1024 * 1024
            )
            if deep_ok:
                from unitspeech_tpu.ops.pallas_resnet import (
                    fused_resnet_block_deep,
                )

                if self.use_int8 and not _DEEP_INT8_OVERRIDE_LOGGED:
                    # visible once per process so benchmark configurations
                    # stay interpretable (ADVICE r3): with use_pallas_deep
                    # the deep blocks run bf16 — in-kernel int8 crashes the
                    # TPU compiler, and deep bf16 measures faster anyway
                    import logging

                    logging.getLogger(__name__).info(
                        "use_int8_deep overridden to bf16 on the fused "
                        "deep-kernel route (use_pallas_deep)")
                    _mark_deep_int8_override_logged()

                (k1, b1, s1, be1, bias_t, k2, b2, s2, be2, wres,
                 bres) = self._fused_params(x, t_emb)
                return fused_resnet_block_deep(
                    x.astype(self.dtype), mask, bias_t,
                    k1, b1, s1, be1, k2, b2, s2, be2,
                    wres=wres, bres=bres, groups=self.groups,
                )
            return self._flat_matmul_block(x, mask, t_emb)
        if self.use_pallas and supports_shape(t, f):
            from unitspeech_tpu.ops.pallas_resnet import fused_resnet_block

            (k1, b1, s1, be1, bias_t, k2, b2, s2, be2, wres,
             bres) = self._fused_params(x, t_emb)
            return fused_resnet_block(
                x.astype(self.dtype), mask, bias_t,
                k1, b1, s1, be1, k2, b2, s2, be2,
                wres=wres, bres=bres, groups=self.groups,
                tap_mode=self.tap_mode,
                # int8 in the early-stage kernels is a MEASURED NEGATIVE:
                # full-pipeline 0.102 vs 0.0994 RTF with deep-only int8 —
                # the in-kernel quantize (round/clip over three f32 windows
                # per tile) costs more than the int8 MXU saves at C=128/256.
                # The kernel capability stays (fused_resnet_block int8=True)
                # for larger-C configs; this model keeps bf16 here.
                int8=False,
            )
        h = Block(self.dim_out, self.groups, dtype=self.dtype,
                  input_pre_masked=self.input_pre_masked, name="block1")(x, mask)
        bias = nn.Dense(self.dim_out, dtype=self.dtype, name="mlp")(mish(t_emb))
        h = h + bias[:, None, None, :]
        h = Block(self.dim_out, self.groups, dtype=self.dtype, name="block2")(h, mask)
        x_masked = x if self.input_pre_masked else x * mask
        if x.shape[-1] != self.dim_out:
            res = nn.Conv(self.dim_out, (1, 1), dtype=self.dtype, name="res_conv")(x_masked)
            res = res * mask
        else:
            res = x_masked
        return h + res


class _DenseParams(nn.Module):
    """Parameter holder with nn.Dense's tree layout (kernel/bias), so the
    same weights serve both the XLA math and the fused Pallas kernel."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (in_features, self.features)
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        return kernel, bias


class LinearAttention(nn.Module):
    """Softmax-over-keys linear attention over flattened (time x freq) tokens
    (reference unitspeech.py:78-96). O(N d^2): context = softmax(K) V^T, then
    out = context^T Q. No masking, matching the reference."""

    heads: int = 4
    dim_head: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, t, f, c = x.shape
        n = t * f
        h, d = self.heads, self.dim_head
        hidden = h * d
        w_qkv, _ = _DenseParams(hidden * 3, use_bias=False, name="to_qkv")(c)
        w_out, b_out = _DenseParams(c, name="to_out")(hidden)
        w_qkv = w_qkv.astype(self.dtype)
        # token-major (B, N, H, d) layout throughout: the einsums contract
        # over N directly, so no (B, H, d, N) transpose of the big tensors is
        # ever materialized (the U-Net is HBM-bandwidth bound)
        qkv = x.reshape(b, n, c) @ w_qkv
        # contiguous split (the reference's qkv-major channel order is
        # preserved by the weight converter)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, n, h, d)
        k = k.reshape(b, n, h, d)
        v = v.reshape(b, n, h, d)
        # key softmax folded into the contraction: contract un-normalized
        # exp(k) against v, then divide the SMALL (B,H,d,e) context by the
        # normalizer — saves a full read+write of the big key tensor
        k_max = jax.lax.stop_gradient(jnp.max(k, axis=1, keepdims=True))
        k_exp = jnp.exp(k - k_max)
        k_sum = jnp.sum(k_exp, axis=1, dtype=jnp.float32)  # (B, H, d)
        context = jnp.einsum("bnhd,bnhe->bhde", k_exp, v)
        context = context / k_sum[..., None].astype(context.dtype)
        out = jnp.einsum("bnhd,bhde->bnhe", q, context)  # (B, N, H, e)
        out = out.reshape(b, t, f, hidden)
        return out @ w_out.astype(self.dtype) + b_out.astype(self.dtype)


class _AttnParams(nn.Module):
    """Same parameter tree as LinearAttention (to_qkv/to_out) for the fused
    Pallas path — instantiated under the same submodule name ("fn") so
    checkpoints are interchangeable between paths."""

    hidden: int

    @nn.compact
    def __call__(self, c: int):
        w_qkv, _ = _DenseParams(self.hidden * 3, use_bias=False, name="to_qkv")(c)
        w_out, b_out = _DenseParams(c, name="to_out")(self.hidden)
        return w_qkv, w_out, b_out


class RezeroAttention(nn.Module):
    """Residual(Rezero(LinearAttention)) (reference unitspeech.py:36-43, 99-106).

    use_pallas=True runs the whole attention block (qkv projections, online
    key softmax, context, output projection, rezero residual) as one fused
    Pallas kernel pair (ops/pallas_attention.py) — 2 reads + 1 write of the
    activation instead of ~6 tensor round trips. The kernel only pays off
    where the XLA chain is HBM-bound, i.e. at large token counts: measured
    v5e (tools/bench_conv_variants.py --extras) N=27520 C=128: 0.164 ms vs
    0.291 XLA; N<=6880: XLA wins (0.02-0.12 ms vs 0.13-0.48 Pallas, the
    fixed per-tile weight residency dominates). use_pallas is therefore
    additionally gated on N >= PALLAS_MIN_TOKENS. The first gate (16384,
    full-res stage only) came from one extras run where the deep-stage XLA
    chain benchmarked implausibly fast; a later run measured the kernel
    ahead at N=6880/1720 too (0.084 vs 0.121, 0.035 vs 0.067), and the
    full-pipeline A/B confirmed it: gate 1024 measured RTF 0.4376 vs 0.448
    proc (-0.2 ms/step), so the gate admits every estimator site except the
    N=430 tail where the two paths are within noise."""

    PALLAS_MIN_TOKENS = 1024

    heads: int = 4
    dim_head: int = 32
    dtype: Any = jnp.float32
    use_pallas: bool = False

    def uses_fused_masked(self, t: int, f: int, mask) -> bool:
        """True when this call will run the fused kernel with OUTPUT masking
        — the caller may then skip its own post-attention mask multiply
        (identical downstream values; reference masks before every
        resample)."""
        return (self.use_pallas and mask is not None
                and t * f >= self.PALLAS_MIN_TOKENS)

    @nn.compact
    def __call__(self, x, mask=None):
        g = self.param("g", nn.initializers.zeros, (1,))
        if self.use_pallas and x.shape[1] * x.shape[2] >= self.PALLAS_MIN_TOKENS:
            from unitspeech_tpu.ops.pallas_attention import fused_rezero_attention

            b, t, f, c = x.shape
            w_qkv, w_out, b_out = _AttnParams(
                self.heads * self.dim_head, name="fn"
            )(c)
            lens_rows = None
            if mask is not None:
                # f32 accumulation: a bf16 mask sum rounds odd lengths
                # > 256 to even, silently masking a real frame
                lens = jnp.sum(
                    mask.reshape(b, t).astype(jnp.float32), axis=1
                ).astype(jnp.int32)
                lens_rows = (lens * f).reshape(b, 1, 1)
            y = fused_rezero_attention(
                x.reshape(b, t * f, c).astype(self.dtype),
                w_qkv, w_out, b_out, g, lens_rows=lens_rows,
                heads=self.heads, dim_head=self.dim_head,
            )
            return y.reshape(b, t, f, c)
        y = LinearAttention(self.heads, self.dim_head, dtype=self.dtype, name="fn")(x)
        return x + y * g.astype(self.dtype)


class _ResampleParams(nn.Module):
    """Downsample/Upsample parameter tree (conv/{kernel,bias}) without the
    XLA op — the fused Pallas resample kernels share checkpoints with the
    nn.Conv/nn.ConvTranspose modules."""

    features: int
    ksize: Tuple[int, int]

    @nn.compact
    def __call__(self, in_features: int):
        return _Conv2dParams(self.features, ksize=self.ksize, name="conv")(
            in_features
        )


class Downsample(nn.Module):
    """conv3x3 stride 2 (reference unitspeech.py:27-33).

    XLA's conv lowering profiled ~3x off the MXU floor, but the
    XLA-level 9-subsampled-matmul reformulation
    (ops/conv_matmul.conv3x3_stride2_matmul, exact and tested) measured
    12x SLOWER in the estimator on v5e — the shifted copies materialize at
    full resolution before the stride-2 subsample (measured down+up pair at
    stage0: 0.135 ms XLA vs 1.7 ms matmul, tools/bench_conv_variants.py
    --extras). The Pallas kernel (ops/pallas_resample.fused_downsample_conv)
    keeps the stride in VMEM instead; the estimator routes to it under
    use_pallas_resample at supported shapes."""

    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.dim, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                       dtype=self.dtype, name="conv")(x)


class Upsample(nn.Module):
    """transposed conv 4x4 stride 2 (reference unitspeech.py:18-24).

    Stays on XLA's conv_transpose lowering: the 16-phase-matmul form
    (ops/conv_matmul.conv_transpose4x4_matmul, exact and tested) hits the
    flop floor on paper but loses on v5e — the phase-interleave relayout of
    the doubled-resolution output dominates (see Downsample's measured
    pair)."""

    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # torch ConvTranspose2d(4, 2, padding=1) -> out = 2T; flax explicit
        # padding p_flax = (k-1) - p_torch = 2.
        return nn.ConvTranspose(self.dim, (4, 4), strides=(2, 2),
                                padding=[(2, 2), (2, 2)], dtype=self.dtype,
                                name="conv")(x)


class GradLogPEstimator2d(nn.Module):
    """Score estimator network.

    Call: (x_t (B, T, F), mask (B, T), mu (B, T, F), t (B,), spk (B, S))
          -> score (B, T, F).
    T must be a multiple of 2**(len(dim_mults)-1) (fix_len_compatibility).
    """

    dim: int = 128
    dim_mults: Tuple[int, ...] = (1, 2, 4, 8)
    groups: int = 8
    pe_scale: float = 1000.0
    spk_emb_dim: int = 256
    dtype: Any = jnp.float32
    use_pallas_attention: bool = False
    use_pallas_resnet: bool = False
    use_int8_deep: bool = False
    use_pallas_deep: bool = False
    use_pallas_resample: bool = False
    # route the stage2-band deep blocks (Cout <= 512) through the
    # whole-layer PRE-quantized int8 kernels (fused_resnet_block_deep_i8):
    # microbenched 1.30x vs the flat int8 path at stage2, wash at stage3
    use_i8pre_deep: bool = False
    glue_mish: str = "exact"
    # conv structure inside the fused early-stage Pallas kernels
    # (ops/pallas_resnet._conv3x3_taps: "taps" | "taps3" | "im2col")
    tap_mode: str = "taps"

    @nn.compact
    def __call__(self, x, mask, mu, t, spk_emb):
        # time embedding: sinusoidal -> MLP(dim*4) -> dim, concat speaker
        t_emb = sinusoidal_pos_emb(t, self.dim, self.pe_scale)
        t_emb = nn.Dense(self.dim * 4, dtype=self.dtype, name="mlp_0")(t_emb.astype(self.dtype))
        t_emb = nn.Dense(self.dim, dtype=self.dtype, name="mlp_1")(mish(t_emb))
        t_emb = jnp.concatenate([t_emb, spk_emb.astype(self.dtype)], axis=-1)

        h = jnp.stack([mu, x], axis=-1).astype(self.dtype)  # (B, T, F, 2)
        m = mask[:, :, None, None].astype(self.dtype)  # (B, T, 1, 1)

        dims = [self.dim * m_ for m_ in self.dim_mults]
        num_res = len(dims)

        hiddens = []
        masks = [m]
        for ind, dim_out in enumerate(dims):
            is_last = ind == num_res - 1
            mk = masks[-1]
            h = ResnetBlock(dim_out, self.groups, dtype=self.dtype,
                            use_pallas=self.use_pallas_resnet,
                            use_int8=self.use_int8_deep,
                        use_pallas_deep=self.use_pallas_deep,
                        use_i8pre_deep=self.use_i8pre_deep,
                        glue_mish=self.glue_mish,
                        tap_mode=self.tap_mode,
                            name=f"down_{ind}_res1")(h, mk, t_emb)
            # res1's output is masked by construction -> skip res2's input mask
            h = ResnetBlock(dim_out, self.groups, dtype=self.dtype,
                            input_pre_masked=True,
                            use_pallas=self.use_pallas_resnet,
                            use_int8=self.use_int8_deep,
                        use_pallas_deep=self.use_pallas_deep,
                        use_i8pre_deep=self.use_i8pre_deep,
                        glue_mish=self.glue_mish,
                        tap_mode=self.tap_mode,
                            name=f"down_{ind}_res2")(h, mk, t_emb)
            attn = RezeroAttention(dtype=self.dtype,
                                   use_pallas=self.use_pallas_attention,
                                   name=f"down_{ind}_attn")
            h = attn(h, mask=mk)
            hiddens.append(h)
            if not is_last:
                from unitspeech_tpu.ops.pallas_resample import (
                    supports_downsample,
                )

                if (self.use_pallas_resample
                        and supports_downsample(h.shape[1], h.shape[2],
                                                dim_out)):
                    # fused stride-2 conv: masks the input rows in VMEM, so
                    # the h * mk pass is skipped entirely
                    from unitspeech_tpu.ops.pallas_resample import (
                        fused_downsample_conv,
                    )

                    kd, bd = _ResampleParams(
                        dim_out, (3, 3), name=f"down_{ind}_down"
                    )(h.shape[-1])
                    h = fused_downsample_conv(h.astype(self.dtype), mk, kd, bd)
                else:
                    # the fused attention already masked its output rows
                    hin = (h if attn.uses_fused_masked(
                               h.shape[1], h.shape[2], mk)
                           else h * mk)
                    h = Downsample(dim_out, dtype=self.dtype,
                                   name=f"down_{ind}_down")(hin)
            masks.append(mk[:, ::2])

        masks = masks[:-1]
        mid_dim = dims[-1]
        mk = masks[-1]
        h = ResnetBlock(mid_dim, self.groups, dtype=self.dtype,
                        use_pallas=self.use_pallas_resnet,
                        use_int8=self.use_int8_deep,
                        use_pallas_deep=self.use_pallas_deep,
                        use_i8pre_deep=self.use_i8pre_deep,
                        glue_mish=self.glue_mish,
                        tap_mode=self.tap_mode,
                        name="mid_res1")(h, mk, t_emb)
        h = RezeroAttention(dtype=self.dtype, use_pallas=self.use_pallas_attention, name="mid_attn")(h, mask=mk)
        h = ResnetBlock(mid_dim, self.groups, dtype=self.dtype,
                        use_pallas=self.use_pallas_resnet,
                        use_int8=self.use_int8_deep,
                        use_pallas_deep=self.use_pallas_deep,
                        use_i8pre_deep=self.use_i8pre_deep,
                        glue_mish=self.glue_mish,
                        tap_mode=self.tap_mode,
                        name="mid_res2")(h, mk, t_emb)

        # up stages mirror down stages 1..num_res-1, reversed
        up_specs = list(enumerate(zip(dims[:-1], dims[1:])))[::-1]
        for ind, (dim_in, dim_out) in up_specs:
            mk = masks.pop()
            h = jnp.concatenate([h, hiddens.pop()], axis=-1)
            h = ResnetBlock(dim_in, self.groups, dtype=self.dtype,
                            use_pallas=self.use_pallas_resnet,
                            use_int8=self.use_int8_deep,
                        use_pallas_deep=self.use_pallas_deep,
                        use_i8pre_deep=self.use_i8pre_deep,
                        glue_mish=self.glue_mish,
                        tap_mode=self.tap_mode,
                            name=f"up_{ind}_res1")(h, mk, t_emb)
            h = ResnetBlock(dim_in, self.groups, dtype=self.dtype,
                            input_pre_masked=True,
                            use_pallas=self.use_pallas_resnet,
                            use_int8=self.use_int8_deep,
                        use_pallas_deep=self.use_pallas_deep,
                        use_i8pre_deep=self.use_i8pre_deep,
                        glue_mish=self.glue_mish,
                        tap_mode=self.tap_mode,
                            name=f"up_{ind}_res2")(h, mk, t_emb)
            attn = RezeroAttention(dtype=self.dtype,
                                   use_pallas=self.use_pallas_attention,
                                   name=f"up_{ind}_attn")
            h = attn(h, mask=mk)
            from unitspeech_tpu.ops.pallas_resample import supports_upsample

            if (self.use_pallas_resample
                    and supports_upsample(h.shape[1], h.shape[2], dim_in)):
                from unitspeech_tpu.ops.pallas_resample import (
                    fused_upsample_conv,
                )

                ku, bu = _ResampleParams(
                    dim_in, (4, 4), name=f"up_{ind}_up"
                )(h.shape[-1])
                h = fused_upsample_conv(h.astype(self.dtype), mk, ku, bu)
            else:
                hin = (h if attn.uses_fused_masked(h.shape[1], h.shape[2], mk)
                       else h * mk)
                h = Upsample(dim_in, dtype=self.dtype,
                             name=f"up_{ind}_up")(hin)

        from unitspeech_tpu.ops.pallas_resnet import supports_shape

        if self.use_pallas_resnet and supports_shape(h.shape[1], h.shape[2]):
            # fused conv+GN+mish+mask+final_conv pair (identical param tree;
            # the XLA lowering relayouts this full-resolution region through
            # f32 several times — profiled ~0.58 ms/step, tools/
            # profile_pipeline.py)
            from unitspeech_tpu.ops.pallas_resnet import fused_final_block

            k1, b1, s1, be1 = _BlockParams(self.dim, name="final_block")(
                h.shape[-1]
            )
            wo, bo = _Conv2dParams(1, ksize=(1, 1), name="final_conv")(self.dim)
            return fused_final_block(
                h.astype(self.dtype), m, k1, b1, s1, be1, wo, bo,
                groups=self.groups, tap_mode=self.tap_mode,
            )
        h = Block(self.dim, self.groups, dtype=self.dtype, name="final_block")(h, m)
        out = nn.Conv(1, (1, 1), dtype=self.dtype, name="final_conv")(h * m)
        return (out * m)[..., 0].astype(jnp.float32)

    @classmethod
    def from_config(cls, cfg, dtype=jnp.float32, use_pallas_attention=False,
                    use_pallas_resnet=False, use_int8_deep=False,
                    use_pallas_deep=False, use_pallas_resample=False,
                    glue_mish="exact", tap_mode="taps"):
        return cls(
            dim=cfg.dim,
            dim_mults=tuple(cfg.dim_mults),
            groups=cfg.groups,
            pe_scale=cfg.pe_scale,
            spk_emb_dim=cfg.spk_emb_dim,
            dtype=dtype,
            use_pallas_attention=use_pallas_attention,
            use_pallas_resnet=use_pallas_resnet,
            use_int8_deep=use_int8_deep,
            use_pallas_deep=use_pallas_deep,
            use_pallas_resample=use_pallas_resample,
            glue_mish=glue_mish,
            tap_mode=tap_mode,
        )
