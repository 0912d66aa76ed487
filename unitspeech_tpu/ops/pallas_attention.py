"""Fused linear attention Pallas kernel (the U-Net's Rezero linear attention).

The XLA path materializes qkv (3x the activation), the exp'd keys, and the
attention output as separate HBM tensors; this kernel streams token tiles
through VMEM twice:

  phase 1: context accumulation — k/v projections, ONLINE softmax over the
           token axis (flash-style running max with rescaling, so one pass
           suffices), accumulate num = sum exp(k) v^T and den = sum exp(k)
  phase 2: out = (q . context) @ W_out + b_out, fused rezero residual

Math identical to models.unet.LinearAttention/RezeroAttention (reference
unitspeech.py:78-96, 36-43, 99-106): softmax over keys, context =
softmax(K)^T V per head, out = x + g * (Q context W_out + b_out).

Mosaic-friendly head handling: instead of (Tt, H, d) reshapes (unsupported
lane splits), the contraction runs over the full (H*d, H*d) matrix on the
MXU and a block-diagonal head mask zeroes the cross-head terms — the masked
result is EXACTLY the per-head computation, and a block-diagonal context
makes phase 2's q @ ctx identical to per-head attention.

Status: numerically verified against the XLA path on TPU (bf16 tolerance).
Per-shape timings (v5e, tools/bench_conv_variants.py --extras): the kernel
wins where the XLA chain is HBM-bound — N=27520 (full-res stage): 0.164 ms
vs 0.291 XLA — and loses at the small deep stages (N<=6880: 0.13-0.48 vs
0.02-0.12 XLA; per-tile weight residency dominates). The model therefore
gates it by token count (models/unet.py RezeroAttention.PALLAS_MIN_TOKENS),
and `use_pallas_attention=True` is ON in the serving/bench path: each call
site gets whichever implementation measured faster at its shape.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from unitspeech_tpu.ops.fastmath import fast_exp

# online-softmax exp implementation: "jnp" (Mosaic builtin, DEFAULT) |
# "fast" (exp2-poly, ops/fastmath.py). fast_exp measured ~85 lane-ops vs
# jnp's ~20 (tools/bench_transcendental.py r4 — Mosaic's i32 shift/bitcast
# lowering is wide), so the builtin stays. If "fast" is ever re-tried: its
# <4e-6 rel error is invisible at bf16, and exp(-1e30) = ~1.6e-38 instead
# of 0 adds only ~1e-35 absolute to den/num for masked rows.
ATTN_EXP = "jnp"


def _exp(x):
    return fast_exp(x) if ATTN_EXP == "fast" else jnp.exp(x)


def _head_block_mask(hd: int, d: int):
    rows = jax.lax.broadcasted_iota(jnp.int32, (hd, hd), 0) // d
    cols = jax.lax.broadcasted_iota(jnp.int32, (hd, hd), 1) // d
    return (rows == cols).astype(jnp.float32)


def _phase1_kernel(x_ref, wk_ref, wv_ref, ctx_ref, m_scr, den_scr, num_scr,
                   *, dim_head: int, n_valid: int, t_tile: int):
    from jax.experimental import pallas as pl

    j = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    hd = num_scr.shape[0]

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, -1e30)
        den_scr[:] = jnp.zeros_like(den_scr)
        num_scr[:] = jnp.zeros_like(num_scr)

    x = x_ref[0]  # (Tt, C)
    k = jnp.dot(x, wk_ref[:], preferred_element_type=jnp.float32)  # (Tt, HD)
    v = jnp.dot(x, wv_ref[:], preferred_element_type=jnp.float32)

    # mask out token-padding rows exactly (they must not enter the softmax)
    row = jax.lax.broadcasted_iota(jnp.int32, (t_tile, 1), 0)
    valid = (j * t_tile + row) < n_valid  # (Tt, 1)
    k = jnp.where(valid, k, -1e30)

    m_old = m_scr[:]  # (1, HD)
    lm = jnp.max(k, axis=0, keepdims=True)  # (1, HD)
    m_new = jnp.maximum(m_old, lm)
    scale = _exp(m_old - m_new)  # (1, HD)
    e = _exp(k - m_new)  # (Tt, HD); pad rows -> ~0 (see _exp note)
    den_scr[:] = den_scr[:] * scale + jnp.sum(e, axis=0, keepdims=True)
    # full contraction on the MXU; cross-head blocks are masked at the end
    num = jax.lax.dot_general(
        e, v, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (HD, HD)
    num_scr[:] = num_scr[:] * scale.reshape(hd, 1) + num
    m_scr[:] = m_new

    @pl.when(j == n_tiles - 1)
    def _():
        ctx = num_scr[:] / den_scr[:].reshape(hd, 1)
        ctx_ref[0] = (ctx * _head_block_mask(hd, dim_head)).astype(ctx_ref.dtype)


def _phase2_kernel(lens_ref, x_ref, wq_ref, ctx_ref, wo_ref, bo_ref, g_ref,
                   y_ref, *, t_tile: int):
    from jax.experimental import pallas as pl

    j = pl.program_id(1)
    x = x_ref[0]  # (Tt, C)
    q = jnp.dot(x, wq_ref[:], preferred_element_type=jnp.float32)  # (Tt, HD)
    ctx = ctx_ref[0].astype(jnp.float32)  # (HD, HD) block-diagonal
    attn = jnp.dot(q, ctx, preferred_element_type=jnp.float32).astype(x.dtype)
    out = jnp.dot(attn, wo_ref[:], preferred_element_type=jnp.float32).astype(x.dtype)
    out = out + bo_ref[:].astype(x.dtype)
    y = x + g_ref[0, 0].astype(x.dtype) * out
    # fused output masking: rows at/after the sequence length zero out, so
    # the caller's post-attention mask multiply (reference applies it before
    # every down/up resample) becomes a no-op it can skip — identical
    # downstream values, one fewer full-tensor pass
    row = jax.lax.broadcasted_iota(jnp.int32, (t_tile, 1), 0)
    valid = (j * t_tile + row) < lens_ref[0, 0, 0]
    y_ref[0] = y * valid.astype(y.dtype)


@partial(jax.jit, static_argnames=("heads", "dim_head", "t_tile", "interpret"))
def _fused_rezero_attention(x, w_qkv, w_out, b_out, g, lens_rows, heads: int,
                            dim_head: int, t_tile: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, c = x.shape
    hd = heads * dim_head
    n_pad = -(-n // t_tile) * t_tile
    xp = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0))) if n_pad != n else x
    wq = w_qkv[:, :hd]
    wk = w_qkv[:, hd : 2 * hd]
    wv = w_qkv[:, 2 * hd :]

    n_tiles = n_pad // t_tile
    ctx = pl.pallas_call(
        partial(_phase1_kernel, dim_head=dim_head, n_valid=n, t_tile=t_tile),
        out_shape=jax.ShapeDtypeStruct((b, hd, hd), jnp.float32),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, t_tile, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, hd), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, hd), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, hd, hd), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((1, hd), jnp.float32),
            pltpu.VMEM((1, hd), jnp.float32),
            pltpu.VMEM((hd, hd), jnp.float32),
        ],
        interpret=interpret,
    )(xp, wk.astype(x.dtype), wv.astype(x.dtype))

    y = pl.pallas_call(
        partial(_phase2_kernel, t_tile=t_tile),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, c), x.dtype),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, 1), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, t_tile, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, hd), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hd, hd), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hd, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, t_tile, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(lens_rows, xp, wq.astype(x.dtype), ctx, w_out.astype(x.dtype),
      b_out.reshape(1, -1), g.reshape(1, 1))
    return y[:, :n]


def fused_rezero_attention(x, w_qkv, w_out, b_out, g, lens_rows=None,
                           heads: int = 4, dim_head: int = 32,
                           t_tile: int = 512, interpret=None):
    """x: (B, N, C) flattened tokens -> mask * (x + g * LinearAttention(x)).

    w_qkv: (C, 3*H*d) [q|k|v]; w_out: (H*d, C); b_out: (C,); g: scalar.
    lens_rows: optional (B, 1, 1) int32 valid-row counts — the OUTPUT is
    zeroed at/after the length (keys keep the reference's no-mask semantics:
    zero padding rows DO enter the softmax, matching unitspeech.py:78-96),
    so the caller can skip its own post-attention mask multiply. None = no
    output masking (identical to the XLA path)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, n, _ = x.shape
    if lens_rows is None:
        lens_rows = jnp.full((b, 1, 1), n, jnp.int32)
    # tile must be a multiple of 8 (TPU sublane); padding rows are masked
    # exactly in-kernel
    t = min(t_tile, -(-n // 8) * 8)
    return _fused_rezero_attention(
        x, w_qkv, w_out, b_out, g, lens_rows.astype(jnp.int32),
        heads, dim_head, int(t), interpret
    )
