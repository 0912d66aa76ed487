"""Pallas row-statistics kernels for the flat-path GroupNorm and int8 scales.

Why this exists: the flat deep-block GroupNorm statistics were emitted by XLA
as variadic convert+sum+sumsq reduce fusions that measured ~10x their HBM
bytes bound (thirteen fusions, 0.88 ms/step of the serving sampler — r4
roofline, tools/roofline.py). The same slow-reduce lowering hits the int8
activation abs-max scale pass (ops/conv_matmul.conv3x3_int8). Reducing over
a (B, n, G, C/G) reshape additionally splits the 128-lane channel axis; but
even the lane-intact row reduce lowers poorly (the r4 lane-aligned
_group_norm_lowmem restructure recovered only ~0.1 ms/step).

These kernels do ONE bytes-bound pass per tensor: channels stay on lanes,
the row axis (time*freq) reduces across sublanes, accumulation is f32.
Group pooling then happens on the tiny (B, C) sums — the same structure as
ops/pallas_resnet._group_stats, which the fused early-stage kernels already
use (reference GroupNorm semantics: torch GroupNorm over all rows including
padding, /root/reference/unitspeech/unitspeech.py:46-55).

The whole (n, C) slab for one batch element is a single block (flat-path
activations are <= ~2 MB), so there is no tiling and no 8-row alignment
constraint — alignment only bites when slicing interior blocks out of a
larger array (ops/pallas_resnet.py deep-kernel compile pathology).

row_stats carries a custom VJP (d sum/dx = 1, d sumsq/dx = 2x) so the
training paths can share the kernel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# one batch element's slab must fit VMEM: the grid double-buffers input
# blocks (2x itemsize) and a bf16 input additionally materializes its f32
# cast in registers/VMEM (+4); the serving shapes (bf16/int8 path, n*C up
# to 1720x512) land at ~7 MB against the chip's ~16 MB VMEM
_VMEM_BUDGET = 8 * 1024 * 1024


def supported(n: int, c: int, itemsize: int) -> bool:
    return c % 128 == 0 and n * c * (2 * itemsize + 4) <= _VMEM_BUDGET


def _stats_kernel(x_ref, o_ref):
    xf = x_ref[0].astype(jnp.float32)
    s = jnp.sum(xf, axis=0, keepdims=True)
    ss = jnp.sum(xf * xf, axis=0, keepdims=True)
    o_ref[0] = jnp.concatenate([s, ss], axis=0)


def _absmax_kernel(x_ref, o_ref):
    o_ref[0] = jnp.max(jnp.abs(x_ref[0].astype(jnp.float32)), axis=0,
                       keepdims=True)


@partial(jax.jit, static_argnames=("interpret",))
def _row_stats_pallas(x, interpret: bool):
    import jax.experimental.pallas as pl

    b, n, c = x.shape
    return pl.pallas_call(
        _stats_kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, n, c), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, 2, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, 2, c), jnp.float32),
        interpret=interpret,
    )(x)


@partial(jax.jit, static_argnames=("interpret",))
def _row_absmax_pallas(x, interpret: bool):
    import jax.experimental.pallas as pl

    b, n, c = x.shape
    out = pl.pallas_call(
        _absmax_kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, n, c), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
        interpret=interpret,
    )(x)
    return out.reshape(b, c)


def _row_stats_xla(x):
    s = jnp.sum(x, axis=1, dtype=jnp.float32)
    ss = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=1)
    return jnp.stack([s, ss], axis=1)


@jax.custom_vjp
def row_stats(x):
    """Per-channel row statistics: x (B, n, C) -> (B, 2, C) f32 where
    [:, 0] = sum over rows and [:, 1] = sum of squares. One bytes-bound
    Pallas pass on TPU; jnp fallback elsewhere / at unsupported shapes."""
    b, n, c = x.shape
    if jax.default_backend() == "tpu" and supported(n, c, x.dtype.itemsize):
        return _row_stats_pallas(x, interpret=False)
    return _row_stats_xla(x)


def _row_stats_fwd(x):
    return row_stats(x), x


def _row_stats_bwd(x, g):
    gs = g[:, 0:1, :]
    gss = g[:, 1:2, :]
    return ((gs + 2.0 * x.astype(jnp.float32) * gss).astype(x.dtype),)


row_stats.defvjp(_row_stats_fwd, _row_stats_bwd)


def row_absmax(x):
    """Per-channel max |x| over rows: (B, n, C) -> (B, C) f32. Inference-only
    (int8 scale factors); no VJP defined — wrap in stop_gradient if a traced
    gradient path ever reaches it."""
    b, n, c = x.shape
    if jax.default_backend() == "tpu" and supported(n, c, x.dtype.itemsize):
        return _row_absmax_pallas(x, interpret=False)
    return jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1)


def group_mean_inv(x2, groups: int, eps: float = 1e-5):
    """GroupNorm statistics for a row-flattened activation x2 (B, n, C):
    returns per-channel f32 (mean, inv_std), each (B, C), constant within
    each group. Stats pool over ALL rows (torch GroupNorm parity — padding
    rows included, see models/unet.py gn docstrings)."""
    b, n, c = x2.shape
    cg = c // groups
    st = row_stats(x2)  # (B, 2, C) f32
    m = float(n * cg)
    mean_g = st[:, 0].reshape(b, groups, cg).sum(-1) / m  # (B, G)
    var_g = st[:, 1].reshape(b, groups, cg).sum(-1) / m - jnp.square(mean_g)
    inv_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.repeat(mean_g, cg, axis=1)  # (B, C) f32
    inv_c = jnp.repeat(inv_g, cg, axis=1)
    return mean_c, inv_c
