"""Fused Pallas TPU kernels for the U-Net's strided resampling convs.

The estimator's Downsample (conv3x3 stride 2, reference unitspeech.py:27-33)
and Upsample (ConvTranspose 4x4 stride 2, reference unitspeech.py:18-24)
are the last XLA-lowered convs in the sampler: the r2 device profile put
them at ~0.6 ms/step, ~3x off the MXU floor (ROADMAP ledger), and both
matmul reformulations at the XLA level were measured negatives because they
materialize full-resolution shifted/phase copies in HBM
(ops/conv_matmul.conv3x3_stride2_matmul / conv_transpose4x4_matmul).

These kernels keep the stride INSIDE VMEM, where tools/probe_stride.py
measured which forms Mosaic lowers correctly on-chip:

  * sublane-SPLIT reshape (R, C) -> (R//2, 2, C) -> [:, 0, :]  : OK
  * frame-block reshape (R, C) -> (R//(2F), 2F, C)[:, :F, :]   : OK
  * strided slice / lax.slice with strides                      : rejected
  * sublane-MERGE (stack + reshape) interleave                  : silently
    WRONG on-chip — the upsample kernel therefore never merges sublanes;
    output phases are packed on the LANE axis ((rows, 2C) blocks) and the
    caller un-packs with a free XLA reshape of the contiguous HBM array.

Layout matches ops/pallas_resnet.py: rows are flattened (time, freq)
(n = t*F + f), channels on lanes; conv taps are shifted matmuls with the
f32 accumulator rounded once to the compute dtype (the same numerics
contract as nn.Conv(dtype=...) within bf16 tolerance).

Sequence masking: the kernels zero input rows at/after the sequence length
in VMEM, so callers do NOT pre-multiply by the mask (one elementwise HBM
pass saved per resample). The conv bias is added everywhere including
padding rows — exactly like the XLA nn.Conv/nn.ConvTranspose the estimator
otherwise runs (the next ResnetBlock re-masks its input).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


def _subsample_even_rows(v):
    """(R, C) -> (R//2, C), rows 0, 2, 4, ... (Mosaic-safe sublane split)."""
    r, c = v.shape
    return v.reshape(r // 2, 2, c)[:, 0, :]


def _select_even_frames(v, f: int):
    """(2K*F, C) -> (K*F, C): keep frames 0, 2, 4, ... of F rows each."""
    r, c = v.shape
    k = r // (2 * f)
    return v.reshape(k, 2 * f, c)[:, :f, :].reshape(k * f, c)


def _row_shift(v, df: int, f: int):
    """+-1 freq-row shift with frame-boundary wrap masking (rows whose
    shift crosses a frame edge are zeroed; same scheme as pallas_resnet).
    Requires the row count be a multiple of f."""
    r, c = v.shape
    if df == 0:
        return v
    w = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0) % f
    zero = jnp.zeros((1, c), v.dtype)
    if df == -1:
        # row i <- v[i-1]; rows with f == 0 would read the previous frame
        return jnp.concatenate([zero, v[:-1]], 0) * (w != 0).astype(v.dtype)
    # row i <- v[i+1]; rows with f == F-1 would read the next frame
    return jnp.concatenate([v[1:], zero], 0) * (w != f - 1).astype(v.dtype)


def _downsample_kernel(lens_ref, top_ref, cur_ref, w_ref, b_ref, out_ref, *,
                       f: int, fpt: int, n_tiles: int, out_dtype):
    """One output tile of conv3x3/stride2: fpt output frames of F//2 rows.

    Window = [one halo frame (2*j*fpt - 1)] + [2*fpt input frames]. For tap
    (dt, df), output frame t_loc reads window frame 2*t_loc + dt + 1; after
    slicing off the leading (dt+1) frames that is always the EVEN frames of
    a 2*fpt-frame run, then the even rows within each frame — both
    Mosaic-safe reshape selections."""
    import jax.experimental.pallas as pl

    j = pl.program_id(1)
    top = top_ref[0]
    top = jnp.where(j == 0, jnp.zeros_like(top), top)  # input frame -1
    cur = cur_ref[0]
    # trailing zero frame: the dt=+1 slice spans 2*fpt frames starting at
    # window frame 2, whose last (odd, never-selected) frame falls one past
    # the real window — pad so the static slice stays in range
    win = jnp.concatenate([top, cur, jnp.zeros_like(top)], axis=0)

    # zero rows at/after the sequence length (callers never pre-mask)
    n_global = (
        jax.lax.broadcasted_iota(jnp.int32, (win.shape[0], 1), 0)
        + (j * 2 * fpt - 1) * f
    )
    valid = (n_global >= 0) & (n_global < lens_ref[0, 0, 0])
    win = win * valid.astype(win.dtype)

    cin = win.shape[-1]
    acc = None
    for df in (-1, 0, 1):
        shifted = _row_shift(win, df, f)
        for dt in (-1, 0, 1):
            # drop the leading (dt+1) frames, keep 2*fpt frames
            s = shifted[(dt + 1) * f : (dt + 1 + 2 * fpt) * f, :]
            s = _select_even_frames(s, f)        # fpt frames
            s = _subsample_even_rows(s)          # even freq rows
            k = ((dt + 1) * 3 + (df + 1)) * cin
            part = jnp.dot(s, w_ref[k : k + cin, :],
                           preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
    acc = acc + b_ref[:].astype(jnp.float32)
    out_ref[0] = acc.astype(out_dtype)


def _pick_fpt_down(t_out: int, f: int, c_max: int,
                   budget_bytes: int = 6 * 1024 * 1024):
    """Output frames per tile: divisor of T_out, output rows (fpt * F//2)
    8-aligned, VMEM window within budget, ~1024 window rows preferred.
    None when no divisor qualifies (callers fall back to XLA — a
    whole-layer misaligned-row block risks the Mosaic compile pathology
    documented in pallas_resnet.fused_resnet_block_deep)."""
    best, best_key = None, None
    for k in range(1, t_out + 1):
        if t_out % k:
            continue
        if (k * (f // 2)) % 8:
            continue
        rows = (2 * k + 1) * f
        # in window (bf16) + out (bf16) + f32 accum + the (9*cin, cout)
        # weight block — omitting the weights under-counted by ~2-3 MB at
        # C=256 (ADVICE r3)
        if rows * c_max * 6 + 9 * c_max * c_max * 2 > budget_bytes:
            continue
        key = (abs(rows - 1024), -k)
        if best_key is None or key < best_key:
            best, best_key = k, key
    return best


def supports_downsample(t: int, f: int, c_max: int) -> bool:
    """True when fused_downsample_conv has an aligned tiling for this
    input shape. Mosaic requires every block's sublane dim be 8-divisible
    (or match the array), and the one-frame halo blocks are f rows — so
    f % 8 == 0 on top of an aligned output tile. In the estimator that
    admits the F=80 and F=40 downsamples; F=20 (T_out=43 prime, F_out=10)
    stays on XLA."""
    return (t % 2 == 0 and f % 8 == 0
            and _pick_fpt_down(t // 2, f, c_max) is not None)


def supports_upsample(t: int, f: int, c_max: int) -> bool:
    """True when fused_upsample_conv has an aligned tiling (f % 8 == 0 for
    the one-frame halo blocks — the estimator's F=40 up stage; the F=20 and
    F=10 up stages would need multi-frame halo blocks, unbuilt)."""
    return f % 8 == 0 and _pick_fpt_up(t, f, c_max) is not None


@partial(
    jax.jit,
    static_argnames=("t", "f", "interpret", "out_dtype_name", "fpt"),
)
def _fused_downsample(x, lens_rows, w, b, t: int, f: int, interpret: bool,
                      out_dtype_name: str, fpt: int = 0):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    out_dtype = jnp.dtype(out_dtype_name)
    bsz, n, cin = x.shape
    cout = w.shape[-1]
    t_out, f_out = t // 2, f // 2
    fpt = fpt or _pick_fpt_down(t_out, f, max(cin, cout))
    if fpt is None:
        raise ValueError(
            f"no aligned downsample tiling for T={t}, F={f}; gate with "
            "supports_downsample()")
    n_tiles = t_out // fpt

    lens_spec = pl.BlockSpec((1, 1, 1), lambda bb, j: (bb, 0, 0),
                             memory_space=pltpu.SMEM)
    # input blocks are indexed in FRAME units (block row size f):
    # top halo = frame 2*j*fpt - 1 (clamped at 0; kernel zeroes it at j=0),
    # cur = frames [2*j*fpt, 2*(j+1)*fpt)
    top = pl.BlockSpec((1, f, cin),
                       lambda bb, j: (bb, jnp.maximum(2 * j * fpt - 1, 0), 0),
                       memory_space=pltpu.VMEM)
    cur = pl.BlockSpec((1, 2 * fpt * f, cin), lambda bb, j: (bb, j, 0),
                       memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((9 * cin, cout), lambda bb, j: (0, 0),
                          memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((1, cout), lambda bb, j: (0, 0),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, fpt * f_out, cout), lambda bb, j: (bb, j, 0),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        partial(_downsample_kernel, f=f, fpt=fpt, n_tiles=n_tiles,
                out_dtype=out_dtype),
        grid=(bsz, n_tiles),
        in_specs=[lens_spec, top, cur, w_spec, b_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, t_out * f_out, cout), out_dtype),
        interpret=interpret,
    )(lens_rows, x, x, w.reshape(9 * cin, cout), b.reshape(1, cout))
    return out


def fused_downsample_conv(x, mask, kernel, bias,
                          interpret: Optional[bool] = None, fpt: int = 0):
    """conv3x3 stride 2 'SAME' (models/unet.py Downsample; reference
    unitspeech.py:27-33): x (B, T, F, C), T and F even, kernel
    (3, 3, Cin, Cout) flax layout -> (B, T//2, F//2, Cout).

    mask (B, T, 1, 1) prefix mask — applied IN KERNEL to the input rows
    (equivalent to the estimator's `h * mask` before the XLA Downsample);
    the output carries the conv bias everywhere like nn.Conv."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bsz, t, f, cin = x.shape
    # f32 accumulation: a bf16 mask sum rounds odd lengths > 256 to even
    lens_frames = jnp.sum(
        mask.reshape(bsz, t).astype(jnp.float32), axis=1
    ).astype(jnp.int32)
    lens_rows = (lens_frames * f).reshape(bsz, 1, 1)
    out = _fused_downsample(
        x.reshape(bsz, t * f, cin), lens_rows, kernel.astype(x.dtype),
        bias, t=t, f=f, interpret=bool(interpret),
        out_dtype_name=jnp.dtype(x.dtype).name, fpt=fpt,
    )
    return out.reshape(bsz, t // 2, f // 2, -1)


# ---------------------------------------------------------------------------
# Upsample: ConvTranspose 4x4 stride 2, flax padding (2, 2)
# (== torch ConvTranspose2d(4, stride=2, padding=1); the weight converter
# already flips kernels into flax layout).
#
# Output (2m + a, 2j + b) reads exactly 4 input taps:
#   time:  a=0 -> x[m-1] K[0], x[m] K[2];  a=1 -> x[m] K[1], x[m+1] K[3]
#   freq:  the same pattern over kernel columns.
# Each phase (a, b) is 4 (rows, C) x (C, Cout) matmuls on the UN-dilated
# rows — the exact flop floor. The freq pair (b=0, b=1) is emitted packed on
# lanes ((rows, 2*Cout)); time phases interleave as F-row frame blocks via
# static concats. The caller's reshape of the contiguous (B, n/2, 2*Cout)
# HBM array to (B, 2T, 2F, Cout) is free (row-major bitcast).
# ---------------------------------------------------------------------------


def _upsample_kernel(lens_ref, top_ref, cur_ref, bot_ref, w_ref, b_ref,
                     out_ref, *, f: int, fpt: int, n_tiles: int, out_dtype):
    """One tile: fpt input frames -> 2*fpt output frames, freq-pair packed.

    w_ref rows: [kt*4 + kf] * Cin -> (16*Cin, Cout) in flax ConvTranspose
    tap order (kt, kf in [0, 4))."""
    import jax.experimental.pallas as pl

    j = pl.program_id(1)
    top = top_ref[0]
    cur = cur_ref[0]
    bot = bot_ref[0]
    top = jnp.where(j == 0, jnp.zeros_like(top), top)
    bot = jnp.where(j == n_tiles - 1, jnp.zeros_like(bot), bot)
    win = jnp.concatenate([top, cur, bot], axis=0)  # ((fpt + 2) * F, C)

    n_global = (
        jax.lax.broadcasted_iota(jnp.int32, (win.shape[0], 1), 0)
        + (j * fpt - 1) * f
    )
    valid = (n_global >= 0) & (n_global < lens_ref[0, 0, 0])
    win = win * valid.astype(win.dtype)

    cin = win.shape[-1]
    cout = out_ref.shape[-1] // 2

    # freq-shifted copies: out col 2j+b reads input cols j + {0, -1 or +1}
    # kf taps: b=0 -> kf in {1, 3} reading cols {j, j-1}; b=1 -> kf in
    # {0, 2} reading cols {j+1, j}
    shifted = {df: _row_shift(win, df, f) for df in (-1, 0, 1)}

    def tap(src, frame_off: int, kt: int, kf: int):
        """matmul of fpt frames starting at window frame (1 + frame_off)."""
        base = (1 + frame_off) * f
        rows = src[base : base + fpt * f, :]
        k = (kt * 4 + kf) * cin
        return jnp.dot(rows, w_ref[k : k + cin, :],
                       preferred_element_type=jnp.float32)

    # phase (a, b) accumulators, each (fpt * F, Cout) f32
    phases = {}
    for a in (0, 1):
        for b_ in (0, 1):
            # time taps: a=0 -> (kt=0, m-1), (kt=2, m); a=1 -> (kt=1, m),
            # (kt=3, m+1)
            tt = ((0, -1), (2, 0)) if a == 0 else ((1, 0), (3, 1))
            # freq taps: b=0 -> (kf=0, j-1), (kf=2, j); b=1 -> (kf=1, j),
            # (kf=3, j+1); freq shift df means reading input col j + df,
            # i.e. row shift by +df
            ff = ((0, -1), (2, 0)) if b_ == 0 else ((1, 0), (3, 1))
            acc = None
            for kt, mt in tt:
                for kf, df in ff:
                    part = tap(shifted[df], mt, kt, kf)
                    acc = part if acc is None else acc + part
            phases[(a, b_)] = acc + b_ref[:].astype(jnp.float32)

    # pack freq pair on lanes: (rows, 2*Cout) with [b=0 | b=1]
    pa0 = jnp.concatenate([phases[(0, 0)], phases[(0, 1)]], axis=1)
    pa1 = jnp.concatenate([phases[(1, 0)], phases[(1, 1)]], axis=1)
    # interleave time phases as F-row frame blocks: out frames
    # 2m (a=0), 2m+1 (a=1) for each of the fpt input frames
    blocks = []
    for m in range(fpt):
        blocks.append(pa0[m * f : (m + 1) * f, :])
        blocks.append(pa1[m * f : (m + 1) * f, :])
    out_ref[0] = jnp.concatenate(blocks, axis=0).astype(out_dtype)


def _pick_fpt_up(t: int, f: int, c_max: int,
                 budget_bytes: int = 6 * 1024 * 1024):
    best, best_key = None, None
    for k in range(1, t + 1):
        if t % k:
            continue
        if (2 * k * f) % 8:
            continue
        rows = (k + 2) * f
        # window + 4 f32 phase accumulators at 2x lanes + the (16*cin, cout)
        # weight block + the packed (2*fpt*f, 2*cout) bf16 output block
        # (weight/output terms were omitted pre-r4 — ADVICE r3)
        if (rows * c_max * 2 + 4 * k * f * c_max * 4
                + 16 * c_max * c_max * 2 + 8 * k * f * c_max) > budget_bytes:
            continue
        key = (abs(rows - 1024), -k)
        if best_key is None or key < best_key:
            best, best_key = k, key
    return best


@partial(
    jax.jit,
    static_argnames=("t", "f", "interpret", "out_dtype_name", "fpt"),
)
def _fused_upsample(x, lens_rows, w, b, t: int, f: int, interpret: bool,
                    out_dtype_name: str, fpt: int = 0):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    out_dtype = jnp.dtype(out_dtype_name)
    bsz, n, cin = x.shape
    cout = w.shape[-1]
    fpt = fpt or _pick_fpt_up(t, f, max(cin, cout))
    if fpt is None:
        raise ValueError(
            f"no aligned upsample tiling for T={t}, F={f}; gate with "
            "supports_upsample()")
    n_tiles = t // fpt

    lens_spec = pl.BlockSpec((1, 1, 1), lambda bb, j: (bb, 0, 0),
                             memory_space=pltpu.SMEM)
    top = pl.BlockSpec((1, f, cin),
                       lambda bb, j: (bb, jnp.maximum(j * fpt - 1, 0), 0),
                       memory_space=pltpu.VMEM)
    cur = pl.BlockSpec((1, fpt * f, cin), lambda bb, j: (bb, j, 0),
                       memory_space=pltpu.VMEM)
    bot = pl.BlockSpec((1, f, cin),
                       lambda bb, j: (bb, jnp.minimum(j * fpt + fpt, t - 1), 0),
                       memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((16 * cin, cout), lambda bb, j: (0, 0),
                          memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((1, cout), lambda bb, j: (0, 0),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 2 * fpt * f, 2 * cout),
                            lambda bb, j: (bb, j, 0),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        partial(_upsample_kernel, f=f, fpt=fpt, n_tiles=n_tiles,
                out_dtype=out_dtype),
        grid=(bsz, n_tiles),
        in_specs=[lens_spec, top, cur, bot, w_spec, b_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, 2 * t * f, 2 * cout), out_dtype),
        interpret=interpret,
    )(lens_rows, x, x, x, w.reshape(16 * cin, cout), b.reshape(1, cout))
    return out


def fused_upsample_conv(x, mask, kernel, bias,
                        interpret: Optional[bool] = None, fpt: int = 0):
    """ConvTranspose 4x4 stride 2, flax padding (2, 2) (models/unet.py
    Upsample; reference unitspeech.py:18-24): x (B, T, F, C), kernel
    (4, 4, Cin, Cout) flax layout -> (B, 2T, 2F, Cout).

    mask applied in kernel to the input rows (callers skip `h * mask`)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bsz, t, f, cin = x.shape
    cout = kernel.shape[-1]
    # f32 accumulation: a bf16 mask sum rounds odd lengths > 256 to even
    lens_frames = jnp.sum(
        mask.reshape(bsz, t).astype(jnp.float32), axis=1
    ).astype(jnp.int32)
    lens_rows = (lens_frames * f).reshape(bsz, 1, 1)
    out = _fused_upsample(
        x.reshape(bsz, t * f, cin), lens_rows, kernel.astype(x.dtype),
        bias, t=t, f=f, interpret=bool(interpret),
        out_dtype_name=jnp.dtype(x.dtype).name, fpt=fpt,
    )
    # free reshape of the contiguous array: (B, 2T*F, 2*Cout) row-major is
    # exactly (B, 2T, 2F, Cout) — rows pack (frame, freq-pair), lanes (b)
    return out.reshape(bsz, 2 * t, 2 * f, cout)
