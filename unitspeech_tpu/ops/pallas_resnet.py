"""Fused Pallas TPU kernels for the U-Net ResnetBlock hot path.

The estimator is HBM-bandwidth bound (ROADMAP: 10.4 ms/step measured vs a
5.1 ms conv-only floor; the gap is GroupNorm passes + elementwise FiLM/mask/
mish that XLA cannot fuse into TPU convolutions, because conv operands must
materialize). This module runs one ResnetBlock
(reference /root/reference/unitspeech/unitspeech.py:46-75; XLA twin
models/unet.py:ResnetBlock) as THREE chained kernels:

  A: conv3x3(x) + bias            -> c1 (HBM) + per-(batch,channel) sum/sumsq
  B: GN1-apply + mish + mask + FiLM + conv3x3 + bias
                                  -> c2 (HBM) + stats2
  C: GN2-apply + mish + mask + residual(1x1 conv or identity)  -> out

GroupNorm needs global statistics over all (time x freq) positions, so each
conv output must round-trip HBM once before its normalize — but everything
elementwise rides along inside the conv kernels, cutting the block's HBM
traffic from ~13 tensor passes (XLA) to ~7.5.

Layout: rows are flattened (time, freq) -> n = t*F + f, channels on lanes.
conv3x3 = 9 shifted matmuls: output row n reads rows n + dt*F + df. A tile of
TILE = 8 frames (8F rows) gets a one-frame halo from neighbor blocks (extra
in_specs on the same array — +25% read amplification, no pre-gather pass);
the +-1 freq shifts are static slice+concat row shifts, and the
rows where a shift crosses a frame boundary are exactly the rows the static
freq-wrap masks zero (Mosaic cannot lower strided gathers; CLAUDE.md).

Numerics match the XLA path: convs accumulate f32 on the MXU and round once
to the compute dtype; GN statistics are f32 E[x^2]-E[x]^2 with eps 1e-5
(models/unet.py:_group_norm_lowmem); mish runs in f32 in-VMEM. GN statistics
pool over ALL rows including padding frames, like torch GroupNorm in the
reference (verified output-level in tests/test_reference_parity.py).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

def _pick_frames_per_tile(t: int, f: int, c_max: int,
                          budget_bytes: int = 6 * 1024 * 1024) -> int:
    """Divisor of T whose tile is closest to ~1024 rows within the VMEM
    working-set budget (~10 bytes per row-channel: double-buffered bf16
    in/out blocks + f32 accumulator). v5e sweep (tools/bench_conv_variants
    --fpt-sweep): tiny tiles pay halo re-reads (stage1 fpt=1: 0.755 ms vs
    0.356 at fpt=43); very large tiles pipeline slightly worse (stage0
    fpt=43/3440 rows: 0.562 ms vs 0.539 at fpt=8/640 rows). T halves per
    U-Net stage (344 -> 172 -> 86), so divisors, not powers of two."""
    target_rows = 1024
    best, best_key = 1, None
    for k in range(1, t + 1):
        if t % k == 0 and k * f * c_max * 10 <= budget_bytes:
            key = (abs(k * f - target_rows), -k)
            if best_key is None or key < best_key:
                best, best_key = k, key
    return best


def supports_shape(t: int, f: int) -> bool:
    """Mosaic requires every block's sublane dim be a multiple of 8: the
    center tile is fpt*f rows and the halo blocks are f rows, so the fused
    path needs f % 8 == 0. In the estimator that holds for the first two
    U-Net stages (F=80, 40); the deeper stages (F=20, 10) fall back to the
    XLA ResnetBlock — they carry 4-8x fewer activation bytes, so the HBM win
    lives in the early stages anyway."""
    return f % 8 == 0 and t >= 1


# mish exp implementation inside the fused kernels:
#   "exp"         Mosaic's builtin exp (DEFAULT). Measured ~20 lane-ops
#                 (tools/bench_transcendental.py r4) — ~6-11% of the fused
#                 early-stage block time (--mish-mode probe_noexp).
#   "fast"        exp2-poly exp (ops/fastmath.py): measured NEGATIVE, ~85
#                 lane-ops — Mosaic lowers the i32 shift/bitcast exponent
#                 construction as wide multi-pass ops. Kept as the
#                 documented attempt; do not flip without re-measuring.
#   "probe_noexp" WRONG numerics, timing diagnostic only
MISH_MODE = "exp"


def _mish_f32(x):
    """mish(x) = x * tanh(softplus(x)), computed with ONE transcendental via
    the exact identity tanh(log(1+e^x)) = ((1+e^x)^2 - 1)/((1+e^x)^2 + 1) —
    the naive form costs ~3 (exp, log1p, tanh), and the VPU's transcendental
    throughput is a real term in the fused kernels' budget. (1+e^x)^2
    overflows f32 at x ~ 44 (-> inf/inf = NaN), and tanh(softplus(x)) == 1.0
    to f32 precision for x > 20, so large x selects the identity branch."""
    from unitspeech_tpu.ops.fastmath import fast_exp

    xf = x.astype(jnp.float32)
    if MISH_MODE == "probe_identity":
        return x  # DIAGNOSTIC: bounds the ENTIRE mish cost
    if MISH_MODE == "probe_noexp":
        e = jnp.minimum(xf, 30.0) * 0.5 + 1.0  # DIAGNOSTIC: exp -> multiply
    elif MISH_MODE == "exp":
        e = jnp.exp(jnp.minimum(xf, 30.0))
    else:
        e = fast_exp(jnp.minimum(xf, 30.0))
    t = jnp.square(1.0 + e)
    if MISH_MODE == "probe_nodiv":
        r = (t - 1.0) * 0.25  # DIAGNOSTIC: divide -> multiply
    else:
        r = (t - 1.0) / (t + 1.0)
    return jnp.where(xf > 20.0, xf, xf * r).astype(x.dtype)


def _group_stats(sum_c, sumsq_c, n_rows: int, groups: int, eps: float = 1e-5):
    """Per-channel f32 (sum, sumsq) -> per-channel broadcastable (mean, inv).
    Pools channels within each group like GroupNorm.

    The pooling is a matmul against a (C, C) same-group indicator matrix —
    reshaping (C,) to (groups, C/groups) would split the 128-lane dim, which
    Mosaic cannot lower (CLAUDE.md). One (1,C)x(C,C) matmul both pools and
    broadcasts back per channel."""
    c = sum_c.shape[-1]
    cg = c // groups
    row = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0) // cg
    col = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1) // cg
    same_group = (row == col).astype(jnp.float32)  # (C, C)
    m = float(n_rows * cg)
    mean_c = jnp.dot(
        sum_c.reshape(1, c), same_group, preferred_element_type=jnp.float32
    ) / m
    ex2_c = jnp.dot(
        sumsq_c.reshape(1, c), same_group, preferred_element_type=jnp.float32
    ) / m
    inv_c = jax.lax.rsqrt(ex2_c - mean_c * mean_c + eps)
    return mean_c, inv_c  # (1, C) each, constant within each group


def _assemble_window(top_ref, cur_ref, bot_ref, f: int, tile: int, n_tiles: int,
                     valid_rows_ref):
    """Build the (TILE + 2F, C) halo window in registers, zeroing halo rows
    that fall outside the array (clamped neighbor blocks at the grid edges)
    and rows at/after the sequence length."""
    import jax.experimental.pallas as pl

    j = pl.program_id(1)
    top = top_ref[0]
    cur = cur_ref[0]
    bot = bot_ref[0]
    top = jnp.where(j == 0, jnp.zeros_like(top), top)
    bot = jnp.where(j == n_tiles - 1, jnp.zeros_like(bot), bot)
    win = jnp.concatenate([top, cur, bot], axis=0)  # (TILE + 2F, C)
    # sequence mask: window row w holds flat row n = j*TILE + w - F;
    # valid while n < len_frames * F (valid_rows = len_frames * F)
    n_global = (
        jax.lax.broadcasted_iota(jnp.int32, (tile + 2 * f, 1), 0)
        + j * tile - f
    )
    valid = (n_global >= 0) & (n_global < valid_rows_ref[0, 0, 0])
    return win * valid.astype(win.dtype)


def _freq_wrap_masks(f: int, tile: int, dtype):
    """Masks killing rows where a +-1 freq shift crosses a frame boundary.
    Window rows w <-> local u = w - F with u%F == w%F (TILE and the F-row
    halo are both multiples of F). Built from an in-kernel iota — array
    constants cannot be captured by a pallas kernel."""
    w = jax.lax.broadcasted_iota(jnp.int32, (tile + 2 * f, 1), 0) % f
    mask_m = (w != 0).astype(dtype)       # df = -1: f==0 wraps
    mask_p = (w != f - 1).astype(dtype)   # df = +1: f==F-1 wraps
    return mask_m, mask_p


def _conv3x3_taps(win, w_ref, f: int, tile: int, tap_mode: str = "taps"):
    """conv3x3 over the assembled window. win: (TILE+2F, C); w_ref rows:
    [(dt+1)*3 + (df+1)] * Cin -> (Cin, Cout). f32 accumulator.

    tap_mode="taps": 9 shifted (TILE, C) x (C, Cout) matmuls. "im2col":
    concatenate the 9 taps on lanes IN VMEM and run ONE
    (TILE, 9C) x (9C, Cout) matmul. The hypothesis was that the 9x-longer K
    would amortize the MXU's systolic pipeline better at small C; measured
    on v5e it LOSES — stage0 fpt=8: 0.67 vs 0.58 taps; stage1's best taps
    config also wins (0.305 at fpt=43 vs 0.34 im2col) — the in-VMEM tap
    concat costs more vector moves than the longer contraction saves, so
    taps stays the default (tools/bench_conv_variants.py --fpt-sweep).

    "taps3": middle ground — lane-concat ONLY the three freq shifts
    (win_m | win | win_p) into one (TILE+2F, 3C) window, then 3 row-shifted
    (TILE, 3C) x (3C, Cout) matmuls (dt = -1/0/+1). vs "taps": 6 fewer MXU
    dispatches and 6 fewer (TILE, Cout) f32 accumulator adds; vs "im2col":
    the concat copies 3 full-height arrays ONCE instead of materializing 9
    row-offset tap extracts. The w row order (dt-major, df-minor) makes each
    dt's (3C, Cout) weight slice contiguous, matching the lane order."""
    cin = win.shape[-1]
    mask_m, mask_p = _freq_wrap_masks(f, tile, win.dtype)
    # +-1 row shifts as static slice+concat (Mosaic's rotate op does not
    # support 16-bit data). The zero edge row replaces roll's wraparound row,
    # which the freq-wrap mask kills either way (the window's first/last rows
    # are frame-boundary rows by construction: (2F-1) % F == F-1).
    zero_row = jnp.zeros((1, cin), win.dtype)
    win_m = jnp.concatenate([zero_row, win[:-1]], 0) * mask_m  # row i = win[i-1]
    win_p = jnp.concatenate([win[1:], zero_row], 0) * mask_p   # row i = win[i+1]
    if tap_mode == "im2col":
        taps = [
            src[f + dt * f : f + dt * f + tile, :]
            for dt in (-1, 0, 1)
            for _, src in ((-1, win_m), (0, win), (1, win_p))
        ]
        col = jnp.concatenate(taps, axis=1)  # (TILE, 9C), tap order == w rows
        return jnp.dot(col, w_ref[:], preferred_element_type=jnp.float32)
    if tap_mode == "taps3":
        col3 = jnp.concatenate([win_m, win, win_p], axis=1)  # (TILE+2F, 3C)
        acc = None
        for dt in (-1, 0, 1):
            base = f + dt * f
            tap = col3[base : base + tile, :]
            w = w_ref[(dt + 1) * 3 * cin : (dt + 2) * 3 * cin, :]
            part = jnp.dot(tap, w, preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
        return acc
    acc = None
    for dt in (-1, 0, 1):
        base = f + dt * f
        for df, src in ((-1, win_m), (0, win), (1, win_p)):
            tap = src[base : base + tile, :]
            k = ((dt + 1) * 3 + (df + 1)) * cin
            w = w_ref[k : k + cin, :]
            part = jnp.dot(tap, w, preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
    return acc  # (TILE, Cout) f32


def _conv3x3_taps_int8(win, w_ref, sw_ref, f: int, tile: int):
    """int8 variant of the 9-tap conv: the window quantizes IN KERNEL with a
    dynamic per-tile scale (finer than the flat path's per-tensor scale),
    weights arrive pre-quantized per output channel (int8 w_ref + f32
    reciprocal-scale sw_ref). int8 x int8 -> int32 on the MXU = 2x
    throughput at the compute-bound early stages. ~1% relative error; used
    only under the opt-in use_int8 flag (excluded from parity claims)."""
    cin = win.shape[-1]
    mask_m, mask_p = _freq_wrap_masks(f, tile, win.dtype)
    zero_row = jnp.zeros((1, cin), win.dtype)
    win_m = jnp.concatenate([zero_row, win[:-1]], 0) * mask_m
    win_p = jnp.concatenate([win[1:], zero_row], 0) * mask_p
    s_x = 127.0 / (jnp.max(jnp.abs(win.astype(jnp.float32))) + 1e-8)

    def q(v):
        return jnp.clip(
            jnp.round(v.astype(jnp.float32) * s_x), -127, 127
        ).astype(jnp.int8)

    srcs = {-1: q(win_m), 0: q(win), 1: q(win_p)}
    acc = None
    for dt in (-1, 0, 1):
        base = f + dt * f
        for df in (-1, 0, 1):
            tap = srcs[df][base : base + tile, :]
            k = ((dt + 1) * 3 + (df + 1)) * cin
            part = jnp.dot(tap, w_ref[k : k + cin, :],
                           preferred_element_type=jnp.int32)
            acc = part if acc is None else acc + part
    # dequant: x-scale is scalar, weight scales are per output channel
    return acc.astype(jnp.float32) * ((1.0 / s_x) * sw_ref[:])


def _kernel_a(lens_ref, top_ref, cur_ref, bot_ref, w_ref, sw_ref, b_ref,
              out_ref, stats_ref, *, f: int, tile: int, n_tiles: int,
              out_dtype, tap_mode: str, int8: bool):
    import jax.experimental.pallas as pl

    j = pl.program_id(1)
    win = _assemble_window(top_ref, cur_ref, bot_ref, f, tile, n_tiles,
                           lens_ref)
    if int8:
        acc = _conv3x3_taps_int8(win, w_ref, sw_ref, f, tile)
    else:
        acc = _conv3x3_taps(win, w_ref, f, tile, tap_mode)
    acc = acc + b_ref[:].astype(jnp.float32)
    out_ref[0] = acc.astype(out_dtype)

    @pl.when(j == 0)
    def _():
        stats_ref[0] = jnp.zeros_like(stats_ref[0])

    stats_ref[0, 0, :] += jnp.sum(acc, axis=0)
    stats_ref[0, 1, :] += jnp.sum(acc * acc, axis=0)


def _kernel_b(lens_ref, top_ref, cur_ref, bot_ref, stats_ref, scale_ref,
              bias_ref, film_ref, w_ref, sw_ref, b_ref, out_ref, stats2_ref,
              *, f: int, tile: int, n_tiles: int, n_rows: int, groups: int,
              out_dtype, tap_mode: str, int8: bool):
    import jax.experimental.pallas as pl

    j = pl.program_id(1)
    # raw conv1 window (halo from neighbors); GN/mish/film applied in-VMEM,
    # recomputed on the halo rows (cheap) instead of re-reading a normalized
    # tensor from HBM
    win = _assemble_window(top_ref, cur_ref, bot_ref, f, tile, n_tiles,
                           lens_ref)
    mean, inv = _group_stats(
        stats_ref[0, 0, :], stats_ref[0, 1, :], n_rows, groups
    )
    h = (win.astype(jnp.float32) - mean) * inv
    h = h * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)
    h = _mish_f32(h)
    h = h + film_ref[0].astype(jnp.float32)
    # re-mask: mish(gn)+film un-zeroes padding rows; conv2's input mask
    # (reference Block, unitspeech.py:52) and the t-halo zeroing coincide
    n_global = (
        jax.lax.broadcasted_iota(jnp.int32, (tile + 2 * f, 1), 0)
        + j * tile - f
    )
    valid = (n_global >= 0) & (n_global < lens_ref[0, 0, 0])
    h = (h * valid.astype(jnp.float32)).astype(win.dtype)

    if int8:
        acc = _conv3x3_taps_int8(h, w_ref, sw_ref, f, tile)
    else:
        acc = _conv3x3_taps(h, w_ref, f, tile, tap_mode)
    acc = acc + b_ref[:].astype(jnp.float32)
    out_ref[0] = acc.astype(out_dtype)

    @pl.when(j == 0)
    def _():
        stats2_ref[0] = jnp.zeros_like(stats2_ref[0])

    stats2_ref[0, 0, :] += jnp.sum(acc, axis=0)
    stats2_ref[0, 1, :] += jnp.sum(acc * acc, axis=0)


def _kernel_c(lens_ref, c2_ref, x_ref, stats_ref, scale_ref, bias_ref,
              wres_ref, bres_ref, out_ref, *, tile: int, n_rows: int,
              groups: int, res_mode: str, out_dtype):
    """res_mode: 'identity' adds x; 'matmul' adds the in-kernel 1x1-conv
    residual (early tiled path — tile rows are 8-aligned); 'none' emits the
    GN2+mish+mask term alone and the caller adds an XLA residual. The deep
    whole-layer path must use 'none' when cin != cout: Mosaic's LOWERING of
    a (n, cin) x (cin, cout) dot with n % 8 != 0 rows blows up
    combinatorially (measured 379 s to lower ONE such dot at n=430,
    cin=512, cout=1024 — tools/bisect_deep_compile.py; every aligned-row or
    dot-free variant lowers in ~1 s)."""
    import jax.experimental.pallas as pl

    j = pl.program_id(1)
    c2 = c2_ref[0]
    mean, inv = _group_stats(
        stats_ref[0, 0, :], stats_ref[0, 1, :], n_rows, groups
    )
    h = (c2.astype(jnp.float32) - mean) * inv
    h = h * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)
    h = _mish_f32(h)
    n_global = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0) + j * tile
    valid = (n_global < lens_ref[0, 0, 0]).astype(jnp.float32)
    h = h * valid

    if res_mode == "none":
        out_ref[0] = h.astype(out_dtype)
        return
    x = x_ref[0]
    xv = x * valid.astype(x.dtype)  # input rows may be unmasked
    if res_mode == "identity":
        res = xv.astype(jnp.float32)
    else:
        res = jnp.dot(xv, wres_ref[:], preferred_element_type=jnp.float32)
        res = (res + bres_ref[:].astype(jnp.float32)) * valid
    out_ref[0] = (h + res).astype(out_dtype)


def _kernel_a_deep(lens_ref, x_ref, w_ref, sw_ref, b_ref, out_ref, stats_ref,
                   *, f: int, n: int, n_true: int, out_dtype, int8: bool):
    """Whole-layer conv3x3 + bias + GN stats for the deep U-Net stages: the
    full (n, Cin) activation fits VMEM, so there are no tiles and no halo
    blocks — edge frames see in-kernel zero padding, and the grid's second
    dim splits OUTPUT channels so the 9*C x C weight blocks stay under
    VMEM (mid-stage w2 is 19 MB at C=1024).

    n is the 8-ALIGNED padded row count and n_true = t*f the real one:
    Mosaic's lowering of whole-layer kernels with a misaligned sublane row
    count blows up combinatorially at some (Cin, Cout) combinations
    (measured 178 s -> 0.6 s to lower kernel A at (430 vs 432 rows, 512 ->
    1024); tools/bisect_deep_compile.py --probe). Rows >= n_true are zeroed
    before the write and the stats sums, so GN statistics pool over exactly
    the torch GroupNorm row set."""
    x = x_ref[0]  # (n, cin)
    valid = (
        jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0) < lens_ref[0, 0, 0]
    )
    xm = x * valid.astype(x.dtype)
    zf = jnp.zeros((f, x.shape[-1]), x.dtype)
    win = jnp.concatenate([zf, xm, zf], axis=0)  # (n + 2f, cin)
    if int8:
        acc = _conv3x3_taps_int8(win, w_ref, sw_ref, f, n)
    else:
        acc = _conv3x3_taps(win, w_ref, f, n)
    acc = acc + b_ref[:].astype(jnp.float32)
    if n != n_true:
        rv = (jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
              < n_true).astype(jnp.float32)
        acc = acc * rv
    out_ref[0] = acc.astype(out_dtype)
    stats_ref[0, 0, :] = jnp.sum(acc, axis=0)
    stats_ref[0, 1, :] = jnp.sum(acc * acc, axis=0)


def _kernel_b_deep(lens_ref, c1_ref, stats_ref, scale_ref, bias_ref,
                   film_ref, w_ref, sw_ref, b_ref, out_ref, stats2_ref, *,
                   f: int, n: int, n_true: int, groups: int, out_dtype,
                   int8: bool):
    """GN1-apply + mish + FiLM + mask + conv3x3 + bias + GN2 stats, whole
    layer at once. Reads the FULL-channel c1 (conv2 contracts over all of
    it); only the output channels are split across the grid. n vs n_true:
    see _kernel_a_deep."""
    c1 = c1_ref[0]  # (n, cout_full)
    mean, inv = _group_stats(
        stats_ref[0, 0, :], stats_ref[0, 1, :], n_true, groups
    )
    h = (c1.astype(jnp.float32) - mean) * inv
    h = h * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)
    h = _mish_f32(h)
    h = h + film_ref[0].astype(jnp.float32)
    valid = (
        jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0) < lens_ref[0, 0, 0]
    )
    h = (h * valid.astype(jnp.float32)).astype(c1.dtype)
    zf = jnp.zeros((f, h.shape[-1]), h.dtype)
    win = jnp.concatenate([zf, h, zf], axis=0)
    if int8:
        acc = _conv3x3_taps_int8(win, w_ref, sw_ref, f, n)
    else:
        acc = _conv3x3_taps(win, w_ref, f, n)
    acc = acc + b_ref[:].astype(jnp.float32)
    if n != n_true:
        rv = (jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
              < n_true).astype(jnp.float32)
        acc = acc * rv
    out_ref[0] = acc.astype(out_dtype)
    stats2_ref[0, 0, :] = jnp.sum(acc, axis=0)
    stats2_ref[0, 1, :] = jnp.sum(acc * acc, axis=0)


def _cout_split(cin_conv: int, cout: int, budget: int = 5 * 1024 * 1024,
                itemsize: int = 2) -> int:
    """Output-channel block so the (9*Cin, Cb) weight block fits the
    VMEM budget; multiples of 128 lanes, divisor of cout."""
    cb = cout
    while cb > 128 and 9 * cin_conv * cb * itemsize > budget:
        cb //= 2
    return cb


@partial(
    jax.jit,
    static_argnames=("f", "groups", "interpret", "out_dtype_name", "int8"),
)
def _fused_resnet_deep(
    x, lens_rows, t_bias, w1, b1, s1, be1, w2, b2, s2, be2, wres, bres,
    f: int, groups: int, interpret: bool, out_dtype_name: str,
    int8: bool = False,
):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    out_dtype = jnp.dtype(out_dtype_name)
    b, n_true, cin = x.shape
    cout = w1.shape[-1]
    # pad the whole-layer row dim to the 8-row sublane: Mosaic's lowering of
    # misaligned whole-layer kernels blows up at some (Cin, Cout) combos
    # (178 s -> 0.6 s measured; see _kernel_a_deep docstring). Pad rows are
    # zero on input and re-zeroed after each conv, so GN stats and outputs
    # match the unpadded math exactly. int8 operands tile natively as
    # (32, 128) on TPU, so the int8 path pads to the 32-row boundary.
    align = 32 if int8 else 8
    n = -(-n_true // align) * align
    if n != n_true:
        x = jnp.pad(x, ((0, 0), (0, n - n_true), (0, 0)))

    lens_spec2 = lambda: pl.BlockSpec((1, 1, 1), lambda bb, cb: (bb, 0, 0),
                                      memory_space=pltpu.SMEM)
    full_spec = lambda c: pl.BlockSpec((1, n, c), lambda bb, cb: (bb, 0, 0),
                                       memory_space=pltpu.VMEM)
    row_full = lambda c: pl.BlockSpec((1, c), lambda bb, cb: (0, 0),
                                      memory_space=pltpu.VMEM)
    stats_full = lambda c: pl.BlockSpec((1, 2, c), lambda bb, cb: (bb, 0, 0),
                                        memory_space=pltpu.VMEM)

    w1_in = w1.reshape(9 * cin, cout)
    w2_in = w2.reshape(9 * cout, cout)
    if int8:
        w1_in, sw1 = _quant_w(w1_in)
        w2_in, sw2 = _quant_w(w2_in)
    else:
        sw1 = sw2 = jnp.ones((1, cout), jnp.float32)
    wsize = 1 if int8 else 2

    if cin > cout:
        # HYBRID first conv: a whole-layer kernel at cin > cout (the
        # up-stage skip-concat projections, 2048->512 / 1024->256) crashes
        # the TPU compiler subprocess (tools/probe_deep_shapes.py —
        # suspected VMEM blow-up from the 3x window copies at large cin).
        # conv1 runs as the XLA im2col/taps matmul instead (already
        # measured at ~97% MXU for these shapes, ROADMAP), its GN stats
        # come from one cheap XLA reduction over (n, cout), and kernels
        # B + C still fuse everything downstream of c1.
        from unitspeech_tpu.ops.conv_matmul import (
            choose_conv_impl, conv3x3_im2col, conv3x3_taps,
        )

        rowmask_len = (
            jax.lax.broadcasted_iota(jnp.int32, (1, n, 1), 1) < lens_rows
        )
        xm1 = jnp.where(rowmask_len, x, 0).astype(x.dtype)
        impl = choose_conv_impl(cin, cout)
        fn = conv3x3_im2col if impl == "im2col" else conv3x3_taps
        acc1 = fn(xm1, w1.astype(x.dtype), f)  # (3,3,cin,cout) flax kernel
        # bias fills ALL real rows (incl. masked frames — torch GroupNorm
        # pools their bias, same as _kernel_a_deep); only the static
        # alignment-pad rows zero
        acc1 = acc1 + b1.reshape(1, 1, cout)
        if n != n_true:
            acc1 = acc1 * (
                jax.lax.broadcasted_iota(jnp.int32, (1, n, 1), 1) < n_true
            ).astype(jnp.float32)
        stats1 = jnp.stack(
            [jnp.sum(acc1, axis=1), jnp.sum(acc1 * acc1, axis=1)], axis=1
        )  # (B, 2, cout) f32
        c1 = acc1.astype(out_dtype)
    else:
        cb1 = _cout_split(cin, cout, itemsize=wsize)
        c1, stats1 = pl.pallas_call(
            partial(_kernel_a_deep, f=f, n=n, n_true=n_true,
                    out_dtype=out_dtype, int8=int8),
            grid=(b, cout // cb1),
            in_specs=[
                lens_spec2(),
                full_spec(cin),
                pl.BlockSpec((9 * cin, cb1), lambda bb, cb: (0, cb),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, cb1), lambda bb, cb: (0, cb),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, cb1), lambda bb, cb: (0, cb),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, n, cb1), lambda bb, cb: (bb, 0, cb),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2, cb1), lambda bb, cb: (bb, 0, cb),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((b, n, cout), out_dtype),
                jax.ShapeDtypeStruct((b, 2, cout), jnp.float32),
            ),
            interpret=interpret,
        )(lens_rows, x, w1_in, sw1, b1.reshape(1, cout))

    cb2 = _cout_split(cout, cout, itemsize=wsize)
    c2, stats2 = pl.pallas_call(
        partial(_kernel_b_deep, f=f, n=n, n_true=n_true, groups=groups,
                out_dtype=out_dtype, int8=int8),
        grid=(b, cout // cb2),
        in_specs=[
            lens_spec2(),
            full_spec(cout),
            stats_full(cout),
            row_full(cout),
            row_full(cout),
            pl.BlockSpec((1, 1, cout), lambda bb, cb: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * cout, cb2), lambda bb, cb: (0, cb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cb2), lambda bb, cb: (0, cb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cb2), lambda bb, cb: (0, cb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, n, cb2), lambda bb, cb: (bb, 0, cb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, cb2), lambda bb, cb: (bb, 0, cb),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, cout), out_dtype),
            jax.ShapeDtypeStruct((b, 2, cout), jnp.float32),
        ),
        interpret=interpret,
    )(lens_rows, c1, stats1, s1.reshape(1, cout), be1.reshape(1, cout),
      t_bias.reshape(b, 1, cout), w2_in, sw2, b2.reshape(1, cout))

    identity_res = wres is None
    # cin != cout: the 1x1-conv residual moves OUT of the kernel — Mosaic's
    # lowering of a misaligned-row (n % 8 != 0) whole-layer dot is the
    # measured 6-minute compile pathology (see _kernel_c docstring). The
    # kernel then emits the f32 GN2+mish+mask term and XLA adds the residual
    # (one extra whole-layer f32 round-trip, < 2 MB at the deep stages);
    # rounding to out_dtype still happens exactly once.
    res_mode = "identity" if identity_res else "none"
    wres_in = jnp.zeros((1, 1), x.dtype)
    bres_in = jnp.zeros((1, 1), jnp.float32)
    wres_spec = pl.BlockSpec((1, 1), lambda bb, j: (0, 0),
                             memory_space=pltpu.VMEM)
    bres_spec = pl.BlockSpec((1, 1), lambda bb, j: (0, 0),
                             memory_space=pltpu.VMEM)

    kern_dtype = out_dtype if identity_res else jnp.float32
    out = pl.pallas_call(
        partial(_kernel_c, tile=n, n_rows=n_true, groups=groups,
                res_mode=res_mode, out_dtype=kern_dtype),
        grid=(b, 1),
        in_specs=[
            pl.BlockSpec((1, 1, 1), lambda bb, j: (bb, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n, cout), lambda bb, j: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, cin), lambda bb, j: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, cout), lambda bb, j: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda bb, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda bb, j: (0, 0),
                         memory_space=pltpu.VMEM),
            wres_spec,
            bres_spec,
        ],
        out_specs=pl.BlockSpec((1, n, cout), lambda bb, j: (bb, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, cout), kern_dtype),
        interpret=interpret,
    )(lens_rows, c2, x, stats2, s2.reshape(1, cout), be2.reshape(1, cout),
      wres_in, bres_in)
    out = out[:, :n_true]
    if not identity_res:
        rowmask = (
            jax.lax.broadcasted_iota(jnp.int32, (1, n_true, 1), 1) < lens_rows
        )
        xm = jnp.where(rowmask, x[:, :n_true], 0)
        res = jnp.einsum(
            "bnc,cd->bnd", xm, wres.reshape(cin, cout).astype(x.dtype),
            preferred_element_type=jnp.float32,
        )
        res = jnp.where(rowmask, res + bres.reshape(1, 1, cout), 0.0)
        out = (out + res).astype(out_dtype)
    return out


def fused_resnet_block_deep(
    x, mask, t_bias,
    w1, b1, gn1_scale, gn1_bias,
    w2, b2, gn2_scale, gn2_bias,
    wres=None, bres=None,
    groups: int = 8,
    interpret: Optional[bool] = None,
    int8: bool = False,
):
    """One ResnetBlock at the deep U-Net stages (F = 20/10, C >= 512), fused
    as three whole-layer kernels (same numerics contract and parameter tree
    as fused_resnet_block; XLA twin models/unet.py:ResnetBlock). The deep
    activations are < 2 MB so each kernel holds the entire layer in VMEM —
    no tiles, no halos — and splits only the output channels when the
    (9C, C) weight block would not fit.

    Compile-time pathology SOLVED (round 3): Mosaic's lowering of
    whole-layer kernels with a row count not divisible by the 8-row sublane
    blew up combinatorially at some (Cin, Cout) combinations — 178 s to
    lower ONE conv kernel at (430 rows, 512 -> 1024), ~17 min for a full
    block, vs ~1 s with 432 rows (bisect: tools/bisect_deep_compile.py).
    Rows now pad to a multiple of 8 with exact GN-stats masking, and the
    cin != cout residual 1x1 conv runs as an XLA einsum outside the kernel
    (its misaligned-row in-kernel dot was a second independent trigger).
    Opt-in via ResnetBlock.use_pallas_deep.

    int8=True quantizes both convs in kernel (per-batch-element dynamic
    activation scale over the whole layer + per-output-channel weight
    scales, int8 x int8 -> int32 MXU dots — the same scheme as
    _conv3x3_taps_int8), making the serving default (use_int8) eligible for
    the whole-layer fusion: GN/mish/FiLM glue rides inside the kernels
    instead of XLA passes around conv3x3_int8."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bsz, t, f, cin = x.shape
    # f32 accumulation: a bf16 mask sum rounds odd lengths > 256 to even
    lens_frames = jnp.sum(
        mask.reshape(bsz, t).astype(jnp.float32), axis=1
    ).astype(jnp.int32)
    lens_rows = (lens_frames * f).reshape(bsz, 1, 1)
    out = _fused_resnet_deep(
        x.reshape(bsz, t * f, cin), lens_rows, t_bias.astype(x.dtype),
        w1.astype(x.dtype), b1, gn1_scale, gn1_bias,
        w2.astype(x.dtype), b2, gn2_scale, gn2_bias,
        None if wres is None else wres.astype(x.dtype), bres,
        f=f, groups=groups, interpret=bool(interpret),
        out_dtype_name=jnp.dtype(x.dtype).name, int8=int8,
    )
    return out.reshape(bsz, t, f, -1)


def _kernel_d(lens_ref, c1_ref, stats_ref, scale_ref, bias_ref, wo_ref,
              bo_ref, out_ref, *, tile: int, n_rows: int, groups: int):
    """GN-apply + mish + mask + 1x1 conv to a single channel (the estimator's
    final_block norm/activation fused with final_conv). Replaces an XLA
    region that relayouted the full-resolution tensor through f32 four times
    (profiled ~0.58 ms/step of the sampler; tools/profile_pipeline.py)."""
    import jax.experimental.pallas as pl

    j = pl.program_id(1)
    c1 = c1_ref[0]
    mean, inv = _group_stats(
        stats_ref[0, 0, :], stats_ref[0, 1, :], n_rows, groups
    )
    h = (c1.astype(jnp.float32) - mean) * inv
    h = h * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)
    h = _mish_f32(h)
    n_global = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0) + j * tile
    valid = (n_global < lens_ref[0, 0, 0]).astype(jnp.float32)
    h = h * valid
    y = jnp.dot(h.astype(c1.dtype), wo_ref[:],
                preferred_element_type=jnp.float32)
    out_ref[0] = (y + bo_ref[:].astype(jnp.float32)) * valid


@partial(
    jax.jit,
    static_argnames=("n_frames", "f", "groups", "interpret",
                     "frames_per_tile", "tap_mode"),
)
def _fused_final(
    x, lens_rows, w1, b1, s1, be1, wo, bo,
    n_frames: int, f: int, groups: int, interpret: bool,
    frames_per_tile: int = 0, tap_mode: str = "taps",
):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, cin = x.shape
    cout = w1.shape[-1]
    fpt = frames_per_tile or _pick_frames_per_tile(n_frames, f, max(cin, cout))
    tile = fpt * f
    n_tiles = n // tile
    grid = (b, n_tiles)

    lens_spec = pl.BlockSpec((1, 1, 1), lambda bb, j: (bb, 0, 0),
                             memory_space=pltpu.SMEM)
    row_spec = lambda c: pl.BlockSpec((1, c), lambda bb, j: (0, 0),
                                      memory_space=pltpu.VMEM)
    w_spec = lambda k, c: pl.BlockSpec((k, c), lambda bb, j: (0, 0),
                                       memory_space=pltpu.VMEM)
    tile_spec = lambda c: pl.BlockSpec((1, tile, c), lambda bb, j: (bb, j, 0),
                                       memory_space=pltpu.VMEM)
    stats_spec = pl.BlockSpec((1, 2, cout), lambda bb, j: (bb, 0, 0),
                              memory_space=pltpu.VMEM)

    top, cur, bot = _halo_specs(n_frames, f, cin, n_tiles, fpt)
    c1, stats1 = pl.pallas_call(
        partial(_kernel_a, f=f, tile=tile, n_tiles=n_tiles,
                out_dtype=x.dtype, tap_mode=tap_mode, int8=False),
        grid=grid,
        in_specs=[lens_spec, top, cur, bot, w_spec(9 * cin, cout),
                  row_spec(cout), row_spec(cout)],
        out_specs=(tile_spec(cout), stats_spec),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, cout), x.dtype),
            jax.ShapeDtypeStruct((b, 2, cout), jnp.float32),
        ),
        interpret=interpret,
    )(lens_rows, x, x, x, w1.reshape(9 * cin, cout),
      jnp.ones((1, cout), jnp.float32), b1.reshape(1, cout))

    out = pl.pallas_call(
        partial(_kernel_d, tile=tile, n_rows=n, groups=groups),
        grid=grid,
        in_specs=[lens_spec, tile_spec(cout), stats_spec, row_spec(cout),
                  row_spec(cout), w_spec(cout, 1), row_spec(1)],
        out_specs=tile_spec(1),
        out_shape=jax.ShapeDtypeStruct((b, n, 1), jnp.float32),
        interpret=interpret,
    )(lens_rows, c1, stats1, s1.reshape(1, cout), be1.reshape(1, cout),
      wo.reshape(cout, 1), bo.reshape(1, 1))
    return out


def fused_final_block(x, mask, w1, b1, gn_scale, gn_bias, w_out, b_out,
                      groups: int = 8, interpret: Optional[bool] = None,
                      frames_per_tile: int = 0, tap_mode: str = "taps"):
    """conv3x3+GN+mish+mask (models/unet.py Block 'final_block') fused with
    the 1-channel final_conv (reference unitspeech.py:198-201): x
    (B, T, F, C) -> (B, T, F) f32 score. Same numerics contract as
    fused_resnet_block (f32 conv accumulators rounded once, f32 GN stats
    over all rows)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bsz, t, f, cin = x.shape
    # f32 accumulation: a bf16 mask sum rounds odd lengths > 256 to even
    lens_frames = jnp.sum(
        mask.reshape(bsz, t).astype(jnp.float32), axis=1
    ).astype(jnp.int32)
    lens_rows = (lens_frames * f).reshape(bsz, 1, 1)
    out = _fused_final(
        x.reshape(bsz, t * f, cin), lens_rows,
        w1.astype(x.dtype), b1, gn_scale, gn_bias,
        w_out.astype(x.dtype), b_out,
        n_frames=t, f=f, groups=groups, interpret=bool(interpret),
        frames_per_tile=frames_per_tile, tap_mode=tap_mode,
    )
    return out.reshape(bsz, t, f)


def _halo_specs(n_frames: int, f: int, c: int, n_tiles: int, fpt: int):
    """(top, cur, bot) BlockSpecs over a (B, N, C) array: an fpt-frame center
    block plus one-frame halo blocks clamped at the edges (clamped blocks are
    zeroed inside the kernel)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    top = pl.BlockSpec(
        (1, f, c),
        lambda b, j: (b, jnp.maximum(j * fpt - 1, 0), 0),
        memory_space=pltpu.VMEM,
    )
    cur = pl.BlockSpec(
        (1, fpt * f, c), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM
    )
    bot = pl.BlockSpec(
        (1, f, c),
        lambda b, j: (b, jnp.minimum(j * fpt + fpt, n_frames - 1), 0),
        memory_space=pltpu.VMEM,
    )
    return top, cur, bot


def _quant_w(w2d):
    """Per-output-channel symmetric int8 weight quantization: returns
    (int8 weights, f32 reciprocal scales (1, Cout))."""
    sw = 127.0 / jnp.maximum(jnp.max(jnp.abs(w2d), axis=0), 1e-8)
    w8 = jnp.clip(jnp.round(w2d.astype(jnp.float32) * sw), -127, 127)
    return w8.astype(jnp.int8), (1.0 / sw).reshape(1, -1).astype(jnp.float32)


# ---------------------------------------------------------------------------
# int8 deep path with PRE-quantized activations ("i8pre")
#
# The r3 in-kernel int8 deep kernels crashed the remote TPU compiler even at
# identity shapes — the bf16 windows PLUS their quantized copies blew VMEM.
# This variant quantizes activations OUTSIDE the conv kernels (one cheap XLA
# pass per conv, scales from the one-pass ops/pallas_stats.row_absmax), so
# the conv kernels assemble int8 windows directly: HALF the bf16 VMEM, int8 x
# int8 -> int32 MXU dots (2x v5e throughput), and no materialized (r, 9C)
# im2col column — the flat path's dominant deep-stage traffic (~24 MB/conv
# round trip at stage3; r4 roofline conv_cost).
# ---------------------------------------------------------------------------


def _conv3x3_taps_i8pre(win8, w8_ref, swe_ref, f: int, tile: int):
    """9-tap conv3x3 on a PRE-quantized int8 window. win8: (tile+2F, Cin)
    int8; w8_ref rows: [(dt+1)*3+(df+1)]*Cin -> (Cin, Cb) int8; swe_ref:
    (1, Cb) f32 EFFECTIVE dequant scale — (1/sx)*(1/sw) with the per-batch
    activation scale folded in by the caller."""
    cin = win8.shape[-1]
    wrow = jax.lax.broadcasted_iota(jnp.int32, (tile + 2 * f, 1), 0) % f
    zero_row = jnp.zeros((1, cin), jnp.int8)
    win_m = jnp.where(wrow != 0,
                      jnp.concatenate([zero_row, win8[:-1]], 0), 0)
    win_p = jnp.where(wrow != f - 1,
                      jnp.concatenate([win8[1:], zero_row], 0), 0)
    srcs = {-1: win_m, 0: win8, 1: win_p}
    acc = None
    for dt in (-1, 0, 1):
        base = f + dt * f
        for df in (-1, 0, 1):
            tap = srcs[df][base : base + tile, :]
            k = ((dt + 1) * 3 + (df + 1)) * cin
            part = jnp.dot(tap, w8_ref[k : k + cin, :],
                           preferred_element_type=jnp.int32)
            acc = part if acc is None else acc + part
    return acc.astype(jnp.float32) * swe_ref[0]  # (1, Cb) from (1, 1, Cb)


def _kernel_a_deep_i8(lens_ref, x8_ref, w8_ref, swe_ref, b_ref, out_ref,
                      stats_ref, *, f: int, n: int, n_true: int, out_dtype):
    """Whole-layer int8 conv3x3 + bias + GN stats (i8pre variant of
    _kernel_a_deep; row-count/masking contract identical)."""
    x8 = x8_ref[0]  # (n, cin) int8
    valid = (
        jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0) < lens_ref[0, 0, 0]
    )
    xm = jnp.where(valid, x8, 0)
    zf = jnp.zeros((f, x8.shape[-1]), jnp.int8)
    win = jnp.concatenate([zf, xm, zf], axis=0)  # (n + 2f, cin)
    acc = _conv3x3_taps_i8pre(win, w8_ref, swe_ref, f, n)
    acc = acc + b_ref[:].astype(jnp.float32)
    if n != n_true:
        rv = (jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
              < n_true).astype(jnp.float32)
        acc = acc * rv
    out_ref[0] = acc.astype(out_dtype)
    stats_ref[0, 0, :] = jnp.sum(acc, axis=0)
    stats_ref[0, 1, :] = jnp.sum(acc * acc, axis=0)


def _kernel_glue_q_deep(lens_ref, c1_ref, stats_ref, scale_ref, bias_ref,
                        film_ref, h8_ref, amax_ref, *, n: int, n_true: int,
                        groups: int):
    """GN1-apply + mish + FiLM + mask + int8 QUANTIZE, whole layer for one
    batch element. Emits the quantized conv2 input h8 plus the per-channel
    abs-max the caller folds into conv2's effective dequant scale. The
    in-kernel global scale 127/max|h| equals the XLA-side
    127/max(amax_channels) exactly (max is order-independent), so the
    quantization and its dequant agree bit-for-bit. No windows, no dots —
    VMEM stays ~3 f32 copies of one deep layer, far under the r3 crash
    regime."""
    c1 = c1_ref[0]  # (n, cout)
    mean, inv = _group_stats(
        stats_ref[0, 0, :], stats_ref[0, 1, :], n_true, groups
    )
    h = (c1.astype(jnp.float32) - mean) * inv
    h = h * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)
    h = _mish_f32(h)
    h = h + film_ref[0].astype(jnp.float32)
    valid = (
        jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0) < lens_ref[0, 0, 0]
    )
    h = h * valid.astype(jnp.float32)
    amax_c = jnp.max(jnp.abs(h), axis=0, keepdims=True)  # (1, cout)
    s = 127.0 / jnp.maximum(jnp.max(amax_c), 1e-8)
    h8_ref[0] = jnp.clip(jnp.round(h * s), -127, 127).astype(jnp.int8)
    amax_ref[0] = amax_c


@partial(
    jax.jit,
    static_argnames=("f", "groups", "interpret", "out_dtype_name"),
)
def _fused_resnet_deep_i8pre(
    x, lens_rows, t_bias, w1, b1, s1, be1, w2, b2, s2, be2, wres, bres,
    f: int, groups: int, interpret: bool, out_dtype_name: str,
):
    """Whole-layer deep ResnetBlock with int8 MXU convs on pre-quantized
    activations. Chain: XLA quantize(x) -> kernel A (int8 conv1 + stats) ->
    kernel GLUE (GN1+mish+FiLM+mask+quantize) -> kernel A (int8 conv2 +
    stats) -> kernel C (GN2+mish+mask+residual). cin > cout falls back to
    the XLA conv1 hybrid exactly like _fused_resnet_deep."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    out_dtype = jnp.dtype(out_dtype_name)
    b, n_true, cin = x.shape
    cout = w1.shape[-1]
    align = 32  # int8 operands tile natively as (32, 128)
    n = -(-n_true // align) * align
    if n != n_true:
        x = jnp.pad(x, ((0, 0), (0, n - n_true), (0, 0)))

    lens_spec2 = lambda: pl.BlockSpec((1, 1, 1), lambda bb, cb: (bb, 0, 0),
                                      memory_space=pltpu.SMEM)
    full_spec_i8 = lambda c: pl.BlockSpec(
        (1, n, c), lambda bb, cb: (bb, 0, 0), memory_space=pltpu.VMEM)
    row_full = lambda c: pl.BlockSpec((1, c), lambda bb, cb: (0, 0),
                                      memory_space=pltpu.VMEM)
    stats_full = lambda c: pl.BlockSpec((1, 2, c), lambda bb, cb: (bb, 0, 0),
                                        memory_space=pltpu.VMEM)

    w1_8, sw1 = _quant_w(w1.reshape(9 * cin, cout))
    w2_8, sw2 = _quant_w(w2.reshape(9 * cout, cout))

    rowmask = (
        jax.lax.broadcasted_iota(jnp.int32, (1, n, 1), 1) < lens_rows
    )

    def a_call(x8, swe, w8, bias, cin_conv):
        cb = _cout_split(cin_conv, cout, itemsize=1)
        return pl.pallas_call(
            partial(_kernel_a_deep_i8, f=f, n=n, n_true=n_true,
                    out_dtype=out_dtype),
            grid=(b, cout // cb),
            in_specs=[
                lens_spec2(),
                full_spec_i8(cin_conv),
                pl.BlockSpec((9 * cin_conv, cb), lambda bb, cbi: (0, cbi),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, cb), lambda bb, cbi: (bb, 0, cbi),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, cb), lambda bb, cbi: (0, cbi),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, n, cb), lambda bb, cbi: (bb, 0, cbi),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2, cb), lambda bb, cbi: (bb, 0, cbi),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((b, n, cout), out_dtype),
                jax.ShapeDtypeStruct((b, 2, cout), jnp.float32),
            ),
            interpret=interpret,
        )(lens_rows, x8, w8, swe, bias.reshape(1, cout))

    if cin > cout:
        # XLA conv1 hybrid (whole-layer kernels at cin > cout crash the
        # TPU compiler; see _fused_resnet_deep)
        from unitspeech_tpu.ops.conv_matmul import (
            choose_conv_impl, conv3x3_im2col, conv3x3_taps,
        )

        xm1 = jnp.where(rowmask, x, 0).astype(x.dtype)
        impl = choose_conv_impl(cin, cout)
        fn = conv3x3_im2col if impl == "im2col" else conv3x3_taps
        acc1 = fn(xm1, w1.astype(x.dtype), f) + b1.reshape(1, 1, cout)
        if n != n_true:
            acc1 = acc1 * (
                jax.lax.broadcasted_iota(jnp.int32, (1, n, 1), 1) < n_true
            ).astype(jnp.float32)
        stats1 = jnp.stack(
            [jnp.sum(acc1, axis=1), jnp.sum(acc1 * acc1, axis=1)], axis=1
        )
        c1 = acc1.astype(out_dtype)
    else:
        # per-batch activation scale from the masked input (one bytes-bound
        # pass; garbage in unmasked rows must not inflate the scale)
        xm = jnp.where(rowmask, x.astype(jnp.float32), 0.0)
        amax_x = jnp.max(jnp.abs(xm), axis=(1, 2))  # (B,)
        sx1 = 127.0 / jnp.maximum(amax_x, 1e-8)
        x8 = jnp.clip(
            jnp.round(xm * sx1[:, None, None]), -127, 127
        ).astype(jnp.int8)
        swe1 = (1.0 / sx1)[:, None, None] * sw1[None, :, :]  # (B, 1, cout)
        c1, stats1 = a_call(x8, swe1, w1_8, b1, cin)

    # glue + quantize for conv2
    h8, amax_h = pl.pallas_call(
        partial(_kernel_glue_q_deep, n=n, n_true=n_true, groups=groups),
        grid=(b, 1),
        in_specs=[
            pl.BlockSpec((1, 1, 1), lambda bb, j: (bb, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n, cout), lambda bb, j: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, cout), lambda bb, j: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            row_full(cout),
            row_full(cout),
            pl.BlockSpec((1, 1, cout), lambda bb, j: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, n, cout), lambda bb, j: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cout), lambda bb, j: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, cout), jnp.int8),
            jax.ShapeDtypeStruct((b, 1, cout), jnp.float32),
        ),
        interpret=interpret,
    )(lens_rows, c1, stats1, s1.reshape(1, cout), be1.reshape(1, cout),
      t_bias.reshape(b, 1, cout))

    sx2 = 127.0 / jnp.maximum(jnp.max(amax_h[:, 0, :], axis=-1), 1e-8)  # (B,)
    swe2 = (1.0 / sx2)[:, None, None] * sw2[None, :, :]
    c2, stats2 = a_call(h8, swe2, w2_8, b2, cout)

    # kernel C (GN2 + mish + mask + residual) — identical to the bf16 path
    identity_res = wres is None
    res_mode = "identity" if identity_res else "none"
    wres_in = jnp.zeros((1, 1), x.dtype)
    bres_in = jnp.zeros((1, 1), jnp.float32)
    kern_dtype = out_dtype if identity_res else jnp.float32
    out = pl.pallas_call(
        partial(_kernel_c, tile=n, n_rows=n_true, groups=groups,
                res_mode=res_mode, out_dtype=kern_dtype),
        grid=(b, 1),
        in_specs=[
            pl.BlockSpec((1, 1, 1), lambda bb, j: (bb, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n, cout), lambda bb, j: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, cin), lambda bb, j: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, cout), lambda bb, j: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda bb, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda bb, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda bb, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda bb, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, cout), lambda bb, j: (bb, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, cout), kern_dtype),
        interpret=interpret,
    )(lens_rows, c2, x, stats2, s2.reshape(1, cout), be2.reshape(1, cout),
      wres_in, bres_in)
    out = out[:, :n_true]
    if not identity_res:
        rm = rowmask[:, :n_true]
        xm = jnp.where(rm, x[:, :n_true], 0)
        res = jnp.einsum(
            "bnc,cd->bnd", xm, wres.reshape(cin, cout).astype(x.dtype),
            preferred_element_type=jnp.float32,
        )
        res = jnp.where(rm, res + bres.reshape(1, 1, cout), 0.0)
        out = (out + res).astype(out_dtype)
    return out


def fused_resnet_block_deep_i8(
    x, mask, t_bias,
    w1, b1, gn1_scale, gn1_bias,
    w2, b2, gn2_scale, gn2_bias,
    wres=None, bres=None,
    groups: int = 8,
    interpret: Optional[bool] = None,
):
    """Deep ResnetBlock with int8 MXU convs on PRE-quantized activations
    (same numerics contract and parameter tree as fused_resnet_block_deep;
    quantization error ~1% per conv like ops/conv_matmul.conv3x3_int8 —
    excluded from parity claims, eligible for the int8 serving default
    behind its gate)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bsz, t, f, cin = x.shape
    lens_frames = jnp.sum(
        mask.reshape(bsz, t).astype(jnp.float32), axis=1
    ).astype(jnp.int32)
    lens_rows = (lens_frames * f).reshape(bsz, 1, 1)
    out = _fused_resnet_deep_i8pre(
        x.reshape(bsz, t * f, cin), lens_rows, t_bias.astype(x.dtype),
        w1, b1, gn1_scale, gn1_bias,
        w2, b2, gn2_scale, gn2_bias,
        None if wres is None else wres, bres,
        f=f, groups=groups, interpret=bool(interpret),
        out_dtype_name=jnp.dtype(x.dtype).name,
    )
    return out.reshape(bsz, t, f, -1)


@partial(
    jax.jit,
    static_argnames=("n_frames", "f", "groups", "interpret", "out_dtype_name",
                     "frames_per_tile", "tap_mode", "int8"),
)
def _fused_resnet(
    x, lens_rows, t_bias, w1, b1, s1, be1, w2, b2, s2, be2, wres, bres,
    n_frames: int, f: int, groups: int, interpret: bool, out_dtype_name: str,
    frames_per_tile: int = 0, tap_mode: str = "taps", int8: bool = False,
):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    out_dtype = jnp.dtype(out_dtype_name)
    b, n, cin = x.shape
    cout = w1.shape[-1]
    fpt = frames_per_tile or _pick_frames_per_tile(n_frames, f, max(cin, cout))
    tile = fpt * f
    n_tiles = n // tile
    grid = (b, n_tiles)

    # batched per-row operands carry a singleton middle axis so the BLOCK's
    # last two dims equal the ARRAY's last two dims — Mosaic requires block
    # dims be (8,128)-divisible or exactly match the array (a (1,1) block
    # over (B,1) fails for B>1; verified on-chip)
    lens_spec = pl.BlockSpec((1, 1, 1), lambda bb, j: (bb, 0, 0),
                             memory_space=pltpu.SMEM)
    row_spec = lambda c: pl.BlockSpec((1, c), lambda bb, j: (0, 0),
                                      memory_space=pltpu.VMEM)
    brow_spec = lambda c: pl.BlockSpec((1, 1, c), lambda bb, j: (bb, 0, 0),
                                       memory_space=pltpu.VMEM)
    w_spec = lambda k, c: pl.BlockSpec((k, c), lambda bb, j: (0, 0),
                                       memory_space=pltpu.VMEM)
    tile_spec = lambda c: pl.BlockSpec((1, tile, c), lambda bb, j: (bb, j, 0),
                                       memory_space=pltpu.VMEM)
    stats_spec = pl.BlockSpec((1, 2, cout), lambda bb, j: (bb, 0, 0),
                              memory_space=pltpu.VMEM)

    w1_in = w1.reshape(9 * cin, cout)
    w2_in = w2.reshape(9 * cout, cout)
    if int8:
        w1_in, sw1 = _quant_w(w1_in)
        w2_in, sw2 = _quant_w(w2_in)
    else:
        sw1 = sw2 = jnp.ones((1, cout), jnp.float32)

    top, cur, bot = _halo_specs(n_frames, f, cin, n_tiles, fpt)
    c1, stats1 = pl.pallas_call(
        partial(_kernel_a, f=f, tile=tile, n_tiles=n_tiles,
                out_dtype=out_dtype, tap_mode=tap_mode, int8=int8),
        grid=grid,
        in_specs=[lens_spec, top, cur, bot, w_spec(9 * cin, cout),
                  row_spec(cout), row_spec(cout)],
        out_specs=(tile_spec(cout), stats_spec),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, cout), out_dtype),
            jax.ShapeDtypeStruct((b, 2, cout), jnp.float32),
        ),
        interpret=interpret,
    )(lens_rows, x, x, x, w1_in, sw1, b1.reshape(1, cout))

    topc, curc, botc = _halo_specs(n_frames, f, cout, n_tiles, fpt)
    c2, stats2 = pl.pallas_call(
        partial(_kernel_b, f=f, tile=tile, n_tiles=n_tiles, n_rows=n,
                groups=groups, out_dtype=out_dtype, tap_mode=tap_mode,
                int8=int8),
        grid=grid,
        in_specs=[lens_spec, topc, curc, botc, stats_spec, row_spec(cout),
                  row_spec(cout), brow_spec(cout), w_spec(9 * cout, cout),
                  row_spec(cout), row_spec(cout)],
        out_specs=(tile_spec(cout), stats_spec),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, cout), out_dtype),
            jax.ShapeDtypeStruct((b, 2, cout), jnp.float32),
        ),
        interpret=interpret,
    )(lens_rows, c1, c1, c1, stats1, s1.reshape(1, cout), be1.reshape(1, cout),
      t_bias.reshape(b, 1, cout), w2_in, sw2, b2.reshape(1, cout))

    identity_res = wres is None
    if identity_res:
        wres_in = jnp.zeros((1, 1), x.dtype)
        bres_in = jnp.zeros((1, 1), jnp.float32)
        wres_spec = w_spec(1, 1)
        bres_spec = row_spec(1)
    else:
        wres_in = wres.reshape(cin, cout)
        bres_in = bres.reshape(1, cout)
        wres_spec = w_spec(cin, cout)
        bres_spec = row_spec(cout)

    out = pl.pallas_call(
        partial(_kernel_c, tile=tile, n_rows=n, groups=groups,
                res_mode="identity" if identity_res else "matmul",
                out_dtype=out_dtype),
        grid=grid,
        in_specs=[lens_spec, tile_spec(cout), tile_spec(cin), stats_spec,
                  row_spec(cout), row_spec(cout), wres_spec, bres_spec],
        out_specs=tile_spec(cout),
        out_shape=jax.ShapeDtypeStruct((b, n, cout), out_dtype),
        interpret=interpret,
    )(lens_rows, c2, x, stats2, s2.reshape(1, cout), be2.reshape(1, cout),
      wres_in, bres_in)
    return out


def fused_resnet_block(
    x, mask, t_bias,
    w1, b1, gn1_scale, gn1_bias,
    w2, b2, gn2_scale, gn2_bias,
    wres=None, bres=None,
    groups: int = 8,
    interpret: Optional[bool] = None,
    frames_per_tile: int = 0,
    im2col: bool = False,
    int8: bool = False,
    tap_mode: Optional[str] = None,
):
    """One ResnetBlock, fused (XLA twin: models/unet.py:ResnetBlock).

    x: (B, T, F, Cin); mask: (B, T, 1, 1) prefix mask; t_bias: (B, Cout)
    pre-computed FiLM bias (= Dense(mish(t_emb)), done outside — it is tiny);
    w1/w2: (3, 3, Cin|Cout, Cout) flax conv kernels (spatial (t, f));
    wres/bres: optional 1x1 residual projection. Returns (B, T, F, Cout).

    tap_mode overrides the conv structure ("taps"/"taps3"/"im2col", see
    _conv3x3_taps); the legacy im2col flag maps to "im2col" when tap_mode is
    None. Requires T % 8 == 0 (fix_len_compatibility guarantees it) and F*C
    tile-friendly shapes; call sites fall back to the XLA path otherwise.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if tap_mode is None:
        tap_mode = "im2col" if im2col else "taps"
    bsz, t, f, cin = x.shape
    # f32 accumulation: a bf16 mask sum rounds odd lengths > 256 to even
    lens_frames = jnp.sum(
        mask.reshape(bsz, t).astype(jnp.float32), axis=1
    ).astype(jnp.int32)
    lens_rows = (lens_frames * f).reshape(bsz, 1, 1)
    xf = x.reshape(bsz, t * f, cin)
    out = _fused_resnet(
        xf, lens_rows, t_bias.astype(x.dtype),
        w1.astype(x.dtype), b1, gn1_scale, gn1_bias,
        w2.astype(x.dtype), b2, gn2_scale, gn2_bias,
        None if wres is None else wres.astype(x.dtype), bres,
        n_frames=t, f=f, groups=groups, interpret=bool(interpret),
        out_dtype_name=jnp.dtype(x.dtype).name,
        frames_per_tile=frames_per_tile, tap_mode=tap_mode, int8=int8,
    )
    return out.reshape(bsz, t, f, -1)
