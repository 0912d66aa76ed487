"""Pallas TPU kernels for the hot fused ops.

fused_aa_snake: the BigVGAN anti-aliased activation
(2x kaiser-sinc upsample -> snake/snakebeta -> 2x kaiser-sinc downsample,
reference alias_free_torch/act.py:8-27) as ONE kernel. The XLA path
materializes the 2x-rate intermediate in HBM ~4 times (conv_transpose out,
snake in/out, downsample in); the fused kernel reads the input once, keeps
the 2x intermediate in VMEM, and writes the output once — the vocoder is
memory-bound, so this ~3x traffic cut is the win.

Implementation: polyphase. The 12-tap upsample splits into two 6-tap phase
filters; the 12-tap downsample consumes the interleaved phases directly. Tap
values and offsets are derived numerically by probing the reference ops with
an impulse (ops are LTI away from edges), so the kernel is exact in the
interior by construction. Edge samples (~8 per utterance end) use
extended-LTI padding instead of the reference's replicate-pad of the
intermediate signal; parity there is approximate (inaudible; tested).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

HALO = 16  # input-sample halo per side, covers both filters' reach
# rows per kernel tile: t512 measured 66.6 ms vs t256 75.4 / t1024 71.8 for
# a full 344-frame BigVGAN forward on v5e (tools/bench_vocoder.py r4 sweep —
# halo recompute amortizes until the window overflows VMEM-friendly sizes)
T_TILE_DEFAULT = 512
# snake sin implementation inside the Pallas kernels:
#   "poly"        range-reduced degree-7 minimax sin (default; ~9 VPU ops).
#                 Mosaic's jnp.sin legalization measured ~40 vector ops —
#                 14.2 of the 58.3 ms standalone BigVGAN forward on v5e
#                 (tools/bench_vocoder.py --snake-mode probe_nosin, r4).
#                 Max |poly - sin| < 1e-6 for |x| <= 256 (test_pallas_voc),
#                 ~100x below the bf16 output resolution, so the kernel's
#                 bf16 result is bit-equal to the jnp path for ~all inputs.
#   "jnp"         Mosaic's builtin sin (escape hatch / parity oracle)
#   "probe_nosin" WRONG numerics, timing diagnostic only
SNAKE_MODE = "poly"
# AA filter implementation inside the Pallas kernels:
#   "full"           the exact 6+6-tap polyphase up / 12-tap down filters
#   "probe_nofilter" WRONG numerics, timing diagnostic only: one tap per
#                    phase and one down tap — bounds the up/down filters'
#                    share of the kernel time (the snake itself is ~free
#                    with the poly sin, so filters are the VPU suspect)
AA_MODE = "full"


from unitspeech_tpu.ops.fastmath import fast_sin as _fast_sin  # noqa: E402


@lru_cache(maxsize=4)
def _phase_filters(ratio: int = 2, kernel_size: int = 12):
    """Probe the reference up/down ops with impulses to extract exact
    interior tap values/offsets. Returns (f0, f1, g, up_off0, up_off1,
    down_off) as numpy arrays / ints."""
    from unitspeech_tpu.models.vocoder import downsample1d, upsample1d

    n = 64
    mid = n // 2
    x = np.zeros((1, n, 1), np.float32)
    x[0, mid, 0] = 1.0
    # compile-time eval: this probe may run inside a jit trace (e.g.
    # jit(vocoder.init) with the pallas path), where bare jnp ops would
    # produce tracers that np.asarray cannot concretize
    with jax.ensure_compile_time_eval():
        y = np.asarray(upsample1d(jnp.asarray(x), ratio, kernel_size))[0, :, 0]
    # y[t] = f[t - 2*mid + C] for the impulse; collect nonzero taps
    nz = np.nonzero(np.abs(y) > 1e-8)[0]
    # phase p taps: positions t = 2u + p; up: y2[2u+p] = sum_k fp[k] x[u + op + k]
    taps = {0: [], 1: []}
    for t in nz:
        p = int(t % 2)
        taps[p].append((int(t // 2) - mid, float(y[t])))
    f0_pairs = sorted(taps[0])
    f1_pairs = sorted(taps[1])
    # y2[2u+p] = sum_j f[t-2j+..] x[j]; from impulse at j=mid: y2[t] = coeff
    # where u_rel = t//2 - mid = u - j  =>  x index j = u - u_rel
    up_off0 = -f0_pairs[-1][0]
    up_off1 = -f1_pairs[-1][0]
    f0 = np.array([c for _, c in f0_pairs[::-1]], np.float32)
    f1 = np.array([c for _, c in f1_pairs[::-1]], np.float32)

    # down: out[u] = sum_k g[k] y2[2u + down_off + k]. An impulse at y2
    # index m reveals taps k = m - 2u - down_off — only one parity per
    # probe (stride 2), so probe an even and an odd position.
    taps_d = {}
    for m in (n, n + 1):
        y2 = np.zeros((1, 2 * n, 1), np.float32)
        y2[0, m, 0] = 1.0
        with jax.ensure_compile_time_eval():
            z = np.asarray(
                downsample1d(jnp.asarray(y2), ratio, kernel_size)
            )[0, :, 0]
        for u in np.nonzero(np.abs(z) > 1e-8)[0]:
            taps_d[m - 2 * int(u)] = float(z[u])
    down_off = min(taps_d)
    g = np.array(
        [taps_d.get(down_off + k, 0.0) for k in range(max(taps_d) - down_off + 1)],
        np.float32,
    )
    return f0, f1, g, int(up_off0), int(up_off1), int(down_off)


def _aa_core(x, alpha_ref, beta_ref, t_out: int, *, f0, f1, g,
             up_off0, up_off1, down_off, logscale: bool):
    """upsample2x -> snake -> downsample2x over `t_out` output rows, reading
    from window `x` whose row (HALO + u) is output row u's center. Called
    with t_out = t_tile for the plain activation, or an extended range when
    a fused conv consumes samples past the tile edges."""
    dt = x.dtype
    alpha = alpha_ref[:]  # (1, C) float32 params
    beta = beta_ref[:]
    if logscale:
        alpha = jnp.exp(alpha)
        beta = jnp.exp(beta)
    alpha = alpha.astype(dt)
    inv_beta = (1.0 / (beta + 1e-9)).astype(dt)
    f0 = tuple(jnp.asarray(v, dt) for v in f0)
    f1 = tuple(jnp.asarray(v, dt) for v in f1)
    g = tuple(jnp.asarray(v, dt) for v in g)

    # y2 indices needed: [down_off, 2*(t_out-1) + down_off + len(g) - 1];
    # compute whole output pairs covering that range
    pair_lo = down_off // 2
    pair_hi = (2 * (t_out - 1) + down_off + len(g) - 1) // 2
    up_len = pair_hi - pair_lo + 1

    def phase(f, off):
        taps = range(len(f))
        if AA_MODE == "probe_nofilter":  # diagnostic: single center tap
            taps = [len(f) // 2]
        acc = None
        for k in taps:
            # y2[2(u+pair_lo)+p] needs x[(u+pair_lo) + off + k]; x window is
            # shifted by +HALO relative to output row 0
            start = HALO + pair_lo + off + k
            sl = x[start : start + up_len, :] * f[k]
            acc = sl if acc is None else acc + sl
        return acc

    y0 = phase(f0, up_off0)  # (up_len, C): y2[2(j_rel+pair_lo)]
    y1 = phase(f1, up_off1)  # y2[2(j_rel+pair_lo)+1]

    def snake(y):
        # sin runs on f32 (Mosaic legalizes sin only on f32 vectors; the
        # poly path also wants f32 range reduction); the cast stays in
        # registers/VMEM (no HBM traffic). The result is cast to the
        # compute dtype BEFORE squaring so the "poly" default stays
        # bit-compatible with the "jnp" oracle at bf16.
        x32 = (y * alpha).astype(jnp.float32)
        if SNAKE_MODE == "probe_nosin":
            # DIAGNOSTIC ONLY (wrong numerics): replace the transcendental
            # with a multiply to measure sin's share of the kernel time
            s = x32.astype(dt)
        elif SNAKE_MODE == "jnp":
            s = jnp.sin(x32).astype(dt)
        else:
            s = _fast_sin(x32).astype(dt)
        return y + inv_beta * s * s

    y0 = snake(y0)
    y1 = snake(y1)

    # out[u] = sum_k g[k] * y2[2u + down_off + k]; pick the phase array by
    # the parity of (down_off + k) — contiguous slices only (Mosaic cannot
    # lower strided gathers)
    down_taps = range(len(g))
    if AA_MODE == "probe_nofilter":  # diagnostic: single even-parity tap
        down_taps = [k for k in range(len(g)) if (down_off + k) % 2 == 0][:1]
    acc = None
    for k in down_taps:
        s = down_off + k
        if s % 2 == 0:
            src, idx0 = y0, s // 2 - pair_lo
        else:
            src, idx0 = y1, (s - 1) // 2 - pair_lo
        sl = src[idx0 : idx0 + t_out, :] * g[k]
        acc = sl if acc is None else acc + sl
    return acc


def _aa_snake_kernel(x_ref, alpha_ref, beta_ref, out_ref, *, t_tile: int,
                     f0, f1, g, up_off0, up_off1, down_off, logscale: bool):
    x = x_ref[0, 0]  # (t_tile + 2*HALO, C)
    out_ref[0, 0] = _aa_core(
        x, alpha_ref, beta_ref, t_tile, f0=f0, f1=f1, g=g,
        up_off0=up_off0, up_off1=up_off1, down_off=down_off,
        logscale=logscale,
    )


def _conv_ext(ksize: int, dilation: int) -> int:
    """Output-row extension covering the fused conv's reach, 8-aligned."""
    reach = (ksize - 1) // 2 * dilation
    return -(-reach // 8) * 8


def _aa_snake_conv_kernel(x_ref, alpha_ref, beta_ref, w_ref, b_ref, res_ref,
                          out_ref, *, t_tile: int, ksize: int, dilation: int,
                          conv_ext: int, has_residual: bool, f0, f1, g,
                          up_off0, up_off1, down_off, logscale: bool):
    """AA-snake followed by a fused odd-k dilated conv1d (+ bias, + optional
    residual add). The window carries HALO + conv_ext input halo per side;
    the AA output is computed over t_tile + 2*conv_ext rows so the conv's
    taps stay in VMEM. w_ref is the (k*CP, CP) block-diagonal per-tap
    channel-mixing weight (CP = pack * C; the host pre-builds the block
    diagonal so packed lane groups stay independent)."""
    x = x_ref[0, 0]  # (t_tile + 2*(HALO + conv_ext), C)
    ext = t_tile + 2 * conv_ext
    y = _aa_core(
        x, alpha_ref, beta_ref, ext, f0=f0, f1=f1, g=g,
        up_off0=up_off0, up_off1=up_off1, down_off=down_off,
        logscale=logscale,
    )  # rows: output positions [-conv_ext, t_tile + conv_ext)
    cp = y.shape[-1]
    half = (ksize - 1) // 2
    acc = None
    for k in range(ksize):
        base = conv_ext + (k - half) * dilation
        tap = y[base : base + t_tile, :]
        part = jnp.dot(tap, w_ref[k * cp : (k + 1) * cp, :],
                       preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    acc = acc + b_ref[:].astype(jnp.float32)
    if has_residual:
        acc = acc + res_ref[0, 0].astype(jnp.float32)
    out_ref[0, 0] = acc.astype(x.dtype)


def _aa_snake_conv_kernel_nores(x_ref, alpha_ref, beta_ref, w_ref, b_ref,
                                out_ref, **kw):
    _aa_snake_conv_kernel(x_ref, alpha_ref, beta_ref, w_ref, b_ref, None,
                          out_ref, **kw)


def _pack_windows(x, t_tile: int, halo: int, pack: int):
    """(B, T, C) -> packed overlapping windows (B, G, win, pack*C) plus the
    non-overlapping center packing of the same grid (for residual inputs).

    Built from ALIGNED reshapes + a slice + one concat — not an advanced
    gather: XLA's gather lowering measured ~0.09 ms per call on v5e (5.7 ms
    per vocoder forward, tools/roofline.py r4), ~30x its HBM-traffic bound;
    the aligned construction is plain full-bandwidth copies. Requires
    2*halo <= t_tile (checked)."""
    b, t, c = x.shape
    t_pad = -(-t // (t_tile * pack)) * (t_tile * pack)
    n_tiles = t_pad // t_tile
    if 2 * halo > t_tile:
        raise ValueError(f"halo {halo} too large for t_tile {t_tile}")
    xp = jnp.pad(x, ((0, 0), (halo, halo + (t_pad - t)), (0, 0)), mode="edge")
    win = t_tile + 2 * halo
    # window i = xp[i*t_tile : i*t_tile + win]: t_tile-aligned head rows +
    # the first 2*halo rows of the NEXT aligned block
    head = xp[:, : n_tiles * t_tile].reshape(b, n_tiles, t_tile, c)
    xp2 = jnp.pad(xp, ((0, 0), (0, t_tile - 2 * halo), (0, 0)))
    tail = xp2[:, t_tile:].reshape(b, n_tiles, t_tile, c)[:, :, : 2 * halo]
    xw = jnp.concatenate([head, tail], axis=2)  # (B, n_tiles, win, C)
    g = n_tiles // pack
    if pack > 1:
        xw = xw.reshape(b, g, pack, win, c).swapaxes(2, 3)
        xw = xw.reshape(b, g, win, pack * c)
    else:
        xw = xw.reshape(b, g, win, c)
    return xw, t_pad, g


def _pack_centers(x, t_tile: int, t_pad: int, pack: int):
    b, t, c = x.shape
    xp = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))
    g = t_pad // (t_tile * pack)
    if pack > 1:
        xc = xp.reshape(b, g, pack, t_tile, c).swapaxes(2, 3)
        return xc.reshape(b, g, t_tile, pack * c)
    return xp.reshape(b, g, t_tile, c)


def _unpack_centers(out, b, t_pad, t, c, t_tile: int, pack: int):
    g = t_pad // (t_tile * pack)
    if pack > 1:
        out = out.reshape(b, g, t_tile, pack, c).swapaxes(2, 3)
    return out.reshape(b, t_pad, c)[:, :t]


def fused_aa_snake_conv(x, alpha, beta, conv_kernel, conv_bias,
                        dilation: int = 1, residual=None,
                        logscale: bool = True, t_tile: int = 0,
                        interpret=None):
    """AA-snake activation fused with the following k=3 dilated conv1d (+
    optional residual add): the BigVGAN AMP block's inner step
    (reference models.py:18-76 `xt = convs1[i](act1(x))`) as ONE kernel.
    The XLA convs/adds at the top vocoder stages run with C=32 on 128 lanes
    (4x waste) and round-trip HBM between every op; here the packed-lane
    windows stay in VMEM through activation, conv, bias, and residual.

    x: (B, T, C); conv_kernel: (k, C, C) flax nn.Conv tree, odd k;
    conv_bias: (C,). Edge samples within filter+conv reach of the utterance
    ends use extended-LTI padding like fused_aa_snake (interior-exact)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    t_tile = t_tile or T_TILE_DEFAULT
    f0, f1, g, up_off0, up_off1, down_off = _phase_filters()
    filters = (
        tuple(float(v) for v in f0), tuple(float(v) for v in f1),
        tuple(float(v) for v in g), int(up_off0), int(up_off1), int(down_off),
    )
    if residual is None:
        residual = jnp.zeros((0,), x.dtype)
    ksize = int(conv_kernel.shape[0])
    return _fused_aa_snake_conv(
        x, alpha, beta, conv_kernel, conv_bias, residual, logscale,
        int(t_tile), int(dilation), _conv_ext(ksize, int(dilation)),
        bool(interpret), filters
    )


@partial(jax.jit, static_argnames=("logscale", "t_tile", "dilation",
                                   "conv_ext", "interpret", "filters"))
def _fused_aa_snake_conv(x, alpha, beta, wk, bconv, residual, logscale: bool,
                         t_tile: int, dilation: int, conv_ext: int,
                         interpret: bool, filters):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f0, f1, g, up_off0, up_off1, down_off = filters
    b, t, c = x.shape
    has_res = residual.size > 0
    t_tile = min(t_tile, max(8, -(-t // 8) * 8))
    halo = HALO + conv_ext
    # the aligned window construction needs 2*halo <= t_tile (tiny inputs,
    # e.g. module init shapes, would otherwise under-tile)
    t_tile = max(t_tile, -(-2 * halo // 8) * 8)
    pack = max(1, 128 // c) if c <= 128 else 1
    pack = min(pack, max(1, -(-t // t_tile)))
    xw, t_pad, n_groups = _pack_windows(x, t_tile, halo, pack)
    cp = pack * c
    win = t_tile + 2 * halo
    alpha_in = jnp.tile(alpha.reshape(1, -1), (pack,)).reshape(1, cp)
    beta_in = jnp.tile(beta.reshape(1, -1), (pack,)).reshape(1, cp)
    # per-tap block-diagonal channel mixing: packed lane groups independent
    ksize = wk.shape[0]
    eye = jnp.eye(pack, dtype=x.dtype)
    wbd = jnp.stack(
        [jnp.kron(eye, wk[k].astype(x.dtype)) for k in range(ksize)]
    )
    wbd = wbd.reshape(ksize * cp, cp)
    b_in = jnp.tile(bconv.reshape(1, -1), (pack,)).reshape(1, cp)

    kw = dict(t_tile=t_tile, ksize=int(ksize), dilation=dilation,
              conv_ext=conv_ext, f0=f0, f1=f1, g=g,
              up_off0=up_off0, up_off1=up_off1, down_off=down_off,
              logscale=logscale)
    in_specs = [
        pl.BlockSpec((1, 1, win, cp), lambda i, j: (i, j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cp), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cp), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((ksize * cp, cp), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cp), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [xw, alpha_in, beta_in, wbd, b_in]
    if has_res:
        kernel = partial(_aa_snake_conv_kernel, has_residual=True, **kw)
        args.append(_pack_centers(residual, t_tile, t_pad, pack))
        in_specs.append(
            pl.BlockSpec((1, 1, t_tile, cp), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM)
        )
    else:
        kernel = partial(_aa_snake_conv_kernel_nores, has_residual=False, **kw)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, n_groups, t_tile, cp), x.dtype),
        grid=(b, n_groups),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, t_tile, cp), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*args)
    return _unpack_centers(out, b, t_pad, t, c, t_tile, pack)


def fused_aa_snake(x, alpha, beta, logscale: bool = True, t_tile: int = 0,
                   interpret=None):
    """x: (B, T, C) -> (B, T, C); alpha/beta: (C,) snake parameters.

    Equivalent to downsample1d(snake(upsample1d(x))) with extended-LTI edge
    handling. T is padded internally to a multiple of t_tile; overlapping
    tile windows (halo 2*HALO) are pre-gathered so BlockSpec indexing stays
    non-overlapping. On non-TPU backends the kernel runs in interpret mode
    (correctness paths/tests); compiled Mosaic on TPU.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    t_tile = t_tile or T_TILE_DEFAULT
    # probe OUTSIDE the jit (omnistaging would stage the probe ops into the
    # trace); pass as hashable static tuples
    f0, f1, g, up_off0, up_off1, down_off = _phase_filters()
    filters = (
        tuple(float(v) for v in f0),
        tuple(float(v) for v in f1),
        tuple(float(v) for v in g),
        int(up_off0), int(up_off1), int(down_off),
    )
    return _fused_aa_snake(x, alpha, beta, logscale, t_tile, interpret, filters)


@partial(jax.jit, static_argnames=("logscale", "t_tile", "interpret", "filters"))
def _fused_aa_snake(x, alpha, beta, logscale: bool, t_tile: int,
                    interpret: bool, filters):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f0, f1, g, up_off0, up_off1, down_off = filters
    b, t, c = x.shape
    t_tile = min(t_tile, max(8, -(-t // 8) * 8))
    t_tile = max(t_tile, -(-2 * HALO // 8) * 8)  # window construction bound
    # LANE PACKING: the vocoder's upper stages have C = 32/64 channels, so a
    # plain (rows, C) layout leaves 3/4 of the 128 lanes (and of every
    # native (8, 128) memory tile) idle — profiled ~26x off the roofline.
    # Tile windows are mutually independent (each carries its own halo), so
    # `pack` of them ride side-by-side on the lane axis: (win, pack*C).
    # The FIR row shifts are per-window time offsets, identical across the
    # packed windows, so the kernel body is unchanged.
    pack = max(1, 128 // c) if c <= 128 else 1
    pack = min(pack, max(1, -(-t // t_tile)))  # don't pad tiny inputs 4x
    t_pad = -(-t // (t_tile * pack)) * (t_tile * pack)
    n_tiles = t_pad // t_tile
    # edge halo: replicate x, plus tail padding up to the tile grid
    xp = jnp.pad(x, ((0, 0), (HALO, HALO + (t_pad - t)), (0, 0)), mode="edge")
    # overlapping windows -> contiguous (B, n_tiles, t_tile + 2*HALO, C)
    win = t_tile + 2 * HALO
    idx = np.arange(win)[None, :] + t_tile * np.arange(n_tiles)[:, None]
    xw = xp[:, idx, :]
    n_groups = n_tiles // pack
    if pack > 1:
        # (B, G, pack, win, C) -> (B, G, win, pack*C)
        xw = xw.reshape(b, n_groups, pack, win, c).swapaxes(2, 3)
        xw = xw.reshape(b, n_groups, win, pack * c)
        ab_tile = (pack,)
    else:
        ab_tile = (1,)
    alpha_in = jnp.tile(alpha.reshape(1, -1), ab_tile).reshape(1, pack * c)
    beta_in = jnp.tile(beta.reshape(1, -1), ab_tile).reshape(1, pack * c)

    kernel = partial(
        _aa_snake_kernel, t_tile=t_tile, f0=f0, f1=f1, g=g,
        up_off0=up_off0, up_off1=up_off1, down_off=down_off,
        logscale=logscale,
    )
    cp = pack * c
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, n_groups, t_tile, cp), x.dtype),
        grid=(b, n_groups),
        in_specs=[
            pl.BlockSpec((1, 1, win, cp), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cp), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cp), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, t_tile, cp), lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(xw if pack > 1 else xw.reshape(b, n_groups, win, cp), alpha_in, beta_in)
    if pack > 1:
        # (B, G, t_tile, pack, C) -> (B, G, pack, t_tile, C) -> (B, t_pad, C)
        out = out.reshape(b, n_groups, t_tile, pack, c).swapaxes(2, 3)
    out = out.reshape(b, t_pad, c)
    return out[:, :t]
