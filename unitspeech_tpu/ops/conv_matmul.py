"""conv3x3 as explicit MXU matmuls over the flattened (time*freq, C) layout.

At the U-Net's deep stages the activation tensors are small (2.6-5.3 MB) but
XLA's conv lowering costs 2-6x the MXU matmul floor (measured on v5e,
tools/bench_conv_variants.py: stage3 nn.Conv 0.778 ms vs 0.132 ms as one
im2col matmul; stage2 0.421 vs 0.366 as 9 shifted matmuls). Reformulating the
conv as plain matmuls lets XLA tile the MXU directly:

  * ``taps``:   out[n] = sum_{dt,df} x[n + dt*F + df] @ W[dt,df]  — 9 matmuls,
                row shifts are pad/slice, freq-wrap rows masked to zero.
  * ``im2col``: concat the 9 shifted copies on channels -> one
                (N, 9*Cin) x (9*Cin, Cout) matmul. 9x read amplification,
                wins when compute dominates bytes (Cout >= 1024).

Both are exact reformulations of a padding=SAME 3x3 conv on the (T, F) grid
(verified to float32 roundoff vs flax nn.Conv in tests/test_ops.py), so they
are safe for training and inference alike. The reference computes the same
convs via torch Conv2d NCHW (/root/reference/unitspeech/unitspeech.py:46-55).
"""

from __future__ import annotations

import jax.numpy as jnp


def _shifted(base, df, wrap_m, wrap_p, z1):
    if df == -1:
        return jnp.concatenate([z1, base[:, :-1]], 1) * wrap_m
    if df == 1:
        return jnp.concatenate([base[:, 1:], z1], 1) * wrap_p
    return base


def _time_shifts(xf, f):
    b, n, cin = xf.shape
    zf = jnp.zeros((b, f, cin), xf.dtype)
    return {
        -1: jnp.concatenate([zf, xf[:, :-f]], 1),
        0: xf,
        1: jnp.concatenate([xf[:, f:], zf], 1),
    }


def _wrap_masks(n, f, dtype):
    idx = jnp.arange(n) % f
    wrap_m = (idx != 0).astype(dtype)[None, :, None]      # df=-1 kills f==0
    wrap_p = (idx != f - 1).astype(dtype)[None, :, None]  # df=+1 kills f==F-1
    return wrap_m, wrap_p


def conv3x3_taps(xf, w, f: int):
    """9 shifted matmuls. xf: (B, N=T*F, Cin); w: (3, 3, Cin, Cout) flax
    kernel (spatial (t, f)). Returns (B, N, Cout) float32 accumulators."""
    b, n, cin = xf.shape
    wrap_m, wrap_p = _wrap_masks(n, f, xf.dtype)
    z1 = jnp.zeros((b, 1, cin), xf.dtype)
    x_dt = _time_shifts(xf, f)
    acc = None
    for dt in (-1, 0, 1):
        for df in (-1, 0, 1):
            tap = _shifted(x_dt[dt], df, wrap_m, wrap_p, z1)
            part = jnp.einsum(
                "bnc,cd->bnd", tap, w[dt + 1, df + 1],
                preferred_element_type=jnp.float32,
            )
            acc = part if acc is None else acc + part
    return acc


def conv3x3_im2col(xf, w, f: int):
    """One (B, N, 9*Cin) x (9*Cin, Cout) matmul (column order = (dt, df)
    row-major, matching w.reshape(9*Cin, Cout))."""
    b, n, cin = xf.shape
    wrap_m, wrap_p = _wrap_masks(n, f, xf.dtype)
    z1 = jnp.zeros((b, 1, cin), xf.dtype)
    x_dt = _time_shifts(xf, f)
    cols = []
    for dt in (-1, 0, 1):
        for df in (-1, 0, 1):
            cols.append(_shifted(x_dt[dt], df, wrap_m, wrap_p, z1))
    col = jnp.concatenate(cols, -1)
    return jnp.einsum(
        "bnk,kd->bnd", col, w.reshape(9 * cin, -1),
        preferred_element_type=jnp.float32,
    )


def conv3x3_int8(xf, w, f: int):
    """int8 im2col conv: dynamic symmetric per-tensor activation scale +
    per-output-channel weight scales, int8 x int8 -> int32 on the MXU (v5e
    has 2x int8 throughput and the int8 column tensor halves HBM bytes).
    Measured ~30% faster than the bf16 matmul at C=512 (tools/
    bench_conv_variants.py --int8). Returns f32 like the other variants.

    Quantization error is ~1% relative per conv (tests/test_ops.py); the
    estimator consumes it over a 50-step recurrent sampler, so this path is
    OPT-IN (ResnetBlock use_int8) and excluded from parity claims."""
    b, n, cin = xf.shape
    cout = w.shape[-1]
    # per-tensor activation scale via the one-pass Pallas row-absmax kernel:
    # XLA's full-tensor abs+max reduce measured ~15x its bytes bound on the
    # serving profile (abs_reduce fusions ~0.2 ms/step — r4 roofline;
    # ops/pallas_stats.py)
    from unitspeech_tpu.ops.pallas_stats import row_absmax

    sx = 127.0 / jnp.maximum(jnp.max(row_absmax(xf)), 1e-8)
    x8 = jnp.clip(
        jnp.round(xf.astype(jnp.float32) * sx), -127, 127
    ).astype(jnp.int8)
    wm = w.astype(jnp.float32).reshape(9 * cin, cout)
    sw = 127.0 / jnp.maximum(jnp.max(jnp.abs(wm), axis=0), 1e-8)  # (Cout,)
    w8 = jnp.clip(jnp.round(wm * sw), -127, 127).astype(jnp.int8)

    wrap_m, wrap_p = _wrap_masks(n, f, jnp.int8)
    z1 = jnp.zeros((b, 1, cin), jnp.int8)
    x_dt = _time_shifts(x8, f)
    cols = [
        _shifted(x_dt[dt], df, wrap_m, wrap_p, z1)
        for dt in (-1, 0, 1) for df in (-1, 0, 1)
    ]
    col = jnp.concatenate(cols, -1)
    y = jnp.einsum("bnk,kd->bnd", col, w8,
                   preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * (1.0 / (sx * sw))


def _all_shifts(xf, f):
    """{(dt, df): row-shifted copy} for dt, df in {-1, 0, 1}^2."""
    b, n, cin = xf.shape
    wrap_m, wrap_p = _wrap_masks(n, f, xf.dtype)
    z1 = jnp.zeros((b, 1, cin), xf.dtype)
    x_dt = _time_shifts(xf, f)
    return {
        (dt, df): _shifted(x_dt[dt], df, wrap_m, wrap_p, z1)
        for dt in (-1, 0, 1)
        for df in (-1, 0, 1)
    }


def conv_transpose4x4_matmul(x, kernel, bias):
    """ConvTranspose 4x4 stride 2 (models/unet.py Upsample; reference
    unitspeech.py:18-24) as 16 phase matmuls. MEASURED NEGATIVE on v5e:
    exact and at the flop floor on paper (XLA's dilated-input lowering
    wastes 3/4 of its MACs on zeros and profiled ~3x off floor), but the
    phase-interleave relayout of the doubled-resolution output dominates in
    practice — the estimator regressed 0.116 -> 0.152 RTF with this form
    wired in. Kept as the documented reformulation + CPU-verified oracle;
    the model uses nn.ConvTranspose.

    lax.conv_transpose(x, K, strides=2, padding=(2,2)) == correlation of the
    2x-dilated, 2-padded input with K, so output phase (a, b) of (2m+a, 2j+b)
    reads exactly 4 taps:  a=0: time taps x[m-1] K[0], x[m] K[2];
    a=1: x[m] K[1], x[m+1] K[3]; same pattern over freq columns. Each phase
    is 4 (N, C) x (C, Cout) matmuls on the un-dilated rows — the exact
    flop floor — then the 4 phases interleave to (B, 2T, 2F, Cout).

    x: (B, T, F, C); kernel: (4, 4, C, Cout) flax ConvTranspose tree.
    Returns (B, 2T, 2F, Cout) in x.dtype (f32 accumulators, one round)."""
    b, t, f, cin = x.shape
    cout = kernel.shape[-1]
    xf = x.reshape(b, t * f, cin)
    shifts = _all_shifts(xf, f)
    k = kernel.astype(x.dtype)
    # phase tap tables: phase 0 reads shift -1 via kernel row 0 and shift 0
    # via kernel row 2; phase 1 reads shift 0 via row 1 and shift +1 via row 3
    taps = {0: ((-1, 0), (0, 2)), 1: ((0, 1), (1, 3))}
    phases = []
    for a in (0, 1):
        row = []
        for bb in (0, 1):
            acc = None
            for dt, ut in taps[a]:
                for df, uf in taps[bb]:
                    part = jnp.einsum(
                        "bnc,cd->bnd", shifts[(dt, df)], k[ut, uf],
                        preferred_element_type=jnp.float32,
                    )
                    acc = part if acc is None else acc + part
            out = (acc + bias).astype(x.dtype).reshape(b, t, f, cout)
            row.append(out)
        phases.append(jnp.stack(row, axis=3))  # (B, T, F, 2, Cout)
    y = jnp.stack(phases, axis=2)  # (B, T, 2, F, 2, Cout)
    return y.reshape(b, 2 * t, 2 * f, cout)


def conv3x3_stride2_matmul(x, kernel, bias):
    """conv3x3 stride 2 SAME (models/unet.py Downsample; reference
    unitspeech.py:27-33) as 9 subsampled matmuls. MEASURED NEGATIVE on v5e:
    the shifted copies materialize at FULL resolution before the stride-2
    subsample (down+up pair at stage0: 1.7 ms vs 0.135 XLA,
    tools/bench_conv_variants.py --extras), so the model keeps nn.Conv.
    Output rows are the even (t, f) grid positions, so each of the 9 taps is
    the even-subsampled shifted copy matmul'd with its (C, Cout) slice.

    torch/flax SAME for stride 2, k=3, padding (1,1): out[m, j] reads
    in[2m + dt, 2j + df] for dt, df in {-1, 0, 1}.

    x: (B, T, F, C) with T, F even; returns (B, T/2, F/2, Cout)."""
    b, t, f, cin = x.shape
    cout = kernel.shape[-1]
    xf = x.reshape(b, t * f, cin)
    shifts = _all_shifts(xf, f)
    k = kernel.astype(x.dtype)
    acc = None
    for dt in (-1, 0, 1):
        for df in (-1, 0, 1):
            s = shifts[(dt, df)].reshape(b, t, f, cin)[:, ::2, ::2, :]
            part = jnp.einsum(
                "btfc,cd->btfd", s, k[dt + 1, df + 1],
                preferred_element_type=jnp.float32,
            )
            acc = part if acc is None else acc + part
    return (acc + bias).astype(x.dtype)


def choose_conv_impl(cin: int, cout: int) -> str:
    """Shape-keyed implementation choice, from v5e measurements at the
    reference estimator stages (tools/bench_conv_variants.py):

      C=128, F=80: nn.Conv 0.638 / fused-Pallas 0.539 ms  -> "xla"
      C=256, F=40: nn.Conv 0.652 / fused-Pallas 0.357 ms  -> "xla"
      C=512, F=20: nn.Conv 0.421 / taps 0.366 / im2col 0.443 -> "taps"
      C=1024,F=10: nn.Conv 0.778 / taps 0.390 / im2col 0.132 -> "im2col"

    The early stages stay "xla" here because the fused Pallas ResnetBlock
    (ops/pallas_resnet.py) covers them; when it is disabled they are
    HBM-bound and nn.Conv is already near the roofline."""
    if max(cin, cout) >= 1024:
        return "im2col"
    if max(cin, cout) >= 512:
        return "taps"
    return "xla"


def conv3x3_matmul(x, w, bias, impl: str):
    """(B, T, F, Cin) -> (B, T, F, Cout) via the chosen matmul formulation,
    rounding the f32 accumulator to x.dtype once (same numerics contract as
    the fused Pallas kernels)."""
    b, t, f, cin = x.shape
    xf = x.reshape(b, t * f, cin)
    fn = conv3x3_im2col if impl == "im2col" else conv3x3_taps
    y = fn(xf, w.astype(x.dtype), f)
    if bias is not None:
        y = y + bias
    return y.astype(x.dtype).reshape(b, t, f, -1)
