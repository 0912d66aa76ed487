#!/usr/bin/env python
"""Whole-sampler roofline ledger (VERDICT r4 item 2): per-bucket measured
time vs compute/bandwidth bounds, from the xplane trace's per-HLO events
(tf_op module paths + bytes_accessed/model_flops metadata) plus analytic
FLOP/byte counts for the Pallas custom-calls (which report model_flops=0).

Buckets are the estimator's module instances (down_0_res1, mid_attn,
up_2_up, ...), the sampler glue, and everything outside the while loop
(encoder, vocoder, alignment). For each bucket:

  measured ms/step | analytic GFLOP | min bytes | bound ms
  (max of MXU-time and HBM-time) | ratio measured/bound

v5e peaks used: 197 TFLOPS bf16 MXU, 394 TOPS int8, 819 GB/s HBM.

Usage: python tools/roofline.py [--trace-dir /tmp/pipeline_trace]
       (generate the trace first with tools/profile_pipeline.py)
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_BF16 = 197e12
PEAK_INT8 = 394e12
PEAK_F32 = 49e12    # MXU f32 (6-pass) — conservative
# VPU: 8 sublanes x 128 lanes x 4 ALUs x ~0.94 GHz ~= 3.9 Tops/s f32.
# Practical Mosaic rate on multi-pass elementwise kernels measures well
# below this (tools/bench_transcendental.py) — the VPU bound below is the
# *optimistic* floor, like the MXU peaks.
PEAK_VPU = 3.9e12
HBM_BPS = 819e9
STEPS = 50


def load_events(trace_dir):
    paths = glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise SystemExit(f"no trace under {trace_dir}")
    d = json.load(gzip.open(max(paths, key=os.path.getmtime)))
    evs = d["traceEvents"]
    tpu_pids = {
        e["pid"] for e in evs
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in e["args"].get("name", "")
    }
    return [e for e in evs
            if e.get("ph") == "X" and e["pid"] in tpu_pids and "args" in e]


def bucket_of(e):
    tf_op = e["args"].get("tf_op", "")
    # the fused final Block+final_conv kernels run under a nested jit, so
    # their tf_op module path is bare jit(...) frames — name-match them
    # before the module regex (they otherwise land in a bogus "est/jit")
    if e["name"].startswith(("_fused_final", "fused_final")):
        return "est/final_block"
    m = re.search(r"estimator/([A-Za-z0-9_]+)", tf_op)
    if m:
        return "est/" + m.group(1)
    if "/while/" in tf_op or e["name"].startswith(
            ("constant_dynamic-update-slice", "dynamic-slice")):
        return "sampler-glue"
    if "BigVGAN" in tf_op or "vocoder" in tf_op:
        return "vocoder"
    if "Encoder" in tf_op or "encoder" in tf_op:
        return "encoder"
    if "DurationPredictor" in tf_op:
        return "duration"
    return "other"


# ---------------------------------------------------------------------------
# analytic FLOPs/bytes per estimator module at the serving shapes
# ---------------------------------------------------------------------------

def estimator_blocks(t=344, f=80, b=3, dim=128, mults=(1, 2, 4, 8),
                     int8_min_c=512):
    """(bucket -> (flops, min_bytes, peak)) per module instance, mirroring
    GradLogPEstimator2d exactly (models/unet.py): down_i blocks at
    resolution i; up_ind blocks run at resolution ind+1 on the
    skip-concatenated input (cin = 2*dims[ind+1]) and THEN upsample to
    resolution ind. int8 where choose_conv_impl routes to the flat matmul
    path (max(cin, cout) >= 512) under the serving default."""
    dims = [dim * m for m in mults]
    rows = [t * f * b // (4 ** i) for i in range(len(dims))]
    out = {}

    def conv_cost(r, cin, cout, int8):
        """Bytes model the conv as the flat path actually executes it, not
        an idealized conv: the int8 im2col path (ops/conv_matmul.
        conv3x3_int8) quantizes the bf16 input, MATERIALIZES the (r, 9*cin)
        int8 column tensor (write + read), and re-reads the int8 weights
        every step (loop-hoisted quantization, but the bytes still flow);
        the bf16 taps/im2col paths likewise materialize shifted copies.
        The r4 ledger's first version omitted these, overstating deep-conv
        headroom as 1.7-2x; with the real traffic the deep blocks measure
        ~1.0-1.2x their bound."""
        fl = r * 9 * cin * cout * 2
        if int8:
            by = (r * cin * 2        # bf16 input read (absmax + quantize)
                  + r * cin          # int8 x write
                  + 2 * r * 9 * cin  # im2col column write + read (int8)
                  + 9 * cin * cout   # int8 weights, re-read each step
                  + r * cout * 2)    # output store (bf16)
        else:
            by = (r * cin * 2
                  + 2 * r * 9 * cin * 2  # shifted-tap / column copies (bf16)
                  + 9 * cin * cout * 2
                  + r * cout * 2)
        return fl, by

    def res_block(name, r, cin, cout, fused=False):
        """fused=True: the block runs the 3-chained-Pallas-kernel route
        (F % 8 == 0 stages — down_0/1 and up_0; bf16, windows assembled in
        VMEM with a ~25% halo re-read, glue rides inside the kernels).
        fused=False: the flat matmul route with materialized columns."""
        if fused:
            fl = (r * 9 * cin * cout + r * 9 * cout * cout) * 2
            if cin != cout:
                fl += r * cin * cout * 2
            by = (1.25 * r * cin * 2 + r * cout * 2      # A: in + c1
                  + 1.25 * r * cout * 2 + r * cout * 2   # B: c1 + c2
                  + r * cout * 2 + r * cin * 2           # C: c2 + x residual
                  + r * cout * 2)                        # C: out
            out[name] = (fl, by, PEAK_BF16)
            return
        int8 = max(cin, cout) >= int8_min_c
        f1, b1 = conv_cost(r, cin, cout, int8)
        f2, b2 = conv_cost(r, cout, cout, int8)
        fl, by = f1 + f2, b1 + b2
        if cin != cout:  # 1x1 residual projection
            fl += r * cin * cout * 2
            by += r * (cin + cout) * 2
        by += 4 * r * cout * 2  # glue reads/writes (GN+mish+film), 2 passes
        out[name] = (fl, by, PEAK_INT8 if int8 else PEAK_BF16)

    def attn(name, r, c):
        hd = 128  # 4 heads x 32
        fl = (r * c * 3 * hd * 2          # qkv projection
              + r * hd * 32 * 2 * 2       # context + out einsums (O(N d^2))
              + r * hd * c * 2)           # output projection
        by = r * c * 2 * 3 + r * 3 * hd * 2
        out[name] = (fl, by, PEAK_BF16)

    prev_c = 2
    for i, c in enumerate(dims):
        r = rows[i]
        fused = i < 2  # F=80/40 stages: fused Pallas resblock route
        res_block(f"est/down_{i}_res1", r, prev_c, c, fused=fused)
        res_block(f"est/down_{i}_res2", r, c, c, fused=fused)
        attn(f"est/down_{i}_attn", r, c)
        if i < len(dims) - 1:
            out[f"est/down_{i}_down"] = (
                (r // 4) * 9 * c * c * 2,
                r * c * 2 + (r // 4) * c * 2 + 9 * c * c,
                PEAK_BF16,
            )
        prev_c = c
    r, c = rows[-1], dims[-1]
    res_block("est/mid_res1", r, c, c)
    attn("est/mid_attn", r, c)
    res_block("est/mid_res2", r, c, c)
    for ind in range(len(dims) - 2, -1, -1):
        din = dims[ind]
        r = rows[ind + 1]
        cin = dims[ind + 1] * 2  # skip concat
        fused = ind == 0  # up_0 runs at the F=40 resolution: fused route
        res_block(f"est/up_{ind}_res1", r, cin, din, fused=fused)
        res_block(f"est/up_{ind}_res2", r, din, din, fused=fused)
        attn(f"est/up_{ind}_attn", r, din)
        out[f"est/up_{ind}_up"] = (
            (r * 4) * 4 * din * din * 2,  # convT4x4/s2: 4 taps per output
            r * din * 2 + (r * 4) * din * 2 + 16 * din * din,
            PEAK_BF16,
        )
    r0 = rows[0]
    out["est/final_block"] = (
        r0 * 9 * dim * dim * 2 + r0 * dim * 2,
        r0 * dim * 2 * 2 + r0 * 4,
        PEAK_BF16,
    )
    return out


def vocoder_cost(t=344, num_mels=80, rates=(8, 8, 2, 2), ch0=512,
                 ks=(3, 7, 11), n_dil=3):
    """(mxu_flops, vpu_flops, min_bytes) for the full BigVGAN forward at
    the serving shape, Pallas fused path (models/vocoder.py).

    Per fused AA-snake-conv call on a (T, C) stage tensor:
      VPU  ~74 ops/elem — up 2x polyphase (2 phases x 6 taps x mul+add = 24),
           snakebeta on the 2T grid (poly sin ~9 ops + scale/square/add ~4,
           x2 rows = 26), down 12 taps x2 = 24;
      MXU  the fused conv as k dense (rows, CP)x(CP, CP) tap dots with
           CP = pack*C = 128 (block-diagonal weights: the pack^2 zero blocks
           still burn MXU cycles);
      HBM  window read + packed-copy write/read + output write (+ residual
           read on the second conv of each pair) ~= 5 passes of T*C*2 bytes.
    XLA side (ConvTranspose upsamplers, conv_pre/post, the xs-mean adds)
    rides the reported-bytes term; its MXU flops are counted below."""
    VPU_PER_ELEM = 74.0
    CP = 128
    mxu = vpu = by = 0.0
    t_in, c_in = t, num_mels
    mxu += t_in * 7 * c_in * ch0 * 2  # conv_pre k=7
    ch = ch0
    for i, u in enumerate(rates):
        ch_out = ch0 // (2 ** (i + 1))
        t_out = t_in * u
        k_up = {8: 16, 2: 4}[u]
        mxu += t_out * (k_up // u) * ch * ch_out * 2  # convT: k/u taps/output
        # 18 fused calls (3 resblocks x 3 dilations x 2 convs) per stage
        n_calls = len(ks) * n_dil * 2
        tc = t_out * ch_out
        vpu += n_calls * VPU_PER_ELEM * tc
        mxu += sum(2 * k * tc * CP for k in ks) * n_dil
        by += n_calls * 5 * tc * 2
        by += 2 * 3 * tc * 2  # xs accumulation adds + /num_kernels
        t_in, ch = t_out, ch_out
    vpu += VPU_PER_ELEM * t_in * ch  # final fused_aa_snake (no conv)
    by += 5 * t_in * ch * 2
    mxu += t_in * 7 * ch * 1 * 2  # conv_post
    by += t_in * (ch + 1) * 2
    return mxu, vpu, by


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", default="/tmp/pipeline_trace")
    ap.add_argument("--steps", type=int, default=STEPS)
    ap.add_argument("--markdown", action="store_true")
    args = ap.parse_args()

    evs = load_events(args.trace_dir)
    meas = collections.defaultdict(float)     # bucket -> total us
    meta = collections.defaultdict(lambda: [0.0, 0.0])  # flops, bytes (reported)
    counts = collections.Counter()
    total_us = 0.0
    for e in evs:
        name = e["name"]
        if name.startswith(("jit_", "while")):  # container events
            continue
        bkt = bucket_of(e)
        meas[bkt] += e.get("dur", 0.0)
        total_us += e.get("dur", 0.0)
        counts[bkt] += 1
        meta[bkt][0] += float(e["args"].get("model_flops", 0) or 0)
        meta[bkt][1] += float(e["args"].get("bytes_accessed", 0) or 0)

    analytic = estimator_blocks()
    rows = []
    for bkt, us in sorted(meas.items(), key=lambda kv: -kv[1]):
        ms_step = us / 1e3 / args.steps if bkt.startswith(("est/", "sampler")) \
            else us / 1e3
        if bkt == "vocoder":
            # three-term bound: MXU taps, analytic VPU (AA filters + snake
            # dominate — the Pallas calls report model_flops=0 so the VPU
            # work is otherwise invisible), HBM from the reported bytes
            mxu, vpu, by_a = vocoder_cost()
            by = max(meta[bkt][1], by_a)
            bound_ms = max(mxu / PEAK_BF16, vpu / PEAK_VPU,
                           by / HBM_BPS) * 1e3
            rows.append((bkt, ms_step, (mxu + vpu) / 1e9, by / 1e6,
                         bound_ms, ms_step / bound_ms))
            continue
        fl, by, pk = analytic.get(bkt, (None, None, None))
        if fl is None:
            # fall back to reported metadata (per whole trace)
            fl = meta[bkt][0] / args.steps if bkt.startswith("est/") else meta[bkt][0]
            by = meta[bkt][1] / args.steps if bkt.startswith("est/") else meta[bkt][1]
            pk = PEAK_BF16
        bound_ms = max(fl / pk, by / HBM_BPS) * 1e3 if (fl or by) else 0.0
        ratio = ms_step / bound_ms if bound_ms else float("inf")
        rows.append((bkt, ms_step, fl / 1e9 if fl else 0.0,
                     by / 1e6 if by else 0.0, bound_ms, ratio))

    hdr = f"{'bucket':24s} {'ms':>8s} {'GFLOP':>8s} {'MB':>8s} {'bound':>8s} {'x-off':>6s}"
    sep = "-" * len(hdr)
    if args.markdown:
        print("| bucket | ms/step | GFLOP | MB | bound ms | x-off |")
        print("|---|---|---|---|---|---|")
        for r in rows:
            print(f"| {r[0]} | {r[1]:.3f} | {r[2]:.1f} | {r[3]:.1f} | "
                  f"{r[4]:.3f} | {r[5]:.1f} |")
    else:
        print(hdr)
        print(sep)
        for r in rows:
            print(f"{r[0]:24s} {r[1]:8.3f} {r[2]:8.1f} {r[3]:8.1f} "
                  f"{r[4]:8.3f} {r[5]:6.1f}")
    est_ms = sum(r[1] for r in rows if r[0].startswith("est/"))
    est_bound = sum(r[4] for r in rows if r[0].startswith("est/"))
    print(f"\nestimator: measured {est_ms:.2f} ms/step, roofline bound "
          f"{est_bound:.2f} ms/step ({est_ms/max(est_bound,1e-9):.2f}x)")
    print(f"device total {total_us/1e3:.1f} ms (incl. non-step buckets)")


if __name__ == "__main__":
    main()
