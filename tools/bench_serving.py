#!/usr/bin/env python
"""Serving-path latency: the EXACT two-dispatch path (open-ended text with
real predicted durations — what a user request runs) and the speculative
single-dispatch mode, on the real chip. The headline bench.py uses forced
durations (bucket known up front = one dispatch), which is the VC/warmup
best case; this tool measures the other serving modes.

Measured (v5e, 140 random tokens -> 1.66 s speech, 50 steps, dual CFG):
exact proc 0.235 s -> RTF 0.142 (the 2-dispatch+sync host overhead
dominates short utterances); speculative with frames_per_token=2.6 against
an actual 1.02 -> RTF 0.278 (a 2.5x bucket overshoot runs the sampler at
2.5x the frames — the guess must be tight to beat the exact path)."""
import sys; sys.path.insert(0, __file__.rsplit("/", 2)[0])
import time, numpy as np, jax
sys.argv = [sys.argv[0]]
import bench

synth = bench.build(smoke=False)
rng = np.random.default_rng(0)
tokens = list(rng.integers(1, 179, (140,)).astype(np.int32))
key = jax.random.PRNGKey(42)

# open-ended request: encode+duration dispatch, host sync for the length,
# then the fused align+sample+vocode dispatch at the chosen bucket
t0 = time.time()
wav, sr = synth(tokens, key, diffusion_steps=50,
                text_gradient_scale=1.0, spk_gradient_scale=1.0)
wav = np.asarray(wav)
print(f"# first call (compile): {time.time()-t0:.1f}s, {wav.shape[0]/sr:.2f}s speech", flush=True)
ts = []
for i in range(5):
    t0 = time.perf_counter()
    wav, sr = synth(tokens, jax.random.PRNGKey(i), diffusion_steps=50,
                    text_gradient_scale=1.0, spk_gradient_scale=1.0)
    wav = np.asarray(wav)
    ts.append(time.perf_counter() - t0)
proc = float(np.median(ts))
speech = wav.shape[0] / sr
print(f"exact-path serving: proc {proc:.3f}s speech {speech:.2f}s RTF {proc/speech:.4f}", flush=True)

# speculative single-dispatch mode on the same request
synth.speculative_frames_per_token = 2.6
wav, sr = synth(tokens, key, diffusion_steps=50,
                text_gradient_scale=1.0, spk_gradient_scale=1.0)
np.asarray(wav)
ts = []
for i in range(5):
    t0 = time.perf_counter()
    wav, sr = synth(tokens, jax.random.PRNGKey(i), diffusion_steps=50,
                    text_gradient_scale=1.0, spk_gradient_scale=1.0)
    wav = np.asarray(wav)
    ts.append(time.perf_counter() - t0)
proc = float(np.median(ts))
print(f"speculative serving: proc {proc:.3f}s speech {wav.shape[0]/sr:.2f}s RTF {proc/(wav.shape[0]/sr):.4f}", flush=True)
