#!/usr/bin/env python
"""DPM-Solver++(2M) fast-mode quality gate.

The fast serving mode samples the probability-flow ODE deterministically
(models/diffusion.reverse_diffusion_ode), so unlike the int8 gate there is
no like-for-like stochastic reference: a DDPM run is a DIFFERENT sample of
the model distribution and mel-L1 against it measures sample diversity, not
solver quality. The meaningful quality notion for a deterministic solver is
DISCRETIZATION error: distance from the converged solution of the same ODE
with the same z. This tool measures, at FULL reference size with converted
random weights and identical priors:

    mel-L1( dpm2@N , dpm2@200 ) / mel dynamic range      (N = 25, 16, 10)

across weight seeds x noise keys, plus the bf16-vs-f32 numerics band of the
50-step DDPM for scale context. Discretization error is a different
trajectory, not rounding noise, so the band is reported but NOT the pass
criterion; the gate passes when the @25 error is a small fraction of the
mel dynamic range (<= 2%, a perceptual-insignificance proxy; the
literature's quality claim — DPM-Solver++ at ~25 steps matches ~50-step
ancestral sampling — can only be re-validated once real weights exist,
same caveat class as INT8_GATE). Writes DPM2_GATE.json.

Run on the real TPU:  python tools/dpm2_gate.py     (or --smoke on CPU)
"""
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import json

import numpy as np

SMOKE = False
FRAMES, N_TOK, WEIGHT_SEEDS, NOISE_KEYS = 344, 140, (0, 1), (0, 1, 2)
STEP_GRID = (25, 16, 10)
REF_STEPS = 200

import jax
import jax.numpy as jnp


def main():
    global SMOKE, FRAMES, N_TOK, WEIGHT_SEEDS
    if "--smoke" in sys.argv:
        SMOKE, FRAMES, N_TOK, WEIGHT_SEEDS = True, 48, 12, (0,)
        jax.config.update("jax_platforms", "cpu")

    import tools.int8_gate as int8_gate

    # propagate smoke into the shared builders: int8_gate.make_cfg sizes the
    # model from ITS module global (a full-size build on CPU otherwise)
    int8_gate.SMOKE = SMOKE
    build, make_cfg = int8_gate.build, int8_gate.make_cfg
    from unitspeech_tpu.infer.tts import TTSModels

    rng = np.random.default_rng(0)
    tokens_np = rng.integers(1, 179, (1, N_TOK)).astype(np.int32)
    w = np.full((1, N_TOK), FRAMES // N_TOK, np.float32)
    w[0, 0] += FRAMES - (FRAMES // N_TOK) * N_TOK

    def run_mel(synth, steps, nk, sampler):
        _wav, mel, *_ = synth._single_dispatch(
            tokens_np, [N_TOK], w, FRAMES, jax.random.PRNGKey(nk),
            steps, 1.0, 1.0, 1.0, sampler=sampler,
        )
        return np.asarray(mel, np.float32)[0]

    synths = {m: build(WEIGHT_SEEDS[0], m) for m in ("f32", "bf16")}
    report = {"frames": FRAMES, "ref_steps": REF_STEPS, "runs": []}
    ratios = {n: [] for n in STEP_GRID}
    for ws in WEIGHT_SEEDS:
        if ws != WEIGHT_SEEDS[0]:
            for m in synths.values():
                fresh = TTSModels.random_init(make_cfg(), jax.random.PRNGKey(ws))
                m.models.text_encoder_params = fresh.text_encoder_params
                m.models.duration_predictor_params = fresh.duration_predictor_params
                m.models.decoder_params = fresh.decoder_params
                m.models.vocoder_params = fresh.vocoder_params
                m.models.spk_emb = fresh.spk_emb
        for nk in NOISE_KEYS[: 1 if SMOKE else len(NOISE_KEYS)]:
            # numerics yardstick: bf16-vs-f32 band of the DDPM default
            with jax.default_matmul_precision("float32"):
                m_f32 = run_mel(synths["f32"], 50 if not SMOKE else 4, nk,
                                "ddpm")
            m_b16 = run_mel(synths["bf16"], 50 if not SMOKE else 4, nk, "ddpm")
            band = float(np.abs(m_b16 - m_f32).mean())
            mel_range = float(m_f32.max() - m_f32.min())
            ref = run_mel(synths["bf16"], REF_STEPS if not SMOKE else 32, nk,
                          "dpm2")
            row = {"weight_seed": ws, "noise_key": nk,
                   "bf16_band_l1": band, "mel_range": mel_range}
            for n in STEP_GRID:
                m_n = run_mel(synths["bf16"], n if not SMOKE else max(n // 4, 2),
                              nk, "dpm2")
                l1 = float(np.abs(m_n - ref).mean())
                row[f"disc_l1_@{n}"] = l1
                row[f"disc_over_band_@{n}"] = l1 / max(band, 1e-9)
                ratios[n].append(l1 / max(band, 1e-9))
            report["runs"].append(row)
            print(row, flush=True)

    report["max_disc_over_band"] = {
        str(n): float(np.max(ratios[n])) for n in STEP_GRID
    }
    frac = {
        n: max(r[f"disc_l1_@{n}"] / max(r["mel_range"], 1e-9)
               for r in report["runs"])
        for n in STEP_GRID
    }
    report["max_disc_frac_of_range"] = {str(n): float(v)
                                        for n, v in frac.items()}
    # gate: @25 discretization error <= 2% of the mel dynamic range
    report["gate_steps"] = 25
    report["pass"] = bool(frac[25] <= 0.02)
    out = "DPM2_GATE.json" if not SMOKE else "/tmp/DPM2_GATE_smoke.json"
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", out, "pass:", report["pass"])


if __name__ == "__main__":
    main()
