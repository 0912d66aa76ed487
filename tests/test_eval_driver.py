"""End-to-end evaluation driver test: per-speaker finetune -> synthesize-eval
orchestration (reference evaluation_generate_samples.py:150-353) plus the
WER/CER hook exercised on the driver's generated wavs."""

import importlib.util
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unitspeech_tpu.data.dataset import load_wav, write_wav
from unitspeech_tpu.models.diffusion import UnitSpeech
from unitspeech_tpu.models.duration import DurationPredictor
from unitspeech_tpu.models.encoder import Encoder
from unitspeech_tpu.models.vocoder import BigVGAN
from unitspeech_tpu.utils import artifacts
from unitspeech_tpu.utils.checkpoint import save_checkpoint

N_FEATS, SPK = 16, 8

_spec = importlib.util.spec_from_file_location(
    "generate_samples",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "evaluation", "generate_samples.py"),
)
generate_samples = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(generate_samples)


@pytest.fixture(scope="module")
def eval_env(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("eval_driver")
    cfg = {
        "data": {"n_feats": N_FEATS},
        "text_encoder": {
            "n_vocab": 180, "n_feats": N_FEATS, "n_channels": 16,
            "filter_channels": 32, "n_layers": 1, "n_heads": 2,
        },
        "unit_encoder": {
            "n_vocab": 50, "n_feats": N_FEATS, "n_channels": 16,
            "filter_channels": 32, "n_layers": 1, "n_heads": 2,
        },
        "duration_predictor": {
            "in_channels": 16, "filter_channels": 16, "spk_emb_dim": SPK,
        },
        "decoder": {
            "n_feats": N_FEATS, "dim": 8, "dim_mults": [1, 2], "groups": 4,
            "spk_emb_dim": SPK,
        },
        "vocoder": {
            "num_mels": N_FEATS, "upsample_rates": [8, 8, 2, 2],
            "upsample_kernel_sizes": [16, 16, 4, 4],
            "upsample_initial_channel": 16,
            "resblock_kernel_sizes": [3], "resblock_dilation_sizes": [[1, 3]],
        },
        "train": {"out_size_second": 2},
    }
    cfg_path = str(tmp / "config.json")
    json.dump(cfg, open(cfg_path, "w"))
    from unitspeech_tpu.config import load_json

    c = load_json(cfg_path)
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)

    te = Encoder.from_config(c.text_encoder)
    te_path = save_checkpoint(
        str(tmp / "te"), 0,
        te.init(k1, jnp.zeros((1, 8), jnp.int32), jnp.array([8])),
    )
    ue = Encoder.from_config(c.unit_encoder)
    ue_path = save_checkpoint(
        str(tmp / "ue"), 0,
        ue.init(k2, jnp.zeros((1, 8), jnp.int32), jnp.array([8])),
    )
    dp = DurationPredictor(in_channels=16, filter_channels=16, spk_emb_dim=SPK)
    dp_path = save_checkpoint(
        str(tmp / "dp"), 0,
        dp.init(k3, jnp.zeros((1, 8, 16)), jnp.ones((1, 8, 1)),
                g=jnp.zeros((1, SPK)), reverse=True),
    )
    dec = UnitSpeech.from_config(c.decoder)
    dec_params = dec.init(
        k4, jnp.zeros((1, 8, N_FEATS)), jnp.ones((1, 8)),
        jnp.zeros((1, 8, N_FEATS)), jnp.zeros((1,)), jnp.zeros((1, SPK)),
    )
    spk_emb = np.random.default_rng(0).standard_normal((1, SPK)).astype(np.float32)
    dec_path = artifacts.save_decoder_bundle(
        str(tmp / "decoder"), 0,
        artifacts.DecoderBundle(
            params=dec_params, spk_emb=spk_emb,
            mel_min=np.full((N_FEATS,), -12.0, np.float32),
            mel_max=np.full((N_FEATS,), 3.0, np.float32),
        ),
    )
    voc = BigVGAN.from_config(c.vocoder)
    voc_path = save_checkpoint(
        str(tmp / "voc"), 0, voc.init(k5, jnp.zeros((1, 8, N_FEATS)))
    )

    rng = np.random.default_rng(1)
    t = np.arange(22050) / 22050
    ref_lines, eval_lines = [], []
    for spk in (0, 1):
        ref = str(tmp / f"ref{spk}.wav")
        write_wav(ref, (0.3 * np.sin(2 * np.pi * (200 + 60 * spk) * t)).astype(np.float32), 22050)
        ref_lines.append(f"{ref}|reference {spk}|{spk}")
    eval_lines = [
        f"{tmp}/e0.wav|həloʊ wɜːld|0",
        f"{tmp}/e1.wav|ɡʊd deɪ|0",
        f"{tmp}/e2.wav|həloʊ əɡɛn|1",
    ]
    ref_fl = str(tmp / "refs.txt")
    open(ref_fl, "w").write("\n".join(ref_lines) + "\n")
    eval_fl = str(tmp / "eval.txt")
    open(eval_fl, "w").write("\n".join(eval_lines) + "\n")

    units_path = str(tmp / "units.npz")
    np.savez(units_path, units=rng.integers(0, 50, 40),
             durations=rng.integers(1, 3, 40))
    spk_path = str(tmp / "spk.npy")
    np.save(spk_path, spk_emb)

    return dict(tmp=tmp, cfg=cfg_path, te=te_path, ue=ue_path, dp=dp_path,
                dec=dec_path, voc=voc_path, refs=ref_fl, evals=eval_fl,
                units=units_path, spk=spk_path)


def test_per_speaker_driver(eval_env):
    e = eval_env
    out_dir = str(e["tmp"] / "out")
    rc = generate_samples.main([
        "--reference-filelist", e["refs"], "--eval-filelist", e["evals"],
        "--ipa", "--config", e["cfg"],
        "--decoder", e["dec"], "--unit-encoder", e["ue"],
        "--text-encoder", e["te"], "--duration-predictor", e["dp"],
        "--vocoder", e["voc"], "--units", e["units"], "--spk-emb", e["spk"],
        "--finetune-iters", "2", "--diffusion-steps", "2",
        "--text-gradient-scale", "0", "--spk-gradient-scale", "0",
        "--out-dir", out_dir, "--cpu", "--fp32",
    ])
    assert rc == 0

    # per-speaker finetuned checkpoints + wavs exist
    assert os.path.isdir(os.path.join(out_dir, "finetune_0", "step_2"))
    assert os.path.isfile(os.path.join(out_dir, "speaker_0", "sample_0001.wav"))
    assert os.path.isfile(os.path.join(out_dir, "speaker_1", "sample_0000.wav"))

    # reference-parity .npy timing arrays (evaluation_generate_samples.py:352)
    proc = np.load(os.path.join(out_dir, "processing_time.npy"))
    speech = np.load(os.path.join(out_dir, "speech_duration.npy"))
    assert proc.shape == speech.shape == (3,)
    assert np.all(proc > 0) and np.all(speech > 0)

    summary = json.load(open(os.path.join(out_dir, "summary.json")))
    assert set(summary["per_speaker"]) == {"0", "1"}
    assert summary["rtf"] > 0

    # --- WER/CER hook on the driver's generated wavs (weak item #7) ---
    from unitspeech_tpu.eval.harness import evaluate_transcriptions

    texts = {"0": ["həloʊ wɜːld", "ɡʊd deɪ"], "1": ["həloʊ əɡɛn"]}
    pairs = []
    for spk, ts in texts.items():
        for i, txt in enumerate(ts):
            wav, sr = load_wav(os.path.join(out_dir, f"speaker_{spk}", f"sample_{i:04d}.wav"))
            pairs.append((wav, sr, txt))

    transcripts = iter([t for ts in texts.values() for t in ts])

    def perfect_asr(wav, sr):
        assert isinstance(wav, np.ndarray) and sr == 22050 and len(wav) > 0
        return next(transcripts)

    m = evaluate_transcriptions(pairs, perfect_asr)
    assert m["wer"] == 0.0 and m["cer"] == 0.0

    def broken_asr(wav, sr):
        return "blah"

    m2 = evaluate_transcriptions(pairs, broken_asr)
    assert m2["wer"] > 0.0 and m2["cer"] > 0.0
