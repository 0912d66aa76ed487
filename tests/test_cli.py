"""End-to-end CLI tests: finetune -> inference round trip on tiny configs
with native checkpoints (the reference's finetune.py -> inference.py flow,
SURVEY.md §3.1-3.2)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unitspeech_tpu.cli import main_finetune, main_inference, main_serve
from unitspeech_tpu.config import (
    DataConfig,
    DecoderConfig,
    DurationPredictorConfig,
    EncoderConfig,
    MainConfig,
    VocoderConfig,
)
from unitspeech_tpu.data.dataset import load_wav, write_wav
from unitspeech_tpu.models.diffusion import UnitSpeech
from unitspeech_tpu.models.duration import DurationPredictor
from unitspeech_tpu.models.encoder import Encoder
from unitspeech_tpu.models.vocoder import BigVGAN
from unitspeech_tpu.utils import artifacts
from unitspeech_tpu.utils.checkpoint import save_checkpoint

N_FEATS, SPK = 16, 8


def _tiny_cfg_json(tmp_path):
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
        "finetune": {"n_iters": 3},
        "train": {"out_size_second": 2},
    }
    path = str(tmp_path / "config.json")
    with open(path, "w") as f:
        json.dump(cfg, f)
    return path


@pytest.fixture(scope="module")
def tiny_artifacts(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    cfg_path = _tiny_cfg_json(tmp)
    from unitspeech_tpu.config import load_json

    cfg = load_json(cfg_path)
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)

    te = Encoder.from_config(cfg.text_encoder)
    te_params = te.init(k1, jnp.zeros((1, 8), jnp.int32), jnp.array([8]))
    te_path = save_checkpoint(str(tmp / "text_encoder"), 0, te_params)

    ue = Encoder.from_config(cfg.unit_encoder)
    ue_params = ue.init(k2, jnp.zeros((1, 8), jnp.int32), jnp.array([8]))
    ue_path = save_checkpoint(str(tmp / "unit_encoder"), 0, ue_params)

    dp = DurationPredictor(in_channels=16, filter_channels=16, spk_emb_dim=SPK)
    dp_params = dp.init(
        k3, jnp.zeros((1, 8, 16)), jnp.ones((1, 8, 1)),
        g=jnp.zeros((1, SPK)), reverse=True,
    )
    dp_path = save_checkpoint(str(tmp / "duration_predictor"), 0, dp_params)

    dec = UnitSpeech.from_config(cfg.decoder)
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

    voc = BigVGAN.from_config(cfg.vocoder)
    voc_params = voc.init(k5, jnp.zeros((1, 8, N_FEATS)))
    voc_path = save_checkpoint(str(tmp / "vocoder"), 0, voc_params)

    # reference wav (1 s sine at 22.05 kHz) + units sidecar + spk emb
    t = np.arange(22050) / 22050
    wav = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    ref_path = str(tmp / "reference.wav")
    write_wav(ref_path, wav, 22050)
    rng = np.random.default_rng(1)
    units = rng.integers(0, 50, 40)
    durations = rng.integers(1, 3, 40)
    units_path = str(tmp / "ref_units.npz")
    np.savez(units_path, units=units, durations=durations)
    spk_path = str(tmp / "spk.npy")
    np.save(spk_path, spk_emb)

    return dict(
        tmp=tmp, cfg=cfg_path, te=te_path, ue=ue_path, dp=dp_path,
        dec=dec_path, voc=voc_path, ref=ref_path, units=units_path,
        spk=spk_path,
    )


def test_cli_finetune_then_inference(tiny_artifacts):
    a = tiny_artifacts
    out_dir = str(a["tmp"] / "finetuned")
    rc = main_finetune([
        "--config", a["cfg"], "--reference", a["ref"], "--decoder", a["dec"],
        "--unit-encoder", a["ue"], "--output-dir", out_dir,
        "--spk-emb", a["spk"], "--units", a["units"], "--n-iters", "3",
        "--fp32",
    ])
    assert rc == 0
    finetuned = os.path.join(out_dir, "step_3")
    assert os.path.isdir(finetuned)

    out_wav = str(a["tmp"] / "out.wav")
    rc = main_inference([
        "--config", a["cfg"], "--text", "həloʊ wɜːld", "--ipa",
        "--decoder", finetuned, "--text-encoder", a["te"],
        "--duration-predictor", a["dp"], "--vocoder", a["voc"],
        "--output", out_wav, "--diffusion-steps", "2",
        "--text-gradient-scale", "0", "--spk-gradient-scale", "0",
        "--fp32",
    ])
    assert rc == 0
    wav, sr = load_wav(out_wav)
    assert sr == 22050
    assert len(wav) > 0
    assert np.abs(wav).max() <= 1.0


def test_cli_serve_dry_run(tiny_artifacts, capsys):
    """`serve --dry-run` must load the checkpoints, build the batcher,
    precompile the serving grid, and report the serving config."""
    a = tiny_artifacts
    rc = main_serve([
        "--config", a["cfg"], "--decoder", a["dec"],
        "--text-encoder", a["te"], "--duration-predictor", a["dp"],
        "--vocoder", a["voc"], "--spk-emb", a["spk"],
        "--switch-buckets", "32,64", "--max-batch", "2",
        "--warmup-token-lengths", "12", "--diffusion-steps", "2",
        "--text-gradient-scale", "0", "--spk-gradient-scale", "0",
        "--fp32", "--dry-run",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["warmed"] is True
    assert out["serving_config"]["switch_buckets"] == [32, 64]
    assert out["serving_config"]["batch_ladder"] == [1, 2]
    assert out["serving_config"]["default_steps"] == 2


def test_cli_inference_split_sentences(tiny_artifacts):
    """Long-text mode: sentence chunks synthesized separately (one dispatch
    each) and concatenated; raw text through the G2P fallback."""
    a = tiny_artifacts
    out_wav = str(a["tmp"] / "long.wav")
    rc = main_inference([
        "--config", a["cfg"], "--text", "Hello there. Hello again!",
        "--split-sentences",
        "--decoder", a["dec"], "--text-encoder", a["te"],
        "--duration-predictor", a["dp"], "--vocoder", a["voc"],
        "--output", out_wav, "--diffusion-steps", "2",
        "--text-gradient-scale", "0", "--spk-gradient-scale", "0",
        "--fp32",
    ])
    assert rc == 0
    long_wav, sr = load_wav(out_wav)
    assert sr == 22050 and len(long_wav) > 0

    # single-chunk synthesis of just the first sentence must be shorter
    out_one = str(a["tmp"] / "one.wav")
    rc = main_inference([
        "--config", a["cfg"], "--text", "Hello there.",
        "--decoder", a["dec"], "--text-encoder", a["te"],
        "--duration-predictor", a["dp"], "--vocoder", a["voc"],
        "--output", out_one, "--diffusion-steps", "2",
        "--text-gradient-scale", "0", "--spk-gradient-scale", "0",
        "--fp32",
    ])
    assert rc == 0
    one_wav, _ = load_wav(out_one)
    assert len(long_wav) > len(one_wav)


def test_warmup_adapt_artifact_replays_in_finetune(tmp_path, monkeypatch, capsys):
    """REGRESSION (r5 review finding): warmup-adapt must warm the EXACT
    finetune program main_finetune replays — at a config where
    unit_encoder.n_channels != n_feats (24 vs 16), the old warmup traced
    cond width n_channels and crashed (the real cond_x is the encoder's
    mu_x, width n_feats). Done = finetune reports aot_hit=True after
    warmup in a fresh AOT cache."""
    import json as _json

    from unitspeech_tpu.cli import main_finetune, main_warmup_adapt
    from unitspeech_tpu.config import load_json
    from unitspeech_tpu.models.diffusion import UnitSpeech
    from unitspeech_tpu.models.encoder import Encoder
    from unitspeech_tpu.utils import artifacts
    from unitspeech_tpu.utils.checkpoint import save_checkpoint

    monkeypatch.setenv("UNITSPEECH_AOT_CACHE", str(tmp_path / "aot"))

    cfg_d = {
        "data": {"n_feats": N_FEATS},
        "unit_encoder": {
            "n_vocab": 50, "n_feats": N_FEATS, "n_channels": 24,
            "filter_channels": 32, "n_layers": 1, "n_heads": 2,
        },
        "decoder": {
            "n_feats": N_FEATS, "dim": 8, "dim_mults": [1, 2], "groups": 4,
            "spk_emb_dim": SPK,
        },
        "finetune": {"n_iters": 3},
    }
    cfg_path = str(tmp_path / "config.json")
    with open(cfg_path, "w") as f:
        _json.dump(cfg_d, f)
    cfg = load_json(cfg_path)

    ue = Encoder.from_config(cfg.unit_encoder)
    ue_params = ue.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
                        jnp.array([8]))
    ue_path = save_checkpoint(str(tmp_path / "ue"), 0, ue_params)
    dec = UnitSpeech.from_config(cfg.decoder)
    dec_params = dec.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 8, N_FEATS)), jnp.ones((1, 8)),
        jnp.zeros((1, 8, N_FEATS)), jnp.zeros((1,)), jnp.zeros((1, SPK)),
    )
    spk_emb = np.random.default_rng(0).standard_normal((1, SPK)).astype(np.float32)
    dec_path = artifacts.save_decoder_bundle(
        str(tmp_path / "dec"), 0,
        artifacts.DecoderBundle(
            params=dec_params, spk_emb=spk_emb,
            mel_min=np.full((N_FEATS,), -12.0, np.float32),
            mel_max=np.full((N_FEATS,), 3.0, np.float32),
        ),
    )
    t = np.arange(22050) / 22050
    ref_path = str(tmp_path / "ref.wav")
    write_wav(ref_path, (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32),
              22050)
    rng = np.random.default_rng(1)
    units_path = str(tmp_path / "units.npz")
    np.savez(units_path, units=rng.integers(0, 50, 40),
             durations=rng.integers(1, 3, 40))
    spk_path = str(tmp_path / "spk.npy")
    np.save(spk_path, spk_emb)

    rc = main_warmup_adapt([
        "--config", cfg_path, "--frame-buckets", "96", "--n-iters", "3",
        "--no-ssl", "--fp32", "--cpu",
    ])
    assert rc == 0
    capsys.readouterr()

    rc = main_finetune([
        "--config", cfg_path, "--reference", ref_path, "--decoder", dec_path,
        "--unit-encoder", ue_path, "--output-dir", str(tmp_path / "out"),
        "--spk-emb", spk_path, "--units", units_path, "--n-iters", "3",
        "--fp32", "--frame-buckets", "96",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "aot_hit=True" in out, out
