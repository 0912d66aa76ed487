"""End-to-end training CLI tests: one epoch of train-step1 and train-step2 on
a tiny synthetic dataset (the reference train_STEP1/train_STEP2 user paths)."""

import json
import os

import numpy as np
import pytest

from unitspeech_tpu.cli import main_train_step1, main_train_step2
from unitspeech_tpu.data.dataset import write_wav
from unitspeech_tpu.utils.checkpoint import latest_checkpoint

N_FEATS, SPK = 16, 8


@pytest.fixture(scope="module")
def train_env(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("train_cli")
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
        "train": {
            "batch_size": 2, "use_bf16": False, "save_every": 1,
            "out_size_second": 1,
        },
    }
    cfg_path = str(tmp / "config.json")
    json.dump(cfg, open(cfg_path, "w"))

    rng = np.random.default_rng(0)
    fl_path = str(tmp / "train.txt")
    with open(fl_path, "w") as f:
        for i in range(4):
            p = str(tmp / f"u{i}.wav")
            wav = (0.2 * np.sin(2 * np.pi * (180 + 30 * i)
                                * np.arange(22050) / 22050)).astype(np.float32)
            write_wav(p, wav, 22050)
            units = rng.integers(0, 50, 20)
            durations = rng.integers(2, 6, 20).astype(np.float32)
            np.savez(str(tmp / f"u{i}.units.npz"), units=units, durations=durations)
            f.write(f"{p}|həloʊ wɜːld {i}|{i % 2}\n")

    np.savez(str(tmp / "spk.npz"),
             **{str(s): rng.standard_normal(SPK).astype(np.float32) for s in (0, 1)})
    np.savez(str(tmp / "mel_stats.npz"),
             mel_min=np.full(N_FEATS, -12.0, np.float32),
             mel_max=np.full(N_FEATS, 3.0, np.float32))
    np.savez(str(tmp / "uncond.npz"),
             text_uncond=np.zeros(N_FEATS, np.float32),
             spk_uncond=rng.standard_normal(SPK).astype(np.float32))
    return dict(tmp=tmp, cfg=cfg_path, filelist=fl_path)


def test_train_step1_cli_one_epoch(train_env):
    e = train_env
    ckpt_dir = str(e["tmp"] / "ckpt1")
    rc = main_train_step1([
        "--config", e["cfg"], "--filelist", e["filelist"],
        "--spk-embs", str(e["tmp"] / "spk.npz"),
        "--mel-stats", str(e["tmp"] / "mel_stats.npz"),
        "--uncond-stats", str(e["tmp"] / "uncond.npz"),
        "--log-dir", str(e["tmp"] / "logs1"), "--checkpoint-dir", ckpt_dir,
        "--n-epochs", "1", "--cpu",
    ])
    assert rc == 0
    assert latest_checkpoint(ckpt_dir) is not None
    assert os.path.exists(str(e["tmp"] / "logs1" / "train.log"))


def test_train_step2_cli_one_epoch(train_env):
    e = train_env
    # frozen decoder bundle from the step1 components
    import jax
    import jax.numpy as jnp

    from unitspeech_tpu.config import load_json
    from unitspeech_tpu.models.diffusion import UnitSpeech
    from unitspeech_tpu.utils import artifacts

    cfg = load_json(e["cfg"])
    dec = UnitSpeech.from_config(cfg.decoder)
    dec_params = dec.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, N_FEATS)), jnp.ones((1, 8)),
        jnp.zeros((1, 8, N_FEATS)), jnp.zeros((1,)), jnp.zeros((1, SPK)),
    )
    dec_path = artifacts.save_decoder_bundle(
        str(e["tmp"] / "dec"), 0,
        artifacts.DecoderBundle(
            params=dec_params, spk_emb=None,
            mel_min=np.full(N_FEATS, -12.0, np.float32),
            mel_max=np.full(N_FEATS, 3.0, np.float32),
        ),
    )
    ckpt_dir = str(e["tmp"] / "ckpt2")
    rc = main_train_step2([
        "--config", e["cfg"], "--filelist", e["filelist"],
        "--spk-embs", str(e["tmp"] / "spk.npz"),
        "--mel-stats", str(e["tmp"] / "mel_stats.npz"),
        "--decoder", dec_path,
        "--log-dir", str(e["tmp"] / "logs2"), "--checkpoint-dir", ckpt_dir,
        "--n-epochs", "1", "--cpu",
    ])
    assert rc == 0
    assert latest_checkpoint(ckpt_dir) is not None
