"""End-to-end preprocessing CLI tests on a synthetic 2-file corpus: a dataset
can be built entirely from the shell, like the reference's runnable artifact
builders (/root/reference/preprocessing/*.py:15-58,63-100,22-48,34-44,31-51)."""

import json

import numpy as np
import pytest

from unitspeech_tpu.cli import (
    main_preprocess_mel_stats,
    main_preprocess_spk_embs,
    main_preprocess_uncond,
    main_preprocess_units,
)
from unitspeech_tpu.data.dataset import write_wav

N_FEATS, SPK = 16, 8


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("preprocess_cli")
    cfg = {
        "data": {"n_feats": N_FEATS},
        "spk_embedder": {
            "feat_type": "wavlm_test", "feat_dim": 16,
            "channels": 16, "spk_emb_dim": SPK,
        },
        "unit_extractor": {
            "dense_model_name": "hubert-test", "hubert_layer": 2,
            "vocab_size": 20,
        },
    }
    cfg_path = str(tmp / "config.json")
    json.dump(cfg, open(cfg_path, "w"))

    fl_path = str(tmp / "train.txt")
    with open(fl_path, "w") as f:
        for i in range(2):
            p = str(tmp / f"u{i}.wav")
            wav = (0.3 * np.sin(2 * np.pi * (160 + 60 * i)
                                * np.arange(11025) / 22050)).astype(np.float32)
            write_wav(p, wav, 22050)
            f.write(f"{p}|sentence {i}|{i}\n")
    return dict(tmp=tmp, cfg=cfg_path, filelist=fl_path)


def test_preprocess_mel_stats(corpus):
    out = str(corpus["tmp"] / "mel_stats.npz")
    rc = main_preprocess_mel_stats([
        "--config", corpus["cfg"], "--filelist", corpus["filelist"],
        "--out", out, "--cpu",
    ])
    assert rc == 0
    z = np.load(out)
    assert z["mel_min"].shape == (N_FEATS,) and z["mel_max"].shape == (N_FEATS,)
    assert np.all(z["mel_min"] <= z["mel_max"])
    assert np.all(np.isfinite(z["mel_min"])) and np.all(np.isfinite(z["mel_max"]))


def test_preprocess_spk_embs_and_uncond(corpus):
    import jax

    from unitspeech_tpu.config import load_json
    from unitspeech_tpu.models.speaker import SpeakerEmbedder
    from unitspeech_tpu.utils.checkpoint import save_checkpoint

    cfg = load_json(corpus["cfg"])
    model = SpeakerEmbedder.from_config(cfg.spk_embedder)
    variables = model.init(
        jax.random.PRNGKey(0), np.zeros((1, 1600), np.float32)
    )
    ckpt = save_checkpoint(str(corpus["tmp"] / "spk_ckpt"), 0, variables)

    out = str(corpus["tmp"] / "spk_embs.npz")
    rc = main_preprocess_spk_embs([
        "--config", corpus["cfg"], "--filelist", corpus["filelist"],
        "--speaker-embedder", ckpt, "--out", out, "--cpu",
    ])
    assert rc == 0
    z = np.load(out)
    assert sorted(z.files) == ["0", "1"]
    assert z["0"].shape == (SPK,) and np.all(np.isfinite(z["0"]))

    # uncond depends on mel stats + speaker embs
    mel_stats = str(corpus["tmp"] / "mel_stats.npz")
    main_preprocess_mel_stats([
        "--config", corpus["cfg"], "--filelist", corpus["filelist"],
        "--out", mel_stats, "--cpu",
    ])
    uncond = str(corpus["tmp"] / "uncond_stats.npz")
    rc = main_preprocess_uncond([
        "--config", corpus["cfg"], "--filelist", corpus["filelist"],
        "--mel-stats", mel_stats, "--spk-embs", out, "--out", uncond, "--cpu",
    ])
    assert rc == 0
    u = np.load(uncond)
    assert u["text_uncond"].shape == (N_FEATS,)
    assert u["spk_uncond"].shape == (SPK,)
    # normalized mel lives in [-1, 1] so its mean frame must too
    assert np.all(u["text_uncond"] >= -1.0) and np.all(u["text_uncond"] <= 1.0)
    np.testing.assert_allclose(
        u["spk_uncond"], (z["0"] + z["1"]) / 2.0, rtol=1e-5, atol=1e-6
    )


def test_preprocess_units(corpus):
    import jax

    from unitspeech_tpu.config import load_json
    from unitspeech_tpu.models.ssl.hubert import HubertModel, hubert_config_by_name
    from unitspeech_tpu.models.ssl.kmeans import KMeansQuantizer
    from unitspeech_tpu.utils.checkpoint import save_checkpoint

    cfg = load_json(corpus["cfg"])
    model = HubertModel(hubert_config_by_name("hubert-test"))
    variables = model.init(
        jax.random.PRNGKey(1), np.zeros((1, 1600), np.float32)
    )
    ckpt = save_checkpoint(str(corpus["tmp"] / "hubert_ckpt"), 0, variables)

    rng = np.random.default_rng(2)
    km_path = str(corpus["tmp"] / "kmeans.npz")
    KMeansQuantizer(rng.standard_normal((20, 16)).astype(np.float32)).save(km_path)

    rc = main_preprocess_units([
        "--config", corpus["cfg"], "--filelist", corpus["filelist"],
        "--hubert", ckpt, "--kmeans", km_path, "--cpu",
    ])
    assert rc == 0
    for i in range(2):
        side = np.load(str(corpus["tmp"] / f"u{i}.units.npz"))
        units, durations = side["units"], side["durations"]
        assert units.shape == durations.shape and units.size > 0
        assert units.min() >= 0 and units.max() < 20
        # deduplicated: no consecutive repeats
        assert np.all(units[1:] != units[:-1])
