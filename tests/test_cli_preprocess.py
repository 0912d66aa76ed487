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


def test_make_filelist_ljspeech_and_libritts(tmp_path):
    """make-filelist builds path|text|spk splits from both corpus layouts
    (reference ships fixed filelists, resources/filelists/*; conf/
    hydra_config.py:49-74 points training at them)."""
    from unitspeech_tpu.cli import main_make_filelist
    from unitspeech_tpu.data.dataset import parse_filelist

    # LJSpeech layout: metadata.csv + wavs/
    lj = tmp_path / "lj"
    (lj / "wavs").mkdir(parents=True)
    with open(lj / "metadata.csv", "w") as f:
        for i in range(8):
            f.write(f"LJ001-{i:04d}|raw {i}|normalized text {i}\n")
            (lj / "wavs" / f"LJ001-{i:04d}.wav").touch()
    out = tmp_path / "fl_lj"
    rc = main_make_filelist([
        "--corpus", "ljspeech", "--root", str(lj), "--out-dir", str(out),
        "--valid", "2", "--test", "2",
    ])
    assert rc == 0
    rows = {n: parse_filelist(str(out / f"{n}.txt"))
            for n in ("train", "valid", "test")}
    assert len(rows["train"]) == 4 and len(rows["valid"]) == 2
    assert len(rows["test"]) == 2
    path, text, spk = rows["train"][0]
    assert path.endswith(".wav") and text.startswith("normalized") and spk == "0"
    # deterministic given the seed
    rc = main_make_filelist([
        "--corpus", "ljspeech", "--root", str(lj),
        "--out-dir", str(tmp_path / "fl_lj2"), "--valid", "2", "--test", "2",
    ])
    assert (out / "train.txt").read_text() == (
        tmp_path / "fl_lj2" / "train.txt").read_text()

    # LibriTTS layout: ROOT/<speaker>/<chapter>/<utt>.wav + .normalized.txt
    lt = tmp_path / "libritts"
    for spk_name in ("19", "26"):
        d = lt / spk_name / "ch0"
        d.mkdir(parents=True)
        for i in range(3):
            (d / f"{spk_name}_ch0_{i}.wav").touch()
            (d / f"{spk_name}_ch0_{i}.normalized.txt").write_text(f"utt {i}")
    out2 = tmp_path / "fl_lt"
    rc = main_make_filelist([
        "--corpus", "libritts", "--root", str(lt), "--out-dir", str(out2),
        "--valid", "1", "--test", "1", "--speaker-ids",
    ])
    assert rc == 0
    all_rows = sum((parse_filelist(str(out2 / f"{n}.txt"))
                    for n in ("train", "valid", "test")), [])
    assert len(all_rows) == 6
    assert {r[2] for r in all_rows} == {"0", "1"}
