"""train-vocoder CLI e2e on a tiny synthetic corpus (CPU)."""

import json
import os

import numpy as np


def test_train_vocoder_cli(tmp_path, capsys):
    from unitspeech_tpu.data.dataset import write_wav

    sr = 22050
    rng = np.random.default_rng(0)
    lines = []
    for i in range(3):
        p = tmp_path / f"w{i}.wav"
        write_wav(str(p), rng.uniform(-0.3, 0.3, 3000).astype(np.float32), sr)
        lines.append(f"{p}|x|0")
    fl = tmp_path / "train.txt"
    fl.write_text("\n".join(lines))

    cfg = {
        "data": {"n_feats": 16, "n_fft": 64, "hop_length": 16,
                 "win_length": 64, "mel_fmax": 8000.0},
        "vocoder": {
            "num_mels": 16, "upsample_rates": [4, 4],
            "upsample_kernel_sizes": [8, 8], "upsample_initial_channel": 16,
            "resblock_kernel_sizes": [3], "resblock_dilation_sizes": [[1, 3]],
        },
    }
    cfgp = tmp_path / "cfg.json"
    cfgp.write_text(json.dumps(cfg))

    from unitspeech_tpu.train import vocoder_loop
    # tiny discriminators (the defaults need longer segments than the test's)
    from unitspeech_tpu.models.discriminators import (
        MultiPeriodDiscriminator,
        MultiResolutionDiscriminator,
    )
    orig = vocoder_loop.train_vocoder

    def patched(cfg_, wavs, tcfg, **kw):
        return orig(
            cfg_, wavs, tcfg,
            mpd=MultiPeriodDiscriminator(periods=(2,), channel_mult=0.125),
            mrd=MultiResolutionDiscriminator(
                resolutions=((64, 16, 32),), channel_mult=0.25),
            **kw,
        )

    vocoder_loop.train_vocoder = patched
    try:
        import unitspeech_tpu.cli as cli
        # reload-free: cli imports train_vocoder lazily inside the command
        ckdir = tmp_path / "ck"
        rc = cli.main([
            "train-vocoder", "--cpu", "--config", str(cfgp),
            "--filelist", str(fl), "--steps", "2", "--batch-size", "2",
            "--segment-size", "256", "--checkpoint-dir", str(ckdir),
            "--save-every", "2", "--log-dir", str(tmp_path / "logs"),
        ])
    finally:
        vocoder_loop.train_vocoder = orig
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    metrics = json.loads(out)["final_metrics"]
    assert np.isfinite(metrics["gen_loss"]) and np.isfinite(metrics["disc_loss"])
    assert os.listdir(ckdir), "checkpoint written"

    # resume restores step and continues without error
    vocoder_loop.train_vocoder = patched
    try:
        rc = cli.main([
            "train-vocoder", "--cpu", "--config", str(cfgp),
            "--filelist", str(fl), "--steps", "3", "--batch-size", "2",
            "--segment-size", "256", "--checkpoint-dir", str(ckdir),
            "--save-every", "5", "--resume",
        ])
    finally:
        vocoder_loop.train_vocoder = orig
    assert rc == 0
