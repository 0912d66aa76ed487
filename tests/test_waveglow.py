"""WaveGlow vocoder + STFT denoiser: output-level parity vs the REAL
reference torch modules (/root/reference/unitspeech/textlesslib/textless/
vocoders/tacotron2/glow.py:178-299, stft.py:42-141, waveglow_denoiser.py:
32-67) with identical injected noise."""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from tests._reference import load_reference_tacotron  # noqa: E402
from unitspeech_tpu.models.waveglow import (  # noqa: E402
    WaveGlowConfig,
    WaveGlowDenoiser,
    convert_waveglow,
    stft_inverse,
    stft_transform,
    waveglow_infer,
    waveglow_test_config,
)

REF = load_reference_tacotron()
pytestmark = pytest.mark.skipif(REF is None, reason="reference not available")


def _make_pair(cfg: WaveGlowConfig, seed=0):
    torch.manual_seed(seed)
    wn_config = dict(n_layers=cfg.n_layers, n_channels=cfg.n_channels,
                     kernel_size=cfg.kernel_size)
    ref = REF.glow.WaveGlow(cfg.n_mel_channels, cfg.n_flows, cfg.n_group,
                            cfg.n_early_every, cfg.n_early_size, wn_config)
    # the reference hardcodes the 1024/256 upsampler (glow.py:183-185);
    # swap in the test-sized one so tiny configs run
    ref.upsample = torch.nn.ConvTranspose1d(
        cfg.n_mel_channels, cfg.n_mel_channels, cfg.upsample_kernel,
        stride=cfg.upsample_stride)
    ref = ref.eval()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = convert_waveglow(sd, cfg)
    return ref, params


def _replay_noise(seed, b, t_g, cfg: WaveGlowConfig):
    """Reproduce the reference infer's normal_() draw sequence (glow.py:
    260-296): one (B, n_remaining, T') init draw, then one (B, early, T')
    per early flow in reversed flow order."""
    chans = cfg.flow_channels()
    early_ks = [k for k in range(cfg.n_flows)
                if k % cfg.n_early_every == 0 and k > 0]
    torch.manual_seed(seed)
    draws = [torch.FloatTensor(b, chans[-1], t_g).normal_()]
    for _ in reversed(early_ks):
        draws.append(torch.FloatTensor(b, cfg.n_early_size, t_g).normal_())
    return [jnp.asarray(d.numpy().transpose(0, 2, 1)) for d in draws]


@pytest.mark.parametrize("sigma", [1.0, 0.666])
def test_waveglow_infer_parity(sigma):
    cfg = waveglow_test_config()
    ref, params = _make_pair(cfg)
    rng = np.random.default_rng(1)
    spect = rng.standard_normal((1, 11, cfg.n_mel_channels)).astype(np.float32)

    torch.manual_seed(7)
    with torch.inference_mode():
        want = ref.infer(torch.from_numpy(spect.transpose(0, 2, 1)),
                         sigma=sigma).numpy()

    t_g = want.shape[1] // cfg.n_group
    noise = _replay_noise(7, 1, t_g, cfg)
    got = np.asarray(waveglow_infer(params, cfg, jnp.asarray(spect),
                                    sigma=sigma, noise=noise))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_waveglow_weightnorm_fold_matches_removed():
    """Folding weight-norm at conversion equals the reference's
    remove_weightnorm path (glow.py:301-309)."""
    cfg = waveglow_test_config(n_flows=3)
    ref, params = _make_pair(cfg, seed=3)
    removed = REF.glow.WaveGlow.remove_weightnorm(ref)
    sd = {k: v.numpy() for k, v in removed.state_dict().items()}
    params2 = convert_waveglow(sd, cfg)

    rng = np.random.default_rng(2)
    spect = jnp.asarray(
        rng.standard_normal((1, 9, cfg.n_mel_channels)).astype(np.float32))
    a1 = np.asarray(waveglow_infer(params, cfg, spect, sigma=0.0))
    a2 = np.asarray(waveglow_infer(params2, cfg, spect, sigma=0.0))
    np.testing.assert_allclose(a1, a2, atol=1e-5, rtol=1e-5)


def test_stft_parity():
    """Framed-rfft STFT == the reference's conv-with-Fourier-basis STFT
    (stft.py:77-105), forward and inverse."""
    ref_stft = REF.stft.STFT(filter_length=64, hop_length=16, win_length=64)
    rng = np.random.default_rng(3)
    audio = rng.standard_normal((2, 512)).astype(np.float32)

    with torch.inference_mode():
        mag_r, phase_r = ref_stft.transform(torch.from_numpy(audio))
        inv_r = ref_stft.inverse(mag_r, phase_r).numpy()

    mag, phase = stft_transform(jnp.asarray(audio), 64, 16, 64)
    np.testing.assert_allclose(np.asarray(mag), mag_r.numpy(), atol=1e-4,
                               rtol=1e-4)
    # phases compare via the complex spectrum (atan2 branch cuts at mag~0)
    np.testing.assert_allclose(
        np.asarray(mag * jnp.exp(1j * phase)),
        (mag_r * torch.exp(1j * phase_r)).numpy(), atol=1e-4)

    inv = np.asarray(stft_inverse(mag, phase, 64, 16, 64))
    assert inv.shape == inv_r.reshape(2, -1).shape
    np.testing.assert_allclose(inv, inv_r.reshape(2, -1), atol=1e-4)


def test_denoiser_parity():
    """Full denoiser: bias spectrum from a sigma=0 run + STFT-domain
    subtraction (waveglow_denoiser.py:32-67). The reference hardcodes
    80-mel bias input, so the tiny config keeps n_mel=80."""
    cfg = waveglow_test_config(n_mel_channels=80, n_flows=3, n_channels=8)
    ref, params = _make_pair(cfg, seed=4)

    import importlib

    den_mod = importlib.import_module("_ref_taco.waveglow_denoiser")
    with torch.inference_mode():
        ref_den = den_mod.Denoiser(ref, filter_length=64, n_overlap=4,
                                   win_length=64)

    ours = WaveGlowDenoiser(params, cfg, n_fft=64, win_length=64)
    np.testing.assert_allclose(
        np.asarray(ours.bias_spec), ref_den.bias_spec.numpy(), atol=1e-4)

    rng = np.random.default_rng(5)
    audio = rng.standard_normal((1, 512)).astype(np.float32) * 0.3
    with torch.inference_mode():
        # replicate Denoiser.forward minus its unconditional .cuda() call
        # (waveglow_denoiser.py:63)
        mag_r, ang_r = ref_den.stft.transform(torch.from_numpy(audio))
        mag_r = torch.clamp(mag_r - ref_den.bias_spec * 0.1, 0.0)
        want = ref_den.stft.inverse(mag_r, ang_r).numpy()
    got = np.asarray(ours(jnp.asarray(audio), strength=0.1))
    np.testing.assert_allclose(got, want.reshape(1, -1), atol=2e-4)
