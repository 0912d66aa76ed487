"""Voice-conversion path tests (infer/vc.py).

Reference flow: /root/reference/scripts/voice_conversion.py:18-43 —
contentvec features -> contentvec encoder -> linear interpolation of the
conditioning to the source mel length -> reverse diffusion with dual CFG ->
denormalize. The SSL extractor itself is parity-tested in
test_hf_ssl_parity.py; these tests lock the conversion glue."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unitspeech_tpu.infer.vc import interpolate_linear, voice_conversion
from unitspeech_tpu.models.diffusion import UnitSpeech
from unitspeech_tpu.models.encoder import Encoder


def test_interpolate_linear_matches_torch():
    """Golden parity with torch F.interpolate(mode='linear',
    align_corners=False), the reference's resampling of the conditioning to
    the source mel length (voice_conversion.py:26-31)."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 13, 5)).astype(np.float32)
    for new_len in (7, 13, 29):
        want = (
            torch.nn.functional.interpolate(
                torch.from_numpy(x).transpose(1, 2), size=new_len,
                mode="linear", align_corners=False,
            )
            .transpose(1, 2)
            .numpy()
        )
        got = np.asarray(interpolate_linear(jnp.asarray(x), new_len))
        np.testing.assert_allclose(got, want, atol=2e-6, rtol=1e-5)


@pytest.fixture(scope="module")
def tiny_vc():
    n_feats, cv_dim, spk_dim = 16, 24, 8
    encoder = Encoder(
        n_vocab=40, n_feats=n_feats, n_channels=16, filter_channels=32,
        n_heads=2, n_layers=1, kernel_size=3, p_dropout=0.1, window_size=4,
        n_contentvec=cv_dim,
    )
    content0 = jnp.zeros((1, 6, cv_dim))
    enc_params = encoder.init(
        jax.random.PRNGKey(0), content0, jnp.array([6])
    )
    decoder = UnitSpeech(n_feats=n_feats, dim=8, dim_mults=(1, 2), groups=4,
                         spk_emb_dim=spk_dim)
    dec_params = decoder.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 8, n_feats)), jnp.ones((1, 8)),
        jnp.zeros((1, 8, n_feats)), jnp.zeros((1,)), jnp.zeros((1, spk_dim)),
    )
    return encoder, enc_params, decoder, dec_params, n_feats, cv_dim, spk_dim


def _convert(tiny_vc, sampler, mel_len=20, key=0, steps=3):
    encoder, enc_params, decoder, dec_params, n_feats, cv_dim, spk_dim = tiny_vc
    rng = np.random.default_rng(7)
    content = jnp.asarray(rng.standard_normal((1, 11, cv_dim)), jnp.float32)
    spk = jnp.asarray(rng.standard_normal((1, spk_dim)), jnp.float32)
    mel_min = jnp.full((n_feats,), -4.0)
    mel_max = jnp.full((n_feats,), 2.0)
    return voice_conversion(
        encoder, enc_params, decoder, dec_params, content, mel_len,
        spk, mel_min, mel_max, jax.random.PRNGKey(key),
        n_timesteps=steps, text_gradient_scale=1.0, spk_gradient_scale=1.0,
        num_downsamplings=1, sampler=sampler,
    )


def test_voice_conversion_shapes_and_determinism(tiny_vc):
    n_feats = tiny_vc[4]
    mel = np.asarray(_convert(tiny_vc, "ddpm"))
    assert mel.ndim == 3 and mel.shape[0] == 1 and mel.shape[2] == n_feats
    assert mel.shape[1] >= 20  # padded to a frame bucket >= mel_len
    assert np.isfinite(mel).all()
    mel2 = np.asarray(_convert(tiny_vc, "ddpm"))
    np.testing.assert_array_equal(mel, mel2)
    # different key -> different ancestral sample
    mel3 = np.asarray(_convert(tiny_vc, "ddpm", key=5))
    assert np.abs(mel3 - mel).max() > 1e-6


def test_voice_conversion_sampler_specs(tiny_vc):
    """The sampler spec grammar (dpm2 / ':cs<k>') rides the VC path like
    the TTS paths; ':cs1' is bit-identical to the bare spec."""
    mel_dpm2 = np.asarray(_convert(tiny_vc, "dpm2", steps=4))
    mel_cs1 = np.asarray(_convert(tiny_vc, "dpm2:cs1", steps=4))
    np.testing.assert_array_equal(mel_cs1, mel_dpm2)
    mel_cs2 = np.asarray(_convert(tiny_vc, "dpm2:cs2", steps=4))
    assert np.isfinite(mel_cs2).all() and mel_cs2.shape == mel_dpm2.shape
    with pytest.raises(ValueError):
        _convert(tiny_vc, "euler")
