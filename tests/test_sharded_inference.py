"""Sequence-sharded and batched inference over the virtual 8-device mesh
(SURVEY.md §5: frame-axis context sharding as a config choice)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from unitspeech_tpu.models.diffusion import UnitSpeech, reverse_diffusion
from unitspeech_tpu.parallel import make_mesh

TINY = dict(n_feats=16, dim=8, dim_mults=(1, 2), groups=4, spk_emb_dim=8)


def _model_and_inputs(b=1, t=64):
    model = UnitSpeech(**TINY)
    f = TINY["n_feats"]
    xt = jnp.zeros((b, t, f))
    mask = jnp.ones((b, t))
    cond = jnp.asarray(np.random.default_rng(0).standard_normal((b, t, f)) * 0.1, jnp.float32)
    spk = jnp.zeros((b, TINY["spk_emb_dim"]))
    params = model.init(jax.random.PRNGKey(0), xt, mask, cond, jnp.zeros((b,)), spk)
    z = jax.random.normal(jax.random.PRNGKey(5), (b, t, f))
    return model, params, z, mask, cond, spk


def test_seq_sharded_sampler_matches_unsharded():
    assert len(jax.devices()) == 8
    mesh = make_mesh(data=1, seq=8)
    model, params, z, mask, cond, spk = _model_and_inputs(t=64)
    key = jax.random.PRNGKey(7)
    base = reverse_diffusion(
        model.apply, params, z, mask, cond, spk, key, n_timesteps=3,
        text_gradient_scale=1.0, spk_gradient_scale=1.0,
    )
    sharded = reverse_diffusion(
        model.apply, params, z, mask, cond, spk, key, n_timesteps=3,
        text_gradient_scale=1.0, spk_gradient_scale=1.0,
        mesh=mesh, sample_spec=P(None, "seq", None),
    )
    np.testing.assert_allclose(
        np.asarray(base), np.asarray(sharded), rtol=2e-3, atol=2e-4
    )


def test_seq_sharded_ode_sampler_matches_unsharded():
    """The DPM-Solver++(2M) fast mode must shard over `seq` exactly like the
    DDPM sampler (the solver is deterministic, so the sharded/unsharded
    comparison is pure-numerics, no noise alignment needed)."""
    from unitspeech_tpu.models.diffusion import reverse_diffusion_ode

    assert len(jax.devices()) == 8
    mesh = make_mesh(data=1, seq=8)
    model, params, z, mask, cond, spk = _model_and_inputs(t=64)
    base = reverse_diffusion_ode(
        model.apply, params, z, mask, cond, spk, n_timesteps=4,
        text_gradient_scale=1.0, spk_gradient_scale=1.0,
    )
    sharded = reverse_diffusion_ode(
        model.apply, params, z, mask, cond, spk, n_timesteps=4,
        text_gradient_scale=1.0, spk_gradient_scale=1.0,
        mesh=mesh, sample_spec=P(None, "seq", None),
    )
    np.testing.assert_allclose(
        np.asarray(base), np.asarray(sharded), rtol=2e-3, atol=2e-4
    )


def test_data_sharded_sampler_runs():
    mesh = make_mesh()  # all 8 on data
    model, params, z, mask, cond, spk = _model_and_inputs(b=8, t=16)
    out = reverse_diffusion(
        model.apply, params, z, mask, cond, spk, jax.random.PRNGKey(0),
        n_timesteps=2, mesh=mesh, sample_spec=P("data", None, None),
    )
    assert out.shape == (8, 16, TINY["n_feats"])
    assert np.isfinite(np.asarray(out)).all()


def test_synthesize_batch():
    from unitspeech_tpu.config import (
        DataConfig, DecoderConfig, DurationPredictorConfig, EncoderConfig,
        MainConfig, VocoderConfig,
    )
    from unitspeech_tpu.infer.tts import Synthesizer, TTSModels

    cfg = MainConfig(
        data=DataConfig(n_feats=16, hop_length=4),
        text_encoder=EncoderConfig(n_vocab=40, n_feats=16, n_channels=16,
                                   filter_channels=32, n_layers=1, n_heads=2),
        duration_predictor=DurationPredictorConfig(in_channels=16, filter_channels=16, spk_emb_dim=8),
        decoder=DecoderConfig(n_feats=16, dim=8, dim_mults=(1, 2), groups=4, spk_emb_dim=8),
        vocoder=VocoderConfig(num_mels=16, upsample_rates=(2, 2),
                              upsample_kernel_sizes=(4, 4), upsample_initial_channel=16,
                              resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),)),
    )
    synth = Synthesizer(TTSModels.random_init(cfg, jax.random.PRNGKey(0)))
    seqs = [[1, 5, 9], [2, 4, 6, 8, 10], [3, 7]]
    outs = synth.synthesize_batch(
        seqs, jax.random.PRNGKey(1), diffusion_steps=2,
        text_gradient_scale=1.0, spk_gradient_scale=1.0,
    )
    assert len(outs) == 3
    lens = [len(w) for w, _sr in outs]
    assert all(l > 0 and l % 4 == 0 for l in lens)
    # longer token sequence should synthesize at least as many samples as the
    # shortest (durations are random-weight but positive)
    assert max(lens) > 0


def test_batched_synthesis_with_data_seq_sharding():
    """Batched guided synthesis through a (data=2, seq=4) mesh matches the
    unsharded pipeline end to end (through the vocoder)."""
    from jax.sharding import PartitionSpec as P

    from unitspeech_tpu.config import (
        DataConfig, DecoderConfig, DurationPredictorConfig, EncoderConfig,
        MainConfig, VocoderConfig,
    )
    from unitspeech_tpu.infer.tts import Synthesizer, TTSModels

    cfg = MainConfig(
        data=DataConfig(n_feats=16, hop_length=4),
        text_encoder=EncoderConfig(n_vocab=40, n_feats=16, n_channels=16,
                                   filter_channels=32, n_layers=1, n_heads=2),
        duration_predictor=DurationPredictorConfig(in_channels=16, filter_channels=16, spk_emb_dim=8),
        decoder=DecoderConfig(n_feats=16, dim=8, dim_mults=(1, 2), groups=4, spk_emb_dim=8),
        vocoder=VocoderConfig(num_mels=16, upsample_rates=(2, 2),
                              upsample_kernel_sizes=(4, 4), upsample_initial_channel=16,
                              resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),)),
    )
    models = TTSModels.random_init(cfg, jax.random.PRNGKey(0))
    mesh = make_mesh(data=2, seq=4)
    plain = Synthesizer(models)
    sharded = Synthesizer(models, mesh=mesh, sample_spec=P("data", "seq", None))
    seqs = [[1, 5, 9], [2, 4, 6, 8]]
    a = plain.synthesize_batch(seqs, jax.random.PRNGKey(1), diffusion_steps=2,
                               text_gradient_scale=1.0, spk_gradient_scale=1.0)
    b = sharded.synthesize_batch(seqs, jax.random.PRNGKey(1), diffusion_steps=2,
                                 text_gradient_scale=1.0, spk_gradient_scale=1.0)
    for (wa, _), (wb, _) in zip(a, b):
        np.testing.assert_allclose(wa, wb, atol=2e-2)
