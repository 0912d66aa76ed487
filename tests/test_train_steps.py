"""STEP1/STEP2 train steps + fine-tune loop on tiny configs, including a
data-parallel run over the 8-device virtual CPU mesh (SURVEY.md §2.5)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from unitspeech_tpu.models.diffusion import UnitSpeech
from unitspeech_tpu.models.duration import DurationPredictor
from unitspeech_tpu.models.encoder import Encoder
from unitspeech_tpu.parallel import make_mesh, replicate_tree, shard_batch
from unitspeech_tpu.train.finetune import finetune_decoder, prepare_finetune_inputs
from unitspeech_tpu.train.steps import (
    TrainState,
    make_step1_train_step,
    make_step2_train_step,
    random_replace_rows,
    step1_loss,
)

N_FEATS, DIM, SPK = 16, 8, 8


def _tiny_modules():
    text_encoder = Encoder(
        n_vocab=40, n_feats=N_FEATS, n_channels=16, filter_channels=32,
        n_heads=2, n_layers=1, kernel_size=3, p_dropout=0.1, window_size=4,
    )
    dp = DurationPredictor(in_channels=16, filter_channels=16, spk_emb_dim=SPK)
    decoder = UnitSpeech(n_feats=N_FEATS, dim=DIM, dim_mults=(1, 2), groups=4, spk_emb_dim=SPK)
    return text_encoder, dp, decoder


def _init_params(text_encoder, dp, decoder, key):
    k1, k2, k3 = jax.random.split(key, 3)
    tokens = jnp.zeros((1, 6), jnp.int32)
    te_params = text_encoder.init(k1, tokens, jnp.array([6]))
    dp_params = dp.init(
        k2, jnp.zeros((1, 6, 16)), jnp.ones((1, 6, 1)),
        g=jnp.zeros((1, SPK)), reverse=True,
    )
    dec_params = decoder.init(
        k3, jnp.zeros((1, 8, N_FEATS)), jnp.ones((1, 8)),
        jnp.zeros((1, 8, N_FEATS)), jnp.zeros((1,)), jnp.zeros((1, SPK)),
    )
    return {"text_encoder": te_params, "duration_predictor": dp_params, "decoder": dec_params}


def _batch(b=4, t_x=6, t_y=24):
    rng = np.random.default_rng(0)
    return {
        "tokens": jnp.asarray(rng.integers(1, 40, (b, t_x)), jnp.int32),
        "token_lengths": jnp.asarray(rng.integers(t_x - 2, t_x + 1, (b,))),
        "mel": jnp.asarray(rng.uniform(-1, 1, (b, t_y, N_FEATS)), jnp.float32),
        "mel_lengths": jnp.asarray(rng.integers(12, t_y + 1, (b,))),
        "spk_emb": jnp.asarray(rng.standard_normal((b, SPK)), jnp.float32),
    }


def test_random_replace_rows_exact_count():
    x = jnp.ones((8, 4))
    rep = jnp.zeros((4,))
    out = random_replace_rows(x, rep, 0.25, jax.random.PRNGKey(0))
    n_replaced = int((np.asarray(out).sum(axis=1) == 0).sum())
    assert n_replaced == 2  # floor(8 * 0.25)


def test_step1_train_step_updates_all_modules():
    te, dp, dec = _tiny_modules()
    params = _init_params(te, dp, dec, jax.random.PRNGKey(0))
    opt = optax.adam(1e-4)
    step = make_step1_train_step(
        te, dp, dec, opt, out_size=16,
        spk_uncond=jnp.zeros((SPK,)), spk_dropout=0.25,
    )
    state = TrainState(params, opt.init(params), jnp.array(0))
    # snapshot before the step: the jitted step donates its input state
    before = {
        mod: [np.asarray(x) for x in jax.tree_util.tree_leaves(params[mod])]
        for mod in params
    }
    state2, metrics = step(state, _batch(), jax.random.PRNGKey(1))
    for k in ("dur_loss", "prior_loss", "diff_loss", "total_loss"):
        assert np.isfinite(float(metrics[k])), k
    # every module's params moved
    for mod in ("text_encoder", "duration_predictor", "decoder"):
        after = jax.tree_util.tree_leaves(state2.params[mod])
        assert any(
            not np.allclose(a, np.asarray(b))
            for a, b in zip(before[mod], after)
        ), mod
    assert int(state2.step) == 1


def test_step2_train_step_freezes_decoder():
    _, _, dec = _tiny_modules()
    unit_encoder = Encoder(
        n_vocab=50, n_feats=N_FEATS, n_channels=16, filter_channels=32,
        n_heads=2, n_layers=1, kernel_size=3, p_dropout=0.1, window_size=4,
    )
    k = jax.random.PRNGKey(0)
    ue_params = unit_encoder.init(k, jnp.zeros((1, 5), jnp.int32), jnp.array([5]))
    dec_params = dec.init(
        k, jnp.zeros((1, 8, N_FEATS)), jnp.ones((1, 8)),
        jnp.zeros((1, 8, N_FEATS)), jnp.zeros((1,)), jnp.zeros((1, SPK)),
    )
    opt = optax.adam(1e-4)
    step = make_step2_train_step(unit_encoder, dec, opt, out_size=16)
    state = TrainState(ue_params, opt.init(ue_params), jnp.array(0))
    rng = np.random.default_rng(1)
    b, t_x, t_y = 2, 5, 24
    durations = np.zeros((b, t_x), np.float32)
    for i in range(b):
        d = rng.integers(1, 8, t_x)
        durations[i] = d
    batch = {
        "units": jnp.asarray(rng.integers(0, 50, (b, t_x)), jnp.int32),
        "unit_lengths": jnp.asarray([t_x, t_x]),
        "durations": jnp.asarray(durations),
        "mel": jnp.asarray(rng.uniform(-1, 1, (b, t_y, N_FEATS)), jnp.float32),
        "mel_lengths": jnp.asarray([t_y, 20]),
        "spk_emb": jnp.asarray(rng.standard_normal((b, SPK)), jnp.float32),
    }
    before = [np.asarray(x) for x in jax.tree_util.tree_leaves(ue_params)]
    state2, metrics = step(state, dec_params, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["total_loss"]))
    # unit encoder moved
    moved = any(
        not np.allclose(a, np.asarray(b_))
        for a, b_ in zip(before, jax.tree_util.tree_leaves(state2.params))
    )
    assert moved


def test_step1_data_parallel_on_virtual_mesh():
    """Same step jitted over an 8-device mesh with the batch sharded on
    `data`; parameters replicated; must produce finite scalar metrics."""
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    te, dp, dec = _tiny_modules()
    params = _init_params(te, dp, dec, jax.random.PRNGKey(0))
    opt = optax.adam(1e-4)
    step = make_step1_train_step(te, dp, dec, opt, out_size=16)
    params = replicate_tree(params, mesh)
    state = TrainState(params, opt.init(params), jnp.array(0))
    batch = _batch(b=8)
    batch = shard_batch(batch, mesh)
    state2, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total_loss"]))
    assert int(state2.step) == 1


def test_finetune_loop_reduces_loss():
    _, _, dec = _tiny_modules()
    k = jax.random.PRNGKey(0)
    dec_params = dec.init(
        k, jnp.zeros((1, 8, N_FEATS)), jnp.ones((1, 8)),
        jnp.zeros((1, 8, N_FEATS)), jnp.zeros((1,)), jnp.zeros((1, SPK)),
    )
    rng = np.random.default_rng(3)
    t_x, t_y = 4, 32
    cond_x = jnp.asarray(rng.standard_normal((1, t_x, N_FEATS)) * 0.1, jnp.float32)
    y = jnp.asarray(rng.uniform(-1, 1, (1, t_y, N_FEATS)), jnp.float32)
    attn = jnp.zeros((1, t_x, t_y))
    for i in range(t_x):
        attn = attn.at[0, i, i * 8 : (i + 1) * 8].set(1.0)
    spk = jnp.zeros((1, SPK))
    new_params, losses = finetune_decoder(
        dec.apply, dec_params, cond_x, y, jnp.array([t_y]), attn, spk,
        jax.random.PRNGKey(5), segment_size=16, n_iters=30, learning_rate=1e-3,
    )
    losses = np.asarray(losses)
    assert np.isfinite(losses).all()
    # adaptation must make progress on this single utterance
    assert losses[-10:].mean() < losses[:10].mean()


def test_prepare_finetune_inputs():
    unit_encoder = Encoder(
        n_vocab=50, n_feats=N_FEATS, n_channels=16, filter_channels=32,
        n_heads=2, n_layers=1, kernel_size=3, p_dropout=0.1, window_size=4,
    )
    k = jax.random.PRNGKey(0)
    ue_params = unit_encoder.init(k, jnp.zeros((1, 5), jnp.int32), jnp.array([5]))
    units = np.array([3, 7, 7, 2])
    durations = np.array([2, 3, 1, 4])
    mel = np.random.default_rng(0).uniform(-1, 1, (10, N_FEATS)).astype(np.float32)
    cond_x, y, y_lengths, attn = prepare_finetune_inputs(
        unit_encoder, ue_params, units, durations, mel, num_downsamplings=1
    )
    assert cond_x.shape == (1, 4, N_FEATS)
    assert y.shape[1] % 2 == 0 and y.shape[1] >= 10
    np.testing.assert_allclose(np.asarray(attn.sum(axis=(1, 2))), [10.0])
