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


def test_finetune_batched_matches_sequential_on_mesh():
    """finetune_decoder_batched: per-speaker adaptation sharded speaker-per-
    chip over the data mesh must match running finetune_decoder per speaker
    sequentially (same params, data, keys)."""
    from unitspeech_tpu.train.finetune import finetune_decoder_batched

    assert len(jax.devices()) == 8
    mesh = make_mesh()  # all 8 devices on `data`
    _, _, dec = _tiny_modules()
    k = jax.random.PRNGKey(0)
    dec_params = dec.init(
        k, jnp.zeros((1, 8, N_FEATS)), jnp.ones((1, 8)),
        jnp.zeros((1, 8, N_FEATS)), jnp.zeros((1,)), jnp.zeros((1, SPK)),
    )
    rng = np.random.default_rng(9)
    s, t_x, t_y, seg, iters = 8, 4, 16, 8, 3
    cond_x = jnp.asarray(rng.standard_normal((s, 1, t_x, N_FEATS)) * 0.1, jnp.float32)
    y = jnp.asarray(rng.uniform(-1, 1, (s, 1, t_y, N_FEATS)), jnp.float32)
    attn = jnp.broadcast_to(
        jnp.repeat(jnp.eye(t_x), t_y // t_x, axis=1)[None, None],
        (s, 1, t_x, t_y),
    ).astype(jnp.float32)
    y_lengths = jnp.full((s, 1), t_y)
    spk = jnp.asarray(rng.standard_normal((s, 1, SPK)) * 0.1, jnp.float32)
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(s))
    stacked = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (s,) + x.shape), dec_params
    )

    batched_params, batched_losses = finetune_decoder_batched(
        dec.apply, stacked, cond_x, y, y_lengths, attn, spk, keys,
        mesh=mesh, segment_size=seg, n_iters=iters, learning_rate=1e-3,
    )
    assert batched_losses.shape == (s, iters)

    for i in (0, 3, 7):  # spot-check speakers against the sequential API
        p_i, l_i = finetune_decoder(
            # finetune_decoder DONATES its params buffer — pass a copy
            dec.apply, jax.tree_util.tree_map(jnp.copy, dec_params),
            cond_x[i], y[i], y_lengths[i], attn[i],
            spk[i], keys[i], segment_size=seg, n_iters=iters,
            learning_rate=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(batched_losses[i]), np.asarray(l_i), rtol=1e-5, atol=1e-6
        )
        a = jax.tree_util.tree_leaves(p_i)
        b = jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(lambda x: x[i], batched_params)
        )
        for x, z in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(z), rtol=1e-5, atol=1e-6)

    # speaker count must divide the mesh data axis
    import pytest as _pytest
    with _pytest.raises(ValueError):
        finetune_decoder_batched(
            dec.apply,
            jax.tree_util.tree_map(lambda x: x[:5], stacked),
            cond_x[:5], y[:5], y_lengths[:5], attn[:5], spk[:5], keys[:5],
            mesh=mesh, segment_size=seg, n_iters=iters,
        )


def test_bucketed_mel_prefix_exact():
    """reflect_extend + trim must reproduce the exact-length mel BIT-for-bit
    (ops/mel.reflect_extend: the first (n_fft-hop)/2 appended samples equal
    mel_spectrogram's internal right reflect pad)."""
    import numpy as np

    from unitspeech_tpu.ops.mel import (
        mel_spectrogram,
        mel_true_frames,
        reflect_extend,
    )

    rng = np.random.default_rng(0)
    for n in (5000, 7777, 16384):
        wav = rng.standard_normal(n).astype(np.float32) * 0.2
        kw = dict(n_fft=512, num_mels=16, sampling_rate=8000, hop_size=128,
                  win_size=512, fmin=0.0, fmax=4000.0)
        exact = np.asarray(mel_spectrogram(wav[None], **kw))[0]
        t_true = mel_true_frames(n, 512, 128)
        assert exact.shape[0] == t_true
        bucket = ((t_true + 63) // 64 + 1) * 64
        ext = reflect_extend(wav, bucket * 128)
        assert ext.shape[0] == bucket * 128
        np.testing.assert_array_equal(ext[:n], wav)
        bucketed = np.asarray(mel_spectrogram(ext[None], **kw))[0]
        assert bucketed.shape[0] == bucket
        np.testing.assert_array_equal(bucketed[:t_true], exact)


def test_finetune_bucketed_matches_exact():
    """prepare_finetune_inputs(pad_to=...) + finetune_decoder must reproduce
    the exact-shape run's losses and adapted params (the warm-session bucket
    ladder is numerics-neutral: encoder masks padded tokens, segment crops
    stay within y_lengths)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from unitspeech_tpu.models.diffusion import UnitSpeech
    from unitspeech_tpu.models.encoder import Encoder
    from unitspeech_tpu.train.finetune import (
        finetune_decoder,
        prepare_finetune_inputs,
    )

    n_feats, spk_dim = 16, 8
    enc = Encoder(
        n_vocab=40, n_feats=n_feats, n_channels=16, filter_channels=32,
        n_heads=2, n_layers=1, kernel_size=3, p_dropout=0.1, window_size=4,
    )
    ue_params = enc.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 6), jnp.int32), jnp.array([6])
    )
    decoder = UnitSpeech(
        n_feats=n_feats, dim=8, dim_mults=(1, 2), groups=4, spk_emb_dim=spk_dim
    )
    dec_params = decoder.init(
        jax.random.PRNGKey(1),
        jnp.zeros((1, 8, n_feats)), jnp.ones((1, 8)),
        jnp.zeros((1, 8, n_feats)), jnp.zeros((1,)), jnp.zeros((1, spk_dim)),
    )
    rng = np.random.default_rng(2)
    t_y = 40
    units = rng.integers(0, 40, 10).astype(np.int64)
    durations = np.full(10, 4, np.int64)
    mel = rng.uniform(-1, 1, (t_y, n_feats)).astype(np.float32)
    spk = rng.standard_normal((1, spk_dim)).astype(np.float32)

    def run(pad_to):
        cond_x, y, y_len, attn = prepare_finetune_inputs(
            enc, ue_params, units, durations, mel, num_downsamplings=1,
            pad_to=pad_to,
        )
        p, losses = finetune_decoder(
            decoder.apply, jax.tree_util.tree_map(jnp.copy, dec_params),
            cond_x, y, y_len, attn, jnp.asarray(spk), jax.random.PRNGKey(3),
            segment_size=16, n_iters=4, learning_rate=2e-5, grad_clip=1.0,
        )
        return p, np.asarray(losses)

    p_exact, l_exact = run(None)
    p_pad, l_pad = run(64)
    np.testing.assert_allclose(l_pad, l_exact, rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p_exact),
                    jax.tree_util.tree_leaves(p_pad)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)
    # bad pad_to values are rejected
    import pytest

    with pytest.raises(ValueError):
        prepare_finetune_inputs(enc, ue_params, units, durations, mel,
                                num_downsamplings=3, pad_to=30)
