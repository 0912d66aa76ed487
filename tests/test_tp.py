"""Tensor-parallel (model-axis) sharding on the virtual 8-device mesh.

The reference is single-GPU (SURVEY.md §2.5); `parallel/tp.py` is the
TPU-native design — weight-stationary GSPMD output-channel sharding, no model
rewrite. These tests lock (a) the spec rule, (b) sampler numerics under pure
TP and under mixed seq x model sharding, and (c) a STEP1 training step on a
DP x TP mesh reproducing the replicated step's loss.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from unitspeech_tpu.models.diffusion import UnitSpeech, reverse_diffusion
from unitspeech_tpu.parallel import (
    make_mesh,
    replicate_tree,
    shard_batch,
    shard_params_tp,
    tp_spec,
)

TINY = dict(n_feats=16, dim=8, dim_mults=(1, 2), groups=4, spk_emb_dim=8)


def _decoder_and_inputs(t=64):
    model = UnitSpeech(**TINY)
    f = TINY["n_feats"]
    rng = np.random.default_rng(0)
    xt = jnp.zeros((1, t, f))
    mask = jnp.ones((1, t))
    cond = jnp.asarray(rng.standard_normal((1, t, f)) * 0.1, jnp.float32)
    spk = jnp.asarray(rng.standard_normal((1, TINY["spk_emb_dim"])) * 0.1,
                      jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0), xt, mask, cond, jnp.zeros((1,)), spk
    )
    z = jax.random.normal(jax.random.PRNGKey(5), (1, t, f))
    return model, params, z, mask, cond, spk


def test_tp_spec_rule():
    mesh = make_mesh(data=1, seq=1, model=8)
    n = mesh.shape["model"]
    # conv kernel (k, k, cin, cout): last dim sharded
    assert tp_spec(jnp.zeros((3, 3, 4, 16)), n) == P(None, None, None, "model")
    # dense (cin, cout): sharded
    assert tp_spec(jnp.zeros((4, 16)), n) == P(None, "model")
    # bias / norm scale (1-D): replicated
    assert tp_spec(jnp.zeros((16,)), n) == P()
    # non-divisible last dim: replicated
    assert tp_spec(jnp.zeros((4, 6)), n) == P()
    # min_per_shard gate
    assert tp_spec(jnp.zeros((4, 16)), n, min_per_shard=4) == P()
    # size-1 model axis: everything replicated
    assert tp_spec(jnp.zeros((4, 16)), 1) == P()


def test_tp_sampler_matches_replicated():
    assert len(jax.devices()) == 8
    mesh = make_mesh(data=1, seq=1, model=8)
    model, params, z, mask, cond, spk = _decoder_and_inputs()
    key = jax.random.PRNGKey(7)
    kw = dict(n_timesteps=3, text_gradient_scale=1.0, spk_gradient_scale=1.0)
    base = np.asarray(
        reverse_diffusion(model.apply, params, z, mask, cond, spk, key, **kw)
    )
    tp_params = shard_params_tp(params, mesh)
    # at least one leaf must actually be sharded for the test to mean anything
    n_sharded = sum(
        1
        for x in jax.tree_util.tree_leaves(tp_params)
        if any(ax == "model" for ax in tuple(x.sharding.spec or ()))
    )
    assert n_sharded > 0
    tp = np.asarray(
        reverse_diffusion(model.apply, tp_params, z, mask, cond, spk, key,
                          **kw)
    )
    np.testing.assert_allclose(tp, base, rtol=2e-3, atol=2e-4)


def test_tp_times_seq_sampler_matches_replicated():
    """The real multi-chip latency layout: frame axis over `seq`, deep-stage
    channels over `model` on one (1, 4, 2) mesh."""
    mesh = make_mesh(data=1, seq=4, model=2)
    model, params, z, mask, cond, spk = _decoder_and_inputs()
    key = jax.random.PRNGKey(7)
    kw = dict(n_timesteps=3, text_gradient_scale=1.0, spk_gradient_scale=1.0)
    base = np.asarray(
        reverse_diffusion(model.apply, params, z, mask, cond, spk, key, **kw)
    )
    tp_params = shard_params_tp(params, mesh)
    out = np.asarray(
        reverse_diffusion(
            model.apply, tp_params, z, mask, cond, spk, key, **kw,
            mesh=mesh, sample_spec=P(None, "seq", None),
        )
    )
    np.testing.assert_allclose(out, base, rtol=2e-3, atol=2e-4)


def test_tp_dp_train_step_matches_replicated():
    """One STEP1 training step on a (4, 1, 2) DP x TP mesh: params sharded
    over `model`, batch over `data`; losses must match the fully-replicated
    step (identical rng), and updated params must stay finite."""
    import optax

    from unitspeech_tpu.models.duration import DurationPredictor
    from unitspeech_tpu.models.encoder import Encoder
    from unitspeech_tpu.train.steps import TrainState, make_step1_train_step

    n_feats, spk_dim = 16, 8
    text_encoder = Encoder(
        n_vocab=40, n_feats=n_feats, n_channels=16, filter_channels=32,
        n_heads=2, n_layers=1, kernel_size=3, p_dropout=0.1, window_size=4,
    )
    dp = DurationPredictor(in_channels=16, filter_channels=16,
                           spk_emb_dim=spk_dim)
    decoder = UnitSpeech(n_feats=n_feats, dim=8, dim_mults=(1, 2), groups=4,
                         spk_emb_dim=spk_dim)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    params = {
        "text_encoder": text_encoder.init(
            k1, jnp.zeros((1, 6), jnp.int32), jnp.array([6])
        ),
        "duration_predictor": dp.init(
            k2, jnp.zeros((1, 6, 16)), jnp.ones((1, 6, 1)),
            g=jnp.zeros((1, spk_dim)), reverse=True,
        ),
        "decoder": decoder.init(
            k3, jnp.zeros((1, 8, n_feats)), jnp.ones((1, 8)),
            jnp.zeros((1, 8, n_feats)), jnp.zeros((1,)),
            jnp.zeros((1, spk_dim)),
        ),
    }
    # the train step donates its state; on CPU device_put can zero-copy
    # alias the source buffer, so place each run from host-side copies
    params = jax.tree_util.tree_map(np.asarray, params)
    opt = optax.adam(1e-4)
    step = make_step1_train_step(
        text_encoder, dp, decoder, opt, out_size=16,
        spk_uncond=jnp.zeros((spk_dim,)), spk_dropout=0.25,
    )

    b, t_x, t_y = 8, 6, 24
    rng = np.random.default_rng(0)
    raw_batch = {
        "tokens": jnp.asarray(rng.integers(1, 40, (b, t_x)), jnp.int32),
        "token_lengths": jnp.full((b,), t_x),
        "mel": jnp.asarray(rng.uniform(-1, 1, (b, t_y, n_feats)), jnp.float32),
        "mel_lengths": jnp.full((b,), t_y),
        "spk_emb": jnp.asarray(rng.standard_normal((b, spk_dim)), jnp.float32),
    }
    key = jax.random.PRNGKey(1)

    def run(mesh, place):
        p = place(params, mesh)
        state = TrainState(p, opt.init(p), jnp.array(0))
        batch = shard_batch(raw_batch, mesh)
        state, metrics = step(state, batch, key)
        return state, float(metrics["total_loss"])

    _, base_loss = run(make_mesh(), replicate_tree)
    tp_state, tp_loss = run(
        make_mesh(data=4, seq=1, model=2), shard_params_tp
    )
    assert np.isfinite(tp_loss)
    np.testing.assert_allclose(tp_loss, base_loss, rtol=2e-3)
    for leaf in jax.tree_util.tree_leaves(tp_state.params):
        assert np.isfinite(np.asarray(leaf)).all()
