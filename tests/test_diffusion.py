"""Diffusion decoder tests: U-Net invariants, sampler behavior, losses,
fine-tune segment cropping (reference /root/reference/unitspeech/unitspeech.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unitspeech_tpu.models.diffusion import (
    UnitSpeech,
    cfg_score,
    diffusion_loss,
    fine_tune_loss,
    forward_diffusion,
    random_segment_crop,
    reverse_diffusion,
)
from unitspeech_tpu.models.unet import GradLogPEstimator2d, sinusoidal_pos_emb


TINY = dict(n_feats=16, dim=8, dim_mults=(1, 2), groups=4, spk_emb_dim=12)


def _tiny_model():
    model = UnitSpeech(**TINY)
    b, t = 2, 8
    xt = jnp.zeros((b, t, TINY["n_feats"]))
    mask = jnp.ones((b, t))
    cond = jnp.zeros_like(xt)
    tt = jnp.zeros((b,))
    spk = jnp.zeros((b, TINY["spk_emb_dim"]))
    params = model.init(jax.random.PRNGKey(0), xt, mask, cond, tt, spk)
    return model, params


def test_sinusoidal_pos_emb_matches_reference_formula():
    """Reference SinusoidalPosEmb (unitspeech.py:109-121)."""
    dim, scale = 16, 1000.0
    t = np.array([0.3, 0.99], dtype=np.float32)
    half = dim // 2
    emb = np.exp(np.arange(half) * -(np.log(10000.0) / (half - 1)))
    args = scale * t[:, None] * emb[None, :]
    want = np.concatenate([np.sin(args), np.cos(args)], axis=-1)
    got = np.asarray(sinusoidal_pos_emb(jnp.asarray(t), dim, scale))
    # atol dominated by float32 sin/cos of large args (up to t*scale ~ 1000)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_unet_shapes_and_padding():
    model, params = _tiny_model()
    b, t, f = 2, 8, TINY["n_feats"]
    rng = np.random.default_rng(0)
    xt = jnp.asarray(rng.standard_normal((b, t, f)), jnp.float32)
    cond = jnp.asarray(rng.standard_normal((b, t, f)), jnp.float32)
    mask = jnp.asarray(np.array([[1] * 5 + [0] * 3, [1] * 8]), jnp.float32)
    tt = jnp.array([0.5, 0.9])
    spk = jnp.asarray(rng.standard_normal((b, TINY["spk_emb_dim"])), jnp.float32)
    score = model.apply(params, xt, mask, cond, tt, spk)
    assert score.shape == (b, t, f)
    # padded region zero
    np.testing.assert_array_equal(np.asarray(score[0, 5:]), 0.0)
    # padding-content invariance
    xt2 = xt.at[0, 5:].set(99.0)
    cond2 = cond.at[0, 5:].set(-99.0)
    score2 = model.apply(params, xt2, mask, cond2, tt, spk)
    np.testing.assert_allclose(np.asarray(score), np.asarray(score2), atol=1e-5)


def test_forward_diffusion_statistics():
    key = jax.random.PRNGKey(0)
    x0 = jnp.ones((4, 16, 8))
    mask = jnp.ones((4, 16))
    t = jnp.full((4,), 0.999)
    xt, z = forward_diffusion(x0, mask, t, key)
    # at t ~ 1 the signal is essentially destroyed: Lambda(1) ~ 10
    assert abs(float(xt.mean())) < 0.2
    assert 0.8 < float(xt.std()) < 1.2


def test_reverse_diffusion_shapes_and_determinism():
    model, params = _tiny_model()
    b, t, f = 1, 8, TINY["n_feats"]
    key = jax.random.PRNGKey(3)
    z = jax.random.normal(key, (b, t, f))
    mask = jnp.ones((b, t))
    cond = jnp.zeros((b, t, f))
    spk = jnp.zeros((b, TINY["spk_emb_dim"]))
    out1 = reverse_diffusion(model.apply, params, z, mask, cond, spk, key, n_timesteps=4)
    out2 = reverse_diffusion(model.apply, params, z, mask, cond, spk, key, n_timesteps=4)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert out1.shape == (b, t, f)
    assert np.isfinite(np.asarray(out1)).all()


@pytest.mark.parametrize("tg,sg,mult", [(0.0, 0.0, 1), (1.0, 0.0, 2), (0.0, 1.0, 2), (1.0, 1.0, 3)])
def test_cfg_batching(tg, sg, mult):
    """CFG folds into one estimator call whose batch is 1x/2x/3x."""
    model, params = _tiny_model()
    b, t, f = 2, 8, TINY["n_feats"]
    calls = []

    def spy_apply(p, xt, mask, cond, tt, spk):
        calls.append(xt.shape[0])
        return model.apply(p, xt, mask, cond, tt, spk)

    xt = jnp.ones((b, t, f))
    mask = jnp.ones((b, t))
    cond = jnp.ones((b, t, f))
    tt = jnp.full((b,), 0.5)
    spk = jnp.ones((b, TINY["spk_emb_dim"]))
    score = cfg_score(spy_apply, params, xt, mask, cond, tt, spk, tg, sg)
    assert score.shape == (b, t, f)
    assert calls == [b * mult]
    # regression: zero-init spk_uncon must not NaN through the normalization
    assert np.isfinite(np.asarray(score)).all()


def test_cfg_zero_scales_equals_plain_score():
    model, params = _tiny_model()
    b, t, f = 2, 8, TINY["n_feats"]
    rng = np.random.default_rng(0)
    xt = jnp.asarray(rng.standard_normal((b, t, f)), jnp.float32)
    mask = jnp.ones((b, t))
    cond = jnp.asarray(rng.standard_normal((b, t, f)), jnp.float32)
    tt = jnp.full((b,), 0.5)
    spk = jnp.asarray(rng.standard_normal((b, TINY["spk_emb_dim"])), jnp.float32)
    plain = model.apply(params, xt, mask, cond, tt, spk)
    guided = cfg_score(model.apply, params, xt, mask, cond, tt, spk, 0.0, 0.0)
    np.testing.assert_allclose(np.asarray(plain), np.asarray(guided), atol=1e-6)


def test_diffusion_loss_finite_and_differentiable():
    model, params = _tiny_model()
    b, t, f = 2, 8, TINY["n_feats"]
    x0 = jnp.ones((b, t, f)) * 0.1
    mask = jnp.asarray(np.array([[1] * 6 + [0] * 2, [1] * 8]), jnp.float32)
    cond = jnp.zeros((b, t, f))
    spk = jnp.zeros((b, TINY["spk_emb_dim"]))

    def loss_fn(p):
        loss, _ = diffusion_loss(model.apply, p, x0, mask, cond, spk, jax.random.PRNGKey(0))
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert any(float(jnp.abs(g).max()) > 0 for g in leaves)


def test_random_segment_crop_invariants():
    rng = np.random.default_rng(0)
    b, t_y, t_x, f, seg = 3, 20, 5, 4, 8
    y = jnp.asarray(rng.standard_normal((b, t_y, f)), jnp.float32)
    attn = jnp.asarray(rng.random((b, t_x, t_y)), jnp.float32)
    y_lengths = jnp.array([20, 10, 5])  # long, mid, shorter-than-segment
    y_cut, attn_cut, y_cut_mask = random_segment_crop(
        y, attn, y_lengths, seg, jax.random.PRNGKey(1)
    )
    assert y_cut.shape == (b, seg, f)
    assert attn_cut.shape == (b, t_x, seg)
    np.testing.assert_array_equal(
        np.asarray(y_cut_mask), np.asarray([[1] * 8, [1] * 8, [1] * 5 + [0] * 3])
    )
    # sample 2 (length 5 < seg): crop must start at 0 and preserve content
    np.testing.assert_allclose(np.asarray(y_cut[2, :5]), np.asarray(y[2, :5]))
    np.testing.assert_array_equal(np.asarray(y_cut[2, 5:]), 0.0)
    # cropped content comes from within the valid region
    for i in range(b):
        row = np.asarray(y_cut[i, 0])
        src = np.asarray(y[i, : int(y_lengths[i])])
        assert any(np.allclose(row, s) for s in src)


def test_fine_tune_loss_runs():
    model, params = _tiny_model()
    b, t_x, t_y, f = 1, 4, 16, TINY["n_feats"]
    rng = np.random.default_rng(0)
    cond_x = jnp.asarray(rng.standard_normal((b, t_x, f)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((b, t_y, f)), jnp.float32)
    attn = jnp.zeros((b, t_x, t_y)).at[:, 0, :4].set(1.0).at[:, 1, 4:8].set(1.0)
    attn = attn.at[:, 2, 8:12].set(1.0).at[:, 3, 12:].set(1.0)
    spk = jnp.zeros((b, TINY["spk_emb_dim"]))
    loss = fine_tune_loss(
        model.apply, params, cond_x, y, jnp.array([t_y]), attn, spk, 8,
        jax.random.PRNGKey(0),
    )
    assert np.isfinite(float(loss))
