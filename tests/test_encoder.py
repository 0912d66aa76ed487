"""Encoder stack tests: shape/mask invariants and a numpy oracle for the
window-limited relative-position attention (reference
/root/reference/unitspeech/encoder.py:68-187)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unitspeech_tpu.models.encoder import (
    ChannelLayerNorm,
    Encoder,
    RelPositionMultiHeadAttention,
)


def test_channel_layernorm_matches_manual():
    x = np.random.default_rng(0).standard_normal((2, 5, 8)).astype(np.float32)
    ln = ChannelLayerNorm(8)
    params = ln.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = np.asarray(ln.apply(params, jnp.asarray(x)))
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    expected = (x - mean) / np.sqrt(var + 1e-4)
    np.testing.assert_allclose(y, expected, rtol=1e-4, atol=1e-5)


def _attention_oracle(x, p, n_heads, window):
    """Numpy oracle implementing the reference attention equations
    (encoder.py:115-144) directly, without the pad/reshape index tricks."""
    b, t, c = x.shape
    d = c // n_heads
    wq, bq = np.asarray(p["conv_q"]["kernel"]), np.asarray(p["conv_q"]["bias"])
    wk, bk = np.asarray(p["conv_k"]["kernel"]), np.asarray(p["conv_k"]["bias"])
    wv, bv = np.asarray(p["conv_v"]["kernel"]), np.asarray(p["conv_v"]["bias"])
    wo, bo = np.asarray(p["conv_o"]["kernel"]), np.asarray(p["conv_o"]["bias"])
    ek = np.asarray(p["emb_rel_k"])
    ev = np.asarray(p["emb_rel_v"])
    q = (x @ wq + bq).reshape(b, t, n_heads, d).transpose(0, 2, 1, 3)
    k = (x @ wk + bk).reshape(b, t, n_heads, d).transpose(0, 2, 1, 3)
    v = (x @ wv + bv).reshape(b, t, n_heads, d).transpose(0, 2, 1, 3)
    scores = np.einsum("bhid,bhjd->bhij", q, k) / np.sqrt(d)
    for i in range(t):
        for j in range(t):
            r = j - i + window
            if 0 <= r <= 2 * window:
                scores[:, :, i, j] += q[:, :, i] @ ek[r] / np.sqrt(d)
    e = np.exp(scores - scores.max(-1, keepdims=True))
    pattn = e / e.sum(-1, keepdims=True)
    out = np.einsum("bhij,bhjd->bhid", pattn, v)
    for i in range(t):
        for r in range(2 * window + 1):
            j = i + r - window
            if 0 <= j < t:
                out[:, :, i] += pattn[:, :, i, j][..., None] * ev[r][None, None]
    out = out.transpose(0, 2, 1, 3).reshape(b, t, c)
    return out @ wo + bo


def test_relpos_attention_matches_oracle():
    b, t, c, h, w = 2, 11, 16, 2, 4
    x = np.random.default_rng(1).standard_normal((b, t, c)).astype(np.float32)
    attn = RelPositionMultiHeadAttention(c, c, h, window_size=w)
    params = attn.init(jax.random.PRNGKey(1), jnp.asarray(x))
    got = np.asarray(attn.apply(params, jnp.asarray(x)))
    want = _attention_oracle(x, params["params"], h, w)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("t_short", [3, 9])
def test_relpos_attention_short_sequences(t_short):
    """T < window+1 exercises the reference's edge-case slice paths
    (encoder.py:154-166); the gather formulation must agree."""
    c, h, w = 8, 2, 4
    x = np.random.default_rng(2).standard_normal((1, t_short, c)).astype(np.float32)
    attn = RelPositionMultiHeadAttention(c, c, h, window_size=w)
    params = attn.init(jax.random.PRNGKey(2), jnp.asarray(x))
    got = np.asarray(attn.apply(params, jnp.asarray(x)))
    want = _attention_oracle(x, params["params"], h, w)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def _tiny_encoder(n_contentvec=0):
    return Encoder(
        n_vocab=30, n_feats=12, n_channels=16, filter_channels=32, n_heads=2,
        n_layers=2, kernel_size=3, p_dropout=0.1, n_contentvec=n_contentvec,
        window_size=4,
    )


def test_encoder_shapes_and_masking():
    enc = _tiny_encoder()
    tokens = jnp.array([[1, 2, 3, 4, 0, 0], [5, 6, 7, 8, 9, 10]])
    lengths = jnp.array([4, 6])
    params = enc.init(jax.random.PRNGKey(0), tokens, lengths)
    mu, hidden, mask = enc.apply(params, tokens, lengths)
    assert mu.shape == (2, 6, 12)
    assert hidden.shape == (2, 6, 16)
    assert mask.shape == (2, 6, 1)
    # padding region fully zeroed
    np.testing.assert_array_equal(np.asarray(mu[0, 4:]), 0.0)
    np.testing.assert_array_equal(np.asarray(hidden[0, 4:]), 0.0)


def test_encoder_padding_content_invariance():
    """Changing token IDs inside the padding must not change outputs."""
    enc = _tiny_encoder()
    t1 = jnp.array([[1, 2, 3, 4, 0, 0]])
    t2 = jnp.array([[1, 2, 3, 4, 17, 23]])
    lengths = jnp.array([4])
    params = enc.init(jax.random.PRNGKey(0), t1, lengths)
    mu1, _, _ = enc.apply(params, t1, lengths)
    mu2, _, _ = enc.apply(params, t2, lengths)
    np.testing.assert_allclose(np.asarray(mu1), np.asarray(mu2), atol=1e-6)


def test_encoder_contentvec_path():
    enc = _tiny_encoder(n_contentvec=20)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 7, 20)), jnp.float32)
    lengths = jnp.array([7, 5])
    params = enc.init(jax.random.PRNGKey(0), x, lengths)
    mu, hidden, mask = enc.apply(params, x, lengths)
    assert mu.shape == (2, 7, 12)


def test_encoder_dropout_rng_path():
    enc = _tiny_encoder()
    tokens = jnp.array([[1, 2, 3, 4]])
    lengths = jnp.array([4])
    params = enc.init(jax.random.PRNGKey(0), tokens, lengths)
    mu_a, _, _ = enc.apply(
        params, tokens, lengths, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    mu_b, _, _ = enc.apply(
        params, tokens, lengths, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    assert not np.allclose(np.asarray(mu_a), np.asarray(mu_b))
