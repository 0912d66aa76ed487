"""Full-sampler parity: our fused lax.scan sampler vs a step-by-step numpy
oracle implementing the reference's exact buffer algebra
(/root/reference/unitspeech/unitspeech.py:235-296, 333-374), with identical
noise (drawn from the same PRNG keys) and a deterministic fake estimator."""

import jax
import jax.numpy as jnp
import numpy as np

from unitspeech_tpu.models.diffusion import reverse_diffusion


def _oracle_reverse(z, mask, cond, n, beta_min, beta_max, key, score_fn):
    """Reference reverse_diffusion re-derived from its equations: per-call
    beta registration (:335-347), predict_start_from_score + q_posterior
    (:273-296), noise update (:360-370). Float64 buffers like register_beta."""
    h = 1.0 / n
    t_loop = 1.0 - (np.arange(n) + 0.5) * h
    ac_loop = np.exp(-(beta_min * t_loop + 0.5 * (beta_max - beta_min) * t_loop ** 2))
    a = np.concatenate([ac_loop, [1.0]])
    betas = (1.0 - a[:-1] / a[1:])[::-1]
    alphas = 1.0 - betas
    ac = np.cumprod(alphas)
    ac_prev = np.concatenate([[1.0], ac[:-1]])
    pv = betas * (1.0 - ac_prev) / (1.0 - ac)

    xt = np.asarray(z) * np.asarray(mask)[..., None]
    m3 = np.asarray(mask)[..., None]
    for i in range(n):
        idx = n - 1 - i
        t = 1.0 - (i + 0.5) * h
        score = score_fn(xt, t)
        x_recon = (
            xt / np.sqrt(ac[idx])
            + np.sqrt(1.0 / ac[idx] - 1.0) * np.sqrt(1.0 - ac[idx]) * score
        )
        sigma = np.sqrt(pv[idx])  # eta = 1
        mean = (
            np.sqrt(ac_prev[idx]) * x_recon
            - np.sqrt(max(1.0 - ac_prev[idx] - sigma ** 2, 0.0))
            * score * np.sqrt(1.0 - ac[idx])
        )
        var = pv[idx]
        noise = np.asarray(jax.random.normal(jax.random.fold_in(key, i), xt.shape))
        nonzero = 0.0 if idx == 0 else 1.0
        xt = (mean + nonzero * np.sqrt(var) * noise) * m3
    return xt * m3


def test_sampler_matches_reference_algebra_end_to_end():
    b, t, f = 2, 8, 4
    n = 7
    rng = np.random.default_rng(0)
    z = rng.standard_normal((b, t, f)).astype(np.float32)
    cond = (rng.standard_normal((b, t, f)) * 0.3).astype(np.float32)
    mask = np.ones((b, t), np.float32)
    mask[1, 6:] = 0.0
    key = jax.random.PRNGKey(9)

    # deterministic fake estimator: score = 0.1*xt - 0.2*cond + 0.05*t
    def apply_fn(params, xt, mask_, cond_, tt, spk):
        return 0.1 * xt - 0.2 * cond_ + 0.05 * tt[:, None, None]

    params = {"params": {"text_uncon": jnp.zeros((f,)), "spk_uncon": jnp.zeros((1,))}}
    got = reverse_diffusion(
        apply_fn, params, jnp.asarray(z), jnp.asarray(mask), jnp.asarray(cond),
        jnp.zeros((b, 1)), key, n_timesteps=n,
    )

    def score_fn(xt, t):
        return 0.1 * xt - 0.2 * cond + 0.05 * t

    want = _oracle_reverse(z, mask, cond, n, 0.05, 20.0, key, score_fn)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)
    # padding stays zero
    assert np.abs(np.asarray(got)[1, 6:]).max() == 0.0
