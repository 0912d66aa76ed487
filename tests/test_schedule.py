"""Schedule math vs the reference's buffer algebra
(/root/reference/unitspeech/unitspeech.py:204-268, 273-296, 333-370), recomputed
here independently with numpy float64 following the torch equations."""

import jax.numpy as jnp
import numpy as np
import pytest

from unitspeech_tpu.ops.schedule import (
    forward_diffusion_coefficients,
    get_noise,
    make_reverse_schedule,
)


def _reference_buffers(n, beta_min, beta_max):
    """Recompute the reference's register_beta buffers from its equations:
    per-step alpha_cumprods from the continuous noise integral, beta from
    consecutive ratios, then the DDPM posterior quantities."""
    h = 1.0 / n
    t = 1.0 - (np.arange(n) + 0.5) * h  # loop order (descending t)
    ac_loop = np.exp(-(beta_min * t + 0.5 * (beta_max - beta_min) * t ** 2))
    a = np.concatenate([ac_loop, [1.0]])
    betas = 1.0 - a[:-1] / a[1:]
    betas = betas[::-1]  # ascending
    alphas = 1.0 - betas
    ac = np.cumprod(alphas)
    ac_prev = np.concatenate([[1.0], ac[:-1]])
    pv = betas * (1.0 - ac_prev) / (1.0 - ac)
    return betas, ac, ac_prev, pv


@pytest.mark.parametrize("n", [4, 50, 500])
def test_fused_coefficients_match_reference_algebra(n):
    beta_min, beta_max = 0.05, 20.0
    betas, ac, ac_prev, pv = _reference_buffers(n, beta_min, beta_max)
    sched = make_reverse_schedule(n, beta_min, beta_max)

    # step i of the sampler uses buffer index idx = n-1-i
    for i in [0, n // 2, n - 1]:
        idx = n - 1 - i
        sqrt_om = np.sqrt(1.0 - ac[idx])
        sigma = np.sqrt(pv[idx])
        # x_recon = rsqrt(ac) x + sqrt(1/ac - 1) sqrt(1-ac) score   (:273-278)
        # mean = sqrt(ac_prev) x_recon - sqrt(1-ac_prev-sigma^2) score sqrt(1-ac)
        c_x = np.sqrt(ac_prev[idx]) / np.sqrt(ac[idx])
        c_score = (
            np.sqrt(ac_prev[idx]) * np.sqrt(1.0 / ac[idx] - 1.0) * sqrt_om
            - np.sqrt(max(1.0 - ac_prev[idx] - sigma ** 2, 0.0)) * sqrt_om
        )
        c_noise = 0.0 if idx == 0 else np.sqrt(pv[idx])
        t_cont = 1.0 - (i + 0.5) / n
        assert np.isclose(sched.c_x[i], c_x, rtol=1e-5)
        assert np.isclose(sched.c_score[i], c_score, rtol=1e-4, atol=1e-7)
        assert np.isclose(sched.c_noise[i], c_noise, rtol=1e-5, atol=1e-8)
        assert np.isclose(sched.t_cont[i], t_cont, rtol=1e-5)


def test_alphas_cumprod_closed_form():
    """ac[j] must equal exp(-Lambda((j+0.5)/n)) exactly (the closed form the
    fused schedule is built on)."""
    n, bmin, bmax = 50, 0.05, 20.0
    _, ac, _, _ = _reference_buffers(n, bmin, bmax)
    j = np.arange(n)
    t = (j + 0.5) / n
    lam = bmin * t + 0.5 * (bmax - bmin) * t ** 2
    np.testing.assert_allclose(ac, np.exp(-lam), rtol=1e-10)


def test_get_noise():
    t = jnp.array([0.0, 0.5, 1.0])
    lin = get_noise(t, 0.05, 20.0)
    np.testing.assert_allclose(np.asarray(lin), [0.05, 10.025, 20.0], rtol=1e-5)
    cum = get_noise(t, 0.05, 20.0, cumulative=True)
    np.testing.assert_allclose(np.asarray(cum), [0.0, 0.05 * 0.5 + 0.5 * 19.95 * 0.25, 0.05 + 0.5 * 19.95], rtol=1e-5)


def test_forward_diffusion_coefficients():
    t = jnp.array([0.3])
    mean_coef, std = forward_diffusion_coefficients(t, 0.05, 20.0)
    lam = 0.05 * 0.3 + 0.5 * 19.95 * 0.09
    np.testing.assert_allclose(float(mean_coef[0]), np.exp(-0.5 * lam), rtol=1e-5)
    np.testing.assert_allclose(float(std[0]), np.sqrt(1 - np.exp(-lam)), rtol=1e-5)
    # variance-preserving: mean^2 + std^2 = 1
    np.testing.assert_allclose(float(mean_coef[0] ** 2 + std[0] ** 2), 1.0, rtol=1e-5)


def test_schedule_sampler_last_step_is_deterministic():
    sched = make_reverse_schedule(50)
    assert sched.c_noise[-1] == 0.0
    assert (np.asarray(sched.c_noise[:-1]) > 0).all()


def test_stacked_shape():
    sched = make_reverse_schedule(10)
    st = sched.stacked()
    assert st.shape == (10, 4)
