"""CFG delta caching (`cfg_stride` / sampler-spec ':cs<k>' suffix) tests.

The cached quantity is the guidance delta in EPSILON space
(delta_score * std_t); the analytic oracle below constructs a score function
whose eps-space delta is EXACTLY constant along the trajectory, so the
strided sampler must reproduce the stride-1 trajectory to float tolerance —
this locks the grouped-scan indexing, the std rescaling, the remainder
handling, and the per-step noise-key alignment all at once.

Reference CFG algebra: /root/reference/unitspeech/unitspeech.py:298-331
(the reference always evaluates all guidance rows every step; the stride is
this framework's serving-mode extension, quality-gated like the dpm2 fast
mode — tools/cfg_gate.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unitspeech_tpu.models.diffusion import (
    UnitSpeech,
    parse_sampler_spec,
    reverse_diffusion,
    reverse_diffusion_ode,
)
from unitspeech_tpu.ops.schedule import forward_diffusion_coefficients

BETA_MIN, BETA_MAX = 0.05, 20.0


def test_parse_sampler_spec():
    assert parse_sampler_spec("ddpm") == ("ddpm", 1)
    assert parse_sampler_spec("dpm2") == ("dpm2", 1)
    assert parse_sampler_spec("ddpm:cs1") == ("ddpm", 1)
    assert parse_sampler_spec("dpm2:cs2") == ("dpm2", 2)
    assert parse_sampler_spec("ddpm:cs10") == ("ddpm", 10)
    for bad in ("euler", "dpm2:cs0", "dpm2:cs", "dpm2:stride2", "ddpm:cs-1",
                "dpm2:cs2x", ""):
        with pytest.raises(ValueError):
            parse_sampler_spec(bad)


def _analytic_apply(params, xt, mask, cond, t, spk):
    """Score whose guidance delta is constant in eps space: the cond- and
    spk-dependent terms scale as 1/std(t) and are xt-independent, so
    delta_eps = std * (guided - s_cond) does not change between steps and
    the cached reuse is EXACT."""
    _, std = forward_diffusion_coefficients(t[:, None, None], BETA_MIN, BETA_MAX)
    return (-0.1 * xt + (cond + jnp.sum(spk, -1)[:, None, None]) / std) * mask[:, :, None]


def _inputs(b=2, t=6, f=8, s=5, seed=0):
    rng = np.random.default_rng(seed)
    params = {"params": {
        "text_uncon": jnp.asarray(rng.standard_normal(f), jnp.float32),
        "spk_uncon": jnp.asarray(rng.standard_normal(s), jnp.float32),
    }}
    z = jnp.asarray(rng.standard_normal((b, t, f)), jnp.float32)
    mask = jnp.asarray(np.array([[1] * t, [1] * (t - 2) + [0] * 2]), jnp.float32)
    cond = jnp.asarray(rng.standard_normal((b, t, f)), jnp.float32)
    spk = jnp.asarray(rng.standard_normal((b, s)), jnp.float32)
    return params, z, mask, cond, spk


@pytest.mark.parametrize("n_steps,stride", [(8, 2), (7, 2), (7, 3), (8, 3), (4, 8)])
@pytest.mark.parametrize("tg,sg", [(1.0, 1.0), (1.3, 0.0), (0.0, 0.7)])
def test_ddpm_strided_exact_on_constant_delta_oracle(n_steps, stride, tg, sg):
    params, z, mask, cond, spk = _inputs()
    key = jax.random.PRNGKey(3)
    kw = dict(n_timesteps=n_steps, text_gradient_scale=tg,
              spk_gradient_scale=sg, beta_min=BETA_MIN, beta_max=BETA_MAX)
    ref = reverse_diffusion(_analytic_apply, params, z, mask, cond, spk, key, **kw)
    got = reverse_diffusion(_analytic_apply, params, z, mask, cond, spk, key,
                            cfg_stride=stride, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("n_steps,stride", [(8, 2), (7, 2), (7, 3), (4, 8)])
@pytest.mark.parametrize("tg,sg", [(1.0, 1.0), (1.3, 0.0), (0.0, 0.7)])
def test_ode_strided_exact_on_constant_delta_oracle(n_steps, stride, tg, sg):
    params, z, mask, cond, spk = _inputs(seed=1)
    kw = dict(n_timesteps=n_steps, text_gradient_scale=tg,
              spk_gradient_scale=sg, beta_min=BETA_MIN, beta_max=BETA_MAX)
    ref = reverse_diffusion_ode(_analytic_apply, params, z, mask, cond, spk, **kw)
    got = reverse_diffusion_ode(_analytic_apply, params, z, mask, cond, spk,
                                cfg_stride=stride, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_stride_noop_without_guidance():
    """With both scales 0 there are no guidance rows to cache: any stride
    must produce the stride-1 result bit-for-bit (same single-row path)."""
    params, z, mask, cond, spk = _inputs(seed=2)
    key = jax.random.PRNGKey(7)
    kw = dict(n_timesteps=6, text_gradient_scale=0.0, spk_gradient_scale=0.0)
    ref = reverse_diffusion(_analytic_apply, params, z, mask, cond, spk, key, **kw)
    got = reverse_diffusion(_analytic_apply, params, z, mask, cond, spk, key,
                            cfg_stride=4, **kw)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_noises_injection_requires_stride1():
    params, z, mask, cond, spk = _inputs(seed=3)
    noises = jnp.zeros((4,) + z.shape)
    with pytest.raises(ValueError, match="cfg_stride"):
        reverse_diffusion(_analytic_apply, params, z, mask, cond, spk,
                          jax.random.PRNGKey(0), n_timesteps=4,
                          text_gradient_scale=1.0, spk_gradient_scale=1.0,
                          cfg_stride=2, noises=noises)


def test_strided_real_module_masked_and_finite():
    """Through the real (tiny) UnitSpeech module: the strided sampler keeps
    padding zeroed, stays finite, and actually changes numerics vs stride 1
    (the cache is an approximation for a learned score)."""
    tiny = dict(n_feats=16, dim=8, dim_mults=(1, 2), groups=4, spk_emb_dim=12)
    model = UnitSpeech(**tiny)
    b, t, f = 2, 8, tiny["n_feats"]
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal((b, t, f)), jnp.float32)
    mask = jnp.asarray(np.array([[1] * 6 + [0] * 2, [1] * 8]), jnp.float32)
    cond = jnp.asarray(rng.standard_normal((b, t, f)), jnp.float32)
    spk = jnp.asarray(rng.standard_normal((b, tiny["spk_emb_dim"])), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), z, mask, cond,
                        jnp.zeros((b,)), spk)

    def apply_fn(p, xt, m, c, tt, s):
        return model.apply(p, xt, m, c, tt, s)

    kw = dict(n_timesteps=6, text_gradient_scale=1.0, spk_gradient_scale=1.0)
    key = jax.random.PRNGKey(1)
    ref = reverse_diffusion(apply_fn, params, z, mask, cond, spk, key, **kw)
    got = reverse_diffusion(apply_fn, params, z, mask, cond, spk, key,
                            cfg_stride=2, **kw)
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_array_equal(np.asarray(got[0, 6:]), 0.0)
    assert np.abs(np.asarray(got) - np.asarray(ref)).max() > 1e-7


# The Synthesizer-level spec test (":cs2" through the serving paths) lives
# with the other serving-path tests: tests/test_tts_e2e.py::
# test_cfg_stride_spec_through_serving_paths (shares the tiny_synth fixture).
