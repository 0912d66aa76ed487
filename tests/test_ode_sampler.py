"""DPM-Solver++(2M) probability-flow sampler vs analytic oracles.

For x0 ~ N(0, s0^2 I) the marginal score is linear,
score(x, t) = -x / (alpha_t^2 s0^2 + sigma_t^2), and the probability-flow
ODE dx/dt = -0.5 beta(t) (x + score) is a scalar linear ODE whose solution
is computed here to high accuracy with dense RK4 in float64. The 2M solver
must land on that trajectory within second-order error at coarse step
counts — the property that justifies the fast serving mode's step budget.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unitspeech_tpu.models.diffusion import reverse_diffusion_ode
from unitspeech_tpu.ops.schedule import make_ode_schedule

BMIN, BMAX = 0.05, 20.0


def _beta(t):
    return BMIN + (BMAX - BMIN) * t


def _alpha2(t):
    lam = BMIN * t + 0.5 * (BMAX - BMIN) * t * t
    return np.exp(-lam)


def _rk4_factor(s0: float, t_end: float, n: int = 4000) -> float:
    """Integrates dm/dt = -0.5 beta (1 - 1/(a2 s0^2 + 1 - a2)) m from t=1
    down to t_end with m(1) = 1 (float64 dense RK4)."""

    def rhs(t, m):
        a2 = _alpha2(t)
        denom = a2 * s0 * s0 + 1.0 - a2
        return -0.5 * _beta(t) * (1.0 - 1.0 / denom) * m

    h = (t_end - 1.0) / n  # negative: integrating backwards in t
    t, m = 1.0, 1.0
    for _ in range(n):
        k1 = rhs(t, m)
        k2 = rhs(t + h / 2, m + h / 2 * k1)
        k3 = rhs(t + h / 2, m + h / 2 * k2)
        k4 = rhs(t + h, m + h * k3)
        m += h / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
        t += h
    return m


def _linear_score_apply(s0: float):
    def apply_fn(params, x, mask, cond, t, spk):
        a2 = jnp.exp(-(BMIN * t + 0.5 * (BMAX - BMIN) * t * t))
        denom = a2 * s0 * s0 + 1.0 - a2
        return -x / denom[:, None, None]

    return apply_fn


def test_ode_schedule_structure():
    s = make_ode_schedule(12)
    assert s.t_eval[0] == pytest.approx(1.0)
    assert np.all(np.diff(s.t_eval) < 0)        # t strictly decreasing
    assert s.c1[0] == 1.0 and s.c2[0] == 0.0    # first step = DDIM
    assert np.all(s.a > 0) and np.all(s.b > 0)
    # 2M weights always sum to 1 (consistency of the extrapolation)
    np.testing.assert_allclose(s.c1 + s.c2, 1.0, rtol=1e-12)


@pytest.mark.parametrize("s0", [0.4, 1.0, 2.5])
def test_dpm2m_matches_dense_rk4_on_gaussian(s0):
    B, T, F = 2, 6, 4
    z = jax.random.normal(jax.random.PRNGKey(0), (B, T, F))
    mask = jnp.ones((B, T))
    cond = jnp.zeros((B, T, F))
    spk = jnp.zeros((B, 8))
    out = reverse_diffusion_ode(
        _linear_score_apply(s0), {"params": {}}, z, mask, cond, spk,
        n_timesteps=20,
    )
    m = _rk4_factor(s0, t_end=0.01)
    want = np.asarray(z) * m
    err = np.abs(np.asarray(out) - want).max() / (abs(m) * np.abs(z).max())
    # second-order solver at 20 steps: ~1e-2 constant on this schedule
    # (lambda spans ~8.3, h ~ 0.42/step); the convergence test below locks
    # the order, this locks the constant from regressing
    assert err < 2e-2, (err, m)


def test_dpm2m_second_order_convergence():
    """Error shrinks ~4x when the step count doubles (order 2)."""
    s0 = 1.7
    B, T, F = 1, 4, 4
    z = jax.random.normal(jax.random.PRNGKey(1), (B, T, F))
    mask = jnp.ones((B, T))
    cond = jnp.zeros((B, T, F))
    spk = jnp.zeros((B, 8))
    m = _rk4_factor(s0, t_end=0.01)
    errs = []
    for n in (10, 20, 40):
        out = reverse_diffusion_ode(
            _linear_score_apply(s0), {"params": {}}, z, mask, cond, spk,
            n_timesteps=n,
        )
        errs.append(float(np.abs(np.asarray(out) - np.asarray(z) * m).max()))
    assert errs[0] > errs[1] > errs[2]
    assert errs[0] / errs[1] > 2.5  # ~4x for a clean 2nd-order scheme
    assert errs[1] / errs[2] > 2.5


def test_ode_sampler_masking_and_determinism():
    s0 = 1.0
    B, T, F = 2, 8, 4
    z = jax.random.normal(jax.random.PRNGKey(2), (B, T, F))
    mask = jnp.ones((B, T)).at[1, 5:].set(0.0)
    cond = jnp.zeros((B, T, F))
    spk = jnp.zeros((B, 8))
    out1 = reverse_diffusion_ode(
        _linear_score_apply(s0), {"params": {}}, z, mask, cond, spk,
        n_timesteps=8,
    )
    out2 = reverse_diffusion_ode(
        _linear_score_apply(s0), {"params": {}}, z, mask, cond, spk,
        n_timesteps=8,
    )
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert np.abs(np.asarray(out1)[1, 5:]).max() == 0.0
    assert np.isfinite(np.asarray(out1)).all()


def test_ode_sampler_cfg_rows_smoke():
    """Dual-CFG path builds the 3x-batched rows like the DDPM sampler; a
    fake score that depends on the conditioning must change the output."""
    from unitspeech_tpu.models.diffusion import UnitSpeech

    cfgkw = dict(n_feats=8, dim=8, dim_mults=(1, 2), groups=4, spk_emb_dim=8)
    model = UnitSpeech(**cfgkw)
    B, T = 1, 8
    key = jax.random.PRNGKey(3)
    z = jax.random.normal(key, (B, T, 8))
    mask = jnp.ones((B, T))
    cond = jax.random.normal(jax.random.fold_in(key, 1), (B, T, 8))
    spk = jax.random.normal(jax.random.fold_in(key, 2), (B, 8))
    params = model.init(jax.random.fold_in(key, 3), z, mask, cond,
                        jnp.zeros((B,)), spk)
    out = reverse_diffusion_ode(
        model.apply, params, z, mask, cond, spk,
        n_timesteps=4, text_gradient_scale=1.0, spk_gradient_scale=1.0,
    )
    out0 = reverse_diffusion_ode(
        model.apply, params, z, mask, cond, spk, n_timesteps=4,
    )
    assert np.isfinite(np.asarray(out)).all()
    assert np.abs(np.asarray(out) - np.asarray(out0)).max() > 0
