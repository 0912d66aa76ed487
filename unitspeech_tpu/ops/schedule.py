"""Diffusion noise-schedule math, closed form.

TPU-native equivalent of the reference's buffer-registration approach
(/root/reference/unitspeech/unitspeech.py:204-268, 333-347): instead of
mutating 13 registered torch buffers per `reverse_diffusion` call, the whole
schedule is a pure function of (n_timesteps, beta_min, beta_max), computed
once on host in float64 and folded into THREE fused per-step scalars that the
`lax.scan` sampler consumes:

    x_{i+1} = (c_x[i] * x_i + c_score[i] * score_i + c_noise[i] * eps) * mask

Derivation. The reference builds, per call (unitspeech.py:335-347):
    t_i = 1 - (i + 0.5)/N,  ac_i = exp(-Lambda(t_i)),
    betas = 1 - ac[:-1]/ac[1:], flipped ascending, then the 13 DDPM buffers.
In ascending index j (= N-1-i), alphas_cumprod[j] == exp(-Lambda((j+0.5)/N))
exactly, so every buffer has a closed form; the per-step update
(p_mean_variance at :293 with eta=1 plus the noise injection at :366-370)
collapses to the three scalars above. Verified against the reference algebra
in tests/test_schedule.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class NoiseSchedule:
    beta_min: float = 0.05
    beta_max: float = 20.0


def get_noise(t, beta_min: float, beta_max: float, cumulative: bool = False):
    """beta(t) or Lambda(t) = int_0^t beta(s) ds for the linear schedule.

    Reference: unitspeech.py:204-209.
    """
    if cumulative:
        return beta_min * t + 0.5 * (beta_max - beta_min) * (t ** 2)
    return beta_min + (beta_max - beta_min) * t


def forward_diffusion_coefficients(t, beta_min: float, beta_max: float):
    """Coefficients of q(x_t | x_0): mean = x0 * mean_coef, std.

    Reference forward_diffusion (unitspeech.py:376-384):
      mean = x0 * exp(-0.5 * Lambda(t)),  var = 1 - exp(-Lambda(t)).
    Returns (mean_coef, std) with the same shape as t.
    """
    cum = get_noise(t, beta_min, beta_max, cumulative=True)
    mean_coef = jnp.exp(-0.5 * cum)
    std = jnp.sqrt(1.0 - jnp.exp(-cum))
    return mean_coef, std


@dataclass(frozen=True)
class ReverseSchedule:
    """Per-step fused coefficients, in sampler order (step 0 = t closest to 1).

    Arrays all have shape (n_timesteps,), float32:
      t_cont:  continuous time fed to the score estimator
      c_x:     coefficient on the current sample
      c_score: coefficient on the (CFG-combined) score
      c_noise: coefficient on fresh standard normal noise (0 at the last step)
    """

    n_timesteps: int
    t_cont: np.ndarray
    c_x: np.ndarray
    c_score: np.ndarray
    c_noise: np.ndarray

    def stacked(self):
        """(n_timesteps, 4) array convenient for lax.scan's xs argument."""
        return jnp.stack(
            [
                jnp.asarray(self.t_cont),
                jnp.asarray(self.c_x),
                jnp.asarray(self.c_score),
                jnp.asarray(self.c_noise),
            ],
            axis=1,
        )


@lru_cache(maxsize=64)
def make_reverse_schedule(
    n_timesteps: int, beta_min: float = 0.05, beta_max: float = 20.0, eta: float = 1.0
) -> ReverseSchedule:
    """Build the fused reverse-DDPM schedule (host-side, float64).

    Matches reference register_beta (unitspeech.py:235-268) +
    p_mean_variance/q_posterior (:273-296) + the sampling update (:360-370)
    exactly, modulo float64-vs-float32 accumulation order.
    """
    n = n_timesteps
    j = np.arange(n, dtype=np.float64)  # ascending buffer index
    t = (j + 0.5) / n  # t_j in (0, 1); sampler visits descending
    lam = beta_min * t + 0.5 * (beta_max - beta_min) * t ** 2
    ac = np.exp(-lam)  # alphas_cumprod[j]
    ac_prev = np.concatenate([[1.0], ac[:-1]])  # alphas_cumprod_prev
    beta = 1.0 - ac / ac_prev
    pv = beta * (1.0 - ac_prev) / (1.0 - ac)  # posterior_variance
    sigma2 = (eta ** 2) * pv

    sqrt_om_ac = np.sqrt(1.0 - ac)
    # mean = sqrt(ac_prev) * x_recon - sqrt(1 - ac_prev - sigma^2) * score * sqrt(1-ac)
    # x_recon = x/sqrt(ac) + sqrt(1/ac - 1) * sqrt(1-ac) * score
    c_x = np.sqrt(ac_prev / ac)
    c_score = np.sqrt(ac_prev) * np.sqrt(1.0 / ac - 1.0) * sqrt_om_ac - np.sqrt(
        np.clip(1.0 - ac_prev - sigma2, 0.0, None)
    ) * sqrt_om_ac
    c_noise = eta * np.sqrt(pv)
    c_noise[0] = 0.0  # idx == 0 is the final step: no noise (unitspeech.py:369)

    # Sampler order: step i uses idx = n-1-i (descending t).
    rev = slice(None, None, -1)
    return ReverseSchedule(
        n_timesteps=n,
        t_cont=t[rev].astype(np.float32).copy(),
        c_x=c_x[rev].astype(np.float32).copy(),
        c_score=c_score[rev].astype(np.float32).copy(),
        c_noise=c_noise[rev].astype(np.float32).copy(),
    )


@dataclass(frozen=True)
class OdeSchedule:
    """Per-step coefficients for the DPM-Solver++(2M) probability-flow ODE
    sampler (deterministic; no noise injection).

    The reference samples ONLY with the 50/500-step stochastic DDPM loop
    (unitspeech.py:333-374); this schedule powers the framework's opt-in
    fast serving mode — the Grad-TTS family UnitSpeech builds on samples
    its reverse process with coarse ODE solvers (Grad-TTS uses 10-50 Euler
    steps), and a second-order multistep solver reaches comparable sample
    quality at ~half the DDPM step count, which is the single biggest
    remaining latency lever on one chip (each step is a full 3x-batched
    U-Net call).

    Arrays (n_timesteps,), float32 — step i advances t_{i-1} -> t_i:
      t_eval:  time the score estimator is evaluated at (t_{i-1})
      a:       sigma_i / sigma_{i-1}                   (carry coefficient)
      b:       alpha_i * (1 - exp(-h_i))               (data-pred coefficient)
      c1, c2:  D_i = c1*x0(x_{i-1}) + c2*x0_prev       (2M multistep weights;
               first step c1=1, c2=0 — a DDIM step)
      inv_alpha, sigma2: of t_{i-1}, to form x0 = (x + sigma^2*score)/alpha
    """

    n_timesteps: int
    t_eval: np.ndarray
    a: np.ndarray
    b: np.ndarray
    c1: np.ndarray
    c2: np.ndarray
    inv_alpha: np.ndarray
    sigma2: np.ndarray

    def stacked(self):
        return jnp.stack(
            [jnp.asarray(v) for v in (
                self.t_eval, self.a, self.b, self.c1, self.c2,
                self.inv_alpha, self.sigma2,
            )],
            axis=1,
        )  # (N, 7)


def _lambda_of_t(t, beta_min, beta_max):
    lam_cum = beta_min * t + 0.5 * (beta_max - beta_min) * t ** 2
    alpha2 = np.exp(-lam_cum)
    sigma2 = 1.0 - alpha2
    return 0.5 * (np.log(alpha2) - np.log(sigma2))


@lru_cache(maxsize=64)
def make_ode_schedule(
    n_timesteps: int, beta_min: float = 0.05, beta_max: float = 20.0,
    t_start: float = 1.0, t_end: float = 0.01,
) -> OdeSchedule:
    """DPM-Solver++(2M) coefficients on a uniform log-SNR (lambda) grid from
    t_start down to t_end (default matches the 50-step DDPM grid's finest
    midpoint 0.5/50). Host-side float64; the t(lambda) inversion is a
    bisection on the monotone lambda(t)."""
    n = n_timesteps
    lam_a = _lambda_of_t(np.float64(t_start), beta_min, beta_max)
    lam_b = _lambda_of_t(np.float64(t_end), beta_min, beta_max)
    lams = np.linspace(lam_a, lam_b, n + 1)  # increasing (t decreasing)

    def t_of_lambda(lam):
        lo, hi = t_end * 1e-3, 1.0
        for _ in range(200):
            mid = 0.5 * (lo + hi)
            if _lambda_of_t(mid, beta_min, beta_max) > lam:
                lo = mid
            else:
                hi = mid
        return 0.5 * (lo + hi)

    ts = np.array([t_start] + [t_of_lambda(l) for l in lams[1:-1]] + [t_end])
    lam_cum = beta_min * ts + 0.5 * (beta_max - beta_min) * ts ** 2
    alpha = np.exp(-0.5 * lam_cum)
    sigma = np.sqrt(1.0 - alpha ** 2)

    h = lams[1:] - lams[:-1]  # (N,), positive
    a = sigma[1:] / sigma[:-1]
    b = alpha[1:] * (1.0 - np.exp(-h))
    c1 = np.ones(n)
    c2 = np.zeros(n)
    if n > 1:
        r = h[:-1] / h[1:]  # r_i = h_{i-1}/h_i for i >= 2
        c1[1:] = 1.0 + 1.0 / (2.0 * r)
        c2[1:] = -1.0 / (2.0 * r)
    return OdeSchedule(
        n_timesteps=n,
        t_eval=ts[:-1].astype(np.float32).copy(),
        a=a.astype(np.float32).copy(),
        b=b.astype(np.float32).copy(),
        c1=c1.astype(np.float32).copy(),
        c2=c2.astype(np.float32).copy(),
        inv_alpha=(1.0 / alpha[:-1]).astype(np.float32).copy(),
        sigma2=(sigma[:-1] ** 2).astype(np.float32).copy(),
    )
