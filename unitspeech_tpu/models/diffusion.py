"""Score-based diffusion decoder (UnitSpeech / Grad-TTS family).

TPU-native re-design of the reference UnitSpeech class
(/root/reference/unitspeech/unitspeech.py:220-492):

  * the reverse-diffusion loop is a single jit-compiled `lax.scan` over
    host-precomputed fused schedule coefficients (ops/schedule.py) — the
    reference re-registers 13 buffers and runs a Python loop of N separate
    CUDA launches per synthesis (unitspeech.py:333-374)
  * dual classifier-free guidance is folded into ONE 3x-batched estimator
    call per step with the combine done inline (same algebra as
    classifier_free_guidance, unitspeech.py:298-331)
  * guidance scales are static (trace-time) arguments, like the reference's
    Python-float branches
  * explicit PRNG: the sampler derives per-step noise keys by fold_in
  * all tensors time-major channels-last: x (B, T, F), cond (B, T, F),
    mask (B, T), spk (B, S)

The learned unconditional embeddings (text_uncon over mel channels,
spk_uncon over the speaker space; reference :230-231) live beside the
estimator parameters in the same pytree.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from unitspeech_tpu.models.unet import GradLogPEstimator2d
from unitspeech_tpu.ops.masking import sequence_mask
from unitspeech_tpu.ops.schedule import (
    forward_diffusion_coefficients,
    make_ode_schedule,
    make_reverse_schedule,
)


class UnitSpeech(nn.Module):
    """Parameter container + score function. Sampling/losses are the pure
    functions below, driven through `.apply`."""

    n_feats: int = 80
    dim: int = 128
    dim_mults: Tuple[int, ...] = (1, 2, 4, 8)
    groups: int = 8
    beta_min: float = 0.05
    beta_max: float = 20.0
    pe_scale: float = 1000.0
    spk_emb_dim: int = 256
    dtype: Any = jnp.float32
    use_pallas_attention: bool = False
    use_pallas_resnet: bool = False
    use_int8_deep: bool = False
    use_pallas_deep: bool = False
    use_i8pre_deep: bool = False
    use_pallas_resample: bool = False
    glue_mish: str = "exact"
    tap_mode: str = "taps"

    def setup(self):
        self.text_uncon = self.param(
            "text_uncon", nn.initializers.zeros, (self.n_feats,)
        )
        self.spk_uncon = self.param(
            "spk_uncon", nn.initializers.zeros, (self.spk_emb_dim,)
        )
        self.estimator = GradLogPEstimator2d(
            dim=self.dim,
            dim_mults=self.dim_mults,
            groups=self.groups,
            pe_scale=self.pe_scale,
            spk_emb_dim=self.spk_emb_dim,
            dtype=self.dtype,
            use_pallas_attention=self.use_pallas_attention,
            use_pallas_resnet=self.use_pallas_resnet,
            use_int8_deep=self.use_int8_deep,
            use_pallas_deep=self.use_pallas_deep,
            use_i8pre_deep=self.use_i8pre_deep,
            use_pallas_resample=self.use_pallas_resample,
            glue_mish=self.glue_mish,
            tap_mode=self.tap_mode,
        )

    def __call__(self, xt, mask, cond, t, spk_emb):
        """Score estimate. xt/cond: (B, T, F); mask: (B, T); t: (B,);
        spk_emb: (B, S) -> (B, T, F)."""
        return self.estimator(xt, mask, cond, t, spk_emb)

    @classmethod
    def from_config(cls, cfg, dtype=jnp.float32, use_pallas_attention=False,
                    use_pallas_resnet=False, use_int8_deep=False,
                    use_pallas_deep=False, use_pallas_resample=False,
                    use_i8pre_deep=False,
                    glue_mish="exact", tap_mode="taps"):
        return cls(
            n_feats=cfg.n_feats,
            dim=cfg.dim,
            dim_mults=tuple(cfg.dim_mults),
            groups=cfg.groups,
            beta_min=cfg.beta_min,
            beta_max=cfg.beta_max,
            pe_scale=cfg.pe_scale,
            spk_emb_dim=cfg.spk_emb_dim,
            dtype=dtype,
            use_pallas_attention=use_pallas_attention,
            use_pallas_resnet=use_pallas_resnet,
            use_int8_deep=use_int8_deep,
            use_pallas_deep=use_pallas_deep,
            use_pallas_resample=use_pallas_resample,
            use_i8pre_deep=use_i8pre_deep,
            glue_mish=glue_mish,
            tap_mode=tap_mode,
        )


def _uncond_embeddings(params):
    p = params["params"]
    return p["text_uncon"], p["spk_uncon"]


def parse_sampler_spec(spec: str) -> Tuple[str, int]:
    """Parse a sampler spec string: `"ddpm"` / `"dpm2"`, optionally with a
    guidance-stride suffix `":cs<k>"` (e.g. `"dpm2:cs2"`).

    The suffix enables CFG delta caching (see `reverse_diffusion`'s
    `cfg_stride`): the two unconditional guidance rows are recomputed only
    every k-th step and their epsilon-space deltas reused in between — the
    estimator runs 3x-batched on 1/k of the steps and 1x-batched on the
    rest. Encoding it in the sampler string lets the stride ride every
    serving path (exact/forced/speculative/bucket-switch/daemon) whose
    static `sampler` argument and batch group keys already exist.

    Returns (name, cfg_stride); raises ValueError on a malformed spec."""
    name, _, opt = str(spec).partition(":")
    stride = 1
    if opt:
        if not (opt.startswith("cs") and opt[2:].isdigit() and int(opt[2:]) >= 1):
            raise ValueError(
                f"bad sampler option {opt!r} in {spec!r} (expected 'cs<k>')"
            )
        stride = int(opt[2:])
    if name not in ("ddpm", "dpm2"):
        raise ValueError(f"unknown sampler {name!r} (expected 'ddpm' or 'dpm2')")
    return name, stride


def build_cfg_rows(
    params, mask, cond, spk_emb,
    text_gradient_scale: float, spk_gradient_scale: float,
):
    """Precompute the loop-invariant guidance rows (conditioning, speaker,
    mask) and the score-combination function. Doing this ONCE outside the
    sampling scan avoids re-concatenating the conditioning tensors at every
    step (the reference rebuilds them per call, unitspeech.py:298-331).

    Row layout when both scales > 0 follows the reference: conditioning rows
    (text_uncon, cond, cond) x speaker rows (spk, spk_uncon, spk).
    Returns (cond_c, spk_c, mask_c, n_rows, combine(s_all) -> score)."""
    b = mask.shape[0]
    tg, sg = float(text_gradient_scale), float(spk_gradient_scale)

    if tg <= 0.0 and sg <= 0.0:
        return cond, spk_emb, mask, 1, lambda s_all: s_all
    text_uncon, spk_uncon = _uncond_embeddings(params)

    text_uncon_b = jnp.broadcast_to(text_uncon[None, None, :], cond.shape)
    # unit-normalize like the reference (unitspeech.py:358); the epsilon only
    # matters for untrained zero-init params (0/0 -> NaN otherwise)
    spk_norm = jnp.maximum(jnp.linalg.norm(spk_uncon), 1e-8)
    spk_uncon_b = jnp.broadcast_to((spk_uncon / spk_norm)[None, :], spk_emb.shape)

    if tg > 0.0 and sg > 0.0:
        cond_c = jnp.concatenate([text_uncon_b, cond, cond], axis=0)
        spk_c = jnp.concatenate([spk_emb, spk_uncon_b, spk_emb], axis=0)
        mask_c = jnp.concatenate([mask, mask, mask], axis=0)

        def combine(s_all):
            s_tu, s_su, s = s_all[:b], s_all[b : 2 * b], s_all[2 * b :]
            return s + tg * (s - s_tu) + sg * (s - s_su)

        return cond_c, spk_c, mask_c, 3, combine
    if tg > 0.0:
        cond_c = jnp.concatenate([text_uncon_b, cond], axis=0)
        spk_c = jnp.concatenate([spk_emb, spk_emb], axis=0)
        mask_c = jnp.concatenate([mask, mask], axis=0)

        def combine(s_all):
            s_tu, s = s_all[:b], s_all[b:]
            return s + tg * (s - s_tu)

        return cond_c, spk_c, mask_c, 2, combine
    cond_c = jnp.concatenate([cond, cond], axis=0)
    spk_c = jnp.concatenate([spk_uncon_b, spk_emb], axis=0)
    mask_c = jnp.concatenate([mask, mask], axis=0)

    def combine(s_all):
        s_su, s = s_all[:b], s_all[b:]
        return s + sg * (s - s_su)

    return cond_c, spk_c, mask_c, 2, combine


def cfg_score(
    apply_fn,
    params,
    xt,
    mask,
    cond,
    t,
    spk_emb,
    text_gradient_scale: float,
    spk_gradient_scale: float,
):
    """Dual classifier-free guidance, one batched estimator call.

    Exact algebra of the reference (unitspeech.py:298-331):
      score = s + tg*(s - s_text_uncon) + sg*(s - s_spk_uncon)
    Scales must be Python floats (static)."""
    cond_c, spk_c, mask_c, n_rows, combine = build_cfg_rows(
        params, mask, cond, spk_emb, text_gradient_scale, spk_gradient_scale
    )
    xt_c = jnp.concatenate([xt] * n_rows, axis=0) if n_rows > 1 else xt
    t_c = jnp.concatenate([t] * n_rows, axis=0) if n_rows > 1 else t
    return combine(apply_fn(params, xt_c, mask_c, cond_c, t_c, spk_c))


@partial(
    jax.jit,
    static_argnames=(
        "apply_fn",
        "n_timesteps",
        "text_gradient_scale",
        "spk_gradient_scale",
        "beta_min",
        "beta_max",
        "cfg_stride",
        "mesh",
        "sample_spec",
    ),
)
def reverse_diffusion(
    apply_fn,
    params,
    z,
    mask,
    cond,
    spk_emb,
    key,
    n_timesteps: int = 50,
    text_gradient_scale: float = 0.0,
    spk_gradient_scale: float = 0.0,
    beta_min: float = 0.05,
    beta_max: float = 20.0,
    cfg_stride: int = 1,
    mesh=None,
    sample_spec=None,
    noises=None,
):
    """Reverse DDPM sampling, one lax.scan (reference unitspeech.py:333-374).

    z/cond: (B, T, F); mask: (B, T); spk_emb: (B, S). Returns mel (B, T, F).

    `noises` (optional, (n_timesteps, B, T, F)): pre-drawn per-step noise used
    instead of the PRNG — for deterministic parity against the reference torch
    loop (which draws torch.randn per step, unitspeech.py:366).

    Sharded inference (SURVEY.md §5): pass a `jax.sharding.Mesh` and a
    `PartitionSpec` for the (B, T, F) sample — e.g. P("data", "seq", None) —
    and XLA keeps the diffusion state sharded across chips for every step,
    inserting the collectives the linear attention's global softmax needs.
    Both are hashable and static.

    `cfg_stride > 1` enables CFG DELTA CACHING: the unconditional guidance
    rows are evaluated only on every `cfg_stride`-th step; in-between steps
    run the estimator on the conditional row alone and reuse the cached
    guidance delta. The delta is cached in EPSILON space (delta * std_t) and
    rescaled by 1/std_t at reuse — the score-space delta diverges as 1/std
    at small t, so the eps-space parameterization is the one that changes
    smoothly along the trajectory (the estimator is trained so that
    score*std approximates -noise, `diffusion_loss_t`). Numerics change vs
    stride 1 (quality-gated at full size like the dpm2 fast mode:
    tools/cfg_gate.py); stride 1 is the exact reference algebra."""
    sched = make_reverse_schedule(n_timesteps, beta_min, beta_max)
    coeffs = sched.stacked()  # (N, 4): t, c_x, c_score, c_noise

    def constrain(x):
        if mesh is None or sample_spec is None:
            return x
        from jax.sharding import NamedSharding

        return lax.with_sharding_constraint(x, NamedSharding(mesh, sample_spec))

    mask3 = mask[:, :, None]
    cond = constrain(cond)
    xt = constrain(z * mask3)

    # guidance rows are loop-invariant: build them ONCE outside the scan
    cond_c, spk_c, mask_c, n_rows, combine = build_cfg_rows(
        params, mask, cond, spk_emb, text_gradient_scale, spk_gradient_scale
    )

    if cfg_stride > 1 and n_rows > 1:
        if noises is not None:
            raise ValueError(
                "noises injection (reference-parity path) requires cfg_stride=1"
            )
        # stride > n_timesteps would leave groups=0 and statically unroll
        # EVERY step as a full guidance call (compile blowup, no caching
        # win); stride == n_timesteps is the max meaningful value (one
        # refresh, all later steps cached)
        return _reverse_diffusion_strided(
            apply_fn, params, xt, mask, cond, spk_emb, key, coeffs,
            n_timesteps, min(cfg_stride, n_timesteps), beta_min, beta_max,
            cond_c, spk_c, mask_c, n_rows, combine, mask3, constrain,
        )

    def step(carry, inp):
        xt = carry
        if noises is None:
            i, sc = inp
            noise = jax.random.normal(jax.random.fold_in(key, i), xt.shape)
        else:
            i, sc, noise = inp
        xt_c = jnp.concatenate([xt] * n_rows, axis=0) if n_rows > 1 else xt
        t_c = jnp.full((xt_c.shape[0],), sc[0], dtype=jnp.float32)
        score = combine(apply_fn(params, xt_c, mask_c, cond_c, t_c, spk_c))
        xt = constrain((sc[1] * xt + sc[2] * score + sc[3] * noise) * mask3)
        return xt, None

    xs = (jnp.arange(n_timesteps), coeffs)
    if noises is not None:
        xs = xs + (noises,)
    xt, _ = lax.scan(step, xt, xs)
    return xt * mask3


def _reverse_diffusion_strided(
    apply_fn, params, xt, mask, cond, spk_emb, key, coeffs,
    n_timesteps, cfg_stride, beta_min, beta_max,
    cond_c, spk_c, mask_c, n_rows, combine, mask3, constrain,
):
    """CFG-delta-cached DDPM sampling: scan over groups of `cfg_stride`
    steps — the group's first substep runs the full `n_rows`-batched
    guidance call and refreshes the cached eps-space delta; the remaining
    substeps (statically unrolled inside the body) run the 1-row
    conditional estimator and reuse it. Trailing `n % stride` steps run
    full, unrolled after the scan (the final small-t steps set fine detail,
    so the remainder is spent where caching error would matter most).
    No lax.cond: the group structure is static, which keeps the scan body
    a straight-line program for the TPU compiler."""
    b = mask.shape[0]
    groups = n_timesteps // cfg_stride
    rem = n_timesteps - groups * cfg_stride

    def full_step(xt, sc, i):
        noise = jax.random.normal(jax.random.fold_in(key, i), xt.shape)
        xt_c = jnp.concatenate([xt] * n_rows, axis=0)
        t_c = jnp.full((xt_c.shape[0],), sc[0], dtype=jnp.float32)
        s_all = apply_fn(params, xt_c, mask_c, cond_c, t_c, spk_c)
        guided = combine(s_all)
        _, std = forward_diffusion_coefficients(sc[0], beta_min, beta_max)
        delta_eps = (guided - s_all[-b:]) * std
        xt = constrain((sc[1] * xt + sc[2] * guided + sc[3] * noise) * mask3)
        return xt, delta_eps

    def cheap_step(xt, delta_eps, sc, i):
        noise = jax.random.normal(jax.random.fold_in(key, i), xt.shape)
        t_1 = jnp.full((b,), sc[0], dtype=jnp.float32)
        s = apply_fn(params, xt, mask, cond, t_1, spk_emb)
        _, std = forward_diffusion_coefficients(sc[0], beta_min, beta_max)
        guided = s + delta_eps / std
        return constrain((sc[1] * xt + sc[2] * guided + sc[3] * noise) * mask3)

    if groups > 0:
        coeffs_g = coeffs[: groups * cfg_stride].reshape(groups, cfg_stride, -1)

        def group(xt, inp):
            g, sc_g = inp
            i0 = g * cfg_stride
            xt, delta_eps = full_step(xt, sc_g[0], i0)
            for j in range(1, cfg_stride):
                xt = cheap_step(xt, delta_eps, sc_g[j], i0 + j)
            return xt, None

        xt, _ = lax.scan(group, xt, (jnp.arange(groups), coeffs_g))
    for j in range(rem):
        xt, _ = full_step(xt, coeffs[groups * cfg_stride + j],
                          groups * cfg_stride + j)
    return xt * mask3


@partial(
    jax.jit,
    static_argnames=(
        "apply_fn",
        "n_timesteps",
        "text_gradient_scale",
        "spk_gradient_scale",
        "beta_min",
        "beta_max",
        "t_end",
        "cfg_stride",
        "mesh",
        "sample_spec",
    ),
)
def reverse_diffusion_ode(
    apply_fn,
    params,
    z,
    mask,
    cond,
    spk_emb,
    n_timesteps: int = 25,
    text_gradient_scale: float = 0.0,
    spk_gradient_scale: float = 0.0,
    beta_min: float = 0.05,
    beta_max: float = 20.0,
    t_end: float = 0.01,
    cfg_stride: int = 1,
    mesh=None,
    sample_spec=None,
):
    """Deterministic probability-flow sampling with DPM-Solver++(2M)
    (ops/schedule.make_ode_schedule), one lax.scan. The framework's opt-in
    fast serving mode: a second-order multistep solver needs roughly half
    the DDPM step count for comparable sample quality, and every step is a
    full (up to 3x-batched CFG) estimator call — the dominant serving cost.

    The reference has no ODE sampler (its loop is the stochastic DDPM,
    unitspeech.py:333-374), but the Grad-TTS lineage it builds on samples
    with coarse ODE solvers; benchmarks report this mode under a separate
    label, never as the reference-parity 50-step number.

    Same signature family as reverse_diffusion minus the noise key (the
    flow is deterministic given z)."""
    sched = make_ode_schedule(n_timesteps, beta_min, beta_max,
                              t_end=float(t_end))
    coeffs = sched.stacked()  # (N, 7)

    def constrain(x):
        if mesh is None or sample_spec is None:
            return x
        from jax.sharding import NamedSharding

        return lax.with_sharding_constraint(x, NamedSharding(mesh, sample_spec))

    mask3 = mask[:, :, None]
    cond = constrain(cond)
    xt = constrain(z * mask3)

    cond_c, spk_c, mask_c, n_rows, combine = build_cfg_rows(
        params, mask, cond, spk_emb, text_gradient_scale, spk_gradient_scale
    )

    if cfg_stride > 1 and n_rows > 1:
        # clamp for the same unroll-blowup reason as the DDPM sampler
        return _reverse_diffusion_ode_strided(
            apply_fn, params, xt, mask, cond, spk_emb, coeffs,
            n_timesteps, min(cfg_stride, n_timesteps),
            cond_c, spk_c, mask_c, n_rows, combine, mask3, constrain,
        )

    def step(carry, sc):
        xt, x0_prev = carry
        t_eval, a, b, c1, c2, inv_alpha, sigma2 = (
            sc[0], sc[1], sc[2], sc[3], sc[4], sc[5], sc[6]
        )
        xt_c = jnp.concatenate([xt] * n_rows, axis=0) if n_rows > 1 else xt
        t_c = jnp.full((xt_c.shape[0],), t_eval, dtype=jnp.float32)
        score = combine(apply_fn(params, xt_c, mask_c, cond_c, t_c, spk_c))
        x0 = (xt + sigma2 * score) * inv_alpha
        d = c1 * x0 + c2 * x0_prev
        xt = constrain((a * xt + b * d) * mask3)
        return (xt, x0), None

    # first step's c2 is 0, so the x0_prev seed value never contributes
    (xt, _), _ = lax.scan(step, (xt, jnp.zeros_like(xt)), coeffs)
    return xt * mask3


def _reverse_diffusion_ode_strided(
    apply_fn, params, xt, mask, cond, spk_emb, coeffs,
    n_timesteps, cfg_stride,
    cond_c, spk_c, mask_c, n_rows, combine, mask3, constrain,
):
    """CFG-delta-cached DPM-Solver++(2M) sampling — same grouped-scan
    structure and eps-space delta parameterization as the DDPM variant
    (`_reverse_diffusion_strided`); the ODE schedule carries sigma^2 in its
    coefficients, so std_t = sqrt(sc[6]). The 2M multistep history (x0_prev)
    threads through full and cheap substeps identically."""
    b = mask.shape[0]
    groups = n_timesteps // cfg_stride
    rem = n_timesteps - groups * cfg_stride

    def advance(xt, x0_prev, sc, guided):
        x0 = (xt + sc[6] * guided) * sc[5]
        d = sc[3] * x0 + sc[4] * x0_prev
        xt = constrain((sc[1] * xt + sc[2] * d) * mask3)
        return xt, x0

    def full_step(xt, x0_prev, sc):
        xt_c = jnp.concatenate([xt] * n_rows, axis=0)
        t_c = jnp.full((xt_c.shape[0],), sc[0], dtype=jnp.float32)
        s_all = apply_fn(params, xt_c, mask_c, cond_c, t_c, spk_c)
        guided = combine(s_all)
        delta_eps = (guided - s_all[-b:]) * jnp.sqrt(sc[6])
        xt, x0 = advance(xt, x0_prev, sc, guided)
        return xt, x0, delta_eps

    def cheap_step(xt, x0_prev, delta_eps, sc):
        t_1 = jnp.full((b,), sc[0], dtype=jnp.float32)
        s = apply_fn(params, xt, mask, cond, t_1, spk_emb)
        guided = s + delta_eps / jnp.sqrt(sc[6])
        return advance(xt, x0_prev, sc, guided)

    x0_prev = jnp.zeros_like(xt)
    if groups > 0:
        coeffs_g = coeffs[: groups * cfg_stride].reshape(groups, cfg_stride, -1)

        def group(carry, sc_g):
            xt, x0_prev = carry
            xt, x0_prev, delta_eps = full_step(xt, x0_prev, sc_g[0])
            for j in range(1, cfg_stride):
                xt, x0_prev = cheap_step(xt, x0_prev, delta_eps, sc_g[j])
            return (xt, x0_prev), None

        (xt, x0_prev), _ = lax.scan(group, (xt, x0_prev), coeffs_g)
    for j in range(rem):
        xt, x0_prev, _ = full_step(xt, x0_prev, coeffs[groups * cfg_stride + j])
    return xt * mask3


def forward_diffusion(x0, mask, t, key, beta_min: float = 0.05, beta_max: float = 20.0):
    """q(x_t | x_0) sample (reference unitspeech.py:376-384).
    x0: (B, T, F); mask: (B, T); t: (B,). Returns (xt, z) both masked."""
    mean_coef, std = forward_diffusion_coefficients(
        t[:, None, None], beta_min, beta_max
    )
    z = jax.random.normal(key, x0.shape, dtype=x0.dtype)
    xt = x0 * mean_coef + z * std
    mask3 = mask[:, :, None]
    return xt * mask3, z * mask3


def diffusion_loss_t(
    apply_fn, params, x0, mask, cond, t, spk_emb, key,
    beta_min: float = 0.05, beta_max: float = 20.0,
):
    """Weighted score-matching MSE at given t (reference loss_t,
    unitspeech.py:393-405). Returns (loss, xt)."""
    n_feats = x0.shape[-1]
    mask3 = mask[:, :, None]
    xt, z = forward_diffusion(x0, mask, t, key, beta_min, beta_max)
    _, std = forward_diffusion_coefficients(t[:, None, None], beta_min, beta_max)
    noise_estimation = apply_fn(params, xt, mask, cond * mask3, t, spk_emb)
    noise_estimation = noise_estimation * std
    loss = jnp.sum((noise_estimation + z) ** 2) / (jnp.sum(mask) * n_feats)
    return loss, xt


def diffusion_loss(
    apply_fn, params, x0, mask, cond, spk_emb, key,
    beta_min: float = 0.05, beta_max: float = 20.0, offset: float = 1e-5,
):
    """Random-t diffusion loss (reference compute_loss, unitspeech.py:407-411)."""
    key_t, key_z = jax.random.split(key)
    t = jax.random.uniform(key_t, (x0.shape[0],), dtype=x0.dtype)
    t = jnp.clip(t, offset, 1.0 - offset)
    return diffusion_loss_t(
        apply_fn, params, x0, mask, cond, t, spk_emb, key_z, beta_min, beta_max
    )


def random_segment_crop(y, attn, y_lengths, segment_size: int, key):
    """Random fixed-size time crop of (mel, alignment) for fine-tune/training.

    Vectorized equivalent of the reference's per-sample Python loop
    (unitspeech.py:452-481 and train_STEP1.py:352-374): offsets drawn
    uniformly in [0, len - segment], short utterances zero-padded.

    y: (B, Ty, F); attn: (B, Tx, Ty); y_lengths: (B,).
    Returns (y_cut (B, seg, F), attn_cut (B, Tx, seg), y_cut_mask (B, seg)).
    """
    b, t_y, _ = y.shape
    if t_y < segment_size:
        pad = segment_size - t_y
        y = jnp.pad(y, ((0, 0), (0, pad), (0, 0)))
        attn = jnp.pad(attn, ((0, 0), (0, 0), (0, pad)))
        t_y = segment_size
    max_offset = jnp.clip(y_lengths - segment_size, 0, None)
    u = jax.random.uniform(key, (b,))
    offset = (u * (max_offset + 1).astype(jnp.float32)).astype(jnp.int32)
    offset = jnp.minimum(offset, max_offset.astype(jnp.int32))

    def cut_one(y_i, attn_i, off):
        y_c = lax.dynamic_slice_in_dim(y_i, off, segment_size, axis=0)
        a_c = lax.dynamic_slice_in_dim(attn_i, off, segment_size, axis=1)
        return y_c, a_c

    y_cut, attn_cut = jax.vmap(cut_one)(y, attn, offset)
    y_cut_lengths = jnp.minimum(y_lengths, segment_size)
    y_cut_mask = sequence_mask(y_cut_lengths, segment_size, dtype=y.dtype)
    return y_cut * y_cut_mask[:, :, None], attn_cut * y_cut_mask[:, None, :], y_cut_mask


def fine_tune_loss(
    apply_fn, params, cond_x, y, y_lengths, attn, spk_emb, segment_size: int, key,
    beta_min: float = 0.05, beta_max: float = 20.0,
):
    """Speaker-adaptation loss on a random segment (reference fine_tune,
    unitspeech.py:452-492). cond_x: (B, Tx, F) frozen unit-encoder output;
    y: (B, Ty, F); attn: (B, Tx, Ty)."""
    key_seg, key_loss = jax.random.split(key)
    y_cut, attn_cut, y_cut_mask = random_segment_crop(
        y, attn, y_lengths, segment_size, key_seg
    )
    cond_y = jnp.einsum("bxy,bxf->byf", attn_cut, cond_x)
    cond_y = cond_y * y_cut_mask[:, :, None]
    loss, _ = diffusion_loss(
        apply_fn, params, y_cut, y_cut_mask, cond_y, spk_emb, key_loss,
        beta_min, beta_max,
    )
    return loss
