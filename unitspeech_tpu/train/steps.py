"""Training losses and jitted train steps for STEP1 (base pretrain) and
STEP2 (unit-encoder training).

TPU-native equivalents of the reference's train loops:
  * STEP1 (/root/reference/train_STEP1.py:307-387): text encoder + duration
    predictor + diffusion decoder, MAS alignment, dur/prior/diff losses,
    25% speaker-embedding CFG dropout, per-module gradient clipping (5/5/2)
  * STEP2 (/root/reference/train_STEP2.py:238-305): unit encoder against a
    FROZEN decoder, alignment from stored unit durations via generate_path

Key departures, all TPU-motivated:
  * MAS runs on device inside the jitted step (ops/mas.py) — no host sync
    (the reference syncs to CPU Cython every batch, train_STEP1.py:344)
  * the random 2 s segment crop is a vmapped dynamic_slice, not a Python loop
  * data parallelism: the step jits over a `Mesh` with the batch sharded on
    the `data` axis and parameters replicated; XLA inserts the gradient
    all-reduces (see parallel/mesh.py) — the reference is single-GPU
  * explicit PRNG threading for dropout / CFG dropout / crop / diffusion time
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from unitspeech_tpu.models.diffusion import (
    UnitSpeech,
    diffusion_loss,
    random_segment_crop,
)
from unitspeech_tpu.models.duration import DurationPredictor
from unitspeech_tpu.models.encoder import Encoder
from unitspeech_tpu.ops.mas import maximum_path
from unitspeech_tpu.ops.masking import sequence_mask


def random_replace_rows(x, replacement, rate: float, key):
    """Replace exactly floor(B * rate) random rows of x (B, ...) with
    `replacement` (matching trailing shape). Exact-count semantics of the
    reference's random_replace_tensor (util.py:224-231)."""
    b = x.shape[0]
    n = int(b * rate)
    if n == 0:
        return x
    perm = jax.random.permutation(key, b)
    replace = jnp.zeros((b,), bool).at[perm[:n]].set(True)
    rep = jnp.broadcast_to(replacement, x.shape)
    return jnp.where(replace.reshape((b,) + (1,) * (x.ndim - 1)), rep, x)


def gaussian_log_prior(mu_x, y, x_mask, y_mask):
    """log N(y_frame; mu_token, I) for every (token, frame) pair
    (reference train_STEP1.py:336-342).

    mu_x: (B, Tx, F); y: (B, Ty, F) -> (B, Tx, Ty)."""
    n_feats = mu_x.shape[-1]
    const = -0.5 * math.log(2 * math.pi) * n_feats
    y_sq = -0.5 * jnp.einsum("byf->by", y ** 2)[:, None, :]
    cross = jnp.einsum("bxf,byf->bxy", mu_x, y)
    mu_sq = -0.5 * jnp.einsum("bxf->bx", mu_x ** 2)[:, :, None]
    return y_sq + cross + mu_sq + const


def duration_loss(logw, logw_, lengths):
    """Reference util.py:105-107."""
    return jnp.sum((logw - logw_) ** 2) / jnp.sum(lengths)


def prior_loss_fn(y, mu_y, y_mask, n_feats: int):
    """Reference train_STEP1.py:384-385."""
    mask3 = y_mask[:, :, None]
    loss = jnp.sum(0.5 * ((y - mu_y) ** 2 + math.log(2 * math.pi)) * mask3)
    return loss / (jnp.sum(mask3) * n_feats)


# ---------------------------------------------------------------------------
# STEP 1
# ---------------------------------------------------------------------------


def step1_loss(
    params: Dict[str, Any],
    batch: Dict[str, Any],
    key,
    text_encoder: Encoder,
    duration_predictor: DurationPredictor,
    decoder: UnitSpeech,
    out_size: int,
    spk_uncond=None,
    spk_dropout: float = 0.25,
    beta_min: float = 0.05,
    beta_max: float = 20.0,
):
    """Joint STEP1 loss. batch: tokens (B,Tx) int32, token_lengths (B,),
    mel (B,Ty,F) normalized to [-1,1], mel_lengths (B,), spk_emb (B,S).
    Returns (total, {dur, prior, diff})."""
    k_cfg, k_drop_te, k_drop_dp, k_crop, k_diff = jax.random.split(key, 5)
    tokens = batch["tokens"]
    token_lengths = batch["token_lengths"]
    y = batch["mel"]
    y_lengths = batch["mel_lengths"]
    spk_emb = batch["spk_emb"]
    n_feats = y.shape[-1]

    if spk_uncond is not None and spk_dropout > 0:
        spk_emb = random_replace_rows(spk_emb, spk_uncond, spk_dropout, k_cfg)

    mu_x, hidden, x_mask = text_encoder.apply(
        params["text_encoder"], tokens, token_lengths,
        deterministic=False, rngs={"dropout": k_drop_te},
    )
    logw = duration_predictor.apply(
        params["duration_predictor"], hidden, x_mask, g=spk_emb, reverse=True,
        deterministic=False, rngs={"dropout": k_drop_dp},
    )

    t_y = y.shape[1]
    y_mask = sequence_mask(y_lengths, t_y, dtype=x_mask.dtype)
    attn_mask = x_mask * y_mask[:, None, :]  # (B, Tx, Ty)

    log_prior = jax.lax.stop_gradient(
        gaussian_log_prior(jax.lax.stop_gradient(mu_x), y, x_mask, y_mask)
    )
    attn = jax.lax.stop_gradient(maximum_path(log_prior, attn_mask))

    logw_ = jnp.log(1e-8 + attn.sum(axis=-1)) * x_mask[..., 0]
    dur_loss = duration_loss(logw, logw_, token_lengths)

    if out_size is not None and out_size < t_y:
        y, attn, y_mask = random_segment_crop(y, attn, y_lengths, out_size, k_crop)

    mu_y = jnp.einsum("bxy,bxf->byf", attn, mu_x)
    diff_loss, _ = diffusion_loss(
        decoder.apply, params["decoder"], y, y_mask, mu_y, spk_emb, k_diff,
        beta_min, beta_max,
    )
    prior_loss = prior_loss_fn(y, mu_y, y_mask, n_feats)
    total = dur_loss + prior_loss + diff_loss
    return total, {"dur_loss": dur_loss, "prior_loss": prior_loss, "diff_loss": diff_loss}


# ---------------------------------------------------------------------------
# STEP 2
# ---------------------------------------------------------------------------


def step2_loss(
    unit_encoder_params,
    decoder_params,
    batch: Dict[str, Any],
    key,
    unit_encoder: Encoder,
    decoder: UnitSpeech,
    out_size: int,
    beta_min: float = 0.05,
    beta_max: float = 20.0,
):
    """Unit-encoder loss with frozen decoder. batch: units (B,Tx) int32,
    unit_lengths (B,), durations (B,Tx), mel (B,Ty,F), mel_lengths (B,),
    spk_emb (B,S). Returns (total, {prior, diff})."""
    from unitspeech_tpu.ops.masking import generate_path

    k_drop, k_crop, k_diff = jax.random.split(key, 3)
    units = batch["units"]
    unit_lengths = batch["unit_lengths"]
    durations = batch["durations"]
    y = batch["mel"]
    y_lengths = batch["mel_lengths"]
    spk_emb = batch["spk_emb"]
    n_feats = y.shape[-1]

    cond_x, _, x_mask = unit_encoder.apply(
        unit_encoder_params, units, unit_lengths,
        deterministic=False, rngs={"dropout": k_drop},
    )
    t_y = y.shape[1]
    y_mask = sequence_mask(y_lengths, t_y, dtype=x_mask.dtype)
    attn_mask = x_mask * y_mask[:, None, :]
    attn = generate_path(durations, attn_mask)

    if out_size is not None and out_size < t_y:
        y, attn, y_mask = random_segment_crop(y, attn, y_lengths, out_size, k_crop)

    mu_y = jnp.einsum("bxy,bxf->byf", attn, cond_x)
    decoder_params_frozen = jax.lax.stop_gradient(decoder_params)
    diff_loss, _ = diffusion_loss(
        decoder.apply, decoder_params_frozen, y, y_mask, mu_y, spk_emb, k_diff,
        beta_min, beta_max,
    )
    prior_loss = prior_loss_fn(y, mu_y, y_mask, n_feats)
    total = prior_loss + diff_loss
    return total, {"prior_loss": prior_loss, "diff_loss": diff_loss}


# ---------------------------------------------------------------------------
# optimizer plumbing
# ---------------------------------------------------------------------------


def clip_by_global_norm(tree, max_norm: float):
    """Scale a gradient subtree so its global norm is <= max_norm (the
    reference clips each module separately, train_STEP1.py:229-249)."""
    leaves = jax.tree_util.tree_leaves(tree)
    gnorm = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in leaves))
    scale = jnp.minimum(1.0, max_norm / (gnorm + 1e-6))
    return jax.tree_util.tree_map(lambda g: g * scale, tree), gnorm


@dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: Any

    def tree_flatten(self):
        return (self.params, self.opt_state, self.step), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    TrainState, TrainState.tree_flatten, TrainState.tree_unflatten
)


def make_step1_train_step(
    text_encoder: Encoder,
    duration_predictor: DurationPredictor,
    decoder: UnitSpeech,
    optimizer: optax.GradientTransformation,
    out_size: int,
    spk_uncond=None,
    spk_dropout: float = 0.25,
    clip_norms: Tuple[float, float, float] = (5.0, 5.0, 2.0),
    beta_min: float = 0.05,
    beta_max: float = 20.0,
) -> Callable:
    """Returns jitted (state, batch, key) -> (state, metrics)."""

    def train_step(state: TrainState, batch, key):
        def loss_fn(params):
            return step1_loss(
                params, batch, key, text_encoder, duration_predictor, decoder,
                out_size, spk_uncond, spk_dropout, beta_min, beta_max,
            )

        (total, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        g_te, n_te = clip_by_global_norm(grads["text_encoder"], clip_norms[0])
        g_dp, n_dp = clip_by_global_norm(grads["duration_predictor"], clip_norms[1])
        g_dec, n_dec = clip_by_global_norm(grads["decoder"], clip_norms[2])
        grads = {"text_encoder": g_te, "duration_predictor": g_dp, "decoder": g_dec}
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(
            parts,
            total_loss=total,
            grad_norm_encoder=n_te,
            grad_norm_duration=n_dp,
            grad_norm_decoder=n_dec,
        )
        return TrainState(params, opt_state, state.step + 1), metrics

    return jax.jit(train_step, donate_argnums=(0,))


def make_step2_train_step(
    unit_encoder: Encoder,
    decoder: UnitSpeech,
    optimizer: optax.GradientTransformation,
    out_size: int,
    clip_norm: float = 5.0,
    beta_min: float = 0.05,
    beta_max: float = 20.0,
) -> Callable:
    """Returns jitted (state, decoder_params, batch, key) -> (state, metrics).
    Only the unit encoder trains; the decoder is frozen
    (reference train_STEP2.py:124-131, 154-157)."""

    def train_step(state: TrainState, decoder_params, batch, key):
        def loss_fn(ue_params):
            return step2_loss(
                ue_params, decoder_params, batch, key, unit_encoder, decoder,
                out_size, beta_min, beta_max,
            )

        (total, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        grads, gnorm = clip_by_global_norm(grads, clip_norm)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(parts, total_loss=total, grad_norm=gnorm)
        return TrainState(params, opt_state, state.step + 1), metrics

    return jax.jit(train_step, donate_argnums=(0,))
