"""Speaker-adaptive fine-tuning of the diffusion decoder.

TPU-native equivalent of the reference's 500-iteration adaptation loop
(/root/reference/finetune.py:34-173 calling UnitSpeech.fine_tune,
unitspeech.py:452-492): Adam(2e-5) over ALL decoder parameters on random 2 s
segments of one reference utterance, conditioning (unit-encoder output) and
alignment frozen.

The whole loop is ONE jit-compiled `lax.scan` of n_iters optimizer steps —
the reference pays a Python-loop + kernel-launch round trip per iteration;
this compiles once and keeps the chip busy for the full 500 steps (the <30 s
fine-tune target in BASELINE.md rests on this).
"""

from __future__ import annotations

from functools import partial


import jax
import jax.numpy as jnp
import optax
from jax import lax

from unitspeech_tpu.models.diffusion import UnitSpeech, fine_tune_loss
from unitspeech_tpu.ops.masking import fix_len_compatibility, generate_path, sequence_mask
from unitspeech_tpu.train.steps import clip_by_global_norm


@partial(
    jax.jit,
    static_argnames=(
        "decoder_apply", "segment_size", "n_iters", "learning_rate",
        "grad_clip", "beta_min", "beta_max",
    ),
    donate_argnums=(1,),
)
def finetune_decoder(
    decoder_apply,
    decoder_params,
    cond_x,
    y,
    y_lengths,
    attn,
    spk_emb,
    key,
    segment_size: int = 176,
    n_iters: int = 500,
    learning_rate: float = 2e-5,
    grad_clip: float = 1.0,
    beta_min: float = 0.05,
    beta_max: float = 20.0,
):
    """Run the full fine-tune loop on device.

    cond_x: (1, Tx, F) frozen unit-encoder output; y: (1, Ty, F) normalized
    mel; attn: (1, Tx, Ty); spk_emb: (1, S).
    Returns (adapted decoder params, per-iteration losses (n_iters,))."""
    tx = optax.adam(learning_rate)
    opt_state = tx.init(decoder_params)

    def body(carry, i):
        params, opt_state = carry
        k = jax.random.fold_in(key, i)

        def loss_fn(p):
            return fine_tune_loss(
                decoder_apply, p, cond_x, y, y_lengths, attn, spk_emb,
                segment_size, k, beta_min, beta_max,
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads, _ = clip_by_global_norm(grads, grad_clip)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    (decoder_params, _), losses = lax.scan(
        body, (decoder_params, opt_state), jnp.arange(n_iters)
    )
    return decoder_params, losses


def prepare_finetune_inputs(
    unit_encoder, unit_encoder_params, units, durations, mel, num_downsamplings: int = 3
):
    """Host-side prep mirroring reference finetune.py:111-129: encode units
    once (frozen), build the duration alignment, pad mel to U-Net-compatible
    length.

    units/durations: (Tx,) int arrays; mel: (Ty, F) normalized.
    Returns (cond_x, y, y_lengths, attn)."""
    units = jnp.asarray(units)[None]  # (1, Tx)
    durations = jnp.asarray(durations, jnp.float32)[None]
    t_x = units.shape[1]
    t_y = mel.shape[0]
    t_y_pad = fix_len_compatibility(t_y, num_downsamplings)
    y = jnp.pad(jnp.asarray(mel), ((0, t_y_pad - t_y), (0, 0)))[None]

    cond_x, _, x_mask = unit_encoder.apply(
        unit_encoder_params, units, jnp.array([t_x])
    )
    cond_x = jax.lax.stop_gradient(cond_x)
    y_mask = sequence_mask(jnp.array([t_y]), t_y_pad)
    attn = generate_path(durations, x_mask * y_mask[:, None, :])
    return cond_x, y, jnp.array([t_y]), attn
