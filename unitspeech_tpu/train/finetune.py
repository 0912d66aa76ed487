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


def _finetune_scan(
    decoder_apply,
    decoder_params,
    cond_x,
    y,
    y_lengths,
    attn,
    spk_emb,
    key,
    segment_size: int,
    n_iters: int,
    learning_rate: float,
    grad_clip: float,
    beta_min: float,
    beta_max: float,
):
    """Unjitted fine-tune scan core — wrapped by `finetune_decoder` (jit) and
    vmapped by `finetune_decoder_batched` (speaker-per-chip)."""
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
    return _finetune_scan(
        decoder_apply, decoder_params, cond_x, y, y_lengths, attn, spk_emb,
        key, segment_size, n_iters, learning_rate, grad_clip, beta_min,
        beta_max,
    )


def finetune_decoder_batched(
    decoder_apply,
    stacked_params,
    cond_x,
    y,
    y_lengths,
    attn,
    spk_emb,
    keys,
    mesh=None,
    segment_size: int = 176,
    n_iters: int = 500,
    learning_rate: float = 2e-5,
    grad_clip: float = 1.0,
    beta_min: float = 0.05,
    beta_max: float = 20.0,
):
    """Adapt S speakers CONCURRENTLY — the TPU-native replacement for the
    reference eval driver's sequential per-speaker fine-tune loop
    (evaluation_generate_samples.py:150-353 fine-tunes one speaker at a time
    on one GPU; here each chip runs one adaptation in parallel).

    Every array input carries a leading speaker axis: stacked_params is the
    base decoder params tree with each leaf stacked to (S, ...) (one optimizer
    trajectory per speaker), cond_x (S, 1, Tx, F), y (S, 1, Ty, F),
    y_lengths (S, 1), attn (S, 1, Tx, Ty), spk_emb (S, 1, E), keys (S, 2).
    With `mesh`, the speaker axis shards over its 'data' axis via shard_map —
    the adaptations are embarrassingly parallel, so each chip runs its own
    500-step loop with NO collectives (vmap is deliberately avoided: batching
    the conv kernels over speakers lowers to grouped convs, which the final
    1-channel score conv cannot express). S must divide by the mesh's data
    axis; each device lax.map's over its local speakers (usually 1).
    Returns (adapted stacked params, losses (S, n_iters))."""

    def one(args):
        p, c, yy, yl, a, s, k = args
        return _finetune_scan(
            decoder_apply, p, c, yy, yl, a, s, k, segment_size, n_iters,
            learning_rate, grad_clip, beta_min, beta_max,
        )

    def local_fn(*args):
        return lax.map(one, args)

    args = (stacked_params, cond_x, y, y_lengths, attn, spk_emb, keys)
    if mesh is None:
        return jax.jit(local_fn)(*args)

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    n_data = mesh.shape["data"]
    n_speakers = keys.shape[0]
    if n_speakers % n_data != 0:
        raise ValueError(
            f"speaker count {n_speakers} must divide by the mesh data axis "
            f"({n_data}) for speaker-per-chip fine-tuning"
        )
    spec = P("data")
    fn = jax.jit(
        shard_map(
            local_fn, mesh=mesh,
            in_specs=(spec,) * len(args), out_specs=spec,
        )
    )
    args = jax.device_put(args, NamedSharding(mesh, spec))
    return fn(*args)


def prepare_finetune_inputs(
    unit_encoder, unit_encoder_params, units, durations, mel,
    num_downsamplings: int = 3, pad_to: int | None = None,
):
    """Host-side prep mirroring reference finetune.py:111-129: encode units
    once (frozen), build the duration alignment, pad mel to U-Net-compatible
    length.

    units/durations: (Tx,) int arrays; mel: (Ty, F) normalized.
    pad_to: pad BOTH the token and frame axes to this bucket (must be a
    fix_len_compatibility multiple >= Ty) so every reference duration in a
    ladder shares ONE compiled finetune executable (the warm-session path,
    `cli.py warmup-adapt`). The encoder masks padded tokens and the segment
    crop is bounded by the true y_lengths, so bucketing is numerics-neutral
    (tests/test_train_steps.py::test_finetune_bucketed_matches_exact).
    Returns (cond_x, y, y_lengths, attn)."""
    import numpy as _np

    units = _np.asarray(units)[None]  # (1, Tx)
    durations = _np.asarray(durations, _np.float32)[None]
    t_x = units.shape[1]
    t_y = mel.shape[0]
    t_y_pad = fix_len_compatibility(t_y, num_downsamplings)
    if pad_to is not None:
        if pad_to < max(t_y_pad, t_x) or pad_to != fix_len_compatibility(
            pad_to, num_downsamplings
        ):
            raise ValueError(
                f"pad_to={pad_to} must be a U-Net-compatible length >= "
                f"(frames {t_y_pad}, tokens {t_x})"
            )
        t_y_pad = pad_to
        units = _np.pad(units, ((0, 0), (0, pad_to - t_x)))
        durations = _np.pad(durations, ((0, 0), (0, pad_to - t_x)))
    y = _np.pad(_np.asarray(mel), ((0, t_y_pad - t_y), (0, 0)))[None]

    # ONE jitted program for the device-side prep: running the encoder
    # eagerly costs thousands of ~25-35 ms per-op dispatches on the
    # tunneled TPU (measured: the whole eager prep was ~390-480 s of a
    # cold adapt session; jitted it is one cacheable compile + one call)
    cond_x, attn = _prepare_jit(
        unit_encoder, unit_encoder_params, jnp.asarray(units),
        jnp.asarray(durations), jnp.array([t_x]), jnp.array([t_y]), t_y_pad,
    )
    return cond_x, jnp.asarray(y), jnp.array([t_y]), attn


@partial(jax.jit, static_argnames=("unit_encoder", "t_y_pad"))
def _prepare_jit(unit_encoder, params, units, durations, t_x, t_y,
                 t_y_pad: int):
    cond_x, _, x_mask = unit_encoder.apply(params, units, t_x)
    cond_x = jax.lax.stop_gradient(cond_x)
    y_mask = sequence_mask(t_y, t_y_pad)
    attn = generate_path(durations, x_mask * y_mask[:, None, :])
    return cond_x, attn
