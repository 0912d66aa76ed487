"""Adaptive text-to-speech pipeline (the hot path).

TPU-native equivalent of the reference's execute_text_to_speech orchestration
(/root/reference/unitspeech/unitspeech.py:413-450 driven by inference.py:34-160):

  phoneme IDs -> text encoder -> duration predictor -> generate_path ->
  aligned conditioning -> lax.scan reverse diffusion (dual CFG) ->
  denormalize -> BigVGAN -> waveform

Jit/recompile policy: output length is data dependent (duration output), so
the mel-frame axis is padded to a bucket from a fixed ladder; each (token
bucket, frame bucket, steps, CFG scales) tuple compiles once and is cached.
Everything from the encoder to the vocoder runs on device; only duration
rounding/bucket selection touches the host (one small transfer per utterance,
mirroring the reference's y_lengths sync at unitspeech.py:427-429).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from unitspeech_tpu.config import MainConfig
from unitspeech_tpu.models.diffusion import (
    UnitSpeech,
    parse_sampler_spec,
    reverse_diffusion,
    reverse_diffusion_ode,
)
from unitspeech_tpu.models.duration import DurationPredictor
from unitspeech_tpu.models.encoder import Encoder
from unitspeech_tpu.models.vocoder import BigVGAN
from unitspeech_tpu.ops.masking import (
    choose_bucket,
    default_frame_buckets,
    fix_len_compatibility,
    generate_path,
    sequence_mask,
)
from unitspeech_tpu.ops.mel import denormalize_mel


@dataclass
class TTSModels:
    """Bundle of modules + parameter pytrees for the synthesis path."""

    cfg: MainConfig
    text_encoder: Encoder
    text_encoder_params: Any
    duration_predictor: DurationPredictor
    duration_predictor_params: Any
    decoder: UnitSpeech
    decoder_params: Any
    vocoder: Optional[BigVGAN] = None
    vocoder_params: Any = None
    spk_emb: Any = None  # (1, spk_emb_dim), unit-normalized
    mel_min: Any = None  # (n_feats,)
    mel_max: Any = None

    @classmethod
    def random_init(cls, cfg: MainConfig, key, dtype=jnp.float32, with_vocoder=True,
                    use_pallas_vocoder=False, use_pallas_resnet=False,
                    use_pallas_attention=False, use_int8_deep=False,
                    use_pallas_deep=False, use_pallas_resample=False,
                    use_i8pre_deep=False,
                    glue_mish="exact", tap_mode="taps"):
        """Randomly initialized bundle at full config size (for benchmarks and
        shape tests; real weights come from the checkpoint converter)."""
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        text_encoder = Encoder.from_config(cfg.text_encoder)
        tokens = jnp.zeros((1, 8), jnp.int32)
        lengths = jnp.array([8])
        # jitted inits (eager per-op tunnel dispatch costs minutes at
        # full size; one cacheable compile instead)
        te_params = jax.jit(text_encoder.init)(k1, tokens, lengths)
        dp = DurationPredictor(
            in_channels=cfg.duration_predictor.in_channels,
            filter_channels=cfg.duration_predictor.filter_channels,
            kernel_size=cfg.duration_predictor.kernel_size,
            p_dropout=cfg.duration_predictor.p_dropout,
            spk_emb_dim=cfg.duration_predictor.spk_emb_dim,
        )
        hidden = jnp.zeros((1, 8, cfg.text_encoder.n_channels))
        mask = jnp.ones((1, 8, 1))
        spk = jax.random.normal(k5, (1, cfg.decoder.spk_emb_dim))
        spk = spk / jnp.linalg.norm(spk)
        dp_params = jax.jit(
            lambda k, h, m, g: dp.init(k, h, m, g=g, reverse=True)
        )(k2, hidden, mask, spk)
        decoder = UnitSpeech.from_config(
            cfg.decoder, dtype=dtype, use_pallas_resnet=use_pallas_resnet,
            use_pallas_attention=use_pallas_attention,
            use_int8_deep=use_int8_deep, use_pallas_deep=use_pallas_deep,
            use_pallas_resample=use_pallas_resample,
            use_i8pre_deep=use_i8pre_deep, glue_mish=glue_mish,
            tap_mode=tap_mode,
        )
        t8 = fix_len_compatibility(8, cfg.decoder.num_downsamplings)
        dec_params = jax.jit(decoder.init)(
            k3,
            jnp.zeros((1, t8, cfg.decoder.n_feats)),
            jnp.ones((1, t8)),
            jnp.zeros((1, t8, cfg.decoder.n_feats)),
            jnp.zeros((1,)),
            spk,
        )
        vocoder = vocoder_params = None
        if with_vocoder:
            vocoder = BigVGAN.from_config(
                cfg.vocoder, dtype=dtype, use_pallas=use_pallas_vocoder
            )
            vocoder_params = jax.jit(vocoder.init)(
                k4, jnp.zeros((1, 8, cfg.vocoder.num_mels))
            )
        return cls(
            cfg=cfg,
            text_encoder=text_encoder,
            text_encoder_params=te_params,
            duration_predictor=dp,
            duration_predictor_params=dp_params,
            decoder=decoder,
            decoder_params=dec_params,
            vocoder=vocoder,
            vocoder_params=vocoder_params,
            spk_emb=spk,
            mel_min=jnp.full((cfg.data.n_feats,), -12.0),
            mel_max=jnp.full((cfg.data.n_feats,), 3.0),
        )


@partial(jax.jit, static_argnames=("text_encoder", "duration_predictor"))
def _encode_and_duration(
    text_encoder, te_params, duration_predictor, dp_params, packed, spk_emb
):
    """packed: ONE (B, TB + 1) int32 host array [token ids | length] — each
    host->device transfer costs ~25 ms of tunnel latency regardless of size
    and transfers do not pipeline, so the request ships as a single buffer."""
    tokens = packed[:, :-1]
    lengths = packed[:, -1]
    mu_x, hidden, x_mask = text_encoder.apply(te_params, tokens, lengths)
    logw = duration_predictor.apply(
        dp_params, hidden, x_mask, g=spk_emb, reverse=True
    )
    # w_ceil BEFORE length_scale (reference unitspeech.py:424-425 applies the
    # scale after the ceil)
    w_ceil = jnp.ceil(jnp.exp(logw) * x_mask[..., 0])
    return mu_x, x_mask, w_ceil


@partial(
    jax.jit,
    static_argnames=(
        "decoder_apply",
        "n_timesteps",
        "text_gradient_scale",
        "spk_gradient_scale",
        "beta_min",
        "beta_max",
        "y_pad",
        "sampler",
        "mesh",
        "sample_spec",
    ),
)
def _align_and_sample(
    decoder_apply,
    dec_params,
    mu_x,
    x_mask,
    w_ceil,
    y_mask,
    spk_emb,
    key,
    mel_min,
    mel_max,
    n_timesteps: int,
    text_gradient_scale: float,
    spk_gradient_scale: float,
    beta_min: float,
    beta_max: float,
    y_pad: int = 0,
    sampler: str = "ddpm",
    mesh=None,
    sample_spec=None,
    noise_z=None,
    noises=None,
):
    if y_mask is None:
        # derive the frame mask ON DEVICE from the already-resident
        # durations: the host sync is needed only to pick the static bucket,
        # and sending the length back costs a full ~25 ms tunnel transfer
        y_lengths = jnp.maximum(jnp.sum(w_ceil, axis=1), 1.0)
        y_mask = sequence_mask(
            jnp.minimum(y_lengths, y_pad).astype(jnp.int32), y_pad
        )
    attn_mask = x_mask * y_mask[:, None, :]  # (B, Tx, Ty)
    attn = generate_path(w_ceil, attn_mask)
    cond_y = jnp.einsum("bxy,bxf->byf", attn, mu_x)
    # noise_z / noises: optional pre-drawn noise for deterministic end-to-end
    # parity against the reference torch flow (inference.py:34-160 injects
    # torch.randn per step; tests/test_reference_parity.py drives both chains
    # with the same pool)
    if noise_z is None:
        z = jax.random.normal(jax.random.fold_in(key, 0), cond_y.shape)
    else:
        z = noise_z
    # `sampler` is a SPEC string (models/diffusion.parse_sampler_spec):
    # "ddpm"/"dpm2" with an optional ":cs<k>" CFG-delta-caching stride —
    # parsed here, the single sampler dispatch point every serving path
    # funnels through
    sampler_name, cfg_stride = parse_sampler_spec(sampler)
    if sampler_name == "dpm2":
        # deterministic DPM-Solver++(2M) probability-flow sampler: the
        # fast serving mode (reaches comparable quality at roughly half
        # the DDPM step count; reported under its own benchmark label)
        mel = reverse_diffusion_ode(
            decoder_apply, dec_params, z, y_mask, cond_y, spk_emb,
            n_timesteps=n_timesteps,
            text_gradient_scale=text_gradient_scale,
            spk_gradient_scale=spk_gradient_scale,
            beta_min=beta_min, beta_max=beta_max, cfg_stride=cfg_stride,
            mesh=mesh, sample_spec=sample_spec,
        )
    else:
        mel = reverse_diffusion(
            decoder_apply,
            dec_params,
            z,
            y_mask,
            cond_y,
            spk_emb,
            jax.random.fold_in(key, 1),
            n_timesteps=n_timesteps,
            text_gradient_scale=text_gradient_scale,
            spk_gradient_scale=spk_gradient_scale,
            beta_min=beta_min,
            beta_max=beta_max,
            cfg_stride=cfg_stride,
            mesh=mesh,
            sample_spec=sample_spec,
            noises=noises,
        )
    return denormalize_mel(mel, mel_min, mel_max), attn


@partial(jax.jit, static_argnames=("vocoder",))
def _vocode_jit(vocoder, vocoder_params, mel):
    return vocoder.apply(vocoder_params, mel)


@partial(
    jax.jit,
    static_argnames=(
        "text_encoder", "duration_predictor", "decoder_apply", "vocoder",
        "frame_bucket", "n_timesteps", "length_scale", "text_gradient_scale",
        "spk_gradient_scale", "beta_min", "beta_max", "override_durations",
        "sampler", "mesh", "sample_spec",
    ),
)
def _synthesize_single_dispatch(
    text_encoder, te_params, duration_predictor, dp_params,
    decoder_apply, dec_params, vocoder, vocoder_params,
    packed, spk_emb, key, mel_min, mel_max,
    frame_bucket: int, n_timesteps: int, length_scale: float,
    text_gradient_scale: float, spk_gradient_scale: float,
    beta_min: float, beta_max: float, override_durations: bool = False,
    sampler: str = "ddpm", mesh=None, sample_spec=None,
):
    """The ENTIRE pipeline — text encoder -> duration -> alignment -> scan
    sampler -> BigVGAN — as ONE device dispatch at a statically chosen frame
    bucket. Per-dispatch latency is ~35 ms on tunneled TPU setups, so merging
    the encode and sample dispatches matters whenever the output bucket is
    known up front: forced-duration runs (warmup, benchmarks), voice
    conversion (output length = source length), and speculative serving
    (bucket guessed from token count; `fits` reports whether the predicted
    durations overflowed it and the caller must re-run the exact path).

    `packed` is the request's entire host input as ONE (B, 2*TB + 1) f32
    array: [token ids | duration override | length]. Every host->device
    transfer costs ~25 ms of tunnel latency REGARDLESS of size and transfers
    do not pipeline (measured: 3 small arrays = 76 ms, 1 packed = 25 ms), so
    the inputs ship as a single buffer and unpack on device. Token IDs and
    lengths are exact in f32 (< 2^24).

    Returns (wav, mel, y_lengths, y_pred_lengths, fits): y_lengths are the
    lengths actually synthesized (clamped to the bucket); y_pred_lengths are
    the duration predictor's (kept as an output so duration compute is never
    dead-code-eliminated under override_durations).
    """
    tb = (packed.shape[1] - 1) // 2
    tokens = packed[:, :tb].astype(jnp.int32)
    w_override = packed[:, tb : 2 * tb]
    lengths = packed[:, 2 * tb].astype(jnp.int32)
    mu_x, hidden, x_mask = text_encoder.apply(te_params, tokens, lengths)
    logw = duration_predictor.apply(
        dp_params, hidden, x_mask, g=spk_emb, reverse=True
    )
    # ceil BEFORE length_scale (reference unitspeech.py:424-425)
    w_pred = jnp.ceil(jnp.exp(logw) * x_mask[..., 0]) * length_scale
    y_pred_lengths = jnp.maximum(jnp.sum(w_pred, axis=1), 1.0)
    w_ceil = w_override if override_durations else w_pred
    y_lengths = jnp.maximum(jnp.sum(w_ceil, axis=1).astype(jnp.int32), 1)
    fits = jnp.all(y_lengths <= frame_bucket)
    y_mask = sequence_mask(jnp.minimum(y_lengths, frame_bucket), frame_bucket)
    wav, mel, _attn = _align_sample_vocode(
        decoder_apply, dec_params, vocoder, vocoder_params,
        mu_x, x_mask, w_ceil, y_mask, spk_emb, key, mel_min, mel_max,
        n_timesteps=n_timesteps, text_gradient_scale=text_gradient_scale,
        spk_gradient_scale=spk_gradient_scale,
        beta_min=beta_min, beta_max=beta_max, sampler=sampler,
        mesh=mesh, sample_spec=sample_spec,
    )
    # mu_x/x_mask/w_ceil ride along DEVICE-RESIDENT (no D2H unless the caller
    # materializes them): a speculative miss reuses them for the corrected
    # align+sample+vocode dispatch without re-encoding or re-sending the
    # request (infer/calibration.py rationale)
    return wav, mel, y_lengths, y_pred_lengths, fits, mu_x, x_mask, w_ceil


@partial(
    jax.jit,
    static_argnames=(
        "text_encoder", "duration_predictor", "decoder_apply", "vocoder",
        "buckets", "upsample", "n_timesteps", "length_scale",
        "text_gradient_scale", "spk_gradient_scale", "beta_min", "beta_max",
        "sampler",
    ),
)
def _synthesize_bucket_switch(
    text_encoder, te_params, duration_predictor, dp_params,
    decoder_apply, dec_params, vocoder, vocoder_params,
    packed, spk_emb, key, mel_min, mel_max,
    buckets, upsample: int, n_timesteps: int, length_scale: float,
    text_gradient_scale: float, spk_gradient_scale: float,
    beta_min: float, beta_max: float, sampler: str = "ddpm",
):
    """Open-text serving as ONE dispatch with NO host length sync: the frame
    bucket is chosen ON DEVICE by a `lax.switch` whose branches each run
    align -> scan sampler -> BigVGAN at one static bucket from `buckets`
    (ascending), padding their outputs to the largest. XLA compiles every
    branch but executes only the selected one, so the request pays
    exact-bucket compute, one dispatch, and zero host round-trips — the
    TPU-native replacement for the reference's y_lengths sync
    (/root/reference/unitspeech/unitspeech.py:427-429). Compile cost scales
    with len(buckets); serving picks a small window around the calibrated
    length distribution (infer/calibration.py).

    Each branch draws its noise at that bucket's static shape from the same
    key, so a hit is bit-identical to the exact two-dispatch path resolving
    to the same bucket.

    Returns (wav, mel, y_lengths, fits, mu_x, x_mask, w_ceil); wav/mel are
    padded to buckets[-1]; `fits` is False when the predicted length
    overflows the largest bucket (output then clamps to it and the caller
    falls back — the trailing mu_x/x_mask/w_ceil allow that fallback to skip
    re-encoding, as in the speculative path)."""
    tb = packed.shape[1] - 1
    tokens = packed[:, :tb].astype(jnp.int32)
    lengths = packed[:, tb].astype(jnp.int32)
    mu_x, hidden, x_mask = text_encoder.apply(te_params, tokens, lengths)
    logw = duration_predictor.apply(
        dp_params, hidden, x_mask, g=spk_emb, reverse=True
    )
    # ceil BEFORE length_scale (reference unitspeech.py:424-425)
    w_ceil = jnp.ceil(jnp.exp(logw) * x_mask[..., 0]) * length_scale
    y_lengths = jnp.maximum(jnp.sum(w_ceil, axis=1).astype(jnp.int32), 1)
    y_max = jnp.max(y_lengths)
    idx = jnp.minimum(
        jnp.sum(y_max > jnp.asarray(buckets)), len(buckets) - 1
    )
    fits = y_max <= buckets[-1]
    max_b = buckets[-1]

    def make_branch(bucket: int):
        def branch(mu_x, x_mask, w_ceil, y_lengths, spk_emb, key):
            y_mask = sequence_mask(jnp.minimum(y_lengths, bucket), bucket)
            wav, mel, _attn = _align_sample_vocode(
                decoder_apply, dec_params, vocoder, vocoder_params,
                mu_x, x_mask, w_ceil, y_mask, spk_emb, key, mel_min, mel_max,
                n_timesteps=n_timesteps,
                text_gradient_scale=text_gradient_scale,
                spk_gradient_scale=spk_gradient_scale,
                beta_min=beta_min, beta_max=beta_max, sampler=sampler,
            )
            wav = jnp.pad(wav, ((0, 0), (0, (max_b - bucket) * upsample)))
            mel = jnp.pad(mel, ((0, 0), (0, max_b - bucket), (0, 0)))
            return wav, mel

        return branch

    wav, mel = jax.lax.switch(
        idx, [make_branch(b) for b in buckets],
        mu_x, x_mask, w_ceil, y_lengths, spk_emb, key,
    )
    return wav, mel, y_lengths, fits, mu_x, x_mask, w_ceil


@partial(
    jax.jit,
    static_argnames=(
        "decoder_apply", "vocoder", "n_timesteps", "text_gradient_scale",
        "spk_gradient_scale", "beta_min", "beta_max", "y_pad", "sampler",
        "mesh", "sample_spec",
    ),
)
def _align_sample_vocode(
    decoder_apply, dec_params, vocoder, vocoder_params,
    mu_x, x_mask, w_ceil, y_mask, spk_emb, key, mel_min, mel_max,
    n_timesteps: int, text_gradient_scale: float, spk_gradient_scale: float,
    beta_min: float, beta_max: float, y_pad: int = 0, sampler: str = "ddpm",
    mesh=None, sample_spec=None, noise_z=None, noises=None,
):
    """Whole post-duration pipeline in ONE executable: alignment -> 50-step
    scan sampler -> BigVGAN. One device dispatch instead of two — dispatch
    latency is material on tunneled TPU setups."""
    mel, attn = _align_and_sample(
        decoder_apply, dec_params, mu_x, x_mask, w_ceil, y_mask, spk_emb, key,
        mel_min, mel_max, n_timesteps=n_timesteps,
        text_gradient_scale=text_gradient_scale,
        spk_gradient_scale=spk_gradient_scale,
        beta_min=beta_min, beta_max=beta_max, y_pad=y_pad, sampler=sampler,
        mesh=mesh, sample_spec=sample_spec, noise_z=noise_z, noises=noises,
    )
    wav = vocoder.apply(vocoder_params, mel)
    return wav, mel, attn


@dataclass
class Synthesizer:
    """End-to-end TTS callable with bucketed compile caching."""

    models: TTSModels
    frame_buckets: Sequence[int] = field(default_factory=lambda: default_frame_buckets(4096))
    token_buckets: Sequence[int] = field(
        default_factory=lambda: tuple(2 ** i for i in range(4, 11))
    )
    # optional sequence/context sharding of the diffusion state over a mesh
    # (SURVEY.md §5): e.g. mesh over ("data", "seq") with
    # sample_spec = PartitionSpec(None, "seq", None)
    mesh: Any = None
    sample_spec: Any = None
    # opt-in speculative single-dispatch serving: guess the frame bucket as
    # choose_bucket(n_tokens * this ratio) and run the whole pipeline in one
    # dispatch; if the predicted durations overflow the guess, fall back to
    # the exact two-dispatch path. None = always exact. Worth it only when
    # the guess is tight — bucket padding runs the 50-step sampler at the
    # padded length, which costs more than the saved dispatch if the ratio
    # over-shoots by more than ~10%.
    speculative_frames_per_token: Optional[float] = None
    # CALIBRATED speculative serving (supersedes the constant ratio above):
    # a DurationCalibrator (infer/calibration.py) learns per-token-id
    # durations from served requests and guesses each request's frame bucket
    # at ~P95 coverage. Requests before the calibrator is `ready` run the
    # exact path (observing durations for free); once ready, requests run
    # one speculative dispatch, and a miss (bucket overflow) falls back to
    # one extra align+sample+vocode dispatch REUSING the device-resident
    # encoder outputs (no re-encode, no extra host->device transfer).
    calibrator: Any = None
    # BUCKET-SWITCH serving (strongest mode; supersedes both speculative
    # modes when set): an ascending tuple of frame buckets compiled as
    # lax.switch branches of ONE executable — the device itself picks the
    # bucket from the predicted durations, so open-text requests pay
    # exact-bucket compute, one dispatch, and no host length sync. Compile
    # cost scales with the branch count; make_switch_buckets() picks a small
    # window from the calibrator's observed length distribution.
    switch_buckets: Any = None

    def synthesize_mel(
        self,
        token_ids: Sequence[int],
        key,
        diffusion_steps: Optional[int] = None,
        length_scale: Optional[float] = None,
        text_gradient_scale: Optional[float] = None,
        spk_gradient_scale: Optional[float] = None,
        noise_z=None,
        noises=None,
    ):
        """Token IDs -> (denormalized log-mel (1, Ty, F), y_length, attn).

        noise_z (1, Ty_pad, F) / noises (steps, 1, Ty_pad, F): optional
        pre-drawn noise pools for deterministic end-to-end parity runs against
        the reference torch flow (inference.py:98-126 draws torch.randn for the
        prior sample and per reverse step). Shapes must match the padded frame
        bucket the call resolves — pass `noise_for(y_length)` callables sized
        from a probe run, or use tests/test_reference_parity.py's helper."""
        m = self.models
        icfg = m.cfg.inference
        steps = diffusion_steps if diffusion_steps is not None else icfg.diffusion_steps
        lscale = length_scale if length_scale is not None else icfg.length_scale
        tg = text_gradient_scale if text_gradient_scale is not None else icfg.text_gradient_scale
        sg = spk_gradient_scale if spk_gradient_scale is not None else icfg.spk_gradient_scale

        n_tok = len(token_ids)
        tok_bucket = choose_bucket(n_tok, self.token_buckets)
        packed = np.zeros((1, tok_bucket + 1), dtype=np.int32)
        packed[0, :n_tok] = token_ids
        packed[0, -1] = n_tok

        mu_x, x_mask, w_ceil = _encode_and_duration(
            m.text_encoder,
            m.text_encoder_params,
            m.duration_predictor,
            m.duration_predictor_params,
            jnp.asarray(packed),
            m.spk_emb,
        )
        w_ceil = w_ceil * lscale
        # one host sync for the data-dependent output length (the reference
        # does the same: unitspeech.py:427-429)
        y_length = max(int(np.asarray(jnp.sum(w_ceil, axis=1))[0]), 1)
        num_down = m.cfg.decoder.num_downsamplings
        y_pad = choose_bucket(fix_len_compatibility(y_length, num_down), self.frame_buckets)

        mel, attn = _align_and_sample(
            m.decoder.apply,
            m.decoder_params,
            mu_x,
            x_mask,
            w_ceil,
            None,
            m.spk_emb,
            key,
            m.mel_min,
            m.mel_max,
            n_timesteps=int(steps),
            text_gradient_scale=float(tg),
            spk_gradient_scale=float(sg),
            beta_min=m.cfg.decoder.beta_min,
            beta_max=m.cfg.decoder.beta_max,
            y_pad=int(y_pad),
            mesh=self.mesh,
            sample_spec=self.sample_spec,
            noise_z=noise_z,
            noises=noises,
        )
        return mel, y_length, attn

    def synthesize_batch(
        self,
        token_sequences,
        key,
        diffusion_steps: Optional[int] = None,
        length_scale: Optional[float] = None,
        text_gradient_scale: Optional[float] = None,
        spk_gradient_scale: Optional[float] = None,
    ):
        """Batched guided synthesis (BASELINE config 3: CFG sweep over a
        sentence batch). All sentences run in ONE batched sampler/vocoder
        call at a common frame bucket. Returns a list of (wav, sr)."""
        m = self.models
        icfg = m.cfg.inference
        steps = diffusion_steps if diffusion_steps is not None else icfg.diffusion_steps
        lscale = length_scale if length_scale is not None else icfg.length_scale
        tg = text_gradient_scale if text_gradient_scale is not None else icfg.text_gradient_scale
        sg = spk_gradient_scale if spk_gradient_scale is not None else icfg.spk_gradient_scale

        b = len(token_sequences)
        tok_bucket = choose_bucket(
            max(len(s) for s in token_sequences), self.token_buckets
        )
        packed = np.zeros((b, tok_bucket + 1), dtype=np.int32)
        for i, seq in enumerate(token_sequences):
            packed[i, : len(seq)] = seq
            packed[i, -1] = len(seq)
        spk = jnp.broadcast_to(m.spk_emb, (b, m.spk_emb.shape[-1]))

        mu_x, x_mask, w_ceil = _encode_and_duration(
            m.text_encoder, m.text_encoder_params,
            m.duration_predictor, m.duration_predictor_params,
            jnp.asarray(packed), spk,
        )
        w_ceil = w_ceil * lscale
        y_lengths = np.maximum(
            np.asarray(jnp.sum(w_ceil, axis=1)).astype(np.int64), 1
        )
        num_down = m.cfg.decoder.num_downsamplings
        y_pad = choose_bucket(
            fix_len_compatibility(int(y_lengths.max()), num_down), self.frame_buckets
        )
        mel, _ = _align_and_sample(
            m.decoder.apply, m.decoder_params, mu_x, x_mask, w_ceil, None,
            spk, key, m.mel_min, m.mel_max,
            n_timesteps=int(steps), text_gradient_scale=float(tg),
            spk_gradient_scale=float(sg),
            beta_min=m.cfg.decoder.beta_min, beta_max=m.cfg.decoder.beta_max,
            y_pad=int(y_pad),
            mesh=self.mesh, sample_spec=self.sample_spec,
        )
        wavs = np.asarray(self.vocode(mel))
        hop = m.cfg.data.hop_length
        sr = m.cfg.data.sampling_rate
        return [(wavs[i, : int(y_lengths[i]) * hop], sr) for i in range(b)]

    def warmup(self, token_lengths=(64,), frame_lengths=(344,), key=None,
               modes=("exact",), **synth_kwargs):
        """Precompile the (token bucket, frame bucket) grid before serving.

        The data-dependent output length means each new bucket pair triggers
        one XLA compile; a serving process calls this once at startup so no
        request pays compile latency.

        This drives the REAL serving code paths (__call__ with a duration
        override that sums to the target frame count), so bucket selection,
        mask construction, and the fused executables are provably the ones a
        real request uses — a ladder change cannot desync warmed vs served
        shapes (tests/test_tts_e2e.py asserts zero post-warmup compiles).

        modes: "exact" warms the two-dispatch path open-ended text requests
        use; "fused" warms the single-dispatch executable used by
        forced-duration requests and speculative serving
        (speculative_frames_per_token) at the same bucket pairs."""
        import itertools

        key = jax.random.PRNGKey(0) if key is None else key
        for n_tok, frames in itertools.product(token_lengths, frame_lengths):
            for mode in modes:
                self(
                    [1] * n_tok, key, _forced_total_frames=int(frames),
                    _exact=(mode == "exact"), **synth_kwargs,
                )

    def vocode(self, mel):
        m = self.models
        if m.vocoder is None:
            raise ValueError("Synthesizer built without a vocoder.")
        return _vocode_jit(m.vocoder, m.vocoder_params, mel)

    def calibrate(self, token_sequences, length_scale: float = 1.0):
        """Feed the calibrator from a text corpus WITHOUT synthesizing:
        each sequence runs only the (cheap) encode+duration executable and
        observes the predicted per-token durations. A serving process calls
        this at startup (alongside warmup) so speculative / bucket-switch
        serving is ready from the first real request."""
        if self.calibrator is None:
            raise ValueError("Synthesizer has no calibrator attached.")
        m = self.models
        for token_ids in token_sequences:
            n_tok = len(token_ids)
            tok_bucket = choose_bucket(n_tok, self.token_buckets)
            packed = np.zeros((1, tok_bucket + 1), dtype=np.int32)
            packed[0, :n_tok] = token_ids
            packed[0, -1] = n_tok
            _mu, _xm, w_ceil = _encode_and_duration(
                m.text_encoder, m.text_encoder_params,
                m.duration_predictor, m.duration_predictor_params,
                jnp.asarray(packed), m.spk_emb,
            )
            w_host = np.asarray(w_ceil)[0]
            self.calibrator.observe_durations(token_ids, w_host[:n_tok])
            self.calibrator.observe_total(token_ids, float(w_host.sum()))
        _ = length_scale  # durations are observed pre-scale by convention

    def make_switch_buckets(self, length_scale: float = 1.0, lo_q: float = 0.05,
                            hi_q: float = 1.0, max_branches: int = 3,
                            policy: str = "cost",
                            per_frame_ms=None):
        """Pick the bucket-switch window from the calibrator's observed
        length distribution.

        policy="cost" (the DEFAULT, flipped on measured evidence): the
        ascending ladder-bucket subset of up to max_branches branches (not
        necessarily contiguous — on bimodal traffic {short-bucket,
        tail-bucket} beats every contiguous span) minimizing expected
        per-request cost under the measured serving cost model
        (infer/bucket_cost.py: per-request FIXED floor, per-padded-frame
        device time, overflow = wasted top-bucket run + exact-path
        fallback), plus ONE insurance ladder step above the observed max
        (so up to max_branches+1 branches). Evidence for the default:
        2.31x faster than quantile on long-tail traffic measured on chip
        at full size (BUCKET_AB.json), +35% on unimodal LJSpeech-train
        lengths, and the identical window on tight distributions (the
        bench's +-4% band) — r4s5 ROADMAP ledger. `per_frame_ms` defaults
        to the measured DDPM@50 quadratic cost curve
        (bucket_cost.frame_cost_curve, anchored in COST_ANCHORS.json);
        pass the matching mode's curve — frame_cost_curve(sampler, steps)
        — for fast sampler modes, or a legacy scalar per-frame price.

        policy="quantile": every ladder bucket between ~P(lo_q) and
        ~P(hi_q) of request lengths plus one ladder step of headroom,
        keeping the LARGEST max_branches. The pre-r4s5 default; kept for
        comparison and for deployments that want max-anchored windows
        regardless of traffic shape.

        Returns an ascending tuple for `switch_buckets`."""
        if self.calibrator is None:
            raise ValueError("Synthesizer has no calibrator attached.")
        num_down = self.models.cfg.decoder.num_downsamplings
        if policy == "cost":
            from .bucket_cost import frame_cost_curve, optimal_window
            totals = self.calibrator.observed_totals()
            if not totals:
                raise ValueError("calibrator has no observed lengths yet")
            lengths = np.asarray(totals, np.float64) * length_scale
            window, _row = optimal_window(
                lengths, self.frame_buckets,
                per_frame_ms=(per_frame_ms if per_frame_ms is not None
                              else frame_cost_curve("ddpm", 50)),
                max_branches=max_branches, num_down=num_down,
                headroom=1,  # one insurance branch above the observed max
            )
            return window
        if policy != "quantile":
            raise ValueError(f"unknown bucket policy {policy!r}")
        from .bucket_cost import quantile_window

        totals = self.calibrator.observed_totals()
        if not totals:
            raise ValueError("calibrator has no observed lengths yet")
        return quantile_window(
            np.asarray(totals, np.float64) * length_scale,
            self.frame_buckets, lo_q=lo_q, hi_q=hi_q,
            max_branches=max_branches, num_down=num_down,
        )

    def _switch_dispatch(self, tokens, lengths, key, steps, lscale, tg, sg,
                         sampler="ddpm", spk=None):
        """Run _synthesize_bucket_switch over a (B, tok_bucket) batch.

        spk: optional (B, spk_emb_dim) per-row speaker embeddings (the
        serving daemon's multi-voice mode); defaults to the model's own
        spk_emb broadcast to every row. Same shape either way, so voice
        selection reuses the already-compiled executable."""
        m = self.models
        tokens_np = np.asarray(tokens, np.int32)
        packed = np.concatenate(
            [tokens_np, np.asarray(lengths, np.int32).reshape(-1, 1)], axis=1
        )
        b = tokens_np.shape[0]
        if spk is None:
            spk = jnp.broadcast_to(m.spk_emb, (b, m.spk_emb.shape[-1]))
        else:
            spk = jnp.asarray(np.asarray(spk, np.float32).reshape(b, -1))
        upsample = int(np.prod(m.cfg.vocoder.upsample_rates))
        return _synthesize_bucket_switch(
            m.text_encoder, m.text_encoder_params,
            m.duration_predictor, m.duration_predictor_params,
            m.decoder.apply, m.decoder_params, m.vocoder, m.vocoder_params,
            jnp.asarray(packed), spk, key, m.mel_min, m.mel_max,
            buckets=tuple(int(x) for x in self.switch_buckets),
            upsample=upsample, n_timesteps=int(steps),
            length_scale=float(lscale), text_gradient_scale=float(tg),
            spk_gradient_scale=float(sg),
            beta_min=m.cfg.decoder.beta_min, beta_max=m.cfg.decoder.beta_max,
            sampler=str(sampler),
        )

    def _single_dispatch(self, tokens, lengths, w_override, frame_bucket,
                         key, steps, lscale, tg, sg, sampler="ddpm"):
        """Run _synthesize_single_dispatch over a (B, tok_bucket) batch."""
        m = self.models
        override = w_override is not None
        tokens_np = np.asarray(tokens, np.float32)
        if not override:
            w_np = np.zeros_like(tokens_np)
        else:
            w_np = np.asarray(w_override, np.float32)
        lengths_np = np.asarray(lengths, np.float32).reshape(-1, 1)
        # ONE host->device transfer for the whole request (see
        # _synthesize_single_dispatch's packing rationale)
        packed = np.concatenate([tokens_np, w_np, lengths_np], axis=1)
        b = tokens_np.shape[0]
        spk = jnp.broadcast_to(m.spk_emb, (b, m.spk_emb.shape[-1]))
        return _synthesize_single_dispatch(
            m.text_encoder, m.text_encoder_params,
            m.duration_predictor, m.duration_predictor_params,
            m.decoder.apply, m.decoder_params, m.vocoder, m.vocoder_params,
            jnp.asarray(packed), spk, key, m.mel_min, m.mel_max,
            frame_bucket=int(frame_bucket), n_timesteps=int(steps),
            length_scale=float(lscale), text_gradient_scale=float(tg),
            spk_gradient_scale=float(sg),
            beta_min=m.cfg.decoder.beta_min, beta_max=m.cfg.decoder.beta_max,
            override_durations=override, sampler=str(sampler),
            mesh=self.mesh, sample_spec=self.sample_spec,
        )

    def __call__(self, token_ids: Sequence[int], key, **kwargs):
        """Token IDs -> (waveform np.ndarray (n_samples,), sample_rate).

        Dispatch policy (per-dispatch latency is ~35 ms on tunneled TPUs):
          * _forced_total_frames set (warmup, benchmarks): the frame bucket is
            known up front -> the WHOLE pipeline runs as one dispatch.
          * speculative_frames_per_token set: one dispatch at a guessed
            bucket; exact two-dispatch fallback if predictions overflow it.
          * otherwise: exact — encode+duration dispatch, host sync for the
            data-dependent length (reference unitspeech.py:427-429), then the
            fused align->sample->vocode dispatch.

        `_noise_z` / `_noises` kwargs inject pre-drawn prior/per-step noise on
        the exact path (shapes at the resolved frame bucket) — used by
        tests/test_reference_parity.py to drive this entry point and the
        reference inference.py flow with identical randomness.
        """
        m = self.models
        if m.vocoder is None:
            raise ValueError("Synthesizer built without a vocoder.")
        icfg = m.cfg.inference
        steps = kwargs.get("diffusion_steps") or icfg.diffusion_steps
        lscale = kwargs.get("length_scale")
        lscale = icfg.length_scale if lscale is None else lscale
        tg = kwargs.get("text_gradient_scale")
        tg = icfg.text_gradient_scale if tg is None else tg
        sg = kwargs.get("spk_gradient_scale")
        sg = icfg.spk_gradient_scale if sg is None else sg
        forced_frames = kwargs.get("_forced_total_frames")
        # sampler SPEC: "ddpm" (reference parity, default) or "dpm2"
        # (deterministic DPM-Solver++(2M) fast mode), each with an optional
        # ":cs<k>" CFG-delta-caching stride suffix (e.g. "dpm2:cs2").
        # Validate eagerly so a malformed spec fails here, not mid-trace.
        sampler = str(kwargs.get("sampler", "ddpm"))
        parse_sampler_spec(sampler)

        hop = m.cfg.data.hop_length
        sr = m.cfg.data.sampling_rate
        num_down = m.cfg.decoder.num_downsamplings
        exact = bool(kwargs.get("_exact", False))
        n_tok = len(token_ids)
        tok_bucket = choose_bucket(n_tok, self.token_buckets)
        tokens = np.zeros((1, tok_bucket), dtype=np.int32)
        tokens[0, :n_tok] = token_ids

        w_forced = None
        if forced_frames is not None:
            w_forced = np.zeros((1, tok_bucket), np.float32)
            w_forced[0, :n_tok] = forced_frames // n_tok
            w_forced[0, 0] += forced_frames - (forced_frames // n_tok) * n_tok

        if forced_frames is not None and not exact:
            bucket = choose_bucket(
                fix_len_compatibility(int(forced_frames), num_down),
                self.frame_buckets,
            )
            wav, _mel, y_lengths, *_rest = self._single_dispatch(
                tokens, [n_tok], w_forced, bucket, key, steps, lscale, tg, sg,
                sampler=sampler,
            )
            wav, y_len = jax.device_get((wav, y_lengths))
            return np.asarray(wav)[0, : int(y_len[0]) * hop], sr

        if self.switch_buckets is not None and not exact and forced_frames is None:
            wav, _mel, y_lengths, fits, mu_x, x_mask, w_ceil = (
                self._switch_dispatch(
                    tokens, [n_tok], key, steps, lscale, tg, sg,
                    sampler=sampler,
                )
            )
            wav, y_len, fits = jax.device_get((wav, y_lengths, fits))
            if self.calibrator is not None:
                self.calibrator.observe_total(token_ids, float(y_len[0]) / lscale)
            y_length = max(int(y_len[0]), 1)
            if bool(fits):
                return np.asarray(wav)[0, : y_length * hop], sr
            # overflow past the largest switch bucket: one fallback dispatch
            # at the right bucket, reusing the device-resident encoder outputs
            y_pad = choose_bucket(
                fix_len_compatibility(y_length, num_down), self.frame_buckets
            )
            wav, _mel, _attn = _align_sample_vocode(
                m.decoder.apply, m.decoder_params, m.vocoder, m.vocoder_params,
                mu_x, x_mask, w_ceil, None, m.spk_emb, key, m.mel_min,
                m.mel_max, n_timesteps=int(steps),
                text_gradient_scale=float(tg), spk_gradient_scale=float(sg),
                beta_min=m.cfg.decoder.beta_min,
                beta_max=m.cfg.decoder.beta_max, y_pad=int(y_pad),
                sampler=sampler, mesh=self.mesh, sample_spec=self.sample_spec,
            )
            return np.asarray(wav[0, : y_length * hop]), sr

        if self.calibrator is not None and not exact and forced_frames is None:
            guess = self.calibrator.guess_frames(token_ids)  # pre-lscale
            if guess is not None:
                bucket = choose_bucket(
                    fix_len_compatibility(int(np.ceil(guess * lscale)), num_down),
                    self.frame_buckets,
                )
                wav, _mel, y_lengths, _yp, fits, mu_x, x_mask, w_ceil = (
                    self._single_dispatch(
                        tokens, [n_tok], None, bucket, key, steps, lscale,
                        tg, sg, sampler=sampler,
                    )
                )
                wav, y_len, fits = jax.device_get((wav, y_lengths, fits))
                self.calibrator.observe_total(token_ids, float(y_len[0]) / lscale)
                if bool(fits):
                    return np.asarray(wav)[0, : int(y_len[0]) * hop], sr
                # miss: the durations overflowed the guessed bucket. mu_x /
                # x_mask / w_ceil are still device-resident from the
                # speculative dispatch — rerun ONLY align+sample+vocode at
                # the correct bucket (no re-encode, no new H2D transfer).
                y_length = max(int(y_len[0]), 1)
                y_pad = choose_bucket(
                    fix_len_compatibility(y_length, num_down), self.frame_buckets
                )
                wav, _mel, _attn = _align_sample_vocode(
                    m.decoder.apply, m.decoder_params, m.vocoder,
                    m.vocoder_params, mu_x, x_mask, w_ceil, None, m.spk_emb,
                    key, m.mel_min, m.mel_max,
                    n_timesteps=int(steps), text_gradient_scale=float(tg),
                    spk_gradient_scale=float(sg),
                    beta_min=m.cfg.decoder.beta_min,
                    beta_max=m.cfg.decoder.beta_max, y_pad=int(y_pad),
                    sampler=sampler, mesh=self.mesh,
                    sample_spec=self.sample_spec,
                )
                return np.asarray(wav[0, : y_length * hop]), sr
            # calibrator not ready yet: fall through to the exact path, which
            # observes this request's durations for free

        if self.speculative_frames_per_token is not None and not exact \
                and forced_frames is None:
            guess = int(np.ceil(n_tok * self.speculative_frames_per_token))
            bucket = choose_bucket(
                fix_len_compatibility(guess, num_down), self.frame_buckets
            )
            wav, _mel, y_lengths, _yp, fits, *_rest = self._single_dispatch(
                tokens, [n_tok], None, bucket, key, steps, lscale, tg, sg,
                sampler=sampler,
            )
            wav, y_len, fits = jax.device_get((wav, y_lengths, fits))
            if bool(fits):
                return np.asarray(wav)[0, : int(y_len[0]) * hop], sr
            # predicted durations overflowed the guessed bucket: exact re-run

        packed = np.concatenate(
            [np.asarray(tokens, np.int32),
             np.full((tokens.shape[0], 1), n_tok, np.int32)], axis=1
        )
        mu_x, x_mask, w_ceil = _encode_and_duration(
            m.text_encoder, m.text_encoder_params,
            m.duration_predictor, m.duration_predictor_params,
            jnp.asarray(packed), m.spk_emb,
        )
        w_ceil = w_ceil * lscale
        if w_forced is not None:  # exact-path warmup at a target frame count
            w_ceil = jnp.asarray(w_forced)
            y_length = max(int(np.asarray(jnp.sum(w_ceil, axis=1))[0]), 1)
        else:
            # the host sync for the data-dependent length (reference
            # unitspeech.py:427-429). Fetching the FULL duration row costs
            # the same flat ~25 ms tunnel transfer as fetching its sum, and
            # gives the calibrator per-token observations for free.
            w_host = np.asarray(w_ceil)[0]
            y_length = max(int(w_host.sum()), 1)
            if self.calibrator is not None:
                self.calibrator.observe_durations(
                    token_ids, w_host[:n_tok] / lscale
                )
                self.calibrator.observe_total(
                    token_ids, float(w_host.sum()) / lscale
                )
        y_pad = choose_bucket(
            fix_len_compatibility(y_length, num_down), self.frame_buckets
        )
        wav, _mel, _attn = _align_sample_vocode(
            m.decoder.apply, m.decoder_params, m.vocoder, m.vocoder_params,
            mu_x, x_mask, w_ceil, None, m.spk_emb, key, m.mel_min, m.mel_max,
            n_timesteps=int(steps), text_gradient_scale=float(tg),
            spk_gradient_scale=float(sg),
            beta_min=m.cfg.decoder.beta_min, beta_max=m.cfg.decoder.beta_max,
            y_pad=int(y_pad), sampler=sampler, mesh=self.mesh,
            sample_spec=self.sample_spec,
            noise_z=kwargs.get("_noise_z"), noises=kwargs.get("_noises"),
        )
        return np.asarray(wav[0, : y_length * hop]), sr
