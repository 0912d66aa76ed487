"""Vocoder GAN training loop (BigVGAN recipe) — beyond-reference capability.

The reference vendors the BigVGAN discriminators + GAN losses but never
trains its vocoder (SURVEY.md §2.1 #9); the jitted alternating steps live in
train/vocoder_gan.py and this module drives them: random segment crops from
a wav filelist, AdamW(0.8, 0.99) with per-step exponential decay, TensorBoard
metrics, atomic orbax checkpoints with resume (params + both opt states +
step) — the standard BigVGAN training protocol (lr 2e-4, segment 8192,
L_G = L_adv + L_fm + 45 * L_mel).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from unitspeech_tpu.models.discriminators import (
    MultiPeriodDiscriminator,
    MultiResolutionDiscriminator,
)
from unitspeech_tpu.models.vocoder import BigVGAN
from unitspeech_tpu.train.steps import TrainState
from unitspeech_tpu.train.vocoder_gan import make_fused_vocoder_gan_step
from unitspeech_tpu.utils import checkpoint as ckpt
from unitspeech_tpu.utils.logging import MetricsWriter, StepTimer


@dataclass
class VocoderTrainConfig:
    segment_size: int = 8192       # samples per training crop
    batch_size: int = 16
    learning_rate: float = 2e-4
    adam_b1: float = 0.8
    adam_b2: float = 0.99
    lr_decay: float = 0.999        # per-epoch exponential (BigVGAN train.py)
    steps: int = 1000
    seed: int = 42
    log_every: int = 50
    save_every: int = 500


class SegmentSampler:
    """Random fixed-size segments from waveforms (zero-padded when a clip is
    shorter than the segment).

    Entries may be arrays (host-resident) or zero-arg callables returning an
    array (lazy per-draw loading) — a full BigVGAN-scale corpus of hundreds
    of hours must not be preloaded into host RAM (ADVICE r3); the reference
    likewise loads per batch from disk (its meldataset __getitem__)."""

    def __init__(self, wavs: List, segment: int, batch: int,
                 seed: int):
        if not wavs:
            raise ValueError("empty wav list")
        self.wavs = wavs
        self.segment = segment
        self.batch = batch
        self.rng = np.random.default_rng(seed)

    def next(self) -> np.ndarray:
        out = np.zeros((self.batch, self.segment), np.float32)
        idx = self.rng.integers(0, len(self.wavs), self.batch)
        for i, j in enumerate(idx):
            w = self.wavs[j]
            if callable(w):
                w = w()
            if len(w) <= self.segment:
                out[i, : len(w)] = w
            else:
                # inclusive upper bound: the final crop position is reachable
                s = int(self.rng.integers(0, len(w) - self.segment + 1))
                out[i] = w[s : s + self.segment]
        return out


def train_vocoder(
    cfg,                       # MainConfig (data + vocoder sections)
    wavs: List[np.ndarray],
    tcfg: VocoderTrainConfig,
    log_dir: Optional[str] = None,
    checkpoint_dir: Optional[str] = None,
    resume: bool = False,
    gen: Optional[BigVGAN] = None,
    mpd: Optional[MultiPeriodDiscriminator] = None,
    mrd: Optional[MultiResolutionDiscriminator] = None,
):
    """Returns (gen_state, disc_state, last_metrics). gen/mpd/mrd overrides
    let tests (and custom configs) swap in tiny discriminator stacks."""
    gen = gen or BigVGAN.from_config(cfg.vocoder)
    mpd = mpd or MultiPeriodDiscriminator()
    mrd = mrd or MultiResolutionDiscriminator()

    key = jax.random.PRNGKey(tcfg.seed)
    n_frames = tcfg.segment_size // cfg.data.hop_length
    mel0 = jnp.zeros((1, n_frames, cfg.data.n_feats))
    wav0 = jnp.zeros((1, tcfg.segment_size))
    gen_params = gen.init(key, mel0)
    d_params = {
        "mpd": mpd.init(jax.random.fold_in(key, 1), wav0, wav0),
        "mrd": mrd.init(jax.random.fold_in(key, 2), wav0, wav0),
    }

    sched = optax.exponential_decay(
        tcfg.learning_rate, transition_steps=max(len(wavs) // tcfg.batch_size, 1),
        decay_rate=tcfg.lr_decay,
    )
    gen_opt = optax.adamw(sched, b1=tcfg.adam_b1, b2=tcfg.adam_b2)
    disc_opt = optax.adamw(sched, b1=tcfg.adam_b1, b2=tcfg.adam_b2)

    g_state = TrainState(gen_params, gen_opt.init(gen_params), 0)
    d_state = TrainState(d_params, disc_opt.init(d_params), 0)

    start_step = 0
    if resume and not checkpoint_dir:
        raise ValueError(
            "resume=True requires checkpoint_dir (a silent fresh run would "
            "look like a successful resume)")
    if resume and checkpoint_dir:
        latest = ckpt.latest_checkpoint(checkpoint_dir)
        if latest:
            tree = ckpt.load_checkpoint(
                latest, {"gen": g_state, "disc": d_state}
            )
            g_state, d_state = tree["gen"], tree["disc"]
            start_step = int(g_state.step)
    if start_step >= tcfg.steps:
        # the loop body would never execute; make the no-op explicit instead
        # of returning empty metrics with rc 0 (ADVICE r3)
        return g_state, d_state, {
            "already_complete": 1.0, "restored_step": float(start_step)
        }

    fused_step = make_fused_vocoder_gan_step(
        gen, mpd, mrd, gen_opt, disc_opt, cfg.data
    )

    sampler = SegmentSampler(
        wavs, tcfg.segment_size, tcfg.batch_size, tcfg.seed + start_step
    )
    writer = MetricsWriter(log_dir) if log_dir else None
    timer = StepTimer()
    metrics = {}
    for step in range(start_step, tcfg.steps):
        wav = jnp.asarray(sampler.next())
        d_state, g_state, metrics = fused_step(d_state, g_state, wav)
        sec = timer.tick()  # EMA of seconds per step (ticked EVERY step)
        if writer and (step % tcfg.log_every == 0 or step == tcfg.steps - 1):
            scal = {k: float(v) for k, v in metrics.items()}
            if sec:
                scal["sec_per_step"] = sec
                scal["steps_per_sec"] = 1.0 / sec
            writer.scalars(scal, step, prefix="vocoder_gan")
        if checkpoint_dir and (
            (step + 1) % tcfg.save_every == 0 or step == tcfg.steps - 1
        ):
            os.makedirs(checkpoint_dir, exist_ok=True)
            ckpt.save_checkpoint(
                checkpoint_dir, step + 1, {"gen": g_state, "disc": d_state}
            )
    if writer:
        writer.close()
    return g_state, d_state, {k: float(v) for k, v in metrics.items()}
