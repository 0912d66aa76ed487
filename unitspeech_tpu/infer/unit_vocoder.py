"""Tacotron2+WaveGlow unit vocoder: unit codes -> waveform.

TPU-native equivalent of textlesslib's TacotronVocoder
(/root/reference/unitspeech/textlesslib/textless/vocoders/tacotron2/
vocoder.py:18-139 and tts_data.py:20-52): a discrete-unit string is mapped
through the checkpoint's code dict (sos/eos/collapse options), Tacotron2
decodes mel, WaveGlow vocodes at sigma=0.666, and the denoiser removes the
model's bias spectrum.

Serving notes: tokens pad to power-of-two-ish buckets so the encoder+decoder
program compiles once per bucket (padding is masked exactly — see
models/tacotron2.py); the decoder's gate-stopped while_loop runs fully on
device. The waveform length is sliced host-side from the decoded step count.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from unitspeech_tpu.models.tacotron2 import (
    Tacotron2Config,
    convert_tacotron2,
    tacotron2_infer,
)
from unitspeech_tpu.models.waveglow import (
    WaveGlowConfig,
    WaveGlowDenoiser,
    convert_waveglow,
    waveglow_infer,
)

SOS_TOK = "<s>"
EOS_TOK = "</s>"


def load_code_dict(path: str, add_sos: bool = False,
                   add_eos: bool = False) -> Dict[str, int]:
    """'_' pad + one unit code per line (reference utils.py:93-107)."""
    with open(path) as f:
        codes = ["_"] + [line.rstrip() for line in f]
    code_dict = {c: i for i, c in enumerate(codes)}
    if add_sos:
        code_dict[SOS_TOK] = len(code_dict)
    if add_eos:
        code_dict[EOS_TOK] = len(code_dict)
    return code_dict


def code_to_sequence(code: List[str], code_dict: Dict[str, int],
                     collapse_code: bool) -> List[int]:
    """reference text.py:code_to_sequence (OOV codes dropped; collapse mode
    run-length-collapses repeats)."""
    if collapse_code:
        prev, seq = None, []
        for c in code:
            if c in code_dict and c != prev:
                seq.append(code_dict[c])
                prev = c
        return seq
    return [code_dict[c] for c in code if c in code_dict]


@dataclass
class TacotronInput:
    """tts_data.py:20-49 for the code path."""

    code_dict: Dict[str, int]
    add_sos: bool = False
    add_eos: bool = False
    collapse_code: bool = False

    def get_ids(self, units_str: str) -> np.ndarray:
        toks = units_str.split()
        if self.add_sos:
            toks = [SOS_TOK] + toks
        if self.add_eos:
            toks = toks + [EOS_TOK]
        return np.asarray(
            code_to_sequence(toks, self.code_dict, self.collapse_code),
            np.int32,
        )


def _bucket(n: int, step: int = 32) -> int:
    return max(step, ((n + step - 1) // step) * step)


@partial(jax.jit, static_argnames=("taco_cfg", "wg_cfg", "prenet_dropout",
                                   "denoiser_strength", "n_fft", "hop"))
def _synthesize_jit(taco_params, wg_params, bias_spec, taco_cfg: Tacotron2Config,
                    wg_cfg: WaveGlowConfig, tokens, lengths, rng,
                    prenet_dropout: bool, denoiser_strength: float,
                    n_fft: int, hop: int):
    """One device program: Tacotron decode -> WaveGlow (sigma=0.666,
    vocoder.py:112) -> denoiser (strength, vocoder.py:113)."""
    from unitspeech_tpu.models.waveglow import stft_inverse, stft_transform

    _, mel_post, _, _, n_steps, has_eos = tacotron2_infer(
        taco_params, taco_cfg, tokens, lengths, rng=rng,
        prenet_dropout=prenet_dropout,
    )
    rng_wg = jax.random.fold_in(rng, 1)
    audio = waveglow_infer(wg_params, wg_cfg, mel_post, sigma=0.666,
                           rng=rng_wg)
    mag, phase = stft_transform(audio, n_fft, hop, n_fft)
    mag = jnp.clip(mag - bias_spec * denoiser_strength, 0.0, None)
    audio_dn = stft_inverse(mag, phase, n_fft, hop, n_fft)
    # the inverse trims n_fft//2 off each end; re-pad so sample i of the
    # denoised stream still corresponds to decoder step i//stride
    pad = audio.shape[1] - audio_dn.shape[1]
    if pad > 0:
        audio_dn = jnp.pad(audio_dn, ((0, 0), (0, pad)))
    return audio_dn, n_steps, has_eos


class TacotronVocoder:
    """units (str | array) -> waveform np.float32 (vocoder.py:45-60)."""

    def __init__(self, taco_params, taco_cfg: Tacotron2Config,
                 wg_params, wg_cfg: WaveGlowConfig,
                 tts_input: TacotronInput,
                 sample_rate: int = 22050,
                 max_decoder_steps: int = 2000,
                 denoiser_strength: float = 0.1,
                 denoiser_n_fft: int = 1024):
        self.taco_params = taco_params
        self.taco_cfg = Tacotron2Config(
            **{**taco_cfg.__dict__, "max_decoder_steps": max_decoder_steps})
        self.wg_params = wg_params
        self.wg_cfg = wg_cfg
        self.tts_input = tts_input
        self.sample_rate = sample_rate
        self.denoiser_strength = denoiser_strength
        self.denoiser_n_fft = denoiser_n_fft
        self._denoiser = WaveGlowDenoiser(wg_params, wg_cfg,
                                          n_fft=denoiser_n_fft,
                                          win_length=denoiser_n_fft)
        self._rng = jax.random.PRNGKey(0)

    @property
    def output_sample_rate(self) -> int:
        return self.sample_rate

    def __call__(self, units: Union[str, np.ndarray]) -> np.ndarray:
        if not isinstance(units, str):
            units = " ".join(str(int(u)) for u in np.asarray(units).reshape(-1))
        ids = self.tts_input.get_ids(units)
        n = len(ids)
        tokens = np.zeros((1, _bucket(n)), np.int32)
        tokens[0, :n] = ids
        self._rng, sub = jax.random.split(self._rng)
        audio, n_steps, _ = _synthesize_jit(
            self.taco_params, self.wg_params, self._denoiser.bias_spec,
            self.taco_cfg, self.wg_cfg, jnp.asarray(tokens),
            jnp.asarray([n], jnp.int32), sub, True, self.denoiser_strength,
            self.denoiser_n_fft, self.denoiser_n_fft // 4,
        )
        n_steps = int(np.asarray(n_steps)[0])
        samples_per_step = (self.wg_cfg.upsample_stride
                            * self.taco_cfg.n_frames_per_step)
        return np.asarray(audio)[0, : n_steps * samples_per_step]

    @classmethod
    def from_torch(cls, tacotron_path: str, code_dict_path: str,
                   waveglow_path: str, max_decoder_steps: int = 2000,
                   denoiser_strength: float = 0.1) -> "TacotronVocoder":
        """Load the published checkpoint pair (vocoder.py:117-139:
        {'model_dict', 'hparams'} each)."""
        import torch

        ckpt = torch.load(tacotron_path, map_location="cpu",
                          weights_only=False)
        hp = ckpt["hparams"]
        get = lambda k, d: getattr(hp, k, hp.get(k, d)) \
            if isinstance(hp, dict) else getattr(hp, k, d)
        taco_cfg = Tacotron2Config(
            n_symbols=get("n_symbols", 104),
            symbols_embedding_dim=get("symbols_embedding_dim", 512),
            encoder_embedding_dim=get("encoder_embedding_dim", 512),
            encoder_n_convolutions=get("encoder_n_convolutions", 3),
            encoder_kernel_size=get("encoder_kernel_size", 5),
            n_mel_channels=get("n_mel_channels", 80),
            n_frames_per_step=get("n_frames_per_step", 1),
            attention_rnn_dim=get("attention_rnn_dim", 1024),
            decoder_rnn_dim=get("decoder_rnn_dim", 1024),
            prenet_dim=get("prenet_dim", 256),
            attention_dim=get("attention_dim", 128),
            attention_location_n_filters=get("attention_location_n_filters", 32),
            attention_location_kernel_size=get(
                "attention_location_kernel_size", 31),
            postnet_embedding_dim=get("postnet_embedding_dim", 512),
            postnet_kernel_size=get("postnet_kernel_size", 5),
            postnet_n_convolutions=get("postnet_n_convolutions", 5),
            gate_threshold=get("gate_threshold", 0.5),
            max_decoder_steps=max_decoder_steps,
            obs_dim=get("obs_dim", 0), obs_n_class=get("obs_n_class", 1),
            lat_dim=get("lat_dim", 0),
        )
        sd = {k: v.numpy() for k, v in ckpt["model_dict"].items()}
        taco_params = convert_tacotron2(sd, taco_cfg)
        tts_input = TacotronInput(
            load_code_dict(code_dict_path), add_sos=get("add_sos", False),
            add_eos=get("add_eos", False),
            collapse_code=get("collapse_code", False),
        )

        wg_ckpt = torch.load(waveglow_path, map_location="cpu",
                             weights_only=False)
        wg_hp = wg_ckpt["hparams"]
        wg_get = (wg_hp.get if isinstance(wg_hp, dict)
                  else lambda k, d=None: getattr(wg_hp, k, d))
        wn = wg_get("WN_config", {})
        wg_cfg = WaveGlowConfig(
            n_mel_channels=wg_get("n_mel_channels", 80),
            n_flows=wg_get("n_flows", 12), n_group=wg_get("n_group", 8),
            n_early_every=wg_get("n_early_every", 4),
            n_early_size=wg_get("n_early_size", 2),
            n_layers=wn.get("n_layers", 8),
            n_channels=wn.get("n_channels", 256),
            kernel_size=wn.get("kernel_size", 3),
        )
        wg_sd = {k: v.numpy() for k, v in wg_ckpt["model_dict"].items()}
        wg_params = convert_waveglow(wg_sd, wg_cfg)
        return cls(taco_params, taco_cfg, wg_params, wg_cfg, tts_input,
                   sample_rate=get("sampling_rate", 22050),
                   max_decoder_steps=max_decoder_steps,
                   denoiser_strength=denoiser_strength)
