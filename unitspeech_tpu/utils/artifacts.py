"""Model-artifact loading: one API over torch .pt checkpoints (reference
format, auto-converted) and native orbax/npz checkpoints.

Replaces the reference's scattered loaders (util.py:174-222, inference.py:
55-104) with explicit constructors for each model family. A decoder bundle
carries {params, spk_emb, mel_min, mel_max} like the reference's
pretrained_decoder.pt / finetuned <ID>.pt (train_STEP1.py:297-304,
finetune.py:167-173).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any, Optional

import numpy as np


@dataclass
class DecoderBundle:
    params: Any  # flax tree for models.diffusion.UnitSpeech
    spk_emb: Optional[np.ndarray]  # (1, S) or None
    mel_min: Optional[np.ndarray]  # (n_feats,)
    mel_max: Optional[np.ndarray]
    step: int = 0


def _is_torch_ckpt(path: str) -> bool:
    return path.endswith((".pt", ".pth", ".ckpt"))


def load_decoder_bundle(path: str, cfg) -> DecoderBundle:
    """Load a diffusion-decoder checkpoint.

    torch format: {'model': state_dict, 'spk_emb': (1,1,S) or (1,S),
    'mel_min': (80,1)/(80,), 'mel_max': ..., 'iteration': int}
    native format: orbax dir with the same keys (arrays already converted).
    """
    if _is_torch_ckpt(path):
        import torch

        from unitspeech_tpu.utils.torch_convert import convert_decoder

        obj = torch.load(path, map_location="cpu", weights_only=True)
        sd = {k: v.detach().cpu().numpy() for k, v in obj["model"].items()}
        params = convert_decoder(sd, dim=cfg.dim, dim_mults=tuple(cfg.dim_mults))
        spk = obj.get("spk_emb")
        spk_emb = None if spk is None else np.asarray(spk).reshape(1, -1)
        mel_min = obj.get("mel_min")
        mel_max = obj.get("mel_max")
        return DecoderBundle(
            params=params,
            spk_emb=spk_emb,
            mel_min=None if mel_min is None else np.asarray(mel_min).reshape(-1),
            mel_max=None if mel_max is None else np.asarray(mel_max).reshape(-1),
            step=int(obj.get("iteration", 0)),
        )
    from unitspeech_tpu.utils.checkpoint import load_checkpoint

    obj = load_checkpoint(path)
    return DecoderBundle(
        params=obj["params"],
        spk_emb=None if obj.get("spk_emb") is None else np.asarray(obj["spk_emb"]),
        mel_min=None if obj.get("mel_min") is None else np.asarray(obj["mel_min"]),
        mel_max=None if obj.get("mel_max") is None else np.asarray(obj["mel_max"]),
        step=int(obj.get("step", 0)),
    )


def save_decoder_bundle(directory: str, step: int, bundle: DecoderBundle, keep: int = 3):
    from unitspeech_tpu.utils.checkpoint import save_checkpoint

    return save_checkpoint(
        directory,
        step,
        {
            "params": bundle.params,
            "spk_emb": bundle.spk_emb,
            "mel_min": bundle.mel_min,
            "mel_max": bundle.mel_max,
            "step": np.asarray(step),
        },
        keep=keep,
    )


def load_encoder_params(path: str, cfg, contentvec: bool = False) -> Any:
    """Text/unit/contentvec encoder checkpoint -> flax params."""
    if _is_torch_ckpt(path):
        import torch

        from unitspeech_tpu.utils.torch_convert import convert_encoder

        obj = torch.load(path, map_location="cpu", weights_only=True)
        sd = obj.get("model", obj)
        sd = {k: v.detach().cpu().numpy() for k, v in sd.items()}
        return convert_encoder(
            sd, n_layers=cfg.n_layers, prenet_layers=cfg.prenet_layers,
            contentvec=contentvec,
        )
    from unitspeech_tpu.utils.checkpoint import load_checkpoint

    return load_checkpoint(path)


def load_duration_predictor_params(path: str) -> Any:
    if _is_torch_ckpt(path):
        import torch

        from unitspeech_tpu.utils.torch_convert import convert_duration_predictor

        obj = torch.load(path, map_location="cpu", weights_only=True)
        sd = obj.get("model", obj)
        sd = {k: v.detach().cpu().numpy() for k, v in sd.items()}
        return convert_duration_predictor(sd)
    from unitspeech_tpu.utils.checkpoint import load_checkpoint

    return load_checkpoint(path)


def load_vocoder_params(path: str, cfg) -> Any:
    if _is_torch_ckpt(path):
        import torch

        from unitspeech_tpu.utils.torch_convert import convert_bigvgan

        obj = torch.load(path, map_location="cpu", weights_only=True)
        sd = obj.get("generator", obj)
        sd = {k: v.detach().cpu().numpy() for k, v in sd.items()}
        return convert_bigvgan(
            sd,
            num_upsamples=len(cfg.upsample_rates),
            num_kernels=len(cfg.resblock_kernel_sizes),
            convs_per_block=len(cfg.resblock_dilation_sizes[0]),
        )
    from unitspeech_tpu.utils.checkpoint import load_checkpoint

    return load_checkpoint(path)


def load_speaker_embs(path: str, normalize: bool = True,
                      int_keys: bool = True) -> dict:
    """Per-speaker mean embeddings. Native format: one .npz with arrays named
    by speaker id (replaces the reference's directory of .pt files,
    util.py:201-222). Also accepts a directory of <id>.npy files.

    int_keys=False keeps speaker names as strings (the serving daemon's
    voice-bank format, where names like "alice.npy" are not numeric)."""
    key = int if int_keys else str
    embs = {}
    if os.path.isdir(path):
        for name in sorted(os.listdir(path)):
            if name.endswith(".npy"):
                embs[key(name[:-4])] = np.load(os.path.join(path, name))
    else:
        z = np.load(path)
        embs = {key(k): z[k] for k in z.files}
    if normalize:
        embs = {
            k: (v / max(np.linalg.norm(v), 1e-12)).astype(np.float32).reshape(-1)
            for k, v in embs.items()
        }
    return embs
