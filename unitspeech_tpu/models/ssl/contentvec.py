"""ContentVec extractor — speaker-invariant content features for voice
conversion.

Equivalent of the reference's HF `HubertModelWithFinalProj`
(/root/reference/scripts/voice_conversion.py:46-68, checkpoint
lengyue233/content-vec-best): architecturally a HuBERT-base encoder whose
`last_hidden_state` (768-d) conditions the contentvec encoder. Reuses our
HubertModel; this module adds the HF-naming checkpoint converter and a
host-side extractor wrapper.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from unitspeech_tpu.models.ssl.hubert import (
    HubertConfig,
    HubertFeatureReader,
    HubertModel,
)
from unitspeech_tpu.utils.torch_convert import conv1d_kernel, linear_kernel
from unitspeech_tpu.utils.torch_convert_ssl import fold_weight_norm_dim


def contentvec_config() -> HubertConfig:
    return HubertConfig()  # HuBERT base, group_norm extractor


def convert_hubert_hf(sd: Dict[str, np.ndarray], num_layers: int = 12,
                      num_conv_layers: int = 7) -> Dict:
    """HF transformers HubertModel state dict -> flax params for HubertModel.

    HF naming differs from fairseq: feature_projection.*, pos_conv_embed,
    attention.* inside encoder layers, feed_forward.{intermediate,output}_dense.
    """
    def ln(prefix):
        return {
            "scale": np.asarray(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"]),
        }

    def dense(prefix):
        return {
            "kernel": linear_kernel(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"]),
        }

    p: Dict = {}
    fe: Dict = {}
    for i in range(num_conv_layers):
        conv = {
            "kernel": conv1d_kernel(sd[f"feature_extractor.conv_layers.{i}.conv.weight"])
        }
        bkey = f"feature_extractor.conv_layers.{i}.conv.bias"
        if bkey in sd:
            conv["bias"] = np.asarray(sd[bkey])
        fe[f"conv_{i}"] = conv
        lnk = f"feature_extractor.conv_layers.{i}.layer_norm.weight"
        if lnk in sd:
            fe[f"norm_{i}"] = ln(f"feature_extractor.conv_layers.{i}.layer_norm")
    p["feature_extractor"] = fe
    p["layer_norm"] = ln("feature_projection.layer_norm")
    p["post_extract_proj"] = dense("feature_projection.projection")

    enc: Dict = {}
    if "encoder.pos_conv_embed.conv.weight_v" in sd:
        pos_w = fold_weight_norm_dim(
            sd["encoder.pos_conv_embed.conv.weight_g"],
            sd["encoder.pos_conv_embed.conv.weight_v"], dim=2,
        )
    elif "encoder.pos_conv_embed.conv.parametrizations.weight.original1" in sd:
        pos_w = fold_weight_norm_dim(
            sd["encoder.pos_conv_embed.conv.parametrizations.weight.original0"],
            sd["encoder.pos_conv_embed.conv.parametrizations.weight.original1"],
            dim=2,
        )
    else:
        pos_w = np.asarray(sd["encoder.pos_conv_embed.conv.weight"])
    enc["pos_conv"] = {
        "kernel": conv1d_kernel(pos_w),
        "bias": np.asarray(sd["encoder.pos_conv_embed.conv.bias"]),
    }
    enc["layer_norm"] = ln("encoder.layer_norm")
    for i in range(num_layers):
        lp = f"encoder.layers.{i}"
        enc[f"layer_{i}"] = {
            "self_attn": {
                "q_proj": dense(f"{lp}.attention.q_proj"),
                "k_proj": dense(f"{lp}.attention.k_proj"),
                "v_proj": dense(f"{lp}.attention.v_proj"),
                "out_proj": dense(f"{lp}.attention.out_proj"),
            },
            "self_attn_layer_norm": ln(f"{lp}.layer_norm"),
            "fc1": dense(f"{lp}.feed_forward.intermediate_dense"),
            "fc2": dense(f"{lp}.feed_forward.output_dense"),
            "final_layer_norm": ln(f"{lp}.final_layer_norm"),
        }
    p["encoder"] = enc
    return {"params": p}


class ContentvecExtractor:
    """wav (16 kHz) -> (T, 768) last_hidden_state features."""

    def __init__(self, model: HubertModel, params, max_chunk: int = 1_600_000):
        self.reader = HubertFeatureReader(
            model, params, layer=model.config.num_layers, max_chunk=max_chunk
        )

    def __call__(self, wav: np.ndarray) -> np.ndarray:
        return self.reader(wav)

    @classmethod
    def from_torch(cls, ckpt_path: str) -> "ContentvecExtractor":
        import torch

        obj = torch.load(ckpt_path, map_location="cpu", weights_only=True)
        sd = obj.get("model", obj)
        sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else v)
              for k, v in sd.items()}
        model = HubertModel(contentvec_config())
        return cls(model, convert_hubert_hf(sd))
