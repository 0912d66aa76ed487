"""CPC speech encoder — the third dense-model family of the unit extractor.

JAX re-implementation of textlesslib's CpcFeatureReader stack
(/root/reference/unitspeech/textlesslib/textless/data/cpc_feature_reader.py:
11-190): a 5-layer strided conv encoder with ChannelNorm (160x downsampling,
100 Hz at 16 kHz) feeding a multi-layer LSTM autoregressive net. Features are
the LSTM output (or the encoder output when `use_encoder_layer`), optionally
mean/variance normalized over time.

TPU design notes: the conv stack is five NWC convs (MXU-friendly im2col by
XLA); the LSTM runs as one `lax.scan` over time with all layers fused into
the carry — weights ride in VMEM across the whole scan, and the (B, 4H)
gate matmuls batch both directions of the step. Chunking for long inputs
happens on host between jit calls so every device program is static-shape.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class CpcConfig:
    hidden_encoder: int = 512   # config["hiddenEncoder"]
    hidden_gar: int = 256       # config["hiddenGar"]
    n_levels_lstm: int = 2      # config["nLevelsGRU"] (an LSTM despite the name)


def cpc_base_config() -> CpcConfig:
    """The 6k-hour LibriLight CPC checkpoint the textless registry serves
    (cpc_feature_reader.py:70-86 reads these dims from the checkpoint)."""
    return CpcConfig()


def cpc_test_config() -> CpcConfig:
    return CpcConfig(hidden_encoder=8, hidden_gar=6, n_levels_lstm=2)


class ChannelNorm(nn.Module):
    """Per-position normalization over channels with (1, C) affine
    (cpc_feature_reader.py:89-114). torch.var's default is the UNBIASED
    estimator, so the variance divides by C-1 — matched here."""

    num_features: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):  # (B, T, C)
        c = x.shape[-1]
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.sum(jnp.square(x - mean), axis=-1, keepdims=True) / max(c - 1, 1)
        x = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        weight = self.param("weight", nn.initializers.ones, (1, self.num_features))
        bias = self.param("bias", nn.initializers.zeros, (1, self.num_features))
        return x * weight + bias


class CpcEncoder(nn.Module):
    """conv(10,5,p3) -> conv(8,4,p2) -> 3x conv(4,2,p1), each ChannelNorm +
    ReLU (cpc_feature_reader.py:117-141). 160x total downsampling."""

    config: CpcConfig = CpcConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, wav, length=None):  # (B, samples) -> (B, frames, C)
        """`length` (scalar, traced) is the TRUE sample count when `wav` is
        right-padded to a bucket: each layer's output is zeroed beyond its
        valid frame count so downstream convs see exactly the reference's
        explicit zero padding at the true boundary (ChannelNorm would
        otherwise make bucket-padding positions nonzero)."""
        h = self.config.hidden_encoder
        x = wav[..., None].astype(self.dtype)  # (B, T, 1) NWC
        specs = [(10, 5, 3), (8, 4, 2), (4, 2, 1), (4, 2, 1), (4, 2, 1)]
        for i, (k, s, p) in enumerate(specs):
            x = nn.Conv(h, (k,), strides=(s,), padding=[(p, p)],
                        dtype=self.dtype, name=f"conv{i}")(x)
            x = ChannelNorm(h, name=f"norm{i}")(x.astype(jnp.float32))
            x = nn.relu(x).astype(self.dtype)
            if length is not None:
                length = (length + 2 * p - k) // s + 1
                idx = jax.lax.broadcasted_iota(
                    jnp.int32, (1, x.shape[1], 1), 1
                )
                x = jnp.where(idx < length, x, 0)
        return x, length


class CpcAR(nn.Module):
    """Multi-layer unidirectional LSTM over encoder frames
    (cpc_feature_reader.py:144-167). One lax.scan over time; each step runs
    the layer stack sequentially (matches torch nn.LSTM's layered cell).

    Weights use torch's (4H, in) layout with gate order [i, f, g, o] so the
    converter is a straight copy."""

    config: CpcConfig = CpcConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, T, Cin) -> (B, T, H)
        c = self.config
        b, t, cin = x.shape
        h = c.hidden_gar
        layers = []
        for k in range(c.n_levels_lstm):
            d_in = cin if k == 0 else h
            wi = self.param(f"weight_ih_l{k}",
                            nn.initializers.lecun_normal(), (4 * h, d_in))
            wh = self.param(f"weight_hh_l{k}",
                            nn.initializers.lecun_normal(), (4 * h, h))
            bi = self.param(f"bias_ih_l{k}", nn.initializers.zeros, (4 * h,))
            bh = self.param(f"bias_hh_l{k}", nn.initializers.zeros, (4 * h,))
            layers.append((wi.astype(self.dtype), wh.astype(self.dtype),
                           (bi + bh).astype(jnp.float32)))

        def step(carry, xt):  # xt: (B, Cin)
            new_carry = []
            inp = xt
            for (wi, wh, bsum), (hprev, cprev) in zip(layers, carry):
                gates = (
                    jnp.dot(inp, wi.T, preferred_element_type=jnp.float32)
                    + jnp.dot(hprev.astype(self.dtype), wh.T,
                              preferred_element_type=jnp.float32)
                    + bsum
                )
                gi, gf, gg, go = jnp.split(gates, 4, axis=-1)
                cnew = jax.nn.sigmoid(gf) * cprev + jax.nn.sigmoid(gi) * jnp.tanh(gg)
                hnew = jax.nn.sigmoid(go) * jnp.tanh(cnew)
                new_carry.append((hnew, cnew))
                inp = hnew.astype(self.dtype)
            return tuple(new_carry), inp

        init = tuple(
            (jnp.zeros((b, h), jnp.float32), jnp.zeros((b, h), jnp.float32))
            for _ in range(c.n_levels_lstm)
        )
        _, ys = jax.lax.scan(step, init, jnp.swapaxes(x, 0, 1))
        return jnp.swapaxes(ys, 0, 1)  # (B, T, H)


class CpcModel(nn.Module):
    """encoder -> AR net; extract_features parity with
    cpc_feature_reader.py:170-190."""

    config: CpcConfig = CpcConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, wav, get_encoded: bool = False,
                 norm_output: bool = False, length=None):
        encoded, frames = CpcEncoder(
            self.config, dtype=self.dtype, name="gEncoder"
        )(wav, length=length)
        feat = CpcAR(self.config, dtype=self.dtype, name="gAR")(encoded)
        if get_encoded:
            feat = encoded
        feat = feat.astype(jnp.float32)
        if norm_output:
            # torch.var over time (unbiased), eps 1e-8 (:186-189); when the
            # input is bucket-padded, stats run over the true frames only
            t = feat.shape[1]
            if frames is None:
                mean = jnp.mean(feat, axis=1, keepdims=True)
                var = jnp.sum(jnp.square(feat - mean), axis=1, keepdims=True)
                var = var / max(t - 1, 1)
            else:
                idx = jax.lax.broadcasted_iota(jnp.int32, (1, t, 1), 1)
                m = (idx < frames).astype(jnp.float32)
                nf = jnp.maximum(frames, 1).astype(jnp.float32)
                mean = jnp.sum(feat * m, axis=1, keepdims=True) / nf
                var = jnp.sum(jnp.square(feat - mean) * m, axis=1,
                              keepdims=True) / jnp.maximum(nf - 1.0, 1.0)
            feat = (feat - mean) / jnp.sqrt(var + 1e-8)
        return feat


def convert_cpc(sd: Dict[str, np.ndarray], config: CpcConfig) -> Dict:
    """torch CPCModel state dict ('weights' inside the published checkpoint,
    cpc_feature_reader.py:69-86) -> flax param tree.

    Conv1d weights (Cout, Cin, K) -> flax (K, Cin, Cout); ChannelNorm affine
    (1, C, 1) -> (1, C); LSTM weights copied in torch layout."""
    a = lambda k: np.asarray(sd[k])
    params: Dict[str, Any] = {"gEncoder": {}, "gAR": {}}
    for i in range(5):
        w = a(f"gEncoder.conv{i}.weight")  # (Cout, Cin, K)
        params["gEncoder"][f"conv{i}"] = {
            "kernel": np.transpose(w, (2, 1, 0)),
            "bias": a(f"gEncoder.conv{i}.bias"),
        }
        params["gEncoder"][f"norm{i}"] = {
            "weight": a(f"gEncoder.batchNorm{i}.weight").reshape(1, -1),
            "bias": a(f"gEncoder.batchNorm{i}.bias").reshape(1, -1),
        }
    for k in range(config.n_levels_lstm):
        for name in (f"weight_ih_l{k}", f"weight_hh_l{k}",
                     f"bias_ih_l{k}", f"bias_hh_l{k}"):
            params["gAR"][name] = a(f"gAR.baseNet.{name}")
    return {"params": params}


@partial(jax.jit, static_argnames=("model", "get_encoded", "norm_output"))
def _cpc_features_fixed(model, params, wav, true_len, get_encoded: bool,
                        norm_output: bool):
    return model.apply(params, wav, get_encoded=get_encoded,
                       norm_output=norm_output, length=true_len)


class CpcFeatureReader:
    """Host-side wrapper with the reference's chunking contract
    (cpc_feature_reader.py:31-59): full max_chunk windows, then a tail pass
    contributing the last (size - start) // hop frames.

    Behavior-parity note: the reference's tail slice `x[:, -max_chunk:]`
    operates on a (1, 1, T) tensor, so it slices the SIZE-1 CHANNEL dim —
    i.e. the tail chunk is the ENTIRE waveform, and its last `delta` frames
    carry LSTM state from sample 0. Matched exactly here (the tail runs the
    full sequence, padded to a max_chunk multiple for static shapes; the
    padding frames come after the kept rows, so the kept rows are exact —
    verified output-level in tests/test_cpc.py)."""

    def __init__(self, model: CpcModel, params, max_chunk: int = 64_000,
                 use_encoder_layer: bool = False, norm_features: bool = False):
        self.model = model
        self.params = params
        self.max_chunk = max_chunk
        self.use_encoder_layer = use_encoder_layer
        self.norm_features = norm_features

    @property
    def code_hop_size(self) -> int:
        return 160

    @property
    def hop(self) -> int:
        """SpeechEncoder duck-type alias (speech_encoder.py:33)."""
        return self.code_hop_size

    @property
    def expected_sample_rate(self) -> int:
        return 16_000

    def _run(self, chunk: np.ndarray) -> np.ndarray:
        # pad right to a max_chunk multiple for static shapes (bounded
        # recompiles); callers slice valid rows
        n_b = max(-(-len(chunk) // self.max_chunk), 1) * self.max_chunk
        padded = np.zeros((1, n_b), np.float32)
        padded[0, : len(chunk)] = chunk
        feats = _cpc_features_fixed(
            self.model, self.params, jnp.asarray(padded),
            jnp.int32(len(chunk)), self.use_encoder_layer, self.norm_features,
        )
        return np.asarray(feats[0])

    def __call__(self, wav: np.ndarray) -> np.ndarray:
        """wav: (samples,) 16 kHz -> (frames, D) float32."""
        wav = np.asarray(wav, np.float32).reshape(-1)
        size = len(wav)
        feat = []
        start = 0
        while start + self.max_chunk <= size:
            feat.append(self._run(wav[start : start + self.max_chunk]))
            start += self.max_chunk
        if start < size:
            # reference quirk (see class docstring): the tail pass runs the
            # FULL sequence and keeps its last delta frames
            full_feat = self._run(wav)[: size // self.code_hop_size]
            delta = (size - start) // self.code_hop_size
            feat.append(full_feat[len(full_feat) - delta :])
        if not feat:
            d = (self.model.config.hidden_encoder if self.use_encoder_layer
                 else self.model.config.hidden_gar)
            return np.zeros((0, d), np.float32)
        return np.concatenate(feat, axis=0)

    @classmethod
    def from_torch(cls, ckpt_path: str, layer: int = 2,
                   use_encoder_layer: bool = False,
                   norm_features: bool = False,
                   max_chunk: int = 64_000) -> "CpcFeatureReader":
        """Load the published CPC checkpoint ({'weights', 'config'} dict,
        cpc_feature_reader.py:69-86). `layer` overrides the LSTM depth like
        the reference's nLevelsGRU override."""
        import torch

        state = torch.load(ckpt_path, map_location="cpu")
        cfg_d = state["config"]
        config = CpcConfig(
            hidden_encoder=int(cfg_d["hiddenEncoder"]),
            hidden_gar=int(cfg_d["hiddenGar"]),
            n_levels_lstm=int(layer if layer is not None
                              else cfg_d["nLevelsGRU"]),
        )
        sd = {k: v.numpy() for k, v in state["weights"].items()}
        model = CpcModel(config)
        params = convert_cpc(sd, config)
        return cls(model, params, max_chunk=max_chunk,
                   use_encoder_layer=use_encoder_layer,
                   norm_features=norm_features)
