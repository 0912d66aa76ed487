"""Tacotron2 unit-vocoder acoustic model (textlesslib extras).

JAX re-implementation of the Tacotron2 used by textlesslib's unit vocoder
(/root/reference/unitspeech/textlesslib/textless/vocoders/tacotron2/model.py:
43-702, itself NVIDIA's tacotron2 with obs/lat extensions): unit-code
embedding -> conv+BiLSTM encoder -> location-sensitive-attention
autoregressive decoder -> postnet residual.

TPU-native design:
  * NTC layout throughout; the autoregressive decoder is ONE
    `lax.while_loop` whose carry holds both LSTM states, the attention
    state, and preallocated (max_steps, ...) output buffers — static shapes,
    device-side gate stopping, no per-step host sync.
  * inputs pad to token buckets; padded positions are masked after every
    encoder layer and attention energies get -inf at padded keys, which is
    numerically identical to the reference's unpadded run (verified
    output-level in tests/test_tacotron2.py).
  * the prenet's always-on dropout (model.py:130-133 passes training=True
    even at inference — a deliberate Tacotron2 sampling trick) uses a JAX
    key per step; `prenet_dropout=False` disables it deterministically.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class Tacotron2Config:
    """Field names follow the reference hparams (vocoder.py:117-127 reads
    them from the checkpoint)."""

    n_symbols: int = 104
    symbols_embedding_dim: int = 512
    encoder_embedding_dim: int = 512
    encoder_n_convolutions: int = 3
    encoder_kernel_size: int = 5
    n_mel_channels: int = 80
    n_frames_per_step: int = 1
    attention_rnn_dim: int = 1024
    decoder_rnn_dim: int = 1024
    prenet_dim: int = 256
    attention_dim: int = 128
    attention_location_n_filters: int = 32
    attention_location_kernel_size: int = 31
    postnet_embedding_dim: int = 512
    postnet_kernel_size: int = 5
    postnet_n_convolutions: int = 5
    gate_threshold: float = 0.5
    max_decoder_steps: int = 2000
    obs_dim: int = 0
    obs_n_class: int = 1
    lat_dim: int = 0


def tacotron2_test_config(**kw) -> Tacotron2Config:
    base = dict(
        n_symbols=12, symbols_embedding_dim=16, encoder_embedding_dim=16,
        n_mel_channels=8, attention_rnn_dim=20, decoder_rnn_dim=24,
        prenet_dim=10, attention_dim=12, attention_location_n_filters=4,
        attention_location_kernel_size=7, postnet_embedding_dim=12,
        max_decoder_steps=40,
    )
    base.update(kw)
    return Tacotron2Config(**base)


# ---------------------------------------------------------------------------
# primitive helpers (param dicts are plain pytrees; layouts documented in the
# converter so the torch checkpoint maps 1:1)


def _lstm_cell(p: Dict, x, h, c):
    """torch LSTMCell semantics: gates ordered [i, f, g, o]; weights stored
    in the torch (4H, in) layout."""
    gates = (
        jnp.dot(x, p["weight_ih"].T, preferred_element_type=jnp.float32)
        + jnp.dot(h, p["weight_hh"].T, preferred_element_type=jnp.float32)
        + p["bias"]
    )
    gi, gf, gg, go = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(gf) * c + jax.nn.sigmoid(gi) * jnp.tanh(gg)
    h_new = jax.nn.sigmoid(go) * jnp.tanh(c_new)
    return h_new, c_new


def _linear(p: Dict, x):
    y = jnp.dot(x, p["weight"].T, preferred_element_type=jnp.float32)
    if "bias" in p:
        y = y + p["bias"]
    return y


def _conv1d(p: Dict, x, padding: int, dilation: int = 1):
    """x: (B, T, Cin); torch weight (Cout, Cin, K) stored transposed as
    (K, Cin, Cout)."""
    y = jax.lax.conv_general_dilated(
        x, p["kernel"],
        window_strides=(1,), padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    if "bias" in p:
        y = y + p["bias"]
    return y


def _batchnorm_eval(p: Dict, x, eps: float = 1e-5):
    """Eval-mode BatchNorm1d over the channel axis (running stats)."""
    inv = jax.lax.rsqrt(p["running_var"] + eps)
    return (x - p["running_mean"]) * inv * p["weight"] + p["bias"]


def _mask_rows(x, lengths):
    """(B, T, C) -> zero rows at/after each sequence's length."""
    t = x.shape[1]
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, t, 1), 1)
    return jnp.where(idx < lengths[:, None, None], x, 0)


def _reverse_valid(x, lengths):
    """Reverse each sequence's first `length` rows in place, keeping the
    padding at the tail (for the backward LSTM direction over padded
    batches)."""
    b, t = x.shape[0], x.shape[1]
    pos = jnp.arange(t)[None, :]
    src = jnp.where(pos < lengths[:, None], lengths[:, None] - 1 - pos, pos)
    return jnp.take_along_axis(x, src[..., None], axis=1)


def _lstm_scan(p: Dict, x, reverse: bool = False):
    """Unidirectional LSTM over (B, T, C) with zero init state."""
    b, t, _ = x.shape
    h_dim = p["weight_hh"].shape[1]
    init = (jnp.zeros((b, h_dim), jnp.float32), jnp.zeros((b, h_dim), jnp.float32))

    def step(carry, xt):
        h, c = _lstm_cell(p, xt, *carry)
        return (h, c), h

    xs = jnp.swapaxes(x, 0, 1)
    if reverse:
        xs = xs[::-1]
    _, ys = jax.lax.scan(step, init, xs)
    if reverse:
        ys = ys[::-1]
    return jnp.swapaxes(ys, 0, 1)


# ---------------------------------------------------------------------------


def encoder_infer(params: Dict, cfg: Tacotron2Config, tokens, lengths):
    """tokens (B, T) int32, lengths (B,) -> memory (B, T, E).

    reference model.py:182-234 (inference path; eval -> conv dropout off).
    Padded positions are re-masked after every layer so the valid rows match
    the unpadded reference run exactly (explicit conv zero-padding
    equivalence), and the backward LSTM direction reverses only the valid
    prefix."""
    emb = params["embedding"]["weight"][tokens]  # (B, T, D)
    x = _mask_rows(emb, lengths)
    pad = (cfg.encoder_kernel_size - 1) // 2
    for i in range(cfg.encoder_n_convolutions):
        c = params["encoder"][f"conv{i}"]
        x = jax.nn.relu(_batchnorm_eval(c["bn"], _conv1d(c["conv"], x, pad)))
        x = _mask_rows(x, lengths)
    fwd = _lstm_scan(params["encoder"]["lstm_fwd"], x)
    xr = _reverse_valid(x, lengths)
    bwd = _lstm_scan(params["encoder"]["lstm_bwd"], xr)
    bwd = _reverse_valid(bwd, lengths)
    out = jnp.concatenate([fwd, bwd], axis=-1)
    return _mask_rows(out, lengths)


def _prenet(params: Dict, x, rng, dropout: bool):
    """model.py:122-133 — dropout ALWAYS on (training=True at inference)."""
    for i in range(2):
        x = jax.nn.relu(_linear(params[f"layer{i}"], x))
        if dropout:
            rng, sub = jax.random.split(rng)
            keep = jax.random.bernoulli(sub, 0.5, x.shape)
            x = jnp.where(keep, x / 0.5, 0.0)
    return x, rng


def _attention(params: Dict, att_h, memory, processed_memory, att_w,
               att_w_cum, key_mask):
    """Location-sensitive attention, one step (model.py:62-119)."""
    q = _linear(params["query"], att_h)[:, None, :]  # (B, 1, A)
    cat = jnp.stack([att_w, att_w_cum], axis=-1)  # (B, T, 2)
    loc = _conv1d(params["location_conv"], cat,
                  padding=(params["location_conv"]["kernel"].shape[0] - 1) // 2)
    loc = _linear(params["location_dense"], loc)  # (B, T, A)
    energies = _linear(params["v"], jnp.tanh(q + loc + processed_memory))
    energies = energies[..., 0]  # (B, T)
    energies = jnp.where(key_mask, energies, -jnp.inf)
    w = jax.nn.softmax(energies, axis=-1)
    ctx = jnp.einsum("bt,btc->bc", w, memory)
    return ctx, w


def decoder_infer(params: Dict, cfg: Tacotron2Config, memory, lengths,
                  obs_and_lat=None, rng=None, prenet_dropout: bool = True):
    """Autoregressive decode (model.py:527-569) as one lax.while_loop.

    Returns (mels (B, S_max, n_mel), gates (B, S_max), alignments
    (B, S_max, T), n_steps (B,), has_eos (B,)): buffers are fixed at
    max_decoder_steps; rows >= n_steps are zero."""
    b, t, _ = memory.shape
    n_mel = cfg.n_mel_channels * cfg.n_frames_per_step
    s_max = cfg.max_decoder_steps
    if rng is None:
        rng = jax.random.PRNGKey(0)
    key_mask = jnp.arange(t)[None, :] < lengths[:, None]
    processed_memory = _linear(params["attention"]["memory"], memory)

    state = dict(
        step=jnp.int32(0),
        done=jnp.zeros((b,), bool),
        has_eos=jnp.zeros((b,), bool),
        mel_prev=jnp.zeros((b, n_mel), jnp.float32),
        att_h=jnp.zeros((b, cfg.attention_rnn_dim), jnp.float32),
        att_c=jnp.zeros((b, cfg.attention_rnn_dim), jnp.float32),
        dec_h=jnp.zeros((b, cfg.decoder_rnn_dim), jnp.float32),
        dec_c=jnp.zeros((b, cfg.decoder_rnn_dim), jnp.float32),
        att_w=jnp.zeros((b, t), jnp.float32),
        att_w_cum=jnp.zeros((b, t), jnp.float32),
        att_ctx=jnp.zeros((b, cfg.encoder_embedding_dim), jnp.float32),
        rng=rng,
        mels=jnp.zeros((s_max, b, n_mel), jnp.float32),
        gates=jnp.zeros((s_max, b), jnp.float32),
        aligns=jnp.zeros((s_max, b, t), jnp.float32),
        n_steps=jnp.zeros((b,), jnp.int32),
    )

    def cond(s):
        return (~jnp.all(s["done"])) & (s["step"] < s_max)

    def body(s):
        pre, rng = _prenet(params["prenet"], s["mel_prev"], s["rng"],
                           prenet_dropout)
        cell_in = jnp.concatenate([pre, s["att_ctx"]], axis=-1)
        att_h, att_c = _lstm_cell(params["attention_rnn"], cell_in,
                                  s["att_h"], s["att_c"])
        ctx, w = _attention(params["attention"], att_h, memory,
                            processed_memory, s["att_w"], s["att_w_cum"],
                            key_mask)
        att_w_cum = s["att_w_cum"] + w
        dec_in = jnp.concatenate([att_h, ctx], axis=-1)
        if obs_and_lat is not None:
            dec_in = jnp.concatenate([dec_in, obs_and_lat], axis=-1)
        dec_h, dec_c = _lstm_cell(params["decoder_rnn"], dec_in,
                                  s["dec_h"], s["dec_c"])
        proj_in = jnp.concatenate([dec_h, ctx], axis=-1)
        if obs_and_lat is not None:
            proj_in = jnp.concatenate([proj_in, obs_and_lat], axis=-1)
        mel = _linear(params["linear_projection"], proj_in)
        gate = _linear(params["gate"], proj_in)[..., 0]

        active = ~s["done"]
        write = active.astype(jnp.float32)
        mels = jax.lax.dynamic_update_slice(
            s["mels"], (mel * write[:, None])[None], (s["step"], 0, 0))
        gates = jax.lax.dynamic_update_slice(
            s["gates"], (gate * write)[None], (s["step"], 0))
        aligns = jax.lax.dynamic_update_slice(
            s["aligns"], (w * write[:, None])[None], (s["step"], 0, 0))
        stop = jax.nn.sigmoid(gate) > cfg.gate_threshold
        done = s["done"] | stop
        return dict(
            step=s["step"] + 1,
            done=done,
            has_eos=s["has_eos"] | (stop & active),
            mel_prev=jnp.where(active[:, None], mel, s["mel_prev"]),
            att_h=att_h, att_c=att_c, dec_h=dec_h, dec_c=dec_c,
            att_w=w, att_w_cum=att_w_cum, att_ctx=ctx, rng=rng,
            mels=mels, gates=gates, aligns=aligns,
            n_steps=s["n_steps"] + active.astype(jnp.int32),
        )

    s = jax.lax.while_loop(cond, body, state)
    return (jnp.swapaxes(s["mels"], 0, 1), jnp.swapaxes(s["gates"], 0, 1),
            jnp.swapaxes(s["aligns"], 0, 1), s["n_steps"], s["has_eos"])


def postnet(params: Dict, cfg: Tacotron2Config, mels, n_steps):
    """5-conv residual refiner (model.py:136-179, eval -> dropout off).
    mels (B, S, n_mel); rows >= n_steps are masked around every conv so
    valid rows match the reference's exact-length run."""
    x = _mask_rows(mels, n_steps)
    pad = (cfg.postnet_kernel_size - 1) // 2
    n = cfg.postnet_n_convolutions
    for i in range(n):
        c = params[f"conv{i}"]
        x = _batchnorm_eval(c["bn"], _conv1d(c["conv"], x, pad))
        if i < n - 1:
            x = jnp.tanh(x)
        x = _mask_rows(x, n_steps)
    return mels + x


def tacotron2_infer(params: Dict, cfg: Tacotron2Config, tokens, lengths,
                    obs_labels=None, lat=None, rng=None,
                    prenet_dropout: bool = True):
    """Full inference (model.py:666-701): tokens -> (mel, mel_postnet,
    gates, alignments, n_steps, has_eos). Works on padded token buckets."""
    memory = encoder_infer(params, cfg, tokens, lengths)
    obs_and_lat = None
    parts = []
    if cfg.obs_dim > 0:
        if obs_labels is None:
            obs_labels = jnp.zeros((tokens.shape[0],), jnp.int32)
        parts.append(params["obs_embedding"]["weight"][obs_labels])
    if cfg.lat_dim > 0:
        if lat is None:
            lat = jnp.zeros((tokens.shape[0], cfg.lat_dim), jnp.float32)
        parts.append(lat)
    if parts:
        obs_and_lat = jnp.concatenate(parts, axis=-1)
    mels, gates, aligns, n_steps, has_eos = decoder_infer(
        params["decoder"], cfg, memory, lengths, obs_and_lat, rng,
        prenet_dropout,
    )
    mel_post = postnet(params["postnet"], cfg, mels, n_steps)
    mel_post = _mask_rows(mel_post, n_steps)
    return mels, mel_post, gates, aligns, n_steps, has_eos


# ---------------------------------------------------------------------------
# torch checkpoint conversion


def random_tacotron2_params(cfg: Tacotron2Config, seed: int = 0,
                            scale: float = 0.1) -> Dict:
    """Random param tree with the exact structure/shapes `convert_tacotron2`
    produces — torch-free initialization for demos, benches, and shape
    tests (examples/resynthesis.py; no reference equivalent — the reference
    only ever loads published checkpoints)."""
    rng = np.random.default_rng(seed)

    def w(*shape):
        return (scale * rng.standard_normal(shape)).astype(np.float32)

    def lin(out, inp, bias=True):
        d = {"weight": w(out, inp)}
        if bias:
            d["bias"] = w(out)
        return d

    def conv(k, cin, cout, bias=True):
        d = {"kernel": w(k, cin, cout)}
        if bias:
            d["bias"] = w(cout)
        return d

    def bn(c):
        return {"weight": 1.0 + w(c), "bias": w(c),
                "running_mean": w(c),
                "running_var": (1.0 + w(c) ** 2).astype(np.float32)}

    def lstmcell(hidden, inp):
        return {"weight_ih": w(4 * hidden, inp),
                "weight_hh": w(4 * hidden, hidden), "bias": w(4 * hidden)}

    e = cfg.encoder_embedding_dim
    mem = e + cfg.obs_dim + cfg.lat_dim
    half = e // 2
    p: Dict[str, Any] = {
        "embedding": {"weight": w(cfg.n_symbols, cfg.symbols_embedding_dim)},
        "encoder": {
            "lstm_fwd": lstmcell(half, e),
            "lstm_bwd": lstmcell(half, e),
        },
    }
    for i in range(cfg.encoder_n_convolutions):
        cin = cfg.symbols_embedding_dim if i == 0 else e
        p["encoder"][f"conv{i}"] = {
            "conv": conv(cfg.encoder_kernel_size, cin, e), "bn": bn(e),
        }
    if cfg.obs_dim > 0:
        p["obs_embedding"] = {"weight": w(cfg.obs_n_class, cfg.obs_dim)}
    n_out = cfg.n_mel_channels * cfg.n_frames_per_step
    p["decoder"] = {
        "prenet": {"layer0": lin(cfg.prenet_dim, n_out, bias=False),
                   "layer1": lin(cfg.prenet_dim, cfg.prenet_dim, bias=False)},
        "attention_rnn": lstmcell(cfg.attention_rnn_dim,
                                  cfg.prenet_dim + mem),
        "attention": {
            "query": lin(cfg.attention_dim, cfg.attention_rnn_dim,
                         bias=False),
            "memory": lin(cfg.attention_dim, mem, bias=False),
            "v": lin(1, cfg.attention_dim, bias=False),
            "location_conv": conv(cfg.attention_location_kernel_size, 2,
                                  cfg.attention_location_n_filters,
                                  bias=False),
            "location_dense": lin(cfg.attention_dim,
                                  cfg.attention_location_n_filters,
                                  bias=False),
        },
        "decoder_rnn": lstmcell(cfg.decoder_rnn_dim,
                                cfg.attention_rnn_dim + mem),
        "linear_projection": lin(n_out, cfg.decoder_rnn_dim + mem),
        "gate": lin(1, cfg.decoder_rnn_dim + mem),
    }
    pn: Dict[str, Any] = {}
    for i in range(cfg.postnet_n_convolutions):
        cin = cfg.n_mel_channels if i == 0 else cfg.postnet_embedding_dim
        cout = (cfg.n_mel_channels if i == cfg.postnet_n_convolutions - 1
                else cfg.postnet_embedding_dim)
        pn[f"conv{i}"] = {"conv": conv(cfg.postnet_kernel_size, cin, cout),
                          "bn": bn(cout)}
    p["postnet"] = pn
    return p


def _t(a) -> np.ndarray:
    return np.asarray(a, np.float32)


def _conv_p(sd, prefix, bias=True) -> Dict:
    out = {"kernel": _t(sd[f"{prefix}.weight"]).transpose(2, 1, 0)}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def _lin_p(sd, prefix) -> Dict:
    out = {"weight": _t(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def _bn_p(sd, prefix) -> Dict:
    return {
        "weight": _t(sd[f"{prefix}.weight"]),
        "bias": _t(sd[f"{prefix}.bias"]),
        "running_mean": _t(sd[f"{prefix}.running_mean"]),
        "running_var": _t(sd[f"{prefix}.running_var"]),
    }


def _lstmcell_p(sd, prefix) -> Dict:
    return {
        "weight_ih": _t(sd[f"{prefix}.weight_ih"]),
        "weight_hh": _t(sd[f"{prefix}.weight_hh"]),
        "bias": _t(sd[f"{prefix}.bias_ih"]) + _t(sd[f"{prefix}.bias_hh"]),
    }


def _lstm_dir_p(sd, prefix, suffix="") -> Dict:
    return {
        "weight_ih": _t(sd[f"{prefix}.weight_ih_l0{suffix}"]),
        "weight_hh": _t(sd[f"{prefix}.weight_hh_l0{suffix}"]),
        "bias": _t(sd[f"{prefix}.bias_ih_l0{suffix}"])
        + _t(sd[f"{prefix}.bias_hh_l0{suffix}"]),
    }


def convert_tacotron2(sd: Dict[str, np.ndarray],
                      cfg: Tacotron2Config) -> Dict:
    """torch Tacotron2 state dict (vocoder.py:118-124 'model_dict') -> our
    param tree. Conv weights transpose to (K, Cin, Cout); LSTM biases fold
    ih+hh; the BiLSTM splits into explicit fwd/bwd cells."""
    p: Dict[str, Any] = {
        "embedding": {"weight": _t(sd["embedding.weight"])},
        "encoder": {
            "lstm_fwd": _lstm_dir_p(sd, "encoder.lstm"),
            "lstm_bwd": _lstm_dir_p(sd, "encoder.lstm", "_reverse"),
        },
    }
    for i in range(cfg.encoder_n_convolutions):
        p["encoder"][f"conv{i}"] = {
            "conv": _conv_p(sd, f"encoder.convolutions.{i}.0.conv"),
            "bn": _bn_p(sd, f"encoder.convolutions.{i}.1"),
        }
    if cfg.obs_dim > 0:
        p["obs_embedding"] = {"weight": _t(sd["obs_embedding.weight"])}
    d: Dict[str, Any] = {
        "prenet": {
            "layer0": _lin_p(sd, "decoder.prenet.layers.0.linear_layer"),
            "layer1": _lin_p(sd, "decoder.prenet.layers.1.linear_layer"),
        },
        "attention_rnn": _lstmcell_p(sd, "decoder.attention_rnn"),
        "attention": {
            "query": _lin_p(sd, "decoder.attention_layer.query_layer.linear_layer"),
            "memory": _lin_p(sd, "decoder.attention_layer.memory_layer.linear_layer"),
            "v": _lin_p(sd, "decoder.attention_layer.v.linear_layer"),
            "location_conv": _conv_p(
                sd,
                "decoder.attention_layer.location_layer.location_conv.conv",
            ),
            "location_dense": _lin_p(
                sd,
                "decoder.attention_layer.location_layer.location_dense.linear_layer",
            ),
        },
        "decoder_rnn": _lstmcell_p(sd, "decoder.decoder_rnn"),
        "linear_projection": _lin_p(
            sd, "decoder.linear_projection.linear_layer"),
        "gate": _lin_p(sd, "decoder.gate_layer.linear_layer"),
    }
    p["decoder"] = d
    pn: Dict[str, Any] = {}
    for i in range(cfg.postnet_n_convolutions):
        pn[f"conv{i}"] = {
            "conv": _conv_p(sd, f"postnet.convolutions.{i}.0.conv"),
            "bn": _bn_p(sd, f"postnet.convolutions.{i}.1"),
        }
    p["postnet"] = pn
    return p
