#!/usr/bin/env python
"""Speaker probing over discrete units — how much speaker identity survives
quantization?

TPU-native equivalent of the textlesslib speaker-probing example
(/root/reference/unitspeech/textlesslib/examples/speaker_probing/
{probes,train}.py): train small transformer probes to predict the speaker
from (a) the discrete unit stream and (b) the continuous SSL features of
the same utterances, and compare both against a constant-prediction
baseline. The published finding the demo illustrates: units carry much less
speaker information than the dense features they quantize.

This version is one jitted optax train step per probe (no per-batch Python
loops), padding-masked attention, BOS-token readout like the reference
Classifier (probes.py:92-113). The demo corpus is synthetic — two
"speakers" = two F0 ranges, encoded by the tiny random SSL stack — so it
runs anywhere in ~a minute; pass --hubert/--kmeans for real artifacts.

Run: python examples/speaker_probing.py
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# CPU unless the caller EXPLICITLY exported JAX_PLATFORMS=tpu: probing
# jax.default_backend() would initialize (and contend for) the single
# tunneled TPU chip, which another process may be benchmarking.
if os.environ.get("JAX_PLATFORMS", "").lower() != "tpu":
    jax.config.update("jax_platforms", "cpu")

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
import optax


class Probe(nn.Module):
    """Transformer probe with BOS readout (reference probes.py Classifier):
    discrete mode embeds unit IDs, continuous mode projects dense features;
    a learned BOS column is prepended and its final state classifies."""

    n_classes: int
    vocab_size: int = 0  # > 0 -> discrete probe
    d_model: int = 32
    n_heads: int = 2
    n_layers: int = 1
    ffn: int = 64

    @nn.compact
    def __call__(self, units, dense, lengths):
        b, t = units.shape
        if self.vocab_size:
            x = nn.Embed(self.vocab_size, self.d_model)(units)
            x = x * np.sqrt(self.d_model)
        else:
            x = nn.Dense(self.d_model)(dense)
        pos = np.zeros((t + 1, self.d_model), np.float32)
        i = np.arange(t + 1)[:, None]
        div = np.exp(np.arange(0, self.d_model, 2) / self.d_model
                     * -np.log(10000.0))
        pos[:, 0::2] = np.sin(i * div)
        pos[:, 1::2] = np.cos(i * div)
        bos = self.param("bos", nn.initializers.normal(0.02),
                         (self.d_model,))
        x = jnp.concatenate(
            [jnp.broadcast_to(bos, (b, 1, self.d_model)), x], axis=1
        ) + pos[None]
        valid = jnp.arange(t + 1)[None, :] <= lengths[:, None]  # BOS + seq
        attn_mask = valid[:, None, None, :] & valid[:, None, :, None]
        for _ in range(self.n_layers):
            h = nn.LayerNorm()(x)
            h = nn.SelfAttention(num_heads=self.n_heads,
                                 qkv_features=self.d_model)(h, mask=attn_mask)
            x = x + h
            h = nn.LayerNorm()(x)
            h = nn.Dense(self.ffn)(h)
            h = nn.relu(h)
            x = x + nn.Dense(self.d_model)(h)
        return nn.log_softmax(nn.Dense(self.n_classes)(x[:, 0]))


def make_corpus(encoder, n_per_speaker=12, seconds=0.75, seed=0):
    """Two synthetic 'speakers' distinguished by F0 range."""
    rng = np.random.default_rng(seed)
    sr = encoder.expected_sample_rate
    t = np.arange(int(seconds * sr)) / sr
    rows = []
    for spk, f0_base in enumerate((110.0, 260.0)):
        for _ in range(n_per_speaker):
            f0 = f0_base * (1 + 0.1 * rng.standard_normal())
            vib = 1 + 0.05 * np.sin(2 * np.pi * rng.uniform(2, 5) * t)
            wav = (0.4 * np.sin(2 * np.pi * f0 * vib * t)
                   + 0.05 * rng.standard_normal(t.size)).astype(np.float32)
            s = encoder(wav)
            rows.append((np.asarray(s["units"]), np.asarray(s["dense"]),
                         spk))
    rng.shuffle(rows)
    t_max = max(r[0].size for r in rows)
    d = rows[0][1].shape[-1]
    units = np.zeros((len(rows), t_max), np.int32)
    dense = np.zeros((len(rows), t_max, d), np.float32)
    lengths = np.zeros((len(rows),), np.int32)
    labels = np.array([r[2] for r in rows], np.int32)
    for i, (u, f, _) in enumerate(rows):
        n = min(u.size, f.shape[0])
        units[i, :n] = u[:n]
        dense[i, :n] = f[:n]
        lengths[i] = n
    return units, dense, lengths, labels


def train_probe(probe, batch, labels, steps=60, lr=3e-3, seed=0):
    params = probe.init(jax.random.PRNGKey(seed), *batch)
    tx = optax.adam(lr)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            logp = probe.apply(p, *batch)
            return -logp[jnp.arange(labels.shape[0]), labels].mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss

    for _ in range(steps):
        params, opt, loss = step(params, opt)
    acc = float(
        (probe.apply(params, *batch).argmax(-1) == labels).mean()
    )
    return acc, float(loss)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--hubert", default=None)
    ap.add_argument("--kmeans", default=None)
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--n-per-speaker", type=int, default=12)
    args = ap.parse_args(argv)

    if args.hubert:
        from unitspeech_tpu.cli import build_unit_extractor
        from unitspeech_tpu.config import MainConfig

        encoder = build_unit_extractor(args.hubert, args.kmeans, MainConfig())
    else:
        from unitspeech_tpu.models.ssl.hubert import (
            HubertFeatureReader, HubertModel, hubert_test_config,
        )
        from unitspeech_tpu.models.ssl.kmeans import KMeansQuantizer
        from unitspeech_tpu.models.ssl.speech_encoder import SpeechEncoder

        hmodel = HubertModel(hubert_test_config())
        hparams = jax.jit(hmodel.init)(
            jax.random.PRNGKey(0), np.zeros((1, 3200), np.float32)
        )
        centers = np.random.default_rng(0).standard_normal(
            (16, hmodel.config.embed_dim)).astype(np.float32)
        encoder = SpeechEncoder(
            HubertFeatureReader(hmodel, hparams, layer=2),
            KMeansQuantizer(centers), deduplicate=False,
        )

    units, dense, lengths, labels = make_corpus(
        encoder, n_per_speaker=args.n_per_speaker
    )
    batch = (jnp.asarray(units), jnp.asarray(dense), jnp.asarray(lengths))
    n_classes = int(labels.max()) + 1

    baseline = float(np.bincount(labels).max() / labels.size)
    disc_acc, _ = train_probe(
        Probe(n_classes=n_classes, vocab_size=encoder.vocab_size),
        batch, jnp.asarray(labels), steps=args.steps,
    )
    cont_acc, _ = train_probe(
        Probe(n_classes=n_classes, vocab_size=0),
        batch, jnp.asarray(labels), steps=args.steps,
    )
    print(f"constant baseline: {baseline:.3f}")
    print(f"discrete-units probe: {disc_acc:.3f}")
    print(f"continuous-features probe: {cont_acc:.3f}")
    return baseline, disc_acc, cont_acc


if __name__ == "__main__":
    main()
